"""Text-analysis operators for training-data pipelines.

Beyond the reference's scope (SURVEY.md §2.6 — it has no analytics), these
are the text-quality stages a 100 TB corpus pipeline needs: token counting,
quality scoring, language ID, and document fingerprinting.  All are pure
vectorized batch kernels (`map_batches`, Arrow/numpy) — no Python loop over
rows in any hot path; the only loops are over fixed small constants
(shingle ``k``, winnowing ``window``), each iteration a whole-batch numpy op.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish word/punctuation tokenizer (shared with the DuckDB oracle —
# RE2-compatible, ASCII-safe)
TOKEN_REGEX = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"

STOPWORDS = ("the", "a")


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace tokens, regex (BPE-ish) tokens, distinct tokens, stopword
    count, char count — the quality-signal raw counters, all integers so the
    DuckDB oracle can match exactly."""
    import polars as pl

    t = batch[text_col]
    ws_tokens = pc.split_pattern(t, " ")
    n_ws = pc.list_value_length(ws_tokens)
    n_chars = pc.utf8_length(t)
    # per-row distinct count: polars' Rust list kernel (zero-copy from Arrow)
    n_uniq = (
        pl.from_arrow(ws_tokens if isinstance(ws_tokens, pa.Array) else ws_tokens.combine_chunks())
        .list.n_unique()
        .to_arrow()
    )
    n_stop = _count_in(ws_tokens, STOPWORDS)
    n_bpe = pc.count_substring_regex(t, pattern=TOKEN_REGEX)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_tokens": pc.cast(n_ws, pa.int64()),
            "n_uniq_tokens": pc.cast(n_uniq, pa.int64()),
            "n_stopwords": pc.cast(n_stop, pa.int64()),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
        }
    )


def _count_in(list_arr, vocab: tuple[str, ...]):
    """Per-row count of list elements found in ``vocab`` (vectorized via
    flatten + index_in + segmented sum over offsets)."""
    la = list_arr.combine_chunks() if isinstance(list_arr, pa.ChunkedArray) else list_arr
    flat = la.flatten()
    hit = pc.is_in(flat, value_set=pa.array(vocab))
    hits = pc.cast(hit, pa.int64()).to_numpy(zero_copy_only=False)
    offsets = la.offsets.to_numpy().astype(np.int64)
    offsets = offsets - offsets[0]  # normalize in case of a sliced array
    csum = np.concatenate([[0], np.cumsum(hits)])
    return pa.array(csum[offsets[1:]] - csum[offsets[:-1]])


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Composite quality heuristic in [0,1]: length band + lexical diversity
    + stopword presence (the Gopher/C4-style cheap filters, integer-free
    scoring kept float; exposed as a rows-only query)."""
    stats = token_stats(batch, text_col)
    n_tok = stats["n_tokens"].to_numpy().astype(np.float64)
    n_uniq = stats["n_uniq_tokens"].to_numpy().astype(np.float64)
    n_stop = stats["n_stopwords"].to_numpy().astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        diversity = np.where(n_tok > 0, n_uniq / n_tok, 0.0)
        stop_ratio = np.where(n_tok > 0, n_stop / n_tok, 0.0)
    len_ok = np.clip((n_tok - 5) / 45.0, 0.0, 1.0)
    score = 0.4 * len_ok + 0.4 * diversity + 0.2 * np.clip(stop_ratio * 10, 0, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            # floor-quantize: numpy round is half-even, SQL round half-away
            "quality": pa.array(np.floor(score * 1e6) / 1e6),
        }
    )


# ---------------------------------------------------------------------------
# language ID — letter-frequency profile heuristic


_LANG_PROFILES = {
    # coarse letter-frequency profiles (public single-byte frequency tables,
    # rounded); enough for a deterministic n-gram-style scorer
    "en": {"e": 12.7, "t": 9.1, "a": 8.2, "o": 7.5, "i": 7.0, "n": 6.7, "s": 6.3, "h": 6.1},
    "es": {"e": 13.7, "a": 12.5, "o": 8.7, "s": 8.0, "r": 6.9, "n": 6.7, "i": 6.2, "d": 5.9},
    "de": {"e": 16.4, "n": 9.8, "s": 7.3, "r": 7.0, "i": 6.6, "a": 6.5, "t": 6.2, "d": 5.1},
    "fr": {"e": 14.7, "s": 7.9, "a": 7.6, "i": 7.5, "t": 7.2, "n": 7.1, "r": 6.6, "u": 6.3},
    "zh": {"i": 8.0, "n": 7.0, "g": 6.5, "h": 6.0, "a": 5.5, "e": 5.0, "u": 4.5, "z": 4.0},
}
_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _profile_matrix() -> np.ndarray:
    m = np.zeros((len(_LANG_PROFILES), len(_ALPHABET)))
    for li, prof in enumerate(_LANG_PROFILES.values()):
        for ch, w in prof.items():
            m[li, _ALPHABET.index(ch)] = w
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norms == 0, 1, norms)


_PROFILES = _profile_matrix()
_LANGS = np.array(list(_LANG_PROFILES))


def _utf8_bytes_and_offsets(arr) -> tuple[np.ndarray, np.ndarray]:
    """(value bytes, row offsets) of a string/binary array (regular or
    large) — offsets normalized to start at 0, correct for sliced arrays
    and both offset widths (int32 for string/binary, int64 for large_*)."""
    la = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    off_dtype = (
        np.int64
        if (pa.types.is_large_string(la.type) or pa.types.is_large_binary(la.type))
        else np.int32
    )
    bufs = la.buffers()
    raw = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] else np.array([], np.uint8)
    all_offsets = np.frombuffer(bufs[1], dtype=off_dtype)
    offsets = all_offsets[la.offset : la.offset + len(la) + 1].astype(np.int64)
    buf = raw[offsets[0] : offsets[-1]]
    return buf, offsets - offsets[0]


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Nearest letter-frequency profile (cosine).  Vectorized: one
    byte-histogram matrix per batch (numpy bincount over a flattened byte
    view), one matmul against the profile matrix."""
    texts = batch[text_col]
    la = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    # flatten utf8 buffer + offsets → per-row letter histograms
    buf, offsets = _utf8_bytes_and_offsets(la)
    lower = np.where((buf >= 65) & (buf <= 90), buf + 32, buf)
    is_alpha = (lower >= 97) & (lower <= 122)
    letter_idx = (lower - 97).astype(np.int64)
    row_idx = np.repeat(
        np.arange(len(la), dtype=np.int64), np.diff(offsets).astype(np.int64)
    )
    sel = is_alpha
    hist = np.zeros((len(la), 26))
    np.add.at(hist, (row_idx[sel], letter_idx[sel]), 1.0)
    norms = np.linalg.norm(hist, axis=1, keepdims=True)
    hist = hist / np.where(norms == 0, 1, norms)
    scores = hist @ _PROFILES.T
    pred = _LANGS[np.argmax(scores, axis=1)]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(pred),
            "confidence": pa.array(np.round(np.max(scores, axis=1), 6)),
        }
    )


# ---------------------------------------------------------------------------
# document fingerprinting — winnowing over token rolling hashes


_FP_BASE = np.uint64(1099511628211)
_FP_SIGN_MASK = np.uint64(0x7FFFFFFFFFFFFFFF)


def fingerprints(
    batch: pa.Table,
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> pa.Table:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): rolling hash of
    k-token shingles, minimum per sliding window, distinct mins kept.

    Output: one row per doc — fingerprint count + min/max fingerprint — a
    compact content signature for plagiarism-style matching.

    Fully segmented/vectorized (no per-row loop): one Arrow split, one
    FNV hash of the flattened token array, a k-step polynomial combine over
    flat shingle-start indices, and the sliding-window min as ``window``
    clamped-gather ``np.minimum`` passes over the flat shingle array with
    per-doc boundaries — same flatten+offsets pattern as
    :func:`raycdc.dedup.word_shingle_hashes`.  Docs with fewer than ``k``
    tokens emit ``(0, 0, 0)``; docs with fewer than ``window`` shingles get
    one window covering all of them (identical to the per-row reference
    semantics this replaced)."""
    from raycdc.partition import hash_strings

    texts = batch[text_col]
    tok = pc.split_pattern(texts, " ")
    la = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok
    toff = la.offsets.to_numpy().astype(np.int64)
    toff = toff - toff[0]
    th = hash_strings(la.flatten())

    n_docs = len(la)
    tok_counts = np.diff(toff)
    sh_counts = np.maximum(tok_counts - k + 1, 0)
    sh_off = np.concatenate([[0], np.cumsum(sh_counts)])
    total = int(sh_off[-1])
    # flat index of the first token of each shingle (segmented arange)
    starts = np.repeat(toff[:-1], sh_counts) + (
        np.arange(total) - np.repeat(sh_off[:-1], sh_counts)
    )
    sh = np.zeros(total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            sh = sh * _FP_BASE + th[starts + j]

    # sliding-window min across the flat shingle array, per-doc bounded:
    # docs with >= window shingles get s_i - window + 1 windows, shorter
    # docs one window; out-of-segment gathers clamp to the segment's last
    # element (min is idempotent, so the clamp never changes the result)
    w_counts = np.where(sh_counts > 0, np.maximum(sh_counts - window + 1, 1), 0)
    w_off = np.concatenate([[0], np.cumsum(w_counts)])
    wtotal = int(w_off[-1])
    seg_start = np.repeat(sh_off[:-1], w_counts)
    seg_last = np.repeat(sh_off[1:], w_counts) - 1
    base = seg_start + (np.arange(wtotal) - np.repeat(w_off[:-1], w_counts))
    mins = sh[base] if wtotal else np.empty(0, dtype=np.uint64)
    for j in range(1, window):
        idx = np.minimum(base + j, seg_last)
        np.minimum(mins, sh[idx], out=mins)

    # distinct mins per doc: doc-major sort, adjacent-dup mask, segment ends
    doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), w_counts)
    order = np.lexsort((mins, doc_ids))
    m_s, d_s = mins[order], doc_ids[order]
    keep = np.ones(wtotal, dtype=bool)
    if wtotal > 1:
        keep[1:] = (m_s[1:] != m_s[:-1]) | (d_s[1:] != d_s[:-1])
    m_u, d_u = m_s[keep], d_s[keep]
    n_fp = np.bincount(d_u, minlength=n_docs).astype(np.int64)
    fp_off = np.concatenate([[0], np.cumsum(n_fp)])
    fp_min = np.zeros(n_docs, dtype=np.int64)
    fp_max = np.zeros(n_docs, dtype=np.int64)
    has = n_fp > 0
    if len(m_u):
        # extremes over the SIGN-MASKED values: the sort order above is
        # unsigned, so taking segment endpoints first and masking after
        # could yield fp_min > fp_max whenever a doc's prints straddle 2^63
        masked = (m_u & _FP_SIGN_MASK).astype(np.int64)
        # reduceat over the NON-EMPTY segment starts only: an empty
        # segment's successor start equals its predecessor's end, so the
        # reduced spans are exactly the non-empty docs' print runs
        nz_starts = fp_off[:-1][has]
        fp_min[has] = np.minimum.reduceat(masked, nz_starts)
        fp_max[has] = np.maximum.reduceat(masked, nz_starts)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_fingerprints": pa.array(n_fp),
            "fp_min": pa.array(fp_min),
            "fp_max": pa.array(fp_max),
        }
    )


def explode_tokens(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str = "token",
) -> pa.Table:
    """Explode each document into one row per whitespace token — the
    flat_map primitive under vocabulary building / TF counting (the
    training-data analog of the reference's per-cell projectors,
    ``/root/reference/handler.go:141-186``, applied along the token axis
    instead of the column axis).

    Fully vectorized: one ``utf8_split_whitespace`` pass, ``list_flatten``
    for the token column, and ``np.repeat`` over the list lengths to carry
    the id alongside — no Python row loop.  Null texts contribute zero
    rows (list_flatten drops them and their length is filled to 0, so ids
    stay aligned).  Empty tokens from boundary whitespace are filtered to
    match SQL ``string_split_regex`` + ``<> ''`` semantics.
    """
    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    lists = pc.utf8_split_whitespace(txt)
    counts = (
        pc.fill_null(pc.list_value_length(lists), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(lists)
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    parents = pa.array(
        np.repeat(ids.to_numpy(zero_copy_only=False), counts)
    ).cast(batch.schema.field(id_col).type)
    out = pa.table({id_col: parents, token_col: flat})
    return out.filter(pc.not_equal(flat, ""))


def _tf_partials(
    batch: pa.Table, text_col: str, id_col: str, num_partitions: int
) -> pa.Table:
    """One batch's ``(doc, token, tf_partial)`` rows, token-bucket tagged —
    the shared map-side combine of :func:`tfidf` and :func:`unigram_nll`
    (their exchanges must stay in lockstep: both bucket by the token hash
    so counts and contributions co-locate)."""
    import polars as pl

    from raycdc.partition import bucket_keys

    toks = explode_tokens(batch, text_col=text_col, id_col=id_col)
    agg = (
        pl.from_arrow(toks)
        .group_by([id_col, "token"])
        .agg(pl.len().alias("tf"))
        .to_arrow()
    )
    agg = agg.set_column(
        agg.schema.get_field_index("token"),
        "token",
        agg["token"].cast(pa.string()),
    ).set_column(
        agg.schema.get_field_index("tf"), "tf", agg["tf"].cast(pa.int64())
    )
    return agg.append_column(
        "__bucket", bucket_keys(agg, ["token"], num_partitions)
    )


def tfidf(
    ds,
    n_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
):
    """Per-(document, token) TF-IDF scores in ONE bucketed exchange.

    Scale design: bucketing by a hash of the TOKEN co-locates every
    occurrence of a token in one task, so term frequency (per doc),
    document frequency (per token), and the final ``tf * ln(N/df)`` score
    are all computed inside the same group task — no second shuffle for
    df, no driver-side vocabulary materialization, no broadcast join.
    The exchange carries per-batch ``(doc_id, token, tf_partial)`` rows
    (map-side combine), never raw token occurrences.

    ``n_docs`` is the corpus size N for the idf term; pass it from
    parquet metadata (a pure metadata read) rather than a ``count()``
    that executes the plan.  Score is floor-quantized to 1e-6 (numpy
    rounds half-even, SQL half-away — repo float-oracle convention).
    """
    import polars as pl

    from raycdc.engine import _configure_shuffle

    _configure_shuffle()

    def partial(batch: pa.Table) -> pa.Table:
        return _tf_partials(batch, text_col, id_col, num_partitions)

    def final(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["__bucket"]))
        tf = df.group_by([id_col, "token"]).agg(pl.col("tf").sum())
        dfreq = tf.group_by("token").agg(pl.len().alias("df"))
        joined = tf.join(dfreq, on="token", how="inner")
        out = joined.to_arrow()
        tf_np = out["tf"].to_numpy()
        df_np = out["df"].combine_chunks().to_numpy().astype(np.float64)
        score = tf_np * np.log(float(n_docs) / df_np)
        return pa.table(
            {
                id_col: out[id_col],
                "token": out["token"].cast(pa.string()),
                "tf": out["tf"].cast(pa.int64()),
                "tfidf": pa.array(np.floor(score * 1e6) / 1e6),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(final, batch_format="pyarrow")
    )


def unigram_nll(
    ds,
    n_total_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
):
    """Per-document unigram-LM negative log-likelihood per token — the
    CCNet-style perplexity proxy used to rank web documents by "how much
    they look like the corpus" (low NLL = common/fluent wording, high NLL
    = noise, rare-token soup, non-language): ``nll(doc) = -(1/T) Σ_t tf_t
    · ln(count(t) / N)`` over the doc's token instances, with counts from
    the corpus ITSELF (self-scoring; score against a reference corpus by
    passing its counts through the same machinery).

    Scale design mirrors :func:`tfidf`: the exchange is bucketed by a
    hash of the TOKEN, so global token counts and each doc's
    contribution rows are computed inside one group task — no vocabulary
    broadcast, no second token shuffle; per-doc partial sums ride a
    second tiny exchange of ``(doc, Σ tf·ln c, Σ tf)`` rows through
    :func:`raycdc.relational.pre_aggregate`.  ``n_total_tokens`` is the
    corpus token count N — a cheap shuffle-free aggregate the caller
    supplies.  Score floor-quantized to 1e-6 (repo float-oracle
    convention).
    """
    import polars as pl

    from raycdc.engine import _configure_shuffle
    from raycdc.relational import pre_aggregate

    _configure_shuffle()

    def partial(batch: pa.Table) -> pa.Table:
        return _tf_partials(batch, text_col, id_col, num_partitions)

    def by_token(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["__bucket"]))
        tf = df.group_by([id_col, "token"]).agg(pl.col("tf").sum())
        cnt = tf.group_by("token").agg(pl.col("tf").sum().alias("cnt"))
        joined = tf.join(cnt, on="token", how="inner").to_arrow()
        tf_np = joined["tf"].to_numpy().astype(np.float64)
        c_np = joined["cnt"].combine_chunks().to_numpy().astype(np.float64)
        contrib = tf_np * np.log(c_np / float(n_total_tokens))
        per_doc = (
            pl.from_arrow(
                pa.table(
                    {
                        id_col: joined[id_col],
                        "sum_log": pa.array(contrib),
                        "n_inst": joined["tf"].cast(pa.int64()),
                    }
                )
            )
            .group_by(id_col)
            .agg(pl.col("sum_log").sum(), pl.col("n_inst").sum())
            .to_arrow()
        )
        return per_doc.set_column(
            per_doc.schema.get_field_index(id_col),
            id_col,
            per_doc[id_col].cast(g.schema.field(id_col).type),
        ).set_column(
            per_doc.schema.get_field_index("n_inst"),
            "n_inst",
            per_doc["n_inst"].cast(pa.int64()),
        )

    partials = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(by_token, batch_format="pyarrow")
    )
    totals = pre_aggregate(
        partials,
        key_cols=[id_col],
        sum_cols=["sum_log", "n_inst"],
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        sl = t["sum_log"].to_numpy(zero_copy_only=False)
        n = t["n_inst"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_inst"].cast(pa.int64()),
                "nll": pa.array(np.floor(-sl / n * 1e6) / 1e6),
            }
        )

    return totals.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Repetition quality signal (the Gopher-style duplicate-n-gram
    filter): per-doc word-bigram counts — total, distinct, and the
    duplicate fraction ``1 - distinct/total`` (0 for docs with < 2
    tokens).  Rides the segmented shingle machinery of
    :func:`raycdc.dedup.word_shingle_hashes` (k=2 distinct hashes per
    doc), so the whole batch is one flatten + hash + offsets pass."""
    from raycdc.dedup import word_shingle_hashes

    t = batch[text_col]
    valid = pc.is_valid(t).to_numpy(zero_copy_only=False)
    n_tok = pc.fill_null(
        pc.list_value_length(pc.split_pattern(t, " ")), 0
    ).to_numpy(zero_copy_only=False)
    n_bigrams = np.maximum(n_tok - 1, 0).astype(np.int64)
    _, off = word_shingle_hashes(t, k=2)
    n_uniq = np.diff(off).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(n_bigrams > 0, 1.0 - n_uniq / np.maximum(n_bigrams, 1), 0.0)
    # null text → null stats (SQL semantics: len(string_split(NULL)) is
    # NULL); without the mask the NaN length wraps to INT64_MIN on cast
    mask = None if valid.all() else ~valid
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_bigrams": pa.array(n_bigrams, mask=mask),
            "n_uniq_bigrams": pa.array(n_uniq, mask=mask),
            # floor-quantize: numpy round is half-even, SQL half-away
            "dup_bigram_ratio": pa.array(np.floor(ratio * 1e6) / 1e6, mask=mask),
        }
    )


# ---------------------------------------------------------------------------
# redaction / normalization (pre-training scrub passes)

# ORDER MATTERS: email before phone (an email's digits must not be
# phone-matched), and each pattern is a single RE2 pass over the whole
# column — never a per-row Python loop.
REDACT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d[\d\-\s]{7,}\d", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_text(
    batch: pa.Table,
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = REDACT_PATTERNS,
    count_col: str | None = "n_redacted",
) -> pa.Table:
    """PII-style scrub: replace every match of each (name, regex,
    replacement) pattern, entirely in Arrow's RE2 kernels
    (``replace_substring_regex`` + ``count_substring_regex``) — the
    batch-level scrub stage an LLM ingest pipeline runs before dedup.
    ``count_col`` (optional) records per-row total replacements so
    downstream filters can drop redaction-heavy documents.
    """
    col = batch[text_col]
    total = None
    if count_col:
        total = np.zeros(len(batch), dtype=np.int64)
    for _, rx, repl in patterns:
        if count_col:
            # null texts count 0 matches — the raw null would round-trip
            # to a float NaN and crash the int64 accumulator
            total += (
                pc.fill_null(pc.count_substring_regex(col, rx), 0)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
        col = pc.replace_substring_regex(col, rx, repl)
    out = batch.set_column(
        batch.schema.get_field_index(text_col), text_col, col
    )
    if count_col:
        out = out.append_column(count_col, pa.array(total))
    return out


def normalize_text(
    batch: pa.Table, text_col: str = "text", out_col: str | None = None
) -> pa.Table:
    """Canonical text form for dedup keys: lowercase + collapse runs of
    whitespace to single spaces + strip edges.  Three Arrow kernel calls,
    zero row loops; the normalized column feeds exact-dedup hashing so
    trivially-reformatted copies collapse."""
    # collapse first, then trim ASCII space only — after the collapse every
    # edge run is a single ' ', and this aligns exactly with SQL
    # trim(x, ' ') (utf8_trim_whitespace would also strip U+3000 etc.,
    # which SQL trim does not)
    col = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(batch[text_col]), r"\s+", " "),
        " ",
    )
    if out_col and out_col != text_col:
        return batch.append_column(out_col, col)
    return batch.set_column(
        batch.schema.get_field_index(text_col), text_col, col
    )


def dedup_paragraphs(
    batch: pa.Table,
    text_col: str = "text",
    sep: str = "\n\n",
    out_col: str | None = None,
) -> pa.Table:
    """INTRA-document paragraph dedup: drop every repeat of a paragraph
    within the same document (first occurrence wins, original order
    kept) and re-join the survivors — the boilerplate-scrub that removes
    repeated headers/footers/navigation blocks pasted multiple times
    into one crawled page (the within-doc sibling of the cross-doc
    :func:`raycdc.dedup.dup_span_stats` family).

    A pure per-batch map (each document is wholly inside its row): split
    → explode → exact first-occurrence unique per (row, paragraph) →
    ordered re-join, all in vectorized polars/Arrow kernels — zero
    exchanges, so the op costs the same per byte at 100 TB as at 100 MB.
    Exact string comparison (no hash-collision risk).  Null text stays
    null; a paragraph-free document round-trips unchanged.
    """
    import polars as pl

    col = batch[text_col]
    df = pl.DataFrame(
        {"__i": np.arange(len(batch), dtype=np.int64)}
    ).with_columns(pl.from_arrow(col).alias("__t"))
    kept = (
        df.filter(pl.col("__t").is_not_null())
        .with_columns(pl.col("__t").str.split(sep).alias("__p"))
        .explode("__p")
        .unique(subset=["__i", "__p"], keep="first", maintain_order=True)
        .group_by("__i", maintain_order=True)
        .agg(pl.col("__p").str.join(sep).alias("__out"))
    )
    # sort: polars documents join row order as UNDEFINED (maintain_order
    # defaults off) and set_column realigns purely by position; cast:
    # polars emits large_string — return the stored offset width
    joined = (
        df.join(kept, on="__i", how="left")
        .sort("__i")["__out"]
        .to_arrow()
        .cast(col.type)
    )
    if out_col and out_col != text_col:
        return batch.append_column(out_col, joined)
    return batch.set_column(
        batch.schema.get_field_index(text_col), text_col, joined
    )


# entity subset every engine agrees on; '&amp;' must decode LAST so
# '&amp;lt;' yields the literal '&lt;', not a double-decoded '<'
_MARKUP_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(
    batch: pa.Table, text_col: str = "text", out_col: str | None = None
) -> pa.Table:
    """HTML/XML boilerplate strip: drop tags, decode the common entity
    subset, collapse whitespace — the first transform a crawled-page
    ingest runs before any quality scoring or dedup.  Entirely Arrow RE2
    / literal-replace kernels (one pass per pattern, no row loop); the
    same chain is expressible verbatim in SQL ``regexp_replace``/
    ``replace``, which is what the oracle runs.
    """
    col = pc.replace_substring_regex(batch[text_col], r"<[^>]*>", " ")
    for ent, repl in _MARKUP_ENTITIES:
        col = pc.replace_substring(col, ent, repl)
    col = pc.utf8_trim(pc.replace_substring_regex(col, r"\s+", " "), " ")
    if out_col and out_col != text_col:
        return batch.append_column(out_col, col)
    return batch.set_column(
        batch.schema.get_field_index(text_col), text_col, col
    )


# ---------------------------------------------------------------------------
# sequence packing (fixed token-budget training bins)


def _next_fit(c: np.ndarray, budget: int) -> np.ndarray:
    """First-item index of every next-fit pack over a CUMULATIVE-SUM
    length array — the one copy of the packing boundary kernel shared by
    :func:`pack_sequences` (items = documents) and :func:`pack_groups`
    (items = whole groups); both SQL oracles mirror exactly this loop's
    semantics, so a boundary fix must land here once (r5 review).  One
    ``searchsorted`` per EMITTED pack; an item whose own size exceeds
    the budget gets a solo pack (truncation is the trainer's call)."""
    starts = []
    start = 0
    base = 0
    n = len(c)
    while start < n:
        end = int(np.searchsorted(c, base + budget, side="right"))
        if end <= start:  # oversize item: solo pack
            end = start + 1
        starts.append(start)
        base = c[end - 1]
        start = end
    return np.array(starts, dtype=np.int64)


def pack_sequences(
    ds,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    budget: int = 2048,
    num_partitions: int = 64,
    pack_col: str = "pack_id",
    pos_col: str = "seq_pos",
):
    """Assign every document to a fixed-token-budget training pack
    (next-fit in id order): each pack's token sum is <= ``budget`` except
    documents individually longer than the budget, which get a solo pack
    (truncation is the trainer's call, not the packer's).

    Distributed shape: one hash-bucketed exchange on ``id_col`` — packing
    is embarrassingly parallel across buckets because a pack never spans
    buckets; ``pack_id = bucket << 32 | local_bin`` is a pure function of
    the data, so re-runs and different input block layouts produce
    identical packs.  Within a bucket the per-bin boundary search runs one
    ``np.searchsorted`` per EMITTED PACK (not per row) over the cumulative
    length array — ~budget/avg_len × fewer iterations than rows; offsets
    within each pack come from the same cumsum, fully vectorized.

    Output: ``id_col``, ``len_col``, ``pack_col`` (int64), ``pos_col``
    (int64 token offset inside the pack).
    """
    import ray.data  # noqa: F401  (ds is a ray.data.Dataset)

    from raycdc.engine import _configure_shuffle
    from raycdc.partition import bucket_keys

    _configure_shuffle()
    if budget < 1:
        raise ValueError("budget must be >= 1")

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", bucket_keys(t, [id_col], num_partitions)
        )

    def pack(g: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                g.schema.field(id_col),
                pa.field(len_col, pa.int64()),
                pa.field(pack_col, pa.int64()),
                pa.field(pos_col, pa.int64()),
            ]
        )
        n = len(g)
        if n == 0:
            return out_schema.empty_table()
        bucket = int(g["__bucket"][0].as_py())
        ids = g[id_col].combine_chunks()
        lens = (
            g[len_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        if (lens < 0).any():
            raise ValueError("negative sequence length")
        order = pc.array_sort_indices(ids).to_numpy(zero_copy_only=False)
        lens_s = lens[order]
        c = np.cumsum(lens_s)
        starts_a = _next_fit(c, budget)
        sizes = np.diff(np.append(starts_a, n))
        local_bin = np.repeat(np.arange(len(starts_a), dtype=np.int64), sizes)
        pack_base = np.repeat(
            np.where(starts_a > 0, c[starts_a - 1], 0), sizes
        )
        pos = c - lens_s - pack_base
        rows = pa.array(order)
        return pa.table(
            {
                id_col: ids.take(rows),
                len_col: pa.array(lens_s),
                pack_col: pa.array((np.int64(bucket) << 32) | local_bin),
                pos_col: pa.array(pos),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(pack, batch_format="pyarrow")
    )


def pack_groups(
    ds,
    group_col: str,
    order_col: str,
    len_col: str = "n_tokens",
    budget: int = 2048,
    num_partitions: int = 64,
    pack_col: str = "pack_id",
    keep_cols: "tuple[str, ...]" = (),
):
    """Pack GROUPS of rows (conversations of turns) into fixed-token-
    budget training sequences, keeping each group contiguous, and emit
    the PER-ROW token spans a trainer needs to build loss masks: each
    turn row comes back with its pack and its ``[span_start, span_end)``
    token interval inside the pack — carry a role/mask column through
    ``keep_cols`` and the non-trained spans fall out directly.  The
    group-aware sibling of :func:`pack_sequences` (which packs
    independent documents and returns one row per document).

    Same determinism contract: one hash-bucketed exchange on
    ``group_col`` (a pack never spans buckets), next-fit over groups in
    ``group_col`` order, ``pack_id = bucket << 32 | local_bin`` — a pure
    function of the data, identical across block layouts and re-runs.
    Groups longer than the budget get a solo pack (truncation is the
    trainer's call).  Per bucket: ONE sort of (group, order), group
    totals via ``np.add.reduceat`` over :func:`raycdc.partition.
    segment_starts`, the same per-EMITTED-PACK ``searchsorted`` loop as
    :func:`pack_sequences` over group totals, then spans come from two
    cumsums — no per-row or per-group Python pass.

    Output: ``group_col, order_col, len_col, pack_col, span_start,
    span_end`` + ``keep_cols`` (passthrough).
    """
    from raycdc.engine import _configure_shuffle
    from raycdc.partition import bucket_keys, segment_starts

    _configure_shuffle()
    if budget < 1:
        raise ValueError("budget must be >= 1")

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", bucket_keys(t, [group_col], num_partitions)
        )

    def pack(g: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                g.schema.field(group_col),
                pa.field(order_col, pa.int64()),
                pa.field(len_col, pa.int64()),
                pa.field(pack_col, pa.int64()),
                pa.field("span_start", pa.int64()),
                pa.field("span_end", pa.int64()),
            ]
            + [g.schema.field(c) for c in keep_cols]
        )
        n = len(g)
        if n == 0:
            return out_schema.empty_table()
        bucket = int(g["__bucket"][0].as_py())
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[
                    (group_col, "ascending"),
                    (order_col, "ascending"),
                ],
            )
        )
        grp = g[group_col].combine_chunks()
        lens = g[len_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if (lens < 0).any():
            raise ValueError("negative sequence length")
        starts = segment_starts(grp)
        sizes = np.diff(np.append(starts, n))
        totals = np.add.reduceat(lens, starts)
        # next-fit over GROUP totals: one searchsorted per emitted pack
        c = np.cumsum(totals)
        n_groups = len(totals)
        p_starts_a = _next_fit(c, budget)
        p_sizes = np.diff(np.append(p_starts_a, n_groups))
        # group-level pack assignment + each group's token offset in it
        g_bin = np.repeat(np.arange(len(p_starts_a), dtype=np.int64), p_sizes)
        pack_base = np.repeat(
            np.where(p_starts_a > 0, c[p_starts_a - 1], 0), p_sizes
        )
        g_pos = c - totals - pack_base  # per group
        # row-level spans: group pack offset + within-group token cumsum
        c_rows = np.cumsum(lens)
        within = c_rows - lens - np.repeat(
            np.where(starts > 0, c_rows[starts - 1], 0), sizes
        )
        span_start = np.repeat(g_pos, sizes) + within
        cols = {
            group_col: grp,
            order_col: g[order_col].combine_chunks().cast(pa.int64()),
            len_col: pa.array(lens),
            pack_col: pa.array(
                (np.int64(bucket) << 32) | np.repeat(g_bin, sizes)
            ),
            "span_start": pa.array(span_start),
            "span_end": pa.array(span_start + lens),
        }
        for ckey in keep_cols:
            cols[ckey] = g[ckey].combine_chunks()
        return pa.table(cols, schema=out_schema)

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(pack, batch_format="pyarrow")
    )


def chunk_tokens(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> pa.Table:
    """Sliding token-window chunking — the context-window prep for
    embedding / retrieval over long documents: each document becomes
    ``ceil(n_tokens / stride)``-ish overlapping chunks of up to
    ``window`` whitespace tokens, starts at every multiple of ``stride``
    below the document's token count (the standard overflow-with-stride
    contract; the tail chunk is shorter, never dropped).  Chunking is
    per-row — NO exchange: call via ``map_batches`` and every chunk of a
    document stays in its producer's block.

    Whitespace tokens are ``split(' ')`` exactly (DuckDB
    ``string_split`` semantics: consecutive spaces yield empty tokens,
    the empty document yields one empty token → one empty chunk), so
    the oracle can rebuild chunk text cell-for-cell with
    ``array_slice + array_to_string``.  Vectorized: one split, then the
    flat-gather construction (repeat + offset arithmetic over the token
    value buffer, one ``take``, one ``pc.binary_join``) — no per-doc or
    per-chunk Python pass.

    Output: ``(id_col, chunk_idx, tok_start, tok_end, n_tokens,
    chunk)``; ``chunk`` keeps the input text column's offset width
    (``string`` in → ``string`` out, ``large_string`` in →
    ``large_string`` out — the repo's both-offset-widths rule).
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    txt_type = batch.schema.field(text_col).type
    large = pa.types.is_large_string(txt_type)
    out_schema = pa.schema(
        [
            batch.schema.field(id_col),
            pa.field("chunk_idx", pa.int64()),
            pa.field("tok_start", pa.int64()),
            pa.field("tok_end", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("chunk", pa.large_string() if large else pa.string()),
        ]
    )
    if len(batch) == 0:
        return out_schema.empty_table()
    toks = pc.split_pattern(batch[text_col], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = pc.list_value_length(toks).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    # chunk starts per doc: 0, stride, 2*stride, ... < n  (n >= 1 always:
    # split of "" is [""])
    n_chunks = (n - 1) // stride + 1
    doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), n_chunks)
    c_off = np.concatenate([[0], np.cumsum(n_chunks)])
    chunk_idx = np.arange(int(c_off[-1]), dtype=np.int64) - np.repeat(
        c_off[:-1], n_chunks
    )
    tok_start = chunk_idx * stride
    tok_end = np.minimum(tok_start + window, n[doc_of])
    lens = tok_end - tok_start
    # flat token gather: flatten() respects slices and yields exactly
    # the rows' tokens in order, so the per-doc bases are the cumsum of
    # the row lengths (never the raw offsets buffer, which keeps the
    # pre-slice positions); null text rows would desync this — the doc
    # corpus contract is non-null text
    flat = toks.flatten()
    doc_off = np.concatenate([[0], np.cumsum(n)])[:-1]
    flat_start = doc_off[doc_of] + tok_start
    out_off = np.concatenate([[0], np.cumsum(lens)])
    flat_idx = np.repeat(flat_start, lens) + (
        np.arange(int(out_off[-1]), dtype=np.int64)
        - np.repeat(out_off[:-1], lens)
    )
    # int64 list offsets: the gathered token count is ~window/stride ×
    # the batch's input tokens, which can clear int32 on large blocks —
    # and LargeListArray pairs with both string widths' join kernels
    # (large_list<string> + str sep, large_list<large_string> +
    # large_string sep — both probed; the mixed pairs have no kernel)
    chunk_lists = pa.LargeListArray.from_arrays(
        pa.array(out_off, pa.int64()), flat.take(pa.array(flat_idx))
    )
    sep = pa.scalar(" ", pa.large_string()) if large else " "
    return pa.table(
        {
            id_col: batch[id_col].take(pa.array(doc_of)),
            "chunk_idx": pa.array(chunk_idx),
            "tok_start": pa.array(tok_start),
            "tok_end": pa.array(tok_end),
            "n_tokens": pa.array(lens),
            "chunk": pc.binary_join(chunk_lists, sep),
        },
        schema=out_schema,
    )


def _pair_partials(
    batch: pa.Table, text_col: str, id_col: str, num_partitions: int
) -> pa.Table:
    """One batch's ``(doc, w1, w2, tf)`` ADJACENT-token-pair rows,
    bucket-tagged by the hash of the FIRST token — the map-side combine
    of :func:`bigram_nll`.  Bucketing by the conditioning token is the
    point: every pair ``(w1, ·)`` AND every other pair starting with
    ``w1`` land in one group task, so the conditional's numerator
    (pair count) and denominator (first-token continuation count)
    colocate with zero extra exchange.  Tokens are ``split(' ')``
    exactly (the :func:`chunk_tokens` / DuckDB ``string_split``
    convention, empties kept) so adjacency is identical on both sides
    of the oracle."""
    import polars as pl

    from raycdc.partition import bucket_keys

    txt = batch[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    toks = pc.split_pattern(txt, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = pc.list_value_length(toks).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    n_pairs = np.maximum(n - 1, 0)
    total = int(n_pairs.sum())
    out_schema = pa.schema(
        [
            batch.schema.field(id_col),
            pa.field("w1", pa.string()),
            pa.field("w2", pa.string()),
            pa.field("tf", pa.int64()),
            pa.field("__bucket", pa.int64()),
        ]
    )
    if total == 0:
        return out_schema.empty_table()
    flat = toks.flatten()
    doc_off = np.concatenate([[0], np.cumsum(n)])[:-1]
    doc_of = np.repeat(np.arange(len(batch), dtype=np.int64), n_pairs)
    p_off = np.concatenate([[0], np.cumsum(n_pairs)])
    within = np.arange(total, dtype=np.int64) - np.repeat(
        p_off[:-1], n_pairs
    )
    i1 = pa.array(doc_off[doc_of] + within)
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    pairs = pa.table(
        {
            id_col: ids.take(pa.array(doc_of)),
            "w1": flat.take(i1).cast(pa.string()),
            "w2": flat.take(pc.add(i1, 1)).cast(pa.string()),
        }
    )
    agg = (
        pl.from_arrow(pairs)
        .group_by([id_col, "w1", "w2"])
        .agg(pl.len().alias("tf"))
        .to_arrow()
    )
    agg = pa.table(
        {
            id_col: agg[id_col].cast(batch.schema.field(id_col).type),
            "w1": agg["w1"].cast(pa.string()),
            "w2": agg["w2"].cast(pa.string()),
            "tf": agg["tf"].cast(pa.int64()),
        }
    )
    return agg.append_column(
        "__bucket", bucket_keys(agg, ["w1"], num_partitions)
    ).cast(out_schema)


def bigram_nll(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
):
    """Per-document BIGRAM-LM negative log-likelihood per pair — the
    conditional-probability upgrade of :func:`unigram_nll`: ``nll(doc) =
    -(1/P) Σ tf · ln(count(w1,w2) / count(w1,·))`` with counts from the
    corpus itself (MLE bigram model, no smoothing — every observed pair
    has corpus support by construction, so the log never sees zero).
    Ranks documents by local fluency: formulaic/templated text scores
    low, shuffled-word soup scores high even when its unigrams are
    common — exactly what the unigram proxy cannot see.

    ONE token exchange, like :func:`tfidf` / :func:`unigram_nll` — but
    bucketed by the CONDITIONING token, so the numerator (pair count)
    and denominator (first-token continuation count) are computed inside
    the same group task; per-doc partials then ride the tiny
    ``(doc, Σ tf·ln p, Σ tf)`` exchange through
    :func:`raycdc.relational.pre_aggregate`.  Documents with fewer than
    two tokens have no pairs and yield no row (both sides of the oracle
    drop them).  Score floor-quantized to 1e-6 (repo float convention).
    """
    import polars as pl

    from raycdc.engine import _configure_shuffle
    from raycdc.relational import pre_aggregate

    _configure_shuffle()

    def partial(batch: pa.Table) -> pa.Table:
        return _pair_partials(batch, text_col, id_col, num_partitions)

    def by_first_token(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["__bucket"]))
        tf = df.group_by([id_col, "w1", "w2"]).agg(pl.col("tf").sum())
        cp = tf.group_by(["w1", "w2"]).agg(pl.col("tf").sum().alias("cnt_pair"))
        cf = cp.group_by("w1").agg(pl.col("cnt_pair").sum().alias("cnt_first"))
        joined = (
            tf.join(cp, on=["w1", "w2"], how="inner")
            .join(cf, on="w1", how="inner")
            .to_arrow()
        )
        tf_np = joined["tf"].to_numpy().astype(np.float64)
        num = joined["cnt_pair"].to_numpy().astype(np.float64)
        den = joined["cnt_first"].to_numpy().astype(np.float64)
        contrib = tf_np * np.log(num / den)
        per_doc = (
            pl.from_arrow(
                pa.table(
                    {
                        id_col: joined[id_col],
                        "sum_log": pa.array(contrib),
                        "n_inst": joined["tf"].cast(pa.int64()),
                    }
                )
            )
            .group_by(id_col)
            .agg(pl.col("sum_log").sum(), pl.col("n_inst").sum())
            .to_arrow()
        )
        return pa.table(
            {
                id_col: per_doc[id_col].cast(g.schema.field(id_col).type),
                "sum_log": per_doc["sum_log"],
                "n_inst": per_doc["n_inst"].cast(pa.int64()),
            }
        )

    partials = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(by_first_token, batch_format="pyarrow")
    )
    totals = pre_aggregate(
        partials,
        key_cols=[id_col],
        sum_cols=["sum_log", "n_inst"],
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        sl = t["sum_log"].to_numpy(zero_copy_only=False)
        n = t["n_inst"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_pairs": t["n_inst"].cast(pa.int64()),
                "nll": pa.array(np.floor(-sl / n * 1e6) / 1e6),
            }
        )

    return totals.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def bigram_nll_ref(
    ds,
    ref,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    num_partitions: int = 16,
):
    """Per-document bigram NLL scored against a REFERENCE corpus — the
    CCNet-style quality filter: train the (smoothed) bigram model on a
    clean corpus (``ref``), score every candidate document by how
    plausible its adjacent-token transitions are under that model.
    :func:`bigram_nll` self-scores; this separates model and data, which
    is what decontamination-adjacent filtering actually wants.

    Smoothing is Lidstone PER CONDITIONING TOKEN — chosen precisely
    because it is bucket-local: ``p(w2|w1) = (cnt(w1,w2) + α) /
    (cnt(w1,·) + α·(K(w1) + 1))`` where ``K(w1)`` is the number of
    distinct continuations of ``w1`` in the reference (the ``+ 1``
    reserves unseen mass), and a pair whose ``w1`` never occurs in the
    reference contributes the fixed OOV penalty ``ln(α / (1 + α))``.
    Every term is computable inside ONE group task because the exchange
    buckets BOTH corpora's pairs by the conditioning token — reference
    counts and candidate contributions colocate, zero extra shuffle,
    and the whole formula is SQL-mirrorable for the oracle.

    Output: ``(id_col, n_pairs, nll)`` for the CANDIDATE corpus;
    documents with fewer than two tokens yield no row.  Score
    floor-quantized to 1e-6.
    """
    import polars as pl

    from raycdc.engine import _configure_shuffle
    from raycdc.relational import pre_aggregate

    _configure_shuffle()
    if alpha <= 0:
        raise ValueError(f"bigram_nll_ref: alpha must be > 0, got {alpha}")

    def score_partial(batch: pa.Table) -> pa.Table:
        t = _pair_partials(batch, text_col, id_col, num_partitions)
        return t.append_column(
            "__ref", pa.array(np.zeros(len(t), dtype=np.int8))
        )

    def ref_partial(batch: pa.Table) -> pa.Table:
        t = _pair_partials(batch, text_col, id_col, num_partitions)
        return t.append_column(
            "__ref", pa.array(np.ones(len(t), dtype=np.int8))
        )

    def by_first_token(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["__bucket"]))
        refs = df.filter(pl.col("__ref") == 1)
        cand = df.filter(pl.col("__ref") == 0)
        out_schema = pa.table(
            {
                id_col: g[id_col].slice(0, 0),
                "sum_log": pa.array([], pa.float64()),
                "n_inst": pa.array([], pa.int64()),
            }
        ).schema
        if len(cand) == 0:
            return out_schema.empty_table()
        cp = refs.group_by(["w1", "w2"]).agg(
            pl.col("tf").sum().alias("cnt_pair")
        )
        cf = cp.group_by("w1").agg(
            pl.col("cnt_pair").sum().alias("cnt_first"),
            pl.len().alias("k"),
        )
        tf = cand.group_by([id_col, "w1", "w2"]).agg(pl.col("tf").sum())
        joined = (
            tf.join(cp, on=["w1", "w2"], how="left")
            .join(cf, on="w1", how="left")
            .to_arrow()
        )
        tf_np = joined["tf"].to_numpy().astype(np.float64)
        num = joined["cnt_pair"].to_numpy(zero_copy_only=False)
        den = joined["cnt_first"].to_numpy(zero_copy_only=False)
        k = joined["k"].to_numpy(zero_copy_only=False)
        seen_w1 = ~np.isnan(den.astype(np.float64))
        num = np.nan_to_num(num.astype(np.float64), nan=0.0)
        den = np.nan_to_num(den.astype(np.float64), nan=0.0)
        k = np.nan_to_num(k.astype(np.float64), nan=0.0)
        p = np.where(
            seen_w1,
            (num + alpha) / (den + alpha * (k + 1.0)),
            alpha / (1.0 + alpha),
        )
        contrib = tf_np * np.log(p)
        per_doc = (
            pl.from_arrow(
                pa.table(
                    {
                        id_col: joined[id_col],
                        "sum_log": pa.array(contrib),
                        "n_inst": joined["tf"].cast(pa.int64()),
                    }
                )
            )
            .group_by(id_col)
            .agg(pl.col("sum_log").sum(), pl.col("n_inst").sum())
            .to_arrow()
        )
        return pa.table(
            {
                id_col: per_doc[id_col].cast(g.schema.field(id_col).type),
                "sum_log": per_doc["sum_log"],
                "n_inst": per_doc["n_inst"].cast(pa.int64()),
            }
        )

    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    tagged = ds.map_batches(score_partial, **kw).union(
        ref.map_batches(ref_partial, **kw)
    )
    partials = tagged.groupby("__bucket", num_partitions=num_partitions).map_groups(
        by_first_token, batch_format="pyarrow"
    )
    totals = pre_aggregate(
        partials,
        key_cols=[id_col],
        sum_cols=["sum_log", "n_inst"],
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        sl = t["sum_log"].to_numpy(zero_copy_only=False)
        n = t["n_inst"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_pairs": t["n_inst"].cast(pa.int64()),
                "nll": pa.array(np.floor(-sl / n * 1e6) / 1e6),
            }
        )

    return totals.map_batches(finish, **kw)
