"""Tests for the training-data operator families: text analysis, dedup
(exact / MinHash-LSH / SimHash / Jaccard), and similarity search."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data

from raycdc import dedup as D
from raycdc import similarity as S
from raycdc import text as T

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def docs():
    return pq.read_table(DOCS, columns=["doc_id", "text"])


# --- text ------------------------------------------------------------------


def test_token_stats_vs_python(docs):
    b = docs.slice(0, 50)
    out = T.token_stats(b)
    texts = b["text"].to_pylist()
    for i in (0, 7, 23):
        toks = texts[i].split(" ")
        assert out["n_tokens"][i].as_py() == len(toks)
        assert out["n_uniq_tokens"][i].as_py() == len(set(toks))
        assert out["n_stopwords"][i].as_py() == sum(t in ("the", "a") for t in toks)
        assert out["n_chars"][i].as_py() == len(texts[i])


def test_lang_id_deterministic_and_valid(docs):
    b = docs.slice(0, 30)
    o1, o2 = T.lang_id(b), T.lang_id(b)
    assert o1.equals(o2)
    assert set(o1["pred_lang"].to_pylist()) <= {"en", "es", "de", "fr", "zh"}


def test_fingerprints_detect_copy_and_differ(docs):
    b = docs.slice(0, 10)
    fp = T.fingerprints(b)
    fp2 = T.fingerprints(b)  # deterministic
    assert fp.equals(fp2)
    # identical text ⇒ identical fingerprints; different text ⇒ different
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([b["text"][0].as_py(), b["text"][0].as_py(),
                                    b["text"][1].as_py()])})
    f = T.fingerprints(t)
    assert f["fp_min"][0].as_py() == f["fp_min"][1].as_py()
    assert f["fp_max"][0].as_py() == f["fp_max"][1].as_py()
    assert (
        f["fp_min"][2].as_py(),
        f["fp_max"][2].as_py(),
    ) != (f["fp_min"][0].as_py(), f["fp_max"][0].as_py())


def test_fingerprints_match_per_row_reference(docs):
    """The segmented winnowing kernel must equal a naive per-row
    implementation (same token hash, rolling combine, window min, distinct
    set) — including the short-doc edge cases (< k tokens, < window
    shingles)."""
    from raycdc.partition import hash_strings

    b = pa.table(
        {
            "doc_id": pa.array(np.arange(6, dtype=np.int64)),
            "text": pa.array(
                [
                    docs["text"][0].as_py(),
                    "one two",  # < k tokens
                    "a b c",  # exactly k → 1 shingle (< window)
                    "a b c d e",  # 3 shingles (< window)
                    "w x y z w x y z w",  # > window shingles, repeats
                    "",
                ]
            ),
        }
    )
    out = T.fingerprints(b, k=3, window=4)
    for i, text in enumerate(b["text"].to_pylist()):
        toks = text.split(" ") if text else []
        if len(toks) < 3:
            assert out["n_fingerprints"][i].as_py() == 0
            continue
        th = hash_strings(pa.array(toks))
        sh = np.zeros(len(toks) - 2, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(3):
                sh = sh * np.uint64(1099511628211) + th[j : j + len(sh)]
        if len(sh) >= 4:
            mins = np.lib.stride_tricks.sliding_window_view(sh, 4).min(axis=1)
        else:
            mins = np.array([sh.min()], dtype=np.uint64)
        fps = np.unique(mins)
        mask = np.uint64(0x7FFFFFFFFFFFFFFF)
        assert out["n_fingerprints"][i].as_py() == len(fps)
        # extremes over the MASKED domain (mask-then-max): masking after
        # the unsigned max could yield fp_min > fp_max across the 2^63 line
        assert out["fp_min"][i].as_py() == int((fps & mask).min())
        assert out["fp_max"][i].as_py() == int((fps & mask).max())
        assert out["fp_min"][i].as_py() <= out["fp_max"][i].as_py()


def test_shingle_hashes_match_python_sets(docs):
    texts = docs.slice(0, 5)["text"]
    sh, off = D.word_shingle_hashes(texts, k=3)
    for i, text in enumerate(texts.to_pylist()):
        toks = text.split(" ")
        n_expected = len({tuple(toks[j : j + 3]) for j in range(len(toks) - 2)})
        assert off[i + 1] - off[i] == n_expected


# --- dedup -----------------------------------------------------------------


@pytest.fixture(scope="module")
def dup_corpus(docs):
    base = docs.slice(0, 60)
    exact = pa.table(
        {"doc_id": pc.add(base["doc_id"], 1000), "text": base["text"]}
    )
    near = pa.table(
        {
            "doc_id": pc.add(base["doc_id"], 2000),
            "text": pc.binary_join_element_wise(base["text"], " zzz", ""),
        }
    )
    return pa.concat_tables([base, exact, near])


def test_exact_dedup_keeps_min_id(ray_session, dup_corpus):
    out = D.exact_dedup(
        ray.data.from_arrow(dup_corpus), num_partitions=8
    ).to_pandas()
    # exact copies collapse to the original ids; near copies survive
    assert len(out) == 120
    assert out["doc_id"].max() >= 2000
    assert not set(range(1000, 1060)) & set(out["doc_id"])


def test_minhash_lsh_finds_near_dups(ray_session, dup_corpus):
    ds = ray.data.from_arrow(dup_corpus)
    sigs = ds.map_batches(D.minhash_signatures, batch_format="pyarrow")
    pairs = D.lsh_candidate_pairs(sigs, bands=32, num_partitions=8)
    ver = D.verify_jaccard_pairs(pairs, dup_corpus, threshold=0.8).to_pandas()
    found = set(zip(ver["a"], ver["b"]))
    # every exact-copy pair must be found (jaccard 1.0)
    base_ids = dup_corpus["doc_id"].to_pylist()[:60]
    for i in base_ids:
        assert (i, i + 1000) in found, f"missing exact pair {i}"
    assert (ver["jaccard"] <= 1.0).all() and (ver["jaccard"] >= 0.8).all()


def test_minhash_estimates_jaccard():
    # signature agreement rate ≈ true jaccard
    a = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["w0 " * 50 + "x y z", "w0 " * 50 + "p q r"])})
    sig = D.minhash_signatures(a, num_perm=128)
    s = np.array(sig["sig"].to_pylist())
    est = (s[0] == s[1]).mean()
    sh, off = D.word_shingle_hashes(a["text"], k=3)
    sa, sb = sh[off[0]:off[1]], sh[off[1]:off[2]]
    true_j = len(np.intersect1d(sa, sb)) / len(np.union1d(sa, sb))
    assert abs(est - true_j) < 0.15


def test_simhash_exact_copy_hamming_zero(ray_session, dup_corpus):
    ds = ray.data.from_arrow(dup_corpus)
    sigs = ds.map_batches(D.simhash_signatures, batch_format="pyarrow")
    pairs = D.simhash_candidate_pairs(sigs, max_hamming=3, num_partitions=8).to_pandas()
    found = {(r.a, r.b): r.hamming for r in pairs.itertuples()}
    base_ids = dup_corpus["doc_id"].to_pylist()[:60]
    for i in base_ids:
        assert found.get((i, i + 1000)) == 0, f"exact pair {i} not at hamming 0"


# --- similarity ------------------------------------------------------------


@pytest.fixture(scope="module")
def emb_table():
    return pq.read_table(EMB, columns=["vec_id", "embedding"])


def _np_topk(m, q, k):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    s = qn @ mn.T
    out = []
    for row in s:
        order = np.lexsort((np.arange(len(row)), -row))[:k]
        out.append(order)
    return out


def test_knn_brute_force_matches_numpy(ray_session, emb_table):
    m = S._to_matrix(emb_table["embedding"])
    ids = emb_table["vec_id"].to_numpy()
    q, qids = m[:3], ids[:3]
    res = (
        S.knn_brute_force(ray.data.from_arrow(emb_table), q, qids, k=5)
        .to_pandas()
        .sort_values(["q_id", "rank"])
    )
    expected = _np_topk(m, q, 5)
    for qi, qid in enumerate(qids):
        got = res[res.q_id == qid].sort_values("rank")["vec_id"].tolist()
        assert got == list(ids[expected[qi]])


def test_knn_lsh_recall_measured(ray_session, emb_table):
    m = S._to_matrix(emb_table["embedding"])
    ids = emb_table["vec_id"].to_numpy()
    q, qids = m[:10], ids[:10]
    ds = ray.data.from_arrow(emb_table)
    exact = S.knn_brute_force(ds, q, qids, k=5).to_pandas()
    approx = S.knn_lsh(ds, q, qids, k=5, nbits=4, num_partitions=8).to_pandas()
    # every query finds ITSELF at rank 1 (same bucket by construction)
    r1 = approx[approx["rank"] == 1]
    assert set(r1["q_id"]) == set(qids)
    assert (r1["q_id"] == r1["vec_id"]).all()
    # recall vs exact: measured, and multi-probe must beat single-probe
    e = set(zip(exact["q_id"], exact["vec_id"]))
    a = set(zip(approx["q_id"], approx["vec_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.3  # default nprobe=4 (single-probe measured ~0.24)
    single = S.knn_lsh(
        ds, q, qids, k=5, nbits=4, nprobe=1, num_partitions=8
    ).to_pandas()
    s = set(zip(single["q_id"], single["vec_id"]))
    assert recall >= len(e & s) / len(e)


def test_knn_lsh_multiprobe_finds_planted_neighbors(ray_session, emb_table):
    """Plant one near-copy per query: multi-probe must retrieve EVERY
    planted neighbor (single-probe misses those whose perturbation crosses
    one low-margin hyperplane — exactly the bits multi-probe flips)."""
    m = S._to_matrix(emb_table["embedding"])
    ids = emb_table["vec_id"].to_numpy()
    q, qids = m[:5], ids[:5]
    rng = np.random.default_rng(0)
    planted = m[:5] * 0.98 + rng.standard_normal(m[:5].shape) * 0.01
    corpus = pa.table(
        {
            "vec_id": pa.array(
                np.concatenate([ids, np.arange(5) + 500000]).astype(np.int64)
            ),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate([m, planted]).reshape(-1).astype(np.float32)),
                m.shape[1],
            ),
        }
    )
    ds = ray.data.from_arrow(corpus)
    ap = S.knn_lsh(ds, q, qids, k=5, nbits=8, nprobe=4, num_partitions=8).to_pandas()
    got = set(zip(ap["q_id"], ap["vec_id"]))
    assert all((qid, 500000 + i) in got for i, qid in enumerate(qids))


def test_embedding_near_dup_finds_perturbed_copies(ray_session, emb_table):
    m = S._to_matrix(emb_table["embedding"])[:100]
    ids = np.arange(100, dtype=np.int64)
    corpus = pa.table(
        {
            "vec_id": pa.array(np.concatenate([ids, ids + 1000])),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(
                    np.concatenate([m, m * 1.01 + 0.001]).reshape(-1).astype(np.float32)
                ),
                m.shape[1],
            ),
        }
    )
    out = S.embedding_near_dup_pairs(
        ray.data.from_arrow(corpus), threshold=0.99, nbits=4, num_partitions=8
    ).to_pandas()
    found = set(zip(out["a"], out["b"]))
    hits = sum((i, i + 1000) in found for i in ids)
    # multi-probe (nprobe=2 default): boundary-straddling pairs are reached
    # via the low-margin bit flip (single-probe measured ~90-95 here)
    assert hits >= 98
    assert (out["cosine"] >= 0.99).all()
    assert len(out) == len(found)  # cross-bucket rediscoveries deduped


def test_unigram_nll_matches_reference(ray_session):
    """Self-scored unigram NLL: common-token docs score LOW, rare-token
    docs HIGH; values match a plain-Python counter reference after the
    1e-6 floor quantization; empty docs are absent."""
    import math
    from collections import Counter

    texts = [
        "the cat sat on the mat",
        "the cat sat on the rug",
        "zq xv wq jj kk",          # all-rare: highest nll
        "the the the the",         # most-common token only: lowest nll
        "",                        # no tokens: no row
    ]
    corpus = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    )
    counts = Counter(tok for t in texts for tok in t.split() if tok)
    n_total = sum(counts.values())

    def ref_nll(t):
        toks = [x for x in t.split() if x]
        return math.floor(
            -sum(math.log(counts[x] / n_total) for x in toks)
            / len(toks) * 1e6
        ) / 1e6

    out = (
        T.unigram_nll(ray.data.from_arrow(corpus), n_total, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 1, 2, 3]
    for _, row in out.iterrows():
        # iterrows coerces the mixed-dtype row to float — index with int
        i = int(row["doc_id"])
        assert row["n_tokens"] == len(texts[i].split())
        assert abs(row["nll"] - ref_nll(texts[i])) < 2e-6
    nll = dict(zip(out["doc_id"], out["nll"]))
    assert nll[3] < nll[0] < nll[2]  # common < mixed < all-rare


def test_semantic_dedup_keeps_one_per_chain(ray_session, emb_table):
    """SemDeDup: k-means clusters confine the pairwise compare; a 3-variant
    near-dup chain collapses transitively to its min-id representative;
    unduplicated vectors pass through untouched."""
    m = S._to_matrix(emb_table["embedding"])[:100]
    ids = np.arange(100, dtype=np.int64)
    # chain copies for the first 30 ids only: id ~ id+1000 ~ id+2000
    base = m[:30]
    v1 = base * 1.01 + 0.001
    v2 = v1 * 1.02 + 0.002
    corpus = pa.table(
        {
            "vec_id": pa.array(
                np.concatenate([ids, ids[:30] + 1000, ids[:30] + 2000])
            ),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(
                    np.concatenate([m, v1, v2]).reshape(-1).astype(np.float32)
                ),
                m.shape[1],
            ),
        }
    )
    out = S.semantic_dedup(
        ray.data.from_arrow(corpus),
        threshold=0.99,
        n_clusters=8,
        num_partitions=8,
    ).to_pandas()
    assert sorted(out["vec_id"]) == list(range(100))  # copies gone, rest kept


def test_cap_counter_records_truncation():
    """Degenerate bucket (one band key shared by > max_bucket docs) must
    increment the process-local CAPS counter and log a raycdc.caps warning —
    the no-silent-caps rule."""
    import logging

    from raycdc.metrics import CAPS

    CAPS.reset()
    n = 40
    group = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    out = D.bucket_pairs(group, max_bucket=10)
    snap = CAPS.snapshot()
    assert snap["buckets_truncated"]["bucket_pairs"] == 1
    assert snap["ids_dropped"]["bucket_pairs"] == n - 10
    assert len(out) == 10 * 9 // 2  # pairs from the capped prefix only

    # log line is emitted on the raycdc.caps logger
    logger = logging.getLogger("raycdc.caps")
    records = []
    h = logging.Handler()
    h.emit = records.append
    logger.addHandler(h)
    try:
        D.bucket_pairs(group, max_bucket=10)
    finally:
        logger.removeHandler(h)
    assert any("bucket_pairs" in r.getMessage() for r in records)

    # uncapped bucket: no counting
    CAPS.reset()
    D.bucket_pairs(group, max_bucket=1024)
    assert CAPS.snapshot()["buckets_truncated"] == {}


def test_hll_accuracy_and_merge(ray_session):
    """HLL estimate within 3x the standard error at several cardinalities,
    insensitive to duplication, and merge-associative (partials over blocks
    equal one-shot registers)."""
    from raycdc import sketch as K

    for true_n in (100, 5_000, 50_000):
        vals = pa.array([f"user-{i}" for i in range(true_n)] * 2)  # dup x2
        regs = K.hll_registers(vals, p=12)
        est = K.hll_estimate(regs)
        rse = 1.04 / np.sqrt(1 << 12)
        assert abs(est - true_n) / true_n < 3 * rse + 0.01, (true_n, est)

    # distributed fold == single fold
    ds = ray.data.from_arrow(
        pa.table({"u": pa.array([f"u{i % 777}" for i in range(10_000)])})
    ).repartition(8)
    est, _ = K.approx_ndistinct(ds, "u", p=12)
    assert abs(est - 777) / 777 < 0.1

    # integer columns hash through the splitmix path
    ints = pa.array(np.arange(1000, dtype=np.int64))
    est_i = K.hll_estimate(K.hll_registers(ints, p=12))
    assert abs(est_i - 1000) / 1000 < 0.1


def test_tdigest_accuracy_and_merge(ray_session):
    """t-digest quantiles within tolerance on three distribution shapes,
    and the distributed fold (per-block digests merged) tracks a
    single-shot digest."""
    from raycdc import sketch as K

    rng = np.random.default_rng(3)
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    for data, tol in (
        (rng.uniform(0, 1, 100_000), 0.02),
        (rng.lognormal(0, 1, 100_000), 0.02),
        (np.concatenate([rng.normal(0, 1, 50_000), rng.normal(50, 2, 50_000)]), 0.1),
    ):
        m, w = K.tdigest_cluster(data)
        assert len(m) <= 300  # bounded size
        est = K.tdigest_quantile(m, w, qs)
        exact = np.quantile(data, qs)
        rel = np.abs(est - exact) / (np.abs(exact) + 1e-9)
        assert rel.max() < tol, (rel, tol)

    # distributed: per-block digests folded == close to exact
    data = rng.lognormal(0, 1, 60_000)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(data)})).repartition(8)
    est = K.approx_quantiles(ds, "v", qs)
    exact = np.quantile(data, qs)
    assert (np.abs(est - exact) / (np.abs(exact) + 1e-9)).max() < 0.03

    # merge associativity (up to compression): two halves vs whole
    a = K.tdigest_cluster(data[:30_000])
    b = K.tdigest_cluster(data[30_000:])
    m2, w2 = K.tdigest_merge([a, b])
    est2 = K.tdigest_quantile(m2, w2, qs)
    assert (np.abs(est2 - exact) / (np.abs(exact) + 1e-9)).max() < 0.03
    # NaNs are ignored, empty input yields NaN estimates
    m3, w3 = K.tdigest_cluster(np.array([np.nan, 1.0, np.nan, 3.0]))
    assert abs(K.tdigest_quantile(m3, w3, [0.5])[0] - 2.0) < 1.01
    assert np.isnan(K.tdigest_quantile(*K.tdigest_cluster(np.array([])), [0.5])[0])


def test_exact_dedup_hash128_equals_text_mode(ray_session, dup_corpus):
    """The hash-identity scale path must produce exactly the text-compare
    result (and reject unknown identity modes)."""
    a = (
        D.exact_dedup(ray.data.from_arrow(dup_corpus), num_partitions=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        D.exact_dedup(
            ray.data.from_arrow(dup_corpus), num_partitions=8, identity="hash128"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    with pytest.raises(ValueError, match="identity"):
        D.exact_dedup(ray.data.from_arrow(dup_corpus), identity="nope")


def test_exact_dedup_hash128_duplicate_id_is_loud(ray_session):
    """hash128 filters the corpus BY ID: a duplicate (id, text) pair would
    put the winner's own id in the loser set and silently delete the text.
    The loser kernel detects the adjacent duplicate and raises; the text
    mode handles the same multiset input exactly (one surviving row)."""
    t = pa.table(
        {
            "doc_id": pa.array([7, 7, 9], pa.int64()),
            "text": pa.array(["same", "same", "other"]),
        }
    )
    with pytest.raises(Exception, match="duplicate doc_id=7"):
        D.exact_dedup(
            ray.data.from_arrow(t), num_partitions=4, identity="hash128"
        ).count()
    ok = D.exact_dedup(ray.data.from_arrow(t), num_partitions=4).to_pandas()
    assert sorted(ok["doc_id"]) == [7, 9]


def test_repetition_stats_vs_python():
    b = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["a b a b a b", "w x y z", "solo", "a a a a"]
            ),
        }
    )
    out = T.repetition_stats(b)
    for i, text in enumerate(b["text"].to_pylist()):
        toks = text.split(" ")
        bigrams = [f"{toks[j]} {toks[j+1]}" for j in range(len(toks) - 1)]
        assert out["n_bigrams"][i].as_py() == len(bigrams)
        assert out["n_uniq_bigrams"][i].as_py() == len(set(bigrams))
        expect = 1 - len(set(bigrams)) / len(bigrams) if bigrams else 0.0
        import math

        assert abs(out["dup_bigram_ratio"][i].as_py() - math.floor(expect * 1e6) / 1e6) < 1e-9


def test_contamination_overlap_semantics(ray_session):
    """Benchmark decontamination: a doc sharing any 3-gram with the
    benchmark is flagged with its DISTINCT shared-shingle count; clean
    docs, sub-3-token docs, and repeated shingles are handled exactly."""
    from raycdc.dedup import contamination_overlap

    corpus = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "the quick brown fox jumps",   # benchmark doc itself
                    "a quick brown fox runs",      # shares "quick brown fox"
                    "totally different words here",  # clean
                    "too short",                   # < 3 tokens: never flagged
                    # repeated shingle must count ONCE (distinct semantics)
                    "quick brown fox quick brown fox",
                ]
            ),
        }
    )
    bench = corpus.filter(pa.array([True, False, False, False, False]))
    out = (
        contamination_overlap(
            ray.data.from_arrow(corpus), ray.data.from_arrow(bench)
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = dict(zip(out["doc_id"], out["n_overlap"]))
    # doc 0: its own 3 shingles; doc 1: only "quick brown fox"; doc 4:
    # shares "quick brown fox" (distinct -> 1) despite appearing twice
    assert got == {0: 3, 1: 1, 4: 1}

    # empty benchmark -> nothing flagged, schema intact
    empty = contamination_overlap(
        ray.data.from_arrow(corpus), ray.data.from_arrow(corpus.slice(0, 0))
    ).to_pandas()
    assert len(empty) == 0


def _brute_dup_fraction(texts, k=3):
    """Per-doc reference: distinct k-token shingles and how many of them
    occur in at least one OTHER doc — plain Python sets."""
    shingles = [
        {
            "|".join(toks[i : i + k])
            for i in range(len(toks) - k + 1)
        }
        for toks in (t.split(" ") for t in texts)
    ]
    out = {}
    for i, s in enumerate(shingles):
        if not s:
            continue
        others = set().union(*(x for j, x in enumerate(shingles) if j != i))
        nd = len(s & others)
        out[i] = (len(s), nd)
    return out


def test_cross_doc_dup_fraction_semantics(ray_session):
    """Cross-doc repetition: dup = shingle present in >1 DISTINCT doc;
    within-doc repeats don't self-inflate; sub-k docs are absent; the
    fraction floor-quantizes to 1e-6."""
    texts = [
        "the quick brown fox jumps over",       # shares prefix with doc 1
        "the quick brown fox sleeps all day",   # and suffix with doc 2
        "cat sleeps all day long",
        "completely unrelated tokens entirely here",  # clean: all unique
        "too short",                            # < 3 tokens: no row
        "echo echo echo echo",                  # self-repeats only: 1 distinct shingle, no other doc has it
    ]
    corpus = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = (
        D.cross_doc_dup_fraction(ray.data.from_arrow(corpus), num_partitions=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute_dup_fraction(texts)
    assert list(out["doc_id"]) == sorted(want)
    for _, row in out.iterrows():
        n, nd = want[row["doc_id"]]
        assert (row["n_shingles"], row["n_dup"]) == (n, nd)
        assert row["dup_frac"] == np.floor(nd / n * 1e6) / 1e6
    # the self-repeating doc must NOT count as duplicated
    echo = out[out["doc_id"] == 5].iloc[0]
    assert echo["n_shingles"] == 1 and echo["n_dup"] == 0

    # single-doc corpus: nothing is cross-duplicated
    solo = D.cross_doc_dup_fraction(
        ray.data.from_arrow(corpus.slice(0, 1)), num_partitions=4
    ).to_pandas()
    assert len(solo) == 1 and solo["n_dup"].iloc[0] == 0


def test_explode_tokens_matches_python_split(docs):
    b = docs.slice(0, 40)
    out = T.explode_tokens(b)
    assert out.column_names == ["doc_id", "token"]
    got = list(zip(out["doc_id"].to_pylist(), out["token"].to_pylist()))
    expect = []
    for did, txt in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
        for tok in (txt or "").split():
            expect.append((did, tok))
    assert got == expect


def test_explode_tokens_null_and_empty_rows():
    b = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a  b ", None, "", "  "]),
        }
    )
    out = T.explode_tokens(b)
    assert out["doc_id"].to_pylist() == [1, 1]
    assert out["token"].to_pylist() == ["a", "b"]


def test_tfidf_one_exchange_matches_python(ray_session):
    import math

    corpus = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b a", "a c", "b b c", None]),
        }
    )
    out = (
        T.tfidf(ray.data.from_arrow(corpus), n_docs=4, num_partitions=4)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    # python reference
    docs = {0: "a b a", 1: "a c", 2: "b b c"}
    tf = {}
    for d, txt in docs.items():
        for tok in txt.split():
            tf[(d, tok)] = tf.get((d, tok), 0) + 1
    df = {}
    for (_, tok) in tf:
        df[tok] = df.get(tok, 0) + 1
    expect = {
        (d, tok): (n, math.floor(n * math.log(4.0 / df[tok]) * 1e6) / 1e6)
        for (d, tok), n in tf.items()
    }
    assert len(out) == len(expect)
    for row in out.itertuples():
        etf, escore = expect[(row.doc_id, row.token)]
        assert row.tf == etf
        assert row.tfidf == pytest.approx(escore, abs=2e-6)


def test_group_centroids_matches_numpy(ray_session):
    t = pq.read_table(EMB, columns=["label", "embedding"]).slice(0, 200)
    out = (
        S.group_centroids(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values(["label", "idx"])
        .reset_index(drop=True)
    )
    mat = S._to_matrix(t["embedding"])
    lab = t["label"].combine_chunks().to_numpy(zero_copy_only=False)
    d = mat.shape[1]
    assert len(out) == len(np.unique(lab)) * d
    for g in np.unique(lab):
        mine = out[out.label == g].sort_values("idx")["c"].to_numpy()
        ref = np.floor(mat[lab == g].mean(axis=0) * 1e6) / 1e6
        np.testing.assert_allclose(mine, ref, atol=2e-6)


# --- redaction / normalization ----------------------------------------------


def test_redact_text_patterns_and_counts():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "write to bob.smith+x@corp.example.org today",
                    "call +1 555-123-4567 or 08-1234-5678 now",
                    "server at 192.168.0.17 is clean text otherwise",
                ]
            ),
        }
    )
    out = T.redact_text(t)
    texts = out["text"].to_pylist()
    assert texts[0] == "write to <EMAIL> today"
    assert texts[1] == "call <PHONE> or <PHONE> now"
    assert texts[2] == "server at <IP> is clean text otherwise"
    assert out["n_redacted"].to_pylist() == [1, 2, 1]
    # email digits must not phone-match (order: email first)
    t2 = pa.table(
        {"text": pa.array(["x 123456789@ex.com y"])}
    )
    assert T.redact_text(t2)["text"].to_pylist() == ["x <EMAIL> y"]


def test_normalize_text_canonical_form():
    t = pa.table(
        {"text": pa.array(["  Hello\t\tWORLD  \n mixed Case ", "", "a  b"])}
    )
    out = T.normalize_text(t)
    assert out["text"].to_pylist() == ["hello world mixed case", "", "a b"]
    # out_col mode keeps the original
    out2 = T.normalize_text(t, out_col="norm")
    assert out2["text"].to_pylist()[0] == "  Hello\t\tWORLD  \n mixed Case "
    assert out2["norm"].to_pylist()[0] == "hello world mixed case"


def test_dedup_paragraphs_first_occurrence_order_and_nulls():
    t = pa.table(
        {
            "text": pa.array(
                [
                    "a\n\nb\n\na\n\nc\n\nb",  # repeats collapse, order kept
                    "solo",                    # separator-free: unchanged
                    None,                      # null stays null
                    "",                        # empty round-trips
                    "x\n\n\n\nx",              # empty paragraph is a paragraph
                ]
            )
        }
    )
    out = T.dedup_paragraphs(t)
    assert out["text"].to_pylist() == [
        "a\n\nb\n\nc",
        "solo",
        None,
        "",
        "x\n\n",  # ['x','','x'] -> first 'x' + the empty paragraph
    ]
    # large_string offsets round-trip through the same kernel
    big = pa.table({"text": t["text"].cast(pa.large_string())})
    assert (
        T.dedup_paragraphs(big)["text"].to_pylist()
        == out["text"].to_pylist()
    )
    # out_col mode keeps the original
    out2 = T.dedup_paragraphs(t, out_col="clean")
    assert out2["text"].to_pylist()[0] == "a\n\nb\n\na\n\nc\n\nb"
    assert out2["clean"].to_pylist()[0] == "a\n\nb\n\nc"


def test_strip_markup_tags_entities_whitespace():
    t = pa.table(
        {
            "text": pa.array(
                [
                    '<div class="x"><p>hello   <b>world</b></p></div>',
                    "no markup",
                    "a &lt;tag&gt; &amp;lt; literal &quot;q&#39;s&quot;&nbsp;end",
                    None,
                ]
            )
        }
    )
    out = T.strip_markup(t)
    assert out["text"].to_pylist() == [
        "hello world",
        "no markup",
        # &amp;lt; must decode to the LITERAL '&lt;', never double-decode
        "a <tag> &lt; literal \"q's\" end",
        None,
    ]


def test_pack_sequences_invariants(ray_session):
    """Next-fit packing: every doc exactly once; per-pack token sums within
    budget except solo oversize docs; offsets are the prefix sums of pack
    members in id order; assignment is a pure function of the data
    (identical across different input block layouts)."""
    rng = np.random.default_rng(7)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    lens = rng.integers(1, 300, size=n).astype(np.int64)
    lens[17] = 5000  # oversize doc: must land in a solo pack
    t = pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(lens)})

    def run(ds):
        return (
            T.pack_sequences(ds, budget=1024, num_partitions=4)
            .to_pandas()
            .sort_values(["pack_id", "seq_pos"])
            .reset_index(drop=True)
        )

    out = run(ray.data.from_arrow(t))
    assert sorted(out["doc_id"].tolist()) == list(range(n))
    sums = out.groupby("pack_id")["n_tokens"].sum()
    counts = out.groupby("pack_id")["n_tokens"].count()
    over = sums[sums > 1024]
    assert all(counts[p] == 1 for p in over.index)  # oversize -> solo
    assert (out[out.doc_id == 17]["n_tokens"] == 5000).all()
    # offsets: prefix sums within each pack
    for _, grp in out.groupby("pack_id"):
        expect = np.concatenate([[0], np.cumsum(grp["n_tokens"].to_numpy())[:-1]])
        assert (grp["seq_pos"].to_numpy() == expect).all()
        # members in id order within the pack
        assert (np.diff(grp["doc_id"].to_numpy()) > 0).all()
    # determinism across block layouts
    split = ray.data.from_arrow(t.slice(0, 123)).union(
        ray.data.from_arrow(t.slice(123))
    )
    out2 = run(split)
    assert out.equals(out2)


# --- count-min sketch ---------------------------------------------------------


def test_cms_overestimates_only_and_merges(ray_session):
    """CMS: estimates always >= truth with a bounded overestimate; block
    partials merged by sum equal a single-pass sketch (mergeability is
    what makes it shuffle-free)."""
    from raycdc.sketch import approx_top_counts, cms_counts, cms_estimate

    rng = np.random.default_rng(11)
    vals = (
        ["click"] * 3000
        + ["view"] * 800
        + [f"rare{i}" for i in rng.integers(0, 2000, size=4000)]
    )
    arr = pa.array(vals)
    # mergeability: two halves summed == one pass
    one = cms_counts(arr)
    two = cms_counts(arr.slice(0, 4000)) + cms_counts(arr.slice(4000))
    assert (one == two).all()
    # Dataset path: overestimate-only within eps*N
    t = pa.table({"event_type": arr})
    ds = ray.data.from_arrow(t.slice(0, 2500)).union(
        ray.data.from_arrow(t.slice(2500))
    )
    out = approx_top_counts(ds, "event_type", ["click", "view", "absent"])
    est = dict(zip(out["event_type"].to_pylist(), out["approx_count"].to_pylist()))
    n = len(vals)
    assert 3000 <= est["click"] <= 3000 + 0.01 * n
    assert 800 <= est["view"] <= 800 + 0.01 * n
    assert 0 <= est["absent"] <= 0.01 * n


def test_cms_d_validation():
    from raycdc.sketch import cms_counts

    import pytest

    with pytest.raises(ValueError, match="count-min d"):
        cms_counts(pa.array(["a"]), d=5)


def test_exact_dedup_hash128_chunked_no_broadcast_path(ray_session, dup_corpus):
    """broadcast_max_ids=0 forces the object-store chunked membership path
    (the 100 TB loser-set shape): result must equal the broadcast path and
    the text-compare mode exactly."""
    want = (
        D.exact_dedup(ray.data.from_arrow(dup_corpus), num_partitions=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        D.exact_dedup(
            ray.data.from_arrow(dup_corpus),
            num_partitions=8,
            identity="hash128",
            broadcast_max_ids=0,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert want.equals(got)


def test_exact_dedup_hash128_chunked_no_duplicates(ray_session, dup_corpus):
    """Chunked path on an all-unique corpus: loser set is empty, nothing
    is dropped."""
    uniq = dup_corpus.filter(pc.less(dup_corpus["doc_id"], 1000))
    out = D.exact_dedup(
        ray.data.from_arrow(uniq),
        num_partitions=8,
        identity="hash128",
        broadcast_max_ids=0,
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(uniq["doc_id"].to_pylist())


# --- anti_join_lake + incremental dedup --------------------------------------


def _mk_index_free_lake(tmp_path, rows):
    """A tiny lww lake keyed (h1,h2) for anti_join_lake tests."""
    import datetime

    from raycdc.dedup import _index_spec
    from raycdc.engine import replay

    t = pa.table(
        {
            "h1": pa.array([r[0] for r in rows], pa.int64()),
            "h2": pa.array([r[1] for r in rows], pa.int64()),
            "first_id": pa.array([r[2] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1)] * len(rows), pa.timestamp("us")
            ),
            "op": pa.array([r[3] for r in rows]),
            "lsn": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
            "seg_id": pa.array([0] * len(rows), pa.int32()),
        }
    )
    lake = str(tmp_path / "idx")
    replay(ray.data.from_arrow(t), lake, _index_spec(4))
    return lake


def test_anti_join_lake_membership_and_semi(ray_session, tmp_path):
    from raycdc.engine import anti_join_lake

    lake = _mk_index_free_lake(
        tmp_path,
        [(10, 1, 100, "insert"), (20, 2, 200, "insert"), (30, 3, 300, "delete")],
    )
    stream = ray.data.from_arrow(
        pa.table(
            {
                "h1": pa.array([10, 20, 30, 40], pa.int64()),
                "h2": pa.array([1, 2, 3, 4], pa.int64()),
                "v": pa.array(["a", "b", "c", "d"]),
            }
        )
    )
    anti = anti_join_lake(stream, lake, on=("h1", "h2")).to_pandas()
    # 30 is a TOMBSTONE in the lake (dead key) -> counts as absent
    assert sorted(anti["v"]) == ["c", "d"]
    semi = anti_join_lake(stream, lake, on=("h1", "h2"), semi=True).to_pandas()
    assert sorted(semi["v"]) == ["a", "b"]
    # (10, 999): first key col matches but the tuple differs -> absent
    probe = ray.data.from_arrow(
        pa.table(
            {
                "h1": pa.array([10], pa.int64()),
                "h2": pa.array([999], pa.int64()),
                "v": pa.array(["x"]),
            }
        )
    )
    assert anti_join_lake(probe, lake, on=("h1", "h2")).count() == 1


def test_anti_join_lake_empty_lake_and_key_mismatch(ray_session, tmp_path):
    from raycdc.engine import anti_join_lake

    stream = ray.data.from_arrow(
        pa.table({"h1": pa.array([1], pa.int64()), "h2": pa.array([2], pa.int64())})
    )
    missing = str(tmp_path / "nolake")
    assert anti_join_lake(stream, missing, on=("h1", "h2")).count() == 1
    assert anti_join_lake(stream, missing, on=("h1", "h2"), semi=True).count() == 0

    lake = _mk_index_free_lake(tmp_path, [(1, 2, 3, "insert")])
    with pytest.raises(ValueError, match="partitioned by"):
        anti_join_lake(stream, lake, on=("h2", "h1")).count()


def test_lookup_join_lake_enrichment(ray_session, tmp_path):
    from raycdc.engine import lookup_join_lake

    lake = _mk_index_free_lake(
        tmp_path,
        [(10, 1, 100, "insert"), (20, 2, 200, "insert"), (30, 3, 300, "delete")],
    )
    stream = ray.data.from_arrow(
        pa.table(
            {
                "h1": pa.array([10, 20, 30, 40], pa.int64()),
                "h2": pa.array([1, 2, 3, 4], pa.int64()),
                "v": pa.array(["a", "b", "c", "d"]),
            }
        )
    )
    out = lookup_join_lake(
        stream, lake, on=("h1", "h2"), carry={"first_id": pa.int64()}
    ).to_pandas()
    # every stream row passes through, carry renamed with the suffix;
    # tombstoned (30) and absent (40) keys carry null
    assert len(out) == 4
    got = {int(r.h1): r.first_id_lake for r in out.itertuples()}
    assert got[10] == 100 and got[20] == 200
    assert got[30] != got[30] or got[30] is None  # NaN/None for tombstone
    assert got[40] != got[40] or got[40] is None

    # carry names resolved from the registered lake schema (tuple form)
    out2 = lookup_join_lake(stream, lake, on=("h1", "h2"), carry=("first_id",))
    assert "first_id_lake" in out2.schema().names

    # misuse is loud: empty lake, wrong leading key, unknown carry column
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no lake metadata"):
        lookup_join_lake(stream, str(tmp_path / "nolake"), ("h1",), ("first_id",))
    with _pytest.raises(ValueError, match="partitioned by"):
        lookup_join_lake(stream, lake, on=("h2", "h1"), carry=("first_id",))
    with _pytest.raises(ValueError, match="not in lake schema"):
        lookup_join_lake(stream, lake, on=("h1", "h2"), carry=("nope",))


def test_incremental_dedup_first_seen_wins_and_redelivery(ray_session, tmp_path):
    from raycdc.dedup import incremental_dedup

    idx = str(tmp_path / "dedup_idx")

    def batch(ids, texts):
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
        )

    # batch 1: an in-batch duplicate (min id wins) + uniques
    w1 = incremental_dedup(
        batch([5, 9, 7], ["alpha", "alpha", "beta"]), idx, batch_lsn=1,
        num_partitions=4,
    ).to_pandas()
    assert sorted(w1["doc_id"]) == [5, 7]

    # batch 2: a SMALLER id for an already-indexed text must NOT displace
    # the first-seen winner; new text survives
    w2 = incremental_dedup(
        batch([1, 2], ["alpha", "gamma"]), idx, batch_lsn=2, num_partitions=4
    ).to_pandas()
    assert sorted(w2["doc_id"]) == [2]

    # redelivery of batch 2 (same rows, same lsn — the crash-retry case):
    # the call is IDEMPOTENT, returning the SAME winner set it returned the
    # first time (recovered from the index rows this batch claimed), never
    # an empty one — a retry must be able to rebuild a lost output
    w2r = incremental_dedup(
        batch([1, 2], ["alpha", "gamma"]), idx, batch_lsn=2, num_partitions=4
    ).to_pandas()
    assert sorted(w2r["doc_id"]) == [2]

    # a LATER re-crawl of an already-kept doc (same id + text, HIGHER lsn)
    # is a duplicate, not a recovery — it must still dedup away
    recrawl = incremental_dedup(
        batch([2], ["gamma"]), idx, batch_lsn=5, num_partitions=4
    )
    assert recrawl.count() == 0
    # an ALL-DUPLICATE batch must still carry the input schema (a plain
    # materialize yields zero blocks and schema() comes back nameless);
    # to_pandas() column loss on ANY empty Dataset is a Ray limitation
    # (iter_batches skips empty blocks) — schema() is the contract
    assert recrawl.schema().names == ["doc_id", "text"]

    # out_parquet streaming path: batch 3 with a mixed batch
    out = str(tmp_path / "winners3")
    w3 = incremental_dedup(
        batch([11, 12], ["beta", "delta"]), idx, batch_lsn=3, num_partitions=4,
        out_parquet=out,
    ).to_pandas()
    assert sorted(w3["doc_id"]) == [12]

    # crash-retry after the index replay landed but before the caller
    # consumed the output: the retry REWRITES out_parquet with the same
    # winners instead of clobbering it with an empty set
    w3r = incremental_dedup(
        batch([11, 12], ["beta", "delta"]), idx, batch_lsn=3, num_partitions=4,
        out_parquet=out,
    ).to_pandas()
    assert sorted(w3r["doc_id"]) == [12]
    import pyarrow.parquet as pq

    persisted = pq.read_table(out)
    assert sorted(persisted["doc_id"].to_pylist()) == [12]


# --- connected components (near-dup clustering) ------------------------------


def _uf_components(edges, nodes=None):
    """Pure-python union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in nodes if nodes is not None else list(parent):
        out[n] = find(n)
    return out


def _cc_dict(edges, **kw):
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in edges], pa.int64()),
                "b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    res = D.connected_components(pairs, num_partitions=4, **kw).to_pandas()
    return dict(zip(res["node"], res["component"]))


# single_task_max_edges=0 forces the distributed label-propagation loop;
# the default takes the single-task vectorized solve — both must agree
_CC_PATHS = [{}, {"single_task_max_edges": 0}]


@pytest.mark.parametrize("kw", _CC_PATHS)
def test_connected_components_chain_needs_propagation(ray_session, kw):
    # a 6-hop chain (diameter 6 > one LSH-clique hop) + an isolated pair,
    # written high-to-low so min labels must travel the long way
    edges = [(7, 6), (6, 5), (5, 4), (4, 3), (3, 2), (2, 1), (1, 0), (100, 101)]
    got = _cc_dict(edges, **kw)
    assert got == {**{n: 0 for n in range(8)}, 100: 100, 101: 100}


@pytest.mark.parametrize("kw", _CC_PATHS)
def test_connected_components_matches_union_find(ray_session, kw):
    rng = np.random.default_rng(7)
    edges = [tuple(map(int, e)) for e in rng.integers(0, 60, size=(120, 2))]
    edges = [(a, b) for a, b in edges if a != b]
    got = _cc_dict(edges, **kw)
    nodes = sorted({n for e in edges for n in e})
    assert got == _uf_components(edges, nodes)


@pytest.mark.parametrize("kw", _CC_PATHS)
def test_connected_components_negative_ids(ray_session, kw):
    # ids are arbitrary int64 — no sentinel may collide with real values
    edges = [(-5, 3), (3, 7), (-10, -5), (0, -1)]
    got = _cc_dict(edges, **kw)
    assert got == {-10: -10, -5: -10, 3: -10, 7: -10, -1: -1, 0: -1}


@pytest.mark.parametrize("kw", _CC_PATHS)
def test_connected_components_empty_and_duplicate_edges(ray_session, kw):
    empty = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    assert D.connected_components(empty, **kw).count() == 0
    # duplicate + self-inverse edges must not break the old-row uniqueness
    got = _cc_dict([(1, 2), (2, 1), (1, 2), (3, 3)], **kw)
    assert got == {1: 1, 2: 1, 3: 3}


def test_lsh_pairs_to_components_end_to_end(ray_session, dup_corpus):
    sigs = ray.data.from_arrow(dup_corpus).map_batches(
        D.minhash_signatures, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = D.lsh_candidate_pairs(sigs, bands=32, num_partitions=8)
    edge_rows = [(r["a"], r["b"]) for r in pairs.take_all()]
    got = _cc_dict(edge_rows)
    nodes = sorted({n for e in edge_rows for n in e})
    assert got == _uf_components(edge_rows, nodes)
    # every doc's planted near-copy landed in the doc's component
    for a, b in edge_rows:
        assert got[a] == got[b]


def test_dedup_by_components_keeps_representatives(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 10, 11, 99], pa.int64()),
                "text": pa.array([f"d{i}" for i in range(7)]),
            }
        )
    )
    comps = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array([1, 2, 3, 4, 10, 11], pa.int64()),
                "component": pa.array([1, 1, 1, 1, 10, 10], pa.int64()),
            }
        )
    )
    out = D.dedup_by_components(docs, comps).to_pandas()
    # component minima survive; 99 (not in the pair graph) passes through
    assert sorted(out["doc_id"]) == [1, 10, 99]


def test_dedup_by_components_chunked_no_broadcast_path(ray_session):
    n = 200
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array([f"d{i}" for i in range(n)]),
            }
        )
    )
    # every odd id loses to its even predecessor
    comps = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(list(range(n)), pa.int64()),
                "component": pa.array([i - (i % 2) for i in range(n)], pa.int64()),
            }
        )
    )
    out = D.dedup_by_components(docs, comps, broadcast_max_ids=10).to_pandas()
    assert sorted(out["doc_id"]) == list(range(0, n, 2))


# --- duplicated-substring spans ---------------------------------------------


def test_dup_span_stats_matches_bruteforce(ray_session):
    """dup_span_stats == a per-doc brute-force interval-union oracle,
    including merged runs, isolated hits, sub-k docs, and zero-dup docs."""
    import math

    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d x y z q r"),
        (3, "unique tokens only here none match"),
        (4, "short"),
        (5, "x y z q r s t u v w a b c d e"),
        (6, "a b c d e f g h"),  # exact copy of doc 1 → full coverage
    ]
    k = 3
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "text": pa.array([s for _, s in rows]),
        }
    )
    got = (
        D.dup_span_stats(ray.data.from_arrow(t), shingle_k=k, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    sh2docs: dict[tuple, set] = {}
    toks = {d: s.split(" ") for d, s in rows}
    for d, tk in toks.items():
        for i in range(len(tk) - k + 1):
            sh2docs.setdefault(tuple(tk[i : i + k]), set()).add(d)
    for i, (d, _) in enumerate(rows):
        tk = toks[d]
        pos = [
            j
            for j in range(len(tk) - k + 1)
            if len(sh2docs[tuple(tk[j : j + k])]) >= 2
        ]
        runs: list[list[int]] = []
        for p in pos:
            if runs and p - runs[-1][1] <= k:
                runs[-1][1] = p
            else:
                runs.append([p, p])
        lens = [b - a + k for a, b in runs]
        row = got[got.doc_id == d].iloc[0]
        assert row.n_tokens == len(tk)
        assert row.dup_tokens == sum(lens)
        assert row.max_dup_span == (max(lens) if lens else 0)
        assert row.dup_frac == math.floor(sum(lens) / len(tk) * 1e6) / 1e6
    # exact copies cover each other fully
    full = got[got.doc_id.isin([1, 6])]
    assert (full.dup_tokens == full.n_tokens).all()
    assert (full.dup_frac == 1.0).all()


def test_dup_span_stats_no_duplicates_all_zero(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["p q r s t", "u v w x y"]),
        }
    )
    got = D.dup_span_stats(ray.data.from_arrow(t), num_partitions=2).to_pandas()
    assert len(got) == 2
    assert (got.dup_tokens == 0).all()
    assert (got.max_dup_span == 0).all()


def test_cut_dup_spans_matches_bruteforce(ray_session):
    """cut_dup_spans == token-level brute-force removal of all positions
    covered by a cross-doc shingle; pass-through docs untouched."""
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d x y z q r"),
        (3, "unique tokens only here none match"),
        (4, "short"),
        (5, "x y z q r s t u v w a b c d e"),
        (6, "a b c d e f g h"),
    ]
    k = 3
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "text": pa.array([s for _, s in rows]),
        }
    )
    got = (
        D.cut_dup_spans(ray.data.from_arrow(t), shingle_k=k, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sh2docs: dict[tuple, set] = {}
    toks = {d: s.split(" ") for d, s in rows}
    for d, tk in toks.items():
        for i in range(len(tk) - k + 1):
            sh2docs.setdefault(tuple(tk[i : i + k]), set()).add(d)
    for d, tk in toks.items():
        cov: set[int] = set()
        for i in range(len(tk) - k + 1):
            if len(sh2docs[tuple(tk[i : i + k])]) >= 2:
                cov.update(range(i, i + k))
        row = got[got.doc_id == d].iloc[0]
        assert row.text == " ".join(
            tok for j, tok in enumerate(tk) if j not in cov
        )
        assert row.n_removed == len(cov)
    # exact copies vanish entirely; clean docs pass through verbatim
    assert got[got.doc_id.isin([1, 6])].text.tolist() == ["", ""]
    assert got[got.doc_id == 3].text.iloc[0] == rows[2][1]


def _near_batch(ids, texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


_BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
_OTHER = "completely different subject matter covering ships sailing across wide oceans tonight"
_THIRD = "yet another unrelated topic about mountain climbing gear and alpine weather patterns"


def test_incremental_near_dedup_batches(ray_session, tmp_path):
    from raycdc.dedup import incremental_near_dedup

    idx = str(tmp_path / "near_idx")

    # batch 1: B(9) is a near-dup of A(5) (one-word suffix); C(7) distinct
    w1 = incremental_near_dedup(
        _near_batch([5, 9, 7], [_BASE, _BASE + " extra", _OTHER]),
        idx, batch_lsn=1, num_partitions=4,
    ).to_pandas()
    assert sorted(w1["doc_id"]) == [5, 7]

    # batch 2: D(1) near-dups the INDEXED A(5) — first-seen wins even at a
    # smaller id; E(11) is novel; F(12) near-dups E in-batch (min id keeps E)
    w2 = incremental_near_dedup(
        _near_batch(
            [1, 11, 12], [_BASE + " again", _THIRD, _THIRD + " appended"]
        ),
        idx, batch_lsn=2, num_partitions=4,
    ).to_pandas()
    assert sorted(w2["doc_id"]) == [11]

    # redelivery of batch 2 (same rows, same lsn — crash-retry): idempotent,
    # same winner set, index rows claimed by this lsn don't self-suppress
    w2r = incremental_near_dedup(
        _near_batch(
            [1, 11, 12], [_BASE + " again", _THIRD, _THIRD + " appended"]
        ),
        idx, batch_lsn=2, num_partitions=4,
    ).to_pandas()
    assert sorted(w2r["doc_id"]) == [11]

    # batch 3: G(20) near-dups the indexed E(11) -> dies; H(21) near-dups G
    # in-batch but NOT E closely enough on its own -> its whole component
    # touches the index, so it dies too (transitive first-seen-wins);
    # I(22) is novel and survives
    w3 = incremental_near_dedup(
        _near_batch(
            [20, 21, 22],
            [_THIRD + " tonight", _THIRD + " tonight also", _BASE.replace(
                "quick brown fox", "slow green turtle"
            ) + " in unrelated words entirely changed everywhere"],
        ),
        idx, batch_lsn=3, num_partitions=4,
    ).to_pandas()
    assert 20 not in set(w3["doc_id"]) and 21 not in set(w3["doc_id"])

    # out_parquet path + later re-crawl of a kept doc still dedups
    out = str(tmp_path / "near_w4")
    w4 = incremental_near_dedup(
        _near_batch([30], [_OTHER + " word"]), idx, batch_lsn=4,
        num_partitions=4, out_parquet=out,
    )
    assert w4.count() == 0
    assert w4.schema().names == ["doc_id", "text"]

    # all-duplicate batch WITHOUT out_parquet: the materialize path must
    # also preserve the input schema (zero blocks would otherwise erase it;
    # schema() is the contract — empty-Dataset to_pandas drops columns in
    # Ray itself)
    w5 = incremental_near_dedup(
        _near_batch([31], [_OTHER + " words"]), idx, batch_lsn=5,
        num_partitions=4,
    )
    assert w5.count() == 0
    assert w5.schema().names == ["doc_id", "text"]


def test_incremental_near_dedup_short_docs_pass(ray_session, tmp_path):
    from raycdc.dedup import incremental_near_dedup

    idx = str(tmp_path / "near_idx_short")
    # docs shorter than shingle_k tokens never participate: identical
    # two-word docs pass through in BOTH batches (matching the exact
    # verifier's inner-join semantics)
    w1 = incremental_near_dedup(
        _near_batch([1, 2], ["hi there", "hi there"]), idx, batch_lsn=1,
        num_partitions=4,
    ).to_pandas()
    assert sorted(w1["doc_id"]) == [1, 2]
    w2 = incremental_near_dedup(
        _near_batch([3], ["hi there"]), idx, batch_lsn=2, num_partitions=4
    ).to_pandas()
    assert sorted(w2["doc_id"]) == [3]


# ---------------------------------------------------------------------------
# Bloom filter (sketch.bloom_*)


def test_bloom_no_false_negatives_and_fpr_envelope():
    from raycdc import sketch as SK

    members = pa.array([f"m{i}" for i in range(5000)])
    others = pa.array([f"x{i}" for i in range(5000)])
    num_bits, k = 1 << 16, 7  # m/n ≈ 13 → theoretical FPR ≈ 0.3%
    words = SK.bloom_bits(members, num_bits=num_bits, k=k)
    assert SK.bloom_contains(words, members, k=k).all()  # one-sided guarantee
    fpr = SK.bloom_contains(words, others, k=k).mean()
    assert fpr < 0.02, fpr


def test_bloom_merge_equals_union_build():
    from raycdc import sketch as SK

    a = pa.array([f"a{i}" for i in range(1000)])
    b = pa.array([f"b{i}" for i in range(1000)])
    both = pa.concat_arrays([a, b])
    m = SK.bloom_merge(
        SK.bloom_bits(a, 1 << 14), SK.bloom_bits(b, 1 << 14)
    )
    assert np.array_equal(m, SK.bloom_bits(both, 1 << 14))
    # idempotent under re-OR (rebuild over overlapping data is free)
    assert np.array_equal(SK.bloom_merge(m, SK.bloom_bits(a, 1 << 14)), m)


def test_bloom_int_columns_and_empty():
    from raycdc import sketch as SK

    vals = pa.array(np.arange(2000, dtype=np.int64))
    words = SK.bloom_bits(vals, 1 << 15)
    assert SK.bloom_contains(words, vals).all()
    assert not SK.bloom_contains(
        words, pa.array(np.arange(10_000, 12_000, dtype=np.int64))
    ).all()
    assert SK.bloom_bits(pa.array([], pa.string()), 1 << 10).sum() == 0
    assert len(SK.bloom_contains(words, pa.array([], pa.int64()))) == 0


def test_bloom_build_and_semi_anti_join(ray_session):
    from raycdc import sketch as SK

    members = pa.table({"doc_id": [f"d{i}" for i in range(3000)]})
    probe = pa.table(
        {"doc_id": [f"d{i}" for i in range(2000, 5000)], "v": list(range(3000))}
    )
    words = SK.bloom_build(
        ray.data.from_arrow(members).repartition(5), "doc_id", num_bits=1 << 16
    )
    kept = SK.bloom_semi_join(
        ray.data.from_arrow(probe).repartition(4), "doc_id", words
    ).take_all()
    kept_ids = {r["doc_id"] for r in kept}
    true_members = {f"d{i}" for i in range(2000, 3000)}
    assert true_members <= kept_ids  # no false negatives
    assert len(kept_ids) < 1200  # few false positives beyond the 1000 true
    anti = SK.bloom_semi_join(
        ray.data.from_arrow(probe).repartition(4), "doc_id", words, negate=True
    ).take_all()
    anti_ids = {r["doc_id"] for r in anti}
    assert anti_ids.isdisjoint(true_members)  # anti side is exact-safe
    assert kept_ids | anti_ids == {f"d{i}" for i in range(2000, 5000)}


def test_pack_groups_invariants(ray_session):
    """Group-contiguous packing with per-row spans (text.pack_groups):
    every row exactly once; a group's rows are contiguous and in order
    inside ONE pack; per-pack token sums within budget except solo
    oversize groups; spans tile each pack without gaps; keep_cols pass
    through; assignment is a pure function of the data."""
    rng = np.random.default_rng(11)
    rows = []
    for g in range(60):
        n_turns = int(rng.integers(1, 8))
        for i in range(n_turns):
            rows.append((g, i, int(rng.integers(1, 40)), int(i % 2)))
    # one oversize conversation: must land in a solo pack
    for i in range(10):
        rows.append((99, i, 50, 0))
    t = pa.table(
        {
            "uid": pa.array([r[0] for r in rows], pa.int64()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
            "n_tokens": pa.array([r[2] for r in rows], pa.int64()),
            "masked": pa.array([r[3] for r in rows], pa.int64()),
        }
    )

    def run(ds):
        return (
            T.pack_groups(
                ds,
                group_col="uid",
                order_col="turn_idx",
                budget=128,
                num_partitions=4,
                keep_cols=("masked",),
            )
            .to_pandas()
            .sort_values(["pack_id", "span_start"])
            .reset_index(drop=True)
        )

    out = run(ray.data.from_arrow(t))
    assert len(out) == len(rows)
    # every (uid, turn) exactly once, masked passed through
    key = list(zip(out["uid"], out["turn_idx"]))
    assert sorted(key) == sorted((r[0], r[1]) for r in rows)
    assert (out["masked"] == out["turn_idx"] % 2).loc[out.uid != 99].all()
    # one pack per group, spans contiguous in turn order
    per_group = out.groupby("uid")
    assert (per_group["pack_id"].nunique() == 1).all()
    for _, grp in per_group:
        grp = grp.sort_values("turn_idx")
        assert (grp["span_end"].to_numpy()[:-1]
                == grp["span_start"].to_numpy()[1:]).all()
    # pack budget respected except the solo oversize group
    sums = out.groupby("pack_id")["n_tokens"].sum()
    ngrp = out.groupby("pack_id")["uid"].nunique()
    over = sums[sums > 128]
    assert all(ngrp[p] == 1 for p in over.index)
    assert int(out[out.uid == 99]["pack_id"].nunique()) == 1
    # spans tile each pack: sorted spans start at 0 and abut
    for _, grp in out.groupby("pack_id"):
        s = grp.sort_values("span_start")
        assert s["span_start"].iloc[0] == 0
        assert (s["span_end"].to_numpy()[:-1]
                == s["span_start"].to_numpy()[1:]).all()
    # determinism across block layouts
    out2 = run(
        ray.data.from_arrow(t.slice(0, 77)).union(
            ray.data.from_arrow(t.slice(77))
        )
    )
    assert out.equals(out2)


def test_chunk_tokens_semantics():
    """Sliding token-window chunking: overflow-with-stride starts, tail
    chunk shorter never dropped, DuckDB string_split token semantics
    (consecutive spaces = empty tokens; empty doc = one empty chunk)."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c d e", "", "x  y"]),
        }
    )
    out = T.chunk_tokens(t, window=3, stride=2).to_pandas()
    got = list(
        zip(out.doc_id, out.chunk_idx, out.tok_start, out.tok_end, out.chunk)
    )
    assert got == [
        (1, 0, 0, 3, "a b c"),
        (1, 1, 2, 5, "c d e"),
        (1, 2, 4, 5, "e"),
        (2, 0, 0, 1, ""),
        (3, 0, 0, 3, "x  y"),
        (3, 1, 2, 3, "y"),
    ]
    # sliced batch input must not desync the flat gather
    out2 = T.chunk_tokens(t.slice(1), window=3, stride=2).to_pandas()
    assert list(out2.doc_id) == [2, 3, 3]
    assert list(out2.chunk) == ["", "x  y", "y"]
    # chunks within a doc reconstruct the doc: stride==window tiles it
    tiled = T.chunk_tokens(t, window=2, stride=2).to_pandas()
    rec = " ".join(tiled[tiled.doc_id == 1].sort_values("chunk_idx").chunk)
    assert rec == "a b c d e"
    with pytest.raises(ValueError):
        T.chunk_tokens(t, window=0, stride=2)


def test_bigram_nll_semantics(ray_session):
    """Bigram MLE NLL: hand-checkable on a tiny corpus; <2-token docs
    drop out; repeated formulaic pairs score LOWER (more fluent) than a
    unigram-identical shuffle."""
    import math

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["a b a b a b", "b a b a a b", "solo", "a b"]
            ),
        }
    )
    out = (
        T.bigram_nll(ray.data.from_arrow(t), num_partitions=4)
        .to_pandas()
        .set_index("doc_id")
    )
    assert 3 not in out.index  # one token: no pairs
    # corpus pair counts: doc1 ab×3 ba×2, doc2 ba×2 ab×2 aa×1, doc4 ab×1
    # cnt: ab=6, ba=4, aa=1; first 'a': 7, first 'b': 4
    nll1 = -(3 * math.log(6 / 7) + 2 * math.log(4 / 4)) / 5
    nll2 = -(2 * math.log(4 / 4) + 2 * math.log(6 / 7) + 1 * math.log(1 / 7)) / 5
    assert out.loc[1, "nll"] == math.floor(nll1 * 1e6) / 1e6
    assert out.loc[2, "nll"] == math.floor(nll2 * 1e6) / 1e6
    assert out.loc[1, "n_pairs"] == 5 and out.loc[4, "n_pairs"] == 1
    # the formulaic doc is more fluent than the one with the rare 'a a'
    assert out.loc[1, "nll"] < out.loc[2, "nll"]


def test_drift_report_semantics(ray_session):
    """Drift report: the injected +25-cent shift on 1/3 of keys moves
    per-class quantiles by a bounded, non-negative amount."""
    from raycdc.pipelines import q_drift_report

    t = q_drift_report("/root/testdata/sf0.001").to_pandas()
    assert set(t.columns) == {
        "event_type", "q50_old", "q90_old", "q50_new", "q90_new",
        "d50", "d90",
    }
    assert len(t) == 5  # the five event classes
    # deltas are the PRE-quantization differences on both sides (0.9
    # interpolation yields non-representable fractions, so floor(a-b)
    # and floor(a)-floor(b) differ in the last quantized digit);
    # value-exactness itself is pinned by the DuckDB oracle
    assert ((t["d50"] - (t["q50_new"] - t["q50_old"])).abs() <= 2e-6).all()
    assert ((t["d90"] - (t["q90_new"] - t["q90_old"])).abs() <= 2e-6).all()


def test_bigram_nll_ref_semantics(ray_session):
    """Reference-scored bigram NLL: in-model docs score better than
    out-of-vocabulary docs; hand-check the smoothing on a tiny model."""
    import math

    ref = pa.table(
        {
            "doc_id": pa.array([10, 11], pa.int64()),
            "text": pa.array(["a b a b", "a b a c"]),
        }
    )
    cand = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b a b", "z z z", "a"]),
        }
    )
    out = (
        T.bigram_nll_ref(
            ray.data.from_arrow(cand),
            ray.data.from_arrow(ref),
            alpha=1.0,
            num_partitions=4,
        )
        .to_pandas()
        .set_index("doc_id")
    )
    # ref pairs: ab×3, ba×2, ac×1 -> cnt_first(a)=4, k(a)=2;
    # cnt_first(b)=2, k(b)=1
    p_ab = (3 + 1) / (4 + 1 * (2 + 1))  # 4/7
    p_ba = (2 + 1) / (2 + 1 * (1 + 1))  # 3/4
    nll1 = -(2 * math.log(p_ab) + 1 * math.log(p_ba)) / 3
    assert out.loc[1, "nll"] == math.floor(nll1 * 1e6) / 1e6
    # doc 2: every pair has OOV w1 -> fixed penalty ln(1/2)
    assert out.loc[2, "nll"] == math.floor(-math.log(0.5) * 1e6) / 1e6
    # one-token doc: no pairs, no row
    assert 3 not in out.index
    # in-model text is more plausible than OOV soup
    assert out.loc[1, "nll"] < out.loc[2, "nll"]
