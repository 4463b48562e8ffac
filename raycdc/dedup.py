"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The scale-shaped dedup family for training-data pipelines (not in the
reference — SURVEY.md §2.6 lists dedup among the gaps this engine fills):

* :func:`exact_dedup` — hash-partition + first-per-group.  ONE shuffle on a
  64-bit text hash; full-text compare inside the group guards collisions.
* :func:`minhash_signatures` / :func:`lsh_candidate_pairs` — shingle →
  minhash → band → bucket-groupby.  The shuffle carries only
  ``(band_key, doc_id)`` pairs — never document text.
* :func:`simhash_signatures` / :func:`simhash_candidate_pairs` — 64-bit
  SimHash (Charikar), candidates via 16-bit chunk banding (Hamming ≤ 3
  guarantees a matching chunk by pigeonhole).
* :func:`verify_jaccard_pairs` — exact word-shingle Jaccard on candidate
  pairs; the small corpus side is broadcast via ``ray.put`` once (at lake
  scale this becomes a hash-join against the partitioned corpus — the
  partitioning assumption is documented on the function).

All kernels are numpy/Arrow vectorized; per-K loops run over 64-128
permutations, not over rows.
"""

from __future__ import annotations

import numpy as np
import pandas.util
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from raycdc.partition import hash_strings

def _perm_params(k: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(42)
    a = rng.integers(1, 2**63, k, dtype=np.uint64) | np.uint64(1)  # odd
    b = rng.integers(0, 2**63, k, dtype=np.uint64)
    return a, b


def _shingle_instances(
    texts: pa.Array | pa.ChunkedArray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Every k-token shingle INSTANCE with its start position.

    Returns ``(flat_hashes, positions, shingle_counts, token_counts)``:
    doc ``i`` owns ``shingle_counts[i]`` consecutive entries; ``positions``
    is the 0-based token index of each shingle's first token within its
    doc; ``token_counts[i]`` is doc ``i``'s total token count (0 for null
    texts).  Shared head of :func:`word_shingle_hashes` (which dedups per
    doc) and :func:`dup_span_stats` (which needs the raw positions).
    """
    tok = pc.split_pattern(texts, " ")
    la = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok
    flat_tokens = la.flatten()
    toff = la.offsets.to_numpy().astype(np.int64)
    toff = toff - toff[0]
    th = hash_strings(flat_tokens)

    counts = np.diff(toff)
    sh_counts = np.maximum(counts - k + 1, 0)
    out_off = np.concatenate([[0], np.cumsum(sh_counts)])
    total = int(out_off[-1])
    sh = np.zeros(total, dtype=np.uint64)
    # 0-based shingle index within each doc == its start-token position
    pos = np.arange(total) - np.repeat(out_off[:-1], sh_counts)
    # flat index of the first token of each shingle
    starts = np.repeat(toff[:-1], sh_counts) + pos
    with np.errstate(over="ignore"):
        for j in range(k):
            sh = sh * np.uint64(1099511628211) + th[starts + j]
    return sh, pos.astype(np.int64), sh_counts, counts


def word_shingle_hashes(
    texts: pa.Array | pa.ChunkedArray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc k-token shingle hash sets.

    Returns ``(flat_hashes, offsets)``: distinct shingle hashes of doc ``i``
    are ``flat[offsets[i]:offsets[i+1]]``.  Vectorized: one pass of string
    splitting (Arrow), one pandas SipHash over the flattened token array,
    one polynomial combine per k (numpy), per-doc dedup via a sorted mask.
    """
    sh, _, sh_counts, _ = _shingle_instances(texts, k)
    n_docs = len(sh_counts)
    total = len(sh)
    out_off = np.concatenate([[0], np.cumsum(sh_counts)])

    # per-doc distinct: sort within docs (stable key = doc_id major) and mask
    doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), sh_counts)
    order = np.lexsort((sh, doc_ids))
    sh_sorted = sh[order]
    doc_sorted = doc_ids[order]
    keep = np.ones(total, dtype=bool)
    if total > 1:
        keep[1:] = (sh_sorted[1:] != sh_sorted[:-1]) | (
            doc_sorted[1:] != doc_sorted[:-1]
        )
    sh_u = sh_sorted[keep]
    doc_u = doc_sorted[keep]
    new_counts = np.bincount(doc_u, minlength=n_docs)
    new_off = np.concatenate([[0], np.cumsum(new_counts)])
    return sh_u, new_off.astype(np.int64)


# ---------------------------------------------------------------------------
# exact dedup


def _filter_sorted_losers(t: pa.Table, id_col: str, lid: "np.ndarray") -> pa.Table:
    """Drop rows whose id appears in the SORTED loser-id array."""
    if len(lid) == 0:
        return t
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.searchsorted(lid, ids)
    pos_c = np.minimum(pos, len(lid) - 1)
    is_loser = lid[pos_c] == ids
    return t.filter(pa.array(~is_loser))


def _range_chunked_refs(ds: "ray.data.Dataset", col: str):
    """Park a (small, ∝ duplicates) Dataset in the object store as
    disjoint ``col``-range chunks: sort, take block refs, and compute each
    chunk's [lo, hi] in a remote task so the driver holds only (ref, lo,
    hi) triples.  Filter tasks then fetch (zero-copy) just the chunks
    overlapping their batch's range — the shared delivery layer of
    :func:`filter_out_ids` and :func:`cut_dup_spans`."""
    chunk_refs = ds.sort(col).to_arrow_refs()

    @ray.remote
    def _chunk_bounds(t: pa.Table):
        # map_groups stages emit schemaless empty bundles on no-row
        # partitions — treat them like empty chunks
        if t.num_columns == 0 or len(t) == 0:
            return None
        ids = t[col].to_numpy(zero_copy_only=False)
        return int(ids[0]), int(ids[-1])

    bounds = ray.get([_chunk_bounds.remote(r) for r in chunk_refs])
    keep = [(r, b) for r, b in zip(chunk_refs, bounds) if b is not None]
    refs = [r for r, _ in keep]
    lo = np.array([b[0] for _, b in keep], np.int64)
    hi = np.array([b[1] for _, b in keep], np.int64)
    return refs, lo, hi


def filter_out_ids(
    ds: "ray.data.Dataset",
    drop_ids: "ray.data.Dataset",
    id_col: str,
    broadcast_max_ids: int = 5_000_000,
) -> "ray.data.Dataset":
    """Streaming anti-join: drop every ``ds`` row whose ``id_col`` appears
    in the ``drop_ids`` Dataset (single ``id_col`` column).  Delivery is
    size-guarded: at most ``broadcast_max_ids`` ids (≈40 MB at the default)
    the sorted array is ``ray.put`` once and shared; above it the ids are
    sorted into disjoint id-range chunks that stay in the OBJECT STORE and
    each filter task fetches (zero-copy) only the chunks overlapping its
    batch's id range — nothing ever concentrates the full set in one
    Python heap.  Shared by :func:`exact_dedup` (hash128 losers) and
    :func:`dedup_by_components` (near-dup cluster losers)."""
    drop_mat = drop_ids.materialize()

    if drop_mat.count() <= broadcast_max_ids:
        # small duplicate set: one sorted array, put once, read everywhere
        pdf = drop_mat.to_pandas()
        loser_ids = (
            np.sort(pdf[id_col].to_numpy().astype(np.int64))
            if len(pdf)
            else np.empty(0, np.int64)
        )
        loser_ref = ray.put(loser_ids)

        def drop_losers(t: pa.Table) -> pa.Table:
            return _filter_sorted_losers(t, id_col, ray.get(loser_ref))

        return ds.map_batches(
            drop_losers, batch_format="pyarrow", zero_copy_batch=True
        )

    # no-broadcast path: sort the loser ids into disjoint-range chunks
    # held as object-store refs; the driver keeps only (ref, lo, hi)
    # per chunk and each filter task pulls just the overlapping chunks
    refs, lo, hi = _range_chunked_refs(drop_mat, id_col)

    def drop_losers_chunked(t: pa.Table) -> pa.Table:
        if not refs or len(t) == 0:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bmin, bmax = int(ids.min()), int(ids.max())
        sel = np.nonzero((hi >= bmin) & (lo <= bmax))[0]
        if len(sel) == 0:
            return t
        # probe chunk by chunk and OR the hit masks: ray.get returns
        # each chunk zero-copy from plasma and nothing is concatenated,
        # so even a batch spanning EVERY chunk never copies the loser
        # set into this task's heap
        is_loser = np.zeros(len(ids), dtype=bool)
        for i in sel:
            lid = ray.get(refs[i])[id_col].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(lid, ids), len(lid) - 1)
            is_loser |= lid[pos] == ids
        return t.filter(pa.array(~is_loser))

    return ds.map_batches(
        drop_losers_chunked, batch_format="pyarrow", zero_copy_batch=True
    )


def exact_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    identity: str = "text",
    broadcast_max_ids: int = 5_000_000,
) -> "ray.data.Dataset":
    """Keep, per distinct ``text_col`` value, the row with the smallest
    ``id_col``.

    ``identity="text"`` (default, oracle-exact): shuffle key is a HASH
    BUCKET of the text (equal texts co-locate; the group kernel sorts by
    text and dedups adjacent runs, so many texts per bucket — and hash
    collisions — are handled exactly).  Exchange volume = the corpus.

    ``identity="hash128"`` (the 100 TB path): the exchange carries ONLY
    ``(h1, h2, id)`` — two independent 64-bit FNV families as a 128-bit
    content identity — the per-bucket kernel emits the LOSER ids (every id
    but the smallest per identity), and the corpus is filtered streaming
    against the loser set.  Trades ~2^-128 collision odds for never
    shuffling payload text.  Loser-set delivery is size-guarded: at most
    ``broadcast_max_ids`` ids (≈40 MB at the default), the sorted array is
    ``ray.put`` once and shared; above it — a high-duplication corpus whose
    loser set would break the DRIVER heap — the ids are sorted into
    disjoint id-range chunks that stay in the OBJECT STORE, and each filter
    task fetches (zero-copy) only the chunks overlapping its batch's id
    range.  Nothing ever concentrates the full set in one Python heap.

    PRECONDITION for ``hash128``: ``id_col`` values must be UNIQUE (the
    corpus is filtered by id).  A duplicate id within one text identity is
    detected in the loser kernel and raises; a duplicate id across two
    different texts cannot be detected (the ids land in different hash
    buckets) and would drop an unrelated winner.  Multiset inputs belong
    on ``identity='text'``, which dedups row-wise exactly."""
    if identity not in ("text", "hash128"):
        raise ValueError(f"exact_dedup: identity must be text|hash128, got {identity!r}")

    from raycdc.engine import _configure_shuffle

    _configure_shuffle()

    if identity == "hash128":
        def hash_rows(t: pa.Table) -> pa.Table:
            h1 = hash_strings(t[text_col])
            h2 = hash_strings(t[text_col], seed=0x5EED)
            return pa.table(
                {
                    "h1": pa.array(h1.view(np.int64)),
                    "h2": pa.array(h2.view(np.int64)),
                    id_col: t[id_col].cast(pa.int64()),
                    "__b": pa.array(_bucket_of(h1, num_partitions)),
                }
            )

        def losers(g: pa.Table) -> pa.Table:
            g = g.sort_by(
                [("h1", "ascending"), ("h2", "ascending"), (id_col, "ascending")]
            )
            h1 = g["h1"].to_numpy(zero_copy_only=False)
            h2 = g["h2"].to_numpy(zero_copy_only=False)
            n = len(g)
            first = np.ones(n, dtype=bool)
            if n > 1:
                first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
                # hash128 filters the corpus BY ID, so ids must be unique:
                # a duplicate (identity, id) pair would put the winner's own
                # id into the loser set and the text would vanish entirely.
                # Duplicates sort adjacent — fail loudly with provenance
                # rather than silently losing documents.  (Duplicate ids
                # across DIFFERENT texts are undetectable inside one hash
                # bucket and remain a documented precondition violation.)
                ids = g[id_col].to_numpy(zero_copy_only=False)
                dup = (~first[1:]) & (ids[1:] == ids[:-1])
                if dup.any():
                    bad = int(ids[1:][dup][0])
                    raise ValueError(
                        f"exact_dedup(identity='hash128'): duplicate "
                        f"{id_col}={bad} within one text identity — ids must "
                        "be unique; use identity='text' for multiset inputs"
                    )
            return g.select([id_col]).filter(pa.array(~first))

        loser_mat = (
            ds.map_batches(hash_rows, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__b", num_partitions=num_partitions)
            .map_groups(losers, batch_format="pyarrow")
            .materialize()  # ids only, lives in the object store
        )
        return filter_out_ids(ds, loser_mat, id_col, broadcast_max_ids)

    def add_hash(t: pa.Table) -> pa.Table:
        h = (hash_strings(t[text_col]) % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("__th", pa.array(h))

    def first_per_text(g: pa.Table) -> pa.Table:
        g = g.sort_by([(text_col, "ascending"), (id_col, "ascending")])
        col = g[text_col].combine_chunks()
        n = len(g)
        keep = np.ones(n, dtype=bool)
        if n > 1:
            a, b = col.slice(1), col.slice(0, n - 1)
            neq = pc.not_equal(a, b)  # null where either side is null
            # SQL GROUP BY semantics: null == null (dedup), null != value
            validity_differs = pc.xor(pc.is_valid(a), pc.is_valid(b))
            changed = pc.or_(pc.fill_null(neq, False), validity_differs)
            keep[1:] = changed.to_numpy(zero_copy_only=False)
        return g.filter(pa.array(keep)).drop_columns(["__th"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__th", num_partitions=num_partitions)
        .map_groups(first_per_text, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# incremental dedup against a persisted content-hash index lake


def _index_spec(num_partitions: int):
    from raycdc.schema import TableSpec

    return TableSpec(
        name="dedup_index",
        schema=pa.schema(
            [
                pa.field("h1", pa.int64()),
                pa.field("h2", pa.int64()),
                pa.field("first_id", pa.int64()),
                pa.field("ts", pa.timestamp("us")),
            ]
        ),
        key_cols=("h1", "h2"),
        version_cols=("ts", "lsn"),
        partition_key="h1",
        num_partitions=num_partitions,
        sort_cols=("h1", "h2"),
        merge_policy="lww",
    )


def _require_batch_lsn(batch_lsn, *lakes: str) -> int:
    """Validate an incremental-dedup batch position against the persisted
    index.  ``None`` (no position) and a position BEHIND the index are
    both caller bugs with SILENT consequences if allowed through: the
    index replay would be checkpoint-pruned (the index stops growing) and
    the lsn-based retry exclusion would mis-classify the batch — later
    batches then keep documents they should have dropped.  Reusing the
    CURRENT position stays legal: that is the documented crash-retry
    recovery path (same batch, same lsn)."""
    from raycdc import sink as _S

    if batch_lsn is None:
        raise ValueError(
            "batch_lsn is required: pass a strictly increasing WAL-style "
            "position per batch (reuse a position ONLY to retry that same "
            "batch after a crash)"
        )
    batch_lsn = int(batch_lsn)
    floor = -1
    for lake in lakes:
        if _S.read_spec_meta(lake) is not None:
            for c in _S.read_all_checkpoints(lake).values():
                floor = max(floor, int(c.get("max_lsn", -1)))
    if batch_lsn < floor:
        raise ValueError(
            f"batch_lsn={batch_lsn} is behind the index position {floor}: "
            "the index update would be checkpoint-pruned and later batches "
            "would silently skip dedup against this one — use a larger lsn"
        )
    return batch_lsn


def incremental_dedup(
    ds: "ray.data.Dataset",
    index_lake: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_lsn: int | None = None,
    num_partitions: int = 16,
    out_parquet: str | None = None,
    broadcast_max_ids: int = 5_000_000,
) -> "ray.data.Dataset":
    """FIRST-SEEN-WINS exact dedup ACROSS ingest batches: the CDC engine's
    answer to "we re-crawl continuously — never train on a document we
    already kept".

    The persisted state is a content-hash INDEX LAKE (key ``(h1, h2)`` —
    the same 128-bit identity as ``exact_dedup(identity='hash128')`` —
    payload the winning id + the claiming ``lsn``), maintained by the
    engine's own exactly-once :func:`raycdc.engine.replay`.  Per batch:

    1. hash the batch's texts (two FNV families, payload untouched);
    2. :func:`raycdc.engine.lookup_join_lake` fetches each identity's
       indexed ``(first_id, lsn)`` — one exchange of the batch,
       co-partitioned with the index layout, index never shuffles; a row
       survives iff its identity is UNINDEXED (novel) or was indexed BY
       THIS BATCH (``first_id == id AND lsn == batch_lsn`` — the
       crash-retry recovery case);
    3. in-batch :func:`exact_dedup` (hash128: min ``id_col`` wins, payload
       never shuffles);
    4. the winners' identities replay into the index with
       ``lsn = batch_lsn`` — redelivering a batch with the same lsn is a
       checkpoint-pruned no-op, so the index is exactly-once even under
       crash-retry.  ``batch_lsn`` must increase across batches.

    The whole call is IDEMPOTENT, not just the index: re-running a batch
    (same rows, same ``batch_lsn``) after a crash anywhere — before,
    during, or after the index replay — returns the SAME winner set, so a
    retry can rebuild a lost ``out_parquet`` instead of silently
    overwriting it with an empty one.  A later re-crawl of an
    already-kept document (same id + text at a HIGHER lsn) still dedups:
    the recovery clause matches only the index rows this batch claimed.

    Output: the surviving rows.  ``out_parquet`` streams them to parquet
    and returns a read-back Dataset (the 100 TB shape: winners are
    CONSUMED before the index mutates); without it the winners are
    materialized in the object store first — a lazily re-executed winner
    set would otherwise re-filter against the already-updated index and
    (minus the recovery clause) shift meaning mid-flight.  Null texts
    share one identity (hash 0), matching ``exact_dedup`` and SQL GROUP
    BY semantics.
    """
    import ray

    from raycdc import sink as _S
    from raycdc.engine import lookup_join_lake, replay

    batch_lsn = _require_batch_lsn(batch_lsn, index_lake)

    def with_hashes(t: pa.Table) -> pa.Table:
        h1 = hash_strings(t[text_col])
        h2 = hash_strings(t[text_col], seed=0x5EED)
        t = t.append_column("h1", pa.array(h1.view(np.int64)))
        return t.append_column("h2", pa.array(h2.view(np.int64)))

    hashed = ds.map_batches(with_hashes, batch_format="pyarrow", zero_copy_batch=True)
    if _S.read_spec_meta(index_lake) is None:
        fresh = hashed  # first batch ever: nothing indexed yet
    else:
        looked = lookup_join_lake(
            hashed,
            index_lake,
            on=("h1", "h2"),
            carry={"first_id": pa.int64(), "lsn": pa.int64()},
        )

        def keep_novel_or_own(t: pa.Table) -> pa.Table:
            fid, ilsn = t["first_id_lake"], t["lsn_lake"]
            own = pc.cast(t[id_col], pa.int64())
            novel = pc.is_null(fid)
            recovered = pc.and_(
                pc.equal(fid, own), pc.equal(ilsn, pa.scalar(int(batch_lsn)))
            )
            mask = pc.or_(novel, pc.fill_null(recovered, False))
            return t.filter(mask).drop_columns(["first_id_lake", "lsn_lake"])

        fresh = looked.map_batches(
            keep_novel_or_own, batch_format="pyarrow", zero_copy_batch=True
        )
    winners = exact_dedup(
        fresh,
        text_col=text_col,
        id_col=id_col,
        num_partitions=num_partitions,
        identity="hash128",
        broadcast_max_ids=broadcast_max_ids,
    )
    if out_parquet is not None:
        # the output dir is OWNED by this call: a crash-retry re-runs the
        # whole batch and must REPLACE any partial prior write (Ray's
        # write_parquet otherwise appends new files alongside the old ones
        # and the winner set double-reads); an all-duplicate batch falls
        # back to an empty Dataset instead of read_parquet raising
        winners = _persist_winners(winners, out_parquet, hashed)
    else:
        winners = _materialize_winners(winners, hashed)

    def to_index_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "h1": t["h1"],
                "h2": t["h2"],
                "first_id": t[id_col].cast(pa.int64()),
                "ts": pa.array(
                    np.full(n, 1_700_000_000_000_000, np.int64), pa.timestamp("us")
                ),
                "op": pa.array(np.full(n, "insert", dtype=object), pa.string()),
                "lsn": pa.array(np.full(n, int(batch_lsn), np.int64)),
                "seg_id": pa.array(np.zeros(n, np.int32)),
            }
        )

    replay(
        winners.map_batches(to_index_rows, batch_format="pyarrow"),
        index_lake,
        _index_spec(num_partitions),
    )

    def strip(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in ("h1", "h2") if c in t.column_names])

    if winners.count() == 0:
        # a lazy map over zero blocks never runs and its schema() comes
        # back None — short-circuit the all-duplicate batch with the
        # input's schema (the strip result by construction)
        from raycdc.relational import dataset_schema

        return ray.data.from_arrow(dataset_schema(ds).empty_table())
    return winners.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)


def _persist_winners(
    winners: "ray.data.Dataset", out_parquet: str, schema_like: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Replace ``out_parquet`` with the winner rows and return a read-back
    Dataset (crash-retry REWRITES a partial prior output rather than
    appending).  An ALL-DUPLICATE batch writes no files at all — fall back
    to an empty Dataset with the input's schema instead of letting
    ``read_parquet`` raise on the empty directory."""
    from raycdc.storage import get_storage

    get_storage(out_parquet).remove_tree(out_parquet)
    winners.write_parquet(out_parquet)
    try:
        return ray.data.read_parquet(out_parquet)
    except FileNotFoundError:
        from raycdc.relational import dataset_schema

        return ray.data.from_arrow(dataset_schema(schema_like).empty_table())


def _materialize_winners(
    winners: "ray.data.Dataset", schema_like: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Materialize the winner set (the index is about to mutate — a lazy
    winner Dataset would re-filter against the UPDATED index on every
    re-execution and shift meaning mid-flight).  An ALL-DUPLICATE batch
    materializes to zero blocks and Ray forgets the schema entirely
    (``schema()`` comes back nameless) — fall back to an empty Dataset
    carrying the input's schema, same contract as
    :func:`_persist_winners`.  (``to_pandas()`` on ANY empty Dataset
    still yields a column-less frame — Ray's ``iter_batches`` skips
    empty blocks — so ``schema()`` is the discoverable contract.)"""
    winners = winners.materialize()
    if winners.count() == 0:
        from raycdc.relational import dataset_schema

        return ray.data.from_arrow(dataset_schema(schema_like).empty_table())
    return winners


def _band_index_spec(num_partitions: int):
    from raycdc.schema import TableSpec

    return TableSpec(
        name="near_dedup_bands",
        schema=pa.schema(
            [
                pa.field("band_key", pa.int64()),
                pa.field("doc_id", pa.int64()),
                pa.field("ts", pa.timestamp("us")),
            ]
        ),
        key_cols=("band_key", "doc_id"),
        version_cols=("ts", "lsn"),
        partition_key="band_key",
        num_partitions=num_partitions,
        sort_cols=("band_key", "doc_id"),
        merge_policy="lww",
    )


def _sig_index_spec(num_partitions: int, num_perm: int):
    from raycdc.schema import TableSpec

    return TableSpec(
        name="near_dedup_sigs",
        schema=pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("sig", pa.binary(num_perm * 8)),
                pa.field("ts", pa.timestamp("us")),
            ]
        ),
        key_cols=("doc_id",),
        version_cols=("ts", "lsn"),
        partition_key="doc_id",
        num_partitions=num_partitions,
        sort_cols=("doc_id",),
        merge_policy="lww",
    )


def _sig_fsl_to_fsb(col, num_perm: int) -> pa.Array:
    """fixed_size_list<int64> signature column → fixed_size_binary blobs
    (Arrow acero joins reject list payloads; fixed-width binary passes)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return pa.Array.from_buffers(
        pa.binary(num_perm * 8), len(col), [None, pa.py_buffer(flat.tobytes())]
    )


def _sig_fsb_to_np(col, num_perm: int) -> np.ndarray:
    """fixed_size_binary signature column (no nulls) → (n, num_perm)
    uint64 matrix, zero-copy from the Arrow buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    buf = np.frombuffer(col.buffers()[1], np.uint64)
    return buf[col.offset * num_perm : (col.offset + len(col)) * num_perm].reshape(
        len(col), num_perm
    )


def incremental_near_dedup(
    ds: "ray.data.Dataset",
    index_lake: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_lsn: int | None = None,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    num_partitions: int = 16,
    out_parquet: str | None = None,
    broadcast_max_ids: int = 5_000_000,
) -> "ray.data.Dataset":
    """FIRST-SEEN-WINS **near**-dedup ACROSS ingest batches — the MinHash
    sibling of :func:`incremental_dedup`: "we re-crawl continuously —
    never train on a document that NEARLY duplicates one we already kept".

    Persisted state under ``index_lake`` (two engine lakes, maintained by
    the exactly-once :func:`raycdc.engine.replay`):

    * ``bands/`` — one ``(band_key, doc_id)`` row per LSH band of every
      KEPT doc, partitioned by ``band_key``: the probe entry point.
    * ``sigs/``  — ``doc_id → minhash signature`` (fixed-width binary),
      partitioned by ``doc_id``: the verification payload.  Signatures,
      never text, are what the index stores — ~1 KB/doc at the defaults.

    Per batch:

    1. one signature pass over the batch (docs shorter than ``shingle_k``
       tokens never participate — mirroring the exact verifier's
       inner-join semantics);
    2. IN-BATCH candidates (:func:`lsh_candidate_pairs`) verified by
       exact shingle Jaccard (:func:`verify_jaccard_pairs` — the batch's
       text is at hand) ≥ ``threshold``;
    3. CROSS-BATCH probe: the batch's band rows look up the bands lake
       (:func:`raycdc.engine.lookup_join_lake`, fan-out by ``band_key``,
       co-partitioned — the index never shuffles), excluding rows claimed
       by THIS ``batch_lsn`` (crash-retry must not self-suppress);
       candidates fetch the indexed signature (one co-partitioned lookup
       by ``doc_id``) and their own (one tagged-union exchange bucketed by
       the new id), and match when the SIGNATURE-ESTIMATED Jaccard (fraction of equal
       minhash components — unbiased, σ≈0.035 at J=0.8/128 perms) ≥
       ``threshold``;
    4. ONE :func:`connected_components` over the union of in-batch edges
       and (new, indexed) match edges.  A whole component dies when it
       touches ANY indexed doc (transitive first-seen-wins); otherwise
       its min-id member survives.  Losers are delivered by the
       size-guarded :func:`filter_out_ids` — the corpus never shuffles;
    5. survivors' signatures and band rows replay into the index with
       ``lsn = batch_lsn`` (sigs FIRST, bands second — a band row without
       a signature would be a dangling pointer for later batches; a
       signature without band rows is unreachable and harmless).
       Redelivery at the same lsn is a checkpoint-pruned no-op, and the
       step-3 lsn exclusion keeps the winner set identical under
       crash-retry anywhere in the flow, so the call is IDEMPOTENT like
       its exact sibling.  ``batch_lsn`` must increase across batches;
       ids must be globally unique across batches.

    Scale shape: shuffles carry band keys, ids, and signatures — never
    payload text; the pair graph is ∝ duplicates; hot (degenerate) bands
    fan out the probe join, bounded upstream by the banding constant and
    deduped by :func:`pair_distinct_exchange`.
    """
    import ray

    from raycdc import sink as _S
    from raycdc.engine import lookup_join_lake, replay

    root = index_lake.rstrip("/")
    bands_lake, sigs_lake = f"{root}/bands", f"{root}/sigs"
    batch_lsn = _require_batch_lsn(batch_lsn, bands_lake, sigs_lake)
    sig_width = num_perm * 8

    def to_sigs(t: pa.Table) -> pa.Table:
        out = minhash_signatures(
            t, text_col, id_col, num_perm=num_perm, shingle_k=shingle_k,
            with_count=True,
        )
        out = out.filter(pc.greater(out["n_sh"], 0)).drop_columns(["n_sh"])
        return pa.table(
            {
                id_col: out[id_col].cast(pa.int64()),
                "sig": out["sig"],
            }
        )

    # consumed by the in-batch LSH, the cross-batch probe, and the index
    # update — materialize once (batch-scale: ~1 KB/doc) instead of
    # re-hashing every shingle three times
    sigs_new = ds.map_batches(
        to_sigs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # --- in-batch edges: exact verification (the text is at hand) ---------
    cand_in = lsh_candidate_pairs(
        sigs_new, bands=bands, id_col=id_col,
        num_partitions=num_partitions, distinct=False,
    )
    edges_in = verify_jaccard_pairs(
        cand_in, ds, threshold=threshold, shingle_k=shingle_k,
        text_col=text_col, id_col=id_col, num_partitions=num_partitions,
    ).select_columns(["a", "b"])

    # --- cross-batch match edges: signature-estimated verification --------
    match_edges = None
    if _S.read_spec_meta(bands_lake) is not None:
        def to_band_rows(t: pa.Table) -> pa.Table:
            return lsh_band_rows(t, bands=bands, id_col=id_col)

        band_rows = sigs_new.map_batches(
            to_band_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        looked = lookup_join_lake(
            band_rows, bands_lake, on=("band_key",),
            carry={"doc_id": pa.int64(), "lsn": pa.int64()},
        )

        def cand_rows(t: pa.Table) -> pa.Table:
            mask = pc.and_(
                pc.is_valid(t["doc_id_lake"]),
                pc.not_equal(
                    pc.fill_null(t["lsn_lake"], -1), pa.scalar(int(batch_lsn))
                ),
            )
            t = t.filter(mask)
            return pa.table(
                {
                    "a": t[id_col].cast(pa.int64()),
                    "b": t["doc_id_lake"].cast(pa.int64()),
                }
            )

        cand_x = pair_distinct_exchange(
            looked.map_batches(
                cand_rows, batch_format="pyarrow", zero_copy_batch=True
            ),
            num_partitions,
        )

        def key_by_old(t: pa.Table) -> pa.Table:
            return pa.table({"doc_id": t["b"], "a": t["a"]})

        with_old = lookup_join_lake(
            cand_x.map_batches(
                key_by_old, batch_format="pyarrow", zero_copy_batch=True
            ),
            sigs_lake,
            on=("doc_id",),
            carry={"sig": pa.binary(sig_width)},
        )

        # attach the batch's own signature and estimate — ONE tagged-union
        # exchange bucketed by the new id (the verify_jaccard_pairs shape;
        # Ray's native hash join rejects the schemaless empty bundles that
        # map_groups stages emit on no-candidate partitions)
        fsb = pa.binary(sig_width)
        sj_schema = pa.schema(
            [
                pa.field("key", pa.int64()),
                pa.field("b", pa.int64()),
                pa.field("sig_old", fsb),
                pa.field("sig_new", fsb),
                pa.field("__bk", pa.int64()),
            ]
        )

        def old_rows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t["sig_lake"]))
            a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "key": pa.array(a),
                    "b": t["doc_id"].cast(pa.int64()),
                    "sig_old": t["sig_lake"].cast(fsb),
                    "sig_new": pa.nulls(len(t), fsb),
                    "__bk": pa.array(_bucket_of(a, num_partitions)),
                },
                schema=sj_schema,
            )

        def new_rows(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "key": pa.array(ids),
                    "b": pa.nulls(len(t), pa.int64()),
                    "sig_old": pa.nulls(len(t), fsb),
                    "sig_new": _sig_fsl_to_fsb(t["sig"], num_perm),
                    "__bk": pa.array(_bucket_of(ids, num_partitions)),
                },
                schema=sj_schema,
            )

        def estimate(g: pa.Table) -> pa.Table:
            out_schema = pa.schema(
                [pa.field("a", pa.int64()), pa.field("b", pa.int64())]
            )
            is_new = pc.is_valid(g["sig_new"])
            new_part, pair_part = g.filter(is_new), g.filter(pc.invert(is_new))
            if len(new_part) == 0 or len(pair_part) == 0:
                return out_schema.empty_table()
            ids = new_part["key"].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            ids_sorted = ids[order]
            sig_mat = _sig_fsb_to_np(
                new_part["sig_new"].combine_chunks().drop_null(), num_perm
            )[order]
            keys = pair_part["key"].to_numpy(zero_copy_only=False)
            pos = np.minimum(
                np.searchsorted(ids_sorted, keys), len(ids_sorted) - 1
            )
            found = ids_sorted[pos] == keys
            pair_part = pair_part.filter(pa.array(found))
            if len(pair_part) == 0:
                return out_schema.empty_table()
            sn = sig_mat[pos[found]]
            so = _sig_fsb_to_np(
                pair_part["sig_old"].combine_chunks().drop_null(), num_perm
            )
            keep = pa.array((sn == so).mean(axis=1) >= threshold)
            return pa.table(
                {
                    "a": pair_part["key"].filter(keep),
                    "b": pair_part["b"].filter(keep),
                },
                schema=out_schema,
            )

        match_edges = (
            with_old.map_batches(
                old_rows, batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                sigs_new.map_batches(
                    new_rows, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby("__bk", num_partitions=num_partitions)
            .map_groups(estimate, batch_format="pyarrow")
        )
        # consumed twice below (component graph + contaminated-component
        # resolve): materialize ONCE — Ray re-executes common
        # subexpressions, and this one costs two lake lookups and two
        # exchanges per run (edge rows are ∝ duplicates, tiny to hold)
        match_edges = match_edges.materialize()

    edges = edges_in if match_edges is None else edges_in.union(match_edges)
    comps = connected_components(edges, num_partitions=num_partitions)

    # --- losers: non-representatives + whole components touching the index.
    # Resolved in ONE remote task over object-store refs — the same
    # pair-graph-scale budget as connected_components' single-task path
    # (labels and match endpoints are ∝ duplicates, never the corpus); the
    # driver holds only refs.
    comp_refs = comps.materialize().to_arrow_refs()
    old_refs = (
        match_edges.to_arrow_refs()  # materialized above
        if match_edges is not None
        else []
    )

    @ray.remote
    def _resolve_losers(n_comp: int, *tabs: pa.Table) -> pa.Table:
        comp_t = [t for t in tabs[:n_comp] if len(t)]
        old_t = [t for t in tabs[n_comp:] if len(t)]
        if not comp_t:
            return pa.table({id_col: pa.array([], pa.int64())})
        nodes = np.concatenate(
            [t["node"].to_numpy(zero_copy_only=False) for t in comp_t]
        )
        labels = np.concatenate(
            [t["component"].to_numpy(zero_copy_only=False) for t in comp_t]
        )
        lose = nodes != labels
        if old_t:
            old = np.unique(
                np.concatenate(
                    [t["b"].to_numpy(zero_copy_only=False) for t in old_t]
                )
            )
            contam = np.unique(labels[np.isin(nodes, old)])
            lose |= np.isin(labels, contam)
        return pa.table({id_col: pa.array(np.unique(nodes[lose]))})

    losers = ray.data.from_arrow_refs(
        [_resolve_losers.remote(len(comp_refs), *comp_refs, *old_refs)]
    ).materialize()

    winners = filter_out_ids(ds, losers, id_col, broadcast_max_ids)
    if out_parquet is not None:
        winners = _persist_winners(winners, out_parquet, ds)
    else:
        winners = _materialize_winners(winners, ds)

    win_sigs = filter_out_ids(sigs_new, losers, id_col, broadcast_max_ids)
    ts_fixed = 1_700_000_000_000_000

    def envelope(t: pa.Table, n: int) -> dict:
        return {
            "ts": pa.array(np.full(n, ts_fixed, np.int64), pa.timestamp("us")),
            "op": pa.array(np.full(n, "insert", dtype=object), pa.string()),
            "lsn": pa.array(np.full(n, int(batch_lsn), np.int64)),
            "seg_id": pa.array(np.zeros(n, np.int32)),
        }

    def sig_index_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "doc_id": t[id_col].cast(pa.int64()),
                "sig": _sig_fsl_to_fsb(t["sig"], num_perm),
                **envelope(t, n),
            }
        )

    def band_index_rows(t: pa.Table) -> pa.Table:
        br = lsh_band_rows(t, bands=bands, id_col=id_col)
        n = len(br)
        return pa.table(
            {
                "band_key": br["band_key"],
                "doc_id": br[id_col].cast(pa.int64()),
                **envelope(br, n),
            }
        )

    replay(
        win_sigs.map_batches(sig_index_rows, batch_format="pyarrow"),
        sigs_lake,
        _sig_index_spec(num_partitions, num_perm),
    )
    replay(
        win_sigs.map_batches(band_index_rows, batch_format="pyarrow"),
        bands_lake,
        _band_index_spec(num_partitions),
    )
    return winners


# ---------------------------------------------------------------------------
# MinHash + LSH


def minhash_signatures(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    shingle_k: int = 3,
    with_count: bool = False,
) -> pa.Table:
    """Per-doc minhash signature (fixed-size list<uint64>).

    ``with_count=True`` appends ``n_sh`` (int64 shingle count) so callers
    can exclude docs shorter than ``shingle_k`` tokens — their signature
    is the all-MAX sentinel, which would otherwise band-collide with
    every other short doc."""
    sh, off = word_shingle_hashes(batch[text_col], k=shingle_k)
    a, b = _perm_params(num_perm)
    n = len(batch)
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = np.diff(off) > 0
    with np.errstate(over="ignore"):
        for j in range(num_perm):
            v = sh * a[j] + b[j]
            if len(v):
                mins = np.minimum.reduceat(v, off[:-1][nonempty])
                sigs[nonempty, j] = mins
    cols = {
        id_col: batch[id_col],
        "sig": pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).view(np.int64)), num_perm
        ),
    }
    if with_count:
        cols["n_sh"] = pa.array(np.diff(off).astype(np.int64))
    return pa.table(cols)


def lsh_band_rows(
    sig_batch: pa.Table,
    bands: int = 32,
    id_col: str = "doc_id",
) -> pa.Table:
    """Explode signatures into (band_key, doc_id) rows — the ONLY data the
    LSH shuffle moves."""
    sig_col = sig_batch["sig"].combine_chunks()
    n = len(sig_batch)
    num_perm = sig_col.type.list_size
    if bands < 1 or bands > num_perm or num_perm % bands:
        # bands > num_perm would give r=0 (a CONSTANT band key for every
        # doc — all-pairs blowup); a non-divisor silently ignores the
        # trailing permutations and loosens the banding S-curve
        raise ValueError(
            f"bands={bands} must divide num_perm={num_perm} "
            f"(and be in [1, {num_perm}])"
        )
    rows = sig_col.flatten().to_numpy(zero_copy_only=False).view(np.uint64).reshape(n, num_perm)
    r = num_perm // bands
    ids = sig_batch[id_col].to_numpy(zero_copy_only=False)
    band_keys = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for bi in range(bands):
            chunk = rows[:, bi * r : (bi + 1) * r]
            acc = np.full(n, np.uint64(bi) * np.uint64(0x9E3779B97F4A7C15), np.uint64)
            for c in range(r):
                acc = (acc ^ chunk[:, c]) * np.uint64(1099511628211)
            band_keys[:, bi] = acc
    return pa.table(
        {
            "band_key": pa.array(
                (band_keys.reshape(-1) % np.uint64(2**63)).astype(np.int64)
            ),
            id_col: pa.array(np.repeat(ids, bands)),
        }
    )



def pair_distinct_exchange(
    pairs: "ray.data.Dataset",
    num_partitions: int,
    extra_cols: "tuple[str, ...]" = (),
) -> "ray.data.Dataset":
    """Global distinct over (a, b) pair rows: ONE hash-bucketed exchange
    (``__pk = golden-ratio-hash(a, b) % num_partitions`` — a bucket, not a
    raw hash, so Ray dispatches num_partitions UDF calls), then one
    np.unique over each bucket's (a, b) int64 matrix keeping the first
    occurrence (duplicates of a pair carry identical ``extra_cols``, which
    ride along).  Shared by the LSH, SimHash, and embedding near-dup
    pipelines."""
    cols = ["a", "b", *extra_cols]

    def pair_key(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            k = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ b.astype(
                np.uint64
            )
        return t.append_column(
            "__pk", pa.array((k % np.uint64(num_partitions)).astype(np.int64))
        )

    def distinct(g: pa.Table) -> pa.Table:
        ab = np.stack(
            [
                g["a"].to_numpy(zero_copy_only=False),
                g["b"].to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        _, first = np.unique(ab, axis=0, return_index=True)
        return g.select(cols).take(pa.array(np.sort(first)))

    return (
        pairs.map_batches(pair_key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pk", num_partitions=num_partitions)
        .map_groups(distinct, batch_format="pyarrow")
    )


def banded_pairs(
    g: pa.Table,
    key_col: str = "band_key",
    id_col: str = "doc_id",
    max_bucket: int = 512,
) -> pa.Table:
    """All (a<b) pairs within EACH band of a hash-bucketed group.

    The group carries many distinct band keys (the groupby runs on
    ``hash(band_key) % P``, not the raw key — Ray dispatches one Python UDF
    call per distinct groupby key, so banding at raw-key granularity costs
    O(#bands) interpreter overhead).  One sort + segmented boundaries, then
    pair generation only for the bands with >= 2 members; oversized bands
    are capped and counted via :data:`raycdc.metrics.CAPS`."""
    from raycdc.metrics import CAPS

    g = g.sort_by([(key_col, "ascending"), (id_col, "ascending")])
    keys = g[key_col].to_numpy(zero_copy_only=False)
    ids = g[id_col].to_numpy(zero_copy_only=False)
    n = len(g)
    if n == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    new = np.ones(n, dtype=bool)
    new[1:] = keys[1:] != keys[:-1]
    starts = np.where(new)[0]
    ends = np.append(starts[1:], n)
    multi = (ends - starts) >= 2
    out_a, out_b = [], []
    for s, e in zip(starts[multi], ends[multi]):
        seg = ids[s:e]
        seg = seg[np.concatenate([[True], seg[1:] != seg[:-1]])]  # sorted dedup
        if len(seg) < 2:
            continue
        if len(seg) > max_bucket:
            CAPS.record("banded_pairs", len(seg), max_bucket)
            seg = seg[:max_bucket]
        ai, bi = np.triu_indices(len(seg), k=1)
        out_a.append(seg[ai])
        out_b.append(seg[bi])
    if not out_a:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a)),
            "b": pa.array(np.concatenate(out_b)),
        }
    )


def bucket_pairs(group: pa.Table, id_col: str = "doc_id", max_bucket: int = 512) -> pa.Table:
    """All (a<b) pairs within one band bucket; oversized buckets are capped
    to bound the quadratic blowup of degenerate buckets.  Every truncation
    is counted on :data:`raycdc.metrics.CAPS` and emitted as a
    ``raycdc.caps`` warning (worker log in distributed runs) — recall loss
    is observable, never silent."""
    from raycdc.metrics import CAPS

    ids = np.unique(group[id_col].to_numpy(zero_copy_only=False))
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    if len(ids) > max_bucket:
        CAPS.record("bucket_pairs", len(ids), max_bucket)
        ids = ids[:max_bucket]
    ai, bi = np.triu_indices(len(ids), k=1)
    return pa.table({"a": pa.array(ids[ai]), "b": pa.array(ids[bi])})


def lsh_candidate_pairs(
    sigs: "ray.data.Dataset",
    bands: int = 32,
    id_col: str = "doc_id",
    num_partitions: int = 64,
    distinct: bool = True,
) -> "ray.data.Dataset":
    """sig Dataset → candidate (a, b) pairs.

    ``distinct=True`` adds a hash-partitioned dedup exchange.  Pass
    ``distinct=False`` when the consumer dedups anyway — e.g.
    :func:`verify_jaccard_pairs` buckets pairs by ``hash(a)`` in its first
    join pass, which co-locates every duplicate of a pair (same ``a`` ⇒
    same bucket), so its in-group distinct is global and this exchange
    would be a pure extra all-to-all."""
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    def band_rows_bucketed(t: pa.Table) -> pa.Table:
        out = lsh_band_rows(t, bands=bands, id_col=id_col)
        bk = out["band_key"].to_numpy(zero_copy_only=False)
        return out.append_column(
            "__bk", pa.array(_bucket_of(bk, num_partitions))
        )

    band_ds = sigs.map_batches(
        band_rows_bucketed, batch_format="pyarrow", zero_copy_batch=True
    )
    # groupby the HASH BUCKET of the band key (bounded UDF-call count), pair
    # generation segmented per band inside the task — see banded_pairs
    pairs = band_ds.groupby("__bk", num_partitions=num_partitions).map_groups(
        lambda g: banded_pairs(g, id_col=id_col), batch_format="pyarrow"
    )
    if not distinct:
        return pairs
    return pair_distinct_exchange(pairs, num_partitions)


_SHINGLE_LIST = pa.large_list(pa.int64())

# unified row schema for the co-partitioned join passes: index rows carry
# (key=doc_id, s=shingles); pair rows carry (key=probe side, a, b[, s_a])
_JOIN_SCHEMA = pa.schema(
    [
        pa.field("key", pa.int64()),
        pa.field("a", pa.int64()),
        pa.field("b", pa.int64()),
        pa.field("s_a", _SHINGLE_LIST),
        pa.field("s", _SHINGLE_LIST),
        pa.field("__bk", pa.int64()),
    ]
)


def _bucket_of(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def _null_lists(n: int) -> pa.Array:
    return pa.nulls(n, _SHINGLE_LIST)


def _list_flat(la) -> tuple[np.ndarray, np.ndarray]:
    """(flat int64 values, normalized offsets) of a (large_)list column."""
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    off = la.offsets.to_numpy().astype(np.int64)
    flat = la.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, off - off[0]


def shingle_index(
    corpus: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> "ray.data.Dataset":
    """Distributed ``(doc_id, s)`` shingle index: one row per document with
    at least one k-token shingle (docs shorter than ``k`` tokens are absent,
    matching the SQL oracle's ``WHERE len(tokens) >= k``).  Built with one
    streaming ``map_batches`` pass — the corpus text never leaves the task
    that read it; only the (much smaller) hash sets move."""

    def to_index(t: pa.Table) -> pa.Table:
        sh, off = word_shingle_hashes(t[text_col], k=shingle_k)
        s = pa.LargeListArray.from_arrays(
            pa.array(off, pa.int64()), pa.array(sh.view(np.int64), pa.int64())
        )
        tbl = pa.table({id_col: t[id_col].cast(pa.int64()), "s": s})
        return tbl.filter(pa.array(np.diff(off) > 0))

    return corpus.map_batches(to_index, batch_format="pyarrow", zero_copy_batch=True)


def _segmented_jaccard(s_a, s_b) -> np.ndarray:
    """Vectorized per-pair Jaccard of two aligned list columns of DISTINCT
    hash sets: concatenate both sides labeled by pair id, one lexsort, count
    adjacent duplicates per pair (a value can appear at most once per side,
    so every duplicate is an intersection hit).  No per-pair Python loop."""
    fa, oa = _list_flat(s_a)
    fb, ob = _list_flat(s_b)
    ca, cb = np.diff(oa), np.diff(ob)
    n = len(ca)
    pid = np.concatenate(
        [np.repeat(np.arange(n, dtype=np.int64), ca), np.repeat(np.arange(n, dtype=np.int64), cb)]
    )
    vals = np.concatenate([fa, fb])
    order = np.lexsort((vals, pid))
    v, p = vals[order], pid[order]
    if len(v) > 1:
        dup = (v[1:] == v[:-1]) & (p[1:] == p[:-1])
        inter = np.bincount(p[1:][dup], minlength=n)
    else:
        inter = np.zeros(n, dtype=np.int64)
    union = ca + cb - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def verify_jaccard_pairs(
    pairs: "ray.data.Dataset",
    corpus: "ray.data.Dataset | pa.Table",
    threshold: float = 0.5,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Exact word-shingle Jaccard over candidate pairs — fully distributed.

    No driver-side corpus materialization and no broadcast: the shingle
    index is itself a Dataset, and each pair meets its two shingle sets via
    two co-partitioned hash-join passes (pairs bucketed by ``hash(a)``, then
    by ``hash(b)``; the index bucketed by ``hash(doc_id)`` on both passes).
    Inside a bucket the lookup is a vectorized ``searchsorted`` + Arrow list
    gather, and the Jaccard itself is a segmented sort-merge
    (:func:`_segmented_jaccard`) — no Python loop anywhere.

    Pairs whose ``a`` or ``b`` has no index entry (fewer than ``shingle_k``
    tokens, or absent from the corpus) are DROPPED — inner-join semantics,
    matching the SQL oracle's join over the shingle CTE.

    Scale shape: two shuffles whose payload is hash sets of candidate docs
    only, each bounded by the candidate pair count — never the corpus text,
    never all-pairs.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    if isinstance(corpus, pa.Table):
        corpus = ray.data.from_arrow(corpus)
    idx = shingle_index(corpus, text_col=text_col, id_col=id_col, shingle_k=shingle_k)

    def idx_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(t)
        return pa.table(
            {
                "key": pa.array(ids.astype(np.int64)),
                "a": pa.nulls(n, pa.int64()),
                "b": pa.nulls(n, pa.int64()),
                "s_a": _null_lists(n),
                "s": t["s"].cast(_SHINGLE_LIST),
                "__bk": pa.array(_bucket_of(ids, num_partitions)),
            },
            schema=_JOIN_SCHEMA,
        )

    def pair_rows(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(t)
        return pa.table(
            {
                "key": pa.array(a),
                "a": pa.array(a),
                "b": pa.array(b),
                "s_a": _null_lists(n),
                "s": _null_lists(n),
                "__bk": pa.array(_bucket_of(a, num_partitions)),
            },
            schema=_JOIN_SCHEMA,
        )

    def _split(g: pa.Table) -> tuple[pa.Table, pa.Table]:
        is_idx = pc.is_valid(g["s"])
        return g.filter(is_idx), g.filter(pc.invert(is_idx))

    def _lookup(idx_part: pa.Table, keys: np.ndarray):
        """(found mask, gathered shingle lists) for keys vs this bucket's
        index slice — sorted ids + searchsorted + one Arrow list take."""
        ids = idx_part["key"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids_sorted = ids[order]
        sl = idx_part["s"].combine_chunks().take(pa.array(order))
        pos = np.searchsorted(ids_sorted, keys)
        pos_c = np.minimum(pos, len(ids_sorted) - 1)
        found = ids_sorted[pos_c] == keys
        taken = sl.take(pa.array(np.where(found, pos_c, 0).astype(np.int64)))
        return found, taken

    def join_a(g: pa.Table) -> pa.Table:
        # ECHO-THROUGH: index rows ride along unchanged (their __bk is
        # already hash(doc_id), the key the second pass needs), so the
        # shingle index is computed and shuffled exactly once and the plan
        # has no diamond (a second union of idx would re-run the corpus
        # read + shingling — Ray does not dedupe common subexpressions).
        idx_part, pr = _split(g)
        if len(pr) == 0 or len(idx_part) == 0:
            return idx_part  # no pairs survive, but downstream needs the idx
        # global distinct on (a, b): every duplicate of a pair shares a,
        # hence this bucket — lets callers skip a dedicated dedup exchange
        ab = np.stack(
            [
                pr["a"].to_numpy(zero_copy_only=False),
                pr["b"].to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        _, first = np.unique(ab, axis=0, return_index=True)
        if len(first) < len(pr):
            pr = pr.take(pa.array(np.sort(first)))
        keys = pr["key"].to_numpy(zero_copy_only=False)
        found, s_a = _lookup(idx_part, keys)
        pr = pr.set_column(pr.schema.get_field_index("s_a"), "s_a", s_a.cast(_SHINGLE_LIST))
        pr = pr.filter(pa.array(found))
        # re-key on b for the second pass
        b = pr["b"].to_numpy(zero_copy_only=False)
        pr = pr.set_column(pr.schema.get_field_index("key"), "key", pa.array(b))
        pr = pr.set_column(
            pr.schema.get_field_index("__bk"),
            "__bk",
            pa.array(_bucket_of(b, num_partitions)),
        )
        return pa.concat_tables([idx_part, pr])

    def join_b(g: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                pa.field("a", pa.int64()),
                pa.field("b", pa.int64()),
                pa.field("jaccard", pa.float64()),
            ]
        )
        idx_part, pr = _split(g)
        if len(pr) == 0 or len(idx_part) == 0:
            return out_schema.empty_table()
        keys = pr["key"].to_numpy(zero_copy_only=False)
        found, s_b = _lookup(idx_part, keys)
        pr = pr.filter(pa.array(found))
        s_b = s_b.filter(pa.array(found))
        jac = _segmented_jaccard(pr["s_a"], s_b)
        # floor-quantize (not round): round-half ties break differently in
        # numpy (half-even) vs SQL engines (half-away) — floor is identical
        out = pa.table(
            {
                "a": pr["a"],
                "b": pr["b"],
                "jaccard": pa.array(np.floor(jac * 1e6) / 1e6),
            },
            schema=out_schema,
        )
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    idx_t = idx.map_batches(idx_rows, batch_format="pyarrow", zero_copy_batch=True)
    pairs_t = pairs.map_batches(pair_rows, batch_format="pyarrow", zero_copy_batch=True)
    pass1 = (
        pairs_t.union(idx_t)
        .groupby("__bk", num_partitions=num_partitions)
        .map_groups(join_a, batch_format="pyarrow")
    )
    # pass1 echoes the index rows through, so no second union: exactly two
    # exchanges total, index computed once
    return pass1.groupby("__bk", num_partitions=num_partitions).map_groups(
        join_b, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# benchmark decontamination


def contamination_overlap(
    corpus: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> "ray.data.Dataset":
    """Per-document n-gram overlap with a benchmark/eval set — the
    decontamination primitive for training-data pipelines: a training doc
    sharing any ``shingle_k``-token shingle with the benchmark leaks
    evaluation data and must be dropped (or down-weighted) before training.

    Output: one row ``(id_col, n_overlap)`` per corpus document that shares
    at least one distinct shingle with the benchmark (``n_overlap`` =
    distinct shared shingles); docs shorter than ``shingle_k`` tokens never
    match.  Filter the corpus with an anti-join on the result — or just
    invert the membership mask inline — to materialize the clean split.

    Scale shape: the BENCHMARK side is reduced to a sorted distinct
    shingle-hash array and broadcast via one ``ray.put`` (eval sets are
    MBs against a 100 TB corpus — the correct broadcast asymmetry); the
    corpus streams through one ``map_batches`` with vectorized
    ``searchsorted`` membership — no shuffle at all.  Contract: the
    benchmark's distinct shingle set must fit the object store; for a
    contamination set that large, co-partition both sides through the
    shingle-index join machinery of :func:`verify_jaccard_pairs` instead.
    """

    def bench_hashes(t: pa.Table) -> pa.Table:
        sh, _ = word_shingle_hashes(t[text_col], k=shingle_k)
        return pa.table({"h": pa.array(np.unique(sh).view(np.int64))})

    # per-batch distinct collapses the benchmark to hash rows before the
    # driver sees it; the driver folds tiny arrays, never text
    parts = benchmark.map_batches(
        bench_hashes, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    bench = (
        np.unique(parts["h"].to_numpy().astype(np.int64).view(np.uint64))
        if len(parts)
        else np.empty(0, np.uint64)
    )
    bench_ref = ray.put(bench)

    def overlap(t: pa.Table) -> pa.Table:
        b = ray.get(bench_ref)
        sh, off = word_shingle_hashes(t[text_col], k=shingle_k)
        n = len(t)
        if len(sh) == 0 or len(b) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "n_overlap": pa.array([], pa.int64())}
            )
        pos = np.searchsorted(b, sh)
        member = b[np.minimum(pos, len(b) - 1)] == sh
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        n_overlap = np.bincount(doc_rep[member], minlength=n)
        hit = n_overlap > 0
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()).filter(pa.array(hit)),
                "n_overlap": pa.array(n_overlap[hit]),
            }
        )

    return corpus.map_batches(overlap, batch_format="pyarrow", zero_copy_batch=True)


def cross_doc_dup_fraction(
    corpus: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-document CROSS-corpus repetition: the fraction of a doc's
    distinct ``shingle_k``-token shingles that also occur in at least one
    OTHER document — the boilerplate/template signal web-scale pipelines
    threshold on (a page whose n-grams mostly exist elsewhere is navigation
    chrome or a mirror, not content).  The within-doc complement is
    :func:`raycdc.text.repetition_stats`; the reference's transform layer
    has no corpus-global statistic at all (handlers are per-file:
    /root/reference/handler.go:100-130), which is exactly why this lives in
    the engine, not a projector.

    Output: ``(id_col, n_shingles, n_dup, dup_frac)`` — one row per doc
    with at least one shingle; ``dup_frac = n_dup / n_shingles``
    floor-quantized to 1e-6 (the repo's oracle convention).

    Scale shape: shingle instances exchange ONCE, hash-bucketed by shingle
    (a shingle's global doc count is decidable only with all its instances
    co-located); each bucket task runs one segmented run-length pass and
    pre-aggregates to ``(doc, n, n_dup)`` partials — ≤ docs×buckets rows —
    so the second, per-doc exchange moves partials, never shingles.  No
    broadcast, no driver materialization, both groupbys carry explicit
    ``num_partitions`` over bounded bucket keys.
    """
    from raycdc.engine import _configure_shuffle
    from raycdc.relational import pre_aggregate

    _configure_shuffle()

    def shingle_rows(t: pa.Table) -> pa.Table:
        sh, off = word_shingle_hashes(t[text_col], k=shingle_k)
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, np.diff(off))
        h = sh.view(np.int64)
        return pa.table(
            {
                "h": pa.array(h),
                "doc_id": pa.array(doc),
                "__bk": pa.array(_bucket_of(h, num_partitions)),
            }
        )

    def bucket_partials(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_shingles": pa.array([], pa.int64()),
                    "n_dup": pa.array([], pa.int64()),
                }
            )
        h = g["h"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        # rows are distinct per (doc, shingle) by construction
        # (word_shingle_hashes dedups within each doc), so a shingle's row
        # count here IS its distinct-doc count
        order = np.argsort(h, kind="stable")
        hs, ds_ = h[order], doc[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        seg = np.cumsum(first) - 1
        runlen = np.bincount(seg)
        dup = runlen[seg] > 1
        docs_u, inv = np.unique(ds_, return_inverse=True)
        n = np.bincount(inv, minlength=len(docs_u))
        nd = np.bincount(inv, weights=dup, minlength=len(docs_u))
        return pa.table(
            {
                "doc_id": pa.array(docs_u),
                "n_shingles": pa.array(n.astype(np.int64)),
                "n_dup": pa.array(nd.astype(np.int64)),
            }
        )

    rows = corpus.map_batches(
        shingle_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = rows.groupby("__bk", num_partitions=num_partitions).map_groups(
        bucket_partials, batch_format="pyarrow"
    )
    totals = pre_aggregate(
        partials,
        key_cols=["doc_id"],
        sum_cols=["n_shingles", "n_dup"],
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_shingles"].to_numpy(zero_copy_only=False).astype(np.float64)
        nd = t["n_dup"].to_numpy(zero_copy_only=False).astype(np.float64)
        frac = np.floor(nd / n * 1e6) / 1e6
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_shingles": t["n_shingles"],
                "n_dup": t["n_dup"],
                "dup_frac": pa.array(frac),
            }
        )

    return totals.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


_DUP_STREAM_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("h", pa.int64()),
        pa.field("pos", pa.int64()),
        pa.field("__bk", pa.int64()),
    ]
)


def _dup_marked_stream(
    corpus: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    k: int,
    num_partitions: int,
) -> "ray.data.Dataset":
    """Shared head of :func:`dup_span_stats` and :func:`cut_dup_spans`:
    the corpus reduced to duplicated-shingle INSTANCE rows co-located with
    per-doc sentinels.

    One kernel over the corpus emits ``(doc_id, h, pos)`` per shingle
    instance bucketed by shingle hash, plus one sentinel row per doc
    (``pos = -1``, ``h`` carries the token count) bucketed by
    ``hash(doc_id)``; one bucketed exchange later, instances whose hash
    occurs in ≥ 2 distinct docs are re-keyed by ``hash(doc_id)`` and the
    sentinels echo through — so the returned stream, grouped once more by
    ``__bk``, co-locates every doc's sentinel with its duplicated
    instances.  Text never shuffles."""
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()

    def instance_rows(t: pa.Table) -> pa.Table:
        sh, pos, sh_counts, tok_counts = _shingle_instances(t[text_col], k)
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, sh_counts)
        h = sh.view(np.int64)
        # sentinel per doc: pos = -1, h column carries n_tokens, bucketed by
        # hash(doc_id) — the pass-2 key — and echoed through pass 1
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([doc, ids])),
                "h": pa.array(
                    np.concatenate([h, tok_counts.astype(np.int64)])
                ),
                "pos": pa.array(
                    np.concatenate([pos, np.full(len(ids), -1, np.int64)])
                ),
                "__bk": pa.array(
                    np.concatenate(
                        [_bucket_of(h, num_partitions), _bucket_of(ids, num_partitions)]
                    )
                ),
            },
            schema=_DUP_STREAM_SCHEMA,
        )

    def mark_duplicated(g: pa.Table) -> pa.Table:
        """One hash bucket: keep instances whose shingle hash occurs in ≥ 2
        distinct docs; re-key them by hash(doc_id); echo sentinels."""
        pos = g["pos"].to_numpy(zero_copy_only=False)
        inst_mask = pos >= 0
        sent = g.filter(pa.array(~inst_mask))
        if not inst_mask.any():
            return sent
        h = g["h"].to_numpy(zero_copy_only=False)[inst_mask]
        doc = g["doc_id"].to_numpy(zero_copy_only=False)[inst_mask]
        p = pos[inst_mask]
        # distinct-doc count per hash: sort by (h, doc); a hash spans ≥ 2
        # docs iff its segment has ≥ 2 distinct doc runs
        order = np.lexsort((doc, h))
        hs, ds_ = h[order], doc[order]
        seg_first = np.ones(len(hs), dtype=bool)
        seg_first[1:] = hs[1:] != hs[:-1]
        doc_first = seg_first.copy()
        doc_first[1:] |= ds_[1:] != ds_[:-1]
        seg = np.cumsum(seg_first) - 1
        ndocs = np.bincount(seg[doc_first])
        keep = ndocs[seg] >= 2
        doc_k, p_k = ds_[keep], p[order][keep]
        kept = pa.table(
            {
                "doc_id": pa.array(doc_k),
                "h": pa.array(np.zeros(len(doc_k), np.int64)),
                "pos": pa.array(p_k),
                "__bk": pa.array(_bucket_of(doc_k, num_partitions)),
            },
            schema=_DUP_STREAM_SCHEMA,
        )
        return pa.concat_tables([sent, kept])

    rows = corpus.map_batches(
        instance_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return rows.groupby("__bk", num_partitions=num_partitions).map_groups(
        mark_duplicated, batch_format="pyarrow"
    )


def dup_span_stats(
    corpus: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-document DUPLICATED-SUBSTRING-SPAN statistics — the
    exact-substring-dedup signal (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): which token RANGES of each doc are
    covered by a ``shingle_k``-gram that also occurs in at least one OTHER
    document.  Where :func:`cross_doc_dup_fraction` counts duplicated
    shingles, this measures their POSITIONAL coverage — the quantity
    substring-dedup pipelines actually cut on (a doc that is 5% duplicated
    shingles spread thin differs from one with a single 500-token verbatim
    block).  Not in the reference (handlers are per-file, no corpus-global
    op: /root/reference/handler.go:100-130).

    Output, one row per document::

        (doc_id, n_tokens, dup_tokens, dup_frac, max_dup_span)

    ``dup_tokens`` = tokens covered by the union of duplicated-shingle
    intervals ``[pos, pos+k)``; ``max_dup_span`` = the longest merged run
    (two instances merge iff their starts differ by ≤ k); ``dup_frac`` =
    ``dup_tokens / n_tokens`` floor-quantized to 1e-6 (repo oracle
    convention).  Docs shorter than ``k`` tokens report zeros.

    Scale shape: ONE kernel over the corpus emits per-instance rows
    ``(h, doc_id, pos)`` bucketed by shingle hash PLUS one per-doc sentinel
    row bucketed by ``hash(doc_id)`` (text never shuffles; the exchange is
    O(total tokens) fixed-width rows — the same asymptotics as
    suffix-array substring dedup).  Bucket pass 1 marks instances whose
    hash spans ≥ 2 distinct docs and re-keys survivors by ``hash(doc_id)``,
    echoing sentinels through unchanged (the verify_jaccard echo-through
    pattern — no diamond, corpus read once).  Bucket pass 2 co-locates a
    doc's sentinel with its duplicated instances and runs one segmented
    sweep (sort by (doc, pos); interval-union coverage and longest-run via
    run boundaries at gap > k).  Both groupbys carry explicit
    ``num_partitions`` over bounded bucket keys per the repo convention.
    """
    k = int(shingle_k)
    out_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("dup_tokens", pa.int64()),
            pa.field("dup_frac", pa.float64()),
            pa.field("max_dup_span", pa.int64()),
        ]
    )

    def span_sweep(g: pa.Table) -> pa.Table:
        """One doc bucket: sentinels give the doc universe + token counts;
        segmented interval-union over the duplicated instances."""
        if len(g) == 0:
            return out_schema.empty_table()
        pos = g["pos"].to_numpy(zero_copy_only=False)
        inst_mask = pos >= 0
        sent = g.filter(pa.array(~inst_mask))
        doc_s = sent["doc_id"].to_numpy(zero_copy_only=False)
        ntok_s = sent["h"].to_numpy(zero_copy_only=False)
        s_ord = np.argsort(doc_s, kind="stable")
        doc_s, ntok_s = doc_s[s_ord], ntok_s[s_ord]
        n_docs = len(doc_s)
        if n_docs == 0:
            # instances without their doc's sentinel cannot happen (both are
            # bucketed by the same hash(doc_id)) — fail loudly if they do
            if inst_mask.any():
                raise AssertionError("dup_span_stats: instance without sentinel")
            return out_schema.empty_table()
        cov = np.zeros(n_docs, dtype=np.int64)
        max_span = np.zeros(n_docs, dtype=np.int64)
        if inst_mask.any():
            doc = g["doc_id"].to_numpy(zero_copy_only=False)[inst_mask]
            p = pos[inst_mask]
            order = np.lexsort((p, doc))
            d, ps = doc[order], p[order]
            new_doc = d[1:] != d[:-1]
            gap = np.diff(ps)
            contrib = np.empty(len(ps), dtype=np.int64)
            contrib[0] = k
            contrib[1:] = np.where(new_doc, k, np.minimum(gap, k))
            idx = np.searchsorted(doc_s, d)
            cov = np.bincount(idx, weights=contrib, minlength=n_docs).astype(
                np.int64
            )
            # merged runs: break at doc change or gap > k
            run_start = np.concatenate([[True], new_doc | (gap > k)])
            starts = np.where(run_start)[0]
            ends = np.append(starts[1:], len(ps)) - 1
            run_len = ps[ends] - ps[starts] + k
            run_doc = idx[starts]
            doc_first_run = np.ones(len(run_doc), dtype=bool)
            doc_first_run[1:] = run_doc[1:] != run_doc[:-1]
            seg_starts = np.where(doc_first_run)[0]
            max_span[run_doc[seg_starts]] = np.maximum.reduceat(
                run_len, seg_starts
            )
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.where(
                ntok_s > 0,
                np.floor(cov / np.maximum(ntok_s, 1) * 1e6) / 1e6,
                0.0,
            )
        return pa.table(
            {
                "doc_id": pa.array(doc_s),
                "n_tokens": pa.array(ntok_s),
                "dup_tokens": pa.array(cov),
                "dup_frac": pa.array(frac),
                "max_dup_span": pa.array(max_span),
            },
            schema=out_schema,
        )

    marked = _dup_marked_stream(corpus, text_col, id_col, k, num_partitions)
    return marked.groupby("__bk", num_partitions=num_partitions).map_groups(
        span_sweep, batch_format="pyarrow"
    )


def cut_dup_spans(
    corpus: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """REMOVE cross-document duplicated substrings from each document —
    the exact-substring-dedup TRANSFORM (Lee et al. 2022: cut, don't
    drop): every token covered by a ``shingle_k``-gram that also occurs
    in another document is deleted; the survivors re-join into the
    cleaned text.  :func:`dup_span_stats` is the read-only companion
    (same duplicated-span model, statistics instead of surgery).

    Output: ``(id_col, text_col, n_removed)`` — one row per input doc
    (uncut docs pass through verbatim with ``n_removed = 0``; fully
    duplicated docs become empty strings, for the caller to drop or
    keep).  Token boundaries are single spaces, matching the repo's
    tokenizer convention.

    Scale shape: the duplicated RUNS (doc_id, start, end — merged
    intervals, ∝ duplicated regions only) come from the shared
    :func:`_dup_marked_stream` exchanges; they are then sorted by doc id
    into object-store chunks and each corpus task fetches (zero-copy)
    only the chunks overlapping its batch's id range — the
    :func:`filter_out_ids` delivery pattern, so the corpus text NEVER
    shuffles and nothing concentrates the run set in one heap.  The cut
    itself is one vectorized pass: delta-encoded interval coverage over
    the flattened token array, one filter, one ``pc.binary_join``.
    """
    k = int(shingle_k)
    runs_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("start", pa.int64()),
            pa.field("end", pa.int64()),
        ]
    )

    def runs_sweep(g: pa.Table) -> pa.Table:
        """One doc bucket of the marked stream: merged duplicated runs
        (sentinels carry no run information here — skipped)."""
        if len(g) == 0:
            return runs_schema.empty_table()
        pos = g["pos"].to_numpy(zero_copy_only=False)
        inst_mask = pos >= 0
        if not inst_mask.any():
            return runs_schema.empty_table()
        doc = g["doc_id"].to_numpy(zero_copy_only=False)[inst_mask]
        p = pos[inst_mask]
        order = np.lexsort((p, doc))
        d, ps = doc[order], p[order]
        new_doc = d[1:] != d[:-1]
        gap = np.diff(ps)
        run_start = np.concatenate([[True], new_doc | (gap > k)])
        starts = np.where(run_start)[0]
        ends = np.append(starts[1:], len(ps)) - 1
        return pa.table(
            {
                "doc_id": pa.array(d[starts]),
                "start": pa.array(ps[starts]),
                "end": pa.array(ps[ends]),
            },
            schema=runs_schema,
        )

    marked = _dup_marked_stream(corpus, text_col, id_col, k, num_partitions)
    runs = marked.groupby("__bk", num_partitions=num_partitions).map_groups(
        runs_sweep, batch_format="pyarrow"
    )
    # doc-id-range chunks in the object store (filter_out_ids delivery):
    # tasks probe only overlapping chunks; the driver keeps (ref, lo, hi)
    refs, lo, hi = _range_chunked_refs(runs, "doc_id")

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field(text_col, pa.string()),
            pa.field("n_removed", pa.int64()),
        ]
    )

    def cut(t: pa.Table) -> pa.Table:
        ids = t[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tok = pc.split_pattern(t[text_col], " ")
        la = tok.combine_chunks() if isinstance(tok, pa.ChunkedArray) else tok
        flat = la.flatten()
        toff = la.offsets.to_numpy().astype(np.int64)
        toff = toff - toff[0]
        total = int(toff[-1]) if len(toff) else 0
        covered = np.zeros(total + 1, dtype=np.int64)
        if len(ids) and len(refs):
            bmin, bmax = int(ids.min()), int(ids.max())
            # batch ids may be unsorted: map run doc ids via sorted view
            id_order = np.argsort(ids, kind="stable")
            ids_sorted = ids[id_order]
            for i in np.nonzero((hi >= bmin) & (lo <= bmax))[0]:
                rt = ray.get(refs[i])
                rd = rt["doc_id"].to_numpy(zero_copy_only=False)
                rs = rt["start"].to_numpy(zero_copy_only=False)
                re_ = rt["end"].to_numpy(zero_copy_only=False)
                pos_in = np.searchsorted(ids_sorted, rd)
                pos_c = np.minimum(pos_in, len(ids_sorted) - 1)
                m = ids_sorted[pos_c] == rd
                rows = id_order[pos_c[m]]
                fs = toff[rows] + rs[m]
                fe = toff[rows] + re_[m] + k  # exclusive stop; ≤ row end
                np.add.at(covered, fs, 1)
                np.add.at(covered, fe, -1)
        cov_mask = np.cumsum(covered[:-1]) > 0
        counts = np.diff(toff)
        if total:
            row_of_flat = np.repeat(
                np.arange(len(ids), dtype=np.int64), counts
            )
            n_cov = np.bincount(row_of_flat[cov_mask], minlength=len(ids))
        else:
            n_cov = np.zeros(len(ids), dtype=np.int64)
        kept_counts = counts - n_cov
        new_off = np.concatenate([[0], np.cumsum(kept_counts)])
        kept_lists = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()),
            flat.filter(pa.array(~cov_mask)) if total else flat,
        )
        cleaned = pc.binary_join(kept_lists, " ")
        n_removed = n_cov.astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                text_col: cleaned,
                "n_removed": pa.array(n_removed),
            },
            schema=out_schema,
        )

    return corpus.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# SimHash


def simhash_signatures(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 2,
) -> pa.Table:
    """64-bit Charikar SimHash over word shingles (vectorized bit-vote).

    Output carries ``n_sh`` (the doc's shingle count): zero-shingle docs
    all vote to the SAME all-zero signature, so downstream banding must
    exclude them (``simhash_candidate_pairs`` does) — otherwise every
    sub-``shingle_k`` document pairs with every other at hamming 0."""
    sh, off = word_shingle_hashes(batch[text_col], k=shingle_k)
    n = len(batch)
    # bits (total, 64) as ±1 votes, segment-summed per doc
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    ) * 2 - 1
    votes = np.zeros((n, 64), dtype=np.int64)
    nonempty = np.diff(off) > 0
    if len(sh):
        votes[nonempty] = np.add.reduceat(bits, off[:-1][nonempty], axis=0)[
            : nonempty.sum()
        ]
    sig = (votes > 0).astype(np.uint64) @ (
        np.uint64(1) << np.arange(64, dtype=np.uint64)
    )
    return pa.table(
        {
            id_col: batch[id_col],
            "simhash": pa.array(sig.view(np.int64)),
            "n_sh": pa.array(np.diff(off).astype(np.int64)),
        }
    )


def simhash_candidate_pairs(
    sigs: "ray.data.Dataset",
    max_hamming: int = 3,
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Candidates via 4×16-bit chunk banding (pigeonhole: hamming ≤ 3 ⇒ at
    least one identical chunk), then exact Hamming filter."""

    from raycdc.engine import _configure_shuffle

    _configure_shuffle()

    def chunk_rows(t: pa.Table) -> pa.Table:
        if "n_sh" in t.column_names:
            # zero-shingle docs share the all-zero signature — not a match
            t = t.filter(pc.greater(t["n_sh"], 0))
        s = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keys, out_ids = [], []
        for c in range(4):
            chunk = (s >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            keys.append(chunk.astype(np.int64) * 4 + c)
            out_ids.append(ids)
        key = np.concatenate(keys)
        return pa.table(
            {
                "chunk_key": pa.array(key),
                id_col: pa.array(np.concatenate(out_ids)),
                "simhash": pa.array(np.tile(s.view(np.int64), 4)),
                "__bk": pa.array(_bucket_of(key, num_partitions)),
            }
        )

    _EMPTY = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        # group = ONE HASH BUCKET of chunk keys (bounded UDF-call count);
        # segment by chunk key inside, pairs only for multi-member segments
        g = g.sort_by([("chunk_key", "ascending"), (id_col, "ascending")])
        key = g["chunk_key"].to_numpy(zero_copy_only=False)
        ids_all = g[id_col].to_numpy(zero_copy_only=False)
        sig_all = g["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(g)
        if n == 0:
            return _EMPTY
        new = np.ones(n, dtype=bool)
        new[1:] = key[1:] != key[:-1]
        starts = np.where(new)[0]
        ends = np.append(starts[1:], n)
        multi = (ends - starts) >= 2
        out_a, out_b, out_h = [], [], []
        for s0, e0 in zip(starts[multi], ends[multi]):
            ids, sigs_ = ids_all[s0:e0], sig_all[s0:e0]
            keep = np.concatenate([[True], ids[1:] != ids[:-1]])  # sorted dedup
            ids, sigs_ = ids[keep], sigs_[keep]
            if len(ids) > 512:
                # cap rather than drop: partial recall from a degenerate hot
                # chunk beats zero recall; counted + logged via CAPS
                from raycdc.metrics import CAPS

                CAPS.record("simhash_candidate_pairs", len(ids), 512)
                ids, sigs_ = ids[:512], sigs_[:512]
            if len(ids) < 2:
                continue
            ai, bi = np.triu_indices(len(ids), k=1)
            x = sigs_[ai] ^ sigs_[bi]
            ham = np.zeros(len(x), dtype=np.int64)
            v = x.copy()
            for _ in range(64):
                ham += (v & np.uint64(1)).astype(np.int64)
                v >>= np.uint64(1)
            m = ham <= max_hamming
            out_a.append(ids[ai][m])
            out_b.append(ids[bi][m])
            out_h.append(ham[m])
        if not out_a:
            return _EMPTY
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
                "hamming": pa.array(np.concatenate(out_h)),
            }
        )

    chunked = sigs.map_batches(chunk_rows, batch_format="pyarrow", zero_copy_batch=True)
    pairs = chunked.groupby("__bk", num_partitions=num_partitions).map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )

    return pair_distinct_exchange(pairs, num_partitions, extra_cols=("hamming",))


# ---------------------------------------------------------------------------
# near-dup clustering: connected components over the candidate-pair graph


_CC_PASS1 = pa.schema(
    [
        pa.field("key", pa.int64()),
        pa.field("other", pa.int64()),
        pa.field("label", pa.int64()),
        pa.field("__bk", pa.int64()),
    ]
)

_CC_PASS2 = pa.schema(
    [
        pa.field("node", pa.int64()),
        pa.field("label", pa.int64()),
        pa.field("old", pa.int64()),
        pa.field("__bk", pa.int64()),
    ]
)

_CC_OUT = pa.schema(
    [
        pa.field("node", pa.int64()),
        pa.field("component", pa.int64()),
        pa.field("changed", pa.int64()),
    ]
)


def _solve_components_table(key: np.ndarray, other: np.ndarray) -> pa.Table:
    """In-memory component solve over a symmetric edge array: vectorized
    min-propagation + pointer jumping (``lab = lab[lab]`` halves the
    distance to each component's minimum every round, so convergence is
    O(log diameter), all numpy — no Python loop over nodes or edges)."""
    nodes, inv = np.unique(np.concatenate([key, other]), return_inverse=True)
    ai, bi = inv[: len(key)], inv[len(key):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        edge_min = np.minimum(lab[ai], lab[bi])
        new = lab.copy()
        np.minimum.at(new, ai, edge_min)
        np.minimum.at(new, bi, edge_min)
        new = new[new]  # pointer jumping
        if bool((new == lab).all()):
            break
        lab = new
    # index space is id-ordered (np.unique sorts), so index-min == id-min
    return pa.table(
        {"node": pa.array(nodes), "component": pa.array(nodes[lab])}
    )


def connected_components(
    pairs: "ray.data.Dataset",
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int = 32,
    max_iters: int = 64,
    single_task_max_edges: int = 20_000_000,
) -> "ray.data.Dataset":
    """Connected components over an undirected edge list — the clustering
    step that turns near-dup PAIRS (LSH candidates, SimHash matches,
    embedding neighbors) into dedup GROUPS, so one representative per
    component survives (transitive closure: A~B and B~C dedup A,B,C
    together even when A~C itself misses the threshold).

    Returns ``(node, component)`` — one row per distinct node of the pair
    graph, ``component`` = the smallest node id reachable from it.

    Two paths, size-guarded like :func:`exact_dedup`'s loser delivery:

    * ``≤ single_task_max_edges`` (default 20M — dedup pair graphs are ∝
      duplicates, a small fraction of the corpus): ONE remote task runs
      vectorized min-propagation with pointer jumping over the
      materialized adjacency refs.  In/out stays in the object store
      (``to_arrow_refs`` → task → ``from_arrow_refs``); the driver never
      holds edges or labels.  Peak in that task's heap at the default ≈
      2×20M int64 endpoints (~320 MB) plus ``np.unique``'s sort + inverse
      scratch (~2-3× that) — budget ~1-1.3 GB; lower the knob on small
      workers.
    * above it: distributed min-label propagation to a fixpoint
      (hash-to-min).  Each round is two bucketed exchanges — (1) adjacency
      ∪ labels grouped by ``hash(key)``: every edge endpoint reads its own
      label and proposes it to the opposite endpoint; (2) proposals grouped
      by ``hash(node)``: segmented min.  Rounds = graph diameter in the
      worst case, and near-dup components are shallow (LSH bands emit
      cliques), so 2-3 rounds is typical; ``max_iters`` guards pathological
      chains and raises loudly rather than returning a half-merged
      labeling.

    Scale shape (distributed path): nothing ever touches the driver except
    the per-round scalar ``changed`` count (a Dataset aggregate).  The
    adjacency (2 rows/edge) and the label table (1 row/node of the PAIR
    GRAPH) are materialized to the object store once resp. per round:
    iterative dataflow re-executes its whole lineage otherwise, and both
    tables are ∝ candidate pairs, never ∝ corpus text.  All groupbys carry
    explicit ``num_partitions`` per the repo convention.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()

    def adjacency(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.concatenate([a, b])
        other = np.concatenate([b, a])
        return pa.table(
            {
                "key": pa.array(key),
                "other": pa.array(other),
                "label": pa.nulls(len(key), pa.int64()),
                "__bk": pa.array(_bucket_of(key, num_partitions)),
            },
            schema=_CC_PASS1,
        )

    def propose(g: pa.Table) -> pa.Table:
        """One hash bucket of adjacency rows (+ label rows after round 1):
        emit, per edge row, the key's current label for BOTH endpoints."""
        is_lab = pc.is_valid(g["label"])
        lab_rows = g.filter(is_lab)
        edge_rows = g.filter(pc.invert(is_lab))
        if len(edge_rows) == 0:
            return _CC_PASS2.empty_table()
        keys = edge_rows["key"].to_numpy(zero_copy_only=False)
        others = edge_rows["other"].to_numpy(zero_copy_only=False)
        if len(lab_rows):
            ln = lab_rows["key"].to_numpy(zero_copy_only=False)
            lv = lab_rows["label"].to_numpy(zero_copy_only=False)
            order = np.argsort(ln, kind="stable")
            ln, lv = ln[order], lv[order]
            pos = np.searchsorted(ln, keys)
            pos_c = np.minimum(pos, len(ln) - 1)
            found = ln[pos_c] == keys
            # every adjacency key received a label in the previous round's
            # min pass (it proposes at least its own) — absence is a bug
            if not bool(found.all()):
                raise AssertionError("connected_components: unlabeled node")
            lab = lv[pos_c]
        else:
            lab = keys  # round 1: identity labels
        # one "old" row per DISTINCT key (carries the previous label for
        # change detection; NULL marks proposal rows — ids may be negative,
        # so no integer sentinel) + one proposal per edge row toward `other`
        ord_k = np.argsort(keys, kind="stable")
        ks, ls = keys[ord_k], lab[ord_k]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        node = np.concatenate([others, ks[first]])
        label = np.concatenate([lab, ls[first]])
        old_vals = np.concatenate(
            [np.zeros(len(others), dtype=np.int64), ls[first]]
        )
        old_null = np.concatenate(
            [
                np.ones(len(others), dtype=bool),
                np.zeros(int(first.sum()), dtype=bool),
            ]
        )
        return pa.table(
            {
                "node": pa.array(node),
                "label": pa.array(label),
                "old": pa.array(old_vals, mask=old_null),
                "__bk": pa.array(_bucket_of(node, num_partitions)),
            },
            schema=_CC_PASS2,
        )

    def take_min(g: pa.Table) -> pa.Table:
        """One hash bucket of proposals: segmented min per node; `changed`
        compares against the node's unique old-label row (old non-null)."""
        if len(g) == 0:
            return _CC_OUT.empty_table()
        node = g["node"].to_numpy(zero_copy_only=False)
        label = g["label"].to_numpy(zero_copy_only=False)
        order = np.lexsort((label, node))
        ns, ls = node[order], label[order]
        first = np.ones(len(ns), dtype=bool)
        first[1:] = ns[1:] != ns[:-1]
        node_u, new_lab = ns[first], ls[first]
        # gather each node's old label (exactly one non-null old per node)
        has_old = pc.is_valid(g["old"]).to_numpy(zero_copy_only=False)
        old = pc.fill_null(g["old"], 0).to_numpy(zero_copy_only=False)
        on, ov = node[has_old], old[has_old]
        oo = np.argsort(on, kind="stable")
        on, ov = on[oo], ov[oo]
        pos = np.searchsorted(on, node_u)
        pos_c = np.minimum(pos, max(len(on) - 1, 0))
        if len(on) != len(node_u) or not bool((on[pos_c] == node_u).all()):
            raise AssertionError("connected_components: old-label row missing")
        changed = (new_lab < ov[pos_c]).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(node_u),
                "component": pa.array(new_lab),
                "changed": pa.array(changed),
            },
            schema=_CC_OUT,
        )

    adj = pairs.map_batches(
        adjacency, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_adj = adj.count()
    if n_adj == 0:
        return ray.data.from_arrow(
            pa.schema([("node", pa.int64()), ("component", pa.int64())])
            .empty_table()
        )

    if n_adj <= 2 * single_task_max_edges:  # adjacency = 2 rows per edge
        refs = adj.to_arrow_refs()

        @ray.remote
        def _solve(*tables: pa.Table) -> pa.Table:
            # The adjacency stores each edge in BOTH directions; min
            # propagation only needs one, so keep key <= other per block
            # (plasma views stay zero-copy; only the kept half is copied)
            # — halves the solver's working set.  Zero-column blocks are
            # artifact empties from upstream groups that produced no rows.
            ks, os_ = [], []
            for t in tables:
                if t.num_columns == 0 or len(t) == 0:
                    continue
                k = t["key"].to_numpy(zero_copy_only=False)
                o = t["other"].to_numpy(zero_copy_only=False)
                m = k <= o
                ks.append(k[m])
                os_.append(o[m])
            return _solve_components_table(
                np.concatenate(ks), np.concatenate(os_)
            )

        return ray.data.from_arrow_refs([_solve.remote(*refs)])

    labels = None  # round 1 derives identity labels from the adjacency
    for _ in range(max_iters):
        rows = adj if labels is None else adj.union(labels)
        nxt = (
            rows.groupby("__bk", num_partitions=num_partitions)
            .map_groups(propose, batch_format="pyarrow")
            .groupby("__bk", num_partitions=num_partitions)
            .map_groups(take_min, batch_format="pyarrow")
            .materialize()
        )
        n_changed = nxt.sum("changed") or 0
        done = nxt.drop_columns(["changed"])
        if n_changed == 0:
            return done
        # feed back as label rows for the next propose pass

        def to_label_rows(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "key": t["node"],
                    "other": pa.nulls(len(t), pa.int64()),
                    "label": t["component"],
                    "__bk": pa.array(_bucket_of(node, num_partitions)),
                },
                schema=_CC_PASS1,
            )

        labels = nxt.map_batches(
            to_label_rows, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(graph diameter exceeds max_iters — raise max_iters)"
    )


def dedup_by_components(
    docs: "ray.data.Dataset",
    components: "ray.data.Dataset",
    id_col: str = "doc_id",
    broadcast_max_ids: int = 5_000_000,
) -> "ray.data.Dataset":
    """Keep ONE representative per near-dup component: given the
    ``(node, component)`` labeling from :func:`connected_components`, drop
    every doc whose node is NOT its component's minimum (``node !=
    component``); docs absent from the pair graph pass through untouched.
    The corpus never shuffles — losers are delivered via the size-guarded
    broadcast / object-store-chunk machinery of :func:`filter_out_ids`."""

    def loser_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        comp = t["component"].to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(node[node != comp])})

    losers = components.map_batches(
        loser_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return filter_out_ids(docs, losers, id_col, broadcast_max_ids)
