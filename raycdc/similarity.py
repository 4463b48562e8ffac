"""Similarity search over embedding columns (``list<float>``).

* :func:`knn_brute_force` — exact cosine top-k: the query matrix is put in
  the object store ONCE (``ray.put``) and every task does one numpy matmul
  per batch (never per row), emitting per-batch partial top-k; a final
  small groupby picks the global top-k per query.  This is the baseline
  and the verification oracle for the approximate variants.
* :func:`rp_lsh_buckets` / :func:`knn_lsh` — random-hyperplane LSH (signed
  random projections): vectors land in sign-pattern buckets; queries
  MULTI-PROBE their own bucket plus the buckets across their lowest-margin
  hyperplanes (Lv et al., VLDB'07).  The scale path: bucket groupby is the
  one shuffle, each bucket search is a tiny matmul, probing is query-side
  so it adds no shuffle volume.  Recall < 1 by design — measured against
  the brute-force baseline in tests, not assumed.
* :func:`embedding_near_dup_pairs` — near-duplicate pairs by cosine ≥
  threshold within LSH buckets (embedding-space analog of MinHash dedup).

Partitioning assumption (documented per SURVEY.md custom-operator rule):
bucket keys distribute uniformly for mean-zero data; skewed embedding
clusters (all-near-identical corpora) degenerate into one bucket — the
``max_bucket`` cap + multi-table probing bound that case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy flatten."""
    la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    flat = la.flatten().to_numpy(zero_copy_only=False)
    if isinstance(la, pa.FixedSizeListArray):
        d = la.type.list_size
    else:
        off = la.offsets.to_numpy()
        d = int(off[1] - off[0]) if len(off) > 1 else 0
    return flat.reshape(len(la), d).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norms == 0, 1, norms)


def _empty_candidates(id_col: str) -> pa.Table:
    return pa.table(
        {
            "q_id": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )


def _topk_candidates(
    scores: np.ndarray, qids, ids: np.ndarray, k: int, id_col: str
) -> pa.Table:
    """Tie-corrected per-query top-k candidates from one (nq, nb) score
    matrix via a single 2-D argpartition — no per-query Python loop.
    Every candidate equal to the k-th score is included so the vec_id
    tie-break happens globally, never at an arbitrary argpartition cutoff.
    Shared by the brute-force, LSH-bucket, and IVF-list search kernels."""
    nq, nb = scores.shape
    if nq == 0 or nb == 0:
        return _empty_candidates(id_col)
    kk = min(k, nb)
    part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
    kth = np.take_along_axis(scores, part, axis=1).min(axis=1)
    rows, cols = np.nonzero(scores >= kth[:, None])
    return pa.table(
        {
            "q_id": pa.array(np.asarray(qids)[rows]),
            id_col: pa.array(ids[cols]),
            "score": pa.array(scores[rows, cols]),
        }
    )


def _rank_topk(g: pa.Table, k: int, id_col: str, dedup: bool) -> pa.Table:
    """Final per-query ranking over gathered candidates; ``dedup`` drops
    the per-probe repeats of one vector (same score) before ranking."""
    g = g.sort_by([("score", "descending"), (id_col, "ascending")])
    if dedup:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        _, first = np.unique(ids, return_index=True)
        g = g.take(pa.array(np.sort(first)))
    g = g.slice(0, k)
    return g.append_column("rank", pa.array(np.arange(1, len(g) + 1)))


def knn_brute_force(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Exact cosine top-k for each query row.

    Output: ``(q_id, vec_id, score, rank)`` with rank 1..k, ties broken by
    ascending ``vec_id`` (deterministic).
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    qn = _normalize(np.asarray(queries, np.float64))
    ref = ray.put((qn, np.asarray(query_ids)))

    def partial_topk(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # empty fragment / post-filter block
            return _empty_candidates(id_col)
        q, qids = ray.get(ref)
        m = _normalize(_to_matrix(t[vec_col]))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return _topk_candidates(q @ m.T, qids, ids, k, id_col)

    def final_topk(g: pa.Table) -> pa.Table:
        return _rank_topk(g, k, id_col, dedup=False)

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        # explicit num_partitions: the q_id key space is tiny — Ray's default
        # 200-way min_parallelism would be pure shuffle overhead
        .groupby("q_id", num_partitions=num_partitions)
        .map_groups(final_topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH


def _planes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def rp_lsh_buckets(
    batch: pa.Table,
    planes: np.ndarray,
    vec_col: str = "embedding",
) -> pa.Table:
    """Append the sign-pattern bucket id (int64) of each vector."""
    if len(batch) == 0:
        return batch.append_column("bucket", pa.array([], pa.int64()))
    m = _to_matrix(batch[vec_col])
    signs = (m @ planes.T) > 0  # (n, nbits)
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    bucket = signs @ weights
    return batch.append_column("bucket", pa.array(bucket.astype(np.int64)))


def _probe_buckets(m: np.ndarray, planes: np.ndarray, nprobe: int) -> np.ndarray:
    """(n, nprobe) bucket ids per row: the row's own sign bucket plus
    single-bit flips of its ``nprobe - 1`` smallest-|margin| hyperplanes —
    standard multi-probe LSH (Lv et al., VLDB'07): the bits most likely to
    disagree between near neighbors are exactly the low-margin ones."""
    proj = m @ planes.T  # (n, nbits)
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    base = (proj > 0) @ weights
    cols = [base]
    extra = min(nprobe - 1, planes.shape[0])
    if extra > 0:
        order = np.argsort(np.abs(proj), axis=1)  # ascending margin
        for j in range(extra):
            cols.append(base ^ weights[order[:, j]])
    return np.stack(cols, axis=1)


def knn_lsh(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    nbits: int = 8,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Approximate top-k with MULTI-PROBE: each query probes its own sign
    bucket plus the ``nprobe - 1`` buckets reached by flipping its
    lowest-margin bits.  Corpus vectors stay in one bucket each — probing
    is query-side only, so the extra recall costs zero shuffle volume.

    One groupby on bucket id emits tie-corrected per-bucket candidates; a
    tiny final groupby(q_id) dedups vectors reached via several probes and
    picks the global top-k.  Recall measured in tests.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    qn = _normalize(np.asarray(queries, np.float64))
    dim = qn.shape[1]
    planes = _planes(dim, nbits)
    q_probes = _probe_buckets(qn, planes, nprobe)  # (nq, nprobe)
    ref = ray.put((qn, np.asarray(query_ids), q_probes))

    bucketed = ds.map_batches(
        lambda t: rp_lsh_buckets(t, planes, vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def search_bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _empty_candidates(id_col)
        q, qids, qp = ray.get(ref)
        b = int(g["bucket"][0].as_py())
        sel = (qp == b).any(axis=1)
        if not sel.any():
            return _empty_candidates(id_col)
        m = _normalize(_to_matrix(g[vec_col]))
        ids = g[id_col].to_numpy(zero_copy_only=False)
        return _topk_candidates(
            q[sel] @ m.T, np.asarray(qids)[sel], ids, k, id_col
        )

    def final_topk(g: pa.Table) -> pa.Table:
        # a vector reached via several probed buckets appears once per
        # bucket with the SAME score — dedup on vec_id before ranking
        return _rank_topk(g, k, id_col, dedup=True)

    partial = bucketed.groupby("bucket", num_partitions=num_partitions).map_groups(
        search_bucket, batch_format="pyarrow"
    )
    return partial.groupby("q_id", num_partitions=8).map_groups(
        final_topk, batch_format="pyarrow"
    )


def _kmeans(sample: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means for the IVF coarse quantizer."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        d = sample @ centroids.T  # cosine on normalized inputs
        assign = np.argmax(d, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    centroids[c] = m / n
    return centroids


def knn_ivf(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 2,
    train_sample: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """IVF approximate top-k — the classic scale path: a coarse k-means
    quantizer (trained driver-side on a BOUNDED sample, broadcast once)
    assigns every vector to its nearest centroid list; each query probes its
    ``nprobe`` nearest lists only.

    One groupby on the list id; search inside each list is a small matmul.
    Cost vs brute force: ~nprobe/n_lists of the scan.  Recall measured in
    tests, not assumed.  Skew note: clustered corpora make fat lists — the
    quantizer adapts (centroids follow density), which is exactly why IVF
    beats fixed random hyperplanes on clustered data.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    qn = _normalize(np.asarray(queries, np.float64))

    # bounded training sample (never a full pass)
    sample_tbl = ds.limit(train_sample).select_columns([vec_col]).to_pandas()
    sample = _normalize(
        np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)
    )
    centroids = _kmeans(sample, n_lists)

    q_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((qn, np.asarray(query_ids), q_lists, centroids))

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("ivf_list", pa.array([], pa.int64()))
        m = _normalize(_to_matrix(t[vec_col]))
        lists = np.argmax(m @ centroids.T, axis=1)
        return t.append_column("ivf_list", pa.array(lists.astype(np.int64)))

    def search_list(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _empty_candidates(id_col)
        q, qids, ql, _ = ray.get(ref)
        lid = int(g["ivf_list"][0].as_py())
        sel = (ql == lid).any(axis=1)
        if not sel.any():
            return _empty_candidates(id_col)
        m = _normalize(_to_matrix(g[vec_col]))
        ids = g[id_col].to_numpy(zero_copy_only=False)
        return _topk_candidates(
            q[sel] @ m.T, np.asarray(qids)[sel], ids, k, id_col
        )

    def final_topk(g: pa.Table) -> pa.Table:
        # no dedup: each corpus vector lives in exactly ONE list (probing
        # is query-side), so (q, vec) candidates never repeat
        return _rank_topk(g, k, id_col, dedup=False)

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    partial = assigned.groupby("ivf_list", num_partitions=num_partitions).map_groups(
        search_list, batch_format="pyarrow"
    )
    return partial.groupby("q_id", num_partitions=8).map_groups(
        final_topk, batch_format="pyarrow"
    )


def embedding_near_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    nbits: int = 6,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 32,
    max_bucket: int = 2048,
) -> "ray.data.Dataset":
    """(a<b) pairs with cosine ≥ threshold, candidates restricted to shared
    LSH buckets.  MULTI-PROBE: every vector is replicated into its own sign
    bucket plus the ``nprobe - 1`` buckets across its lowest-|margin|
    hyperplanes, so two near-identical vectors that disagree on one
    low-margin bit still meet (each side's flip reaches the other's base).
    Shuffle volume scales ×``nprobe``; pairs found in several buckets are
    deduped by a final hash-partitioned distinct."""
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    planes_cache: dict[int, np.ndarray] = {}

    def bucketize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("bucket", pa.array([], pa.int64()))
        m = _to_matrix(t[vec_col])
        p = planes_cache.setdefault(m.shape[1], _planes(m.shape[1], nbits))
        probes = _probe_buckets(m, p, nprobe)  # (n, nprobe)
        npb = probes.shape[1]
        idx = pa.array(np.repeat(np.arange(len(t), dtype=np.int64), npb))
        rep = t.take(idx)
        return rep.append_column("bucket", pa.array(probes.reshape(-1)))

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(g[vec_col]))
        ids = g[id_col].to_numpy(zero_copy_only=False)
        if len(ids) > max_bucket:
            from raycdc.metrics import CAPS

            CAPS.record("embedding_near_dup_pairs", len(ids), max_bucket)
            m, ids = m[:max_bucket], ids[:max_bucket]
        if len(ids) < 2:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        s = m @ m.T
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = s[ai, bi] >= threshold
        a, b = ids[ai[keep]], ids[bi[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "a": pa.array(lo.astype(np.int64)),
                "b": pa.array(hi.astype(np.int64)),
                "cosine": pa.array(np.round(s[ai, bi][keep], 6)),
            }
        )

    from raycdc.dedup import pair_distinct_exchange

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    pairs = bucketed.groupby("bucket", num_partitions=num_partitions).map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )
    return pair_distinct_exchange(pairs, num_partitions, extra_cols=("cosine",))


def group_centroids(
    ds: "ray.data.Dataset",
    group_col: str = "label",
    vec_col: str = "embedding",
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Per-group embedding centroid (dimension-wise mean), long-form
    output ``(group, idx, c)`` with ``idx`` 0-based.

    The training-data use: per-domain / per-cluster centroids for
    curriculum mixing or IVF seeding.  Scale design: each batch reduces
    to one ``(group, idx, partial_sum, partial_n)`` row per (group, dim)
    via sort + ``np.add.reduceat`` over the flattened matrix — the
    exchange carries ``n_groups × d`` partials per batch, never vectors.
    Final combine divides summed partials; one tiny bucketed exchange.
    """
    from raycdc.engine import _configure_shuffle
    from raycdc.partition import bucket_keys
    from raycdc.relational import pre_aggregate

    _configure_shuffle()

    def partial(batch: pa.Table) -> pa.Table:
        grp_type = batch.schema.field(group_col).type
        empty = pa.table(
            {
                group_col: pa.array([], grp_type),
                "idx": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        mat = _to_matrix(batch[vec_col])
        n, d = mat.shape
        gcol = batch[group_col]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        groups = gcol.to_numpy(zero_copy_only=False)
        order = np.argsort(groups, kind="stable")
        sg = groups[order]
        starts = np.flatnonzero(np.r_[True, sg[1:] != sg[:-1]])
        sums = np.add.reduceat(mat[order], starts, axis=0)
        counts = np.diff(np.r_[starts, n])
        uniq = sg[starts]
        return pa.table(
            {
                # mirror the input's group type — hardcoding int64 broke
                # the advertised per-DOMAIN (string label) centroids
                group_col: pa.array(np.repeat(uniq, d)).cast(grp_type),
                "idx": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(counts.astype(np.int64), d)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = pre_aggregate(
        partials,
        key_cols=[group_col, "idx"],
        sum_cols=["s", "n"],
        count_alias="_np",
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy()
        n = t["n"].to_numpy().astype(np.float64)
        return pa.table(
            {
                group_col: t[group_col],
                "idx": t["idx"],
                "c": pa.array(np.floor((s / n) * 1e6) / 1e6),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def semantic_dedup(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    n_clusters: int = 16,
    train_sample: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 32,
    max_cluster: int = 4096,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    arXiv 2303.09540): k-means-cluster the embedding space, compare
    cosine similarity only WITHIN a cluster, and keep one representative
    (minimum id — the repo's dedup convention) per group of semantic
    near-duplicates.  vs :func:`embedding_near_dup_pairs`: the quantizer
    is LEARNED from the corpus, so clustered data (the common case for
    real embeddings) gets far better candidate recall than fixed random
    hyperplanes at the same comparison budget.

    Returns the SURVIVOR rows of ``ds`` (all columns).  Transitive
    closure applies: A~B and B~C collapse A,B,C to one survivor even
    when A~C alone misses the threshold.

    Scale shape: the quantizer trains driver-side on a BOUNDED
    ``limit(train_sample)`` sample (centroids are KBs, shipped in the
    task closure); assignment is one vectorized matmul per batch; ONE
    groupby on the cluster id with per-cluster pairwise cosine capped at
    ``max_cluster`` (overflow counted via ``metrics.CAPS``, never
    silent); the pair graph — ∝ duplicates, not corpus — flows through
    :func:`raycdc.dedup.connected_components` and the survivors come
    from the shared size-guarded anti-join
    (:func:`raycdc.dedup.dedup_by_components`) — the corpus itself never
    shuffles.
    """
    from raycdc.dedup import connected_components, dedup_by_components
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()

    sample_tbl = ds.limit(train_sample).select_columns([vec_col]).to_pandas()
    sample = _normalize(
        np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)
    )
    centroids = _kmeans(sample, n_clusters)

    def assign(t: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(t[vec_col]))
        c = np.argmax(m @ centroids.T, axis=1)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                vec_col: t[vec_col],
                "__cluster": pa.array(c.astype(np.int64)),
            }
        )

    def pairs_in_cluster(g: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(g[vec_col]))
        ids = g[id_col].to_numpy(zero_copy_only=False)
        if len(ids) > max_cluster:
            from raycdc.metrics import CAPS

            CAPS.record("semantic_dedup", len(ids), max_cluster)
            m, ids = m[:max_cluster], ids[:max_cluster]
        if len(ids) < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        s = m @ m.T
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = s[ai, bi] >= threshold
        a, b = ids[ai[keep]], ids[bi[keep]]
        return pa.table(
            {
                "a": pa.array(np.minimum(a, b).astype(np.int64)),
                "b": pa.array(np.maximum(a, b).astype(np.int64)),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    pairs = assigned.groupby("__cluster", num_partitions=num_partitions).map_groups(
        pairs_in_cluster, batch_format="pyarrow"
    )
    comps = connected_components(pairs, num_partitions=num_partitions)
    return dedup_by_components(ds, comps, id_col=id_col)


# ---------------------------------------------------------------------------
# embedding GENERATION — deterministic hashing-trick featurizer


class HashingEmbedder:
    """Deterministic text→vector featurizer: signed feature hashing over
    word n-grams (Weinberger et al., "Feature hashing for large scale
    multitask learning", ICML'09) — the embedding-GENERATION stage that
    lets :func:`semantic_dedup` / :func:`knn_brute_force` /
    :func:`group_centroids` run text-in → vectors → decisions end-to-end
    instead of reading pre-made embedding tables.

    Each n-gram instance hashes to one of ``dim`` buckets with a ±1 sign
    from an independent hash bit (the signed construction keeps the
    inner product unbiased); the bucket histogram is L2-normalized, so
    cosine over the output approximates n-gram-profile similarity.  No
    model, no RNG — a pure function of the text, reproducible across
    processes and rounds.

    ACTOR-POOL STAGE: pass the CLASS to ``map_batches(HashingEmbedder,
    fn_constructor_kwargs=..., concurrency=N)`` — per-n-gram salts and
    the output type are built once per actor in ``__init__``, each
    ``__call__`` is one vectorized pass (Arrow split + numpy scatter-add)
    per batch.  Vectors never shuffle: the stage emits (id, embedding)
    and every downstream consumer is bucketed/clustered.
    """

    def __init__(
        self,
        dim: int = 256,
        ngrams: tuple[int, ...] = (1, 2),
        text_col: str = "text",
        id_col: str = "doc_id",
        out_col: str = "embedding",
        keep_cols: tuple[str, ...] = (),
    ) -> None:
        if dim <= 0:
            raise ValueError(f"dim must be positive, got {dim}")
        self.dim = dim
        self.ngrams = tuple(ngrams)
        self.text_col, self.id_col, self.out_col = text_col, id_col, out_col
        self.keep_cols = tuple(keep_cols)
        # one odd splitmix salt per n-gram order, fixed at construction
        self.salts = {
            k: np.uint64((0x9E3779B97F4A7C15 * (2 * k + 1)) & 0xFFFFFFFFFFFFFFFF)
            for k in self.ngrams
        }
        self.out_type = pa.list_(pa.float32(), dim)

    def _matrix(self, texts) -> np.ndarray:
        import pyarrow.compute as pc

        from raycdc.dedup import _shingle_instances

        # no content → zero vector: an empty string would otherwise split
        # into one empty token and embed as a spurious unit vector
        texts = pc.if_else(
            pc.equal(pc.fill_null(texts, ""), ""),
            pa.scalar(None, pa.string()),
            texts,
        )
        n = len(texts)
        acc = np.zeros((n, self.dim), dtype=np.float32)
        for k in self.ngrams:
            sh, _pos, sh_counts, _tok = _shingle_instances(texts, k)
            if len(sh) == 0:
                continue
            h = sh.copy()
            with np.errstate(over="ignore"):
                h ^= self.salts[k]
                h ^= h >> np.uint64(30)
                h *= np.uint64(0xBF58476D1CE4E5B9)
                h ^= h >> np.uint64(27)
                h *= np.uint64(0x94D049BB133111EB)
                h ^= h >> np.uint64(31)
            doc = np.repeat(np.arange(n, dtype=np.int64), sh_counts)
            bucket = (h % np.uint64(self.dim)).astype(np.int64)
            sign = (((h >> np.uint64(63)) & np.uint64(1)).astype(np.float32) * 2) - 1
            np.add.at(acc, (doc, bucket), sign)
        norms = np.linalg.norm(acc, axis=1, keepdims=True)
        np.divide(acc, norms, out=acc, where=norms > 0)  # zero vectors stay zero
        return acc

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        mat = self._matrix(texts)
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), pa.float32()), self.dim
        )
        cols = {self.id_col: t[self.id_col], self.out_col: vec}
        for c in self.keep_cols:
            cols[c] = t[c]
        return pa.table(cols)


def embed_text(
    ds: "ray.data.Dataset",
    dim: int = 256,
    ngrams: tuple[int, ...] = (1, 2),
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Actor-pool embedding stage over a text Dataset: state once per
    actor in ``HashingEmbedder.__init__``, one vectorized pass per batch;
    output rows are (id, embedding[, keep_cols]) — the text column is
    DROPPED so downstream similarity stages never ship it."""
    return ds.map_batches(
        HashingEmbedder,
        fn_constructor_kwargs=dict(
            dim=dim,
            ngrams=ngrams,
            text_col=text_col,
            id_col=id_col,
            out_col=out_col,
            keep_cols=keep_cols,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# IVF-PQ — compressed-index ANN (the 100 TB memory/bandwidth path)


def _kmeans_l2(sample: np.ndarray, k: int, iters: int = 8, seed: int = 7) -> np.ndarray:
    """Deterministic Lloyd's k-means under L2 (PQ subspace codebooks —
    subvectors are NOT unit-normalized, so the cosine variant above would
    train the wrong geometry)."""
    rng = np.random.default_rng(seed)
    k_eff = min(k, len(sample))
    centroids = sample[rng.choice(len(sample), size=k_eff, replace=False)].copy()
    for _ in range(iters):
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
        d = -2 * (sample @ centroids.T) + (centroids**2).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1)
        for c in range(k_eff):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    if k_eff < k:  # pad duplicate centroids so code values stay in [0, k)
        centroids = np.vstack([centroids, np.repeat(centroids[:1], k - k_eff, 0)])
    return centroids


def _pq_encode(m: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, d) → (n, m_sub) uint8 codes: per subspace, nearest codeword."""
    n_sub, n_codes, d_sub = codebooks.shape
    codes = np.empty((len(m), n_sub), dtype=np.uint8)
    for j in range(n_sub):  # m_sub is a small constant; each pass whole-batch
        sub = m[:, j * d_sub : (j + 1) * d_sub]
        d = -2 * (sub @ codebooks[j].T) + (codebooks[j] ** 2).sum(axis=1)[None, :]
        codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
    return codes


def knn_ivfpq(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 2,
    m_sub: int = 4,
    n_codes: int = 256,
    rerank: int | None = None,
    train_sample: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """IVF-PQ approximate top-k (Jégou et al., "Product quantization for
    nearest neighbor search", TPAMI 2011) — the COMPRESSED-index scale
    path complementing :func:`knn_lsh` / :func:`knn_ivf`: every corpus
    vector is stored in the exchange as ``m_sub`` uint8 codes (e.g. 4
    bytes instead of d×4), so at 10^10 vectors the candidate scan streams
    codes, not vectors.

    Stages (all distributed; no driver-side index — the driver holds only
    the KB-scale quantizer, broadcast once):

    1. TRAIN on a bounded ``limit(train_sample)`` sample: coarse k-means
       (cosine) for the IVF lists + per-subspace L2 codebooks for PQ.
    2. ASSIGN (map_batches): list id + PQ codes per vector; the original
       vector column is DROPPED before the exchange.
    3. SCAN (one groupby on list id): per list, asymmetric-distance
       scoring — each probing query builds one (m_sub × n_codes) LUT of
       subspace inner products and scores candidates by LUT gathers;
       emits per-list approximate top-``rerank`` candidates.
    4. RERANK (exact, distributed): the approximate candidates — ∝
       queries × rerank, never ∝ corpus — are broadcast via ``ray.put``;
       one corpus pass computes exact cosines for matched (query, id)
       pairs only, and a final tiny groupby picks exact top-k.

    With ``rerank`` ≥ the per-query candidate depth the result equals
    :func:`knn_ivf` at the same ``nprobe`` (identical candidate lists,
    exact final scores) while the list scan moved ~d×4/m_sub× fewer
    bytes — the "equal probe cost, better recall-per-byte" trade pinned
    in tests/test_ivfpq.py.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    if rerank is None:
        rerank = 4 * k
    qn = _normalize(np.asarray(queries, np.float64))
    nq = len(qn)

    sample_tbl = ds.limit(train_sample).select_columns([vec_col]).to_pandas()
    sample = _normalize(np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64))
    d = sample.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    centroids = _kmeans(sample, n_lists)
    d_sub = d // m_sub
    codebooks = np.stack(
        [
            _kmeans_l2(sample[:, j * d_sub : (j + 1) * d_sub], n_codes, seed=7 + j)
            for j in range(m_sub)
        ]
    )

    q_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    # per-query ADC lookup tables, built ONCE driver-side (nq × m_sub ×
    # n_codes float32 — KBs per query), broadcast with the rest
    luts = np.stack(
        [qn[:, j * d_sub : (j + 1) * d_sub] @ codebooks[j].T for j in range(m_sub)],
        axis=1,
    ).astype(np.float32)  # (nq, m_sub, n_codes)
    ref = ray.put((np.asarray(query_ids), q_lists, luts))

    code_type = pa.list_(pa.uint8(), m_sub)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    id_col: pa.array([], t.schema.field(id_col).type),
                    "ivf_list": pa.array([], pa.int64()),
                    "pq": pa.array([], code_type),
                }
            )
        m = _normalize(_to_matrix(t[vec_col]))
        lists = np.argmax(m @ centroids.T, axis=1)
        codes = _pq_encode(m, codebooks)
        return pa.table(
            {
                id_col: t[id_col],
                "ivf_list": pa.array(lists.astype(np.int64)),
                "pq": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), pa.uint8()), m_sub
                ),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    cand = _adc_candidates(
        assigned, ref, m_sub, rerank, id_col, num_partitions
    )
    return _exact_rerank(ds, cand, qn, query_ids, k, vec_col, id_col)


def _codes_matrix(col, m_sub: int) -> np.ndarray:
    """(rows, m_sub) uint8 view of a PQ-code column — fixed_size_list
    (the in-flight encoding) or binary blobs (the index-lake encoding)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        return np.asarray(col.flatten(), dtype=np.uint8).reshape(
            len(col), m_sub
        )
    from raycdc.sketch import registers_matrix

    return registers_matrix(col, m_sub)


def _adc_candidates(
    assigned: "ray.data.Dataset",
    ref,
    m_sub: int,
    rerank: int,
    id_col: str,
    num_partitions: int,
) -> "ray.data.Dataset":
    """Asymmetric-distance scan shared by :func:`knn_ivfpq` (in-flight
    codes) and :func:`knn_over_index` (codes read from the index lake):
    one groupby on ``ivf_list``; per list each probing query scores
    candidates by LUT gathers and emits approximate top-``rerank``; a
    tiny per-query groupby folds across probed lists.  ``ref`` broadcasts
    ``(query_ids, q_lists, luts)``."""

    def scan_list(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "q_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "approx": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        qids, ql, lut = ray.get(ref)
        lid = int(g["ivf_list"][0].as_py())
        sel = np.flatnonzero((ql == lid).any(axis=1))
        if not len(sel):
            return empty
        codes = _codes_matrix(g["pq"], m_sub)
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_i, out_s = [], [], []
        depth = min(rerank, len(ids))
        for qi in sel:  # queries probing this list: nq×nprobe/n_lists rows
            s = np.zeros(len(ids), dtype=np.float32)
            for j in range(m_sub):
                s += lut[qi, j][codes[:, j]]
            top = np.argpartition(-s, depth - 1)[:depth] if depth < len(s) else np.arange(len(s))
            out_q.append(np.full(len(top), qids[qi], np.int64))
            out_i.append(ids[top])
            out_s.append(s[top].astype(np.float64))
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_i)),
                "approx": pa.array(np.concatenate(out_s)),
            }
        )

    def approx_topk(g: pa.Table) -> pa.Table:
        # per-query approximate top-`rerank` across probed lists
        if len(g) == 0:
            return g
        s = g["approx"].to_numpy()
        depth = min(rerank, len(s))
        top = np.argpartition(-s, depth - 1)[:depth] if depth < len(s) else np.arange(len(s))
        return g.take(pa.array(np.sort(top)))

    return (
        assigned.groupby("ivf_list", num_partitions=num_partitions)
        .map_groups(scan_list, batch_format="pyarrow")
        .groupby("q_id", num_partitions=8)
        .map_groups(approx_topk, batch_format="pyarrow")
    )


def _exact_rerank(
    ds: "ray.data.Dataset",
    cand: "ray.data.Dataset | pa.Table",
    qn: np.ndarray,
    query_ids,
    k: int,
    vec_col: str,
    id_col: str,
) -> "ray.data.Dataset":
    """Exact distributed rerank shared by the compressed-index paths:
    the approximate candidates (∝ queries × rerank, never ∝ corpus) are
    broadcast; one pass over ``ds`` (any dataset carrying ``id_col`` +
    ``vec_col``) computes exact cosines for nominated (query, id) pairs
    only; a final tiny groupby ranks exact top-k.  ``cand`` may arrive as
    an already-collected Table (knn_over_index fetches once for its
    partition pruning) or as a Dataset."""
    if isinstance(cand, pa.Table):
        cand_t = cand
    else:
        cand_parts = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
        if not cand_parts:
            return ray.data.from_arrow(_empty_candidates(id_col))
        cand_t = pa.concat_tables(cand_parts).combine_chunks()
    if cand_t.num_rows == 0:
        return ray.data.from_arrow(_empty_candidates(id_col))
    cand_ids = np.sort(np.unique(cand_t[id_col].to_numpy(zero_copy_only=False)))
    # (sorted candidate ids, per-candidate query lists) broadcast once.
    # qn/qid_arr are co-sorted by query id BEFORE the put: exact_scores maps
    # candidate rows back to query vectors via np.searchsorted(qid_arr, ...),
    # which silently picks the wrong row when ids arrive unsorted — sorting
    # here makes the public API order-independent (ADVICE r4).
    qid_arr = np.asarray(query_ids, dtype=np.int64)
    qorder = np.argsort(qid_arr, kind="stable")
    pairs_ref = ray.put(
        (
            cand_ids,
            cand_t["q_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            cand_t[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
            qn[qorder],
            qid_arr[qorder],
        )
    )

    def exact_scores(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "q_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        cids, pq_q, pq_i, q, qid_arr = ray.get(pairs_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(cids, ids)
        pos_c = np.minimum(pos, len(cids) - 1)
        hit = cids[pos_c] == ids
        if not hit.any():
            return empty
        m = _normalize(_to_matrix(t[vec_col]))[hit]
        ids_h = ids[hit]
        # all exact scores for this batch's candidate rows vs ALL queries,
        # then select the (q, id) pairs the approx stage nominated
        s = q @ m.T  # (nq, n_hit)
        order = np.argsort(ids_h)
        ids_sorted = ids_h[order]
        sel = np.searchsorted(ids_sorted, pq_i)
        sel_c = np.minimum(sel, len(ids_sorted) - 1)
        in_batch = ids_sorted[sel_c] == pq_i
        if not in_batch.any():
            return empty
        qrow = np.searchsorted(qid_arr, pq_q[in_batch])
        col = order[sel_c[in_batch]]
        return pa.table(
            {
                "q_id": pa.array(pq_q[in_batch]),
                id_col: pa.array(pq_i[in_batch]),
                "cosine": pa.array(s[qrow, col].astype(np.float64)),
            }
        )

    exact = ds.map_batches(exact_scores, batch_format="pyarrow", zero_copy_batch=True)

    def final_topk(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {
                    "q_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        s = g["cosine"].to_numpy()
        ids = g[id_col].to_numpy(zero_copy_only=False)
        kk = min(k, len(s))
        top = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
        order = top[np.lexsort((ids[top], -s[top]))]
        return pa.table(
            {
                "q_id": pa.array(np.full(kk, g["q_id"][0].as_py(), np.int64)),
                id_col: pa.array(ids[order].astype(np.int64)),
                "rank": pa.array(np.arange(1, kk + 1, dtype=np.int64)),
            }
        )

    return exact.groupby("q_id", num_partitions=8).map_groups(
        final_topk, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# graph ANN — NSW-style beam search over per-list subgraphs

# per-task byte budgets for knn_graph: adjacency-build row blocks and
# per-query-chunk search state (scores f64 + visited/expanded bools)
_ADJ_BLOCK_BYTES = 1 << 27  # 128 MB
_SEARCH_CHUNK_BYTES = 1 << 26  # 64 MB


def knn_graph(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 2,
    degree: int = 8,
    beam: int = 16,
    max_hops: int = 32,
    train_sample: int = 10_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 32,
    max_list: int = 65_536,
) -> "ray.data.Dataset":
    """Graph ANN: navigable-small-world beam search (Malkov & Yashunin,
    "Efficient and robust approximate nearest neighbor search using
    HNSW graphs", arXiv 1603.09320 — the single-layer NSW core) run over
    PER-LIST subgraphs so both build and search distribute:

    * BUILD (one groupby on the coarse k-means list id): each list task
      builds its own adjacency — every node links to its ``degree``
      nearest in-list neighbors (the NSW property that makes greedy
      search converge) — and elects ENTRY SEEDS: the centroid-nearest
      node plus stride-spread nodes (a pure k-NN graph over clustered
      data is disconnected across clusters, so multi-seed beams are what
      reach every component).  The similarity matrix is computed in ROW
      BLOCKS sized to a fixed byte budget (``_ADJ_BLOCK_BYTES``), so
      peak build memory is O(block × n), never O(n²) — at the
      ``max_list`` cap the full matrix would be ~34 GB; the blocked
      build stays under ~128 MB per task.
    * SEARCH (same groupby): queries probe their ``nprobe`` nearest
      lists; inside a list ALL probing queries advance their greedy BEAM
      searches in lock-step as numpy matrices (visited/score state per
      query CHUNK, one gather+einsum per hop across every active query)
      — no per-query Python loop — touching ~``beam × degree × hops``
      vectors per query instead of the whole list.
    * A final tiny groupby ranks the gathered candidates per query.

    Output carries an ``n_scanned`` column — each query's total vectors
    scored across its probed lists — the honest probe-cost ledger the
    recall-per-scanned-vector comparison against :func:`knn_ivf` is
    pinned on (tests/test_knn_graph.py).

    Scale shape vs the siblings: same single exchange as :func:`knn_ivf`;
    the win is per-list CPU — O(beam·degree·hops) per query instead of
    O(list size) — which is what matters when lists hold 10^6+ vectors.
    Lists are capped at ``max_list`` (counted via ``metrics.CAPS``).
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    qn = _normalize(np.asarray(queries, np.float64))

    sample_tbl = ds.limit(train_sample).select_columns([vec_col]).to_pandas()
    sample = _normalize(np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64))
    centroids = _kmeans(sample, n_lists)
    q_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    ref = ray.put((qn, np.asarray(query_ids, dtype=np.int64), q_lists, centroids))

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("nsw_list", pa.array([], pa.int64()))
        m = _normalize(_to_matrix(t[vec_col]))
        lists = np.argmax(m @ centroids.T, axis=1)
        return t.append_column("nsw_list", pa.array(lists.astype(np.int64)))

    _EMPTY = pa.table(
        {
            "q_id": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "n_scanned": pa.array([], pa.int64()),
        }
    )

    def build_and_search(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _EMPTY
        q, qids, ql, cents = ray.get(ref)
        lid = int(g["nsw_list"][0].as_py())
        sel = np.flatnonzero((ql == lid).any(axis=1))
        if not len(sel):
            return _EMPTY
        m = _normalize(_to_matrix(g[vec_col]))
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) > max_list:
            from raycdc.metrics import CAPS

            CAPS.record("knn_graph", len(ids), max_list)
            m, ids = m[:max_list], ids[:max_list]
        n = len(ids)
        # ---- BUILD: degree-NN adjacency + centroid-nearest entry ----------
        deg = min(degree, n - 1)
        if deg <= 0:
            # singleton list: the one node is every probing query's answer
            rows_q = np.asarray(qids)[sel]
            s = (q[sel] @ m.T).reshape(-1)
            return pa.table(
                {
                    "q_id": pa.array(rows_q),
                    id_col: pa.array(np.repeat(ids, len(sel))),
                    "score": pa.array(s.astype(np.float64)),
                    "n_scanned": pa.array(np.ones(len(sel), np.int64)),  # 1 row/query
                }
            )
        # blocked adjacency: peak extra memory = blk × n float64, never n²
        blk = max(1, _ADJ_BLOCK_BYTES // (8 * n))
        nbrs = np.empty((n, deg), np.int64)
        for i0 in range(0, n, blk):
            i1 = min(i0 + blk, n)
            s = m[i0:i1] @ m.T
            s[np.arange(i1 - i0), np.arange(i0, i1)] = -np.inf  # no self-link
            nbrs[i0:i1] = np.argpartition(-s, deg - 1, axis=1)[:, :deg]
        # entry points: the centroid-nearest node PLUS stride-spread seeds —
        # a pure k-NN graph over clustered data is DISCONNECTED across
        # clusters (no long-range links), so single-entry greedy search
        # would be trapped in the entry's component; seeding the beam from
        # nodes spread across the list reaches every component for the
        # cost of |seeds| extra scores per query
        seeds = np.unique(
            np.concatenate(
                [
                    [int(np.argmax(m @ cents[lid]))],
                    np.linspace(0, n - 1, num=min(beam, n), dtype=np.int64),
                ]
            )
        )
        # ---- SEARCH: all probing queries advance in lock-step --------------
        # per-query state is (scores, visited, expanded) over the n list
        # nodes — chunk queries so state stays under a fixed byte budget
        out_q, out_i, out_s, out_n = [], [], [], []
        kk = min(k, beam)
        qchunk = max(1, _SEARCH_CHUNK_BYTES // (10 * n))  # 8B score + 2B bools
        for c0 in range(0, len(sel), qchunk):
            qi = sel[c0 : c0 + qchunk]  # corpus-query indices in this chunk
            nqc = len(qi)
            qm = q[qi]  # (nqc, d)
            rows_ix = np.arange(nqc)
            scores = np.full((nqc, n), -np.inf)
            visited = np.zeros((nqc, n), dtype=bool)
            expanded = np.zeros((nqc, n), dtype=bool)
            visited[:, seeds] = True
            seed_sc = qm @ m[seeds].T  # (nqc, |seeds|)
            scores[:, seeds] = seed_sc
            beam_nodes = np.full((nqc, beam), -1, np.int64)
            sorder = np.argsort(-seed_sc, axis=1)[:, :beam]
            beam_nodes[:, : sorder.shape[1]] = seeds[sorder]
            scanned = np.full(nqc, len(seeds), np.int64)
            for _ in range(max_hops):
                bsafe = np.maximum(beam_nodes, 0)
                bs = np.where(
                    beam_nodes >= 0, scores[rows_ix[:, None], bsafe], -np.inf
                )
                bexp = np.where(
                    beam_nodes >= 0, expanded[rows_ix[:, None], bsafe], True
                )
                cand_sc = np.where(bexp, -np.inf, bs)
                best_slot = np.argmax(cand_sc, axis=1)
                active = cand_sc[rows_ix, best_slot] > -np.inf
                if not active.any():
                    break  # every query's beam is fully expanded
                ar = rows_ix[active]
                bn = beam_nodes[ar, best_slot[active]]  # (na,) expand these
                expanded[ar, bn] = True
                nb = nbrs[bn]  # (na, deg)
                newm = ~visited[ar[:, None], nb]
                visited[ar[:, None], nb] = True
                # one gather + einsum scores every (query, new-neighbor)
                sm = np.einsum("ad,agd->ag", q[qi[active]], m[nb])
                old = scores[ar[:, None], nb]
                scores[ar[:, None], nb] = np.where(newm, sm, old)
                scanned[ar] += newm.sum(axis=1)
                # merge ONLY newly-visited neighbors into the beam: an
                # already-visited neighbor is either in the beam or was
                # dropped when it scored below the beam floor — the floor
                # is monotone, so re-adding it could never help
                nb_new = np.where(newm, nb, -1)
                cand_nodes = np.concatenate([beam_nodes[ar], nb_new], axis=1)
                cand_sc2 = np.where(
                    cand_nodes >= 0,
                    scores[ar[:, None], np.maximum(cand_nodes, 0)],
                    -np.inf,
                )
                order = np.argsort(-cand_sc2, axis=1)[:, :beam]
                beam_nodes[ar] = np.take_along_axis(cand_nodes, order, axis=1)
            # emit per-query top-k from the final beams (vectorized)
            bsafe = np.maximum(beam_nodes, 0)
            bs = np.where(
                beam_nodes >= 0, scores[rows_ix[:, None], bsafe], -np.inf
            )
            order = np.argsort(-bs, axis=1)[:, :kk]
            top_sc = np.take_along_axis(bs, order, axis=1)
            top_nd = np.take_along_axis(beam_nodes, order, axis=1)
            valid = (top_sc > -np.inf).ravel()
            # scan cost on the FIRST candidate row only, 0 on the rest —
            # the final per-query total is then a plain SUM (attaching it
            # to every row would double-count; summing distinct values
            # would undercount when two lists scan the same count)
            nmat = np.zeros((nqc, kk), np.int64)
            nmat[:, 0] = scanned  # slot 0 (the best seed) is always valid
            out_q.append(np.repeat(qids[qi], kk)[valid])
            out_i.append(ids[np.maximum(top_nd.ravel(), 0)][valid])
            out_s.append(top_sc.ravel()[valid])
            out_n.append(nmat.ravel()[valid])
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(out_q).astype(np.int64)),
                id_col: pa.array(np.concatenate(out_i).astype(np.int64)),
                "score": pa.array(np.concatenate(out_s).astype(np.float64)),
                "n_scanned": pa.array(np.concatenate(out_n)),
            }
        )

    def final_topk(g: pa.Table) -> pa.Table:
        g2 = g.drop_columns(["n_scanned"])
        ranked = _rank_topk(g2, k, id_col, dedup=False)
        # carry the query's total scan cost (sum over probed lists)
        total = int(pa.compute.sum(g["n_scanned"]).as_py() or 0)
        return ranked.append_column(
            "n_scanned", pa.array(np.full(len(ranked), total, np.int64))
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    cand = assigned.groupby("nsw_list", num_partitions=num_partitions).map_groups(
        build_and_search, batch_format="pyarrow"
    )
    return cand.groupby("q_id", num_partitions=8).map_groups(
        final_topk, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# CDC × ANN: an incrementally-maintained compressed vector index LAKE

_QUANTIZER_FILE = "_ann_quantizer.json"


def _load_quantizer(index_lake: str):
    """(centroids, codebooks, n_lists, m_sub) from the index lake's
    persisted quantizer, or None before the first build."""
    from raycdc.storage import get_storage, read_json

    meta = read_json(get_storage(index_lake), f"{index_lake}/{_QUANTIZER_FILE}")
    if meta is None:
        return None
    return (
        np.asarray(meta["centroids"], np.float64),
        np.asarray(meta["codebooks"], np.float64),
        int(meta["n_lists"]),
        int(meta["m_sub"]),
    )


def maintain_vector_index(
    src_lake: str,
    index_lake: str,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_lists: int = 16,
    m_sub: int = 4,
    n_codes: int = 256,
    train_sample: int = 10_000,
    spec=None,
    num_partitions: int = 8,
):
    """Incrementally maintained IVF-PQ index LAKE over a vector lake —
    the CDC × similarity composite: the index is a VIEW of the vector
    lake on the :func:`raycdc.engine.maintain_view` skeleton, refreshed
    ∝ the change (new/updated vectors re-assign + re-encode, deleted
    vectors tombstone out) instead of re-encoding the corpus per query
    like :func:`knn_ivfpq` does.

    * FIRST refresh: the coarse quantizer (cosine k-means) and PQ
      codebooks (per-subspace L2 k-means) train on a bounded sample of
      the pinned snapshot and PERSIST in the index lake
      (``_ann_quantizer.json``, KB-scale).  Every later refresh reuses
      them, so codes stay comparable across refreshes; re-train by
      rebuilding into a fresh index dir (the :func:`migrate_lake`
      convention for layout-affecting changes).
    * LATER refreshes: a pure per-row map of the change feed — assign +
      encode inserts/updates, tombstone deletes.  No recompute, no
      shuffle; the index row is ``(key, ivf_list, pq)`` — m_sub bytes of
      codes instead of d×4 of vector.
    * Exactly-once via the shared pending-claim; a crash-retry re-derives
      identical rows (the quantizer is pinned) and redelivery is
      checkpoint-pruned.

    Query with :func:`knn_over_index` — probes read the INDEX lake
    (codes), the exact rerank reads only candidate rows of the SOURCE
    lake.  Returns the replay lineage.
    """
    from raycdc import sink as _S
    from raycdc.engine import maintain_view, read_lake
    from raycdc.schema import TableSpec
    from raycdc.sketch import matrix_to_binary
    from raycdc.storage import get_storage, write_json_atomic

    spec = spec or TableSpec()
    # the quantizer file already pins n_lists/m_sub across refreshes; the
    # remaining view-defining args (which columns feed the index, the
    # index layout) get the same protection via the shared param pin —
    # a refresh indexing a different vec/key column would quietly mix
    # incomparable codes into one index lake
    from raycdc.engine import pin_view_params

    pin_view_params(
        index_lake,
        "maintain_vector_index",
        {
            "vec_col": vec_col,
            "key_col": key_col,
            "n_lists": n_lists,
            "m_sub": m_sub,
            "n_codes": n_codes,
            "num_partitions": num_partitions,
        },
    )

    def fold(feed, ctx):
        quant = _load_quantizer(index_lake)
        if quant is None:
            sample_tbl = (
                read_lake(
                    src_lake, spec, columns=[vec_col], as_of=ctx.to_snap
                )
                .limit(train_sample)
                .to_pandas()
            )
            if not len(sample_tbl):
                return None, None  # empty source: position advances
            sample = _normalize(
                np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float64)
            )
            d = sample.shape[1]
            if d % m_sub:
                raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
            d_sub = d // m_sub
            centroids = _kmeans(sample, n_lists)
            codebooks = np.stack(
                [
                    _kmeans_l2(
                        sample[:, j * d_sub : (j + 1) * d_sub],
                        n_codes,
                        seed=7 + j,
                    )
                    for j in range(m_sub)
                ]
            )
            write_json_atomic(
                get_storage(index_lake),
                f"{index_lake}/{_QUANTIZER_FILE}",
                {
                    "centroids": centroids.tolist(),
                    "codebooks": codebooks.tolist(),
                    "n_lists": n_lists,
                    "m_sub": m_sub,
                },
            )
        else:
            centroids, codebooks, _, _ = quant

        reg = _S.read_lake_schema(src_lake)
        if reg is None:
            raise FileNotFoundError(
                f"maintain_vector_index: {src_lake} has no schema registry"
            )
        ktype = reg.field(key_col).type
        view_spec = TableSpec(
            name="ann_index",
            schema=pa.schema(
                [
                    pa.field(key_col, ktype),
                    pa.field("ivf_list", pa.int64()),
                    pa.field("pq", pa.binary()),
                ]
            ),
            key_cols=(key_col,),
            version_cols=("ts", "lsn"),
            partition_key=key_col,
            num_partitions=num_partitions,
            sort_cols=(key_col,),
            merge_policy="lww",
        )
        op_col = ctx.spec.op_col

        def to_index_rows(t: pa.Table) -> pa.Table:
            outs = []
            op = pc.fill_null(t[op_col], "")
            is_del = pc.equal(op, "delete")
            live = t.filter(pc.invert(is_del))
            dels = t.filter(is_del)
            if len(live):
                m = _normalize(_to_matrix(live[vec_col]))
                lists = np.argmax(m @ centroids.T, axis=1).astype(np.int64)
                codes = _pq_encode(m, codebooks)
                outs.append(
                    ctx.envelope(
                        pa.table(
                            {
                                key_col: live[key_col],
                                "ivf_list": pa.array(lists),
                                "pq": matrix_to_binary(codes),
                            }
                        ),
                        "insert",
                        seg=True,
                    )
                )
            if len(dels):
                outs.append(
                    ctx.envelope(
                        pa.table(
                            {
                                key_col: dels[key_col],
                                "ivf_list": pa.nulls(len(dels), pa.int64()),
                                "pq": pa.nulls(len(dels), pa.binary()),
                            }
                        ),
                        "delete",
                        seg=True,
                    )
                )
            if not outs:
                return ctx.envelope(
                    view_spec.schema.empty_table(), "insert", seg=True
                )
            return pa.concat_tables(outs)

        changes = feed.map_batches(
            to_index_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        return changes, view_spec

    from raycdc import sink as S_lin

    return maintain_view(
        src_lake,
        index_lake,
        fold,
        spec=spec,
        caller="maintain_vector_index",
        steady=S_lin.LINEAGE_SCHEMA.empty_table,
    )


def knn_over_index(
    index_lake: str,
    src_lake: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    rerank: int | None = None,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    spec=None,
    index_partitions: int = 8,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Top-k cosine search against the MAINTAINED index lake
    (:func:`maintain_vector_index`): the ADC scan streams ``(key, list,
    codes)`` rows from the index lake — m_sub bytes per vector, vectors
    never re-encoded — and the exact rerank reads only the nominated
    candidate rows of the SOURCE lake.  With ``nprobe = n_lists`` and
    ``rerank`` ≥ the corpus this is EXACT top-k (probing every list +
    exact rescoring loses nothing), which is what the hash-exact
    ⊕sim_knn_index oracle pins; at scale, nprobe ≪ n_lists is the
    approximate path with the same machinery.
    """
    from raycdc.engine import _configure_shuffle, read_lake
    from raycdc.schema import TableSpec

    _configure_shuffle()
    quant = _load_quantizer(index_lake)
    if quant is None:
        raise FileNotFoundError(
            f"knn_over_index: {index_lake} has no quantizer — run "
            "maintain_vector_index first"
        )
    centroids, codebooks, n_lists, m_sub = quant
    if rerank is None:
        rerank = 4 * k
    qn = _normalize(np.asarray(queries, np.float64))
    d_sub = qn.shape[1] // m_sub
    q_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, : min(nprobe, n_lists)]
    luts = np.stack(
        [qn[:, j * d_sub : (j + 1) * d_sub] @ codebooks[j].T for j in range(m_sub)],
        axis=1,
    ).astype(np.float32)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), q_lists, luts))

    assigned = read_lake(
        index_lake,
        TableSpec(num_partitions=index_partitions),
        columns=[key_col, "ivf_list", "pq"],
    )
    cand = _adc_candidates(
        assigned, ref, m_sub, rerank, key_col, num_partitions
    )
    # the exact rerank touches only candidate KEYS (≤ queries × rerank):
    # prune the source read to their partitions — the lake layout is a
    # pure function of the key, so candidate partitions are computable
    # driver-side from the candidate ids alone.  One driver fetch serves
    # both the pruning and the rerank broadcast (cand_t passed through).
    src_spec = spec or TableSpec()
    cand_tbls = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
    if not cand_tbls:
        return ray.data.from_arrow(_empty_candidates(key_col))
    cand_t = pa.concat_tables(cand_tbls).combine_chunks()
    from raycdc import sink as _S
    from raycdc.partition import hash_key_column

    meta = _S.read_spec_meta(src_lake) or {}
    src_parts = None
    if meta.get("partition_key", src_spec.partition_key) == key_col:
        # pruning is only sound when the lake partitions BY the search
        # key; a lake keyed elsewhere (legal for replay) falls back to a
        # full — still column-pruned — read rather than silently missing
        # candidates (the maintainers raise here because pruning is load-
        # bearing for them; for search it is an optimization)
        src_nparts = int(meta.get("num_partitions", src_spec.num_partitions))
        src_parts = (
            np.unique(
                hash_key_column(cand_t[key_col].combine_chunks())
                % np.uint64(src_nparts)
            )
            .astype(int)
            .tolist()
        )
    source = read_lake(
        src_lake,
        src_spec,
        columns=[key_col, vec_col],
        partitions=src_parts,
    )
    return _exact_rerank(source, cand_t, qn, query_ids, k, vec_col, key_col)
