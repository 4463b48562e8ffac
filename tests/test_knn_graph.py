"""Graph ANN (similarity.knn_graph): NSW beam search over per-list
subgraphs — recall-per-scanned-vector vs the IVF-flat baseline at equal
probe cost, blocked-build equivalence, determinism, and the list cap."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

import raycdc.similarity as S


def _clustered_corpus(n=2000, d=32, n_clusters=16, seed=11):
    """Deterministic clustered embeddings — the geometry NSW navigation
    is built for (random near-orthogonal data has no gradient to follow)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * 4.0
    asg = rng.integers(0, n_clusters, n)
    m = centers[asg] + rng.standard_normal((n, d))
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1).astype(np.float32)), d
            ),
        }
    )
    return tbl, m, ids


def _pairs(df):
    return set(zip(df["q_id"], df["vec_id"]))


@pytest.fixture(scope="module")
def corpus():
    return _clustered_corpus()


N_LISTS, NPROBE, K = 4, 2, 5


def _ivf_scan_cost(m, ds, n_queries, train_sample=10_000):
    """Per-query vectors an IVF-flat scan touches: the summed sizes of its
    nprobe probed lists, under the SAME coarse quantizer knn_ivf/knn_graph
    train (identical ds.limit sample + seeded k-means)."""
    mn = S._normalize(m.astype(np.float64))
    sample = mn[:train_sample]
    cents = S._kmeans(sample, N_LISTS)
    assign = np.argmax(mn @ cents.T, axis=1)
    sizes = np.bincount(assign, minlength=N_LISTS)
    q_lists = np.argsort(-(mn[:n_queries] @ cents.T), axis=1)[:, :NPROBE]
    return sizes[q_lists].sum(axis=1).astype(np.float64)


def test_graph_recall_per_scanned_vector_beats_ivf(ray_session, corpus):
    """The docstring's contract: at equal probe cost (same quantizer, same
    nprobe) the graph scores far fewer vectors per query than a full list
    scan, and recall per scanned vector must come out ahead."""
    tbl, m, ids = corpus
    nq = 20
    q, qids = m[:nq], ids[:nq]
    ds = ray.data.from_arrow(tbl)
    exact = S.knn_brute_force(ds, q, qids, k=K).to_pandas()
    ivf = S.knn_ivf(
        ds, q, qids, k=K, n_lists=N_LISTS, nprobe=NPROBE, num_partitions=8
    ).to_pandas()
    graph = S.knn_graph(
        ds, q, qids, k=K, n_lists=N_LISTS, nprobe=NPROBE,
        degree=8, beam=16, max_hops=16, num_partitions=8,
    ).to_pandas()
    e = _pairs(exact)
    recall_ivf = len(e & _pairs(ivf)) / len(e)
    recall_graph = len(e & _pairs(graph)) / len(e)
    scan_ivf = _ivf_scan_cost(m, ds, nq).mean()
    scan_graph = (
        graph.groupby("q_id")["n_scanned"].max().astype(float).mean()
    )
    assert recall_graph >= 0.6, recall_graph
    assert scan_graph < scan_ivf, (scan_graph, scan_ivf)
    eff_graph = recall_graph / scan_graph
    eff_ivf = recall_ivf / scan_ivf
    assert eff_graph >= eff_ivf, (eff_graph, eff_ivf, recall_graph, recall_ivf)


def test_graph_blocked_build_matches_single_block(ray_session, corpus):
    """Forcing the adjacency build through many small row blocks must not
    change a single result row — the blocking is a memory shape, not an
    algorithm change."""
    tbl, m, ids = corpus
    q, qids = m[:8], ids[:8]
    ds = ray.data.from_arrow(tbl)
    kw = dict(
        k=K, n_lists=N_LISTS, nprobe=NPROBE, degree=8, beam=16,
        max_hops=16, num_partitions=8,
    )
    one = S.knn_graph(ds, q, qids, **kw).to_pandas().sort_values(["q_id", "rank"])
    orig = S._ADJ_BLOCK_BYTES
    try:
        S._ADJ_BLOCK_BYTES = 8 * 2000 * 16  # 16-row blocks at n=2000
        many = (
            S.knn_graph(ds, q, qids, **kw).to_pandas().sort_values(["q_id", "rank"])
        )
    finally:
        S._ADJ_BLOCK_BYTES = orig
    assert one.reset_index(drop=True).equals(many.reset_index(drop=True))


def test_graph_query_chunking_matches_unchunked(ray_session, corpus):
    """Small search-state chunks (few queries per lock-step batch) must be
    row-identical to one big chunk."""
    tbl, m, ids = corpus
    q, qids = m[:12], ids[:12]
    ds = ray.data.from_arrow(tbl)
    kw = dict(
        k=K, n_lists=N_LISTS, nprobe=NPROBE, degree=8, beam=16,
        max_hops=16, num_partitions=8,
    )
    big = S.knn_graph(ds, q, qids, **kw).to_pandas().sort_values(["q_id", "rank"])
    orig = S._SEARCH_CHUNK_BYTES
    try:
        S._SEARCH_CHUNK_BYTES = 10 * 2000 * 2  # 2 queries per chunk
        small = (
            S.knn_graph(ds, q, qids, **kw).to_pandas().sort_values(["q_id", "rank"])
        )
    finally:
        S._SEARCH_CHUNK_BYTES = orig
    assert big.reset_index(drop=True).equals(small.reset_index(drop=True))


def test_graph_deterministic(ray_session, corpus):
    tbl, m, ids = corpus
    q, qids = m[:6], ids[:6]
    ds = ray.data.from_arrow(tbl)
    kw = dict(
        k=K, n_lists=N_LISTS, nprobe=NPROBE, degree=8, beam=16,
        max_hops=16, num_partitions=8,
    )
    a = S.knn_graph(ds, q, qids, **kw).to_pandas().sort_values(["q_id", "rank"])
    b = S.knn_graph(ds, q, qids, **kw).to_pandas().sort_values(["q_id", "rank"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_graph_unsorted_query_ids(ray_session, corpus):
    """Like the ivfpq advice fix: caller-supplied id order must not matter."""
    tbl, m, ids = corpus
    q, qids = m[:6], ids[:6]
    ds = ray.data.from_arrow(tbl)
    kw = dict(
        k=K, n_lists=N_LISTS, nprobe=NPROBE, degree=8, beam=16,
        max_hops=16, num_partitions=8,
    )
    fwd = S.knn_graph(ds, q, qids, **kw).to_pandas().sort_values(["q_id", "rank"])
    rev = (
        S.knn_graph(ds, q[::-1].copy(), qids[::-1].copy(), **kw)
        .to_pandas()
        .sort_values(["q_id", "rank"])
    )
    assert fwd.reset_index(drop=True).equals(rev.reset_index(drop=True))


def test_graph_list_cap_completes_and_bounds_results(ray_session, corpus):
    """max_list smaller than a list: the task truncates (CAPS-counted in
    the worker log), completes, and still returns <= k ranked rows/query."""
    tbl, m, ids = corpus
    q, qids = m[:5], ids[:5]
    ds = ray.data.from_arrow(tbl)
    res = S.knn_graph(
        ds, q, qids, k=K, n_lists=N_LISTS, nprobe=NPROBE, degree=4,
        beam=8, max_hops=8, num_partitions=8, max_list=64,
    ).to_pandas()
    assert len(res) > 0
    per_q = res.groupby("q_id")["rank"].max()
    assert (per_q <= K).all()


def test_graph_singleton_list(ray_session):
    """A list holding one vector: the node is every probing query's
    candidate (deg<=0 branch)."""
    tbl, m, ids = _clustered_corpus(n=3, d=8, n_clusters=3, seed=2)
    ds = ray.data.from_arrow(tbl)
    res = S.knn_graph(
        ds, m[:2], ids[:2], k=2, n_lists=3, nprobe=3, degree=4, beam=4,
        num_partitions=4, train_sample=3,
    ).to_pandas()
    # every query sees every vector (3 lists, all probed)
    assert set(res["q_id"]) == {0, 1}
    assert res.groupby("q_id")["vec_id"].nunique().min() >= 2
