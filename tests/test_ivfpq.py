"""IVF-PQ ANN (similarity.knn_ivfpq): compressed-index search with exact
distributed re-rank — recall vs the IVF-flat baseline at equal probe cost,
determinism, and the compression contract."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray
import ray.data

import raycdc.similarity as S

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb_table():
    return pq.read_table(EMB, columns=["vec_id", "embedding"])


def _pairs(df):
    return set(zip(df["q_id"], df["vec_id"]))


def test_ivfpq_recall_geq_ivf_at_equal_probe_cost(ray_session, emb_table):
    """Same coarse quantizer, same nprobe ⇒ identical candidate lists;
    the PQ scan moved ~d*8/m_sub× fewer bytes and the exact re-rank
    restores true scores — recall must be ≥ IVF-flat's."""
    m = S._to_matrix(emb_table["embedding"])
    ids = emb_table["vec_id"].to_numpy()
    q, qids = m[:10], ids[:10]
    ds = ray.data.from_arrow(emb_table)
    exact = S.knn_brute_force(ds, q, qids, k=5).to_pandas()
    ivf = S.knn_ivf(ds, q, qids, k=5, n_lists=8, nprobe=2, num_partitions=8).to_pandas()
    pq_res = S.knn_ivfpq(
        ds, q, qids, k=5, n_lists=8, nprobe=2, m_sub=4, rerank=64, num_partitions=8
    ).to_pandas()
    e = _pairs(exact)
    r_ivf = len(e & _pairs(ivf)) / len(e)
    r_pq = len(e & _pairs(pq_res)) / len(e)
    assert r_pq >= r_ivf, (r_pq, r_ivf)
    assert r_pq > 0.5  # sanity: probing 2/8 lists on near-orthogonal data


def test_ivfpq_finds_self_at_rank_one(ray_session, emb_table):
    m = S._to_matrix(emb_table["embedding"])
    ids = emb_table["vec_id"].to_numpy()
    q, qids = m[:6], ids[:6]
    ds = ray.data.from_arrow(emb_table)
    res = S.knn_ivfpq(
        ds, q, qids, k=5, n_lists=8, nprobe=2, m_sub=4, num_partitions=8
    ).to_pandas()
    r1 = res[res["rank"] == 1]
    assert set(r1["q_id"]) == set(qids)
    assert (r1["q_id"] == r1["vec_id"]).all()  # exact re-rank puts self first


def test_ivfpq_deterministic(ray_session, emb_table):
    m = S._to_matrix(emb_table["embedding"])
    ids = emb_table["vec_id"].to_numpy()
    q, qids = m[:4], ids[:4]
    ds = ray.data.from_arrow(emb_table)
    kw = dict(k=5, n_lists=8, nprobe=2, m_sub=4, num_partitions=8)
    a = S.knn_ivfpq(ds, q, qids, **kw).to_pandas().sort_values(["q_id", "rank"])
    b = S.knn_ivfpq(ds, q, qids, **kw).to_pandas().sort_values(["q_id", "rank"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_pq_codes_compress_and_roundtrip():
    """The PQ encoder maps each vector to m_sub uint8 codes whose decoded
    approximation preserves ranking on well-separated clusters."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((4, 16)) * 5
    sample = np.vstack([c + rng.standard_normal((50, 16)) * 0.1 for c in centers])
    cbs = np.stack(
        [S._kmeans_l2(sample[:, j * 4 : (j + 1) * 4], 16, seed=j) for j in range(4)]
    )
    codes = S._pq_encode(sample, cbs)
    assert codes.shape == (200, 4) and codes.dtype == np.uint8
    # decode and check members of the same cluster stay nearest
    decoded = np.concatenate([cbs[j][codes[:, j]] for j in range(4)], axis=1)
    err = np.linalg.norm(decoded - sample, axis=1) / np.linalg.norm(sample, axis=1)
    assert err.mean() < 0.2


def test_ivfpq_dim_not_divisible_raises(ray_session, emb_table):
    m = S._to_matrix(emb_table["embedding"])
    ids = emb_table["vec_id"].to_numpy()
    ds = ray.data.from_arrow(emb_table)
    with pytest.raises(ValueError, match="not divisible"):
        S.knn_ivfpq(ds, m[:2], ids[:2], m_sub=7).to_pandas()
