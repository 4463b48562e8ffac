"""CDC × ANN composite: maintain_vector_index (IVF-PQ index lake as an
incrementally-maintained view of a vector lake) + knn_over_index, and the
nested_row_hash kernel that makes embedding columns CDC-able."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

import raycdc.similarity as S
from raycdc.engine import read_lake, replay
from raycdc.partition import nested_row_hash
from raycdc.schema import TableSpec
from raycdc.storage import get_storage, read_json


# ---------------------------------------------------------------------------
# nested_row_hash: the equality contract


def test_nested_row_hash_equality_and_sensitivity():
    a = pa.array([[1.0, 2.0], [1.0, 2.0], [2.0, 1.0], [1.0, 2.0, 0.0], []])
    h = nested_row_hash(a)
    assert h[0] == h[1]  # identical rows
    assert h[0] != h[2]  # order-sensitive
    assert h[0] != h[3]  # length-sensitive (trailing zero is a new row)
    assert h[4] != h[0]  # empty row is its own value
    b = pa.array([[], []])
    hb = nested_row_hash(b)
    assert hb[0] == hb[1]


def test_nested_row_hash_fixed_size_list():
    m = np.array([[1.5, -2.0], [1.5, -2.0], [1.5, -2.125]], np.float32)
    a = pa.FixedSizeListArray.from_arrays(pa.array(m.reshape(-1)), 2)
    h = nested_row_hash(a)
    assert h[0] == h[1] and h[0] != h[2]


def test_nested_row_hash_sliced_offsets():
    a = pa.array([[9.0], [1.0, 2.0], [1.0, 2.0], [3.0]])
    full = nested_row_hash(a)
    sl = nested_row_hash(a.slice(1, 3))
    assert np.array_equal(full[1:4], sl)


def test_diff_tagged_handles_list_columns():
    from raycdc.changelog import diff_tagged

    old = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([[1.0, 2.0], [3.0], [4.0]]),
            "__side": pa.array([0, 0, 0], pa.int8()),
        }
    )
    new = pa.table(
        {
            "k": pa.array([2, 3, 4], pa.int64()),
            "v": pa.array([[3.0], [4.5], [6.0]]),
            "__side": pa.array([1, 1, 1], pa.int8()),
        }
    )
    out = diff_tagged(
        pa.concat_tables([old, new]), ("k",), ("v",)
    ).to_pandas()
    ops = dict(zip(out["k"], out["op"]))
    # k=1 deleted, k=2 unchanged (no row), k=3 updated, k=4 inserted
    assert ops == {1: "delete", 3: "update", 4: "insert"}


def test_nested_row_hash_string_children():
    # list<string> columns (tags) are CDC-able too: child strings hash
    # via the FNV column hash, order- and length-sensitive (r5 review —
    # the old path raised a cryptic numpy object-array TypeError here)
    a = pa.array([["x", "y"], ["x", "y"], ["y", "x"], ["x"], []])
    h = nested_row_hash(a)
    assert h[0] == h[1]
    assert len({h[0], h[2], h[3], h[4]}) == 4
    # hash is a function of BYTES, not offset width: large variants agree
    b = pa.array(
        [["x", "y"], ["y", "x"]], pa.large_list(pa.large_string())
    )
    hb = nested_row_hash(b)
    assert hb[0] == h[0] and hb[1] == h[2]
    # binary children and fixed-width string lists take the same path
    d = pa.array([[b"ab"], [b"ab"], [b"ac"]], pa.list_(pa.binary()))
    hd = nested_row_hash(d)
    assert hd[0] == hd[1] and hd[0] != hd[2]
    f = pa.array([["x", "y"], ["y", "x"]], pa.list_(pa.string(), 2))
    hf = nested_row_hash(f)
    assert hf[0] != hf[1]


def test_nested_row_hash_named_refusals():
    with pytest.raises(TypeError, match="flatten deeper nesting"):
        nested_row_hash(pa.array([[[1]]]))
    # an int child with a null element would float-promote the WHOLE
    # slice and change neighboring rows' hashes — refused by name
    with pytest.raises(TypeError, match="null elements"):
        nested_row_hash(pa.array([[1, None], [2]], pa.list_(pa.int64())))
    # null float elements are fine: NaN fill, dtype stable
    hf = nested_row_hash(
        pa.array([[1.0, None], [1.0, None], [2.0]], pa.list_(pa.float64()))
    )
    assert hf[0] == hf[1] and hf[0] != hf[2]


def test_diff_tagged_string_list_column():
    from raycdc.changelog import diff_tagged

    old = pa.table(
        {
            "k": pa.array([1, 2], pa.int64()),
            "tags": pa.array([["a", "b"], ["c"]]),
            "__side": pa.array([0, 0], pa.int8()),
        }
    )
    new = pa.table(
        {
            "k": pa.array([1, 2], pa.int64()),
            "tags": pa.array([["a", "b"], ["c", "d"]]),
            "__side": pa.array([1, 1], pa.int8()),
        }
    )
    out = diff_tagged(
        pa.concat_tables([old, new]), ("k",), ("tags",)
    ).to_pandas()
    assert dict(zip(out["k"], out["op"])) == {2: "update"}


# ---------------------------------------------------------------------------
# the composite


def _vec_spec(emb_type):
    return TableSpec(
        name="vectors",
        schema=pa.schema(
            [
                pa.field("vec_id", pa.int64()),
                pa.field("embedding", emb_type),
                pa.field("ts", pa.timestamp("us")),
            ]
        ),
        key_cols=("vec_id",),
        version_cols=("ts", "lsn"),
        partition_key="vec_id",
        num_partitions=4,
        sort_cols=("vec_id",),
    )


def _seg(ids, mat, lsn0, op="insert"):
    n = len(ids)
    return pa.table(
        {
            "vec_id": pa.array(np.asarray(ids, np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in mat]),
            "ts": pa.array(
                np.full(n, 1_600_000_000_000_000, np.int64)
                + np.arange(lsn0, lsn0 + n, dtype=np.int64),
                pa.timestamp("us"),
            ),
            "op": pa.array([op] * n),
            "lsn": pa.array(np.arange(lsn0, lsn0 + n, dtype=np.int64)),
        }
    )


@pytest.fixture()
def vec_lake(ray_session, tmp_path):
    rng = np.random.default_rng(21)
    centers = rng.standard_normal((8, 16)) * 4
    mat = centers[rng.integers(0, 8, 400)] + rng.standard_normal((400, 16))
    spec = _vec_spec(pa.list_(pa.float64()))
    src = str(tmp_path / "vecs")
    idx = str(tmp_path / "index")
    replay(
        ray.data.from_arrow(_seg(np.arange(200), mat[:200], 0)), src, spec
    )
    S.maintain_vector_index(src, idx, n_lists=4, m_sub=4, spec=spec,
                            num_partitions=4)
    return src, idx, spec, mat


def test_index_refresh_feeds_only_change(vec_lake):
    src, idx, spec, mat = vec_lake
    q1 = read_json(get_storage(idx), f"{idx}/{S._QUANTIZER_FILE}")
    # second segment: 200 new vectors
    lin = None
    replay(
        ray.data.from_arrow(_seg(np.arange(200, 400), mat[200:400], 500)),
        src,
        spec,
    )
    lin = S.maintain_vector_index(src, idx, n_lists=4, m_sub=4, spec=spec,
                                  num_partitions=4)
    import pyarrow.compute as pc

    assert int(pc.sum(lin["rows_in"]).as_py()) == 200  # change, not corpus
    # the quantizer did NOT retrain (codes stay comparable across refreshes)
    q2 = read_json(get_storage(idx), f"{idx}/{S._QUANTIZER_FILE}")
    assert q1 == q2
    # steady refresh: empty
    lin = S.maintain_vector_index(src, idx, n_lists=4, m_sub=4, spec=spec,
                                  num_partitions=4)
    assert lin.num_rows == 0


def test_index_search_exact_at_full_probe(vec_lake):
    src, idx, spec, mat = vec_lake
    q, qids = mat[:5], np.arange(5)
    got = (
        S.knn_over_index(idx, src, q, qids, k=5, nprobe=4, rerank=512,
                         spec=spec, index_partitions=4)
        .to_pandas()
        .sort_values(["q_id", "rank"])
    )
    vecs = read_lake(src, spec, columns=["vec_id", "embedding"])
    brute = (
        S.knn_brute_force(vecs, q, qids, k=5)
        .to_pandas()
        .sort_values(["q_id", "rank"])
    )
    cols = ["q_id", "vec_id", "rank"]
    assert got[cols].reset_index(drop=True).equals(
        brute[cols].reset_index(drop=True)
    )


def test_index_delete_removes_vector_from_results(vec_lake):
    src, idx, spec, mat = vec_lake
    # query with vector 7 itself: rank 1 must be 7 before the delete
    q, qids = mat[7:8], np.array([7])
    kw = dict(k=3, nprobe=4, rerank=512, spec=spec, index_partitions=4)
    before = S.knn_over_index(idx, src, q, qids, **kw).to_pandas()
    assert before[before["rank"] == 1]["vec_id"].iloc[0] == 7
    replay(ray.data.from_arrow(_seg([7], mat[7:8], 900, op="delete")), src, spec)
    S.maintain_vector_index(src, idx, n_lists=4, m_sub=4, spec=spec,
                            num_partitions=4)
    after = S.knn_over_index(idx, src, q, qids, **kw).to_pandas()
    assert 7 not in set(after["vec_id"])


def test_index_update_moves_vector(vec_lake):
    src, idx, spec, mat = vec_lake
    # move vector 11 on top of vector 42's embedding (tiny perturbation)
    moved = mat[42] + 1e-6
    replay(
        ray.data.from_arrow(_seg([11], moved[None, :], 950)), src, spec
    )
    S.maintain_vector_index(src, idx, n_lists=4, m_sub=4, spec=spec,
                            num_partitions=4)
    q, qids = mat[42:43], np.array([42])
    res = S.knn_over_index(idx, src, q, qids, k=2, nprobe=4, rerank=512,
                           spec=spec, index_partitions=4).to_pandas()
    assert set(res["vec_id"]) == {42, 11}


def test_search_without_index_raises(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError, match="quantizer"):
        S.knn_over_index(
            str(tmp_path / "nope"), str(tmp_path / "nope2"),
            np.zeros((1, 8)), np.array([0]),
        )


def test_index_search_approximate_path_recall(vec_lake):
    """nprobe < n_lists: the approximate path must keep most of the exact
    top-k (clustered data ⇒ the true neighbors share the query's list)."""
    src, idx, spec, mat = vec_lake
    q, qids = mat[:10], np.arange(10)
    exact = S.knn_over_index(idx, src, q, qids, k=5, nprobe=4, rerank=512,
                             spec=spec, index_partitions=4).to_pandas()
    approx = S.knn_over_index(idx, src, q, qids, k=5, nprobe=2, rerank=64,
                              spec=spec, index_partitions=4).to_pandas()
    e = set(zip(exact["q_id"], exact["vec_id"]))
    a = set(zip(approx["q_id"], approx["vec_id"]))
    assert len(e & a) / len(e) >= 0.6


def test_ann_index_cli_smoke(ray_session, tmp_path, capsys):
    from raycdc.__main__ import main

    rng = np.random.default_rng(31)
    mat = rng.standard_normal((120, 16))
    spec = _vec_spec(pa.list_(pa.float64()))
    src = str(tmp_path / "vecs")
    replay(ray.data.from_arrow(_seg(np.arange(120), mat, 0)), src, spec)
    rc = main(
        ["ann-index", src, str(tmp_path / "index"),
         "--key", "vec_id", "--vec", "embedding",
         "--lists", "4", "--msub", "4", "--partitions", "4"]
    )
    assert rc == 0
    assert "applied_partitions" in capsys.readouterr().out


def test_nested_row_hash_fixed_size_list_with_null_rows():
    """flatten() drops null rows' slots — the kernel must use the raw
    child so valid rows after a null still hash correctly (self-review
    r5 finding: reshape misaligned and crashed)."""
    a = pa.array(
        [[1.0, 2.0], [None, 4.0], None, [5.0, 6.0], [1.0, 2.0]],
        pa.list_(pa.float64(), 2),
    )
    h = nested_row_hash(a)
    assert len(h) == 5
    assert h[0] == h[4]  # identical valid rows, one beyond the null
    assert h[0] != h[3]


def test_diff_tagged_fixed_size_list_null_row():
    from raycdc.changelog import diff_tagged

    typ = pa.list_(pa.float64(), 2)
    old = pa.table(
        {
            "k": pa.array([1, 2], pa.int64()),
            "v": pa.array([[1.0, 2.0], None], typ),
            "__side": pa.array([0, 0], pa.int8()),
        }
    )
    new = pa.table(
        {
            "k": pa.array([1, 2], pa.int64()),
            "v": pa.array([[1.0, 2.0], [3.0, 4.0]], typ),
            "__side": pa.array([1, 1], pa.int8()),
        }
    )
    out = diff_tagged(pa.concat_tables([old, new]), ("k",), ("v",)).to_pandas()
    # k=1 unchanged; k=2 null -> value is an update
    assert dict(zip(out["k"], out["op"])) == {2: "update"}


def test_index_search_on_foreign_partition_key_falls_back(ray_session, tmp_path):
    """A vector lake partitioned by a DIFFERENT key (legal for replay):
    pruning by vec_id would read the wrong partitions, so the search
    must fall back to an unpruned read and stay exact."""
    rng = np.random.default_rng(33)
    mat = rng.standard_normal((150, 16))
    spec = TableSpec(
        name="vectors",
        schema=pa.schema(
            [
                pa.field("vec_id", pa.int64()),
                pa.field("tenant", pa.string()),
                pa.field("embedding", pa.list_(pa.float64())),
                pa.field("ts", pa.timestamp("us")),
            ]
        ),
        key_cols=("vec_id",),
        version_cols=("ts", "lsn"),
        partition_key="tenant",
        num_partitions=4,
        sort_cols=("vec_id",),
    )
    n = len(mat)
    seg = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "tenant": pa.array([f"t{i % 3}" for i in range(n)]),
            "embedding": pa.array([list(map(float, r)) for r in mat]),
            "ts": pa.array(
                np.full(n, 1_600_000_000_000_000, np.int64)
                + np.arange(n, dtype=np.int64),
                pa.timestamp("us"),
            ),
            "op": pa.array(["insert"] * n),
            "lsn": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    src, idx = str(tmp_path / "vecs"), str(tmp_path / "index")
    replay(ray.data.from_arrow(seg), src, spec)
    # the index VIEW partitions by vec_id regardless of the source layout
    S.maintain_vector_index(src, idx, n_lists=4, m_sub=4, spec=spec,
                            num_partitions=4)
    q, qids = mat[:4], np.arange(4)
    got = (
        S.knn_over_index(idx, src, q, qids, k=3, nprobe=4, rerank=256,
                         spec=spec, index_partitions=4)
        .to_pandas()
        .sort_values(["q_id", "rank"])
    )
    vecs = read_lake(src, spec, columns=["vec_id", "embedding"])
    brute = (
        S.knn_brute_force(vecs, q, qids, k=3)
        .to_pandas()
        .sort_values(["q_id", "rank"])
    )
    cols = ["q_id", "vec_id", "rank"]
    assert got[cols].reset_index(drop=True).equals(
        brute[cols].reset_index(drop=True)
    )


def test_index_promote_crash_retry_converges(ray_session, tmp_path):
    """Crash drill for the CDC×ANN view: the FIRST refresh completes its
    install (quantizer persisted + index rows landed) but the position
    promote is lost — the retry must reuse the SAME persisted quantizer
    (codes stay comparable), re-derive identical rows under the same
    claim, and converge to a run that never crashed."""
    import raycdc.storage as storage_mod
    from raycdc.storage import get_storage, read_json

    rng = np.random.default_rng(31)
    mat = rng.standard_normal((120, 8))
    spec = _vec_spec(pa.list_(pa.float64()))
    src_a, idx_a = str(tmp_path / "va"), str(tmp_path / "ia")
    src_b, idx_b = str(tmp_path / "vb"), str(tmp_path / "ib")
    for src in (src_a, src_b):
        replay(ray.data.from_arrow(_seg(np.arange(120), mat, 0)), src, spec)

    kw = dict(n_lists=4, m_sub=4, spec=spec, num_partitions=4)
    S.maintain_vector_index(src_b, idx_b, **kw)  # control, clean

    real = storage_mod.write_json_atomic
    state = {"armed": True}

    def flaky(st, path, payload):
        if (
            state["armed"]
            and path.endswith("_feed_pos.json")
            and "pending" not in payload
        ):
            state["armed"] = False
            raise OSError("injected: promote write lost")
        return real(st, path, payload)

    storage_mod.write_json_atomic = flaky
    try:
        with pytest.raises(OSError, match="injected"):
            S.maintain_vector_index(src_a, idx_a, **kw)
    finally:
        storage_mod.write_json_atomic = real

    q_crashed = read_json(get_storage(idx_a), f"{idx_a}/{S._QUANTIZER_FILE}")
    assert q_crashed is not None  # persisted before the crash
    S.maintain_vector_index(src_a, idx_a, **kw)  # retry
    q_after = read_json(get_storage(idx_a), f"{idx_a}/{S._QUANTIZER_FILE}")
    assert q_after == q_crashed  # reused, never retrained

    # both indexes serve identical exact results at full probe
    q, qids = mat[:4], np.arange(4)
    skw = dict(k=3, nprobe=4, rerank=256, spec=spec, index_partitions=4)
    ra = (
        S.knn_over_index(idx_a, src_a, q, qids, **skw)
        .to_pandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    rb = (
        S.knn_over_index(idx_b, src_b, q, qids, **skw)
        .to_pandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    assert ra.equals(rb)
