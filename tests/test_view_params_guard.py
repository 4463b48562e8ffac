"""View-defining parameters are PINNED in the view lake
(engine.pin_view_params / ``_view_params.json``): the first refresh
writes them, later refreshes with different values are refused instead
of silently installing rows under a contract the view's existing
readers don't share (r5 review findings: a k=3 refresh of a k=5 top-k
view left untouched groups at five rows; a maintain_distinct refresh
under a different num_partitions pruned the register read against the
wrong layout and collapsed estimates to the delta)."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from raycdc.engine import (
    maintain_distinct,
    maintain_extrema,
    maintain_rollup,
    maintain_topk,
    maintain_transcripts,
    pin_view_params,
    replay,
)
from raycdc.schema import TableSpec


def _seg(rows, lsn0):
    n = len(rows)
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(["x"] * n),
            "tool": pa.array([""] * n),
            "ts": pa.array(
                [
                    dt.datetime(2024, 1, 1) + dt.timedelta(seconds=lsn0 + i)
                    for i in range(n)
                ],
                pa.timestamp("us"),
            ),
            "op": pa.array(["insert"] * n),
            "lsn": pa.array(np.arange(lsn0, lsn0 + n, dtype=np.int64)),
        }
    )


@pytest.fixture()
def src_lake(ray_session, tmp_path):
    spec = TableSpec(num_partitions=4)
    src = str(tmp_path / "src")
    replay(
        ray.data.from_arrow(
            _seg([("c1", 0), ("c1", 5), ("c2", 3), ("c2", 1)], 0)
        ),
        src,
        spec,
    )
    return src, spec, tmp_path


def _advance(src, spec, lsn0):
    replay(ray.data.from_arrow(_seg([("c1", 7), ("c3", 2)], lsn0)), src, spec)


def test_pin_unit_roundtrip(tmp_path):
    view = str(tmp_path / "v")
    pin_view_params(view, "maintain_topk", {"k": 5, "group_col": "g"})
    # identical params: accepted, idempotent
    pin_view_params(view, "maintain_topk", {"k": 5, "group_col": "g"})
    with pytest.raises(ValueError, match="pinned 5, got 3"):
        pin_view_params(view, "maintain_topk", {"k": 3, "group_col": "g"})
    with pytest.raises(ValueError, match="different view kind"):
        pin_view_params(view, "maintain_extrema", {"k": 5})


def test_topk_k_change_refused(src_lake):
    src, spec, tmp = src_lake
    view = str(tmp / "topk")
    kw = dict(group_col="conv_id", order_col="turn_idx", spec=spec,
              num_partitions=4)
    maintain_topk(src, view, k=3, **kw)
    _advance(src, spec, 100)
    with pytest.raises(ValueError, match="k: pinned 3, got 2"):
        maintain_topk(src, view, k=2, **kw)
    with pytest.raises(ValueError, match="order_col"):
        maintain_topk(src, view, k=3, **{**kw, "order_col": "lsn"})
    # the pinned contract still refreshes fine
    maintain_topk(src, view, k=3, **kw)


def test_distinct_layout_change_refused(src_lake):
    src, spec, tmp = src_lake
    view = str(tmp / "dv")
    maintain_distinct(src, view, "role", "conv_id", spec=spec,
                      num_partitions=4)
    _advance(src, spec, 100)
    with pytest.raises(ValueError, match="num_partitions: pinned 4, got 8"):
        maintain_distinct(src, view, "role", "conv_id", spec=spec,
                          num_partitions=8)
    with pytest.raises(ValueError, match="p: pinned"):
        maintain_distinct(src, view, "role", "conv_id", spec=spec, p=10,
                          num_partitions=4)
    est = maintain_distinct(src, view, "role", "conv_id", spec=spec,
                            num_partitions=4)
    # registers survived the guarded refresh: estimate covers all convs
    n = {g: v for g, v in zip(est["role"].to_pylist(),
                              est["n_distinct"].to_pylist())}
    assert n["user"] == 3


def test_extrema_and_transcripts_refused(src_lake):
    src, spec, tmp = src_lake
    ev = str(tmp / "ev")
    tv = str(tmp / "tv")
    maintain_extrema(src, ev, spec=spec, num_partitions=4)
    maintain_transcripts(src, tv, spec=spec, num_partitions=4)
    _advance(src, spec, 100)
    with pytest.raises(ValueError, match="value_col"):
        maintain_extrema(src, ev, value_col="lsn", spec=spec,
                         num_partitions=4)
    with pytest.raises(ValueError, match="sep"):
        maintain_transcripts(src, tv, sep=" | ", spec=spec,
                             num_partitions=4)
    maintain_extrema(src, ev, spec=spec, num_partitions=4)
    maintain_transcripts(src, tv, spec=spec, num_partitions=4)


def test_rollup_group_cols_refused(src_lake):
    src, spec, tmp = src_lake
    view = str(tmp / "roll")

    def derive(t):
        return t.append_column("n", pa.array(np.ones(len(t), np.int64)))

    maintain_rollup(src, view, ("role",), ("n",), spec=spec,
                    num_partitions=4, derive=derive)
    _advance(src, spec, 100)
    with pytest.raises(ValueError, match="group_cols"):
        maintain_rollup(src, view, ("conv_id",), ("n",), spec=spec,
                        num_partitions=4, derive=derive)
    maintain_rollup(src, view, ("role",), ("n",), spec=spec,
                    num_partitions=4, derive=derive)


def test_vector_index_params_refused(ray_session, tmp_path):
    from raycdc.similarity import maintain_vector_index

    rng = np.random.default_rng(7)
    n, d = 64, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    spec = TableSpec(
        name="vecs",
        schema=pa.schema(
            [
                pa.field("vec_id", pa.int64()),
                pa.field("embedding", pa.list_(pa.float32())),
            ]
        ),
        key_cols=("vec_id",),
        version_cols=("ts", "lsn"),
        partition_key="vec_id",
        num_partitions=4,
        sort_cols=("vec_id",),
    )
    seg = pa.table(
        {
            "vec_id": pa.array(np.arange(n)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")
            ),
            "op": pa.array(["insert"] * n),
            "lsn": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    src = str(tmp_path / "vsrc")
    idx = str(tmp_path / "vidx")
    replay(ray.data.from_arrow(seg), src, spec)
    maintain_vector_index(src, idx, n_lists=4, m_sub=2, spec=spec,
                          num_partitions=4)
    with pytest.raises(ValueError, match="n_lists"):
        maintain_vector_index(src, idx, n_lists=8, m_sub=2, spec=spec,
                              num_partitions=4)
    maintain_vector_index(src, idx, n_lists=4, m_sub=2, spec=spec,
                          num_partitions=4)
