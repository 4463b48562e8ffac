"""maintain_topk: incrementally maintained TOP-K-per-group view — the
ORDERED non-invertible case on the maintain_view skeleton (a delete can
evict a top-k member and promote a value the view never stored)."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import maintain_topk, read_lake, replay
from raycdc.schema import TableSpec
from raycdc.storage import get_storage, read_json, write_json_atomic


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
            "op": pa.array([r[2] for r in rows]),
            "lsn": pa.array(np.arange(lsn0, lsn0 + n, dtype=np.int64)),
        }
    )


def _view_state(view):
    parts = [
        t
        for t in ray.get(
            read_lake(view, TableSpec(num_partitions=4)).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return {}
    t = pa.concat_tables(parts)
    return {
        (g, r): v
        for g, r, v in zip(
            t["conv_id"].to_pylist(),
            t["rank"].to_pylist(),
            t["turn_idx"].to_pylist(),
        )
    }


def test_topk_delete_promotes_and_shrinks(ray_session, tmp_path):
    spec = TableSpec(num_partitions=4)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    kw = dict(group_col="conv_id", order_col="turn_idx", k=3, spec=spec,
              num_partitions=4)

    replay(
        ray.data.from_arrow(
            _seg(
                [
                    ("c1", 0, "insert"),
                    ("c1", 5, "insert"),
                    ("c1", 9, "insert"),
                    ("c1", 7, "insert"),
                    ("c2", 3, "insert"),
                    ("c2", 1, "insert"),
                ],
                0,
            )
        ),
        src,
        spec,
    )
    maintain_topk(src, view, **kw)
    # c1 top-3 of {0,5,7,9} = 9,7,5; c2 has only two live rows
    assert _view_state(view) == {
        ("c1", 1): 9, ("c1", 2): 7, ("c1", 3): 5,
        ("c2", 1): 3, ("c2", 2): 1,
    }

    # delete c1's CURRENT rank-1 (9): 0 gets promoted into the k-set;
    # delete one of c2's two rows: rank 2 must be tombstoned, not stale
    replay(
        ray.data.from_arrow(
            _seg([("c1", 9, "delete"), ("c2", 3, "delete")], 100)
        ),
        src,
        spec,
    )
    maintain_topk(src, view, **kw)
    assert _view_state(view) == {
        ("c1", 1): 7, ("c1", 2): 5, ("c1", 3): 0,
        ("c2", 1): 1,
    }

    # fully delete c2: every rank row gone
    replay(ray.data.from_arrow(_seg([("c2", 1, "delete")], 200)), src, spec)
    maintain_topk(src, view, **kw)
    assert _view_state(view) == {
        ("c1", 1): 7, ("c1", 2): 5, ("c1", 3): 0,
    }

    # steady state: empty lineage, state unchanged
    lin = maintain_topk(src, view, **kw)
    assert lin.num_rows == 0
    # redelivered claim (crash window): recompute converges
    pos_path = f"{view}/_feed_pos.json"
    st = get_storage(view)
    pos = read_json(st, pos_path)
    write_json_atomic(
        st, pos_path, {"snapshot": None, "pending": pos["snapshot"]}
    )
    maintain_topk(src, view, **kw)
    assert _view_state(view) == {
        ("c1", 1): 7, ("c1", 2): 5, ("c1", 3): 0,
    }


def test_topk_matches_oracle_on_synthetic_log(ray_session, tmp_path):
    """One-shot view over a synthetic log equals the python top-k of the
    LWW live state."""
    from .oracle import python_lww_replay

    spec = TableSpec(num_partitions=4)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    log = synthetic_changelog(n_events=600, seed=101, p_delete=0.15)
    replay(ray.data.from_arrow(log), src, spec)
    k = 3
    maintain_topk(src, view, group_col="conv_id", order_col="turn_idx",
                  k=k, spec=spec, num_partitions=4)
    live = python_lww_replay([log])
    want = {}
    by_conv = {}
    for (conv, turn), _r in live.items():
        by_conv.setdefault(conv, []).append(turn)
    for conv, turns in by_conv.items():
        for i, v in enumerate(sorted(turns, reverse=True)[:k]):
            want[(conv, i + 1)] = v
    assert _view_state(view) == want


def test_topk_incremental_equals_oneshot(ray_session, tmp_path):
    spec = TableSpec(num_partitions=4)
    log = synthetic_changelog(n_events=500, seed=102, p_delete=0.2)
    import pyarrow.compute as pc

    head = log.filter(pc.less(log["lsn"], 250))

    src_a, view_a = str(tmp_path / "sa"), str(tmp_path / "va")
    replay(ray.data.from_arrow(head), src_a, spec)
    maintain_topk(src_a, view_a, k=3, spec=spec, num_partitions=4)
    replay(ray.data.from_arrow(log), src_a, spec)
    maintain_topk(src_a, view_a, k=3, spec=spec, num_partitions=4)

    src_b, view_b = str(tmp_path / "sb"), str(tmp_path / "vb")
    replay(ray.data.from_arrow(log), src_b, spec)
    maintain_topk(src_b, view_b, k=3, spec=spec, num_partitions=4)

    assert _view_state(view_a) == _view_state(view_b)


def test_topk_wrong_partition_key_raises(ray_session, tmp_path):
    spec = TableSpec(num_partitions=4)
    src = str(tmp_path / "src")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=50, seed=103)),
        src,
        spec,
    )
    with pytest.raises(ValueError, match="partition pruning"):
        maintain_topk(src, str(tmp_path / "v"), group_col="role", spec=spec)
    with pytest.raises(ValueError, match="k must be"):
        maintain_topk(src, str(tmp_path / "v"), k=0, spec=spec)


def test_topk_cli_smoke(ray_session, tmp_path, capsys):
    from raycdc.__main__ import main

    spec = TableSpec(num_partitions=4)
    src = str(tmp_path / "src")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=300, seed=104)),
        src,
        spec,
    )
    rc = main(
        ["topk", src, str(tmp_path / "view"), "--group", "conv_id",
         "--order", "turn_idx", "-k", "3", "--partitions", "4"]
    )
    assert rc == 0
    assert "applied_partitions" in capsys.readouterr().out
