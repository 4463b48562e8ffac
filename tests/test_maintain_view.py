"""The unified incremental-view skeleton (engine.maintain_view): the three
shipped maintainers run on it (their own test files pin semantics); this
file pins the skeleton's contract for a USER-DEFINED view — the reference's
pluggable-closure design (/root/reference/handler.go:20-58) applied to view
maintenance: a new view costs a fold function, not a protocol
re-implementation."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import maintain_view, read_lake, replay
from raycdc.schema import TableSpec
from raycdc.storage import get_storage, read_json, write_json_atomic

from .oracle import python_lww_replay

VIEW_SPEC = TableSpec(
    name="live_rows",
    schema=pa.schema(
        [pa.field("conv_id", pa.string()), pa.field("n_live", pa.int64())]
    ),
    key_cols=("conv_id",),
    version_cols=("ts", "lsn"),
    partition_key="conv_id",
    num_partitions=4,
    sort_cols=("conv_id",),
    merge_policy="additive",
    value_cols=("n_live",),
)


def _live_rows_view(src, view, spec):
    """User-defined view: LIVE ROW COUNT per conversation, maintained
    additively from the change feed (+1 per feed insert, -1 per feed
    delete; updates keep the key live — delta 0).  Exactly-once comes
    entirely from the skeleton: claimed lsn + additive checkpoints."""

    def fold(feed, ctx):
        def partial(t: pa.Table) -> pa.Table:
            op = pc.fill_null(t[ctx.spec.op_col], "")
            sign = np.zeros(len(t), np.int64)
            sign[np.asarray(pc.equal(op, "insert"))] = 1
            sign[np.asarray(pc.equal(op, "delete"))] = -1
            t2 = pa.table({"conv_id": t["conv_id"], "n_live": pa.array(sign)})
            t2 = t2.filter(pa.array(sign != 0))
            if len(t2) == 0:
                return ctx.envelope(t2, "insert")
            # per-batch combine: sort + segmented sum
            t2 = t2.take(pc.sort_indices(t2["conv_id"]))
            cv = t2["conv_id"].combine_chunks()
            neq = np.asarray(pc.not_equal(cv.slice(1), cv.slice(0, len(cv) - 1)))
            starts = np.r_[0, np.flatnonzero(neq) + 1]
            sums = np.add.reduceat(np.asarray(t2["n_live"]), starts)
            out = pa.table(
                {
                    "conv_id": cv.take(pa.array(starts)),
                    "n_live": pa.array(sums.astype(np.int64)),
                }
            )
            return ctx.envelope(out, "insert")

        return (
            feed.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            VIEW_SPEC,
        )

    return maintain_view(
        src,
        view,
        fold,
        spec=spec,
        caller="live_rows",
        steady=lambda: "STEADY",
    )


def _view_state(view) -> dict:
    parts = [
        t
        for t in ray.get(
            read_lake(view, TableSpec(num_partitions=4)).to_arrow_refs()
        )
        if t.num_rows
    ]
    t = pa.concat_tables(parts)
    return dict(zip(t["conv_id"].to_pylist(), t["n_live"].to_pylist()))


def test_user_defined_view_exactly_once(ray_session, tmp_path):
    log = synthetic_changelog(n_events=900, n_convs=60, seed=170)
    spec = TableSpec(num_partitions=4)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")

    pos_path = f"{view}/_feed_pos.json"
    st = get_storage(view)
    pos_after: list = []
    for lo, hi in ((0, 450), (450, 900)):
        seg = log.filter(
            pc.and_(pc.greater_equal(log["lsn"], lo), pc.less(log["lsn"], hi))
        )
        replay(ray.data.from_arrow(seg), src, spec)
        lin = _live_rows_view(src, view, spec)
        assert lin is not None
        pos_after.append(read_json(st, pos_path)["snapshot"])

    # reference: live keys per conversation in the final LWW state
    # (boundary cancellation nets out in the additive deltas)
    expect: dict = {}
    for (conv, _turn), _row in python_lww_replay([log]).items():
        expect[conv] = expect.get(conv, 0) + 1
    got = {k: v for k, v in _view_state(view).items() if v != 0}
    assert got == expect

    # crash-retry: reinstate refresh 2's EXACT pre-promotion state (claim
    # written, apply landed, promotion lost) — the skeleton must reuse the
    # SAME pending snapshot id, so the re-fed rows carry the same lsn and
    # the additive checkpoints prune them: NO double-count
    write_json_atomic(
        st, pos_path, {"snapshot": pos_after[0], "pending": pos_after[1]}
    )
    _live_rows_view(src, view, spec)
    got2 = {k: v for k, v in _view_state(view).items() if v != 0}
    assert got2 == expect
    assert read_json(st, pos_path).get("pending") is None

    # steady state: identical manifests short-circuit through steady()
    assert _live_rows_view(src, view, spec) == "STEADY"


def test_vacuumed_pending_snapshot_raises(ray_session, tmp_path):
    log = synthetic_changelog(n_events=200, seed=171)
    spec = TableSpec(num_partitions=4)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    replay(ray.data.from_arrow(log), src, spec)
    _live_rows_view(src, view, spec)
    st = get_storage(view)
    write_json_atomic(
        st, f"{view}/_feed_pos.json", {"snapshot": None, "pending": 9999}
    )
    with pytest.raises(FileNotFoundError, match="pending snapshot"):
        _live_rows_view(src, view, spec)


def test_maintain_extrema_delete_removes_extremum(ray_session, tmp_path):
    """The non-invertible case on the skeleton: deleting the current MAX
    must shrink vmax on the next refresh (recompute, not delta), and a
    fully-deleted conversation must be tombstoned out of the view."""
    import datetime as dt

    from raycdc.engine import maintain_extrema

    spec = TableSpec(num_partitions=4)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")

    def seg(rows, lsn0):
        n = len(rows)
        return pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows]),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array(["user"] * n),
                "text": pa.array(["x"] * n),
                "tool": pa.array([""] * n),
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=lsn0 + i) for i in range(n)],
                    pa.timestamp("us"),
                ),
                "op": pa.array([r[2] for r in rows]),
                "lsn": pa.array(
                    np.arange(lsn0, lsn0 + n, dtype=np.int64)
                ),
            }
        )

    replay(
        ray.data.from_arrow(
            seg(
                [
                    ("c1", 0, "insert"),
                    ("c1", 5, "insert"),
                    ("c1", 9, "insert"),
                    ("c2", 3, "insert"),
                ],
                0,
            )
        ),
        src,
        spec,
    )
    maintain_extrema(src, view, spec=spec, num_partitions=4)

    def view_state():
        parts = [
            t
            for t in ray.get(
                read_lake(view, TableSpec(num_partitions=4)).to_arrow_refs()
            )
            if t.num_rows
        ]
        t = pa.concat_tables(parts) if parts else None
        if t is None:
            return {}
        return {
            g: (mn, mx, n)
            for g, mn, mx, n in zip(
                t["conv_id"].to_pylist(),
                t["vmin"].to_pylist(),
                t["vmax"].to_pylist(),
                t["n_rows"].to_pylist(),
            )
        }

    assert view_state() == {"c1": (0, 9, 3), "c2": (3, 3, 1)}

    # delete c1's MAX turn and ALL of c2
    replay(
        ray.data.from_arrow(
            seg([("c1", 9, "delete"), ("c2", 3, "delete")], 100)
        ),
        src,
        spec,
    )
    maintain_extrema(src, view, spec=spec, num_partitions=4)
    assert view_state() == {"c1": (0, 5, 2)}  # vmax shrank; c2 tombstoned

    # steady state + redelivered claim stay exactly-once
    lin = maintain_extrema(src, view, spec=spec, num_partitions=4)
    assert lin.num_rows == 0
    pos_path = f"{view}/_feed_pos.json"
    st = get_storage(view)
    pos = read_json(st, pos_path)
    write_json_atomic(
        st, pos_path, {"snapshot": None, "pending": pos["snapshot"]}
    )
    maintain_extrema(src, view, spec=spec, num_partitions=4)
    assert view_state() == {"c1": (0, 5, 2)}


def test_maintain_extrema_wrong_partition_key_raises(ray_session, tmp_path):
    from raycdc.engine import maintain_extrema

    spec = TableSpec(num_partitions=4)
    src = str(tmp_path / "src")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=50, seed=1)), src, spec
    )
    with pytest.raises(ValueError, match="partition pruning"):
        maintain_extrema(src, str(tmp_path / "v"), group_col="role", spec=spec)


def test_extrema_cli_smoke(ray_session, tmp_path, capsys):
    from raycdc.__main__ import main

    spec = TableSpec(num_partitions=4)
    src = str(tmp_path / "src")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=300, seed=172)),
        src,
        spec,
    )
    rc = main(
        ["extrema", src, str(tmp_path / "view"), "--group", "conv_id",
         "--value", "turn_idx", "--partitions", "4"]
    )
    assert rc == 0
    assert "applied_partitions" in capsys.readouterr().out
