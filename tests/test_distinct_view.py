"""Incrementally maintained approximate-distinct view (maintain_distinct)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import maintain_distinct, replay
from raycdc.schema import TableSpec
from raycdc.storage import get_storage, read_json

SPEC = dict(group_col="role", value_col="conv_id")


def _as_dict(t: pa.Table) -> dict:
    return dict(zip(t["role"].to_pylist(), t["n_distinct"].to_pylist()))


def test_incremental_equals_boundary_union_reference(ray_session, tmp_path):
    """The maintained view's estimates must EXACTLY equal HLL over the
    union of (group, value) pairs live at ANY refresh boundary — the
    grow-only "distinct ever seen" contract, computed independently from
    python LWW prefix states (register max-merge is order- and
    multiplicity-insensitive, so identical value sets mean identical
    registers and identical estimates).  The fixture has deletes AND
    group-reassigning updates (role = lsn % 3), both of which make a
    naive from-scratch rebuild legitimately smaller."""
    from raycdc.sketch import hll_estimate, hll_registers

    from .oracle import python_lww_replay

    log = synthetic_changelog(n_events=1500, n_convs=120, seed=160)
    spec = TableSpec(num_partitions=4)
    src_inc = str(tmp_path / "src_inc")
    view_inc = str(tmp_path / "view_inc")

    cuts = ((0, 500), (500, 1000), (1000, 1500))
    for lo, hi in cuts:
        seg = log.filter(
            pc.and_(pc.greater_equal(log["lsn"], lo), pc.less(log["lsn"], hi))
        )
        replay(ray.data.from_arrow(seg), src_inc, spec)
        est = maintain_distinct(src_inc, view_inc, **SPEC, spec=spec)

    # reference: (role, conv_id) pairs present in any prefix LWW state
    pairs: set = set()
    for _, hi in cuts:
        state = python_lww_replay([log.filter(pc.less(log["lsn"], hi))])
        for (conv, _turn), row in state.items():
            pairs.add((row["role"], conv))
    expect = {}
    for g in sorted({p[0] for p in pairs}):
        vals = pa.array(sorted(v for r, v in pairs if r == g))
        expect[g] = int(round(hll_estimate(hll_registers(vals))))
    got = _as_dict(est)
    assert got == expect

    # and the estimate tracks the exact pair count within the envelope
    rse = 1.04 / np.sqrt(1 << 12)
    for g, e in expect.items():
        exact_g = len({v for r, v in pairs if r == g})
        assert abs(got[g] - exact_g) <= max(5, 6 * rse * exact_g)


def test_steady_state_noop_and_redelivery(ray_session, tmp_path):
    log = synthetic_changelog(n_events=600, seed=161)
    spec = TableSpec(num_partitions=4)
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    replay(ray.data.from_arrow(log), src, spec)
    est1 = _as_dict(maintain_distinct(src, view, **SPEC, spec=spec))
    # no source change: refresh is a metadata-only noop, estimates stable
    est2 = _as_dict(maintain_distinct(src, view, **SPEC, spec=spec))
    assert est1 == est2

    # crash-retry: reinstate the pending claim and re-run — max-merge
    # idempotence + the lsn claim must converge to the same registers
    pos_path = f"{view}/_feed_pos.json"
    st = get_storage(view)
    pos = read_json(st, pos_path)
    from raycdc.storage import write_json_atomic

    write_json_atomic(
        st, pos_path, {"snapshot": None, "pending": pos["snapshot"]}
    )
    est3 = _as_dict(maintain_distinct(src, view, **SPEC, spec=spec))
    assert est3 == est1
    # and the pending claim was promoted
    assert read_json(st, pos_path).get("pending") is None


def test_deletes_only_feed_keeps_estimates(ray_session, tmp_path):
    """A refresh whose feed carries ONLY deletes must leave every group's
    estimate in place (grow-only), not return an empty table."""
    log = synthetic_changelog(n_events=400, seed=163, p_delete=0.0)
    spec = TableSpec(num_partitions=4)
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    replay(ray.data.from_arrow(log), src, spec)
    est1 = _as_dict(maintain_distinct(src, view, **SPEC, spec=spec))
    # delete one existing key -> the next feed is deletes-only
    state = log.to_pylist()[0]
    import datetime as dt

    d = pa.table(
        {
            "conv_id": pa.array([state["conv_id"]]),
            "turn_idx": pa.array([state["turn_idx"]], pa.int32()),
            "role": pa.array([state["role"]]),
            "text": pa.array([""]),
            "tool": pa.array([""]),
            "ts": pa.array([dt.datetime(2030, 1, 1)], pa.timestamp("us")),
            "op": pa.array(["delete"]),
            "lsn": pa.array([10_000], pa.int64()),
        }
    )
    replay(ray.data.from_arrow(d), src, spec)
    est2 = _as_dict(maintain_distinct(src, view, **SPEC, spec=spec))
    assert est2 == est1


def test_null_group_values_raise(ray_session, tmp_path):
    import datetime as dt
    import pytest

    spec = TableSpec(num_partitions=4)
    src = str(tmp_path / "src")
    t = pa.table(
        {
            "conv_id": pa.array(["c1"]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array([None], pa.string()),
            "text": pa.array(["x"]),
            "tool": pa.array([""]),
            "ts": pa.array([dt.datetime(2024, 1, 1)], pa.timestamp("us")),
            "op": pa.array(["insert"]),
            "lsn": pa.array([0], pa.int64()),
        }
    )
    replay(ray.data.from_arrow(t), src, spec)
    with pytest.raises(Exception, match="null group"):
        maintain_distinct(src, str(tmp_path / "view"), **SPEC, spec=spec)


def test_distinct_cli_smoke(ray_session, tmp_path, capsys):
    from raycdc.__main__ import main

    log = synthetic_changelog(n_events=400, seed=162)
    spec = TableSpec(num_partitions=4)
    src = str(tmp_path / "src")
    replay(ray.data.from_arrow(log), src, spec)
    assert (
        main(
            [
                "distinct", src, str(tmp_path / "view"),
                "--group", "role", "--value", "conv_id",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert '"user"' in out


def test_grow_only_deletes_do_not_decrement(ray_session, tmp_path):
    spec = TableSpec(num_partitions=4)
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    import datetime as dt

    def seg(rows, lsn0):
        n = len(rows)
        return pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows]),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "role": pa.array([r[2] for r in rows]),
                "text": pa.array([r[3] for r in rows]),
                "tool": pa.array([""] * n),
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1, 0, 0, i) for i in range(n)],
                    pa.timestamp("us"),
                ),
                "op": pa.array([r[4] for r in rows]),
                "lsn": pa.array(
                    np.arange(lsn0, lsn0 + n, dtype=np.int64)
                ),
            }
        )

    replay(
        ray.data.from_arrow(
            seg(
                [
                    ("c1", 0, "user", "hi", "insert"),
                    ("c2", 0, "user", "yo", "insert"),
                ],
                0,
            )
        ),
        src,
        spec,
    )
    est1 = _as_dict(maintain_distinct(src, view, **SPEC, spec=spec))
    assert est1["user"] == 2
    # delete one conversation: the view must NOT decrement
    replay(
        ray.data.from_arrow(seg([("c2", 0, "user", "", "delete")], 2)),
        src,
        spec,
    )
    est2 = _as_dict(maintain_distinct(src, view, **SPEC, spec=spec))
    assert est2["user"] == 2


def test_high_cardinality_groups_contract_edge(ray_session, tmp_path):
    """~10k distinct groups (the bounded-groups contract's edge): the
    bucketed exchange must deliver ONE register row per group to the
    driver and the estimates must equal the per-group HLL reference —
    this is the scale the old per-group ``t.filter`` fold could not take."""
    from raycdc.sketch import hll_estimate, hll_registers

    n_groups = 10_000
    spec = TableSpec(num_partitions=8)
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    import datetime as dt

    n = 2 * n_groups  # two values per group
    conv = pa.array([f"g{i % n_groups:05d}" for i in range(n)])
    val = pa.array([f"v{i // n_groups}" for i in range(n)])
    t = pa.table(
        {
            "conv_id": conv,
            "turn_idx": pa.array(
                np.arange(n, dtype=np.int64).astype(np.int32) // n_groups,
                pa.int32(),
            ),
            "role": val,
            "text": pa.array(["x"] * n),
            "tool": pa.array([""] * n),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")
            ),
            "op": pa.array(["insert"] * n),
            "lsn": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    replay(ray.data.from_arrow(t), src, spec)
    est = maintain_distinct(
        src, view, group_col="conv_id", value_col="role", spec=spec
    )
    assert est.num_rows == n_groups
    got = dict(zip(est["conv_id"].to_pylist(), est["n_distinct"].to_pylist()))
    expect = int(
        round(hll_estimate(hll_registers(pa.array(["v0", "v1"]))))
    )
    assert set(got.values()) == {expect}
