"""Incremental aggregate-view maintenance (engine.maintain_rollup):
change_feed(include_old) -> signed before/after deltas -> additive replay.
The rollup must track the source lake's live state exactly across
incremental refreshes, redeliveries, updates, and deletes.
"""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import maintain_rollup, read_lake, replay
from raycdc.schema import TableSpec

from .oracle import python_lww_replay


def _derive(t: pa.Table) -> pa.Table:
    """n_turns=1 per live row; text_len = utf8 length of its text."""
    n = len(t)
    return pa.table(
        {
            "n_turns": pa.array([1] * n, pa.int64()),
            "text_len": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        }
    )


def _expected(live: dict) -> dict:
    out: dict = {}
    for (conv, _), row in live.items():
        n, ln = out.get(conv, (0, 0))
        out[conv] = (n + 1, ln + len(row["text"]))
    return out


def _rollup_state(lake: str) -> dict:
    t = pa.concat_tables(
        [
            ray.get(r)
            for r in read_lake(lake, with_tombstones=True).to_arrow_refs()
        ],
        promote_options="permissive",
    )
    return {
        c: (n, ln)
        for c, n, ln in zip(
            t["conv_id"].to_pylist(),
            t["n_turns"].to_pylist(),
            t["text_len"].to_pylist(),
        )
        if n != 0  # fully-deleted groups hold explicit zeros
    }


def test_rollup_tracks_source_across_refreshes(tmp_path):
    base = synthetic_changelog(n_events=1500, seed=91, p_delete=0.2)
    head = base.filter(pc.less(base["lsn"], 700))
    tail = base.filter(pc.greater_equal(base["lsn"], 700))
    src = str(tmp_path / "src")
    roll = str(tmp_path / "roll")
    spec = TableSpec(num_partitions=8)
    kw = dict(
        group_cols=("conv_id",),
        value_cols=("n_turns", "text_len"),
        spec=spec,
        num_partitions=4,
        derive=_derive,
    )

    # initial build (feed from the empty lake = all inserts)
    replay(ray.data.from_arrow(head), src, spec)
    maintain_rollup(src, roll, **kw)
    assert _rollup_state(roll) == _expected(python_lww_replay([head]))

    # steady state: a refresh with no source change must not move sums
    maintain_rollup(src, roll, **kw)
    assert _rollup_state(roll) == _expected(python_lww_replay([head]))

    # incremental: apply the tail (updates + deletes), refresh, re-check
    replay(ray.data.from_arrow(tail), src, spec)
    maintain_rollup(src, roll, **kw)
    assert _rollup_state(roll) == _expected(python_lww_replay([base]))

    # exactly-once under re-feed: run again twice, sums stay fixed
    maintain_rollup(src, roll, **kw)
    maintain_rollup(src, roll, **kw)
    assert _rollup_state(roll) == _expected(python_lww_replay([base]))


def test_rollup_cli_count(tmp_path, capsys):
    import json

    from raycdc.__main__ import main

    wal = synthetic_changelog(n_events=600, seed=92)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "roll")
    replay(ray.data.from_arrow(wal), src, TableSpec(num_partitions=4))
    assert (
        main(
            [
                "rollup", src, dst, "--group", "conv_id",
                "--count", "n_turns", "--partitions", "4",
            ]
        )
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_applied"] > 0

    live = python_lww_replay([wal])
    expect: dict = {}
    for (conv, _), _r in live.items():
        expect[conv] = expect.get(conv, 0) + 1
    t = pa.concat_tables(
        [
            __import__("ray").get(r)
            for r in read_lake(dst, with_tombstones=True).to_arrow_refs()
        ],
        promote_options="permissive",
    )
    got = {
        c: n
        for c, n in zip(t["conv_id"].to_pylist(), t["n_turns"].to_pylist())
        if n != 0
    }
    assert got == expect


def test_rollup_group_value_change_moves_contribution(tmp_path):
    """Group by a VALUE column (role): an update that changes a row's role
    must subtract its contribution from the old group and add it to the
    new one (the ±before/after fan-out path)."""
    import ray

    from raycdc.sink import part_file, read_checkpoint

    rows = {
        "conv_id": pa.array(["a", "a", "b"]),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": pa.array(["user", "user", "assistant"]),
        "text": pa.array(["one", "two", "three"]),
        "tool": pa.array(["", "", ""]),
        "ts": pa.array([1_000, 1_001, 1_002], pa.timestamp("us")),
        "op": pa.array(["insert"] * 3),
        "lsn": pa.array([0, 1, 2], pa.int64()),
        "seg_id": pa.array([0] * 3, pa.int32()),
    }
    src = str(tmp_path / "src")
    roll = str(tmp_path / "roll")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(pa.table(rows)), src, spec)

    kw = dict(
        group_cols=("role",),
        value_cols=("n_turns",),
        spec=spec,
        num_partitions=2,
        derive=lambda t: pa.table(
            {"n_turns": pa.array([1] * len(t), pa.int64())}
        ),
    )
    maintain_rollup(src, roll, **kw)

    def state() -> dict:
        t = pa.concat_tables(
            [
                ray.get(r)
                for r in read_lake(roll, with_tombstones=True).to_arrow_refs()
            ],
            promote_options="permissive",
        )
        return {
            r: n
            for r, n in zip(t["role"].to_pylist(), t["n_turns"].to_pylist())
            if n != 0
        }

    assert state() == {"user": 2, "assistant": 1}

    # ('a', 1) switches role user -> assistant
    upd = pa.table(
        {
            "conv_id": pa.array(["a"]),
            "turn_idx": pa.array([1], pa.int32()),
            "role": pa.array(["assistant"]),
            "text": pa.array(["two"]),
            "tool": pa.array([""]),
            "ts": pa.array([2_000], pa.timestamp("us")),
            "op": pa.array(["update"]),
            "lsn": pa.array([10], pa.int64()),
            "seg_id": pa.array([1], pa.int32()),
        }
    )
    replay(ray.data.from_arrow(upd), src, spec)
    maintain_rollup(src, roll, **kw)
    assert state() == {"user": 1, "assistant": 2}

    # and a delete removes its group's contribution entirely
    dele = upd.set_column(
        upd.schema.get_field_index("op"), "op", pa.array(["delete"])
    ).set_column(
        upd.schema.get_field_index("lsn"), "lsn", pa.array([11], pa.int64())
    ).set_column(
        upd.schema.get_field_index("ts"),
        "ts",
        pa.array([3_000], pa.timestamp("us")),
    )
    replay(ray.data.from_arrow(dele), src, spec)
    maintain_rollup(src, roll, **kw)
    assert state() == {"user": 1, "assistant": 1}
