"""Regression tests for the round-2 advisor findings (ADVICE.md):

1. maintain_rollup exactly-once under the crash window between the
   additive replay and the _feed_pos.json promotion (pending snapshot id
   is claimed before the replay and reused on retry).
2. Bootstrapped lakes with untouched (checkpoint-only, version=-1)
   partitions must not crash change_feed / sync_lake / maintain_rollup.
3. Bootstrap atomicity: a _bootstrap_pending marker makes replay refuse a
   half-initialized lake while allowing re-bootstrap.
4. read_dead_letters concatenates the batch-/late- queues per prefix, so
   a schema conflict between the two queues leaves each inspectable.
"""

import datetime
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import (
    bootstrap,
    change_feed,
    maintain_rollup,
    read_dead_letters,
    read_lake,
    replay,
    sync_lake,
)
from raycdc.schema import TableSpec
from raycdc.sink import (
    bootstrap_marker_file,
    bootstrap_pending,
    read_all_checkpoints,
    write_snapshot,
)
from raycdc.storage import get_storage, write_json_atomic

from .oracle import python_lww_replay


def _derive(t: pa.Table) -> pa.Table:
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
        [ray.get(r) for r in read_lake(lake, with_tombstones=True).to_arrow_refs()],
        promote_options="permissive",
    )
    return {
        c: (n, ln)
        for c, n, ln in zip(
            t["conv_id"].to_pylist(),
            t["n_turns"].to_pylist(),
            t["text_len"].to_pylist(),
        )
        if n != 0
    }


_KW = dict(
    group_cols=("conv_id",),
    value_cols=("n_turns", "text_len"),
    num_partitions=4,
    derive=_derive,
)


def _pos(roll: str) -> dict:
    with open(os.path.join(roll, "_feed_pos.json")) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# 1. rollup crash-window exactly-once


def test_rollup_retry_after_crash_between_replay_and_promote(tmp_path):
    """Simulate a crash AFTER the additive replay landed but BEFORE the
    position promotion: the retry must reuse the pending snapshot id, so
    the re-fed deltas prune instead of double-counting."""
    base = synthetic_changelog(n_events=1500, seed=911, p_delete=0.2)
    head = base.filter(pc.less(base["lsn"], 700))
    tail = base.filter(pc.greater_equal(base["lsn"], 700))
    src, roll = str(tmp_path / "src"), str(tmp_path / "roll")
    spec = TableSpec(num_partitions=8)

    replay(ray.data.from_arrow(head), src, spec)
    maintain_rollup(src, roll, spec=spec, **_KW)
    pos_a = _pos(roll)

    replay(ray.data.from_arrow(tail), src, spec)
    maintain_rollup(src, roll, spec=spec, **_KW)
    pos_b = _pos(roll)
    good = _rollup_state(roll)
    assert good == _expected(python_lww_replay([base]))

    # rewind the position file to the crashed state: replay landed (it
    # did, above) but the promotion never happened
    st = get_storage(roll)
    write_json_atomic(
        st,
        os.path.join(roll, "_feed_pos.json"),
        {"snapshot": pos_a["snapshot"], "pending": pos_b["snapshot"]},
    )
    maintain_rollup(src, roll, spec=spec, **_KW)
    assert _rollup_state(roll) == good, "retry double-counted the feed"
    assert _pos(roll) == {"snapshot": pos_b["snapshot"]}


def test_rollup_retry_after_crash_before_replay_applies_once(tmp_path):
    """Crash AFTER the claim but BEFORE the replay: the retry must apply
    the claimed feed exactly once."""
    base = synthetic_changelog(n_events=1200, seed=912, p_delete=0.15)
    head = base.filter(pc.less(base["lsn"], 600))
    tail = base.filter(pc.greater_equal(base["lsn"], 600))
    src, roll = str(tmp_path / "src"), str(tmp_path / "roll")
    spec = TableSpec(num_partitions=8)

    replay(ray.data.from_arrow(head), src, spec)
    maintain_rollup(src, roll, spec=spec, **_KW)
    pos_a = _pos(roll)

    # source advances; the claim is written (snapshot minted) but the
    # refresh "crashes" before any replay
    replay(ray.data.from_arrow(tail), src, spec)
    claimed = write_snapshot(src)
    write_json_atomic(
        get_storage(roll),
        os.path.join(roll, "_feed_pos.json"),
        {"snapshot": pos_a["snapshot"], "pending": claimed},
    )
    maintain_rollup(src, roll, spec=spec, **_KW)
    assert _rollup_state(roll) == _expected(python_lww_replay([base]))
    assert _pos(roll) == {"snapshot": claimed}


def test_rollup_pending_snapshot_vanished_fails_loudly(tmp_path):
    base = synthetic_changelog(n_events=400, seed=913)
    src, roll = str(tmp_path / "src"), str(tmp_path / "roll")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(base), src, spec)
    maintain_rollup(src, roll, spec=spec, **_KW)
    write_json_atomic(
        get_storage(roll),
        os.path.join(roll, "_feed_pos.json"),
        {"snapshot": _pos(roll)["snapshot"], "pending": 9999},
    )
    with pytest.raises(FileNotFoundError, match="pending snapshot"):
        maintain_rollup(src, roll, spec=spec, **_KW)


# ---------------------------------------------------------------------------
# 2. bootstrapped lake with untouched partitions


def _tiny_plain_snapshot() -> pa.Table:
    """One-key snapshot: fills exactly one of the hash partitions, leaving
    the rest as checkpoint-only (version=-1) bootstrap entries."""
    return pa.table(
        {
            "conv_id": ["conv-empty-parts"],
            "turn_idx": pa.array([0], pa.int64()),
            "role": ["user"],
            "text": ["hello"],
            "tool": [""],
            "ts": pa.array([datetime.datetime(2024, 1, 1)], pa.timestamp("us")),
        }
    )


def test_bootstrapped_empty_partitions_feed_sync_rollup(tmp_path):
    src = str(tmp_path / "src")
    spec = TableSpec(num_partitions=8)
    bootstrap(ray.data.from_arrow(_tiny_plain_snapshot()), src, spec, snapshot_lsn=5)
    ckpts = read_all_checkpoints(src)
    assert any(c.get("version", 0) < 0 for c in ckpts.values()), (
        "fixture must actually exercise checkpoint-only partitions"
    )

    # initial-load change feed: one insert, no FileNotFoundError
    feed = change_feed(src, None, spec=spec).take_all()
    assert len(feed) == 1 and feed[0]["op"] == "insert"

    # replica sync: empty partitions copy checkpoint-only, with the
    # max_lsn floor preserved for failover replay
    dst = str(tmp_path / "dst")
    lineage = sync_lake(src, dst, spec)
    statuses = dict(zip(lineage["part"].to_pylist(), lineage["status"].to_pylist()))
    assert "empty" in set(statuses.values()) and "copied" in set(statuses.values())
    dckpts = read_all_checkpoints(dst)
    assert set(dckpts) == set(range(8))
    assert all(c["max_lsn"] == 5 for c in dckpts.values())
    # the replica is replay-capable: a pre-snapshot redelivery is a no-op
    from raycdc.changelog import CHANGELOG_SCHEMA

    old = pa.Table.from_pylist(
        [
            {
                "conv_id": "conv-empty-parts",
                "turn_idx": 0,
                "role": "user",
                "text": "pre-snapshot",
                "tool": "",
                "ts": datetime.datetime(2023, 1, 1),
                "op": "update",
                "lsn": 3,
                "seg_id": 0,
            }
        ],
        schema=CHANGELOG_SCHEMA,
    )
    rl = replay(ray.data.from_arrow(old), dst, spec)
    assert int(pc.sum(rl["rows_applied"]).as_py()) == 0

    # incremental aggregate over the bootstrapped lake
    roll = str(tmp_path / "roll")
    maintain_rollup(src, roll, spec=spec, **_KW)
    assert _rollup_state(roll) == {"conv-empty-parts": (1, 5)}


# ---------------------------------------------------------------------------
# 3. bootstrap atomicity marker


def test_half_bootstrapped_lake_refuses_replay_allows_reinit(tmp_path):
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    snap = _tiny_plain_snapshot()
    bootstrap(ray.data.from_arrow(snap), lake, spec, snapshot_lsn=5)
    assert not bootstrap_pending(lake)  # completed run clears the marker

    # simulate a mid-bootstrap crash: marker present over existing metadata
    write_json_atomic(get_storage(lake), bootstrap_marker_file(lake), {"lsn": 5})
    with pytest.raises(RuntimeError, match="unfinished bootstrap"):
        replay(ray.data.from_arrow(synthetic_changelog(n_events=10)), lake, spec)

    # re-bootstrap is allowed on the half lake, completes, clears the marker
    bootstrap(ray.data.from_arrow(snap), lake, spec, snapshot_lsn=5)
    assert not bootstrap_pending(lake)
    assert read_lake(lake, spec).count() == 1


def test_bootstrap_still_refuses_completed_lake(tmp_path):
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    bootstrap(ray.data.from_arrow(_tiny_plain_snapshot()), lake, spec, snapshot_lsn=5)
    with pytest.raises(ValueError, match="not empty"):
        bootstrap(ray.data.from_arrow(_tiny_plain_snapshot()), lake, spec)


# ---------------------------------------------------------------------------
# 4. dead-letter queues with conflicting schemas


def test_read_dead_letters_per_prefix_survives_schema_conflict(tmp_path):
    d = str(tmp_path / "dlq")
    st = get_storage(d)
    st.write_parquet_atomic(
        pa.table({"v": pa.array(["a", "b"])}), os.path.join(d, "batch-01.parquet")
    )
    st.write_parquet_atomic(
        pa.table({"v": pa.array([1, 2], pa.int64())}),
        os.path.join(d, "late-01.parquet"),
    )
    assert read_dead_letters(d, prefix="batch").num_rows == 2
    assert read_dead_letters(d, prefix="late").num_rows == 2
    with pytest.raises(ValueError, match="incompatible schemas"):
        read_dead_letters(d)


def test_read_dead_letters_compatible_queues_still_concat(tmp_path):
    d = str(tmp_path / "dlq")
    st = get_storage(d)
    st.write_parquet_atomic(
        pa.table({"v": pa.array([1], pa.int32())}), os.path.join(d, "batch-01.parquet")
    )
    st.write_parquet_atomic(
        pa.table({"v": pa.array([2], pa.int64())}), os.path.join(d, "late-01.parquet")
    )
    t = read_dead_letters(d)
    assert t.num_rows == 2 and t["v"].type == pa.int64()
    assert read_dead_letters(d, prefix="batch").num_rows == 1
