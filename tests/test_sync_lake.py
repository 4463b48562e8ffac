"""Incremental same-layout lake replication (engine.sync_lake).

The replica carries the source's layout spec and checkpoint payloads, so
it is a full lake: steady-state syncs are metadata no-ops, incremental
syncs copy only touched partitions, and after a failover replay can
continue applying WAL segments to the replica exactly-once.  (The
reference delegates durability to BigQuery, /root/reference/loader.go:45-57;
a self-hosted lake needs its own replication story.)
"""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import replay, sync_lake
from raycdc.schema import TableSpec

from .oracle import lake_state, python_lww_replay


def test_sync_initial_noop_incremental_and_failover(tmp_path):
    base = synthetic_changelog(n_events=1600, seed=71, p_delete=0.15)
    head = base.filter(pc.less(base["lsn"], 800))
    mid = base.filter(
        pc.and_(pc.greater_equal(base["lsn"], 800), pc.less(base["lsn"], 1200))
    )
    tail = base.filter(pc.greater_equal(base["lsn"], 1200))

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    spec = TableSpec(num_partitions=8)
    replay(ray.data.from_arrow(head), src, spec)

    # initial sync copies everything src has
    lin = sync_lake(src, dst, spec)
    assert set(lin["status"].to_pylist()) <= {"copied", "empty"}
    assert lake_state(dst) == lake_state(src)

    # steady state: pure no-op
    lin = sync_lake(src, dst, spec)
    assert set(lin["status"].to_pylist()) <= {"noop", "empty"}

    # incremental: only partitions the mid segment touched are re-copied
    rep = replay(ray.data.from_arrow(mid), src, spec)
    touched = {
        p
        for p, s in zip(rep["part"].to_pylist(), rep["status"].to_pylist())
        if s != "noop"
    }
    lin = sync_lake(src, dst, spec)
    copied = {
        p
        for p, s in zip(lin["part"].to_pylist(), lin["status"].to_pylist())
        if s == "copied"
    }
    assert copied == touched
    assert lake_state(dst) == lake_state(src)

    # FAILOVER: keep applying the WAL directly to the replica — the copied
    # checkpoints make it exactly-once (redelivering mid is a no-op, tail
    # applies) and the final state equals the full-log oracle
    lin = replay(ray.data.from_arrow(mid), dst, spec)
    assert set(lin["status"].to_pylist()) == {"noop"}
    replay(ray.data.from_arrow(tail), dst, spec)
    expect = {k: r["text"] for k, r in python_lww_replay([base]).items()}
    assert lake_state(dst) == expect


def test_sync_cli(tmp_path, capsys):
    import json

    from raycdc.__main__ import main

    t = synthetic_changelog(n_events=600, seed=72)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    replay(ray.data.from_arrow(t), src, TableSpec(num_partitions=4))
    assert main(["sync", src, dst]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["copied"] == 4
    assert lake_state(dst) == lake_state(src)


def test_sync_across_storage_backends(tmp_path):
    """The copy goes through the storage interface: a POSIX-backed source
    replicates into an fsspec-backed (file://) replica, and the replica
    reads back identically."""
    t = synthetic_changelog(n_events=500, seed=73)
    src = str(tmp_path / "src")
    dst = "file://" + str(tmp_path / "dst")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(t), src, spec)
    lin = sync_lake(src, dst, spec)
    assert lin["status"].to_pylist().count("copied") >= 1

    from raycdc.engine import read_lake

    got = read_lake(dst, spec).to_pandas()
    expect = python_lww_replay([t])
    assert {
        (r.conv_id, r.turn_idx): r.text for r in got.itertuples()
    } == {k: r["text"] for k, r in expect.items()}
