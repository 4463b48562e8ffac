"""Exactly-once lake replay: idempotence, resume, deletes, schema evolution."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import read_lake, replay
from raycdc.schema import TableSpec
from raycdc.sink import current_files, read_all_checkpoints

from .oracle import lake_state as _lake_state, python_lww_replay




def _lake_bytes(lake_dir):
    out = {}
    for p in current_files(lake_dir):
        with open(p, "rb") as f:
            out[os.path.relpath(p, lake_dir)] = f.read()
    return out


def test_replay_full_and_state_matches_oracle(tmp_path):
    t = synthetic_changelog(n_events=2000, seed=21, shuffle=True)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=8)
    lineage = replay(ray.data.from_arrow(t), lake, spec)
    assert lineage.num_rows <= 8
    assert set(lineage["status"].to_pylist()) == {"applied"}
    expect = {k: r["text"] for k, r in python_lww_replay([t]).items()}
    assert _lake_state(lake) == expect
    # checkpoints advanced: the max over partitions equals the log's max lsn
    ckpts = read_all_checkpoints(lake)
    assert max(v["max_lsn"] for v in ckpts.values()) == 1999
    assert all(v["max_lsn"] >= 0 for v in ckpts.values())
    # read_lake returns the live rows
    n_live = read_lake(lake, spec).count()
    assert n_live == len(expect)


def test_redelivery_is_noop_byte_identical(tmp_path):
    t = synthetic_changelog(n_events=1200, seed=22)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(t), lake, spec)
    before = _lake_bytes(lake)
    lineage2 = replay(ray.data.from_arrow(t), lake, spec)  # same segments again
    assert set(lineage2["status"].to_pylist()) == {"noop"}
    assert int(pa.compute.sum(lineage2["rows_applied"]).as_py()) == 0
    assert _lake_bytes(lake) == before  # byte-for-byte identical lake


def test_incremental_apply_in_lsn_splits(tmp_path):
    t = synthetic_changelog(n_events=1800, seed=23, shuffle=False)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    first = t.filter(pa.compute.less(t["lsn"], 900))
    second = t.filter(pa.compute.greater_equal(t["lsn"], 900))
    replay(ray.data.from_arrow(first), lake, spec)
    replay(ray.data.from_arrow(second), lake, spec)
    expect = {k: r["text"] for k, r in python_lww_replay([t]).items()}
    assert _lake_state(lake) == expect


def test_stale_redelivery_cannot_resurrect_deleted_keys(tmp_path):
    """Replaying an OLD segment after a delete was applied must be a no-op:
    the ckpt filter plus stored tombstones guarantee it."""
    t = synthetic_changelog(n_events=800, seed=24)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(t), lake, spec)
    state_after = _lake_state(lake)
    old_segment = t.filter(pa.compute.less(t["lsn"], 400))
    lineage = replay(ray.data.from_arrow(old_segment), lake, spec)
    assert set(lineage["status"].to_pylist()) == {"noop"}
    assert _lake_state(lake) == state_after


def test_schema_evolution_across_segments(tmp_path):
    base = synthetic_changelog(n_events=600, seed=25)
    evolved = synthetic_changelog(n_events=1200, seed=25, evolve_from_lsn=600)
    later = evolved.filter(pa.compute.greater_equal(evolved["lsn"], 600))
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(base), lake, spec)
    replay(ray.data.from_arrow(later), lake, spec)
    merged = pa.concat_tables(
        [pq.read_table(p) for p in current_files(lake)],
        promote_options="default",
    )
    # additive column present, old rows null-backfilled; turn_idx widened
    assert "model" in merged.column_names
    assert merged.schema.field("turn_idx").type == pa.int64()
    by_lsn_model = dict(zip(merged["lsn"].to_pylist(), merged["model"].to_pylist()))
    assert all(m is None for l, m in by_lsn_model.items() if l < 600)
    assert all(m == "model-x" for l, m in by_lsn_model.items() if l >= 600)
    # state still matches the oracle over both logs
    expect = {
        k: r["text"]
        for k, r in python_lww_replay([base, later]).items()
    }
    assert _lake_state(lake) == expect


def test_schema_registry_tracks_evolution(tmp_path):
    """The lake-level schema registry (_schema.json) reflects the widened
    union of all partition schemas after heterogeneous applies."""
    import ray.data

    from raycdc.sink import read_lake_schema

    base = synthetic_changelog(n_events=400, seed=26)
    evolved = synthetic_changelog(n_events=800, seed=26, evolve_from_lsn=400)
    later = evolved.filter(pa.compute.greater_equal(evolved["lsn"], 400))
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)

    replay(ray.data.from_arrow(base), lake, spec)
    s1 = read_lake_schema(lake)
    assert s1 is not None
    assert "model" not in s1.names
    assert s1.field("turn_idx").type == pa.int32()

    replay(ray.data.from_arrow(later), lake, spec)
    s2 = read_lake_schema(lake)
    assert "model" in s2.names
    assert s2.field("turn_idx").type == pa.int64()
    assert s2.field("ts").type == pa.timestamp("us")
