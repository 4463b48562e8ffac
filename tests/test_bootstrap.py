"""Snapshot bootstrap (dump-then-tail): engine.bootstrap + replay resume.

The CDC onboarding path: a full-state snapshot taken at WAL position L0
initializes an empty lake; replay then consumes only events with lsn > L0,
and redelivered pre-L0 segments prune to no-ops.  Generalizes the
reference's per-event full-object load (/root/reference/extractor.go:16-37)
into load-once-then-tail.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import bootstrap, merged_state, read_lake, replay
from raycdc.schema import TableSpec
from raycdc.sink import read_all_checkpoints

from .oracle import lake_state as _lake_state, python_lww_replay


def _split(t: pa.Table, cut: int):
    head = t.filter(pc.less_equal(t["lsn"], cut))
    tail = t.filter(pc.greater(t["lsn"], cut))
    return head, tail


def _envelope_snapshot(head: pa.Table, spec: TableSpec) -> pa.Table:
    """Tombstone-carrying snapshot: the stored-lake representation."""
    ds = merged_state(
        ray.data.from_arrow(head), spec, keep_envelope=True, drop_deletes=False
    )
    import ray as _ray

    return pa.concat_tables([_ray.get(r) for r in ds.to_arrow_refs()])


def test_bootstrap_envelope_snapshot_plus_full_redelivery(tmp_path):
    """Tombstone-carrying snapshot at L0, then replay the WHOLE log: head
    must prune via the bootstrap checkpoints, tail must apply, and the
    final state must equal one-shot LWW over everything."""
    t = synthetic_changelog(n_events=2400, seed=31, shuffle=True)
    cut = 1200
    head, _ = _split(t, cut)
    spec = TableSpec(num_partitions=8)
    snap = _envelope_snapshot(head, spec)
    lake = str(tmp_path / "lake")

    lineage = bootstrap(ray.data.from_arrow(snap), lake, spec, snapshot_lsn=cut)
    assert set(lineage["status"].to_pylist()) == {"bootstrap"}
    assert lineage.num_rows == 8  # every partition reported, even empty ones
    ckpts = read_all_checkpoints(lake)
    assert set(ckpts) == set(range(8))
    assert all(v["max_lsn"] == cut for v in ckpts.values())

    replay(ray.data.from_arrow(t), lake, spec)  # total overlap redelivery
    expect = {k: r["text"] for k, r in python_lww_replay([t]).items()}
    assert _lake_state(lake) == expect


def test_bootstrap_head_redelivery_is_pure_noop(tmp_path):
    t = synthetic_changelog(n_events=1500, seed=32)
    cut = 900
    head, _ = _split(t, cut)
    spec = TableSpec(num_partitions=4)
    snap = _envelope_snapshot(head, spec)
    lake = str(tmp_path / "lake")
    bootstrap(ray.data.from_arrow(snap), lake, spec, snapshot_lsn=cut)

    lineage = replay(ray.data.from_arrow(head), lake, spec)
    assert set(lineage["status"].to_pylist()) == {"noop"}
    assert int(pc.sum(lineage["rows_applied"]).as_py()) == 0


def test_bootstrap_plain_snapshot_tail_only(tmp_path):
    """Database-dump mode: no envelope columns at all.  Valid because the
    synthetic fixture's event time is monotone with lsn (the documented
    plain-snapshot contract)."""
    t = synthetic_changelog(n_events=1800, seed=33)
    cut = 1100
    head, tail = _split(t, cut)
    spec = TableSpec(num_partitions=4)
    live = merged_state(
        ray.data.from_arrow(head), spec
    ).to_arrow_refs()  # live rows only, no op/lsn
    snap = pa.concat_tables([ray.get(r) for r in live])
    assert "op" not in snap.column_names and "lsn" not in snap.column_names

    lake = str(tmp_path / "lake")
    bootstrap(ray.data.from_arrow(snap), lake, spec, snapshot_lsn=cut)
    replay(ray.data.from_arrow(tail), lake, spec)
    expect = {k: r["text"] for k, r in python_lww_replay([t]).items()}
    assert _lake_state(lake) == expect


def test_bootstrap_empty_partitions_keep_deleted_keys_dead(tmp_path):
    """A key whose pre-snapshot history ends in delete is ABSENT from a
    plain snapshot; redelivering its old events must not resurrect it —
    the empty-partition checkpoints are what guarantee that."""
    head = pa.table(
        {
            "conv_id": ["conv-a", "conv-a"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user", "user"],
            "text": ["v0", "v0"],
            "tool": ["", ""],
            "ts": pa.array([1_000_000, 2_000_000], pa.timestamp("us")),
            "op": ["insert", "delete"],
            "lsn": pa.array([0, 1], pa.int64()),
        }
    )
    spec = TableSpec(num_partitions=4)
    live = merged_state(ray.data.from_arrow(head), spec)
    tbls = [ray.get(r) for r in live.to_arrow_refs()]
    snap = (
        pa.concat_tables(tbls)
        if tbls
        else head.drop_columns(["op", "lsn"]).slice(0, 0)
    )
    assert len(snap) == 0  # everything was deleted before the dump

    lake = str(tmp_path / "lake")
    lineage = bootstrap(ray.data.from_arrow(snap), lake, spec, snapshot_lsn=1)
    assert lineage.num_rows == 4 and set(lineage["status"].to_pylist()) == {
        "bootstrap"
    }
    redelivered = replay(ray.data.from_arrow(head), lake, spec)
    assert set(redelivered["status"].to_pylist()) == {"noop"}
    assert _lake_state(lake) == {}
    # a fully-empty lake has no partition files at all (checkpoint-only)
    with pytest.raises(FileNotFoundError):
        read_lake(lake, spec)


def test_bootstrap_refuses_nonempty_lake_and_history_policy(tmp_path):
    t = synthetic_changelog(n_events=300, seed=34)
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    replay(ray.data.from_arrow(t), lake, spec)
    with pytest.raises(ValueError, match="not empty"):
        bootstrap(ray.data.from_arrow(t), lake, spec, snapshot_lsn=0)
    with pytest.raises(ValueError, match="history"):
        bootstrap(
            ray.data.from_arrow(t),
            str(tmp_path / "h"),
            TableSpec(num_partitions=4, merge_policy="history"),
            snapshot_lsn=0,
        )


def test_merged_state_tombstones_require_envelope():
    t = synthetic_changelog(n_events=100, seed=35)
    with pytest.raises(ValueError, match="keep_envelope"):
        merged_state(ray.data.from_arrow(t), TableSpec(), drop_deletes=False)
