"""Snapshots / time travel / vacuum / point lookup."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import lookup, read_lake, replay
from raycdc.schema import TableSpec
from raycdc.sink import current_files, list_snapshots, vacuum

from .oracle import python_lww_replay


def _state_of(ds):
    pdf = ds.to_pandas()
    return {(r.conv_id, r.turn_idx): r.text for r in pdf.itertuples()}


def test_time_travel_reads_old_snapshot(ray_session, tmp_path):
    log = synthetic_changelog(n_events=1200, seed=90)
    first = log.filter(pc.less(log["lsn"], 600))
    second = log.filter(pc.greater_equal(log["lsn"], 600))
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)

    replay(ray.data.from_arrow(first), lake, spec)
    snaps1 = list_snapshots(lake)
    assert len(snaps1) == 1
    state_v1 = _state_of(read_lake(lake, spec))

    replay(ray.data.from_arrow(second), lake, spec)
    assert len(list_snapshots(lake)) == 2

    # current state reflects both halves
    expect_full = {k: r["text"] for k, r in python_lww_replay([log]).items()}
    assert _state_of(read_lake(lake, spec)) == expect_full

    # as_of the first snapshot reproduces the half-applied state exactly
    expect_half = {k: r["text"] for k, r in python_lww_replay([first]).items()}
    assert state_v1 == expect_half
    assert _state_of(read_lake(lake, spec, as_of=snaps1[0])) == expect_half


def test_vacuum_prunes_unreferenced_versions(ray_session, tmp_path):
    log = synthetic_changelog(n_events=900, seed=91)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    for lo, hi in ((0, 300), (300, 600), (600, 900)):
        part = log.filter(
            pc.and_(pc.greater_equal(log["lsn"], lo), pc.less(log["lsn"], hi))
        )
        replay(ray.data.from_arrow(part), lake, spec)
    n_files_before = sum(
        len([f for f in os.listdir(os.path.join(lake, d)) if f.endswith(".parquet")])
        for d in os.listdir(lake)
        if d.startswith("part=")
    )
    assert n_files_before > 4  # multiple versions accumulated

    state = _state_of(read_lake(lake, spec))
    removed = vacuum(lake, keep_snapshots=1)
    assert removed > 0
    # current state untouched; only the latest snapshot remains
    assert _state_of(read_lake(lake, spec)) == state
    assert len(list_snapshots(lake)) == 1
    assert len(current_files(lake)) <= 4


def test_point_lookup_single_partition(ray_session, tmp_path):
    log = synthetic_changelog(n_events=1000, seed=92)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=8)
    replay(ray.data.from_arrow(log), lake, spec)
    expect = python_lww_replay([log])
    convs = {k[0] for k in expect}
    conv = sorted(convs)[0]
    t = lookup(lake, conv, spec)
    got = {
        (c, i): x
        for c, i, x in zip(
            t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(), t["text"].to_pylist()
        )
    }
    assert got == {k: r["text"] for k, r in expect.items() if k[0] == conv}
    # single-turn variant
    some_turn = next(iter(got))[1]
    t1 = lookup(lake, conv, spec, turn_idx=some_turn)
    assert len(t1) == 1 and t1["text"][0].as_py() == got[(conv, some_turn)]
    # missing conversation → empty, not an error
    assert len(lookup(lake, "no-such-conv", spec)) == 0
