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


def test_change_feed_between_snapshots(tmp_path):
    """CDC OUT of the lake: the per-partition zero-shuffle diff between two
    recorded snapshots must equal the key-level difference of the two LWW
    states (inserts for new keys, deletes for vanished ones, updates for
    changed payloads — unchanged keys emit nothing)."""
    import ray

    from raycdc.engine import change_feed
    from raycdc.sink import write_snapshot

    base = synthetic_changelog(n_events=1200, seed=61, p_delete=0.2)
    head = base.filter(pc.less(base["lsn"], 600))
    tail = base.filter(pc.greater_equal(base["lsn"], 600))
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(head), lake, spec)
    s0 = write_snapshot(lake)
    replay(ray.data.from_arrow(tail), lake, spec)
    s1 = write_snapshot(lake)

    old = python_lww_replay([head])
    new = python_lww_replay([base])
    expect = {}
    for k in new.keys() - old.keys():
        expect[k] = ("insert", new[k]["text"])
    for k in old.keys() - new.keys():
        expect[k] = ("delete", old[k]["text"])  # payload = last-known values
    for k in new.keys() & old.keys():
        if any(new[k][c] != old[k][c] for c in ("role", "text", "tool", "ts")):
            expect[k] = ("update", new[k]["text"])

    for snap_to in (s1, None):  # explicit target and "current state"
        feed = change_feed(lake, s0, snap_to, spec)
        t = pa.concat_tables(
            [ray.get(r) for r in feed.to_arrow_refs()],
            promote_options="permissive",
        )
        got = {
            (c, ti): (op, tx)
            for c, ti, op, tx in zip(
                t["conv_id"].to_pylist(),
                t["turn_idx"].to_pylist(),
                t["op"].to_pylist(),
                t["text"].to_pylist(),
            )
        }
        assert got == expect

    # same-snapshot feed is empty
    empty = change_feed(lake, s1, s1, spec)
    assert empty.count() == 0


def test_change_feed_refuses_vacuumed_snapshot(tmp_path):
    """A feed source version pruned by vacuum must raise, not read as an
    empty state (which would fabricate an insert for every live key)."""
    import pytest
    import ray

    from raycdc.engine import change_feed
    from raycdc.sink import write_snapshot

    base = synthetic_changelog(n_events=800, seed=62)
    head = base.filter(pc.less(base["lsn"], 400))
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(head), lake, spec)
    s0 = write_snapshot(lake)
    replay(
        ray.data.from_arrow(base.filter(pc.greater_equal(base["lsn"], 400))),
        lake,
        spec,
    )
    s1 = write_snapshot(lake)
    # (a) vacuum that drops the s0 snapshot record entirely: loud failure
    vacuum(lake, keep_snapshots=1)
    with pytest.raises(FileNotFoundError, match="no snapshot"):
        change_feed(lake, s0, s1, spec)
    # (b) a snapshot record whose data FILE was pruned out from under it:
    # touch one partition (so its versions differ and the feed must read
    # it), then remove that partition's s1-era from-side file
    from raycdc.sink import part_file, read_snapshot

    replay(ray.data.from_arrow(head), lake, spec)  # no-op, versions stay
    v1 = read_snapshot(lake, s1)
    upd = pa.table(
        {
            "conv_id": pa.array(["conv-0"]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["x"]),
            "tool": pa.array([""]),
            "ts": pa.array([1_900_000_000_000_000], pa.timestamp("us")),
            "op": pa.array(["update"]),
            "lsn": pa.array([10_000_000], pa.int64()),
            "seg_id": pa.array([9], pa.int32()),
        }
    )
    rep = replay(ray.data.from_arrow(upd), lake, spec)
    part = next(
        p
        for p, st in zip(rep["part"].to_pylist(), rep["status"].to_pylist())
        if st != "noop"
    )
    os.remove(part_file(lake, part, v1[part]))
    feed = change_feed(lake, s1, None, spec)
    with pytest.raises(Exception, match="vacuumed|missing"):
        feed.count()


def test_snapshot_and_feed_cli(tmp_path, capsys):
    """End-to-end CLI: snapshot -> more replays -> feed between snapshots,
    written as parquet with per-op counts."""
    import json

    import ray

    from raycdc.__main__ import main

    base = synthetic_changelog(n_events=800, seed=63, p_delete=0.2)
    head = base.filter(pc.less(base["lsn"], 400))
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(head), lake, spec)

    assert main(["snapshot", "--lake", lake]) == 0
    s0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["snapshot"]

    replay(
        ray.data.from_arrow(base.filter(pc.greater_equal(base["lsn"], 400))),
        lake,
        spec,
    )
    out_dir = str(tmp_path / "feed")
    assert (
        main(
            [
                "feed", "--lake", lake, "--from-snapshot", str(s0),
                "--out", out_dir, "--include-old",
            ]
        )
        == 0
    )
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(res["events"]) <= {"insert", "update", "delete"}
    assert sum(res["events"].values()) > 0

    # the written feed matches the API's direct output
    import pyarrow.dataset as pads

    from raycdc.engine import change_feed

    written = pads.dataset(out_dir).to_table()
    direct = pa.concat_tables(
        [
            ray.get(r)
            for r in change_feed(
                lake, s0, None, spec, include_old=True
            ).to_arrow_refs()
        ]
    )
    assert written.num_rows == direct.num_rows
    assert "old_text" in written.column_names


def test_read_lake_predicate_pushdown(ray_session, tmp_path):
    """predicate pushes the row filter into the parquet scan (zone-map
    pruning) and must equal the post-hoc filter of a full read — alone,
    with column pruning, and against a time-travel snapshot."""
    import pyarrow.dataset as pds

    log = synthetic_changelog(n_events=800, seed=95)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(log.filter(pc.less(log["lsn"], 400))), lake, spec)
    snap = list_snapshots(lake)[-1]
    replay(ray.data.from_arrow(log.filter(pc.greater_equal(log["lsn"], 400))), lake, spec)

    full = read_lake(lake, spec).to_pandas()
    convs = sorted(full["conv_id"].unique())[:3]
    pred = pds.field("conv_id").isin(convs)

    got = read_lake(lake, spec, predicate=pred).to_pandas()
    want = full[full["conv_id"].isin(convs)]
    assert sorted(map(tuple, got[["conv_id", "turn_idx"]].values.tolist())) == sorted(
        map(tuple, want[["conv_id", "turn_idx"]].values.tolist())
    )

    # composes with column pruning (op col auto-added for the tombstone
    # filter then dropped) and with time travel
    cols = read_lake(
        lake, spec, columns=["conv_id", "text"], predicate=pred
    ).to_pandas()
    assert set(cols.columns) == {"conv_id", "text"}
    assert len(cols) == len(want)
    old_full = read_lake(lake, spec, as_of=snap).to_pandas()
    old_got = read_lake(lake, spec, as_of=snap, predicate=pred).to_pandas()
    assert len(old_got) == int(old_full["conv_id"].isin(convs).sum())


def test_storage_census_tracks_versions_and_vacuum(ray_session, tmp_path, capsys):
    """show --du: metadata-only census — rows match checkpoints, retained
    bytes shrink after vacuum while current bytes are unchanged."""
    from raycdc.__main__ import main
    from raycdc.sink import storage_census

    log = synthetic_changelog(n_events=600, seed=96)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    for lo, hi in ((0, 200), (200, 400), (400, 600)):
        part = log.filter(
            pc.and_(pc.greater_equal(log["lsn"], lo), pc.less(log["lsn"], hi))
        )
        replay(ray.data.from_arrow(part), lake, spec)

    c = storage_census(lake)
    assert c["partitions"] == 4
    assert c["data_file_versions"] > 4  # three applies retained history
    assert c["retained_bytes"] > c["current_bytes"] > 0
    assert c["snapshots"] == 3
    live = read_lake(lake, spec, with_tombstones=True).count()
    assert c["stored_rows"] == live

    vacuum(lake, keep_snapshots=1)
    c2 = storage_census(lake)
    assert c2["current_bytes"] == c["current_bytes"]
    assert c2["retained_bytes"] < c["retained_bytes"]
    assert c2["snapshots"] == 1

    assert main(["show", "--lake", lake, "--du"]) == 0
    out = capsys.readouterr().out
    assert '"stored_rows"' in out and '"retained_bytes"' in out
