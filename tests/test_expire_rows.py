"""Row-level retention (engine.expire_rows): TTL sweeps as compact-style
partition rewrites — the checkpoint's WAL position is untouched, so
post-expiry ingest applies exactly-once at exactly the positions the
source emits (the round-5 self-review data-loss scenario is the
regression test here)."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import expire_rows, read_lake, replay
from raycdc.schema import TableSpec

from .oracle import python_lww_replay


def _state(lake, spec):
    pdf = read_lake(lake, spec).to_pandas()
    return {(r.conv_id, r.turn_idx): r.ts for r in pdf.itertuples(index=False)}


def _mid_cutoff(live):
    all_ts = sorted(r["ts"] for r in live.values())
    return all_ts[len(all_ts) // 2]


def test_expire_removes_only_older_rows_and_renoops(ray_session, tmp_path):
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=600, seed=71, p_delete=0.1)
    replay(ray.data.from_arrow(log), lake, spec)

    live = python_lww_replay([log])
    cutoff = _mid_cutoff(live)

    lin = expire_rows(lake, cutoff, spec)
    assert int(pc.sum(lin["tombstones"]).as_py()) > 0
    got = _state(lake, spec)
    want = {k: r["ts"] for k, r in live.items() if r["ts"] >= cutoff}
    assert got == want

    # second sweep: nothing left below the cutoff — all partitions noop
    lin2 = expire_rows(lake, cutoff, spec)
    assert int(pc.sum(lin2["tombstones"]).as_py() or 0) == 0
    assert set(lin2["status"].to_pylist()) <= {"noop"}
    assert _state(lake, spec) == want


def test_expire_consumes_no_wal_positions(ray_session, tmp_path):
    """THE data-loss regression (round-5 self-review): after a sweep, the
    source's NEXT genuine event — at lsn = old max + 1 — must apply.  A
    tombstone-minting implementation stamped its deletes at that very
    position and silently checkpoint-pruned the real event."""
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=300, seed=72)
    replay(ray.data.from_arrow(log), lake, spec)
    live = python_lww_replay([log])
    cutoff = _mid_cutoff(live)
    expire_rows(lake, cutoff, spec)

    max_lsn = int(pc.max(log["lsn"]).as_py())
    nxt = pa.table(
        {
            "conv_id": pa.array(["brand-new-conv"]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["the next real event"]),
            "tool": pa.array([""]),
            "ts": pa.array([dt.datetime(2030, 1, 1)], pa.timestamp("us")),
            "op": pa.array(["insert"]),
            "lsn": pa.array(np.array([max_lsn + 1], np.int64)),
        }
    )
    lin = replay(ray.data.from_arrow(nxt), lake, spec)
    assert int(pc.sum(lin["rows_applied"]).as_py()) == 1
    assert ("brand-new-conv", 0) in _state(lake, spec)


def test_expire_redelivery_stays_expired_fresh_event_is_cadence(
    ray_session, tmp_path
):
    """At-least-once semantics: a REDELIVERED copy of an expired row
    (lsn at or below the checkpoint) is exactly-once-pruned and stays
    expired; a genuinely NEW event (fresh lsn) with an old event time
    re-inserts, and the NEXT sweep expires it — retention is a cadence,
    not a wall."""
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=300, seed=73)
    replay(ray.data.from_arrow(log), lake, spec)
    live = python_lww_replay([log])
    cutoff = _mid_cutoff(live)
    expire_rows(lake, cutoff, spec)
    want = {k: r["ts"] for k, r in live.items() if r["ts"] >= cutoff}

    # full redelivery of the original log: checkpoint-pruned, state fixed
    replay(ray.data.from_arrow(log), lake, spec)
    assert _state(lake, spec) == want

    # a NEW event (fresh lsn) carrying a pre-cutoff event time re-inserts
    expired_key = next(k for k, r in live.items() if r["ts"] < cutoff)
    late = log.filter(
        pc.and_(
            pc.equal(log["conv_id"], expired_key[0]),
            pc.equal(log["turn_idx"], expired_key[1]),
        )
    ).slice(0, 1)
    max_lsn = int(pc.max(log["lsn"]).as_py())
    late = late.set_column(
        late.schema.get_field_index("lsn"),
        "lsn",
        pa.array(np.array([max_lsn + 50], np.int64)),
    )
    late = late.set_column(
        late.schema.get_field_index("op"), "op", pa.array(["insert"])
    )
    replay(ray.data.from_arrow(late), lake, spec)
    assert expired_key in _state(lake, spec)  # re-inserted (cadence)
    expire_rows(lake, cutoff, spec)  # next sweep takes it out again
    assert _state(lake, spec) == want


def test_expire_refuses_non_lww(ray_session, tmp_path):
    spec = TableSpec(num_partitions=4, merge_policy="history")
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=100, seed=74)
    order = pc.sort_indices(
        log, sort_keys=[("ts", "ascending"), ("lsn", "ascending")]
    )
    replay(ray.data.from_arrow(log.take(order)), lake, spec)
    with pytest.raises(ValueError, match="lww"):
        expire_rows(lake, dt.datetime(2030, 1, 1), spec)


def test_expire_unreplayed_lake_raises(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError, match="not a replayed lake"):
        expire_rows(str(tmp_path / "nope"), dt.datetime(2030, 1, 1))


def test_expire_versions_move_forward_snapshot_restorable(ray_session, tmp_path):
    """The sweep publishes NEW versions: the pre-expiry snapshot stays
    time-travelable and restore_lake undoes an over-eager sweep."""
    from raycdc.engine import restore_lake
    from raycdc.sink import list_snapshots

    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=300, seed=75)
    replay(ray.data.from_arrow(log), lake, spec)
    before = _state(lake, spec)
    snap = list_snapshots(lake)[-1]
    expire_rows(lake, dt.datetime(2200, 1, 1), spec)  # expires everything
    assert _state(lake, spec) == {}
    restore_lake(lake, snap, spec)
    assert _state(lake, spec) == before


def test_expire_cli_smoke(ray_session, tmp_path, capsys):
    import json

    from raycdc.__main__ import main

    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=200, seed=76)
    replay(ray.data.from_arrow(log), lake, spec)
    rc = main(["expire", "--lake", lake, "--older-than", "2200-01-01T00:00:00",
               "--partitions", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_expired"] > 0  # far-future cutoff expires everything
    assert _state(lake, spec) == {}


def test_expire_torn_sweep_checkpoint_is_commit_point(ray_session, tmp_path):
    """Partial-failure drill: expire_part writes the new data file, THEN
    the checkpoint — a crash between the two (simulated by installing a
    next-version file without its checkpoint) must leave readers on the
    OLD version (the checkpoint pointer IS the commit point), keep fsck
    green, and a re-run of the sweep must overwrite the orphan atomically
    and converge to the clean expired state."""
    from raycdc import sink as S
    from raycdc.engine import verify_lake

    spec = TableSpec(num_partitions=2)
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=400, seed=73, p_delete=0.1)
    replay(ray.data.from_arrow(log), lake, spec)
    live = python_lww_replay([log])
    cutoff = _mid_cutoff(live)
    before = _state(lake, spec)

    # the torn window, at the partition the sweep would touch first
    part = next(p for p in range(2) if S.read_partition(lake, p) is not None)
    ckpt = S.read_checkpoint(lake, part)
    existing = S.read_partition(lake, part)
    torn = existing.slice(0, max(1, len(existing) // 2))
    S.write_partition_atomic(
        torn, lake, part, version=ckpt.get("version", 0) + 1
    )

    # readers still serve the checkpointed version — nothing half-expired
    assert _state(lake, spec) == before
    fsck = verify_lake(lake, spec)
    assert set(fsck["status"].to_pylist()) <= {"ok"}

    # the retry sweeps into the SAME next version (old ckpt + 1): the
    # orphan file is atomically replaced, never merged with
    lin = expire_rows(lake, cutoff, spec)
    assert int(pc.sum(lin["tombstones"]).as_py()) > 0
    want = {k: r["ts"] for k, r in live.items() if r["ts"] >= cutoff}
    assert _state(lake, spec) == want
    new_ckpt = S.read_checkpoint(lake, part)
    assert new_ckpt["version"] == ckpt.get("version", 0) + 1
    assert new_ckpt["max_lsn"] == ckpt["max_lsn"]
    fsck2 = verify_lake(lake, spec)
    assert set(fsck2["status"].to_pylist()) <= {"ok"}


def test_expire_partial_sweep_then_full_converges(ray_session, tmp_path):
    """Crash BETWEEN partitions: one partition fully swept (file +
    checkpoint landed), the other untouched — the re-run must expire the
    remaining partition and re-sweeping the done one must noop (its
    doomed set is already empty)."""
    from raycdc import sink as S

    spec = TableSpec(num_partitions=2)
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=400, seed=74)
    replay(ray.data.from_arrow(log), lake, spec)
    live = python_lww_replay([log])
    cutoff = _mid_cutoff(live)

    # complete the sweep for ONE partition by hand (the kernel's exact
    # two writes), leaving the other partition pre-expiry
    part = next(p for p in range(2) if S.read_partition(lake, p) is not None)
    ckpt = S.read_checkpoint(lake, part)
    existing = S.read_partition(lake, part)
    doomed = pc.and_(
        pc.not_equal(pc.fill_null(existing["op"], ""), "delete"),
        pc.less(existing["ts"], pa.scalar(cutoff, existing["ts"].type)),
    )
    live_t = existing.filter(pc.invert(pc.fill_null(doomed, False)))
    nv = ckpt.get("version", 0) + 1
    S.write_partition_atomic(live_t, lake, part, version=nv)
    S.write_checkpoint(
        lake,
        part,
        {
            "max_lsn": ckpt["max_lsn"],
            "row_count": len(live_t),
            "content_hash": S.content_hash(live_t),
            "version": nv,
            "tombstones": int(
                pc.sum(
                    pc.equal(pc.fill_null(live_t["op"], ""), "delete")
                ).as_py()
                or 0
            ),
        },
    )

    lin = expire_rows(lake, cutoff, spec)
    by_part = {
        int(p): s
        for p, s in zip(lin["part"].to_pylist(), lin["status"].to_pylist())
    }
    assert by_part[part] == "noop"  # already swept: nothing doomed left
    want = {k: r["ts"] for k, r in live.items() if r["ts"] >= cutoff}
    assert _state(lake, spec) == want
