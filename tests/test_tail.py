"""Continuous-tail semantics: incremental pickup, manifest crash window."""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from raycdc.changelog import synthetic_changelog
from raycdc.engine import read_lake, tail, tail_once
from raycdc.schema import TableSpec

from .oracle import python_lww_replay


def _write_seg(dir_, name, table):
    pq.write_table(table, os.path.join(dir_, name))


def test_tail_picks_up_only_new_segments(ray_session, tmp_path):
    watch = tmp_path / "wal"
    watch.mkdir()
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    log = synthetic_changelog(n_events=900, seed=80)
    first = log.filter(pc.less(log["lsn"], 300))
    second = log.filter(
        pc.and_(pc.greater_equal(log["lsn"], 300), pc.less(log["lsn"], 600))
    )
    third = log.filter(pc.greater_equal(log["lsn"], 600))

    _write_seg(str(watch), "seg-000.parquet", first)
    new, lineage = tail_once(str(watch), lake, spec)
    assert [os.path.basename(p) for p in new] == ["seg-000.parquet"]
    assert lineage is not None

    # nothing new → no replay at all
    new, lineage = tail_once(str(watch), lake, spec)
    assert new == [] and lineage is None

    _write_seg(str(watch), "seg-001.parquet", second)
    _write_seg(str(watch), "seg-002.parquet", third)
    new, lineage = tail_once(str(watch), lake, spec)
    assert len(new) == 2

    expect = {k: r["text"] for k, r in python_lww_replay([log]).items()}
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in read_lake(lake, spec).to_pandas().itertuples()
    }
    assert got == expect


def test_tail_manifest_crash_window_is_noop(ray_session, tmp_path):
    """Manifest lost after a replay (crash between replay and manifest
    write) → segments re-replayed next round as checkpoint-level noops."""
    watch = tmp_path / "wal"
    watch.mkdir()
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    log = synthetic_changelog(n_events=400, seed=81)
    _write_seg(str(watch), "seg-000.parquet", log)
    tail_once(str(watch), lake, spec)
    from .oracle import lake_state

    state = lake_state(lake)

    os.remove(os.path.join(lake, "_segments.jsonl"))  # simulated crash
    new, lineage = tail_once(str(watch), lake, spec)
    assert len(new) == 1
    assert set(lineage["status"].to_pylist()) == {"noop"}
    assert lake_state(lake) == state  # CONTENT identical, not just count


def test_tail_loop_rounds(ray_session, tmp_path):
    watch = tmp_path / "wal"
    watch.mkdir()
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=2)
    log = synthetic_changelog(n_events=200, seed=82)
    _write_seg(str(watch), "seg-000.parquet", log)
    seen = []
    total = tail(
        str(watch),
        lake,
        spec,
        rounds=2,
        interval_s=0.01,
        on_round=lambda i, new, lin: seen.append((i, len(new))),
    )
    assert total == 1
    assert seen == [(0, 1), (1, 0)]


def test_tail_pattern_with_directory_components(ray_session, tmp_path):
    """Patterns carrying directory components ("day=*/seg-*.parquet") must
    walk subdirectories — a basename-only match would silently ingest
    nothing, a permanent no-op of the loop."""
    watch = tmp_path / "wal"
    (watch / "day=2024-01-01").mkdir(parents=True)
    (watch / "day=2024-01-02").mkdir()
    (watch / "ignore").mkdir()
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=2)
    log = synthetic_changelog(n_events=300, seed=81)
    a = log.filter(pc.less(log["lsn"], 150))
    b = log.filter(pc.greater_equal(log["lsn"], 150))
    _write_seg(str(watch / "day=2024-01-01"), "seg-000.parquet", a)
    _write_seg(str(watch / "day=2024-01-02"), "seg-001.parquet", b)
    # decoys that must NOT match: wrong dir pattern, wrong file pattern
    _write_seg(str(watch / "ignore"), "seg-999.parquet", a)
    _write_seg(str(watch), "seg-root.parquet", a)

    new, lineage = tail_once(
        str(watch), lake, spec, pattern="day=*/seg-*.parquet"
    )
    assert sorted(os.path.basename(p) for p in new) == [
        "seg-000.parquet",
        "seg-001.parquet",
    ]
    assert lineage is not None
    expect = {k: r["text"] for k, r in python_lww_replay([log]).items()}
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in read_lake(lake, spec).to_pandas().itertuples()
    }
    assert got == expect
    # idempotent second round
    new, lineage = tail_once(
        str(watch), lake, spec, pattern="day=*/seg-*.parquet"
    )
    assert new == [] and lineage is None


def test_tail_sync_to_keeps_replica_in_lockstep(ray_session, tmp_path):
    """tail(sync_to=...) incrementally replicates after every round that
    applied segments; rounds with no new segments skip the sync."""
    from .oracle import lake_state

    watch = tmp_path / "wal"
    watch.mkdir()
    lake = str(tmp_path / "lake")
    replica = str(tmp_path / "replica")
    spec = TableSpec(num_partitions=4)
    log = synthetic_changelog(n_events=900, seed=81)
    _write_seg(str(watch), "seg-0.parquet", log.filter(pc.less(log["lsn"], 450)))

    seen = []

    def on_round(i, new, lineage):
        seen.append(len(new))
        if i == 0:
            # replica synced BEFORE on_round fires
            assert lake_state(replica) == lake_state(lake)
            _write_seg(
                str(watch),
                "seg-1.parquet",
                log.filter(pc.greater_equal(log["lsn"], 450)),
            )

    total = tail(
        str(watch),
        lake,
        spec,
        rounds=3,  # seg-0, seg-1, then an idle round (sync skipped)
        interval_s=0.01,
        on_round=on_round,
        sync_to=replica,
    )
    assert total == 2 and seen == [1, 1, 0]
    expect = {k: r["text"] for k, r in python_lww_replay([log]).items()}
    assert lake_state(replica) == expect


def test_tail_follow_backoff_and_concurrent_arrival(ray_session, tmp_path):
    """Follow mode (VERDICT r4 #5): segments appearing BETWEEN rounds are
    picked up exactly-once, idle rounds no-op and back the poll interval
    off exponentially, and an applying round resets the backoff."""
    watch = tmp_path / "wal"
    watch.mkdir()
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=2)
    log = synthetic_changelog(n_events=400, seed=83)
    head = log.filter(pc.less(log["lsn"], 200))
    tail_t = log.filter(pc.greater_equal(log["lsn"], 200))
    _write_seg(str(watch), "seg-000.parquet", head)

    sleeps = []
    rounds_seen = []

    def on_round(i, new, lineage):
        rounds_seen.append((i, len(new)))
        if i == 3:
            # a segment arrives mid-follow, between polls
            _write_seg(str(watch), "seg-001.parquet", tail_t)

    total = tail(
        str(watch),
        lake,
        spec,
        rounds=6,
        interval_s=0.01,
        max_interval_s=0.08,
        sleep_fn=sleeps.append,
        on_round=on_round,
    )
    assert total == 2
    # round 0 applies seg-000; rounds 1-3 idle; round 4 picks up seg-001
    # exactly once; round 5 idle again
    assert rounds_seen == [(0, 1), (1, 0), (2, 0), (3, 0), (4, 1), (5, 0)]
    # backoff: idle doubling 0.02, 0.04, 0.08 (capped), reset to 0.01 by
    # the applying round, then one idle double again — sleeps happen
    # after rounds 0..4
    assert sleeps == [0.01, 0.02, 0.04, 0.08, 0.01]
    # exactly-once across rounds: final state == one-shot LWW of the log
    state = {
        (r.conv_id, r.turn_idx): r.text
        for r in read_lake(lake, spec).to_pandas().itertuples(index=False)
    }
    want = {k: r["text"] for k, r in python_lww_replay([log]).items()}
    assert state == want
    # a fresh follow over the same WAL is a full no-op
    total2 = tail(
        str(watch), lake, spec, rounds=2, interval_s=0.0,
        max_interval_s=0.01, sleep_fn=sleeps.append,
    )
    assert total2 == 0


def test_tail_follow_emits_runlog_records(ray_session, tmp_path, caplog):
    import logging

    from raycdc.runlog import LOGGER_NAME

    # a CLI test earlier in the session may have configure_logging'd the
    # run logger (handler attached, propagate=False) — reset so caplog's
    # root-logger handler sees the records
    lg = logging.getLogger(LOGGER_NAME)
    for h in list(lg.handlers):
        lg.removeHandler(h)
    lg.propagate = True
    lg.setLevel(logging.NOTSET)
    caplog.set_level(logging.DEBUG, logger=LOGGER_NAME)
    watch = tmp_path / "wal"
    watch.mkdir()
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=2)
    _write_seg(str(watch), "seg-000.parquet", synthetic_changelog(n_events=100, seed=84))
    tail(str(watch), lake, spec, rounds=3, interval_s=0.0,
         max_interval_s=0.01, sleep_fn=lambda s: None)
    recs = [
        (r.getMessage(), getattr(r, "ctx", {}))
        for r in caplog.records
        if r.name == LOGGER_NAME
    ]
    msgs = [m for m, _ in recs]
    assert "tail follow started" in msgs
    assert msgs.count("tail idle round") == 2  # rounds 1 and 2 idle
    fin = dict(recs)["tail follow finished"]
    assert fin["segments_applied"] == 1 and fin["rounds_run"] == 3
    # a plain fixed-interval poll (no backoff cap) must NOT claim
    # follow-mode lifecycle records (r5 review)
    caplog.clear()
    tail(str(watch), lake, spec, rounds=1, interval_s=0.0,
         sleep_fn=lambda s: None)
    msgs2 = [
        r.getMessage() for r in caplog.records if r.name == LOGGER_NAME
    ]
    assert "tail poll started" in msgs2 and "tail poll finished" in msgs2
    assert not any("follow" in m for m in msgs2)


def test_tail_follow_cli_smoke(ray_session, tmp_path, capsys):
    from raycdc.__main__ import main

    watch = tmp_path / "wal"
    watch.mkdir()
    lake = str(tmp_path / "lake")
    _write_seg(str(watch), "seg-000.parquet", synthetic_changelog(n_events=100, seed=85))
    main(
        [
            "tail", "--watch", str(watch), "--lake", lake,
            "--partitions", "2", "--rounds", "2", "--interval", "0.01",
            "--follow", "--max-interval", "0.05",
        ]
    )
    out = [json.loads(x) for x in capsys.readouterr().out.splitlines() if x.strip()]
    assert out[-1]["segments_applied"] == 1
