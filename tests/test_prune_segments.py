"""WAL retention GC: prune applied segment files behind the tail journal."""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from raycdc.changelog import synthetic_changelog
from raycdc.engine import prune_segments, read_lake, tail_once
from raycdc.schema import TableSpec

from .oracle import python_lww_replay


def _state_of(ds):
    pdf = ds.to_pandas()
    return {(r.conv_id, r.turn_idx): r.text for r in pdf.itertuples()}


def _three_segments(tmp_path):
    watch = tmp_path / "wal"
    watch.mkdir()
    log = synthetic_changelog(n_events=900, seed=150)
    for i, (lo, hi) in enumerate(((0, 300), (300, 600), (600, 900))):
        seg = log.filter(
            pc.and_(pc.greater_equal(log["lsn"], lo), pc.less(log["lsn"], hi))
        )
        pq.write_table(seg, os.path.join(str(watch), f"seg-{i:03d}.parquet"))
    return str(watch), log


def test_prune_deletes_only_applied_keeps_margin(ray_session, tmp_path):
    watch, log = _three_segments(tmp_path)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    new, _ = tail_once(watch, lake, spec)
    assert len(new) == 3
    # an UNJOURNALED file (arrived after the round) must never be touched
    late = synthetic_changelog(n_events=50, seed=151)
    pq.write_table(late, os.path.join(watch, "seg-999.parquet"))

    state = _state_of(read_lake(lake, spec))

    dry = prune_segments(lake, keep_last=1, dry_run=True)
    assert sorted(dry["status"].to_pylist()) == ["kept", "pruned", "pruned"]
    assert os.path.exists(os.path.join(watch, "seg-000.parquet"))  # dry run

    out = prune_segments(lake, keep_last=1)
    got = dict(zip(out["path"].to_pylist(), out["status"].to_pylist()))
    assert got[os.path.join(watch, "seg-000.parquet")] == "pruned"
    assert got[os.path.join(watch, "seg-001.parquet")] == "pruned"
    assert got[os.path.join(watch, "seg-002.parquet")] == "kept"
    assert not os.path.exists(os.path.join(watch, "seg-000.parquet"))
    assert os.path.exists(os.path.join(watch, "seg-002.parquet"))
    assert os.path.exists(os.path.join(watch, "seg-999.parquet"))

    # lake state untouched; journal untouched (append-only contract)
    assert _state_of(read_lake(lake, spec)) == state
    assert os.path.exists(os.path.join(lake, "_segments.jsonl"))

    # the next tail round sees only the unjournaled newcomer — pruned
    # files neither re-apply nor error
    new2, _ = tail_once(watch, lake, spec)
    assert [os.path.basename(p) for p in new2] == ["seg-999.parquet"]

    # re-prune reports the already-deleted files as missing, not an error
    again = prune_segments(lake, keep_last=1)
    sts = dict(zip(again["path"].to_pylist(), again["status"].to_pylist()))
    assert sts[os.path.join(watch, "seg-000.parquet")] == "missing"
    assert sts[os.path.join(watch, "seg-999.parquet")] == "kept"


def test_prune_keep_last_beyond_history_keeps_everything(ray_session, tmp_path):
    """keep_last larger than the journal must keep ALL segments — the raw
    negative slice would wrap and delete the OLDEST files instead."""
    watch, _ = _three_segments(tmp_path)
    lake = str(tmp_path / "lake")
    tail_once(watch, lake, TableSpec(num_partitions=4))
    out = prune_segments(lake, keep_last=5)
    assert out["status"].to_pylist() == ["kept", "kept", "kept"]
    for i in range(3):
        assert os.path.exists(os.path.join(watch, f"seg-{i:03d}.parquet"))


def test_prune_without_journal_is_empty_noop(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    os.makedirs(lake, exist_ok=True)
    out = prune_segments(lake)
    assert out.num_rows == 0


def test_tail_self_retention(ray_session, tmp_path):
    """tail(prune_keep_last=N): each applying round GCs applied WAL files
    past the newest N; the lake state is unaffected and later rounds keep
    working against the pruned directory."""
    import pyarrow as pa

    from raycdc.engine import tail

    watch, log = _three_segments(tmp_path)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    total = tail(
        watch, lake, spec, rounds=1, interval_s=0, prune_keep_last=1
    )
    assert total == 3
    kept = sorted(os.listdir(watch))
    assert kept == ["seg-002.parquet"]  # newest journaled file only
    expect = {k: r["text"] for k, r in python_lww_replay([log]).items()}
    assert _state_of(read_lake(lake, spec)) == expect

    # a later round applies a new segment and prunes the previous one
    late = log.slice(0, 10).set_column(
        log.schema.get_field_index("lsn"),
        "lsn",
        pa.array([900 + i for i in range(10)], pa.int64()),
    )
    pq.write_table(late, os.path.join(watch, "seg-900.parquet"))
    tail(watch, lake, spec, rounds=1, interval_s=0, prune_keep_last=1)
    assert sorted(os.listdir(watch)) == ["seg-900.parquet"]


def test_prune_cli_smoke(ray_session, tmp_path, capsys):
    from raycdc.__main__ import main

    watch, _ = _three_segments(tmp_path)
    lake = str(tmp_path / "lake")
    tail_once(watch, lake, TableSpec(num_partitions=4))
    assert main(["prune", "--lake", lake, "--keep-last", "2"]) == 0
    out = capsys.readouterr().out
    assert '"pruned": 1' in out and '"kept": 2' in out