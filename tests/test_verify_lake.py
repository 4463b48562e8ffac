"""Lake fsck (`engine.verify_lake`): a clean lake audits green; every
tampering mode the checker claims to catch is actually caught; the CLI
`verify` command exits non-zero on corruption.  Read-only: verifying must
never change lake bytes."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import bootstrap, replay, verify_lake
from raycdc.schema import TableSpec
from raycdc.sink import current_files, part_file, read_all_checkpoints
from raycdc.__main__ import main


def _make_lake(tmp_path, n_events=900, num_partitions=4, seed=71):
    t = synthetic_changelog(n_events=n_events, seed=seed)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=num_partitions)
    replay(ray.data.from_arrow(t), lake, spec)
    return lake, spec


def _current_path(lake, part):
    ck = read_all_checkpoints(lake)[part]
    return part_file(lake, part, ck["version"])


def test_verify_clean_lake_all_ok(ray_session, tmp_path):
    lake, spec = _make_lake(tmp_path)
    report = verify_lake(lake, spec)
    rows = report.to_pylist()
    assert len(rows) == spec.num_partitions
    assert all(r["status"] == "ok" for r in rows), rows
    assert all(r["issues"] == "" for r in rows)
    assert sum(r["n_rows"] for r in rows) > 0


def test_verify_detects_key_tamper_and_stays_readonly(ray_session, tmp_path):
    """Flip one stored turn_idx: the content hash (keys+lsn digest) must
    catch it, and verify_lake must not rewrite anything while looking."""
    lake, spec = _make_lake(tmp_path)
    path = _current_path(lake, 0)
    t = pq.read_table(path)
    col = t["turn_idx"].to_pylist()
    col[0] += 1000  # a key the log never wrote
    t = t.set_column(
        t.schema.get_field_index("turn_idx"), "turn_idx",
        pa.array(col, t.schema.field("turn_idx").type),
    )
    pq.write_table(t, path)
    mtimes = {p: os.path.getmtime(p) for p in current_files(lake)}
    report = verify_lake(lake, spec).to_pylist()
    bad = [r for r in report if r["part"] == 0][0]
    assert bad["status"] == "corrupt"
    assert "content hash mismatch" in bad["issues"]
    assert [r["status"] for r in report if r["part"] != 0] == ["ok"] * (
        spec.num_partitions - 1
    )
    assert {p: os.path.getmtime(p) for p in current_files(lake)} == mtimes


def test_verify_detects_missing_file_and_row_count(ray_session, tmp_path):
    lake, spec = _make_lake(tmp_path)
    os.remove(_current_path(lake, 1))
    path2 = _current_path(lake, 2)
    t2 = pq.read_table(path2)
    pq.write_table(t2.slice(0, len(t2) - 1), path2)  # drop one row
    report = {r["part"]: r for r in verify_lake(lake, spec).to_pylist()}
    assert report[1]["status"] == "corrupt"
    assert "missing" in report[1]["issues"]
    assert report[2]["status"] == "corrupt"
    assert "row_count" in report[2]["issues"]


def test_verify_detects_foreign_partition_rows(ray_session, tmp_path):
    """Graft a row stored under the wrong partition (the orphaned-row
    failure an out-of-band re-layout causes): the routing check fires."""
    lake, spec = _make_lake(tmp_path)
    src = pq.read_table(_current_path(lake, 3)).slice(0, 1)
    dst_path = _current_path(lake, 0)
    dst = pq.read_table(dst_path)
    pq.write_table(pa.concat_tables([dst, src.cast(dst.schema)]), dst_path)
    bad = [r for r in verify_lake(lake, spec).to_pylist() if r["part"] == 0][0]
    assert bad["status"] == "corrupt"
    assert "hash to another partition" in bad["issues"]


def test_verify_detects_lsn_beyond_checkpoint(ray_session, tmp_path):
    lake, spec = _make_lake(tmp_path)
    path = _current_path(lake, 0)
    t = pq.read_table(path)
    lsn = t["lsn"].to_pylist()
    lsn[0] = max(lsn) + 10_000  # a row "from the future"
    t = t.set_column(
        t.schema.get_field_index("lsn"), "lsn", pa.array(lsn, pa.int64())
    )
    pq.write_table(t, path)
    bad = [r for r in verify_lake(lake, spec).to_pylist() if r["part"] == 0][0]
    assert bad["status"] == "corrupt"
    assert "beyond checkpoint max_lsn" in bad["issues"]


def test_verify_accepts_bootstrap_empty_partitions(ray_session, tmp_path):
    """Bootstrap with one key: untouched partitions hold checkpoint-only
    empty state (version -1) and must audit as 'empty', never corrupt."""
    snap = pa.table(
        {
            "conv_id": ["c1"],
            "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"],
            "text": ["hello"],
            "tool": [""],
            "ts": pa.array([1], pa.timestamp("us")),
        }
    )
    lake = str(tmp_path / "boot")
    spec = TableSpec(num_partitions=8)
    bootstrap(ray.data.from_arrow(snap), lake, spec, snapshot_lsn=100)
    rows = verify_lake(lake, spec).to_pylist()
    statuses = {r["part"]: r["status"] for r in rows}
    assert "corrupt" not in statuses.values()
    assert sorted(statuses.values()).count("ok") == 1
    assert sorted(statuses.values()).count("empty") == spec.num_partitions - 1


def test_verify_cli_exit_codes(ray_session, tmp_path, capsys):
    lake, spec = _make_lake(tmp_path)
    assert main(["verify", "--lake", lake, "--partitions", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] == 4 and out["corrupt"] == []
    os.remove(_current_path(lake, 1))
    assert main(["verify", "--lake", lake, "--partitions", "4"]) == 3
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["corrupt"] and out["corrupt"][0]["part"] == 1


def test_verify_additive_lake_audits_green(ray_session, tmp_path):
    """Additive lakes legitimately store BOTH a tombstone and an op='agg'
    row for a key (delete followed by newer contributions) — the
    uniqueness check must be per (key, op), never flag policy-valid state."""
    import datetime as dt

    t = pa.table(
        {
            "conv_id": ["u1", "u1", "u1", "u2"],
            "turn_idx": pa.array([0, 0, 0, 1], pa.int32()),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 0, 0, s) for s in range(4)],
                pa.timestamp("us"),
            ),
            "op": pa.array(["insert", "delete", "insert", "insert"]),
            "lsn": pa.array([0, 1, 2, 3], pa.int64()),
            "cents": pa.array([10, 0, 5, 7], pa.int64()),
        }
    )
    lake = str(tmp_path / "addlake")
    spec = TableSpec(
        num_partitions=2, merge_policy="additive", value_cols=("cents",)
    )
    replay(ray.data.from_arrow(t), lake, spec)
    rows = verify_lake(lake, spec).to_pylist()
    assert all(r["status"] != "corrupt" for r in rows), rows
    # the u1 partition really does hold two rows for the key
    assert sum(r["n_rows"] for r in rows) >= 3


def test_verify_catches_orphaned_versioned_state(ray_session, tmp_path):
    """Checkpoint gone while data sits at version>=1: a version-0 probe
    would miss it; the file census must not."""
    lake, spec = _make_lake(tmp_path)
    t = synthetic_changelog(n_events=300, seed=72)
    t = t.set_column(  # fresh WAL range so the apply advances to version 1
        t.schema.get_field_index("lsn"), "lsn",
        pa.compute.add(t["lsn"], 10_000).cast(pa.int64()),
    )
    replay(ray.data.from_arrow(t), lake, spec)
    ck = read_all_checkpoints(lake)
    part = next(p for p, c in ck.items() if c["version"] >= 1)
    v0 = part_file(lake, part, 0)
    if os.path.exists(v0):
        os.remove(v0)  # simulate vacuum of the old version
    os.remove(os.path.join(lake, "_ckpt", f"part-{part:05d}.json"))
    bad = [r for r in verify_lake(lake, spec).to_pylist() if r["part"] == part][0]
    assert bad["status"] == "corrupt"
    assert "no checkpoint but data file version(s)" in bad["issues"]


def test_verify_pending_install_ok_stray_future_corrupt(ray_session, tmp_path):
    """A file at checkpoint+1 is the documented crash-consistent pending
    install (never corrupt); files beyond that are unaccounted state."""
    import shutil

    lake, spec = _make_lake(tmp_path)
    cur = _current_path(lake, 0)
    ver = read_all_checkpoints(lake)[0]["version"]
    shutil.copy(cur, part_file(lake, 0, ver + 1))  # pending install
    rows = {r["part"]: r for r in verify_lake(lake, spec).to_pylist()}
    assert rows[0]["status"] == "ok", rows[0]
    shutil.copy(cur, part_file(lake, 0, ver + 5))  # unaccounted
    rows = {r["part"]: r for r in verify_lake(lake, spec).to_pylist()}
    assert rows[0]["status"] == "corrupt"
    assert "unaccounted state" in rows[0]["issues"]


def test_repair_partition_then_full_replay_heals(ray_session, tmp_path):
    """fsck → repair → full-WAL replay round-trip: the repaired lake's
    state is byte-equal to a never-corrupted one, and healthy partitions
    no-op through the healing replay."""
    from raycdc.engine import repair_partition
    from .oracle import lake_state

    t = synthetic_changelog(n_events=900, seed=71)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(t), lake, spec)
    want = lake_state(lake)

    # corrupt part 0 (drop a row), confirm fsck sees it
    path = _current_path(lake, 0)
    tbl = pq.read_table(path)
    pq.write_table(tbl.slice(1), path)
    assert [r for r in verify_lake(lake, spec).to_pylist() if r["part"] == 0][0][
        "status"
    ] == "corrupt"

    assert repair_partition(lake, [0]) == [0]
    rows = {r["part"]: r for r in verify_lake(lake, spec).to_pylist()}
    assert rows[0]["status"] == "empty"  # reset = never-written

    lineage = replay(ray.data.from_arrow(t), lake, spec)  # full retained WAL
    by_part = {r["part"]: r["status"] for r in lineage.to_pylist()}
    assert by_part[0] == "applied"
    assert all(s == "noop" for p, s in by_part.items() if p != 0)
    assert lake_state(lake) == want
    assert all(r["status"] == "ok" for r in verify_lake(lake, spec).to_pylist())


def test_repair_cli(ray_session, tmp_path, capsys):
    lake, spec = _make_lake(tmp_path)
    os.remove(_current_path(lake, 2))
    assert main(["verify", "--lake", lake, "--partitions", "4"]) == 3
    capsys.readouterr()
    assert main(["repair", "--lake", lake, "--part", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["reset"] == [2]
    # empty after reset; not corrupt
    assert main(["verify", "--lake", lake, "--partitions", "4"]) == 0


def test_verify_history_lake_interval_invariants(ray_session, tmp_path):
    """A clean history lake audits green; tampered SCD2 interval algebra
    (overlap, mid-chain open interval, broken is_current) is caught."""
    log = synthetic_changelog(n_events=500, seed=73, p_delete=0.15).sort_by(
        [("ts", "ascending"), ("lsn", "ascending")]
    )
    lake = str(tmp_path / "hist")
    spec = TableSpec(num_partitions=4, merge_policy="history")
    replay(ray.data.from_arrow(log), lake, spec)
    rows = verify_lake(lake, spec).to_pylist()
    assert all(r["status"] != "corrupt" for r in rows), rows

    # find a partition holding a key with >= 2 versions and tamper it
    import collections

    for part in range(4):
        path = _current_path(lake, part)
        t = pq.read_table(path)
        counts = collections.Counter(
            zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())
        )
        multi = [k for k, c in counts.items() if c >= 2]
        if multi:
            break
    assert multi, "fixture must produce a multi-version key"
    conv, turn = multi[0]
    keymask = [
        c == conv and x == turn
        for c, x in zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())
    ]
    first = keymask.index(True)
    # open the key's FIRST version while later versions exist
    vt = t["valid_to"].to_pylist()
    vt[first] = None
    bad = t.set_column(
        t.schema.get_field_index("valid_to"), "valid_to",
        pa.array(vt, t.schema.field("valid_to").type),
    )
    pq.write_table(bad, path)
    rep = [r for r in verify_lake(lake, spec).to_pylist() if r["part"] == part][0]
    assert rep["status"] == "corrupt"
    assert "open interval(s) with a later version" in rep["issues"]

    # restore, then make the first interval overlap its successor
    ts_of = t["valid_from"].to_pylist()
    later = [i for i, m in enumerate(keymask) if m and i != first]
    vt2 = t["valid_to"].to_pylist()
    import datetime as dt

    vt2[first] = max(ts_of[i] for i in later) + dt.timedelta(seconds=1)
    bad2 = t.set_column(
        t.schema.get_field_index("valid_to"), "valid_to",
        pa.array(vt2, t.schema.field("valid_to").type),
    )
    pq.write_table(bad2, path)
    rep2 = [r for r in verify_lake(lake, spec).to_pylist() if r["part"] == part][0]
    assert rep2["status"] == "corrupt"
    assert "overlapping validity interval(s)" in rep2["issues"]

    # restore, then double-mark is_current on the key
    cur = t["is_current"].to_pylist()
    for i in (first, later[0]):
        cur[i] = 1
    bad3 = t.set_column(
        t.schema.get_field_index("is_current"), "is_current",
        pa.array(cur, t.schema.field("is_current").type),
    )
    pq.write_table(bad3, path)
    rep3 = [r for r in verify_lake(lake, spec).to_pylist() if r["part"] == part][0]
    assert rep3["status"] == "corrupt"
    assert "multiple is_current" in rep3["issues"]
