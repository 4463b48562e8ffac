"""restore_lake: snapshot rollback with exactly-once replay resume.

The bad-deploy drill: replay a good prefix, snapshot, replay a garbage
suffix, RESTORE to the snapshot, replay the corrected suffix — the lake
must equal a one-shot replay of prefix + corrected suffix, and every
other snapshot must stay time-travelable (restore never deletes or
overwrites a referenced file).
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import change_feed, read_lake, replay, restore_lake, sync_lake
from raycdc.schema import TableSpec
from raycdc.sink import (
    list_snapshots,
    read_snapshot_payload,
    restore_marker_file,
    restore_pending,
    write_snapshot,
)
from raycdc.storage import get_storage, write_json_atomic

from .oracle import python_lww_replay


def _state_of(ds):
    pdf = ds.to_pandas()
    return {(r.conv_id, r.turn_idx): r.text for r in pdf.itertuples()}


def _garbage(log: pa.Table, lo: int) -> pa.Table:
    """A corrupt-projector suffix: same envelope, mangled text."""
    suffix = log.filter(pc.greater_equal(log["lsn"], lo))
    return suffix.set_column(
        suffix.schema.get_field_index("text"),
        "text",
        pc.binary_join_element_wise(suffix["text"], " CORRUPTED", "|"),
    )


def test_restore_then_corrected_replay_equals_one_shot(ray_session, tmp_path):
    log = synthetic_changelog(n_events=1500, seed=140)
    prefix = log.filter(pc.less(log["lsn"], 900))
    suffix = log.filter(pc.greater_equal(log["lsn"], 900))
    spec = TableSpec(num_partitions=4)

    lake = str(tmp_path / "lake")
    replay(ray.data.from_arrow(prefix), lake, spec)
    snap = list_snapshots(lake)[-1]
    good_half = _state_of(read_lake(lake, spec))

    replay(ray.data.from_arrow(_garbage(log, 900)), lake, spec)
    assert _state_of(read_lake(lake, spec)) != good_half

    lineage = restore_lake(lake, snap)
    assert restore_pending(lake) is None
    sts = set(lineage["status"].to_pylist())
    assert "restored" in sts
    assert _state_of(read_lake(lake, spec)) == good_half

    # corrected suffix resumes exactly-once from the snapshot floors
    replay(ray.data.from_arrow(suffix), lake, spec)
    expect = {k: r["text"] for k, r in python_lww_replay([log]).items()}
    assert _state_of(read_lake(lake, spec)) == expect

    # one-shot reference lake agrees
    ref = str(tmp_path / "ref")
    replay(ray.data.from_arrow(log), ref, spec)
    assert _state_of(read_lake(ref, spec)) == expect


def test_restore_is_idempotent_and_noops_second_time(ray_session, tmp_path):
    log = synthetic_changelog(n_events=800, seed=141)
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    replay(
        ray.data.from_arrow(log.filter(pc.less(log["lsn"], 400))), lake, spec
    )
    snap = list_snapshots(lake)[-1]
    replay(ray.data.from_arrow(_garbage(log, 400)), lake, spec)

    restore_lake(lake, snap)
    state1 = _state_of(read_lake(lake, spec))
    lineage2 = restore_lake(lake, snap)
    assert set(lineage2["status"].to_pylist()) <= {"noop"}
    assert _state_of(read_lake(lake, spec)) == state1


def test_restore_resets_partition_created_after_snapshot(ray_session, tmp_path):
    # 3 conversations over 8 partitions: the snapshot covers only the few
    # partitions base touched, so extra's new conversations are guaranteed
    # to create post-snapshot partitions that restore must reset to empty
    spec = TableSpec(num_partitions=8)
    lake = str(tmp_path / "lake")
    base = synthetic_changelog(n_events=400, n_convs=3, seed=142)
    replay(ray.data.from_arrow(base), lake, spec)
    snap = list_snapshots(lake)[-1]
    snap_parts = set(read_snapshot_payload(lake, snap)["checkpoints"])

    extra = synthetic_changelog(n_events=300, n_convs=40, seed=143)
    extra = extra.set_column(
        extra.schema.get_field_index("lsn"),
        "lsn",
        pc.add(extra["lsn"], 400),
    )
    replay(ray.data.from_arrow(extra), lake, spec)

    lineage = restore_lake(lake, snap)
    assert len(snap_parts) < spec.num_partitions  # fixture sanity
    reset = lineage.filter(pc.equal(lineage["status"], "reset_empty"))
    assert reset.num_rows > 0  # the post-snapshot partitions were reset
    expect = {k: r["text"] for k, r in python_lww_replay([base]).items()}
    assert _state_of(read_lake(lake, spec)) == expect

    # retry-idempotence THROUGH the reset path: the published explicit
    # empty file must count as a completed reset, not trigger another one
    lineage2 = restore_lake(lake, snap)
    assert set(lineage2["status"].to_pylist()) == {"noop"}

    # replaying the extra segment again rebuilds the tip exactly-once
    replay(ray.data.from_arrow(extra), lake, spec)
    both = pa.concat_tables([base, extra])
    expect_tip = {k: r["text"] for k, r in python_lww_replay([both]).items()}
    assert _state_of(read_lake(lake, spec)) == expect_tip


def test_restore_preserves_other_snapshots_time_travel(ray_session, tmp_path):
    log = synthetic_changelog(n_events=900, seed=144)
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    thirds = [
        log.filter(
            pc.and_(pc.greater_equal(log["lsn"], lo), pc.less(log["lsn"], hi))
        )
        for lo, hi in ((0, 300), (300, 600), (600, 900))
    ]
    states, snaps = [], []
    acc = []
    for part in thirds:
        replay(ray.data.from_arrow(part), lake, spec)
        acc.append(part)
        snaps.append(list_snapshots(lake)[-1])
        states.append(
            {k: r["text"] for k, r in python_lww_replay(list(acc)).items()}
        )

    restore_lake(lake, snaps[0])
    # every pre-restore snapshot still reads its exact state
    for sid, want in zip(snaps, states):
        assert _state_of(read_lake(lake, spec, as_of=sid)) == want
    # and the current state is the restored one
    assert _state_of(read_lake(lake, spec)) == states[0]
    # the restore recorded its own snapshot of the rewound state
    assert list_snapshots(lake)[-1] > snaps[-1]


def test_pending_marker_blocks_consumers_and_rerun_completes(
    ray_session, tmp_path
):
    log = synthetic_changelog(n_events=600, seed=145)
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    replay(
        ray.data.from_arrow(log.filter(pc.less(log["lsn"], 300))), lake, spec
    )
    snap = list_snapshots(lake)[-1]
    replay(ray.data.from_arrow(_garbage(log, 300)), lake, spec)

    # simulate a crash mid-restore: marker present, partitions untouched
    write_json_atomic(
        get_storage(lake), restore_marker_file(lake), {"snapshot": snap}
    )
    with pytest.raises(RuntimeError, match="unfinished restore"):
        replay(ray.data.from_arrow(log), lake, spec)
    with pytest.raises(RuntimeError, match="unfinished restore"):
        change_feed(lake, None, None, spec)
    with pytest.raises(RuntimeError, match="unfinished restore"):
        sync_lake(lake, str(tmp_path / "replica"), spec)
    # vacuum could delete the very snapshot the re-run needs (bricking the
    # lake behind its marker); migrate would launder the mixed state into
    # a fresh dir with NO marker; repair would delete referenced versions
    from raycdc.engine import migrate_lake, repair_partition
    from raycdc.sink import vacuum

    with pytest.raises(RuntimeError, match="unfinished restore"):
        vacuum(lake)
    with pytest.raises(RuntimeError, match="unfinished restore"):
        migrate_lake(lake, str(tmp_path / "migrated"), spec)
    with pytest.raises(RuntimeError, match="unfinished restore"):
        repair_partition(lake, [0])

    # re-running restore completes the rewind and clears the marker
    restore_lake(lake, snap)
    assert restore_pending(lake) is None
    expect = {
        k: r["text"]
        for k, r in python_lww_replay(
            [log.filter(pc.less(log["lsn"], 300))]
        ).items()
    }
    assert _state_of(read_lake(lake, spec)) == expect


def test_restore_cli_smoke(ray_session, tmp_path, capsys):
    from raycdc.__main__ import main

    log = synthetic_changelog(n_events=500, seed=147)
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    replay(
        ray.data.from_arrow(log.filter(pc.less(log["lsn"], 250))), lake, spec
    )
    snap = list_snapshots(lake)[-1]
    replay(ray.data.from_arrow(_garbage(log, 250)), lake, spec)
    assert main(["restore", "--lake", lake, "--as-of", str(snap)]) == 0
    out = capsys.readouterr().out
    assert '"restored"' in out
    expect = {
        k: r["text"]
        for k, r in python_lww_replay(
            [log.filter(pc.less(log["lsn"], 250))]
        ).items()
    }
    assert _state_of(read_lake(lake, spec)) == expect


def test_restore_additive_policy_floors_protect_resums(ray_session, tmp_path):
    """Additive lakes are the acid test for floor exactness: a floor one
    event too low double-counts (addition is not idempotent), one too
    high drops a delta.  Restore + true-suffix replay must equal the
    one-shot rollup bit-for-bit."""
    import datetime as dt

    import numpy as np

    rng = np.random.default_rng(33)
    n = 600
    users = rng.integers(0, 12, n)
    deltas = pa.table(
        {
            "conv_id": pa.array([f"u{u}" for u in users]),
            "turn_idx": pa.array(rng.integers(0, 3, n).astype(np.int32)),
            "ts": pa.array(
                [
                    dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(s))
                    for s in range(n)
                ],
                pa.timestamp("us"),
            ),
            "op": pa.array(["insert"] * n),
            "lsn": pa.array(np.arange(n, dtype=np.int64)),
            "cents": pa.array(rng.integers(-50, 200, n).astype(np.int64)),
        }
    )
    spec = TableSpec(
        num_partitions=4, merge_policy="additive", value_cols=("cents",)
    )
    half = deltas.filter(pc.less(deltas["lsn"], 300))
    rest = deltas.filter(pc.greater_equal(deltas["lsn"], 300))
    garbage = rest.set_column(
        rest.schema.get_field_index("cents"),
        "cents",
        pc.multiply(rest["cents"], 1000),
    )

    lake = str(tmp_path / "lake")
    replay(ray.data.from_arrow(half), lake, spec)
    snap = list_snapshots(lake)[-1]
    replay(ray.data.from_arrow(garbage), lake, spec)
    restore_lake(lake, snap)
    replay(ray.data.from_arrow(rest), lake, spec)

    ref = str(tmp_path / "ref")
    replay(ray.data.from_arrow(deltas), ref, spec)

    def sums(lk):
        pdf = read_lake(lk, spec).to_pandas()
        return {
            (r.conv_id, r.turn_idx): r.cents for r in pdf.itertuples()
        }

    assert sums(lake) == sums(ref)


def test_restore_history_policy_rewinds_scd2_intervals(ray_session, tmp_path):
    """History lakes store every version with validity intervals; restore
    must rewind to EXACTLY the snapshot's interval state (a leaked
    closed-version row from the garbage interlude would corrupt PIT
    queries forever), and ts-ordered replay of the true suffix must then
    land on the one-shot SCD2 history."""
    import pandas as pd

    from raycdc.scd import scd2_history

    log = synthetic_changelog(n_events=400, seed=148, p_delete=0.2).sort_by(
        [("ts", "ascending"), ("lsn", "ascending")]
    )
    spec = TableSpec(num_partitions=4, merge_policy="history")
    head, rest = log.slice(0, 200), log.slice(200)
    garbage = rest.set_column(
        rest.schema.get_field_index("text"),
        "text",
        pc.binary_join_element_wise(rest["text"], "CORRUPTED", "|"),
    )

    def canon(df):
        return df.sort_values(
            ["conv_id", "turn_idx", "valid_from", "lsn"]
        ).reset_index(drop=True)[
            ["conv_id", "turn_idx", "lsn", "text", "valid_from",
             "valid_to", "is_current"]
        ]

    lake = str(tmp_path / "histlake")
    replay(ray.data.from_arrow(head), lake, spec)
    snap = list_snapshots(lake)[-1]
    head_state = canon(
        read_lake(lake, spec, with_tombstones=True).to_pandas()
    )
    replay(ray.data.from_arrow(garbage), lake, spec)
    restore_lake(lake, snap)
    pd.testing.assert_frame_equal(
        canon(read_lake(lake, spec, with_tombstones=True).to_pandas()),
        head_state,
    )
    replay(ray.data.from_arrow(rest), lake, spec)
    want = canon(
        scd2_history(
            ray.data.from_arrow(log), key_cols=("conv_id", "turn_idx"),
            num_partitions=4,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(
        canon(read_lake(lake, spec, with_tombstones=True).to_pandas()), want
    )


def test_restore_to_vacuumed_snapshot_fails_preflight_no_marker(
    ray_session, tmp_path
):
    """Restoring to a snapshot whose files were vacuumed must fail BEFORE
    the pending marker lands — otherwise an un-runnable restore blocks
    every consumer behind a marker only hand-deletion clears."""
    from raycdc.sink import vacuum

    log = synthetic_changelog(n_events=600, seed=149)
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    for lo, hi in ((0, 200), (200, 400), (400, 600)):
        seg = log.filter(
            pc.and_(pc.greater_equal(log["lsn"], lo), pc.less(log["lsn"], hi))
        )
        replay(ray.data.from_arrow(seg), lake, spec)
    old_snap = list_snapshots(lake)[0]
    vacuum(lake, keep_snapshots=1)  # drops old snapshots' files
    # the old manifest is gone entirely -> plain FileNotFoundError; fake a
    # surviving manifest pointing at vacuumed files to hit the pre-flight
    payload = read_snapshot_payload(lake, list_snapshots(lake)[-1])
    stale = {
        **payload,
        "checkpoints": {
            k: {**c, "version": 0} for k, c in payload["checkpoints"].items()
        },
    }
    import os as _os

    write_json_atomic(
        get_storage(lake),
        _os.path.join(lake, "_snapshots", f"snap-{old_snap:06d}.json"),
        stale,
    )
    state = _state_of(read_lake(lake, spec))
    with pytest.raises(FileNotFoundError, match="nothing was mutated"):
        restore_lake(lake, old_snap)
    assert restore_pending(lake) is None  # no marker left behind
    # lake fully usable: consumers not blocked, state untouched
    assert _state_of(read_lake(lake, spec)) == state
    replay(ray.data.from_arrow(log.slice(0, 1)), lake, spec)


def test_fsck_clean_and_consumers_work_after_restore(ray_session, tmp_path):
    """A restored lake is a NORMAL lake: fsck must report zero issues
    (restore's version jumps and the extra retained files are legitimate
    snapshot history, not orphans), vacuum must prune the garbage
    versions without disturbing the restored state, and the change feed
    must produce deltas from the restored base."""
    from raycdc.engine import change_feed, verify_lake
    from raycdc.sink import vacuum, write_snapshot

    log = synthetic_changelog(n_events=600, seed=151)
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    replay(
        ray.data.from_arrow(log.filter(pc.less(log["lsn"], 300))), lake, spec
    )
    snap = list_snapshots(lake)[-1]
    replay(ray.data.from_arrow(_garbage(log, 300)), lake, spec)
    restore_lake(lake, snap)

    audit = verify_lake(lake)
    bad = audit.filter(pc.equal(audit["status"], "corrupt"))
    assert bad.num_rows == 0, bad.to_pylist()

    state = _state_of(read_lake(lake, spec))
    # vacuum keeps the restored current state readable
    vacuum(lake, keep_snapshots=1)
    assert _state_of(read_lake(lake, spec)) == state
    audit2 = verify_lake(lake)
    assert audit2.filter(pc.equal(audit2["status"], "corrupt")).num_rows == 0

    # the restored lake still feeds: corrected suffix -> snapshot -> feed
    base_snap = list_snapshots(lake)[-1]
    replay(
        ray.data.from_arrow(log.filter(pc.greater_equal(log["lsn"], 300))),
        lake,
        spec,
    )
    tip_snap = write_snapshot(lake)
    feed = change_feed(lake, base_snap, tip_snap, spec).to_pandas()
    assert len(feed) > 0


def test_restore_rejects_checkpointless_manifest(ray_session, tmp_path):
    log = synthetic_changelog(n_events=300, seed=146)
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    replay(ray.data.from_arrow(log), lake, spec)
    snap = write_snapshot(lake)
    # strip the checkpoint payloads (an old-format manifest)
    payload = read_snapshot_payload(lake, snap)
    payload.pop("checkpoints")
    write_json_atomic(
        get_storage(lake),
        os.path.join(lake, "_snapshots", f"snap-{snap:06d}.json"),
        payload,
    )
    with pytest.raises(ValueError, match="predates restore support"):
        restore_lake(lake, snap)
    with pytest.raises(FileNotFoundError, match="no snapshot"):
        restore_lake(lake, snap + 999)
