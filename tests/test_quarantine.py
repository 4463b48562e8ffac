"""Late-event quarantine for history lakes.

The history policy's default on an event-time contract violation (a fresh
event older than its key's settled instant) is fail-fast.  With
``replay(..., quarantine_dir=...)`` the late rows are parked as parquet
(content-hash filenames — idempotent under task retries and redelivery)
and the apply continues with the on-time rows.
"""

import datetime as dt
import glob
import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from raycdc.engine import read_dead_letters, read_lake, replay
from raycdc.schema import TableSpec


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _log(rows):
    """rows: (conv_id, turn_idx, text, sec, op, lsn)"""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
            "role": pa.array(["user"] * len(rows)),
            "text": pa.array([r[2] for r in rows]),
            "tool": pa.array([""] * len(rows)),
            "ts": pa.array([_ts(r[3]) for r in rows], pa.timestamp("us")),
            "op": pa.array([r[4] for r in rows]),
            "lsn": pa.array([r[5] for r in rows], pa.int64()),
            "seg_id": pa.array([0] * len(rows), pa.int32()),
        }
    )


SEG1 = [
    ("a", 0, "a-v1", 1, "insert", 1),
    ("a", 0, "a-v2", 5, "update", 2),
    ("b", 1, "b-v1", 3, "insert", 3),
]
# one late row (a@ts3 precedes a's settled instant ts5), two on-time rows
SEG2 = [
    ("a", 0, "a-LATE", 3, "update", 4),
    ("b", 1, "b-v2", 7, "update", 5),
    ("c", 2, "c-v1", 4, "insert", 6),
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["conv_id", "turn_idx", "text", "valid_from", "valid_to"]
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_late_event_raises_without_quarantine(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=2, merge_policy="history")
    replay(ray.data.from_arrow(_log(SEG1)), lake, spec)
    with pytest.raises(Exception, match="settled history"):
        replay(ray.data.from_arrow(_log(SEG2)), lake, spec)


def test_late_event_quarantined_and_ontime_applied(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    qdir = str(tmp_path / "late")
    spec = TableSpec(num_partitions=2, merge_policy="history")
    replay(ray.data.from_arrow(_log(SEG1)), lake, spec)
    lineage = replay(
        ray.data.from_arrow(_log(SEG2)), lake, spec, quarantine_dir=qdir
    )
    assert set(lineage["status"].to_pylist()) == {"applied"}

    parked = read_dead_letters(qdir)
    assert parked is not None and len(parked) == 1
    assert parked["text"].to_pylist() == ["a-LATE"]
    assert parked["lsn"].to_pylist() == [4]

    # on-time rows landed: the history equals a clean replay without the
    # late event
    want_lake = str(tmp_path / "want")
    clean = _log(SEG1 + [r for r in SEG2 if r[2] != "a-LATE"])
    replay(ray.data.from_arrow(clean), want_lake, spec)
    got = _canon(read_lake(lake, spec, with_tombstones=True).to_pandas())
    want = _canon(read_lake(want_lake, spec, with_tombstones=True).to_pandas())
    pd.testing.assert_frame_equal(got, want)


def test_quarantine_redelivery_is_noop_no_duplicate_parks(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    qdir = str(tmp_path / "late")
    spec = TableSpec(num_partitions=2, merge_policy="history")
    replay(ray.data.from_arrow(_log(SEG1)), lake, spec)
    replay(ray.data.from_arrow(_log(SEG2)), lake, spec, quarantine_dir=qdir)
    files_before = sorted(glob.glob(os.path.join(qdir, "*.parquet")))
    assert len(files_before) == 1

    # redeliver the same segment: checkpoints prune everything (noop) and
    # the quarantine queue must not grow
    lineage = replay(
        ray.data.from_arrow(_log(SEG2)), lake, spec, quarantine_dir=qdir
    )
    assert set(lineage["status"].to_pylist()) == {"noop"}
    assert sorted(glob.glob(os.path.join(qdir, "*.parquet"))) == files_before


def test_quarantine_actor_pool_variant(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    qdir = str(tmp_path / "late")
    spec = TableSpec(num_partitions=2, merge_policy="history")
    replay(ray.data.from_arrow(_log(SEG1)), lake, spec)
    replay(
        ray.data.from_arrow(_log(SEG2)),
        lake,
        spec,
        merge_concurrency=2,
        quarantine_dir=qdir,
    )
    parked = read_dead_letters(qdir)
    assert parked is not None and parked["text"].to_pylist() == ["a-LATE"]


def test_quarantine_rejected_for_non_history_policies(ray_session, tmp_path):
    with pytest.raises(ValueError, match="history"):
        replay(
            ray.data.from_arrow(_log(SEG1)),
            str(tmp_path / "lake"),
            TableSpec(num_partitions=2),
            quarantine_dir=str(tmp_path / "late"),
        )
