"""Crash-window recovery: the apply path writes the partition file BEFORE
the checkpoint (engine._make_apply_fn).  A crash between the two leaves a
partition that is AHEAD of its checkpoint; replaying the same segments must
converge to the same state (LWW idempotence), never duplicate or lose rows.
"""

import glob

import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import read_lake, replay
from raycdc.schema import TableSpec
from raycdc.sink import read_checkpoint, write_checkpoint

from .oracle import lake_state as _state, python_lww_replay




def test_partition_ahead_of_checkpoint_recovers(ray_session, tmp_path):
    t = synthetic_changelog(n_events=1000, seed=70)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(t), lake, spec)
    expect = _state(lake)

    # simulate the crash window: roll one partition's checkpoint BACK so
    # the stored file is ahead of it (as if we crashed after the atomic
    # file write but before the checkpoint write)
    part = 0
    ck = read_checkpoint(lake, part)
    assert ck is not None
    write_checkpoint(
        lake,
        part,
        {
            "max_lsn": ck["max_lsn"] // 2,
            "row_count": -1,
            "content_hash": 0,
            "version": ck["version"],  # file version already installed
        },
    )

    # recovery = replay the same segments; rows above the rolled-back ckpt
    # re-fold into a partition that already contains them → LWW no-ops
    lineage = replay(ray.data.from_arrow(t), lake, spec)
    assert _state(lake) == expect
    # checkpoint restored to the true max
    assert read_checkpoint(lake, part)["max_lsn"] == ck["max_lsn"]
    expect_oracle = {k: r["text"] for k, r in python_lww_replay([t]).items()}
    assert _state(lake) == expect_oracle


def test_read_lake_column_pruning(ray_session, tmp_path):
    t = synthetic_changelog(n_events=400, seed=71)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=2)
    replay(ray.data.from_arrow(t), lake, spec)
    ds = read_lake(lake, spec, columns=["conv_id", "text"])
    pdf = ds.to_pandas()
    assert list(pdf.columns) == ["conv_id", "text"]
    # tombstones still filtered even though op was not requested
    full = read_lake(lake, spec).to_pandas()
    assert len(pdf) == len(full)
