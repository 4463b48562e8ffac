"""At-least-once execution safety: a transient task failure mid-apply must
not corrupt the lake — Ray retries the task, and the write path (atomic
version install + checkpoint advance + LWW idempotence) makes the retry
converge to the same state as a clean run."""

import os

import pyarrow as pa
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import read_lake, replay
from raycdc.schema import TableSpec

from .oracle import python_lww_replay


def test_transient_projector_failure_retried_and_correct(ray_session, tmp_path):
    marker = str(tmp_path / "failed_once")
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    log = synthetic_changelog(n_events=800, seed=95)

    def flaky_projector(batch: pa.Table) -> pa.Table:
        # fail exactly once across the whole run (file-based flag survives
        # process boundaries), then behave normally — models a transient
        # worker fault that Ray's task retry absorbs
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            raise OSError("transient fault injected")
        return batch

    replay(ray.data.from_arrow(log), lake, spec, projector=flaky_projector)
    expect = {k: r["text"] for k, r in python_lww_replay([log]).items()}
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in read_lake(lake, spec).to_pandas().itertuples()
    }
    assert got == expect
    assert os.path.exists(marker)  # the fault actually fired
