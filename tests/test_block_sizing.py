"""Volume-aware map-task / block sizing (round-5: the bench-harness
endurance-ladder lever promoted into the library).

Two levers, one invariant: the merge exchange's push-based sort emits one
sorted run per input block, so the run count must stay O(CPU waves) at any
input volume — (a) amplified_changelog sizes its derive tasks from
factor ÷ (4 × CPUs); (b) _ensure_parallel_input coalesces fragmented
in-memory inputs into ≤ 4 × CPUs blocks."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data

from raycdc.changelog import amplified_changelog, synthetic_changelog
from raycdc.engine import _ensure_parallel_input, read_lake, replay
from raycdc.schema import TableSpec

from .oracle import python_lww_replay

SF = "/root/testdata/sf0.001"


def _cpus():
    return int(ray.cluster_resources().get("CPU", 0) or 8)


def test_amplified_changelog_auto_reps_matches_explicit(ray_session):
    """Auto task sizing must be a pure performance shape: row-identical to
    the replicas produced one-per-task."""
    auto = amplified_changelog(SF, 24).to_pandas().sort_values(["lsn"])
    one = amplified_changelog(SF, 24, reps_per_task=1).to_pandas().sort_values(["lsn"])
    assert auto.reset_index(drop=True).equals(one.reset_index(drop=True))


def test_amplified_changelog_auto_bounds_task_count(ray_session):
    """factor >> 4×CPUs must NOT mean factor map tasks: the auto sizing
    keeps the materialized block count O(CPU waves)."""
    factor = 16 * _cpus() * 4  # 64 waves' worth of replicas at 1 rep/task
    ds = amplified_changelog(SF, factor).materialize()
    expected_tasks = -(-factor // max(8, factor // (4 * _cpus())))
    assert ds.num_blocks() <= expected_tasks + 1
    assert ds.num_blocks() <= 4 * _cpus() + 1


def test_ensure_parallel_input_coalesces_fragmented_input(ray_session):
    """An in-memory input fragmented into hundreds of tiny blocks is
    coalesced to <= 4 x CPUs blocks with identical content."""
    log = synthetic_changelog(n_events=3000, seed=77)
    n_frag = 300
    step = -(-log.num_rows // n_frag)
    refs = [ray.put(log.slice(i, step)) for i in range(0, log.num_rows, step)]
    frag = ray.data.from_arrow_refs(refs)
    out = _ensure_parallel_input(frag)
    mat = out.materialize()
    assert mat.num_blocks() <= 4 * _cpus()
    got = mat.to_pandas().sort_values(["lsn"]).reset_index(drop=True)
    want = log.to_pandas().sort_values(["lsn"]).reset_index(drop=True)
    assert got.equals(want)


def test_ensure_parallel_input_leaves_normal_inputs_alone(ray_session):
    """The coalesce is gated at 2 x the run budget: a modest block count
    passes through untouched (no extra copy on the normal path)."""
    log = synthetic_changelog(n_events=500, seed=78)
    refs = [ray.put(log.slice(i, 100)) for i in range(0, log.num_rows, 100)]
    frag = ray.data.from_arrow_refs(refs)
    out = _ensure_parallel_input(frag)
    assert out is frag


def test_replay_of_fragmented_wal_is_correct(ray_session, tmp_path):
    """End-to-end through the PUBLIC replay API: a WAL handed over as
    hundreds of tiny in-memory segments (the CLI shape that would
    otherwise feed the sort hundreds of runs) must produce the exact
    one-shot LWW state."""
    log = synthetic_changelog(n_events=4000, seed=79)
    step = -(-log.num_rows // 250)
    refs = [ray.put(log.slice(i, step)) for i in range(0, log.num_rows, step)]
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow_refs(refs), lake, spec)
    pdf = read_lake(lake, spec).to_pandas()
    got = {
        (r.conv_id, r.turn_idx): r.text for r in pdf.itertuples(index=False)
    }
    want = {k: r["text"] for k, r in python_lww_replay([log]).items()}
    assert got == want
