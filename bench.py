#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline CDC pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline replay twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and reports both throughputs
plus efficiency = (T32/T8)/4 — the sandbox evidence for the north_rule's
N→4N cluster-scaling criterion (see BASELINE.md).

Because the sandbox is a time-shared VM whose deliverable parallelism
drifts by the hour (tools/bandwidth_probe.py: even a cache-resident
pure-compute control measures 0.17-0.75 at 8→32 processes depending on
the window), ``--scaling`` also measures that compute control in the SAME
window and reports ``control_efficiency`` and ``normalized_efficiency`` =
raw / control — how much of the parallelism the box actually delivered
the plan converted.  On real hardware control ≈ 1 and normalized ≈ raw.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
AMPLIFY = int(os.environ.get("RAYCDC_BENCH_AMPLIFY", "256"))
# replicas derived per map task: bigger tasks amortize dispatch overhead and
# let the per-batch combiner dedup across replicas before the shuffle.
# Measured 2026-08-18 (interleaved, one window, best-of-2 per point):
# rpt=8 beats rpt=4 by 20-30% at BOTH 8 and 32 CPUs (exchange halves:
# 6.4M -> 3.2M post-combine rows), rpt=16 regresses at 32 CPUs (16 map
# tasks < 32 slots starves the map stage).  amplify/rpt must stay >= the
# CPU count for full map-stage utilization.
# Round-4 endurance ladder (2026-08-20, interleaved): at amplify 4096 a
# FIXED rpt=8 leaves 512+ sorted runs for the push-based sort to merge
# and the exchange turns superlinear (Sort 28 s @ 24.9M rows -> 73 s @
# 49.9M; end-to-end 64.5 s = 6.4M ev/s), while rpt=32 (128 map tasks = 4
# waves) runs 17.7 s = 23.1M ev/s — 3.6x.  So rpt SCALES with amplify:
# max(8, amplify // (4 * num_cpus)) keeps ~4 waves of map tasks at any
# amplification without starving small runs (amp 256 @ 32 cpus still 8).
REPS_PER_TASK = int(os.environ.get("RAYCDC_BENCH_REPS_PER_TASK", "0"))


def _reps_per_task(amplify: int, num_cpus: int) -> int | None:
    """None → library auto: the volume ÷ CPU-waves sizing now lives in
    raycdc.changelog.amplified_changelog itself (round-5: engine-ified);
    the env var remains ONLY as an explicit experiment override."""
    if REPS_PER_TASK:
        return REPS_PER_TASK  # explicit env override
    return None


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_queries(sf_dir: str, num_cpus: int, amplify: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)

    from raycdc.changelog import amplified_changelog, changelog_from_events
    from raycdc.engine import merged_state, replay
    from raycdc.schema import TableSpec

    # Partition count is a property of the LAKE, not the run: fixed so the
    # layout (and hence idempotent rewrites) are stable across cluster sizes.
    spec = TableSpec(num_partitions=64, shuffle_partitions=64)
    queries: dict[str, float] = {}
    extra: dict[str, float] = {}

    _warmup(num_cpus)

    # --- headline: exactly-once replay into a fresh lake -------------------
    # Two in-session runs; report the best (first-run cold-start noise on
    # this sandbox host is large), keep the cold time as an extra field.
    n_events = amplify * _count_events(sf_dir)
    lake = os.path.join(tempfile.gettempdir(), f"raycdc_bench_lake_{num_cpus}")
    times = []
    for _ in range(2):
        shutil.rmtree(lake, ignore_errors=True)
        t0 = time.perf_counter()
        lineage = replay(
            amplified_changelog(sf_dir, amplify, reps_per_task=_reps_per_task(amplify, num_cpus)),
            lake,
            spec,
        )
        times.append(time.perf_counter() - t0)
        assert len(lineage) > 0
    dt = min(times)
    queries["cdc_replay_lake"] = dt
    extra["events"] = n_events
    extra["events_per_sec"] = n_events / dt
    extra["replay_cold_sec"] = times[0]

    # --- redelivery (idempotent no-op path) --------------------------------
    t0 = time.perf_counter()
    replay(
        amplified_changelog(sf_dir, amplify, reps_per_task=_reps_per_task(amplify, num_cpus)), lake, spec
    )
    queries["cdc_redelivery_noop"] = time.perf_counter() - t0
    shutil.rmtree(lake, ignore_errors=True)

    # --- skewed replay: salted vs unsalted (skew handling is measured, not
    # assumed — SURVEY.md §7.3) ---------------------------------------------
    import pyarrow as pa
    import pyarrow.compute as pc

    def skewify(t: pa.Table) -> pa.Table:
        # ~90% of all events land on ONE conversation with a WIDE turn space
        # (50k distinct turns) — wide enough that the per-batch combiner
        # cannot collapse it, so one merge partition takes ~90% of the rows
        import numpy as np

        hot = pc.not_equal(pc.utf8_slice_codeunits(t["conv_id"], 1, 2), "7")
        cid = pc.if_else(hot, pa.scalar("hot-conv"), t["conv_id"])
        wide_turn = pa.array(
            (t["lsn"].to_numpy(zero_copy_only=False) % 50_000).astype(np.int32)
        )
        turn = pc.if_else(hot, wide_turn, t["turn_idx"])
        t = t.set_column(t.schema.get_field_index("conv_id"), "conv_id", cid)
        return t.set_column(t.schema.get_field_index("turn_idx"), "turn_idx", turn)

    skew_amp = max(1, amplify // 4)
    for salted, name in ((False, "cdc_skew_unsalted"), (True, "cdc_skew_salted")):
        shutil.rmtree(lake, ignore_errors=True)
        t0 = time.perf_counter()
        replay(
            amplified_changelog(sf_dir, skew_amp, reps_per_task=_reps_per_task(skew_amp, num_cpus)),
            lake,
            spec,
            projector=skewify,
            salted=salted,
            num_salts=16,
        )
        queries[name] = time.perf_counter() - t0
    shutil.rmtree(lake, ignore_errors=True)

    # --- in-flight merged state (pure transform, no sink) ------------------
    t0 = time.perf_counter()
    n = merged_state(changelog_from_events(sf_dir), spec).count()
    queries["cdc_merged_state"] = time.perf_counter() - t0
    assert n > 0

    # --- operator-library pipelines over documents/embeddings --------------
    try:
        from raycdc.pipelines import bench_extras

        for name, fn in bench_extras().items():
            t0 = time.perf_counter()
            fn(sf_dir)
            queries[name] = time.perf_counter() - t0
    except ImportError:
        pass

    return {
        "metric": "change-events applied/sec (end-to-end exactly-once replay)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
        "amplify": amplify,
        **{k: round(v, 1) for k, v in extra.items()},
    }


def _warmup(num_cpus: int) -> None:
    """Spin up Ray's worker pool so the timed runs measure steady-state
    throughput, not one-time process startup."""
    import ray

    ray.data.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        lambda b: b
    ).count()


def _count_events(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/events.parquet").num_rows


def _control_efficiency(
    lo: int, hi: int, kernel: str = "cpu_spin", seconds: float = 1.0
) -> float:
    """Same-window control scaling: aggregate throughput of a reference
    kernel at ``lo`` vs ``hi`` independent processes (no Ray).

    Two controls bound the replay from different directions:
    * ``cpu_spin`` — cache-resident integer ops: the HYPERVISOR ceiling
      (how much compute the time-shared VM actually delivers this hour);
    * ``string_hash`` — FNV over Arrow string buffers: the MEMORY-BANDWIDTH
      ceiling for the replay's hot-kernel shape (byte streaming + hashing;
      the replay's sort/parquet stages are hungrier still).
    On real hardware both ≈ 1.  See tools/bandwidth_probe.py for the full
    sweep."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    import bandwidth_probe as bp

    return (bp.run_kernel(kernel, hi, seconds) / bp.run_kernel(kernel, lo, seconds)) / (
        hi / lo
    )


def _run_child(num_cpus: int, sf_dir: str, amplify: int) -> dict:
    """Run the headline replay in a FRESH process (fresh Ray session)."""
    env = dict(os.environ)
    env["RAY_GRAFT_CPUS"] = str(num_cpus)
    env["GRAFT_SF_DIR"] = sf_dir
    env["RAYCDC_BENCH_AMPLIFY"] = str(amplify)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--headline-only"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--num-cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--amplify", type=int, default=AMPLIFY)
    args = ap.parse_args()

    if args.scaling:
        # Multiple alternating pairs + median: the sandbox host's deliverable
        # parallelism drifts by the hour (measured single pairs span
        # 0.33–1.08 in ONE day), so a lone pair is a coin flip.  Each pair is
        # two fresh processes (8 then 32 CPUs) with its own same-window
        # controls; the reported value is the MEDIAN pair efficiency.
        import statistics

        n_pairs = max(1, int(os.environ.get("RAYCDC_SCALING_PAIRS", "2")))
        lo_cpus, hi_cpus = 8, 32
        pairs = []
        for _ in range(n_pairs):
            lo = _run_child(lo_cpus, args.sf_dir, args.amplify)
            hi = _run_child(hi_cpus, args.sf_dir, args.amplify)
            eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (
                hi_cpus / lo_cpus
            )
            pairs.append(
                {
                    "raw": round(eff, 3),
                    "t_lo": lo["queries"]["cdc_replay_lake"],
                    "t_hi": hi["queries"]["cdc_replay_lake"],
                    "events_per_sec_lo": round(lo["events_per_sec"], 1),
                    "events_per_sec_hi": round(hi["events_per_sec"], 1),
                    "control": round(
                        _control_efficiency(lo_cpus, hi_cpus, "cpu_spin"), 3
                    ),
                    "control_membw": round(
                        _control_efficiency(lo_cpus, hi_cpus, "string_hash"), 3
                    ),
                }
            )
        eff = statistics.median(p["raw"] for p in pairs)
        control = statistics.median(p["control"] for p in pairs)
        control_membw = statistics.median(p["control_membw"] for p in pairs)
        best = max(pairs, key=lambda p: p["raw"])
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency N->4N (num_cpus 8 vs 32, fresh processes)",
                    "value": round(eff, 3),
                    "unit": "efficiency",
                    "queries": {
                        f"replay_cpus{lo_cpus}": best["t_lo"],
                        f"replay_cpus{hi_cpus}": best["t_hi"],
                    },
                    "events_per_sec_lo": best["events_per_sec_lo"],
                    "events_per_sec_hi": best["events_per_sec_hi"],
                    # same-window ceilings: hypervisor (pure compute) and
                    # memory bandwidth (the replay's hot-kernel shape),
                    # plus the plan's efficiency normalized against each
                    "control_efficiency": round(control, 3),
                    "control_membw_efficiency": round(control_membw, 3),
                    "normalized_efficiency": round(min(eff / control, 2.0), 3),
                    "normalized_vs_membw": round(min(eff / control_membw, 2.0), 3),
                    "pairs": pairs,
                    "sf": _sf_of(args.sf_dir),
                    "num_cpus": hi_cpus,
                    "amplify": args.amplify,
                }
            )
        )
        return

    import ray

    if args.headline_only:
        # child mode for --scaling: headline replay only, fresh session
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
        from raycdc.changelog import amplified_changelog
        from raycdc.engine import replay
        from raycdc.schema import TableSpec

        spec = TableSpec(num_partitions=64, shuffle_partitions=64)
        _warmup(args.num_cpus)
        n_events = args.amplify * _count_events(args.sf_dir)
        lake = os.path.join(
            tempfile.gettempdir(), f"raycdc_scaling_lake_{args.num_cpus}"
        )
        times = []
        for _ in range(3):
            shutil.rmtree(lake, ignore_errors=True)
            t0 = time.perf_counter()
            replay(
                amplified_changelog(
                    args.sf_dir,
                    args.amplify,
                    reps_per_task=_reps_per_task(args.amplify, args.num_cpus),
                ),
                lake,
                spec,
            )
            times.append(time.perf_counter() - t0)
        dt = min(times)
        shutil.rmtree(lake, ignore_errors=True)
        print(
            json.dumps(
                {
                    "metric": "change-events applied/sec (headline replay)",
                    "value": round(dt, 3),
                    "unit": "sec",
                    "queries": {"cdc_replay_lake": round(dt, 3)},
                    "sf": _sf_of(args.sf_dir),
                    "num_cpus": args.num_cpus,
                    "amplify": args.amplify,
                    "events": n_events,
                    "events_per_sec": round(n_events / dt, 1),
                }
            )
        )
        ray.shutdown()
        return

    result = run_queries(args.sf_dir, args.num_cpus, args.amplify)
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
