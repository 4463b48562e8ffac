#!/usr/bin/env python
"""Single-box memory-bandwidth counter-experiment (see BASELINE.md).

Quantifies WHY 8→32-CPU scaling efficiency on this host tops out below
linear for the replay workload: the box shares one memory subsystem, so
bandwidth-bound kernels stop scaling once the sockets' controllers
saturate, while cache-resident compute keeps scaling.

Three kernels, each run at concurrency 1, 8 and 32 as INDEPENDENT
processes (no Ray, no shared state — pure hardware probe):

* ``cpu_spin``     — integer arithmetic on a cache-resident array
                     (compute-bound control; should scale ~linearly)
* ``stream_triad`` — STREAM-style ``a = b*s + c`` over arrays far larger
                     than LLC (pure bandwidth)
* ``string_hash``  — FNV-1a over Arrow string buffers via
                     ``raycdc.partition.hash_strings`` (the replay's actual
                     hot kernel shape: byte-streaming + hashing)

For each kernel: per-process throughput at each concurrency and the 8→32
efficiency ``(agg_32 / agg_8) / 4``.  A compute control near 1.0 next to
bandwidth kernels well below 1.0 is the signature of a saturated memory
subsystem — a per-node resource a real 4× cluster multiplies, but a single
sandbox box cannot.

Usage: ``python tools/bandwidth_probe.py [--seconds 2.0]`` → one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def _cpu_spin(seconds: float) -> float:
    """Iterations/sec of int arithmetic on a 32 KiB (L1-resident) array."""
    a = np.arange(4096, dtype=np.int64)
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < seconds:
        a = (a * 1099511628211 + 12345) ^ (a >> 7)
        iters += 1
    return iters / (time.perf_counter() - t0)


def _stream_triad(seconds: float) -> float:
    """Bytes/sec of a = b*s + c over 8M-element float64 arrays (192 MiB
    traffic per pass — far beyond any LLC, small enough that 32 concurrent
    processes fit the box comfortably)."""
    n = 8 * 1024 * 1024
    b = np.ones(n)
    c = np.ones(n)
    a = np.empty(n)
    t0 = time.perf_counter()
    passes = 0
    while time.perf_counter() - t0 < seconds:
        np.multiply(b, 3.0, out=a)
        a += c
        passes += 1
    dt = time.perf_counter() - t0
    return passes * 3 * n * 8 / dt  # read b, read c, write a


def _string_hash(seconds: float) -> float:
    """Bytes/sec of FNV-1a over Arrow string buffers — the replay's actual
    hot-kernel shape (streaming byte reads + per-row hashing)."""
    import pyarrow as pa

    from raycdc.partition import hash_strings

    rng = np.random.default_rng(7)
    words = np.array([f"conv-{i:08d}-{'x' * 24}" for i in range(500_000)])
    arr = pa.array(rng.permutation(words))
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nbytes = arr.nbytes
    t0 = time.perf_counter()
    passes = 0
    while time.perf_counter() - t0 < seconds:
        hash_strings(arr)
        passes += 1
    return passes * nbytes / (time.perf_counter() - t0)


KERNELS = {
    "cpu_spin": _cpu_spin,
    "stream_triad": _stream_triad,
    "string_hash": _string_hash,
}


def _worker(name: str, seconds: float, barrier, out_q) -> None:
    fn = KERNELS[name]
    fn(0.05)  # touch pages / warm allocator before the barrier
    barrier.wait()
    out_q.put(fn(seconds))


def run_kernel(name: str, concurrency: int, seconds: float) -> float:
    """Aggregate throughput of ``concurrency`` simultaneous processes."""
    barrier = mp.Barrier(concurrency)
    out_q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(name, seconds, barrier, out_q))
        for _ in range(concurrency)
    ]
    for p in procs:
        p.start()
    vals = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    return float(sum(vals))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 8, 32])
    args = ap.parse_args()

    result: dict = {"metric": "bandwidth probe (independent processes)",
                    "seconds": args.seconds, "levels": args.levels, "kernels": {}}
    for name in KERNELS:
        agg = {str(c): run_kernel(name, c, args.seconds) for c in args.levels}
        entry: dict = {"aggregate_per_level": {k: round(v, 1) for k, v in agg.items()}}
        if "8" in agg and "32" in agg:
            entry["efficiency_8_to_32"] = round((agg["32"] / agg["8"]) / 4, 3)
        if "1" in agg and "32" in agg:
            entry["speedup_1_to_32"] = round(agg["32"] / agg["1"], 2)
        result["kernels"][name] = entry
    print(json.dumps(result))


if __name__ == "__main__":
    main()
