"""Mergeable sketches for lake-scale profiling: HyperLogLog distinct count.

A 100 TB corpus profile ("how many distinct users / conversations / urls?")
cannot afford an exact ``COUNT(DISTINCT)`` — that is a full shuffle of the
key column.  HyperLogLog (Flajolet et al., AofA'07) replaces it with a
fixed 2^p-byte register array that is (a) computed per batch with numpy
only, (b) merged by elementwise ``max`` — associative and commutative, so
partials combine in any order — and (c) never shuffled: every batch
collapses to one tiny register row, and the driver-side fold touches
``num_blocks`` rows of 2^p bytes, not the data.

Standard-error ~= 1.04 / sqrt(2^p); p=12 (4 KiB) gives ~1.6%.
Bias handling: linear counting below the small-range threshold and the
classic alpha_m large-range correction — adequate for profiling (the
accuracy test asserts the envelope empirically).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(values, p: int = 12) -> np.ndarray:
    """One HLL register array (uint8[2^p]) for a column chunk.

    Vectorized: one hash pass (``raycdc.partition.hash_strings`` for
    strings, a splitmix64 avalanche for integers), top ``p`` bits pick the
    register, the rank of the remaining bits' leading zeros updates it via
    ``np.maximum.at``.
    """
    from raycdc.partition import hash_strings

    arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        h = hash_strings(arr).copy()
    else:
        v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        h = v.view(np.uint64).copy()
    # splitmix64 finalizer on EVERY input: HLL reads the TOP p bits, and
    # FNV-1a's high bits barely avalanche for short similar strings (100
    # distinct user-ids landed in 4 of 4096 registers without this)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad so rank <= 64-p+1
    # rank = leading zeros of rest + 1, via float64 exponent-free bit trick:
    # position of highest set bit
    rank = np.zeros(len(h), dtype=np.uint8)
    nz = rest != 0
    # log2 via float conversion is exact for the leading-bit position
    high = np.zeros(len(h), dtype=np.int64)
    high[nz] = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    # float rounding at 2^63 boundary: clamp into the valid rank range
    rank = (np.clip(high, 0, 64 - p) + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with small-range linear counting."""
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(2.0 ** -regs.astype(np.float64))
    if est <= 2.5 * m:
        zeros = int(np.sum(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(est)


def approx_ndistinct(
    ds: "ray.data.Dataset", col: str, p: int = 12
) -> tuple[int, float]:
    """Approximate distinct count of ``ds[col]``.

    Shuffle-free: each batch collapses to one register row inside
    ``map_batches``; the driver folds ``num_blocks`` tiny rows with
    elementwise max.  Returns ``(estimate, relative_standard_error)``.
    """

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_registers(t[col], p=p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    rows = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    m = 1 << p
    acc = np.zeros(m, dtype=np.uint8)
    for r in rows:
        acc = hll_merge(acc, np.frombuffer(r["regs"], dtype=np.uint8))
    return int(round(hll_estimate(acc))), 1.04 / np.sqrt(m)
