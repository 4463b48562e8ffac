"""Mergeable sketches for lake-scale profiling: HyperLogLog distinct count
and t-digest quantiles.  Both are shuffle-free: every batch collapses to a
tiny summary row inside ``map_batches`` and the driver folds block
summaries — the only sane shape for profiling a 100 TB column.

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


def _hash64(values) -> np.ndarray:
    """Avalanched 64-bit value hashes — the ONE hashing prelude shared by
    the HLL and KMV sketches (``raycdc.partition.hash_strings`` for
    strings, float bit patterns, splitmix64 finalizer on everything so
    both the top bits (HLL registers) and the total order (KMV minima)
    are uniform)."""
    from raycdc.partition import hash_strings

    arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    # SQL COUNT(DISTINCT) / set-op semantics: nulls are NOT values — drop
    # them before hashing so an all-null column estimates 0 distinct and a
    # null on both sides of approx_overlap never inflates the intersection.
    if arr.null_count:
        arr = arr.drop_null()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        h = hash_strings(arr).copy()
    elif pa.types.is_floating(arr.type):
        # hash the float64 BIT PATTERN (a double→int cast would raise on
        # fractional values); -0.0 vs 0.0 count as two values — fine for
        # profiling
        v = arr.cast(pa.float64()).to_numpy(zero_copy_only=False).astype(np.float64)
        h = v.view(np.uint64).copy()
    else:
        from raycdc.partition import int64_values

        v, valid = int64_values(arr)
        h = v.view(np.uint64).copy()
        if valid is not None:
            h[~valid] = 0  # nulls count as ONE deterministic value
    # splitmix64 finalizer on EVERY input: HLL reads the TOP p bits, and
    # FNV-1a's high bits barely avalanche for short similar strings (100
    # distinct user-ids landed in 4 of 4096 registers without this)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def hll_idx_rank(values, p: int = 12) -> tuple[np.ndarray, np.ndarray]:
    """Per-value ``(register index, rank)`` pairs — the vectorizable core
    of :func:`hll_registers`, exposed so GROUPED folds
    (:func:`raycdc.engine.maintain_distinct`) can scatter ranks into a
    ``(group, register)`` matrix in one ``np.maximum.at`` pass instead of
    filtering per group.

    One hash pass (:func:`_hash64`), top ``p`` bits pick the register,
    the leading-zero rank of the remaining bits is the value.  NULLs are
    dropped by the hash prelude, so the output may be SHORTER than the
    input — callers that need row alignment must drop nulls first.
    """
    h = _hash64(values)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad so rank <= 64-p+1
    # rank = leading zeros of rest + 1, via float64 exponent-free bit trick:
    # position of highest set bit
    nz = rest != 0
    # log2 via float conversion is exact for the leading-bit position
    high = np.zeros(len(h), dtype=np.int64)
    high[nz] = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    # float rounding at 2^63 boundary: clamp into the valid rank range
    rank = (np.clip(high, 0, 64 - p) + 1).astype(np.uint8)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    return idx, rank


def hll_registers(values, p: int = 12) -> np.ndarray:
    """One HLL register array (uint8[2^p]) for a column chunk.

    Vectorized: one hash pass (:func:`_hash64`), top ``p`` bits pick the
    register, the rank of the remaining bits' leading zeros updates it via
    ``np.maximum.at``.  NULLs are ignored (SQL COUNT(DISTINCT)).
    """
    idx, rank = hll_idx_rank(values, p=p)
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def registers_matrix(arr, m: int) -> np.ndarray:
    """Zero-copy view of a binary column of fixed-size register blobs as a
    ``(rows, m)`` uint8 matrix — the input shape for segmented register
    folds (``np.maximum.reduceat``).  Raises if any blob's length differs
    from ``m`` (a corrupt register row must never silently mis-slice)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("registers_matrix: null register blob")
    n = len(arr)
    if n == 0:
        return np.zeros((0, m), dtype=np.uint8)
    width = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=width)[
        arr.offset : arr.offset + n + 1
    ]
    if not np.all(np.diff(off) == m):
        raise ValueError(f"registers_matrix: blob lengths differ from m={m}")
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[int(off[0]) : int(off[0]) + n * m].reshape(n, m)


def matrix_to_binary(mat: np.ndarray) -> pa.Array:
    """Inverse of :func:`registers_matrix`: a ``(rows, m)`` uint8 matrix
    as a binary array of ``rows`` fixed-size blobs — built from buffers,
    no per-row ``tobytes`` loop."""
    rows, m = mat.shape
    if (rows + 1) * m > np.iinfo(np.int32).max:
        # binary() offsets are int32; past 2^31 bytes they would silently
        # wrap and corrupt every blob boundary (ADVICE r4).  ~524k groups
        # at p=12 — far above any bounded-groups view contract, so raising
        # beats quietly switching to large_binary and changing the schema.
        raise ValueError(
            f"matrix_to_binary: {rows} rows x {m} bytes overflows int32 "
            "binary offsets; fold in smaller partitions"
        )
    data = pa.py_buffer(np.ascontiguousarray(mat).tobytes())
    offsets = pa.py_buffer(
        np.arange(0, (rows + 1) * m, m, dtype=np.int32).tobytes()
    )
    return pa.Array.from_buffers(pa.binary(), rows, [None, offsets, data])


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta sketch) — SET-OPERATION estimates
#
# HLL answers "how many distinct"; KMV additionally answers "how much do
# two corpora OVERLAP" (|A∩B|, Jaccard) from two independently-built
# sketches — the dedup/decontamination PLANNING signal: estimate the
# cross-corpus duplicate mass in one cheap pass per corpus before paying
# for the exact pipeline.  (Beyer et al., "On synopses for distinct-value
# estimation under multiset operations", SIGMOD 2007.)


def kmv_sketch(values, k: int = 1024) -> np.ndarray:
    """Bottom-k sketch of a column chunk: the ``k`` smallest DISTINCT
    64-bit value hashes (sorted uint64; shorter when the chunk has fewer
    distinct values).  One hash pass + one unique-sort — no row loop."""
    h = np.unique(_hash64(values))  # unique also sorts
    return h[:k]


def kmv_merge(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """k smallest distinct hashes of the union — associative, commutative,
    idempotent (the mergeable-sketch contract)."""
    return np.unique(np.concatenate([a, b]))[:k]


def kmv_estimate(sk: np.ndarray, k: int) -> float:
    """Distinct-count estimate: EXACT below ``k`` (the sketch simply holds
    every distinct hash), else the order-statistics estimator
    ``(k-1) / kth_min`` on the unit interval."""
    if len(sk) < k:
        return float(len(sk))
    kth = float(sk[k - 1]) / float(1 << 64)  # k-th minimum mapped to (0,1)
    return (k - 1) / kth


def kmv_overlap(a: np.ndarray, b: np.ndarray, k: int) -> dict:
    """Set-operation estimates from two independently built sketches:
    ``{distinct_a, distinct_b, union, intersection, jaccard}``.

    The union sketch's members are a uniform sample of A∪B; the fraction
    of them present in BOTH input sketches estimates Jaccard, and
    intersection = jaccard × union.  Exact when both sides fit in k.
    """
    u = kmv_merge(a, b, k)
    est_a, est_b = kmv_estimate(a, k), kmv_estimate(b, k)
    est_u = kmv_estimate(u, k)
    if len(u) == 0:
        return {
            "distinct_a": 0.0, "distinct_b": 0.0,
            "union": 0.0, "intersection": 0.0, "jaccard": 0.0,
        }
    in_both = np.isin(u, a, assume_unique=True) & np.isin(
        u, b, assume_unique=True
    )
    jac = float(in_both.sum()) / float(len(u))
    return {
        "distinct_a": est_a,
        "distinct_b": est_b,
        "union": est_u,
        "intersection": jac * est_u,
        "jaccard": jac,
    }


def approx_overlap(
    ds_a: "ray.data.Dataset",
    col_a: str,
    ds_b: "ray.data.Dataset",
    col_b: str,
    k: int = 4096,
) -> dict:
    """Cross-corpus overlap profile in ONE cheap pass per corpus: each
    batch collapses to its bottom-k hashes inside ``map_batches``, the
    driver folds ``num_blocks`` tiny rows per side (≤ 8k·k bytes), and
    :func:`kmv_overlap` turns the two sketches into distinct/union/
    intersection/Jaccard estimates — the planning signal for "is exact
    dedup/decontamination between these corpora worth running".

    NULLs are ignored on both sides (SQL COUNT(DISTINCT)/set semantics):
    a null column value never counts as a member or an overlap."""

    def build(ds, col) -> np.ndarray:
        def partial(t: pa.Table) -> pa.Table:
            sk = kmv_sketch(t[col], k=k)
            return pa.table({"sk": pa.array([sk.tobytes()], pa.binary())})

        acc = np.empty(0, dtype=np.uint64)
        rows = ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        for r in rows:
            acc = kmv_merge(acc, np.frombuffer(r["sk"], dtype=np.uint64), k)
        return acc

    return kmv_overlap(build(ds_a, col_a), build(ds_b, col_b), k)


def hll_estimate_many(mat: np.ndarray) -> np.ndarray:
    """Row-wise :func:`hll_estimate` over a ``(groups, m)`` register
    matrix — one vectorized pass, bit-identical per row to the scalar
    function (pinned by tests): same alpha, same harmonic-mean sum
    order (C-contiguous axis=-1 reduction), same linear-counting branch."""
    mat = np.ascontiguousarray(mat, dtype=np.uint8)
    g, m = mat.shape
    if g == 0:
        return np.zeros(0, dtype=np.float64)
    est = _alpha(m) * m * m / np.sum(2.0 ** -mat.astype(np.float64), axis=-1)
    zeros = np.sum(mat == 0, axis=-1)
    small = (est <= 2.5 * m) & (zeros > 0)
    out = est
    if small.any():
        out = est.copy()
        out[small] = m * np.log(m / zeros[small])
    return out


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
    elementwise max.  NULLs are ignored (SQL COUNT(DISTINCT) semantics).
    Returns ``(estimate, relative_standard_error)``.
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


# ---------------------------------------------------------------------------
# t-digest quantiles — mergeable centroid sketch (Dunning & Ertl, 2019)


def tdigest_cluster(
    values: np.ndarray, weights: np.ndarray | None = None, delta: int = 200
) -> tuple[np.ndarray, np.ndarray]:
    """Compress (values, weights) into t-digest centroids ``(means,
    weights)`` — VECTORIZED k-bin clustering: sort, map each item's
    mid-quantile through the k1 scale function ``k(q) = δ/2π·asin(2q−1)``
    (fine bins near the tails, coarse in the middle), and merge items
    sharing a k-bin with one segmented weighted mean.  No per-item Python
    loop; size is O(δ) and error ~O(q(1−q)/δ)."""
    if weights is None:
        weights = np.ones(len(values))
    mask = ~np.isnan(values)
    values, weights = values[mask], weights[mask]
    if len(values) == 0:
        return np.empty(0), np.empty(0)
    order = np.argsort(values, kind="stable")
    v, w = values[order], weights[order]
    total = w.sum()
    cum = np.cumsum(w)
    q_mid = (cum - w / 2) / total
    k = (delta / (2 * np.pi)) * np.arcsin(2 * q_mid - 1)
    bins = np.floor(k).astype(np.int64)
    # segmented weighted mean per bin
    new = np.ones(len(v), dtype=bool)
    new[1:] = bins[1:] != bins[:-1]
    starts = np.where(new)[0]
    wv_cum = np.concatenate([[0.0], np.cumsum(v * w)])
    w_cum = np.concatenate([[0.0], cum])
    ends = np.append(starts[1:], len(v))
    seg_w = w_cum[ends] - w_cum[starts]
    seg_m = (wv_cum[ends] - wv_cum[starts]) / seg_w
    return seg_m, seg_w


def tdigest_merge(
    digests: "list[tuple[np.ndarray, np.ndarray]]", delta: int = 200
) -> tuple[np.ndarray, np.ndarray]:
    """Merge centroid sets (associative/commutative up to compression
    error): concatenate and re-cluster."""
    means = np.concatenate([d[0] for d in digests]) if digests else np.empty(0)
    weights = np.concatenate([d[1] for d in digests]) if digests else np.empty(0)
    return tdigest_cluster(means, weights, delta=delta)


def tdigest_quantile(
    means: np.ndarray, weights: np.ndarray, qs: "np.ndarray | list[float]"
) -> np.ndarray:
    """Quantile estimates by linear interpolation between centroid
    mid-quantiles (centroids assumed sorted by mean, as produced above)."""
    qs = np.asarray(qs, dtype=np.float64)
    if len(means) == 0:
        return np.full(len(qs), np.nan)
    total = weights.sum()
    cum = np.cumsum(weights)
    mids = (cum - weights / 2) / total
    return np.interp(qs, mids, means)


def approx_quantiles(
    ds: "ray.data.Dataset", col: str, qs: "list[float]", delta: int = 200
) -> np.ndarray:
    """Approximate quantiles of ``ds[col]`` — shuffle-free: each batch
    collapses to O(δ) centroid rows inside ``map_batches``; the driver
    folds ``num_blocks`` tiny digests.  Error ~O(q(1−q)/δ) (tight at the
    tails by construction of the k1 scale)."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        m, w = tdigest_cluster(v, delta=delta)
        return pa.table(
            {"means": pa.array([m.tobytes()]), "weights": pa.array([w.tobytes()])}
        )

    rows = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    digests = [
        (
            np.frombuffer(r["means"], dtype=np.float64),
            np.frombuffer(r["weights"], dtype=np.float64),
        )
        for r in rows
    ]
    means, weights = tdigest_merge(digests, delta=delta)
    return tdigest_quantile(means, weights, qs)


# ---------------------------------------------------------------------------
# count-min sketch — mergeable frequency estimates (Cormode & Muthukrishnan,
# J. Algorithms 2005)


_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _cms_hash(values, d: int, w: int) -> np.ndarray:
    """(d, n) column indices for each value under d pairwise hashes —
    buffer-level FNV over utf8 bytes (via partition.hash_strings) mixed
    with d odd multipliers; vectorized, no Python loop over rows."""
    from raycdc.partition import hash_strings

    if not (1 <= d <= len(_CMS_SEEDS)):
        raise ValueError(
            f"count-min d must be in [1, {len(_CMS_SEEDS)}] (got {d}) — "
            "add seeds to _CMS_SEEDS to widen"
        )
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if pa.types.is_string(values.type) or pa.types.is_large_string(values.type):
        h = hash_strings(values)
    else:
        from raycdc.partition import int64_values

        v, valid = int64_values(values)
        h = v.view(np.uint64)
        if valid is not None:
            h = h.copy()
            h[~valid] = 0  # deterministic null hash (never NaN garbage)
    with np.errstate(over="ignore"):
        mixed = h[None, :] * _CMS_SEEDS[:d, None]
        mixed ^= mixed >> np.uint64(29)
    return (mixed % np.uint64(w)).astype(np.int64)


def cms_counts(values, d: int = 4, w: int = 2048) -> np.ndarray:
    """One batch's count-min register matrix (d rows of w counters):
    every value increments one counter per row.  Mergeable by elementwise
    SUM (associative/commutative), so batch partials fold in any order —
    the frequency analog of the HLL register fold above.

    Null contract: NULLs all hash to ONE deterministic slot, i.e. they
    count as a single pseudo-value (cms_estimate of a null-heavy column
    reflects the null count) — unlike the HLL/KMV/Bloom sketches, which
    ignore nulls; CMS keeps them because per-row alignment in
    cms_estimate cannot drop rows."""
    regs = np.zeros((d, w), dtype=np.int64)
    idx = _cms_hash(values, d, w)
    for r in range(d):  # d is a small constant (4), each iteration whole-batch
        np.add.at(regs[r], idx[r], 1)
    return regs


def cms_estimate(regs: np.ndarray, values) -> np.ndarray:
    """Point estimates for ``values``: min over the d counters.  Always
    >= the true count; overestimate bounded by eps*N with prob 1-delta
    (eps = e/w, delta = e^-d)."""
    d, w = regs.shape
    idx = _cms_hash(values, d, w)
    return np.min(regs[np.arange(d)[:, None], idx], axis=0)


def approx_top_counts(
    ds: "ray.data.Dataset",
    col: str,
    candidates,
    d: int = 4,
    w: int = 2048,
) -> "pa.Table":
    """Approximate frequencies of ``candidates`` in ``ds[col]`` from ONE
    shuffle-free pass: each batch collapses to a (d, w) register row inside
    ``map_batches``; the driver folds ``num_blocks`` fixed-size partials by
    elementwise sum and answers every candidate from the merged sketch.
    Use when the candidate set is known (monitored event types, tracked
    vocabulary) and the column is too wide to afford a groupby — the
    exchange for an exact count is O(distinct keys); this is O(blocks).
    """

    def partial(t: pa.Table) -> pa.Table:
        regs = cms_counts(t[col], d=d, w=w)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    rows = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    acc = np.zeros((d, w), dtype=np.int64)
    for r in rows:
        acc += np.frombuffer(r["regs"], dtype=np.int64).reshape(d, w)
    cand = pa.array(candidates) if not isinstance(candidates, pa.Array) else candidates
    est = cms_estimate(acc, cand)
    return pa.table({col: cand, "approx_count": pa.array(est)})


# ---------------------------------------------------------------------------
# Bloom filter — mergeable approximate membership (Bloom, CACM 1970)


def _bloom_hash_pair(values) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams per value (Kirsch–Mitzenmacher
    double hashing: k indices from h1 + j*h2).  Same base hash path as the
    other sketches (buffer-level FNV for strings, bit pattern for ints),
    split into two streams by distinct splitmix64 finalizers."""
    from raycdc.partition import hash_strings

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if pa.types.is_string(values.type) or pa.types.is_large_string(values.type):
        h = hash_strings(values).copy()
    else:
        from raycdc.partition import int64_values

        v, valid = int64_values(values)
        h = v.view(np.uint64).copy()
        if valid is not None:
            h[~valid] = 0  # deterministic null hash (never NaN garbage)

    def mix(x: np.ndarray, salt: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            x = x ^ np.uint64(salt)
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
        return x

    h1 = mix(h, 0x9E3779B97F4A7C15)
    h2 = mix(h, 0xD1B54A32D192ED03) | np.uint64(1)  # odd: full-period stride
    return h1, h2


def bloom_bits(values, num_bits: int, k: int = 7) -> np.ndarray:
    """One batch's Bloom register array, packed as uint64 words
    (``num_bits/64`` of them).  Mergeable by elementwise OR — associative,
    commutative, idempotent — so batch partials fold in any order and
    REBUILDS over overlapping data cost nothing (unlike CMS sums)."""
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    words = np.zeros(num_bits // 64, dtype=np.uint64)
    # SQL join-key semantics: a NULL key never matches anything, so null
    # build-side rows must not set bits (they'd make probe-side nulls or
    # hash-collisions look like members).
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if values.null_count:
        values = values.drop_null()
    if len(values) == 0:
        return words
    h1, h2 = _bloom_hash_pair(values)
    with np.errstate(over="ignore"):
        for j in range(k):  # k is a small constant; each pass is whole-batch
            idx = (h1 + np.uint64(j) * h2) % np.uint64(num_bits)
            np.bitwise_or.at(
                words, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
    return words


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


def bloom_contains(words: np.ndarray, values, k: int = 7) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (false-positive
    rate ~(1-e^{-kn/m})^k), False = DEFINITELY absent — Bloom's one-sided
    guarantee, which is what makes the anti-join safe.

    NULL keys probe as False (definitely absent): SQL equality never
    matches a NULL, so a semi-join drops null-key rows and an anti-join
    keeps them — same as an exact hash join would."""
    num_bits = len(words) * 64
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    null_mask = None
    if values.null_count:
        null_mask = ~np.asarray(values.is_valid())
    h1, h2 = _bloom_hash_pair(values)
    out = np.ones(len(h1), dtype=bool)
    with np.errstate(over="ignore"):
        for j in range(k):
            idx = (h1 + np.uint64(j) * h2) % np.uint64(num_bits)
            bit = (
                words[(idx >> np.uint64(6)).astype(np.int64)]
                >> (idx & np.uint64(63))
            ) & np.uint64(1)
            out &= bit.astype(bool)
    if null_mask is not None:
        out[null_mask] = False
    return out


def bloom_build(
    ds: "ray.data.Dataset", col: str, num_bits: int = 1 << 20, k: int = 7
) -> np.ndarray:
    """Build one Bloom filter over ``ds[col]`` shuffle-free: each batch
    collapses to a packed register row inside ``map_batches``; the driver
    ORs ``num_blocks`` fixed-size partials (``num_bits/8`` bytes each —
    the data never moves).  NULL keys set no bits (a NULL never joins).
    Size for ~1% FPR: ``num_bits ≈ 9.6 × n``, ``k = 7``."""

    def partial(t: pa.Table) -> pa.Table:
        regs = bloom_bits(t[col], num_bits=num_bits, k=k)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    rows = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    acc = np.zeros(num_bits // 64, dtype=np.uint64)
    for r in rows:
        acc = bloom_merge(acc, np.frombuffer(r["regs"], dtype=np.uint64))
    return acc


def bloom_semi_join(
    ds: "ray.data.Dataset",
    col: str,
    words: np.ndarray,
    k: int = 7,
    negate: bool = False,
) -> "ray.data.Dataset":
    """Filter ``ds`` by approximate membership of ``col`` in a built
    filter — the 100 TB pre-filter in front of an exact join/dedup: the
    filter broadcasts ONCE via ``ray.put`` (never per batch), each batch
    probes locally, nothing shuffles.

    ``negate=False`` (semi): keeps maybe-members — exact false positives
    survive for a downstream exact pass to kill.  ``negate=True`` (anti):
    keeps DEFINITE non-members — no false negatives means no survivor is
    wrongly dropped, so an anti-join against a dedup index / eval set is
    SAFE without any second pass.

    NULL probe keys are definite non-members (SQL: NULL = x is never
    true), so semi drops them and anti keeps them — matching the exact
    hash join both modes pre-filter for."""
    import ray

    ref = ray.put(words)

    class Probe:
        def __init__(self):
            self.words = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            hit = bloom_contains(self.words, t[col], k=k)
            return t.filter(pa.array(~hit if negate else hit))

    return ds.map_batches(
        Probe,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
