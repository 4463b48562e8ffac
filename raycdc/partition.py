"""Hash partitioning + hot-key salting.

The reference's unit of distribution is one file per Cloud Functions
invocation (``/root/reference/examples/quickstart/deploy.sh:57-63``); there is
no keyed routing.  Here routing is explicit: every change row gets a stable
``part_key = hash(conv_id) % P`` so all changes for a conversation meet in
one merge partition, and the lake layout ``part=K`` is a pure function of the
key — which is what makes partition rewrites idempotent.

Hash: vectorized FNV-1a computed directly over the Arrow string buffers
(numpy byte-column sweep — no Python-object materialization, deterministic
across processes/machines/library versions; NOT Python's seeded ``hash()``).
Version-stability matters: the lake's partition layout is a pure function of
this hash, so changing it would orphan rows in old partitions.

Salting: a hot conversation (millions of turns) would bottleneck one merge
partition.  Because the upsert key is ``(conv_id, turn_idx)``, salting by
``turn_idx % S`` keeps identical keys co-located while spreading a hot
conversation over S sub-partitions; a salted partial merge dedups per
sub-partition before the final unsalted merge (SURVEY.md §2.6, §7.1.6).
"""

from __future__ import annotations

import numpy as np
import pandas.util
import pyarrow as pa
import pyarrow.compute as pc

PART_KEY = "part_key"
SALT_KEY = "salt_key"


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def hash_strings(
    arr: pa.ChunkedArray | pa.Array | np.ndarray, seed: int = 0
) -> np.ndarray:
    """Deterministic uint64 FNV-1a hash of a string column.

    Arrow inputs are hashed straight off the UTF-8 value buffer with one
    vectorized pass per byte position (strings in one column are short, so
    the position loop is ~10 iterations) — zero per-row Python objects.
    numpy object arrays fall back to pandas' SipHash.

    ``seed`` perturbs the FNV offset basis (splitmix-mixed), giving
    independent hash families — e.g. the two halves of a 128-bit content
    identity.  numpy-array inputs ignore the seed (SipHash fallback).
    """
    if isinstance(arr, np.ndarray):
        return pandas.util.hash_array(np.asarray(arr, dtype=object), categorize=False)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, np.uint64)
    # offsets width differs: string → int32, large_string → int64
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"hash_strings: unsupported type {arr.type}")
    bufs = arr.buffers()
    # keep the value buffer as uint8 (zero-copy view); only the gathered
    # per-position slice (len(arr) elements) is widened to uint64
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] else np.empty(0, np.uint8)
    off = np.frombuffer(bufs[1], off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    starts = off[:-1]  # absolute positions into the shared values buffer
    lens = np.diff(off)
    offset = _FNV_OFFSET
    if seed:
        s = np.uint64(seed)
        with np.errstate(over="ignore"):
            s = (s ^ (s >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            s = (s ^ (s >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            offset = offset ^ (s ^ (s >> np.uint64(31)))
    h = np.full(len(arr), offset, np.uint64)
    maxlen = int(lens.max())
    with np.errstate(over="ignore"):
        if maxlen:
            # length-sorted sweep: position p touches ONLY the rows longer
            # than p (a contiguous suffix of the sort), so total work is
            # O(sum(lens) + n log n).  The naive `lens > pos` mask per
            # position is O(n·maxlen): one long outlier document in a
            # batch (dedup hashes whole texts) made every position pass
            # rescan the entire batch.
            order = np.argsort(lens, kind="stable")
            starts_s, lens_s = starts[order], lens[order]
            h_s = h[order]
            for pos in range(maxlen):
                lo = int(np.searchsorted(lens_s, pos + 1, side="left"))
                seg = slice(lo, len(h_s))
                h_s[seg] = (
                    h_s[seg] ^ data[starts_s[seg] + pos].astype(np.uint64)
                ) * _FNV_PRIME
            h[order] = h_s
    if arr.null_count:
        h[~np.asarray(arr.is_valid())] = 0
    return h


def int64_values(
    col: pa.ChunkedArray | pa.Array,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Null-safe int64 extraction for hashing: nulls are filled with 0
    BEFORE the numpy round-trip — a null-bearing int column otherwise
    converts to float64, silently corrupting every value above 2^53 and
    making the result BATCH-dependent (the same key hashing differently
    because a NEIGHBORING row is null breaks the lake-layout purity
    contract).  Returns ``(int64 values, validity mask or None)``; callers
    assign null positions their own fixed hash."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.int64())
    valid = None
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        arr = pc.fill_null(arr, 0)
    return arr.to_numpy(zero_copy_only=False).astype(np.int64), valid


def hash_key_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 hash of one partition-key column: strings via buffer-level
    FNV-1a (:func:`hash_strings`), integers/timestamps via a splitmix-style
    golden-ratio mix.  Pure function of the DATA (never of cluster size) —
    the lake-layout contract."""
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return hash_strings(col)
    vals, valid = int64_values(col)
    h = _splitmix(vals.view(np.uint64))
    if valid is not None:
        h[~valid] = 0
    return h


def add_part_key(
    batch: pa.Table,
    key_col: str = "conv_id",
    num_partitions: int = 32,
    col_name: str = PART_KEY,
) -> pa.Table:
    """map_batches body: append ``part_key = hash(key_col) % P`` (int32)."""
    pk = (hash_key_column(batch[key_col]) % np.uint64(num_partitions)).astype(
        np.int32
    )
    return batch.append_column(col_name, pa.array(pk))


def add_salt_key(
    batch: pa.Table,
    salt_col: str = "turn_idx",
    num_salts: int = 8,
    part_col: str = PART_KEY,
    col_name: str = SALT_KEY,
) -> pa.Table:
    """Append ``salt_key = part_key * S + (salt_col % S)`` for the salted
    pre-merge round.  Same upsert key ⇒ same salt ⇒ LWW-safe.

    Null key components are a data error and fail fast (a NaN→int cast
    would otherwise produce platform-dependent salts and break the
    co-location invariant)."""
    col = batch[salt_col]
    if col.null_count:
        raise ValueError(
            f"add_salt_key: {col.null_count} null value(s) in key column "
            f"{salt_col!r} — upsert key components must be non-null"
        )
    salt_vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64) % num_salts
    part_vals = batch[part_col].to_numpy(zero_copy_only=False).astype(np.int64)
    sk = (part_vals * num_salts + salt_vals).astype(np.int32)
    return batch.append_column(col_name, pa.array(sk))


def bucket_keys(
    table: pa.Table, key_cols, num_buckets: int
) -> pa.Array:
    """Deterministic int64 bucket in ``[0, num_buckets)`` from one or more
    key columns (strings via FNV-1a, numerics/timestamps via a golden-ratio
    multiply; columns combined positionally).

    THE scale guard for ``groupby().map_groups``: Ray dispatches one Python
    UDF call PER DISTINCT KEY, so a high-cardinality groupby pays O(keys)
    interpreter overhead (measured: 183k-group rollup 61 s grouped by raw
    keys vs 2 s grouped by bucket).  Group by the bucket instead —
    ``num_buckets`` UDF calls — and let the group kernel handle the
    multiple keys inside one vectorized pass (every kernel in
    ``relational.py`` sorts by its real keys and segments internally).  A
    bucket is a pure function of the key tuple, so co-location is
    preserved."""
    h = np.zeros(len(table), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for ci, k in enumerate(key_cols):
            col = table[k]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                kh = hash_strings(col)
            else:
                vals, valid = int64_values(col)
                kh = vals.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                if valid is not None:
                    # fixed null marker: nulls group together (SQL
                    # PARTITION BY) and never inherit float-NaN garbage
                    kh[~valid] = np.uint64(0x5851F42D4C957F2D)
            h = (h ^ kh) * np.uint64(1099511628211 + 2 * ci)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int64))


def segment_starts(sorted_keys: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Start index of every equal-key run in an ALREADY-SORTED key column
    — the canonical boundary kernel behind the repo's "sort + segmented
    reduceat" convention (CLAUDE.md): callers sort once, call this once,
    then ``np.{minimum,maximum,add}.reduceat`` / ``xor.reduceat`` over
    the starts instead of per-group filters.  One copy of the subtle
    ``np.r_[0, flatnonzero(neq) + 1]`` construction instead of one per
    view kernel (r5 review).

    Returns int64 starts (``[0]`` first; empty input → empty array).
    Null keys are refused loudly: ``pc.not_equal`` yields null for them,
    which would silently merge or split runs depending on fill — the
    repo's group keys are non-null by contract (null groups raise at the
    view boundary)."""
    if isinstance(sorted_keys, pa.ChunkedArray):
        sorted_keys = sorted_keys.combine_chunks()
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(0, np.int64)
    if sorted_keys.null_count:
        raise ValueError(
            "segment_starts: null keys are unsupported — fill or filter "
            "them before segmenting"
        )
    neq = np.asarray(
        pc.not_equal(sorted_keys.slice(1), sorted_keys.slice(0, n - 1))
    )
    return np.r_[0, np.flatnonzero(neq) + 1].astype(np.int64)


def key_codes(col) -> np.ndarray:
    """Null-safe dense int64 codes for segmenting/sorting one key column
    inside a group kernel: dictionary codes for every type (order across
    keys is irrelevant to segmentation), nulls → -1 (one group, never
    colliding with a real code).

    The raw ``dictionary_encode().indices.to_numpy()`` idiom is NOT
    null-safe: null indices surface as NaN floats and ``astype(int64)``
    collapses them to one garbage-but-uniform code that can collide with a
    real key — join kernels must additionally treat ``-1`` per their null
    semantics (SQL equality: never matches; GROUP BY: groups together).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return (
        col.dictionary_encode()
        .indices.fill_null(-1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def _splitmix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (the repo's standard
    avalanche; see hash_key_column)."""
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def _value_bits(vals: np.ndarray) -> np.ndarray:
    """Injective uint64 image of a primitive value array's BIT PATTERNS
    (equality-preserving; never a lossy numeric cast)."""
    v = np.ascontiguousarray(vals)
    size = v.dtype.itemsize
    if size == 8:
        return v.view(np.uint64).copy()
    if size == 4:
        return v.view(np.uint32).astype(np.uint64)
    if size == 2:
        return v.view(np.uint16).astype(np.uint64)
    if size == 1:
        return v.view(np.uint8).astype(np.uint64)
    raise TypeError(f"_value_bits: unsupported itemsize {size}")


def _child_bits(arr: pa.Array) -> np.ndarray:
    """uint64 equality image of a list column's CHILD slice: primitive
    children via their bit patterns (:func:`_value_bits`), string/binary
    children via the vectorized FNV-1a column hash (:func:`hash_strings`
    — so ``tags list<string>`` columns are CDC-able too; a null string
    element spans zero value bytes and hashes like ``""`` — an
    acceptable collision for change detection, same contract as null
    float elements hashing as their fill pattern).  Deeper nesting and
    null-bearing non-float children are refused with a NAMED error
    instead of numpy's cryptic object-array TypeError (r5 review)."""
    t = arr.type
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        return hash_strings(arr)
    if pa.types.is_nested(t):
        raise TypeError(
            f"nested_row_hash: child type {t} is unsupported — only "
            "lists of primitives, strings or binary compare via the row "
            "hash; flatten deeper nesting upstream"
        )
    if arr.null_count and not pa.types.is_floating(t):
        # to_numpy would promote the WHOLE slice (int → float64, bool →
        # object) to represent the nulls, so one null element would
        # change the bit patterns — and hence the hashes — of every
        # NEIGHBORING row in the slice: spurious diffs, not just a local
        # collision.  Floats are safe (nulls keep a NaN fill pattern,
        # the dtype never changes); everything else is refused by name.
        raise TypeError(
            f"nested_row_hash: child type {t} with null elements is "
            "unsupported — fill or drop the null elements upstream "
            "(null float elements are fine: they keep a NaN bit pattern)"
        )
    vals = arr.to_numpy(zero_copy_only=False)
    if vals.dtype == object:
        raise TypeError(
            f"nested_row_hash: child type {t} materializes as Python "
            "objects — only primitive, string or binary children hash"
        )
    return _value_bits(vals)


def nested_row_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Order-sensitive uint64 per-ROW hash of a nested column —
    (fixed_size_)list of primitives, strings or binary — for EQUALITY
    comparison where Arrow has no ``not_equal`` kernel (the
    snapshot-diff kernel's path for embedding columns: two rows hash
    equal iff their element bit patterns and length match, so vector
    columns become CDC-able).

    One vectorized pass: element bits ⊕ position-salt → splitmix →
    xor-reduce per row segment → fold in the row length.  Null ROWS get
    an arbitrary stable value — callers mask them with validity (the
    diff kernel compares ``is_valid`` separately).  Null ELEMENTS inside
    a list hash as their NaN/fill bit pattern (a null float element and
    a quiet-NaN element collide — acceptable for change detection).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_fixed_size_list(t):
        n = len(col)
        width = t.list_size
        if n == 0 or width == 0:
            return np.full(n, np.uint64(width), np.uint64)
        # .values (NOT .flatten()): flatten DROPS null rows' slots and the
        # reshape below would misalign every row after the first null; the
        # raw child keeps one width-slot span per row.  Null rows hash
        # whatever bits sit in their span — arbitrary but never consulted
        # (callers compare validity separately, per the docstring).
        bits = _child_bits(col.values.slice(col.offset * width, n * width))
        pos = np.tile(np.arange(width, dtype=np.uint64), n)
        h = _splitmix(bits ^ _splitmix(pos))
        out = np.bitwise_xor.reduce(h.reshape(n, width), axis=1)
        return _splitmix(out ^ np.uint64(width))
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        n = len(col)
        if n == 0:
            return np.zeros(0, np.uint64)
        width_t = np.int64 if pa.types.is_large_list(t) else np.int32
        offs = np.frombuffer(col.buffers()[1], dtype=width_t)[
            col.offset : col.offset + n + 1
        ].astype(np.int64)
        lens = np.diff(offs)
        out = np.zeros(n, np.uint64)
        if offs[-1] > offs[0]:
            bits = _child_bits(
                col.values.slice(int(offs[0]), int(offs[-1] - offs[0]))
            )
            row_of = np.repeat(np.arange(n), lens)
            pos_in_row = (
                np.arange(offs[0], offs[-1], dtype=np.int64)
                - offs[:-1][row_of]
            )
            h = _splitmix(bits ^ _splitmix(pos_in_row.astype(np.uint64)))
            nz = lens > 0
            # reduceat spans nonempty start → next nonempty start: empty
            # rows own no elements, so each span is exactly one row
            out[nz] = np.bitwise_xor.reduceat(
                h, (offs[:-1] - offs[0])[nz]
            )
        return _splitmix(out ^ lens.astype(np.uint64))
    raise TypeError(f"nested_row_hash: unsupported type {t}")
