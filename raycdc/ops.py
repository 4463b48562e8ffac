"""Projector operator library — vectorized Arrow batch transforms.

The generalized, columnar analogs of the reference's per-row ``Projector``
closures (``/root/reference/handler.go:51,141-186`` and the ``contrib``
handler bodies).  Every function here is a pure ``pyarrow`` kernel suitable
as (part of) a ``map_batches`` body — no Python row loops.

Reference parity map (SURVEY.md §2.3):

* :func:`clean_number`        — ``CleanNumber`` (contrib/handlers/handlers.go:36-51)
* :func:`parse_date_multi`    — T1/T3/T4/T5 date normalizers
  (examples/quickstart/bqload.go:37-49, contrib/handlers/sony_bank.go:15-29,
  rakuten_bank.go:15-24)
* :func:`parse_wareki_date`   — T6 era fallback (contrib/handlers/smbc.go:15-41)
* :func:`filter_nonempty`     — T7/T8/T9 empty-row drop
  (contrib/handlers/smbc_card.go:62-64)
* :func:`append_constant`     — T7/M1-M4 metadata-broadcast column append
  (contrib/handlers/smbc_card.go:79)
* :func:`project`             — T10/T11 reorder/rename/computed reprojection
  (contrib/handlers/sbi_securities.go:15-41, amex_csv.go:32-68)
* :class:`RowErrorPolicy` semantics — projector error-with-provenance vs
  drop (handler.go:163-169): see :func:`checked`.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# numeric cleaning (T2)


def clean_number(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Strip currency marks / grouping commas from a string column.

    Keeps digits and ``.`` anywhere; keeps a ``-`` only when it is the
    FIRST character of the cell (``i == 0`` in the reference's byte loop —
    ``"¥-123"→"123"``, and a trailing ``-`` as in ``"¥12345-"`` is bank
    notation, dropped); the exact result ``"-"`` becomes ``""``, every
    other digit-free residue (e.g. ``"."``) passes through verbatim.

    Cell-for-cell equal to the reference's ``CleanNumber``
    (``/root/reference/contrib/handlers/handlers.go:36-51``; cases
    ``handlers_test.go:80-90``): ``"12,345"→"12345"``,
    ``"306.4800USD"→"306.4800"``, ``"257,345円"→"257345"``,
    ``"-12,345"→"-12345"``, ``"¥12345-"→"12345"``, ``"-"→""``.
    """
    body = pc.replace_substring_regex(arr, pattern=r"[^0-9.]", replacement="")
    negative = pc.starts_with(arr, "-")
    signed = pc.if_else(
        negative,
        pc.binary_join_element_wise(pa.scalar("-"), body, pa.scalar("")),
        body,
    )
    return pc.if_else(pc.equal(signed, "-"), pa.scalar(""), signed)


# ---------------------------------------------------------------------------
# date parsing / normalization (T1, T4, T5)


def parse_date_multi(
    arr: pa.ChunkedArray | pa.Array,
    formats: Sequence[str] = ("%Y/%m/%d",),
    *,
    out_format: str = "%Y-%m-%d",
    error_ok: bool = True,
) -> pa.ChunkedArray | pa.Array:
    """Parse a string date column trying ``formats`` in order; re-emit as
    ``out_format`` strings (null where nothing matched).

    Covers the reference's per-format patterns: ``%Y/%m/%d`` (quickstart/SBI/
    AMEX), ``%Y%m%d`` (rakuten_bank.go:17), ``%Y年%m月%d日``
    (sony_bank.go:16).
    """
    parsed: pa.ChunkedArray | None = None
    for fmt in formats:
        attempt = pc.strptime(arr, format=fmt, unit="us", error_is_null=True)
        parsed = attempt if parsed is None else pc.coalesce(parsed, attempt)
    if not error_ok:
        n_bad = len(arr) - len(pc.drop_null(parsed)) - arr.null_count
        if n_bad:
            bad = pc.filter(arr, pc.and_(pc.is_null(parsed), pc.is_valid(arr)))
            raise ValueError(
                f"{n_bad} unparseable date cells, first: {bad[0].as_py()!r}"
            )
    return pc.strftime(parsed, format=out_format)


_ERA_BASE = {"H": 1988, "R": 2018}  # Heisei, Reiwa (smbc.go:18-24)


def parse_wareki_date(
    arr: pa.ChunkedArray | pa.Array,
    *,
    fallback_formats: Sequence[str] = ("%Y/%m/%d",),
    out_format: str = "%Y-%m-%d",
) -> pa.ChunkedArray | pa.Array:
    """T6: try plain formats first, then Japanese-era notation ``R01.12.04``
    (era letter + 2-digit era-year + .MM.DD) — ``R01.12.04 → 2019-12-04``,
    ``H31.04.30 → 2019-04-30``.  Unknown eras (e.g. ``S64.01.07``) and
    malformed era strings (``R1.5.2``) yield null, matching the reference's
    error cases (``/root/reference/contrib/handlers/smbc_test.go:12-51``).
    """
    plain = None
    for fmt in fallback_formats:
        attempt = pc.strptime(arr, format=fmt, unit="us", error_is_null=True)
        plain = attempt if plain is None else pc.coalesce(plain, attempt)
    plain_str = pc.strftime(plain, format=out_format)

    groups = pc.extract_regex(arr, r"^(?P<era>[A-Z])(?P<yy>\d\d)\.(?P<mm>\d\d)\.(?P<dd>\d\d)$")
    era = pc.struct_field(groups, "era")
    yy = pc.cast(pc.struct_field(groups, "yy"), pa.int32())
    # era base lookup (vectorized): index_in against the known-era list
    known = pa.array(list(_ERA_BASE))
    bases = pa.array(list(_ERA_BASE.values()), pa.int32())
    idx = pc.index_in(era, value_set=known)
    base = pc.take(bases, idx)  # null for unknown era
    year = pc.add(base, yy)
    wareki_str = pc.binary_join_element_wise(
        pc.cast(year, pa.string()),
        pc.struct_field(groups, "mm"),
        pc.struct_field(groups, "dd"),
        "-",
    )
    # strict round-trip: C strptime normalizes impossible dates (02-30 →
    # 03-02), so re-format and require equality with the constructed string
    parsed_ts = pc.strptime(wareki_str, format="%Y-%m-%d", unit="us", error_is_null=True)
    valid = pc.equal(pc.strftime(parsed_ts, format="%Y-%m-%d"), wareki_str)
    wareki_norm = pc.if_else(
        pc.fill_null(valid, False),
        pc.strftime(parsed_ts, format=out_format),
        pa.scalar(None, pa.string()),
    )
    return pc.coalesce(plain_str, wareki_norm)


# ---------------------------------------------------------------------------
# filters / appends / projection (T7-T11, M1-M4)


def filter_nonempty(batch: pa.Table, col: str) -> pa.Table:
    """Drop rows whose ``col`` is null or ``""`` — the projector
    ``return nil, nil`` row-skip (handler.go:167-169, smbc_card.go:62-64)."""
    c = batch[col]
    keep = pc.and_kleene(pc.is_valid(c), pc.not_equal(c, ""))
    return batch.filter(pc.fill_null(keep, False))


def append_constant(batch: pa.Table, name: str, value, dtype=None) -> pa.Table:
    """Broadcast one scalar (segment metadata) to every row of the batch —
    the Preprocessor→context→Projector flow (smbc_card.go:46-59,79)."""
    scalar = pa.scalar(value, dtype) if dtype is not None else pa.scalar(value)
    return batch.append_column(name, pa.repeat(scalar, len(batch)))


def project(
    batch: pa.Table,
    columns: Mapping[str, str | Callable[[pa.Table], pa.Array]],
) -> pa.Table:
    """Build a new table from selected / renamed / computed columns, in the
    mapping's order — the generalized reprojection operator
    (sbi_securities.go:15-41 reorder, amex_csv.go:52-66 shift).

    ``columns`` maps output name → input column name, or output name → a
    callable ``table -> array`` for computed columns.
    """
    arrays, names = [], []
    for out_name, src in columns.items():
        arrays.append(batch[src] if isinstance(src, str) else src(batch))
        names.append(out_name)
    return pa.table(arrays, names=names)


# ---------------------------------------------------------------------------
# deterministic sampling / splitting (training-data primitives)

_KNUTH = 2654435761  # Knuth multiplicative hash constant
_MOD = 1 << 32


def hash_bucket(arr: pa.ChunkedArray | pa.Array, buckets: int = 10_000):
    """Deterministic bucket in [0, buckets) from an INTEGER key column via
    Knuth multiplicative hashing — reproducible in any engine with 64-bit
    integer arithmetic (the property that makes the sample auditable:
    ``(key * 2654435761) % 2^32 * buckets / 2^32``).

    Null keys yield a NULL bucket — exactly what the SQL oracle formula
    produces — so downstream ``<`` filters drop them on every engine
    identically (the raw NaN→uint64 cast was platform-dependent)."""
    import numpy as np

    from raycdc.partition import int64_values

    vals, valid = int64_values(arr)
    k = vals.astype(np.uint64)
    h = (k * np.uint64(_KNUTH)) % np.uint64(_MOD)
    b = ((h * np.uint64(buckets)) // np.uint64(_MOD)).astype(np.int64)
    if valid is not None:
        return pa.array(b, mask=~valid)
    return pa.array(b)


def hash_sample(batch: pa.Table, key_col: str, fraction: float) -> pa.Table:
    """Keep a deterministic ``fraction`` of rows by key hash.

    Never materializes or shuffles anything — a pure per-batch filter, so a
    10^10-row sample is exactly as streamable as the source.  Same key ⇒
    same decision across runs/engines (stable experiment membership).
    """
    b = hash_bucket(batch[key_col])
    # round (not truncate): float representation error on e.g. 0.043*10000
    # must not shift the cutoff; keeps hash_sample and train_split aligned
    keep = pc.less(b, int(round(fraction * 10_000)))
    return batch.filter(keep)


def stratified_sample(
    batch: pa.Table,
    key_col: str,
    strata_col: str,
    fractions: "Mapping[str, float]",
    default_fraction: float = 0.0,
) -> pa.Table:
    """Keep a per-stratum deterministic fraction of rows (class-balanced
    downsampling: e.g. 100% of rare 'purchase' events, 10% of 'view').

    Same pure per-batch filter shape as :func:`hash_sample` — no shuffle,
    no state; the cutoff varies by ``strata_col`` value.  Auditable in SQL
    with a CASE over the same Knuth hash."""
    b = hash_bucket(batch[key_col])
    strata = batch[strata_col]
    cutoff = pa.nulls(len(batch), pa.int64())
    cutoff = pc.fill_null(cutoff, int(round(default_fraction * 10_000)))
    for value, frac in fractions.items():
        # null-safe: pc.equal(null, v) is null and if_else would NULL the
        # cutoff, silently dropping the whole null stratum — null strata
        # must take the default fraction
        cond = pc.fill_null(pc.equal(strata, value), False)
        cutoff = pc.if_else(
            cond,
            pa.scalar(int(round(frac * 10_000)), pa.int64()),
            cutoff,
        )
    return batch.filter(pc.less(b, cutoff))


def train_split(
    batch: pa.Table,
    key_col: str,
    out_col: str = "split",
    fractions: Mapping[str, float] = None,
) -> pa.Table:
    """Append a deterministic train/val/test split column keyed on
    ``key_col`` (default 80/10/10).  Keys stay in their split forever —
    the leakage-safe property entity-level splits need."""
    fractions = dict(fractions or {"train": 0.8, "val": 0.1, "test": 0.1})
    b = hash_bucket(batch[key_col])
    names = list(fractions)
    bounds = []
    acc = 0.0
    for name in names:
        acc += fractions[name]
        bounds.append(int(round(acc * 10_000)))
    out = pa.nulls(len(batch), pa.string())
    lo = 0
    for name, hi in zip(names, bounds):
        mask = pc.and_(pc.greater_equal(b, lo), pc.less(b, hi))
        out = pc.if_else(mask, pa.scalar(name), out)
        lo = hi
    return batch.append_column(out_col, out)


# ---------------------------------------------------------------------------
# error policy (handler.go:163-169 analog)


def checked(
    fn: Callable[[pa.Table], pa.Table],
    *,
    dead_letter: Callable[[pa.Table, Exception], None] | None = None,
    provenance_cols: Sequence[str] = ("seg_id", "lsn"),
) -> Callable[[pa.Table], pa.Table]:
    """Wrap a batch transform with the reference's error policy: by default
    an error fails the job annotated with row provenance (the analog of
    "record error at line N", handler.go:163-165); with ``dead_letter`` set,
    the failing batch is handed to the dead-letter callback and dropped
    instead (the policy the reference lacks, SURVEY.md §2.3)."""

    def wrapped(batch: pa.Table) -> pa.Table:
        try:
            return fn(batch)
        except Exception as e:  # noqa: BLE001 - policy boundary
            if dead_letter is not None:
                dead_letter(batch, e)
                # emit a zero-row batch in the PROJECTED schema so the
                # stream stays schema-homogeneous; data-dependent errors
                # pass on empty input, else fall back to the input schema
                try:
                    return fn(batch.slice(0, 0))
                except Exception:  # noqa: BLE001
                    return batch.slice(0, 0)
            prov = {
                c: (batch[c][0].as_py(), batch[c][len(batch) - 1].as_py())
                for c in provenance_cols
                if c in batch.column_names and len(batch)
            }
            raise RuntimeError(f"projector failed on batch {prov}: {e}") from e

    return wrapped


def extract_json_field(
    batch: pa.Table,
    col: str,
    key: str,
    out: str,
    as_int: bool = False,
) -> pa.Table:
    """Vectorized extraction of one scalar field from a JSON-string column
    — the semi-structured analog of the reference's CSV cell projectors
    (``/root/reference/handler.go:141-186`` projects parsed cells; modern
    event streams carry JSON payload columns instead).

    One ``pc.extract_regex`` pass (RE2, no Python row loop); rows where the
    key is absent or the payload is null yield null.  Scalar string/number
    values only; string values may carry escaped quotes/backslashes (the
    escapes are preserved verbatim, not unescaped).  KNOWN LIMIT: a regex
    has no nesting awareness, so the FIRST occurrence of the key wins —
    if a nested object contains the same key name earlier in the payload,
    that inner value is returned.  Payloads with nested shadowing keys
    need a real JSON kernel: parse the column once into typed columns at
    ingest (the better lake design anyway).
    """
    import re as _re

    # "key": <number|"string"> — RE2 via Arrow requires every group named.
    # The string arm consumes escape PAIRS (\\.) so an escaped quote inside
    # the value does not truncate it.  Caveat: extract_regex fills
    # UNMATCHED alternation groups with "" (not null), so the quoted/bare
    # discrimination must come from the outer `q` group's leading quote,
    # and non-matching rows from the struct's own validity.
    pat = (
        f'"{_re.escape(key)}":\\s*'
        f'(?P<q>"(?P<s>(?:[^"\\\\]|\\\\.)*)"|(?P<v>[^,}}\\s]+))'
    )
    st = pc.extract_regex(batch[col], pat)
    qval = pc.struct_field(st, "q")
    merged = pc.if_else(
        pc.starts_with(qval, '"'),
        pc.struct_field(st, "s"),
        pc.struct_field(st, "v"),
    )
    merged = pc.if_else(pc.is_valid(st), merged, pa.scalar(None, pa.string()))
    if as_int:
        merged = merged.cast(pa.int64())
    return batch.append_column(out, merged)
