"""Table specs + declarative Arrow schema evolution.

The reference (go-bqloader) has NO schema evolution: the destination BigQuery
table is created out-of-band with a fixed JSON schema and loads use
``CreateDisposition=CreateNever`` (``/root/reference/loader.go:43``); the
projector's job is to make positional strings conform
(``/root/reference/handler.go:51,121-124``).  Here schema lives with the
engine: a :class:`TableSpec` declares the destination Arrow schema, the upsert
key, and the version order, and :func:`evolve_batch` is the declarative
analog of projector arity changes — additive columns are null/default
backfilled and types are widened (int32→int64, float32→float64, timestamp
unit widening) per batch, vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

# The authoritative base-row schema (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Changelog = base row + CDC envelope (FIXTURES.md §2).
CHANGELOG_SCHEMA = pa.schema(
    list(TRANSCRIPT_SCHEMA)
    + [
        pa.field("op", pa.string()),  # insert | update | delete
        pa.field("lsn", pa.int64()),  # strictly increasing; LWW tiebreak
        pa.field("seg_id", pa.int32()),  # WAL segment id (Event.Name analog)
    ]
)

# Shared map-stage retry policy for transform stages that do (or may be
# fused with stages that do) real IO inside the UDF.  Transient object-store
# faults (OSError) retry; data errors fail fast with provenance.  Retries are
# safe everywhere this is applied because the sink is idempotent (LWW +
# checkpoints).
#
# LOAD-BEARING FUSION CONSTRAINT: Ray Data only fuses adjacent
# TaskPoolMapOperators when their ray_remote_args match EXACTLY — a stage
# with these retry args next to a stage without them stays un-fused and its
# intermediate blocks round-trip through the object store (measured: the
# amplified-changelog derive stage shipped ~2 GB of pre-combine rows to
# plasma before `prepare`'s combiner could collapse them).  Every map stage
# on the replay's derive→prep path must take **IO_RETRY_ARGS verbatim.
# The one place NOT to apply it: the first map after a native read op
# (read_parquet / read_binary_files) — retry args on that map break
# read→map fusion instead (measured on ray 2.49).
IO_RETRY_ARGS: dict = {"max_retries": 3, "retry_exceptions": [OSError]}


@dataclass(frozen=True)
class TableSpec:
    """Destination-table contract: the analog of the reference's
    ``Handler{Table, Projector, ...}`` struct (``/root/reference/handler.go:20-48``)
    minus the per-format plumbing.

    key_cols + version_cols define last-writer-wins: for duplicate keys the
    row with the greatest ``version_cols`` tuple wins; a winning ``op ==
    'delete'`` removes the key from the materialized state.
    """

    name: str = "transcripts"
    schema: pa.Schema = TRANSCRIPT_SCHEMA
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    version_cols: tuple[str, ...] = ("ts", "lsn")
    op_col: str = "op"
    partition_key: str = "conv_id"
    num_partitions: int = 32
    # reduce-task parallelism for the merge shuffle; None → 2 × num_partitions
    # (groups stay intact — this only controls exchange granularity)
    shuffle_partitions: int | None = None
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    defaults: dict = field(default_factory=dict)  # col -> fill value for additive cols
    # merge policy: "lww" (default — latest version wins), "additive"
    # (value_cols deltas SUM per key; deletes reset — incremental rollups;
    # exactly-once checkpoints make non-idempotent addition safe), or
    # "history" (SCD Type-2: every version retained with its
    # [valid_from, valid_to) interval; deletes close intervals; requires
    # per-key event-time order across segments)
    merge_policy: str = "lww"
    value_cols: tuple[str, ...] = ()

    def changelog_schema(self) -> pa.Schema:
        return pa.schema(
            list(self.schema)
            + [
                pa.field(self.op_col, pa.string()),
                pa.field("lsn", pa.int64()),
                pa.field("seg_id", pa.int32()),
            ]
        )


# ---------------------------------------------------------------------------
# widening lattice

_INT_ORDER = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_FLOAT_ORDER = {pa.float16(): 0, pa.float32(): 1, pa.float64(): 2}
_TS_ORDER = {"s": 0, "ms": 1, "us": 2, "ns": 3}


def widen_type(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """The least common widened type of a and b, or raise if incompatible.

    Supported widenings (the declarative analog of the reference projector
    rewriting string cells to fit the destination schema): int up-widening,
    float up-widening, int→float64, timestamp unit widening.
    """
    if a.equals(b):
        return a
    if a in _INT_ORDER and b in _INT_ORDER:
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    if a in _FLOAT_ORDER and b in _FLOAT_ORDER:
        return a if _FLOAT_ORDER[a] >= _FLOAT_ORDER[b] else b
    if (a in _INT_ORDER and b in _FLOAT_ORDER) or (a in _FLOAT_ORDER and b in _INT_ORDER):
        return pa.float64()
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b) and a.tz == b.tz:
        ua, ub = _TS_ORDER[a.unit], _TS_ORDER[b.unit]
        return a if ua >= ub else b
    # offset-width widening (large variants appear when data exceeds int32
    # offsets or passes through engines that emit large types)
    strings = (pa.string(), pa.large_string())
    if a in strings and b in strings:
        return pa.large_string()
    binaries = (pa.binary(), pa.large_binary())
    if a in binaries and b in binaries:
        return pa.large_binary()
    raise TypeError(f"incompatible schema evolution: {a} vs {b}")


def merge_schemas(base: pa.Schema, new: pa.Schema) -> pa.Schema:
    """Evolve ``base`` by ``new``: keep base column order, widen shared
    columns, append columns only present in ``new`` (additive evolution)."""
    fields: list[pa.Field] = []
    base_names = set(base.names)
    for f in base:
        if f.name in new.names:
            nf = new.field(f.name)
            fields.append(pa.field(f.name, widen_type(f.type, nf.type)))
        else:
            fields.append(f)
    for f in new:
        if f.name not in base_names:
            fields.append(f)
    return pa.schema(fields)


def evolve_batch(
    batch: pa.Table, target: pa.Schema, defaults: dict | None = None
) -> pa.Table:
    """Cast/backfill one Arrow batch to ``target``: missing columns are
    filled with ``defaults.get(name)`` (else null), present columns are cast
    (widening only — a narrowing cast raises via pyarrow's safe cast), extra
    columns not in ``target`` are preserved after the target columns (so the
    CDC envelope cols op/lsn/seg_id survive an evolve against the base
    schema).  Vectorized; suitable as a ``map_batches`` body.
    """
    defaults = defaults or {}
    n = len(batch)
    cols: list[pa.ChunkedArray | pa.Array] = []
    names: list[str] = []
    for f in target:
        if f.name in batch.column_names:
            col = batch[f.name]
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            cols.append(col)
        else:
            fill = defaults.get(f.name)
            if fill is None:
                cols.append(pa.nulls(n, f.type))
            else:
                cols.append(pa.repeat(pa.scalar(fill, f.type), n))
        names.append(f.name)
    for name in batch.column_names:
        if name not in target.names:
            cols.append(batch[name])
            names.append(name)
    return pa.table(cols, names=names)


class Evolver:
    """Actor-pool-friendly evolve stage: ``map_batches(Evolver(spec), ...)``.

    Stateless per batch, but constructed once per actor so the target schema
    and defaults are not re-pickled per batch.
    """

    def __init__(self, target: pa.Schema, defaults: dict | None = None):
        self.target = target
        self.defaults = defaults or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        return evolve_batch(batch, self.target, self.defaults)
