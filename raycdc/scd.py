"""SCD Type-2 history materialization over a CDC changelog.

The lake engine's :func:`raycdc.engine.replay` keeps only the *latest*
version per key (LWW upsert — the analog of the reference's load-and-
replace table loads, ``/root/reference/bqloader.go:96-117``).  Warehousing
pipelines additionally need the *history* view: every version a key ever
held, with the validity interval ``[valid_from, valid_to)`` during which
it was current — a Slowly-Changing-Dimension Type-2 table.

Semantics, per key ordered by ``(ts, lsn)``:

- every upsert emits one version row with ``valid_from = ts`` and
  ``valid_to`` = the NEXT change's ts for that key (any op), or null if
  the version is still open;
- a delete emits no row but closes the previous version (its ts becomes
  the predecessor's ``valid_to``), so a key whose last event is a delete
  has no current row;
- ``is_current`` = 1 iff ``valid_to`` is null.

Distributed shape: one hash-bucketed exchange on the key
(:func:`raycdc.partition.bucket_keys` — co-locates each key's full
history), then a single vectorized pass per bucket: one ``np.lexsort`` by
(key codes…, ts, lsn), a shift-by-one "same key follows" boundary mask,
and a masked timestamp gather for ``valid_to``.  No per-key loop; the
number of UDF calls equals ``num_partitions``, never the key count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from raycdc.partition import bucket_keys

_BUCKET = "__scd_bucket"


def _key_code(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Dense int64 codes for sorting/segmenting one key column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return (
            col.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def scd2_history(
    changelog: "ray.data.Dataset",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "delete",
    num_partitions: int = 64,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> "ray.data.Dataset":
    """Materialize the SCD Type-2 history table from a changelog Dataset.

    Output columns: every changelog column except ``op_col`` and
    ``ts_col``, plus ``valid_from`` (timestamp, = the event's ts),
    ``valid_to`` (timestamp, null while open) and ``is_current``
    (int64 0/1).  Rows whose op equals ``delete_op`` are consumed as
    interval-closers only.

    A key's entire history must fit one group — the same bound as
    :func:`raycdc.relational.sessionize`; fine for per-conversation /
    per-entity keys, document it for anything hotter (or pre-compact).
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(_BUCKET, bucket_keys(t, key_cols, num_partitions))

    def history(g: pa.Table) -> pa.Table:
        carry = [
            n for n in g.schema.names if n not in (op_col, ts_col, _BUCKET)
        ]
        out_fields = [g.schema.field(n) for n in carry] + [
            pa.field(valid_from, pa.timestamp("us")),
            pa.field(valid_to, pa.timestamp("us")),
            pa.field(current_flag, pa.int64()),
        ]
        out_schema = pa.schema(out_fields)
        if len(g) == 0:
            return out_schema.empty_table()
        ts = (
            g[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        lsn = g[lsn_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = [_key_code(g[k]) for k in key_cols]
        # primary = key columns (last lexsort key is most significant)
        order = np.lexsort((lsn, ts, *reversed(keys)))
        same_next = np.ones(len(order), dtype=bool)
        same_next[-1] = False
        for k in keys:
            ks = k[order]
            same_next[:-1] &= ks[1:] == ks[:-1]
        ts_s = ts[order]
        next_ts = np.empty_like(ts_s)
        next_ts[:-1] = ts_s[1:]
        next_ts[-1] = 0
        is_del = (
            g[op_col].combine_chunks().to_numpy(zero_copy_only=False)[order]
            == delete_op
        )
        keep = np.flatnonzero(~is_del)
        rows = pa.array(order[keep])
        cols = {n: g[n].combine_chunks().take(rows) for n in carry}
        cols[valid_from] = pa.array(ts_s[keep], pa.int64()).cast(
            pa.timestamp("us")
        )
        has_next = same_next[keep]
        cols[valid_to] = pa.array(
            next_ts[keep], pa.int64(), mask=~has_next
        ).cast(pa.timestamp("us"))
        cols[current_flag] = pa.array((~has_next).astype(np.int64))
        return pa.table(cols, schema=out_schema)

    return (
        changelog.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(_BUCKET, num_partitions=num_partitions)
        .map_groups(history, batch_format="pyarrow")
    )
