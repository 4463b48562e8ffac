"""Vectorized last-writer-wins merge kernels.

Semantics (SURVEY.md §2.6, BASELINE.json north_star): for each upsert key
``(conv_id, turn_idx)`` the row with the greatest version tuple ``(ts, lsn)``
wins; if the winner's ``op == 'delete'`` the key is absent from materialized
state.  A delete is itself LWW-replaceable by a newer insert
(insert→delete→insert chains re-materialize the key).

Everything here is pure Arrow — sort + first-occurrence mask — no Python
row loops.  Two uses:

* :func:`combine_batch` — the *combiner*: per-batch pre-dedup inside
  ``map_batches`` BEFORE the shuffle.  Keeps tombstones (a delete must
  survive to the merge to cancel older rows in other batches).  This is the
  scale lever: with many updates per key it shrinks the all-to-all exchange.
* :func:`merge_group` — the final per-partition merge inside
  ``groupby(part_key).map_groups``: dedup, resolve tombstones, sort by key
  for the deterministic layout the byte-equality check needs.

The reference's analog is much weaker: batch goroutines append results under
a mutex in nondeterministic order (``/root/reference/handler.go:141-186``) and
the load is append-only, not keyed (``/root/reference/loader.go:33-60``).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyarrow as pa
import pyarrow.compute as pc

DELETE = "delete"


def _first_occurrence_mask(table: pa.Table, key_cols: Sequence[str]) -> pa.Array:
    """Boolean mask marking the first row of each consecutive key run.

    ``table`` must already be sorted so equal keys are adjacent.  Vectorized:
    compares each key column against itself shifted by one row.
    """
    n = len(table)
    if n == 0:
        return pa.array([], pa.bool_())
    changed = None
    for k in key_cols:
        col = table[k].combine_chunks()
        neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
        # treat null comparison results as "changed" (keys are non-null in
        # practice; this keeps the mask total)
        neq = pc.fill_null(neq, True)
        changed = neq if changed is None else pc.or_(changed, neq)
    return pa.concat_arrays(
        [pa.array([True]), changed.combine_chunks().chunk(0) if isinstance(changed, pa.ChunkedArray) else changed]
    )


def lww_dedup(
    table: pa.Table,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    version_cols: Sequence[str] = ("ts", "lsn"),
    op_col: str = "op",
    drop_deletes: bool = False,
) -> pa.Table:
    """Keep, per key, only the row with the max version tuple.

    Sorts by (key asc, version desc) and keeps first-in-run.  With
    ``drop_deletes`` the surviving tombstones are removed (final
    materialization); without it they are kept (combiner / lake storage).
    Output is sorted by ``key_cols`` ascending — the stable ordering
    invariant.
    """
    if len(table) == 0:
        return table
    sort_keys = [(k, "ascending") for k in key_cols] + [
        (v, "descending") for v in version_cols
    ]
    table = table.sort_by(sort_keys)
    mask = _first_occurrence_mask(table, key_cols)
    table = table.filter(mask)
    if drop_deletes and op_col in table.column_names:
        table = table.filter(pc.not_equal(pc.fill_null(table[op_col], ""), DELETE))
    return table


def combine_batch(
    batch: pa.Table,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    version_cols: Sequence[str] = ("ts", "lsn"),
    op_col: str = "op",
) -> pa.Table:
    """map_batches combiner: within-batch LWW pre-dedup, tombstones kept."""
    return lww_dedup(batch, key_cols, version_cols, op_col, drop_deletes=False)


def merge_group(
    group: pa.Table,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    version_cols: Sequence[str] = ("ts", "lsn"),
    op_col: str = "op",
    drop_deletes: bool = True,
) -> pa.Table:
    """map_groups body: final LWW merge of one partition."""
    return lww_dedup(group, key_cols, version_cols, op_col, drop_deletes=drop_deletes)


# ---------------------------------------------------------------------------
# additive merge policy — incremental materialized rollups


def additive_merge(
    table: pa.Table,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    version_cols: Sequence[str] = ("ts", "lsn"),
    op_col: str = "op",
    value_cols: Sequence[str] = (),
) -> pa.Table:
    """ADDITIVE merge: per key, SUM the ``value_cols`` deltas of all rows
    strictly NEWER (by version tuple) than the key's latest delete; a
    delete resets the key.  The CDC building block for incrementally
    maintained rollup tables (materialized-view maintenance): exactly-once
    delivery (the engine's lsn checkpoints) makes per-event addition safe
    even though addition is not idempotent.

    Associative/commutative as a combiner: an aggregate row re-enters later
    merges carrying op='insert' and the version of its LAST contribution,
    so newer deletes still cancel it and older deltas still fold in below
    a retained tombstone.

    Output per key: one aggregate row (when any contribution survives the
    latest delete) and one tombstone row (when the key ever saw a delete —
    retained so stale pre-delete deltas arriving later are excluded), both
    restricted to ``key + version + op + value`` columns (aggregates carry
    no other payload).  Fully vectorized: one sort, segmented reduceat.
    """
    import numpy as np

    cols = [*key_cols, *version_cols, op_col, *value_cols]
    if len(table) == 0:
        return table.select(cols) if set(cols) <= set(table.column_names) else table
    t = table.select(cols).sort_by(
        [(k, "ascending") for k in key_cols]
        + [(v, "ascending") for v in version_cols]
    )
    n = len(t)
    new = _first_occurrence_mask(t, key_cols).to_numpy(zero_copy_only=False)
    seg_id = (np.cumsum(new) - 1).astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    starts = np.where(new)[0]
    is_del = pc.equal(pc.fill_null(t[op_col], ""), DELETE).to_numpy(
        zero_copy_only=False
    )
    # per-segment index of the LATEST delete (-1 when none)
    del_idx = np.where(is_del, idx, -1)
    seg_del = np.maximum.reduceat(del_idx, starts)
    contrib = (~is_del) & (idx > seg_del[seg_id])
    contrib_idx = np.where(contrib, idx, -1)
    last_contrib = np.maximum.reduceat(contrib_idx, starts)
    has_contrib = last_contrib >= 0
    has_del = seg_del >= 0

    parts = []
    if has_contrib.any():
        rep = pa.array(last_contrib[has_contrib])  # row carrying key+version
        agg = t.take(rep)
        for v in value_cols:
            vals = t[v].to_numpy(zero_copy_only=False)
            sums = np.add.reduceat(np.where(contrib, vals, 0), starts)
            agg = agg.set_column(
                agg.schema.get_field_index(v),
                v,
                pa.array(sums[has_contrib]).cast(t.schema.field(v).type),
            )
        agg = agg.set_column(
            agg.schema.get_field_index(op_col),
            op_col,
            pa.repeat(pa.scalar("insert"), len(agg)),
        )
        parts.append(agg)
    if has_del.any():
        tomb = t.take(pa.array(seg_del[has_del]))
        for v in value_cols:
            tomb = tomb.set_column(
                tomb.schema.get_field_index(v),
                v,
                pa.array(
                    np.zeros(len(tomb), dtype=np.int64)
                ).cast(t.schema.field(v).type),
            )
        parts.append(tomb)
    if not parts:
        return t.slice(0, 0)
    out = pa.concat_tables(parts)
    return out.sort_by(
        [(k, "ascending") for k in key_cols]
        + [(v, "ascending") for v in version_cols]
    )


def policy_merge(
    table: pa.Table,
    key_cols: Sequence[str],
    version_cols: Sequence[str],
    op_col: str,
    policy: str = "lww",
    value_cols: Sequence[str] = (),
    drop_deletes: bool = False,
) -> pa.Table:
    """Dispatch to the configured merge policy (both usable as combiner —
    tombstones kept — and as the final merge with ``drop_deletes``)."""
    if policy == "lww":
        return lww_dedup(table, key_cols, version_cols, op_col, drop_deletes)
    if policy == "additive":
        out = additive_merge(table, key_cols, version_cols, op_col, value_cols)
        if drop_deletes and op_col in out.column_names:
            out = out.filter(pc.not_equal(pc.fill_null(out[op_col], ""), DELETE))
        return out
    raise ValueError(f"unknown merge policy {policy!r} (expected lww|additive)")
