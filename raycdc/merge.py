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
