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
    # `changed` is always a plain Array here: combine_chunks() upstream
    # yields Arrays and pc kernels preserve that
    return pa.concat_arrays([pa.array([True]), changed])


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
    strictly NEWER (by version tuple) than the key's DELETE WATERMARK; a
    delete resets the key.  The CDC building block for incrementally
    maintained rollup tables (materialized-view maintenance): exactly-once
    delivery (the engine's lsn checkpoints) makes per-event addition safe
    even though addition is not idempotent.

    Output per key: one AGGREGATE row marked ``op='agg'`` (when any
    contribution survives the watermark) carrying the version of its last
    contribution PLUS two bookkeeping version tuples that make folding
    exact: the watermark it was reconciled against
    (``__floor_<version_col>``) and the MINIMUM contribution version it
    folded (``__span_<version_col>``).  Raw delta rows need neither
    (floor -inf, span = own version), and one tombstone row is emitted at
    the latest delete's version.

    The per-key delete watermark of a merge = lexicographic max over the
    delete rows' versions and the incoming aggregates' floors (floors
    subsume tombstones, so the bound survives tombstone GC).  Exactness:

    * raw deltas at or below the watermark are excluded, above it summed —
      always exact, any delivery order;
    * an aggregate whose floor equals the watermark — or whose SPAN
      starts above it — contributes whole (everything it folded postdates
      the watermark);
    * an aggregate at or below the watermark is cancelled whole — exact;
    * a delete landing INSIDE an aggregate's span (floor < watermark,
      span-start <= watermark < version) is the one genuinely ambiguous
      case (the fold cannot be split) and RAISES — never a silently wrong
      sum.  Per-key deletes must arrive event-time-monotone relative to
      already-folded spans; a violation requires rebuilding the rollup
      from the raw changelog.

    Associative/commutative for any batching that honors that discipline.
    Fully vectorized: one sort, segmented reduceats, lexicographic tuple
    compares per version column — no Python row loops.
    """
    import numpy as np

    MIN = np.int64(np.iinfo(np.int64).min)
    MAX = np.int64(np.iinfo(np.int64).max)
    floor_cols = [f"__floor_{v}" for v in version_cols]
    span_cols = [f"__span_{v}" for v in version_cols]
    cols = [*key_cols, *version_cols, op_col, *value_cols]
    have = set(table.column_names)
    missing = [c for c in cols if c not in have]
    if missing:
        raise ValueError(f"additive_merge: missing column(s) {missing}")
    sel = cols + [f for f in (*floor_cols, *span_cols) if f in have]
    t = table.select(sel)
    for f in (*floor_cols, *span_cols):  # raw rows carry neither — null
        if f not in t.column_names:
            t = t.append_column(f, pa.nulls(len(t), pa.int64()))
    if len(t) == 0:
        return t  # schema identical to the non-empty path
    # fail fast on null versions/values: NaN would alias to INT64_MIN in
    # the watermark math (silently wrong sums / poisoned spans), matching
    # the engine's explicit null-lsn guard
    for c in (*version_cols, *value_cols):
        nulls = t[c].null_count
        if nulls:
            raise ValueError(
                f"additive_merge: {nulls} null value(s) in column {c!r} — "
                "version and value columns must be non-null"
            )
    t = t.sort_by(
        [(k, "ascending") for k in key_cols]
        + [(v, "ascending") for v in version_cols]
    )
    n = len(t)
    new = _first_occurrence_mask(t, key_cols).to_numpy(zero_copy_only=False)
    seg_id = (np.cumsum(new) - 1).astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    starts = np.where(new)[0]
    op_np = pc.fill_null(t[op_col], "").to_numpy(zero_copy_only=False)
    is_del = op_np == DELETE
    is_agg = op_np == "agg"

    def _as_i64(col) -> np.ndarray:
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)

    vnum = [_as_i64(t[v]) for v in version_cols]

    def _filled(col, default) -> np.ndarray:
        return (
            pc.fill_null(col, int(default))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )

    fnum = [_filled(t[f], MIN) for f in floor_cols]
    # span of a raw row is its own version; agg rows carry theirs
    snum = [
        np.where(is_agg, _filled(t[s], MIN), v)
        for s, v in zip(span_cols, vnum)
    ]

    # per-row watermark candidate: delete -> own version, agg -> its floor,
    # raw insert -> -inf; then segmented LEXICOGRAPHIC max per key
    cand = [
        np.where(is_del, v, np.where(is_agg, f, MIN))
        for v, f in zip(vnum, fnum)
    ]
    bound = []
    tie = np.ones(n, dtype=bool)
    for c in cand:
        masked = np.where(tie, c, MIN)
        b = np.maximum.reduceat(masked, starts)
        bound.append(b)
        tie = tie & (c == b[seg_id])

    def _lex_gt(a_cols, b_cols) -> np.ndarray:
        gt = np.zeros(n, dtype=bool)
        eq = np.ones(n, dtype=bool)
        for a, b in zip(a_cols, b_cols):
            bb = b[seg_id]
            gt |= eq & (a > bb)
            eq &= a == bb
        return gt

    ver_gt_bound = _lex_gt(vnum, bound)
    floor_eq_bound = np.all(
        [f == b[seg_id] for f, b in zip(fnum, bound)], axis=0
    )
    span_gt_bound = _lex_gt(snum, bound)
    # ambiguous: a surviving aggregate reconciled against an OLDER
    # watermark whose span reaches at or below the new one — some folded
    # contribution may predate the newest delete and the fold cannot be
    # split.  floor == bound (already reconciled) or span > bound (every
    # folded contribution postdates it) are both exact whole-folds.
    late = is_agg & ver_gt_bound & ~floor_eq_bound & ~span_gt_bound
    if late.any():
        bad = t.filter(pa.array(late)).select(list(key_cols)).slice(0, 3)
        raise ValueError(
            "additive_merge: delete older than an existing aggregate for "
            f"key(s) {bad.to_pylist()} — per-key deletes must arrive "
            "event-time-monotone relative to already-folded state "
            "(watermark discipline); rebuild the rollup from the raw "
            "changelog to apply this late delete exactly"
        )
    contrib = (~is_del) & ver_gt_bound
    contrib_idx = np.where(contrib, idx, -1)
    last_contrib = np.maximum.reduceat(contrib_idx, starts)
    has_contrib = last_contrib >= 0
    del_idx = np.where(is_del, idx, -1)
    seg_del = np.maximum.reduceat(del_idx, starts)
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
            # match the input op type (string OR large_string — evolved
            # lakes widen; a mismatched type would fail the parts concat)
            pa.repeat(pa.scalar("agg", t.schema.field(op_col).type), len(agg)),
        )
        for f, b in zip(floor_cols, bound):
            bsel = b[has_contrib]
            vals = pa.array(bsel, pa.int64())
            agg = agg.set_column(
                agg.schema.get_field_index(f),
                f,
                pc.if_else(
                    pa.array(bsel != MIN), vals, pa.nulls(len(bsel), pa.int64())
                ),
            )
        # span = segmented lexicographic MIN over contributing spans
        span_bound = []
        tie2 = np.ones(n, dtype=bool)
        for s in snum:
            masked = np.where(tie2 & contrib, s, MAX)
            b = np.minimum.reduceat(masked, starts)
            span_bound.append(b)
            tie2 = tie2 & (s == b[seg_id])
        for scol, b in zip(span_cols, span_bound):
            bsel = b[has_contrib]
            agg = agg.set_column(
                agg.schema.get_field_index(scol),
                scol,
                pa.array(bsel, pa.int64()),
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
        for f in (*floor_cols, *span_cols):
            tomb = tomb.set_column(
                tomb.schema.get_field_index(f),
                f,
                pa.nulls(len(tomb), pa.int64()),
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
    late_out: list | None = None,
) -> pa.Table:
    """Dispatch to the configured merge policy.

    Combiner safety differs BY POLICY (CLAUDE.md): only ``lww`` may run
    map-side as a per-batch combiner.  ``additive`` must see every delta
    row, and ``history`` silently CONSUMES a delete whose predecessor
    lives in another batch (no row to close → the orphan tombstone
    vanishes before the shuffle and the other batch's version stays open
    forever) — the engine keeps the combiner OFF for both
    (engine.py ``_prep``).  All policies support ``drop_deletes`` for the
    final merge.

    ``late_out`` (history policy only): a mutable list; when given, fresh
    events violating the per-key event-time contract are APPENDED to it as
    an Arrow table and excluded from the merge, instead of raising.
    """
    if policy == "lww":
        return lww_dedup(table, key_cols, version_cols, op_col, drop_deletes)
    if policy == "additive":
        out = additive_merge(table, key_cols, version_cols, op_col, value_cols)
        if drop_deletes and op_col in out.column_names:
            out = out.filter(pc.not_equal(pc.fill_null(out[op_col], ""), DELETE))
        return out
    if policy == "history":
        # deletes are consumed into interval closes — nothing to drop
        return history_extend(
            table,
            key_cols,
            ts_col=version_cols[0],
            lsn_col=version_cols[-1],
            op_col=op_col,
            late_out=late_out,
        )
    raise ValueError(
        f"unknown merge policy {policy!r} (expected lww|additive|history)"
    )


# ---------------------------------------------------------------------------
# history merge policy — SCD Type-2 version retention


def history_extend(
    table: pa.Table,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    op_col: str = "op",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    delete_op: str = DELETE,
    late_out: list | None = None,
) -> pa.Table:
    """The SCD Type-2 merge policy: fold settled version rows and fresh
    changelog events (distinguished by a non-null ``valid_from``) into the
    extended version history — every upsert becomes a version row with its
    ``[valid_from, valid_to)`` interval, deletes close intervals without
    emitting rows, and closes that exist only as a prior version's
    ``valid_to`` (their delete was consumed at a previous apply) are
    regenerated before the interval chaining.

    Output rows keep the engine envelope: ``op_col`` is the constant
    upsert marker (a history lake has no tombstones) and ``ts_col`` equals
    ``valid_from``, so stored partitions re-enter this function as settled
    versions on the next apply — the exactly-once lake loop
    (:func:`raycdc.engine.replay` with ``merge_policy='history'``).

    Contract: fresh events must not precede a key's settled instant
    (``max(valid_from, valid_to)`` over its history) — event-time order
    per key across segments, the WAL-tail reality; violations raise.
    Fully vectorized: two lexsorts + segment masks, no per-key loop.
    """
    import numpy as np

    meta = (valid_from, valid_to, current_flag)
    carry = [c for c in table.column_names if c not in (*meta, op_col, ts_col)]
    out_schema = pa.schema(
        [table.schema.field(c) for c in carry]
        + [
            pa.field(op_col, pa.string()),
            pa.field(ts_col, pa.timestamp("us")),
            pa.field(valid_from, pa.timestamp("us")),
            pa.field(valid_to, pa.timestamp("us")),
            pa.field(current_flag, pa.int64()),
        ]
    )
    n = len(table)
    if n == 0:
        return out_schema.empty_table()

    from raycdc.partition import key_codes

    ts = (
        table[ts_col]
        .cast(pa.timestamp("us"))
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    lsn = table[lsn_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    keys = [key_codes(table[k]) for k in key_cols]
    if valid_from in table.column_names:
        hist = (
            table[valid_from]
            .combine_chunks()
            .is_valid()
            .to_numpy(zero_copy_only=False)
        )
        vt = table[valid_to].cast(pa.int64()).to_numpy(zero_copy_only=False)
        vtv = (
            table[valid_to]
            .combine_chunks()
            .is_valid()
            .to_numpy(zero_copy_only=False)
        )
    else:
        hist = np.zeros(n, dtype=bool)
        vt = np.zeros(n, dtype=np.int64)
        vtv = np.zeros(n, dtype=bool)

    order = np.lexsort((lsn, ts, *reversed(keys)))
    same_next = np.ones(n, dtype=bool)
    same_next[-1] = False
    for k in keys:
        ks = k[order]
        same_next[:-1] &= ks[1:] == ks[:-1]
    ts_s, hist_s = ts[order], hist[order]
    vt_s, vtv_s = vt[order], vtv[order]

    # WAL-tail contract: no fresh event before a key's settled instant
    new_seg = np.ones(n, dtype=bool)
    new_seg[1:] = ~same_next[:-1]
    seg_starts = np.where(new_seg)[0]
    seg_lens = np.diff(np.append(seg_starts, n))
    bound = np.where(
        hist_s,
        np.where(vtv_s, np.maximum(ts_s, vt_s), ts_s),
        np.iinfo(np.int64).min,
    )
    key_bound = np.repeat(np.maximum.reduceat(bound, seg_starts), seg_lens)
    stale = (~hist_s) & (ts_s < key_bound)
    if stale.any():
        if late_out is None:
            raise ValueError(
                f"history merge: {int(stale.sum())} fresh event(s) precede "
                "their key's settled history — the history policy requires "
                "per-key event-time order across segments"
            )
        # quarantine mode: side-output the late rows (original order) and
        # re-merge without them — the second pass cannot find new stale
        # rows, because removing fresh events never raises a key's bound
        stale_orig = np.sort(order[stale])
        keep_orig = np.setdiff1d(np.arange(n), stale_orig, assume_unique=True)
        late_out.append(table.take(pa.array(stale_orig)))
        return history_extend(
            table.take(pa.array(keep_orig)),
            key_cols,
            ts_col=ts_col,
            lsn_col=lsn_col,
            op_col=op_col,
            valid_from=valid_from,
            valid_to=valid_to,
            current_flag=current_flag,
            delete_op=delete_op,
            late_out=None,
        )

    # regenerate deletes lost in materialization: a closed version whose
    # valid_to is NOT the next same-key change's instant
    next_ts = np.empty_like(ts_s)
    next_ts[:-1] = ts_s[1:]
    next_ts[-1] = 0
    explained = same_next & (next_ts == vt_s)
    synth = np.flatnonzero(hist_s & vtv_s & ~explained)

    m = len(synth)
    all_ts = np.concatenate([ts_s, vt_s[synth]])
    all_lsn = np.concatenate([lsn[order], lsn[order][synth]])
    all_keys = [np.concatenate([k[order], k[order][synth]]) for k in keys]
    is_del = (
        table[op_col].combine_chunks().to_numpy(zero_copy_only=False)[order]
        == delete_op
    )
    all_del = np.concatenate([is_del, np.ones(m, dtype=bool)])
    all_src = np.concatenate([order, np.full(m, -1, np.int64)])

    order2 = np.lexsort((all_lsn, all_ts, *reversed(all_keys)))
    n2 = len(order2)
    same_next2 = np.ones(n2, dtype=bool)
    same_next2[-1] = False
    for k in all_keys:
        ks = k[order2]
        same_next2[:-1] &= ks[1:] == ks[:-1]
    ts2 = all_ts[order2]
    nts2 = np.empty_like(ts2)
    nts2[:-1] = ts2[1:]
    nts2[-1] = 0
    keep = np.flatnonzero(~all_del[order2])
    rows = pa.array(all_src[order2][keep])
    cols = {c: table[c].combine_chunks().take(rows) for c in carry}
    vf = pa.array(ts2[keep], pa.int64()).cast(pa.timestamp("us"))
    cols[op_col] = pa.repeat(pa.scalar("insert", pa.string()), len(keep))
    cols[ts_col] = vf
    cols[valid_from] = vf
    has_next = same_next2[keep]
    cols[valid_to] = pa.array(nts2[keep], pa.int64(), mask=~has_next).cast(
        pa.timestamp("us")
    )
    cols[current_flag] = pa.array((~has_next).astype(np.int64))
    return pa.table(cols, schema=out_schema)
