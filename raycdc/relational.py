"""Relational operators: broadcast hash join, sessionization, pre-aggregated
rollups.

The reference has no joins/aggregations/windows (SURVEY.md §2.6) — these are
the query-side operators a lake engine needs, built scale-first:

* :func:`broadcast_join` — the small side is materialized ONCE, put in the
  object store, and probed per batch with vectorized ``index_in``/``take``
  (never a shuffle, never re-shipped per batch).  Valid while the build side
  fits a node; beyond that use a co-partitioned merge (groupby both sides on
  the key), which `sessionize` demonstrates.
* :func:`sessionize` — gap-based session assignment per entity: ONE
  groupby(entity) shuffle, then a vectorized per-group split on time gaps
  (the windowed/stateful-stream analog, expressed as groupby+map_groups).
* :func:`pre_aggregate` — map-side partial aggregation before the groupby:
  each batch collapses to one row per key, the final groupby sums partials.
  This is the combiner pattern stated explicitly as an operator.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def broadcast_join(
    ds: "ray.data.Dataset",
    build: pa.Table,
    key: str,
    build_cols: Sequence[str],
    how: str = "inner",
) -> "ray.data.Dataset":
    """Probe-side streaming join against a broadcast build table.

    ``build`` must have unique ``key`` values (dimension-table contract).
    ``how``: 'inner' drops probe rows without a match; 'left' keeps them
    with nulls; 'semi' keeps matching probe rows WITHOUT appending build
    columns (EXISTS); 'anti' keeps only non-matching probe rows
    (NOT EXISTS).
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            f"broadcast_join: how must be inner/left/semi/anti, got {how!r}"
        )
    build = build.combine_chunks()
    build_ref = ray.put(build)

    def probe(batch: pa.Table) -> pa.Table:
        b = ray.get(build_ref)
        idx = pc.index_in(batch[key], value_set=b[key])
        if how == "semi":
            return batch.filter(pc.is_valid(idx))
        if how == "anti":
            return batch.filter(pc.is_null(idx))
        out = batch
        for c in build_cols:
            col = b[c].combine_chunks() if isinstance(b[c], pa.ChunkedArray) else b[c]
            out = out.append_column(c, pc.take(col, idx))
        if how == "inner":
            out = out.filter(pc.is_valid(idx))
        return out

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def copartition_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: Sequence[str],
    join_type: str = "inner",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Shuffle (co-partitioned) join — the scale path when BOTH sides are
    large and the broadcast contract of :func:`broadcast_join` breaks.

    Thin policy wrapper over Ray Data's native hash join: both sides are
    hash-partitioned on the key and joined per partition by aggregator
    actors.  Prefer :func:`broadcast_join` whenever one side fits a node —
    a broadcast is one object-store put; this is two all-to-all exchanges.
    """
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(on),
    )


def dataset_schema(ds: "ray.data.Dataset") -> pa.Schema:
    """Resolve a Dataset's pyarrow schema (unwrapping Ray's Schema wrapper)
    — shared by every two-sided operator that accepts explicit ``*_schema``
    overrides to skip driver-side plan execution."""
    s = ds.schema()
    if s is None:
        raise ValueError(
            "dataset has no schema (empty with no metadata) — pass the "
            "operator's explicit *_schema override"
        )
    base = getattr(s, "base_schema", s)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))


def _tag_bucket(key_col: str, num_partitions: int):
    """The shared pre-shuffle step: append ``__bucket`` =
    ``bucket_keys([key_col]) % num_partitions`` (one closure for every
    entity-bucketed exchange in this module)."""
    from raycdc.partition import bucket_keys

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", bucket_keys(t, [key_col], num_partitions)
        )

    return tag


def _key_boundaries(g: pa.Table, cols) -> np.ndarray:
    """Boolean mask over a table SORTED by ``cols``: True where row i
    starts a new key run (ANY key column changes).  Null-aware — nulls
    group together, matching SQL PARTITION BY — and Arrow-native, so
    int64 keys beyond 2^53 compare exactly (a numpy float round-trip
    would NaN-ify nulls and lose precision).  Shared by the lag-style
    kernels (``trajectory.edit_pairs``, ``audit.event_order_stats``)."""
    n = len(g)
    new_key = np.zeros(n, dtype=bool)
    if n == 0:
        return new_key
    new_key[0] = True
    for k in cols:
        col = g[k].combine_chunks()
        a, b = col.slice(1), col.slice(0, n - 1)
        same = pc.or_(
            pc.fill_null(pc.equal(a, b), False),
            pc.and_(pc.is_null(a), pc.is_null(b)),
        ).to_numpy(zero_copy_only=False)
        new_key[1:] |= ~same
    return new_key


def sessionize(
    ds: "ray.data.Dataset",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Assign gap-based session ids per entity.

    Output: input columns + ``session_idx`` (0-based per entity, in time
    order) — a row's session increments whenever the gap to the previous
    event of the SAME entity exceeds ``gap_seconds``.

    One shuffle (groupby a hash BUCKET of the entity — num_partitions UDF
    calls, not one per entity; see :func:`raycdc.partition.bucket_keys`);
    the per-group body is a vectorized sort + diff + cumulative sum over
    all of the bucket's entities, never a Python row loop.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    gap_us = gap_seconds * 1_000_000

    tag = _tag_bucket(entity_col, num_partitions)

    def split_sessions(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        # defensive against multi-entity groups: sort by (entity, ts), then
        # new-session where the entity changes OR the gap exceeds threshold
        g = g.sort_by([(entity_col, "ascending"), (ts_col, "ascending")])
        # normalize to µs BEFORE int64 — the gap threshold is in µs and the
        # column may arrive as s/ms/ns depending on the source
        ts = (
            g[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        n = len(g)
        if n == 0:
            return g.append_column("session_idx", pa.array([], pa.int64()))
        # Arrow-native boundary compare: null entities group together
        # (SQL PARTITION BY) and int64 ids beyond 2^53 stay exact — the
        # raw numpy round-trip would float-ify on any null
        new_entity = _key_boundaries(g, [entity_col])
        gap = np.zeros(n, dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_session = new_entity | gap
        # session_idx = per-entity running count of new_session, 0-based
        sess_global = np.cumsum(new_session) - 1
        entity_first = np.where(new_entity)[0]
        first_sess_of_entity = sess_global[entity_first]
        offset = np.repeat(first_sess_of_entity, np.diff(np.append(entity_first, n)))
        return g.append_column(
            "session_idx", pa.array((sess_global - offset).astype(np.int64))
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(split_sessions, batch_format="pyarrow")
    )


def sequence_integrity(
    ds: "ray.data.Dataset",
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    value_col: str = "role",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-group ordered-sequence QA — the transcript-integrity report a
    training pipeline gates assembly on: for each group, the row count,
    the order-key span, whether the order keys have GAPS or DUPLICATES
    (a replayed conversation with missing or doubled turns is corrupt
    input, not training data), and how many ADJACENT rows repeat the same
    ``value_col`` (e.g. two consecutive 'assistant' turns — broken
    alternation).

    Output per group: ``(group_col, n_rows, min_idx, max_idx,
    n_dup_idx, n_gaps, n_adjacent_repeats)`` — all integers, exactly
    SQL-reproducible (lag/window semantics).

    One exchange: groups are hash-BUCKETED (``num_partitions`` UDF calls,
    not one per group); inside a bucket one vectorized lexsort + boundary
    masks compute every stat for all of the bucket's groups at once.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    tag = _tag_bucket(group_col, num_partitions)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        n = len(g)
        grp_type = g.schema.field(group_col).type
        out_schema = pa.schema(
            [pa.field(group_col, grp_type)]
            + [
                pa.field(c, pa.int64())
                for c in (
                    "n_rows", "min_idx", "max_idx",
                    "n_dup_idx", "n_gaps", "n_adjacent_repeats",
                )
            ]
        )
        if n == 0:
            return out_schema.empty_table()
        if g[order_col].null_count:
            # a null order key is itself corrupt input, and letting it
            # through would NaN-poison the diffs and UNDERCOUNT — the one
            # thing a QA gate must never do
            raise ValueError(
                f"sequence_integrity: {g[order_col].null_count} null "
                f"{order_col!r} value(s) — the order key must be non-null"
            )
        g = g.sort_by([(group_col, "ascending"), (order_col, "ascending")])
        idx = g[order_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        first = _key_boundaries(g, [group_col])
        seg = np.cumsum(first) - 1
        n_groups = int(first.sum())
        n_rows = np.bincount(seg, minlength=n_groups)
        # same-group adjacent comparisons (mask out group boundaries)
        within = ~first
        d_idx = np.zeros(n, dtype=np.int64)
        d_idx[1:] = idx[1:] - idx[:-1]
        dup_idx = within & (d_idx == 0)
        gaps = within & (d_idx > 1)
        # SQL lag semantics: NULL = NULL is not a repeat
        same_val = np.zeros(n, dtype=bool)
        if n > 1:
            vcol = g[value_col].combine_chunks()
            same_val[1:] = pc.fill_null(
                pc.equal(vcol.slice(1), vcol.slice(0, n - 1)), False
            ).to_numpy(zero_copy_only=False)
        rep = within & same_val & (d_idx != 0)
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], n) - 1
        return pa.table(
            {
                group_col: g[group_col].combine_chunks().take(pa.array(starts)),
                "n_rows": pa.array(n_rows.astype(np.int64)),
                "min_idx": pa.array(idx[starts]),
                "max_idx": pa.array(idx[ends]),
                "n_dup_idx": pa.array(
                    np.bincount(seg[dup_idx], minlength=n_groups).astype(np.int64)
                ),
                "n_gaps": pa.array(
                    np.bincount(seg[gaps], minlength=n_groups).astype(np.int64)
                ),
                "n_adjacent_repeats": pa.array(
                    np.bincount(seg[rep], minlength=n_groups).astype(np.int64)
                ),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def tumbling_window(
    ds: "ray.data.Dataset",
    ts_col: str = "ts",
    window_seconds: int = 3600,
    out_col: str = "window_start",
) -> "ray.data.Dataset":
    """Assign each row its tumbling-window start timestamp — a pure
    map_batches projection (floor-divide on epoch µs), composable with
    ``pre_aggregate`` for windowed rollups; no shuffle of its own."""
    win_us = window_seconds * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        us = (
            t[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        start = (us // win_us) * win_us
        return t.append_column(
            out_col, pa.array(start).cast(pa.timestamp("us"))
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def asof_previous(
    ds: "ray.data.Dataset",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    value_cols: Sequence[str] = (),
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """As-of self-join: attach, to every row, the latest EARLIER row of the
    same entity (``prev_<col>`` columns, null for the entity's first row).

    The as-of mechanics at scale: one groupby on a hash BUCKET of the
    entity (bounded UDF-call count — see
    :func:`raycdc.partition.bucket_keys`), then a vectorized sort + shift
    over the bucket's entities — no quadratic range probe.  Cross-TABLE
    as-of joins follow the same shape (:func:`asof_join`).
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    sort_keys = [(entity_col, "ascending"), (ts_col, "ascending")] + [
        (c, "ascending") for c in order_cols
    ]

    tag = _tag_bucket(entity_col, num_partitions)

    def shift_prev(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(sort_keys)
        n = len(g)
        # Arrow-native adjacency compare: null-aware (nulls group together,
        # matching SQL PARTITION BY) and exact for int64 beyond 2^53 — a
        # numpy round-trip would NaN-ify nulls and lose integer precision
        same_prev = np.zeros(n, dtype=bool)
        if n > 1:
            ecol = g[entity_col].combine_chunks()
            a, b = ecol.slice(1), ecol.slice(0, n - 1)
            eq = pc.fill_null(pc.equal(a, b), False)
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            same_prev[1:] = pc.or_(eq, both_null).to_numpy(zero_copy_only=False)
        for c in value_cols:
            col = g[c].combine_chunks()
            shifted = pa.concat_arrays(
                [pa.nulls(1, col.type), col.slice(0, n - 1)]
            ) if n else pa.nulls(0, col.type)
            prev = pc.if_else(pa.array(same_prev), shifted, pa.nulls(n, col.type))
            g = g.append_column(f"prev_{c}", prev)
        return g

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(shift_prev, batch_format="pyarrow")
    )


def hopping_window(
    ds: "ray.data.Dataset",
    ts_col: str = "ts",
    window_seconds: int = 7200,
    hop_seconds: int = 3600,
    out_col: str = "window_start",
) -> "ray.data.Dataset":
    """Assign each row to EVERY hopping window covering it (window size a
    multiple of the hop): one ``map_batches`` that replicates each row
    ``size/hop`` times via one Arrow ``take`` — no shuffle of its own;
    compose with :func:`pre_aggregate` for sliding-window rollups.  The
    tumbling case is ``hop == size`` (see :func:`tumbling_window`).
    """
    if window_seconds % hop_seconds != 0:
        raise ValueError("hopping_window: window_seconds must be a multiple of hop_seconds")
    m = window_seconds // hop_seconds
    hop_us = hop_seconds * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        n = len(t)
        us = (
            t[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        last_slot = us // hop_us  # latest window start covering the row
        rep = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), m)))
        offsets = np.tile(np.arange(m, dtype=np.int64), n)
        starts = (np.repeat(last_slot, m) - offsets) * hop_us
        return rep.append_column(
            out_col, pa.array(starts).cast(pa.timestamp("us"))
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: Sequence[str] = ("value",),
    how: str = "inner",
    suffix: str = "r_",
    num_partitions: int = 64,
    right_tiebreak: str | None = None,
    l_schema: "pa.Schema | None" = None,
    r_schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Cross-table as-of join: attach to every left row the right row of the
    same ``on`` key with the greatest ``ts_col`` <= the left row's (DuckDB
    ``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts`` semantics; inclusive).

    Scale shape: BOTH sides stream through one tagged ``union`` and a single
    co-partitioned ``groupby(on)`` shuffle — no broadcast, no driver-side
    materialization, no per-row probe.  Inside each group the match is a
    vectorized merge: one lexsort of the combined rows by (key, ts, side)
    with right-before-left at equal ts, a ``np.maximum.accumulate``
    forward-fill of right-row indices, and a key-equality check to keep
    fills from crossing entities (groups may carry multiple keys).

    ``right`` should be unique per ``(on, ts_col)`` — with duplicates the
    surviving row is unspecified (same caveat as SQL ASOF JOIN) UNLESS
    ``right_tiebreak`` names a right column, in which case the duplicate
    with the greatest tiebreak value wins deterministically.  That makes a
    separate pre-dedup shuffle of the right side unnecessary: duplicates
    are resolved inside the one co-partitioned exchange this join already
    pays (the tiebreak rides the sort as a secondary key under (key, ts),
    and the forward-fill picks the last — greatest — duplicate).

    ``l_schema``/``r_schema`` short-circuit driver-side schema inference:
    ``Dataset.schema()`` on a lazy aggregate/shuffle EXECUTES the plan once
    just to learn types, and the union then executes it again — pass the
    (statically known) Arrow schemas to skip that double execution.

    Output: all left columns + ``{suffix}{c}`` for each ``c`` in
    ``right_cols`` (include ``ts_col`` in ``right_cols`` to surface the
    matched timestamp).  ``how='inner'`` drops unmatched left rows;
    ``'left'`` keeps them with nulls.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    if l_schema is None:
        l_schema = dataset_schema(left)
    if r_schema is None:
        r_schema = dataset_schema(right)
    l_names = list(l_schema.names)
    rc_fields = [pa.field(f"__r_{c}", r_schema.field(c).type) for c in right_cols]
    if right_tiebreak is not None:
        if right_tiebreak not in right_cols:
            raise ValueError(
                f"asof_join: right_tiebreak {right_tiebreak!r} must be one of "
                f"right_cols {tuple(right_cols)} (it must survive the tagged union)"
            )
        tb_type = r_schema.field(right_tiebreak).type
        # int64-exact for integer/timestamp tiebreaks (a float64 cast would
        # collapse values beyond 2^53 back into nondeterminism); fail fast
        # here — not deep inside a Ray task — for non-orderable types
        if pa.types.is_integer(tb_type) or pa.types.is_timestamp(tb_type):
            _tb_cast = pa.int64()
        elif pa.types.is_floating(tb_type):
            _tb_cast = pa.float64()
        else:
            raise ValueError(
                f"asof_join: right_tiebreak column {right_tiebreak!r} has "
                f"unsupported type {tb_type} (integer, timestamp, or float "
                "required)"
            )
    from raycdc.partition import bucket_keys

    uni = pa.schema(
        [pa.field(n, l_schema.field(n).type) for n in l_names]
        + rc_fields
        + [pa.field("__side", pa.int8()), pa.field("__bucket", pa.int64())]
    )

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in l_names}
        for f in rc_fields:
            cols[f.name] = pa.nulls(len(t), f.type)
        cols["__side"] = pa.array(np.ones(len(t), dtype=np.int8))
        cols["__bucket"] = bucket_keys(t, [on], num_partitions)
        return pa.table(cols, schema=uni)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for n in l_names:
            if n in (on, ts_col):
                cols[n] = t[n].cast(l_schema.field(n).type)
            else:
                cols[n] = pa.nulls(len(t), l_schema.field(n).type)
        for c, f in zip(right_cols, rc_fields):
            cols[f.name] = t[c]
        cols["__side"] = pa.array(np.zeros(len(t), dtype=np.int8))
        cols["__bucket"] = bucket_keys(t, [on], num_partitions)
        return pa.table(cols, schema=uni)

    out_schema = pa.schema(
        [pa.field(n, l_schema.field(n).type) for n in l_names]
        + [pa.field(f"{suffix}{c}", f.type) for c, f in zip(right_cols, rc_fields)]
    )

    def match(g: pa.Table) -> pa.Table:
        from raycdc.partition import key_codes

        # a right row with a null ts can never match (SQL ASOF: l.ts >=
        # NULL is never true) — drop it before any array work so the
        # int64 ts path below stays NaN-free
        ts_null0 = (
            g[ts_col].combine_chunks().is_null().to_numpy(zero_copy_only=False)
        )
        side0 = g["__side"].to_numpy(zero_copy_only=False)
        bad_right = (side0 == 0) & ts_null0
        if bad_right.any():
            g = g.filter(pa.array(~bad_right))
        n = len(g)
        if n == 0:
            return out_schema.empty_table()
        side = g["__side"].to_numpy(zero_copy_only=False)
        ts_col_arr = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        ts_is_null = (
            ts_col_arr.combine_chunks().is_null().to_numpy(zero_copy_only=False)
        )
        # null left ts sorts first as int64-min and is force-unmatched
        # below (a NaN float round-trip would sort LAST and grab the
        # key's latest right row instead)
        ts = (
            pc.fill_null(ts_col_arr, np.iinfo(np.int64).min)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # dense key codes (groups can hold several entities; keys may be
        # strings): null-safe via key_codes — nulls get -1 and NEVER match
        # (SQL equality), instead of NaN-float garbage codes
        codes = key_codes(g[on])
        if right_tiebreak is not None:
            # secondary key under (key, ts, side): among duplicate right
            # rows the greatest tiebreak sorts last, and the forward-fill
            # picks the last — nulls to -inf so any real value beats them
            tb_col = g[f"__r_{right_tiebreak}"].cast(_tb_cast)
            if _tb_cast == pa.int64():
                # left rows carry null tiebreaks — fill with MIN (their
                # relative order is irrelevant; side already separates them)
                tb = pc.fill_null(tb_col, np.iinfo(np.int64).min).to_numpy(
                    zero_copy_only=False
                )
            else:
                tb = np.nan_to_num(
                    tb_col.to_numpy(zero_copy_only=False), nan=-np.inf
                )
            order = np.lexsort((tb, side, ts, codes))
        else:
            order = np.lexsort((side, ts, codes))
        s_side, s_ts, s_codes = side[order], ts[order], codes[order]
        # forward-fill the latest right position; a fill from a previous
        # entity has a smaller code (codes sorted ascending) → invalidated
        pos = np.arange(n, dtype=np.int64)
        right_pos = np.where(s_side == 0, pos, -1)
        filled = np.maximum.accumulate(right_pos)
        is_left = s_side == 1
        lf = filled[is_left]
        s_ts_null = ts_is_null[order]
        matched = (
            (lf >= 0)
            & (s_codes[np.maximum(lf, 0)] == s_codes[is_left])
            & (s_codes[is_left] >= 0)  # null key never matches
            & ~s_ts_null[is_left]  # null left ts matches nothing
        )
        left_orig = order[is_left]  # row ids in g of the left rows
        match_orig = order[np.maximum(lf, 0)]  # row ids in g of matched right
        take_left = pa.array(left_orig)
        cols = {nme: g[nme].combine_chunks().take(take_left) for nme in l_names}
        m_idx = pa.array(
            np.where(matched, match_orig, -1), pa.int64()
        )  # -1 → null gather
        safe = pc.if_else(pc.greater_equal(m_idx, 0), m_idx, pa.nulls(len(m_idx), pa.int64()))
        for c, f in zip(right_cols, rc_fields):
            cols[f"{suffix}{c}"] = g[f.name].combine_chunks().take(safe)
        out = pa.table(cols, schema=out_schema)
        if how == "inner":
            out = out.filter(pa.array(matched))
        return out

    tagged = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    # bucketed exchange: num_partitions UDF calls; match() already handles
    # several entities per group via dense key codes
    return tagged.groupby("__bucket", num_partitions=num_partitions).map_groups(
        match, batch_format="pyarrow"
    )


def top_k_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: Sequence[str] = (),
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-group top-k with rank (``ROW_NUMBER() OVER (PARTITION BY g
    ORDER BY v) <= k``) — the heavy-hitters shape (top docs per domain,
    top orders per customer).  One groupby shuffle; inside each group one
    sort + a segmented rank filter (groups may carry several keys), no
    per-group Python loop.

    ``tie_cols`` make the ranking total (deterministic across engines);
    always pass one for columns with duplicate values."""
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    direction = "descending" if descending else "ascending"
    sort_keys = [(group_col, "ascending"), (order_col, direction)] + [
        (c, "ascending") for c in tie_cols
    ]

    tag = _tag_bucket(group_col, num_partitions)

    def head_k(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(sort_keys)
        n = len(g)
        ent = g[group_col].combine_chunks()
        new_grp = np.ones(n, dtype=bool)
        if n > 1:
            a, b = ent.slice(1), ent.slice(0, n - 1)
            eq = pc.fill_null(pc.equal(a, b), False)
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            new_grp[1:] = ~pc.or_(eq, both_null).to_numpy(zero_copy_only=False)
        starts = np.where(new_grp)[0]
        idx = np.arange(n, dtype=np.int64)
        rank = idx - np.repeat(starts, np.diff(np.append(starts, n))) + 1
        g = g.append_column("rank", pa.array(rank))
        return g.filter(pa.array(rank <= k))

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(head_k, batch_format="pyarrow")
    )


def running_aggregate(
    ds: "ray.data.Dataset",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    sum_cols: Sequence[str] = (),
    row_number: bool = True,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-entity running totals in event-time order — the cumulative
    window (``SUM(x) OVER (PARTITION BY e ORDER BY ts)``) expressed as one
    ``groupby(entity)`` shuffle + a vectorized per-group sort/cumsum
    (numpy ``cumsum`` segmented by entity boundaries; no row loop, no
    quadratic re-scan).

    Output: input columns + ``run_<col>`` per ``sum_cols`` entry and (by
    default) ``row_num`` (1-based per entity).  Integer sum columns stay
    exact; float columns follow numpy's sequential summation — use integer
    cents when an oracle must hash-match.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    sort_keys = [(entity_col, "ascending"), (ts_col, "ascending")] + [
        (c, "ascending") for c in order_cols
    ]

    tag = _tag_bucket(entity_col, num_partitions)

    def cumulate(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(sort_keys)
        n = len(g)
        ent = g[entity_col].combine_chunks()
        new_entity = np.ones(n, dtype=bool)
        if n > 1:
            a, b = ent.slice(1), ent.slice(0, n - 1)
            eq = pc.fill_null(pc.equal(a, b), False)
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            new_entity[1:] = ~pc.or_(eq, both_null).to_numpy(zero_copy_only=False)
        seg_starts = np.where(new_entity)[0]
        for c in sum_cols:
            vals = g[c].to_numpy(zero_copy_only=False)
            run = np.cumsum(vals)
            # subtract the running total just before each entity's first row
            seg_base = np.where(seg_starts > 0, run[seg_starts - 1], 0)
            base = np.repeat(seg_base, np.diff(np.append(seg_starts, n)))
            g = g.append_column(f"run_{c}", pa.array(run - base))
        if row_number:
            idx = np.arange(n, dtype=np.int64)
            first = np.repeat(seg_starts, np.diff(np.append(seg_starts, n)))
            g = g.append_column("row_num", pa.array(idx - first + 1))
        return g

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(cumulate, batch_format="pyarrow")
    )


def count_distinct_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    out_col: str = "n_distinct",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """EXACT per-group distinct count — the oracle-exact complement of the
    HLL sketch (:func:`raycdc.sketch.approx_ndistinct` profiles a whole
    column shuffle-free; this gives exact per-group counts when you need
    them).

    Scale shape: each batch first collapses to its DISTINCT
    ``(group, value)`` pairs (map-side dedup — the combiner lever: with
    heavy repetition the exchange carries the distinct pairs, not the
    rows), then ONE bucketed exchange on the group and a per-bucket
    global distinct + count.  Nulls in ``value_col`` are ignored (SQL
    ``COUNT(DISTINCT ...)`` semantics); a group whose values are ALL null
    is absent from the output.
    """
    from raycdc.engine import _configure_shuffle
    from raycdc.partition import bucket_keys

    _configure_shuffle()

    def _cast_back(out: pa.Table, like: pa.Schema) -> pa.Table:
        for c in (group_col, value_col):
            if c in out.column_names:
                i = out.schema.get_field_index(c)
                out = out.set_column(i, c, out[c].cast(like.field(c).type))
        return out

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        t = t.select([group_col, value_col]).filter(pc.is_valid(t[value_col]))
        out = pl.from_arrow(t).unique().to_arrow()
        out = _cast_back(out, t.schema)
        return out.append_column(
            "__bucket", bucket_keys(out, [group_col], num_partitions)
        )

    def finalize(g: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(g.select([group_col, value_col]))
        agg = (
            df.unique()
            .group_by(group_col)
            .agg(pl.len().alias(out_col))
            .to_arrow()
        )
        agg = _cast_back(agg, g.schema)
        return agg.set_column(
            agg.schema.get_field_index(out_col),
            out_col,
            agg[out_col].cast(pa.int64()),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(finalize, batch_format="pyarrow")
    )


def pivot_wide(
    ds: "ray.data.Dataset",
    group_col: str,
    pivot_col: str,
    value_col: str,
    values: Sequence,
    count_alias: str = "n_rows",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Pivot to wide: one output row per ``group_col`` with a summed
    ``{value_col}_{v}`` column per pivot value ``v`` (rows with other pivot
    values contribute 0) plus a total row count.

    ``values`` must be the EXPLICIT pivot domain — discovering it would be
    an extra distinct pass over the data; at lake scale the domain is
    schema knowledge (event types, locales), not data.  Expressed as a
    pure projection (per-value masked copies of ``value_col``) feeding
    :func:`pre_aggregate`, so it inherits the map-side combine + single
    bucketed exchange; cost is O(len(values)) columns, not an extra
    shuffle.
    """
    out_cols = [f"{value_col}_{v}" for v in values]

    def widen(t: pa.Table) -> pa.Table:
        cols = {group_col: t[group_col]}
        piv = t[pivot_col]
        val = t[value_col]
        zero = pa.scalar(0, val.type)
        for v, name in zip(values, out_cols):
            # fill_null: a null pivot value matches nothing → contributes 0
            cols[name] = pc.if_else(
                pc.fill_null(pc.equal(piv, v), False), val, zero
            )
        return pa.table(cols)

    return pre_aggregate(
        ds.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
        key_cols=[group_col],
        sum_cols=out_cols,
        count_alias=count_alias,
        num_partitions=num_partitions,
    )


def sample_to_quota(
    ds: "ray.data.Dataset",
    strata_col: str,
    key_col: str,
    quota: int,
) -> "ray.data.Dataset":
    """Downsample every stratum to ≈ ``quota`` rows with a DETERMINISTIC,
    data-derived rate — the "cap each domain/source at N documents"
    mixing step of a training-data pipeline, where the rates cannot be
    known ahead because they depend on the corpus itself.

    Two phases: (1) per-stratum counts — per-batch partials folded on the
    driver, bounded by the number of distinct strata (domains/sources are
    bounded by definition; this is a few KB, not a shuffle); (2) the pure
    per-batch Knuth-hash filter of :func:`raycdc.ops.stratified_sample`
    with thresholds ``min(10000, 10000·quota // count)`` — ALL-INTEGER
    arithmetic, so a SQL oracle reproduces membership bit-for-bit (no
    float rate ever exists).  Strata under quota keep every row; the kept
    set is a pure function of the data (stable under re-runs, re-sharding
    and cluster size, like the lake layout).
    """
    import polars as pl

    from raycdc.ops import hash_bucket

    def cnt_partial(t: pa.Table) -> pa.Table:
        agg = (
            pl.from_arrow(t.select([strata_col]))
            .group_by(strata_col)
            .agg(pl.len().alias("c"))
            .to_arrow()
        )
        return agg.set_column(
            agg.schema.get_field_index(strata_col),
            strata_col,
            agg[strata_col].cast(t.schema.field(strata_col).type),
        ).set_column(
            agg.schema.get_field_index("c"), "c", agg["c"].cast(pa.int64())
        )

    parts = ds.map_batches(
        cnt_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    # dropna=False: a null stratum is a stratum (SQL GROUP BY semantics) —
    # the default would silently DELETE every null-stratum row downstream
    counts = parts.groupby(strata_col, dropna=False)["c"].sum().to_dict()
    thresholds: dict = {}
    null_threshold = 0
    for s, c in counts.items():
        if c <= 0:
            continue
        th = min(10_000, (10_000 * int(quota)) // int(c))
        if s is None or (isinstance(s, float) and np.isnan(s)):
            null_threshold = th
        else:
            thresholds[s] = th

    def keep(t: pa.Table) -> pa.Table:
        b = hash_bucket(t[key_col])
        strata = t[strata_col]
        cutoff: pa.Array | pa.ChunkedArray = pc.if_else(
            pc.is_null(strata),
            pa.scalar(null_threshold, pa.int64()),
            pa.scalar(0, pa.int64()),
        )
        for value, th in thresholds.items():
            cond = pc.fill_null(pc.equal(strata, value), False)
            cutoff = pc.if_else(cond, pa.scalar(th, pa.int64()), cutoff)
        return t.filter(pc.less(b, cutoff))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def pre_aggregate(
    ds: "ray.data.Dataset",
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_alias: str = "n_rows",
    num_partitions: int = 64,
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
) -> "ray.data.Dataset":
    """Two-phase aggregation: per-batch partial sums/counts (map-side
    combine), then ONE bucketed exchange — the explicit form of "push
    aggregation before the shuffle".

    ``min_cols`` / ``max_cols`` map source column → output alias and add
    mergeable MIN / MAX aggregates (min-of-partial-mins ==
    min-of-all-rows, so they combine map-side exactly like the sums); the
    same source column may feed both (e.g. ``min_cols={"lsn":
    "first_lsn"}, max_cols={"lsn": "last_lsn"}``).  Aliases must not
    collide with key / sum / count names.

    Scale-critical detail: the final stage groups by a HASH BUCKET of the
    key tuple (``num_partitions`` groups total), and each bucket task runs
    one vectorized polars group_by over its real keys.  Grouping by the
    raw keys instead would make Ray's ``map_groups`` issue one Python UDF
    call PER DISTINCT KEY — measured 61 s vs 2 s for a 183k-group
    sliding-window rollup at sf0.1.  A bucket is a pure function of the
    key tuple, so every partial for a key lands in exactly one task.
    """
    from raycdc.engine import _configure_shuffle
    from raycdc.partition import bucket_keys

    _configure_shuffle()
    min_cols = min_cols or {}
    max_cols = max_cols or {}
    extrema_aliases = list(min_cols.values()) + list(max_cols.values())
    reserved = set(key_cols) | set(sum_cols) | {count_alias}
    clash = reserved.intersection(extrema_aliases)
    if clash or len(set(extrema_aliases)) != len(extrema_aliases):
        raise ValueError(
            f"pre_aggregate: min/max aliases must be unique and distinct "
            f"from key/sum/count columns (clash: {sorted(clash)})"
        )

    def _polars_agg(t: pa.Table, is_partial: bool) -> pa.Table:
        # partial pass counts rows (pl.len) and takes min/max of the raw
        # source columns; the final pass SUMS the partial counts and takes
        # min/max OF THE PARTIAL extrema (both are mergeable)
        import polars as pl

        extra_srcs = (
            sorted({*min_cols, *max_cols} - set(sum_cols) - set(key_cols))
            if is_partial
            else extrema_aliases
        )
        df = pl.from_arrow(t.select(list(key_cols) + list(sum_cols) + (
            extra_srcs + ([] if is_partial else [count_alias])
        )))
        agg = df.group_by(list(key_cols)).agg(
            [pl.col(c).sum().alias(c) for c in sum_cols]
            + [
                pl.col(src if is_partial else alias).min().alias(alias)
                for src, alias in min_cols.items()
            ]
            + [
                pl.col(src if is_partial else alias).max().alias(alias)
                for src, alias in max_cols.items()
            ]
            + [
                (pl.len() if is_partial else pl.col(count_alias).sum()).alias(
                    count_alias
                )
            ]
        )
        out = agg.to_arrow()
        # polars may emit large_string keys; align to the input schema
        for k in key_cols:
            i = out.schema.get_field_index(k)
            out = out.set_column(i, k, out[k].cast(t.schema.field(k).type))
        return out.set_column(
            out.schema.get_field_index(count_alias),
            count_alias,
            out[count_alias].cast(pa.int64()),
        )

    def partial(batch: pa.Table) -> pa.Table:
        out = _polars_agg(batch, is_partial=True)
        return out.append_column("__bucket", bucket_keys(out, key_cols, num_partitions))

    def final(g: pa.Table) -> pa.Table:
        return _polars_agg(g, is_partial=False)

    return ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__bucket", num_partitions=num_partitions).map_groups(
        final, batch_format="pyarrow"
    )


def range_join_agg(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: float = -3600.0,
    upper: float = 0.0,
    value_col: str | None = None,
    count_alias: str = "n_matched",
    sum_alias: str | None = None,
    num_partitions: int = 64,
    l_schema: "pa.Schema | None" = None,
    r_schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Range (interval) join, aggregated per left row: for every left row
    count — and optionally sum ``value_col`` over — the right rows of the
    same ``on`` key whose timestamp falls in
    ``[left_ts + lower, left_ts + upper)`` seconds (lower inclusive,
    upper exclusive; SQL ``r.ts >= l.ts + lower AND r.ts < l.ts + upper``).

    The aggregated form is the scale-sane primitive: a fan-out range join
    multiplies rows, while this ships each left row through exactly once.
    Both sides stream through one tagged union and ONE co-partitioned
    bucketed exchange (same shape as :func:`asof_join`).  The group body
    is fully vectorized via positional cancellation: one lexsort of
    (key_code, ts, side) over right rows plus BOTH window-bound queries,
    a prefix count/sum of right rows, and ``pos(hi) - pos(lo)`` — right
    rows of other keys appear identically in both bound positions and
    cancel, so no per-key segmentation is needed.  Queries sort BEFORE
    equal right timestamps, giving inclusive-lower/exclusive-upper
    exactly.

    Sums are exact only for integer ``value_col`` (convert money to
    cents upstream); float sums inherit cumsum reassociation error.
    """
    from raycdc.engine import _configure_shuffle
    from raycdc.partition import bucket_keys

    _configure_shuffle()
    if lower > upper:
        raise ValueError(
            f"range_join_agg: lower ({lower}) must be <= upper ({upper}) — "
            "an inverted window would silently yield negative counts"
        )
    if sum_alias is None and value_col is not None:
        sum_alias = f"sum_{value_col}"

    if l_schema is None:
        l_schema = dataset_schema(left)
    if r_schema is None:
        r_schema = dataset_schema(right)
    l_names = list(l_schema.names)
    val_type = r_schema.field(value_col).type if value_col else pa.int64()
    if value_col and not (
        pa.types.is_integer(val_type) or pa.types.is_floating(val_type)
    ):
        raise ValueError(
            f"range_join_agg: value_col {value_col!r} must be numeric, got {val_type}"
        )
    lo_us = int(round(lower * 1_000_000))
    hi_us = int(round(upper * 1_000_000))

    uni = pa.schema(
        [pa.field(n, l_schema.field(n).type) for n in l_names]
        + [
            pa.field("__rv", val_type),
            pa.field("__side", pa.int8()),
            pa.field("__bucket", pa.int64()),
        ]
    )

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in l_names}
        cols["__rv"] = pa.nulls(len(t), val_type)
        cols["__side"] = pa.array(np.ones(len(t), dtype=np.int8))
        cols["__bucket"] = bucket_keys(t, [on], num_partitions)
        return pa.table(cols, schema=uni)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for n in l_names:
            if n == on:
                cols[n] = t[n].cast(l_schema.field(n).type)
            elif n == left_ts:
                cols[n] = t[right_ts].cast(l_schema.field(left_ts).type)
            else:
                cols[n] = pa.nulls(len(t), l_schema.field(n).type)
        cols["__rv"] = (
            t[value_col].cast(val_type) if value_col else pa.nulls(len(t), val_type)
        )
        cols["__side"] = pa.array(np.zeros(len(t), dtype=np.int8))
        cols["__bucket"] = bucket_keys(t, [on], num_partitions)
        return pa.table(cols, schema=uni)

    out_fields = [pa.field(n, l_schema.field(n).type) for n in l_names] + [
        pa.field(count_alias, pa.int64())
    ]
    if value_col:
        sum_type = pa.int64() if pa.types.is_integer(val_type) else pa.float64()
        out_fields.append(pa.field(sum_alias, sum_type))
    out_schema = pa.schema(out_fields)

    def agg(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        side = g["__side"].to_numpy(zero_copy_only=False)
        ts = (
            g[left_ts]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        from raycdc.partition import key_codes

        codes = key_codes(g[on])
        is_l = side == 1
        left_rows = np.flatnonzero(is_l)
        # SQL equality never matches NULL keys: drop null-key RIGHT rows
        # (code -1); null-key left rows stay and naturally count 0
        r_sel = (~is_l) & (codes != -1)
        r_codes, r_ts = codes[r_sel], ts[r_sel]
        l_codes, l_ts = codes[is_l], ts[is_l]
        m, n = len(r_codes), len(l_codes)
        # union of right rows and both bound queries; queries (tie 0) sort
        # before right rows (tie 1) at equal (code, ts)
        code_all = np.concatenate([r_codes, l_codes, l_codes])
        ts_all = np.concatenate([r_ts, l_ts + lo_us, l_ts + hi_us])
        tie = np.concatenate(
            [np.ones(m, np.int8), np.zeros(2 * n, np.int8)]
        )
        order = np.lexsort((tie, ts_all, code_all))
        is_right_sorted = tie[order] == 1
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = np.arange(len(order))
        prefix_n = np.cumsum(is_right_sorted) - is_right_sorted
        pos_lo = prefix_n[rank[m : m + n]]
        pos_hi = prefix_n[rank[m + n :]]
        cols = {
            nme: g[nme].combine_chunks().take(pa.array(left_rows))
            for nme in l_names
        }
        cols[count_alias] = pa.array(pos_hi - pos_lo, pa.int64())
        if value_col:
            # fill left-row nulls BEFORE to_numpy: a nullable int column
            # otherwise round-trips through float64 (mangles > 2^53)
            rv = pc.fill_null(g["__rv"], 0).to_numpy(zero_copy_only=False)[r_sel]
            acc_dtype = np.int64 if pa.types.is_integer(val_type) else np.float64
            vals = np.zeros(len(order), dtype=acc_dtype)
            vals[rank[:m]] = rv.astype(acc_dtype)
            psum = np.cumsum(vals) - vals
            cols[sum_alias] = pa.array(
                psum[rank[m + n :]] - psum[rank[m : m + n]]
            )
        return pa.table(cols, schema=out_schema)

    tagged = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )
    return tagged.groupby("__bucket", num_partitions=num_partitions).map_groups(
        agg, batch_format="pyarrow"
    )


def rolling_aggregate(
    ds: "ray.data.Dataset",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    value_col: str = "value",
    window_rows: int = 5,
    alias: str | None = None,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-entity rolling sum over the last ``window_rows`` rows in
    event-time order — the bounded ROWS window
    (``SUM(x) OVER (PARTITION BY e ORDER BY ts ROWS BETWEEN k-1 PRECEDING
    AND CURRENT ROW)``).  Same distributed shape as
    :func:`running_aggregate`: one entity-bucketed exchange, then a
    vectorized per-bucket pass — the window sum is two prefix-sum gathers
    (``S[i+1] - S[max(i-k+1, seg_start)]``), no per-row loop and no O(n·k)
    re-scan.

    Integer value columns stay exact; float columns inherit cumsum
    reassociation — use integer cents when an oracle must hash-match.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    out_col = alias or f"roll_{value_col}"
    sort_keys = [(entity_col, "ascending"), (ts_col, "ascending")] + [
        (c, "ascending") for c in order_cols
    ]
    tag = _tag_bucket(entity_col, num_partitions)

    def roll(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(sort_keys)
        n = len(g)
        if n == 0:
            return g.append_column(out_col, pa.array([], pa.int64()))
        ent = g[entity_col].combine_chunks()
        new_entity = np.ones(n, dtype=bool)
        if n > 1:
            a, b = ent.slice(1), ent.slice(0, n - 1)
            eq = pc.fill_null(pc.equal(a, b), False)
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            new_entity[1:] = ~pc.or_(eq, both_null).to_numpy(zero_copy_only=False)
        seg_starts = np.where(new_entity)[0]
        first = np.repeat(seg_starts, np.diff(np.append(seg_starts, n)))
        vals = g[value_col].to_numpy(zero_copy_only=False)
        prefix = np.concatenate([[0], np.cumsum(vals)])
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum(idx - (window_rows - 1), first)
        return g.append_column(out_col, pa.array(prefix[idx + 1] - prefix[start]))

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(roll, batch_format="pyarrow")
    )


def group_quantiles(
    ds: "ray.data.Dataset",
    group_col: str = "user_id",
    value_col: str = "value",
    qs: Sequence[float] = (0.5,),
    aliases: Sequence[str] | None = None,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Exact per-group continuous quantiles (linear interpolation — the
    semantics of DuckDB ``quantile_cont`` / numpy default).  Complements
    :mod:`raycdc.sketch`'s t-digest: exact when each group's values fit a
    task, mergeable-approximate when they don't.

    One group-bucketed exchange; per bucket ONE sort of (group, value)
    gives every group's order statistics, then each quantile is two
    vectorized gathers (floor/ceil rank) + an interpolation — no per-group
    loop.  Null values are ignored (SQL aggregate semantics); all-null
    groups are dropped.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    qs = list(qs)
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("qs must be non-empty fractions in [0, 1]")
    names = list(aliases) if aliases else [f"q{int(round(q * 100))}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("aliases must match qs in length")
    tag = _tag_bucket(group_col, num_partitions)

    def quantiles(g: pa.Table) -> pa.Table:
        gt = pa.table(
            {group_col: g[group_col], "__v": g[value_col]}
        ).filter(pc.is_valid(g[value_col]))
        out_schema = pa.schema(
            [g.schema.field(group_col)]
            + [pa.field(nm, pa.float64()) for nm in names]
        )
        n = len(gt)
        if n == 0:
            return out_schema.empty_table()
        gt = gt.sort_by([(group_col, "ascending"), ("__v", "ascending")])
        grp = gt[group_col].combine_chunks()
        new_grp = np.ones(n, dtype=bool)
        if n > 1:
            a, b = grp.slice(1), grp.slice(0, n - 1)
            eq = pc.or_(
                pc.fill_null(pc.equal(a, b), False),
                pc.and_(pc.is_null(a), pc.is_null(b)),
            )
            new_grp[1:] = ~eq.to_numpy(zero_copy_only=False)
        seg_starts = np.where(new_grp)[0]
        seg_lens = np.diff(np.append(seg_starts, n))
        v = gt["__v"].to_numpy(zero_copy_only=False).astype(np.float64)
        cols = {group_col: grp.take(pa.array(seg_starts))}
        for q, nm in zip(qs, names):
            pos = (seg_lens - 1) * q
            lo = np.floor(pos).astype(np.int64)
            hi = np.ceil(pos).astype(np.int64)
            frac = pos - lo
            cols[nm] = pa.array(
                v[seg_starts + lo] * (1.0 - frac) + v[seg_starts + hi] * frac
            )
        return pa.table(cols, schema=out_schema)

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(quantiles, batch_format="pyarrow")
    )


def assemble_group_text(
    ds: "ray.data.Dataset",
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
    role_col: str | None = None,
    role_value: str = "user",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Assemble each group's text rows into one document in ``order_col``
    order — the transcript-reconstruction op for conversation payloads
    (turn rows → one training document per conversation), with per-group
    turn/char counters and an optional role counter.

    One group-bucketed exchange; per bucket ONE sort of (group, order),
    then the concatenation is a single ``pc.binary_join`` over a ListArray
    built from the segment offsets — the join, the counts, and the role
    sum are all offset arithmetic, no per-group loop.

    Output: ``group_col``, ``transcript`` (string), ``n_turns`` (int64),
    ``n_chars`` (int64, chars of the joined transcript incl. separators),
    and ``n_<role_value>`` when ``role_col`` is given.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    tag = _tag_bucket(group_col, num_partitions)
    role_alias = f"n_{role_value}" if role_col else None

    def assemble(g: pa.Table) -> pa.Table:
        out_fields = [
            g.schema.field(group_col),
            pa.field("transcript", pa.string()),
            pa.field("n_turns", pa.int64()),
            pa.field("n_chars", pa.int64()),
        ]
        if role_col:
            out_fields.append(pa.field(role_alias, pa.int64()))
        out_schema = pa.schema(out_fields)
        n = len(g)
        if n == 0:
            return out_schema.empty_table()
        g = g.drop_columns(["__bucket"]).sort_by(
            [(group_col, "ascending"), (order_col, "ascending")]
        )
        grp = g[group_col].combine_chunks()
        new_grp = np.ones(n, dtype=bool)
        if n > 1:
            a, b = grp.slice(1), grp.slice(0, n - 1)
            eq = pc.or_(
                pc.fill_null(pc.equal(a, b), False),
                pc.and_(pc.is_null(a), pc.is_null(b)),
            )
            new_grp[1:] = ~eq.to_numpy(zero_copy_only=False)
        seg_starts = np.where(new_grp)[0]
        offsets = np.append(seg_starts, n).astype(np.int32)
        texts = g[text_col].combine_chunks().cast(pa.string())
        # string_agg semantics: null texts are SKIPPED (a raw binary_join
        # would null the whole transcript); groups with zero non-null
        # texts get a null transcript
        valid = texts.is_valid().to_numpy(zero_copy_only=False)
        vcum = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
        voffsets = vcum[offsets].astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(voffsets, pa.int32()), texts.drop_null()
        )
        joined = pc.if_else(
            pa.array(np.diff(voffsets) > 0),
            pc.binary_join(lists, sep),
            pa.scalar(None, pa.string()),
        )
        cols = {
            group_col: grp.take(pa.array(seg_starts)),
            "transcript": joined,
            "n_turns": pa.array(np.diff(offsets).astype(np.int64)),
            "n_chars": pc.utf8_length(joined).cast(pa.int64()),
        }
        if role_col:
            # null roles count as non-matches — without the fill, the null
            # propagates through the cast into a float NaN that poisons
            # every later group's cumsum
            is_role = (
                pc.cast(
                    pc.fill_null(
                        pc.equal(g[role_col].combine_chunks(), role_value),
                        False,
                    ),
                    pa.int64(),
                )
                .to_numpy(zero_copy_only=False)
            )
            csum = np.concatenate([[0], np.cumsum(is_role)])
            cols[role_alias] = pa.array(
                csum[offsets[1:]] - csum[offsets[:-1]]
            )
        return pa.table(cols, schema=out_schema)

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(assemble, batch_format="pyarrow")
    )


def merge_adjacent_turns(
    ds: "ray.data.Dataset",
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Merge each run of consecutive same-role turns into ONE turn — the
    transcript-normalization transform (multi-message assistant bursts,
    retried user sends, and streamed tool chunks become a single turn
    before assembly / SFT extraction).  The read-only companion is
    :func:`sequence_integrity`, which *counts* these runs.

    Same shape as :func:`assemble_group_text`: one group-bucketed
    exchange, per bucket ONE sort of ``(group, order)``; run boundaries
    (group change OR role change, null-safe) and the per-run ``sep`` join
    are pure offset arithmetic over a ``ListArray`` — no per-group loop.

    Output: ``group_col``, ``order_col`` (the run's FIRST order value),
    ``role_col``, ``text_col`` (run texts ``sep``-joined in order, nulls
    skipped with string_agg semantics), ``n_merged`` (int64 run length).
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    tag = _tag_bucket(group_col, num_partitions)

    def merge(g: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                g.schema.field(group_col),
                g.schema.field(order_col),
                g.schema.field(role_col),
                pa.field(text_col, pa.string()),
                pa.field("n_merged", pa.int64()),
            ]
        )
        n = len(g)
        if n == 0:
            return out_schema.empty_table()
        g = g.drop_columns(["__bucket"]).sort_by(
            [(group_col, "ascending"), (order_col, "ascending")]
        )
        grp = g[group_col].combine_chunks()
        role = g[role_col].combine_chunks()
        new_seg = np.ones(n, dtype=bool)
        if n > 1:

            def eq_prev(col: pa.Array):
                a, b = col.slice(1), col.slice(0, n - 1)
                return pc.or_(
                    pc.fill_null(pc.equal(a, b), False),
                    pc.and_(pc.is_null(a), pc.is_null(b)),
                )

            eq = pc.and_(eq_prev(grp), eq_prev(role))
            new_seg[1:] = ~eq.to_numpy(zero_copy_only=False)
        seg_starts = np.where(new_seg)[0]
        offsets = np.append(seg_starts, n).astype(np.int32)
        texts = g[text_col].combine_chunks().cast(pa.string())
        valid = texts.is_valid().to_numpy(zero_copy_only=False)
        vcum = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
        voffsets = vcum[offsets].astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(voffsets, pa.int32()), texts.drop_null()
        )
        joined = pc.if_else(
            pa.array(np.diff(voffsets) > 0),
            pc.binary_join(lists, sep),
            pa.scalar(None, pa.string()),
        )
        starts = pa.array(seg_starts)
        return pa.table(
            {
                group_col: grp.take(starts),
                order_col: g[order_col].combine_chunks().take(starts),
                role_col: role.take(starts),
                text_col: joined,
                "n_merged": pa.array(np.diff(offsets).astype(np.int64)),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(merge, batch_format="pyarrow")
    )


def context_response_pairs(
    ds: "ray.data.Dataset",
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    response_role: str = "assistant",
    window: int = 4,
    sep: str = "\n",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Extract (context, response) supervised-finetuning pairs from
    conversation turns: every ``response_role`` turn with at least one
    preceding turn yields one training example whose context is the
    ``sep``-joined ``"role: text"`` rendering of up to ``window``
    immediately preceding turns (chronological order).  The
    transcript-to-SFT-example op — the reference's transform layer is
    per-row (handler.go:100-130) and has no cross-row windowing at all.

    Output: ``(group_col, order_col, context, response, n_ctx_turns)``;
    responses with no preceding turn are dropped (nothing to condition
    on).  Exactly SQL-reproducible: ``list(role || ': ' || text) OVER
    (PARTITION BY group ORDER BY order ROWS BETWEEN window PRECEDING AND
    1 PRECEDING)``.

    One group-bucketed exchange; per bucket one sort of (group, order),
    then contexts materialize as ONE flat gather: the response rows'
    window ranges become a flat index array (repeat + offset arithmetic,
    the _shingle_instances trick), one ``take`` of the formatted column,
    and one ``pc.binary_join`` over a ListArray — no per-row loop.  (Not
    ``binary_join_element_wise(null_handling='skip')``: Arrow drops
    all-null rows from that kernel's output instead of emitting a null —
    a length-changing footgun.)
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    if window < 1:
        raise ValueError(f"context_response_pairs: window must be ≥ 1, got {window}")
    tag = _tag_bucket(group_col, num_partitions)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        out_schema = pa.schema(
            [
                g.schema.field(group_col),
                pa.field(order_col, pa.int64()),
                pa.field("context", pa.string()),
                pa.field("response", pa.string()),
                pa.field("n_ctx_turns", pa.int64()),
            ]
        )
        n = len(g)
        if n == 0:
            return out_schema.empty_table()
        g = g.sort_by([(group_col, "ascending"), (order_col, "ascending")])
        grp = g[group_col].combine_chunks()
        new_grp = np.ones(n, dtype=bool)
        if n > 1:
            a, b = grp.slice(1), grp.slice(0, n - 1)
            eq = pc.or_(
                pc.fill_null(pc.equal(a, b), False),
                pc.and_(pc.is_null(a), pc.is_null(b)),
            )
            new_grp[1:] = ~eq.to_numpy(zero_copy_only=False)
        seg_id = np.cumsum(new_grp) - 1
        seg_start = np.where(new_grp)[0][seg_id]
        formatted = pc.binary_join_element_wise(
            g[role_col].combine_chunks().cast(pa.string()),
            g[text_col].combine_chunks().cast(pa.string()),
            ": ",
        )
        idx = np.arange(n, dtype=np.int64)
        n_ctx = np.minimum(idx - seg_start, window)
        is_resp = pc.equal(
            g[role_col].combine_chunks().cast(pa.string()), response_role
        )
        keep = pc.and_(pc.fill_null(is_resp, False), pa.array(n_ctx > 0))
        kept = np.where(keep.to_numpy(zero_copy_only=False))[0]
        # flat gather of every kept row's window range [i - n_ctx, i)
        counts = n_ctx[kept]
        win_starts = kept - counts
        out_off = np.concatenate([[0], np.cumsum(counts)])
        flat_idx = np.repeat(win_starts, counts) + (
            np.arange(int(out_off[-1])) - np.repeat(out_off[:-1], counts)
        )
        ctx_lists = pa.ListArray.from_arrays(
            pa.array(out_off, pa.int32()),
            formatted.take(pa.array(flat_idx)),
        )
        context = pc.binary_join(ctx_lists, sep)
        take_kept = pa.array(kept)
        return pa.table(
            {
                group_col: grp.take(take_kept),
                order_col: g[order_col]
                .combine_chunks()
                .cast(pa.int64())
                .take(take_kept),
                "context": context,
                "response": g[text_col]
                .combine_chunks()
                .cast(pa.string())
                .take(take_kept),
                "n_ctx_turns": pa.array(counts),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouping_rollup(
    ds: "ray.data.Dataset",
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_alias: str = "n_rows",
    num_partitions: int = 64,
    schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """``GROUP BY ROLLUP`` — aggregates at every key-prefix level (full
    keys, each prefix, grand total), with collapsed key columns null.

    ONE full-input pass: the finest level runs :func:`pre_aggregate` over
    the base data (map-side combine + one bucketed exchange) and is
    MATERIALIZED — it is O(distinct key tuples), the one place a
    mid-pipeline materialize is sound — then every coarser level
    (including the grand total) re-aggregates that tiny table by summing
    its sum columns AND its count column.  Total input I/O is one full
    scan plus L passes over the finest aggregate, instead of L+1 full
    scans; exchanged volume stays O(sum of level cardinalities), same as
    a single-pass ROLLUP.
    """
    if not key_cols:
        raise ValueError("grouping_rollup needs at least one key column")
    schema = schema or dataset_schema(ds)
    canon = list(key_cols) + list(sum_cols) + [count_alias]

    def _pad(level_keys: tuple[str, ...]):
        def pad(t: pa.Table) -> pa.Table:
            cols = {}
            for k in key_cols:
                cols[k] = (
                    t[k]
                    if k in level_keys
                    else pa.nulls(len(t), schema.field(k).type)
                )
            for c in sum_cols:
                cols[c] = t[c]
            cols[count_alias] = t[count_alias]
            return pa.table(cols).select(canon)

        return pad

    finest = pre_aggregate(
        ds, list(key_cols), sum_cols, count_alias, num_partitions
    ).materialize()
    levels = [
        finest.map_batches(
            _pad(tuple(key_cols)), batch_format="pyarrow", zero_copy_batch=True
        )
    ]

    def _reagg(keys: list[str]):
        """Coarser level from the finest: sums AND the count column sum."""
        agg = pre_aggregate(
            finest,
            keys,
            [*sum_cols, count_alias],
            count_alias="__n_finest",
            num_partitions=num_partitions,
        )
        return agg.map_batches(
            lambda t, _k=tuple(keys): _pad(_k)(t.drop_columns(["__n_finest"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    for depth in range(len(key_cols) - 1, 0, -1):
        levels.append(_reagg(list(key_cols[:depth])))

    # grand total: constant-key re-aggregation of the finest level
    const = "__rollup_all"

    def add_const(t: pa.Table) -> pa.Table:
        return t.append_column(const, pa.array(np.zeros(len(t), np.int64)))

    total = pre_aggregate(
        finest.map_batches(
            add_const, batch_format="pyarrow", zero_copy_batch=True
        ),
        [const],
        [*sum_cols, count_alias],
        count_alias="__n_finest",
        num_partitions=1,
    ).map_batches(
        lambda t: _pad(())(t.drop_columns([const, "__n_finest"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    levels.append(total)

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def standardize(
    ds: "ray.data.Dataset",
    group_col: str = "user_id",
    value_col: str = "value",
    z_alias: str = "z",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-group z-score standardization (feature normalization):
    ``z = (v - mean_g) / stddev_pop_g``, null when the group's variance is
    zero (constant groups carry no signal).

    ONE bucketed exchange computes both the group statistics and the
    per-row scores — no second stats-join pass: within a bucket, one sort
    of (group) + ``np.add.reduceat`` segment sums of v and v² give every
    group's sufficient statistics, and the z is a vectorized gather.

    Exactness contract for oracles: pass INTEGER values (cents) — the
    sufficient statistics are then exact int64 sums and both engines can
    evaluate the identical double expression ``(s2/n - (s1/n)²)``
    bit-for-bit (see ⊕zscore_events).  Float inputs work but inherit
    accumulation-order differences.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    tag = _tag_bucket(group_col, num_partitions)

    def score(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by([(group_col, "ascending")])
        n = len(g)
        if n == 0:
            return g.append_column(z_alias, pa.array([], pa.float64()))
        grp = g[group_col].combine_chunks()
        new_grp = np.ones(n, dtype=bool)
        if n > 1:
            a, b = grp.slice(1), grp.slice(0, n - 1)
            eq = pc.or_(
                pc.fill_null(pc.equal(a, b), False),
                pc.and_(pc.is_null(a), pc.is_null(b)),
            )
            new_grp[1:] = ~eq.to_numpy(zero_copy_only=False)
        seg_starts = np.where(new_grp)[0]
        seg_lens = np.diff(np.append(seg_starts, n)).astype(np.int64)
        col = g[value_col].combine_chunks()
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        # SQL aggregate semantics: null values are excluded from the group
        # statistics and get a null z themselves.  Integer inputs keep
        # int64-exact sums (the bit-exact oracle path); floats sum in
        # float64 (docstring: accumulation-order caveat).
        if pa.types.is_integer(col.type):
            vi = (
                pc.fill_null(col, 0)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            s1 = np.add.reduceat(np.where(valid, vi, 0), seg_starts).astype(
                np.float64
            )
            # int64-exact squares only while they provably cannot wrap
            # (vi*vi silently overflows past |v|≈3e9 and the np.maximum
            # clamp below would turn the garbage into sd=0, z=null);
            # larger magnitudes take the float64 path like float inputs
            max_abs = int(np.abs(vi).max()) if n else 0
            if max_abs == 0 or max_abs * max_abs <= (2**62) // n:
                s2 = np.add.reduceat(
                    np.where(valid, vi * vi, 0), seg_starts
                ).astype(np.float64)
            else:
                # raw float squares would ALSO fail here — var ~ s2/n -
                # mean² cancels catastrophically when mean² >> var — so
                # the large-magnitude path computes a CENTERED second
                # moment below (s2 = None sentinel)
                s2 = None
            v = vi.astype(np.float64)
        else:
            vf = (
                pc.fill_null(col, 0)
                .cast(pa.float64())
                .to_numpy(zero_copy_only=False)
            )
            s1 = np.add.reduceat(np.where(valid, vf, 0.0), seg_starts)
            s2 = np.add.reduceat(np.where(valid, vf * vf, 0.0), seg_starts)
            v = vf
        n_valid = np.add.reduceat(valid.astype(np.int64), seg_starts).astype(
            np.float64
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = s1 / n_valid
            if s2 is None:
                dev = np.where(valid, v - np.repeat(mean, seg_lens), 0.0)
                var = np.add.reduceat(dev * dev, seg_starts) / n_valid
            else:
                var = s2 / n_valid - mean * mean
            sd = np.sqrt(np.maximum(var, 0.0))
            row_mean = np.repeat(mean, seg_lens)
            row_sd = np.repeat(sd, seg_lens)
            z = (v - row_mean) / row_sd
        null_out = ~valid | (np.repeat(n_valid, seg_lens) == 0) | (row_sd == 0)
        return g.append_column(
            z_alias, pa.array(np.where(null_out, 0.0, z), mask=null_out)
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(score, batch_format="pyarrow")
    )


def percent_rank(
    ds: "ray.data.Dataset",
    group_col: str = "user_id",
    value_col: str = "value",
    alias: str = "pct_rank",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """SQL ``PERCENT_RANK() OVER (PARTITION BY g ORDER BY v)``:
    ``(rank - 1) / (n - 1)`` with ties sharing the rank of their first
    row, 0.0 for single-row groups.  Bit-exact across engines — the score
    is one double division of two integers.

    One bucketed exchange; per bucket ONE sort of (group, value), then
    tie-run starts come from a boundary mask and each row's rank is a
    single ``np.maximum.accumulate`` forward-fill — no per-group loop.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    tag = _tag_bucket(group_col, num_partitions)

    def score(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(
            [(group_col, "ascending"), (value_col, "ascending")]
        )
        n = len(g)
        if n == 0:
            return g.append_column(alias, pa.array([], pa.float64()))

        def _bounds(col) -> np.ndarray:
            arr = col.combine_chunks()
            new = np.ones(n, dtype=bool)
            if n > 1:
                a, b = arr.slice(1), arr.slice(0, n - 1)
                eq = pc.or_(
                    pc.fill_null(pc.equal(a, b), False),
                    pc.and_(pc.is_null(a), pc.is_null(b)),
                )
                new[1:] = ~eq.to_numpy(zero_copy_only=False)
            return new

        new_seg = _bounds(g[group_col])
        new_run = new_seg | _bounds(g[value_col])
        idx = np.arange(n, dtype=np.int64)
        seg_starts = np.where(new_seg)[0]
        seg_lens = np.diff(np.append(seg_starts, n))
        seg_first = np.repeat(seg_starts, seg_lens)
        seg_n = np.repeat(seg_lens, seg_lens).astype(np.float64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, -1))
        rank0 = (run_start - seg_first).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            pct = np.where(seg_n > 1, rank0 / (seg_n - 1.0), 0.0)
        return g.append_column(alias, pa.array(pct))

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(score, batch_format="pyarrow")
    )


def ntile(
    ds: "ray.data.Dataset",
    group_col: str = "user_id",
    order_cols: Sequence[str] = ("value",),
    k: int = 4,
    alias: str = "tile",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """SQL ``NTILE(k) OVER (PARTITION BY g ORDER BY ...)``: rows split
    into k buckets with the first ``n % k`` buckets one row larger.
    ``order_cols`` should be a TOTAL order (include a unique tiebreak) or
    tied rows land in engine-dependent tiles.  Integer output — oracles
    hash exactly.

    One bucketed exchange; per bucket one sort and the tile assignment is
    pure position arithmetic on segment offsets.
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()
    if k < 1:
        raise ValueError("ntile k must be >= 1")
    tag = _tag_bucket(group_col, num_partitions)
    sort_keys = [(group_col, "ascending")] + [
        (c, "ascending") for c in order_cols
    ]

    def assign(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(sort_keys)
        n = len(g)
        if n == 0:
            return g.append_column(alias, pa.array([], pa.int64()))
        grp = g[group_col].combine_chunks()
        new_grp = np.ones(n, dtype=bool)
        if n > 1:
            a, b = grp.slice(1), grp.slice(0, n - 1)
            eq = pc.or_(
                pc.fill_null(pc.equal(a, b), False),
                pc.and_(pc.is_null(a), pc.is_null(b)),
            )
            new_grp[1:] = ~eq.to_numpy(zero_copy_only=False)
        seg_starts = np.where(new_grp)[0]
        seg_lens = np.diff(np.append(seg_starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(seg_starts, seg_lens)
        seg_n = np.repeat(seg_lens, seg_lens)
        small = seg_n // k
        big_cnt = seg_n % k
        threshold = big_cnt * (small + 1)
        in_big = pos < threshold
        # groups with n < k: small == 0 — every row is in a big bucket of
        # size 1, so the small-branch division never sees a zero divisor
        safe_small = np.maximum(small, 1)
        tile = np.where(
            in_big,
            pos // (small + 1),
            big_cnt + (pos - threshold) // safe_small,
        )
        return g.append_column(alias, pa.array(tile + 1))

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(assign, batch_format="pyarrow")
    )


def preference_pairs(
    ds: "ray.data.Dataset",
    group_col: str,
    score_col: str,
    id_col: str,
    text_col: str | None = None,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Reward-ranked (chosen, rejected) pair mining — the DPO/RLHF
    data-prep op: per group (a prompt, a user, a conversation), the
    highest-scoring candidate becomes ``chosen`` and the lowest-scoring
    becomes ``rejected``; groups with fewer than two scored candidates
    yield nothing.  (The reference's transform layer is strictly per-row
    — handler.go:100-130 — cross-candidate ranking is part of this
    repo's training-data extension, like :func:`context_response_pairs`.)

    Deterministic tie-breaks, exactly SQL-reproducible: chosen = first
    under ``(score DESC, id ASC)``, rejected = first under ``(score ASC,
    id DESC)`` — so equal-score groups still mine a stable (min-id,
    max-id) pair with ``margin = 0``; filter on ``margin`` downstream
    when only strict preferences should train.  Null scores are dropped
    before ranking (SQL ORDER BY semantics vary per engine — removing
    them makes both sides agree); null groups are refused by
    :func:`raycdc.partition.segment_starts`.

    Output: ``(group_col, chosen_id, rejected_id, chosen_score,
    rejected_score, margin, n_candidates[, chosen_text,
    rejected_text])``.  One group-bucketed exchange
    (:func:`raycdc.partition.bucket_keys` — never one UDF call per
    group); per bucket ONE sort + :func:`segment_starts`, chosen rows
    are the segment heads and rejected rows the segment tails — no
    per-group filters, no row loop.
    """
    from raycdc.engine import _configure_shuffle
    from raycdc.partition import segment_starts

    _configure_shuffle()
    tag = _tag_bucket(group_col, num_partitions)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"])
        fields = [
            g.schema.field(group_col),
            pa.field("chosen_id", pa.int64()),
            pa.field("rejected_id", pa.int64()),
            pa.field("chosen_score", pa.float64()),
            pa.field("rejected_score", pa.float64()),
            pa.field("margin", pa.float64()),
            pa.field("n_candidates", pa.int64()),
        ]
        if text_col is not None:
            fields += [
                pa.field("chosen_text", pa.string()),
                pa.field("rejected_text", pa.string()),
            ]
        out_schema = pa.schema(fields)
        g = g.filter(pc.is_valid(g[score_col]))
        if len(g) == 0:
            return out_schema.empty_table()
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[
                    (group_col, "ascending"),
                    (score_col, "descending"),
                    (id_col, "ascending"),
                ],
            )
        )
        grp = g[group_col].combine_chunks()
        starts = segment_starts(grp)
        ends = np.r_[starts[1:], len(grp)] - 1
        n_cand = (ends - starts + 1).astype(np.int64)
        keep = n_cand >= 2
        starts, ends, n_cand = starts[keep], ends[keep], n_cand[keep]
        if not len(starts):
            return out_schema.empty_table()
        ids = g[id_col].combine_chunks().cast(pa.int64())
        scores = g[score_col].combine_chunks().cast(pa.float64())
        c_take, r_take = pa.array(starts), pa.array(ends)
        c_score = scores.take(c_take).to_numpy(zero_copy_only=False)
        r_score = scores.take(r_take).to_numpy(zero_copy_only=False)
        cols = {
            group_col: grp.take(c_take),
            "chosen_id": ids.take(c_take),
            "rejected_id": ids.take(r_take),
            "chosen_score": pa.array(c_score),
            "rejected_score": pa.array(r_score),
            "margin": pa.array(c_score - r_score),
            "n_candidates": pa.array(n_cand),
        }
        if text_col is not None:
            txt = g[text_col].combine_chunks().cast(pa.string())
            cols["chosen_text"] = txt.take(c_take)
            cols["rejected_text"] = txt.take(r_take)
        return pa.table(cols, schema=out_schema)

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pyarrow")
    )
