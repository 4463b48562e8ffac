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

from raycdc.partition import bucket_keys, key_codes as _key_code

_BUCKET = "__scd_bucket"


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


def point_in_time(
    history: "ray.data.Dataset",
    probes: "ray.data.Dataset",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    as_of_col: str = "ts",
    payload_cols: tuple[str, ...] = ("text",),
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    lsn_col: str = "lsn",
    num_partitions: int = 64,
    h_schema: "pa.Schema | None" = None,
    p_schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Temporal point lookup: annotate every probe row with the SCD2
    version that was valid at its ``as_of_col`` instant — the row whose
    ``valid_from <= as_of < valid_to`` (``valid_to`` null = still open).
    Probes whose key was deleted, expired, or not yet born at that instant
    get null payloads (LEFT-join semantics).

    Distributed shape: both sides stream through one tagged union and ONE
    co-partitioned bucketed exchange on the key.  Per bucket: a single
    ``np.lexsort`` of (key codes…, ts, side, lsn) — history rows sort
    BEFORE probes at equal ts (``valid_from <= as_of`` is inclusive) and
    same-instant versions resolve to the highest ``lsn_col`` — then a
    segmented forward-fill (one ``np.maximum.accumulate``) finds each
    probe's latest earlier-or-equal version, and a masked gather applies
    the ``as_of < valid_to`` expiry check.  No per-key loop.

    Output: every probe column plus ``payload_cols`` and ``valid_from``
    from the matched version (null when none).
    """
    from raycdc.engine import _configure_shuffle

    _configure_shuffle()

    from raycdc.relational import dataset_schema

    if h_schema is None:
        h_schema = dataset_schema(history)
    if p_schema is None:
        p_schema = dataset_schema(probes)
    p_names = list(p_schema.names)
    pay_types = {c: h_schema.field(c).type for c in payload_cols}

    uni = pa.schema(
        [pa.field(n, p_schema.field(n).type) for n in p_names]
        + [pa.field(f"__h_{c}", t) for c, t in pay_types.items()]
        + [
            pa.field("__vt", pa.timestamp("us")),
            pa.field("__lsn", pa.int64()),
            pa.field("__side", pa.int8()),
            pa.field("__bucket", pa.int64()),
        ]
    )

    def tag_probe(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in p_names}
        for c, typ in pay_types.items():
            cols[f"__h_{c}"] = pa.nulls(len(t), typ)
        cols["__vt"] = pa.nulls(len(t), pa.timestamp("us"))
        cols["__lsn"] = pa.nulls(len(t), pa.int64())
        cols["__side"] = pa.array(np.ones(len(t), dtype=np.int8))
        cols["__bucket"] = bucket_keys(t, key_cols, num_partitions)
        return pa.table(cols, schema=uni)

    def tag_hist(t: pa.Table) -> pa.Table:
        cols = {}
        for n in p_names:
            if n in key_cols:
                cols[n] = t[n].cast(p_schema.field(n).type)
            elif n == as_of_col:
                cols[n] = t[valid_from].cast(p_schema.field(n).type)
            else:
                cols[n] = pa.nulls(len(t), p_schema.field(n).type)
        for c, typ in pay_types.items():
            cols[f"__h_{c}"] = t[c].cast(typ)
        cols["__vt"] = t[valid_to].cast(pa.timestamp("us"))
        cols["__lsn"] = t[lsn_col].cast(pa.int64())
        cols["__side"] = pa.array(np.zeros(len(t), dtype=np.int8))
        cols["__bucket"] = bucket_keys(t, key_cols, num_partitions)
        return pa.table(cols, schema=uni)

    out_fields = [pa.field(n, p_schema.field(n).type) for n in p_names] + [
        pa.field(c, t) for c, t in pay_types.items()
    ] + [pa.field(valid_from, pa.timestamp("us"))]
    out_schema = pa.schema(out_fields)

    def lookup(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        n = len(g)
        side = g["__side"].to_numpy(zero_copy_only=False)
        ts = (
            g[as_of_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        lsn = (
            g["__lsn"]
            .combine_chunks()
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keys = [_key_code(g[k]) for k in key_cols]
        order = np.lexsort((lsn, side, ts, *reversed(keys)))
        same_key = np.ones(n, dtype=bool)
        same_key[0] = False
        for k in keys:
            ks = k[order]
            same_key[1:] &= ks[1:] == ks[:-1]
        new_key = ~same_key
        seg_id = np.cumsum(new_key) - 1
        is_hist = side[order] == 0
        arange = np.arange(n, dtype=np.int64)
        # segmented forward-fill of "latest history position": values from
        # a previous key segment stay below seg_id*n - 1, so they never
        # leak across the boundary
        a = np.where(is_hist, arange + seg_id * n, seg_id * n - 1)
        last_hist = np.maximum.accumulate(a) - seg_id * n
        probe_pos = np.flatnonzero(~is_hist)
        h = last_hist[probe_pos]
        matched = h >= 0
        h_rows_sorted = np.where(matched, h, 0)
        h_orig = order[h_rows_sorted]  # original row index of matched history
        vt = (
            g["__vt"]
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        vt_valid = g["__vt"].combine_chunks().is_valid().to_numpy(
            zero_copy_only=False
        )
        p_ts = ts[order][probe_pos]
        alive = matched & (~vt_valid[h_orig] | (p_ts < vt[h_orig]))
        probe_orig = order[probe_pos]
        cols = {
            nme: g[nme].combine_chunks().take(pa.array(probe_orig))
            for nme in p_names
        }
        gather = pa.array(h_orig, mask=~alive)
        for c in pay_types:
            cols[c] = g[f"__h_{c}"].combine_chunks().take(gather)
        vf_ts = ts[h_orig]
        cols[valid_from] = pa.array(vf_ts, pa.int64(), mask=~alive).cast(
            pa.timestamp("us")
        )
        return pa.table(cols, schema=out_schema)

    tagged = probes.map_batches(
        tag_probe, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        history.map_batches(tag_hist, batch_format="pyarrow", zero_copy_batch=True)
    )
    return tagged.groupby("__bucket", num_partitions=num_partitions).map_groups(
        lookup, batch_format="pyarrow"
    )


def scd2_update(
    history: "ray.data.Dataset",
    new_log: "ray.data.Dataset",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "delete",
    num_partitions: int = 64,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    h_schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Incrementally extend an SCD2 history with a NEW changelog segment —
    the history analog of the lake's resumable replay: exchange volume is
    O(existing versions + new events), never the raw old log, which is
    the incremental-view-maintenance win at a 10^10-event WAL.

    Contract (the WAL-tail reality, asserted per bucket): every new event
    sorts strictly after the existing history's latest change per key in
    ``(ts, lsn)`` order.  Algebra:
    ``scd2_update(scd2_history(log1), log2) == scd2_history(log1 + log2)``
    (property-tested on random splits).

    Mechanics, inside ONE co-partitioned bucketed exchange: history
    version rows replay as upserts at ``valid_from``; a closed interval
    whose close is NOT explained by a same-key successor at exactly its
    ``valid_to`` instant regenerates its lost delete event there; the
    merged sequence then flows through the same interval chaining as
    :func:`scd2_history` — fully vectorized, no per-key loop.
    """
    from raycdc.engine import _configure_shuffle
    from raycdc.relational import dataset_schema

    _configure_shuffle()
    if h_schema is None:
        h_schema = dataset_schema(history)
    carry = [
        n
        for n in h_schema.names
        if n not in (valid_from, valid_to, current_flag)
    ]  # key cols + lsn + payload — exactly scd2_history's carry set
    ts_t = pa.timestamp("us")
    uni = pa.schema(
        [pa.field(n, h_schema.field(n).type) for n in carry]
        + [
            pa.field(ts_col, ts_t),
            pa.field(op_col, pa.string()),
            pa.field(valid_from, ts_t),
            pa.field(valid_to, ts_t),
            pa.field(_BUCKET, pa.int64()),
        ]
    )

    def tag_hist(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in carry}
        cols[ts_col] = t[valid_from].cast(ts_t)
        cols[op_col] = pa.array(["insert"] * len(t), pa.string())
        cols[valid_from] = t[valid_from].cast(ts_t)
        cols[valid_to] = t[valid_to].cast(ts_t)
        cols[_BUCKET] = bucket_keys(t, key_cols, num_partitions)
        return pa.table(cols, schema=uni)

    def tag_new(t: pa.Table) -> pa.Table:
        cols = {}
        for n in carry:
            cols[n] = t[n].cast(h_schema.field(n).type)
        cols[ts_col] = t[ts_col].cast(ts_t)
        cols[op_col] = t[op_col].cast(pa.string())
        cols[valid_from] = pa.nulls(len(t), ts_t)
        cols[valid_to] = pa.nulls(len(t), ts_t)
        cols[_BUCKET] = bucket_keys(t, key_cols, num_partitions)
        return pa.table(cols, schema=uni)

    out_schema = pa.schema(
        [pa.field(n, h_schema.field(n).type) for n in carry]
        + [
            pa.field(valid_from, ts_t),
            pa.field(valid_to, ts_t),
            pa.field(current_flag, pa.int64()),
        ]
    )

    def extend(g: pa.Table) -> pa.Table:
        # the shared merge-policy kernel does all the work (stale check,
        # delete regeneration, interval chaining); this wrapper only
        # drops the engine envelope the standalone operator never exposes
        from raycdc.merge import history_extend

        if len(g) == 0:
            return out_schema.empty_table()
        out = history_extend(
            g.drop_columns([_BUCKET]),
            key_cols,
            ts_col=ts_col,
            lsn_col=lsn_col,
            op_col=op_col,
            valid_from=valid_from,
            valid_to=valid_to,
            current_flag=current_flag,
            delete_op=delete_op,
        )
        return out.drop_columns([op_col, ts_col]).select(out_schema.names)

    tagged = history.map_batches(
        tag_hist, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        new_log.map_batches(tag_new, batch_format="pyarrow", zero_copy_batch=True)
    )
    return tagged.groupby(_BUCKET, num_partitions=num_partitions).map_groups(
        extend, batch_format="pyarrow"
    )
