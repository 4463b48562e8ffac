"""Changelog sources.

Two deterministic changelog producers over the transcript row shape
(BASELINE.json input_hint: conv_id, turn_idx, role, text, tool, ts  +
envelope op, lsn, seg_id):

1. :func:`changelog_from_events` — derives a changelog from the driver's
   ``events`` parquet table with a pure, vectorized, SQL-expressible mapping
   so the DuckDB oracle (:data:`CHANGELOG_SQL`) computes the identical log.
   This is the correctness-gate path (``__ray_entry__.queries()``).

2. :func:`synthetic_changelog` — a seeded generator for the pytest fixture
   variants required by FIXTURES.md §2: mixed ops, out-of-order delivery,
   insert→delete→insert chains, duplicate-segment redelivery, schema
   evolution (added column + widened type), and Zipf-skewed hot keys.

The analog in the reference is the *extractor* + *parser* front half
(``/root/reference/extractor.go:16-37``, ``parser.go:15-23``): event → byte
stream → records.  Here Ray's parquet reader shards segments into Arrow
blocks for us; the derivation below is the "parse/decode" ``map_batches``
stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from raycdc.schema import CHANGELOG_SCHEMA, IO_RETRY_ARGS

TURNS_MOD = 40  # turn_idx = event_id % TURNS_MOD
SEGMENTS = 8  # seg_id = event_id % SEGMENTS

_ROLE_BY_EVENT_TYPE = {
    "error": "tool",
    "signup": "assistant",
    "purchase": "assistant",
    "view": "user",
    "click": "user",
}


def derive_changelog_batch(batch: pa.Table) -> pa.Table:
    """Vectorized events→changelog projection (one map_batches body).

    Must stay in lockstep with :data:`CHANGELOG_SQL`.
    """
    event_id = batch["event_id"]
    event_type = batch["event_type"]
    eid = event_id.to_numpy()  # zero-copy int64

    conv_id = pc.binary_join_element_wise(
        pa.scalar("c"), pc.cast(batch["user_id"], pa.string()), pa.scalar("")
    )
    turn_idx = pa.array((eid % TURNS_MOD).astype(np.int32))

    keys = pa.array(list(_ROLE_BY_EVENT_TYPE))
    vals = pa.array(list(_ROLE_BY_EVENT_TYPE.values()))
    role_idx = pc.index_in(event_type, value_set=keys)
    role = pc.take(vals, pc.fill_null(role_idx, len(_ROLE_BY_EVENT_TYPE) - 1))

    text = pc.binary_join_element_wise(event_type, batch["props"], pa.scalar(" "))
    tool = pc.if_else(
        pc.equal(event_type, "error"), pa.scalar("search"), pa.scalar("")
    )
    m = eid % 10
    op = pa.array(
        np.where(m == 9, "delete", np.where(m >= 7, "update", "insert"))
    )
    return pa.table(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pc.cast(batch["ts"], pa.timestamp("us")),
            "op": op,
            "lsn": pc.cast(event_id, pa.int64()),
            "seg_id": pa.array((eid % SEGMENTS).astype(np.int32)),
        }
    )


# DuckDB CTE computing the exact same changelog from the `events` view.
CHANGELOG_SQL = f"""
changelog AS (
    SELECT
        'c' || CAST(user_id AS VARCHAR) AS conv_id,
        CAST(event_id % {TURNS_MOD} AS INTEGER) AS turn_idx,
        CASE event_type
            WHEN 'error' THEN 'tool'
            WHEN 'signup' THEN 'assistant'
            WHEN 'purchase' THEN 'assistant'
            ELSE 'user'
        END AS role,
        event_type || ' ' || props AS text,
        CASE WHEN event_type = 'error' THEN 'search' ELSE '' END AS tool,
        ts,
        CASE
            WHEN event_id % 10 = 9 THEN 'delete'
            WHEN event_id % 10 >= 7 THEN 'update'
            ELSE 'insert'
        END AS op,
        event_id AS lsn,
        CAST(event_id % {SEGMENTS} AS INTEGER) AS seg_id
    FROM events
)
"""


def diff_tagged(
    g: pa.Table,
    key_cols,
    value_cols,
    op_col: str = "op",
) -> pa.Table:
    """Vectorized two-sided snapshot diff over ONE tagged table.

    ``g`` carries ``key_cols + value_cols`` plus an int8 ``__side`` column
    (0 = old, 1 = new).  Emits insert/update/delete rows with ``op_col``
    appended; identical rows emit nothing.  Shared by
    :func:`diff_snapshots` (inside its bucketed groupby) and
    :func:`raycdc.engine.change_feed` (per co-located partition pair,
    no exchange at all).  Raises on duplicate keys within one side.
    """
    cols = [*key_cols, *value_cols]
    g = g.sort_by(
        [(k, "ascending") for k in key_cols] + [("__side", "ascending")]
    )
    n = len(g)
    out_schema = pa.schema(
        [g.schema.field(c) for c in cols] + [pa.field(op_col, pa.string())]
    )
    if n == 0:
        return out_schema.empty_table()
    new_key = np.ones(n, dtype=bool)
    changed = None
    for k in key_cols:
        col = g[k].combine_chunks()
        # null == null is the SAME key (fill False): the validity xor
        # already flags null-vs-value; filling True would make every
        # null-key row its own group — identical null-key rows on the two
        # sides would churn a spurious delete+insert on every diff AND
        # bypass the duplicate-key guard
        neq = pc.fill_null(
            pc.not_equal(col.slice(1), col.slice(0, n - 1)), False
        )
        vd = pc.xor(pc.is_valid(col.slice(1)), pc.is_valid(col.slice(0, n - 1)))
        d = pc.or_(neq, vd).to_numpy(zero_copy_only=False)
        changed = d if changed is None else (changed | d)
    new_key[1:] = changed
    starts = np.where(new_key)[0]
    sizes = np.diff(np.append(starts, n))
    if sizes.max(initial=0) > 2:
        raise ValueError(
            "diff_snapshots: duplicate key within one snapshot "
            "(each side must be unique per key_cols)"
        )
    side = g["__side"].to_numpy(zero_copy_only=False)
    both = sizes == 2
    if both.any() and not (
        (side[starts[both]] == 0) & (side[starts[both] + 1] == 1)
    ).all():
        raise ValueError(
            "diff_snapshots: duplicate key within one snapshot "
            "(each side must be unique per key_cols)"
        )
    single = starts[sizes == 1]
    ins_idx = single[side[single] == 1]
    del_idx = single[side[single] == 0]
    # both-sides keys: value compare old row (starts) vs new (starts+1)
    old_i, new_i = starts[both], starts[both] + 1
    if len(old_i):
        diff_mask = np.zeros(len(old_i), dtype=bool)
        oi, ni = pa.array(old_i), pa.array(new_i)
        for c in value_cols:
            col = g[c].combine_chunks()
            t = col.type
            if (
                pa.types.is_list(t)
                or pa.types.is_large_list(t)
                or pa.types.is_fixed_size_list(t)
            ):
                # no not_equal kernel for nested types: compare a
                # vectorized per-row hash instead (embedding columns
                # become CDC-able — see partition.nested_row_hash)
                from raycdc.partition import nested_row_hash

                h = nested_row_hash(col)
                v = pc.is_valid(col).to_numpy(zero_copy_only=False)
                va, vb = v[old_i], v[new_i]
                diff_mask |= (va ^ vb) | (va & vb & (h[old_i] != h[new_i]))
                continue
            a, b = col.take(oi), col.take(ni)
            neq = pc.fill_null(pc.not_equal(a, b), False)
            vd = pc.xor(pc.is_valid(a), pc.is_valid(b))
            diff_mask |= pc.or_(neq, vd).to_numpy(zero_copy_only=False)
        upd_idx = new_i[diff_mask]
    else:
        upd_idx = np.empty(0, np.int64)

    def emit(idx: np.ndarray, op: str) -> pa.Table:
        t = g.select(cols).take(pa.array(idx.astype(np.int64)))
        return t.append_column(op_col, pa.repeat(pa.scalar(op), len(t)))

    return pa.concat_tables(
        [
            emit(ins_idx, "insert"),
            emit(upd_idx, "update"),
            emit(del_idx, "delete"),
        ]
    ).cast(out_schema)


def diff_snapshots(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key_cols: "tuple[str, ...] | list[str]",
    value_cols: "tuple[str, ...] | list[str]",
    op_col: str = "op",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Derive a changelog from two snapshots of a keyed table — the INVERSE
    of replay, closing the CDC loop: any pair of lake versions (or an
    external table and its re-extract) can be turned back into
    insert/update/delete events and fed to :func:`raycdc.engine.replay`.

    Per key: present only in ``new`` → ``insert``; only in ``old`` →
    ``delete`` (payload = the old row, matching a tombstone that carries
    the last-known values); present in both with any ``value_cols``
    difference → ``update`` (payload = the new row); identical rows emit
    NOTHING (the whole point — a diff is small when the change is small).
    Null-safe compare: null == null is "unchanged", null vs value is a
    change (SQL ``IS DISTINCT FROM``).

    Contract: each side must be unique per ``key_cols`` (snapshots are
    keyed states); a duplicate raises rather than guessing which row is
    current.

    Scale shape: both snapshots stream through one tagged ``union`` and a
    single co-partitioned bucketed ``groupby`` — no broadcast, no
    driver-side materialization; the exchange carries only
    ``key + value_cols``, and output volume is proportional to the CHANGE,
    not the table.
    """
    from raycdc.engine import _configure_shuffle
    from raycdc.partition import bucket_keys

    _configure_shuffle()
    cols = [*key_cols, *value_cols]

    def _tag(side: int):
        def tag(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            t = t.append_column("__side", pa.array(np.full(len(t), side, np.int8)))
            return t.append_column(
                "__bucket", bucket_keys(t, list(key_cols), num_partitions)
            )

        return tag

    tagged = old.map_batches(
        _tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(new.map_batches(_tag(1), batch_format="pyarrow", zero_copy_batch=True))
    def diff(g: pa.Table) -> pa.Table:
        return diff_tagged(g, key_cols, value_cols, op_col)

    return tagged.groupby("__bucket", num_partitions=num_partitions).map_groups(
        diff, batch_format="pyarrow"
    )


def changelog_from_events(sf_dir: str) -> "ray.data.Dataset":
    """Read the events table and derive the transcript changelog, streaming."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    return ds.map_batches(derive_changelog_batch, batch_format="pyarrow")


def amplified_changelog(
    sf_dir: str, factor: int, reps_per_task: int | None = None
) -> "ray.data.Dataset":
    """Bench-scale changelog: the events-derived log replicated ``factor``
    times with disjoint lsn ranges and shifted versions.

    Each replica is one independent task that reads the events file and
    derives its segment of the log — the shape of a real WAL tail, where
    every segment is a separate file and the read stage is embarrassingly
    parallel.  Later replicas carry later (ts, lsn) so they win LWW; the
    merge therefore does real dedup work at every amplification level.
    Deterministic: no RNG.

    ``reps_per_task=None`` (default) sizes map tasks from VOLUME ÷ CPU
    waves: ``max(8, factor // (4 × cluster CPUs))`` — the round-4
    endurance-ladder lesson promoted from the bench harness into the
    library.  Each map task emits one pre-combined block, and the merge
    exchange produces one sorted run per block, so a FIXED task size
    lets the run count grow linearly with amplification until the
    push-based sort's merge fan-in turns superlinear (measured: amp 4096
    at a fixed 8 reps/task → 512+ runs → 73 s sort; volume-scaled →
    128 tasks = 4 waves → 17.7 s end-to-end).  Sizing tasks to ~4 waves
    of the cluster keeps the run count O(CPUs) at ANY amplification
    without starving small runs.
    """
    import pyarrow.parquet as pq_

    if reps_per_task is None:
        cpus = (
            int(ray.cluster_resources().get("CPU", 0) or 8)
            if ray.is_initialized()
            else 8
        )
        reps_per_task = max(8, factor // (4 * cpus))
    path = f"{sf_dir}/events.parquet"
    lsn_stride = pq_.read_metadata(path).num_rows

    def _derive_rep(batch: pa.Table) -> pa.Table:
        reps = []
        src = pq_.read_table(
            path, columns=["event_id", "ts", "user_id", "event_type", "props"]
        )
        base = derive_changelog_batch(src)
        for task_id in batch["id"].to_pylist():
            for r in range(task_id * reps_per_task, min((task_id + 1) * reps_per_task, factor)):
                t = base
                if r:
                    t = t.set_column(
                        t.schema.get_field_index("lsn"),
                        "lsn",
                        pc.add(t["lsn"], pa.scalar(r * lsn_stride, pa.int64())),
                    )
                    shifted = pc.add(
                        t["ts"].cast(pa.int64()), pa.scalar(r * 1_000_000, pa.int64())
                    ).cast(pa.timestamp("us"))
                    t = t.set_column(t.schema.get_field_index("ts"), "ts", shifted)
                reps.append(t)
        return pa.concat_tables(reps)

    n_tasks = (factor + reps_per_task - 1) // reps_per_task
    ds = ray.data.range(n_tasks, override_num_blocks=n_tasks)
    # IO_RETRY_ARGS does double duty here: this UDF reads parquet (real IO),
    # and matching `prepare`'s _prep remote args lets Ray fuse derive→prep
    # into ONE task — the pre-combine replica expansion (~77 B/row × reps)
    # then never touches the object store.  Measured un-fused: ~2 GB of
    # intermediate blocks per headline run at amplify 256.
    return ds.map_batches(
        _derive_rep, batch_size=1, batch_format="pyarrow", **IO_RETRY_ARGS
    )


# ---------------------------------------------------------------------------
# synthetic seeded generator (pytest fixtures; FIXTURES.md §2 variants)


def synthetic_changelog(
    n_events: int = 2000,
    n_convs: int = 50,
    max_turns: int = 30,
    seed: int = 42,
    p_update: float = 0.25,
    p_delete: float = 0.1,
    shuffle: bool = False,
    zipf_skew: float | None = None,
    n_segments: int = 8,
    evolve_from_lsn: int | None = None,
) -> pa.Table:
    """Deterministic synthetic changelog.

    ``shuffle`` delivers rows out of lsn order (out-of-order delivery);
    ``zipf_skew`` concentrates ~that fraction of events on conv 0 (hot-key /
    salting fixture); ``evolve_from_lsn`` adds a ``model`` column (non-null
    only for lsn >= threshold) and widens ``turn_idx`` to int64 — the
    schema-evolution fixture.
    """
    rng = np.random.default_rng(seed)
    lsn = np.arange(n_events, dtype=np.int64)
    if zipf_skew is not None:
        hot = rng.random(n_events) < zipf_skew
        conv = rng.integers(1, max(2, n_convs), n_events)
        conv[hot] = 0
    else:
        conv = rng.integers(0, n_convs, n_events)
    turn = rng.integers(0, max_turns, n_events).astype(np.int32)
    r = rng.random(n_events)
    op = np.where(r < p_delete, "delete", np.where(r < p_delete + p_update, "update", "insert"))
    roles = np.array(["user", "assistant", "tool"])[lsn % 3]
    tool = np.where(roles == "tool", "search", "")
    text = np.char.add(
        np.char.add("turn text v", lsn.astype(str)),
        np.char.add(" c", conv.astype(str)),
    )
    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    # groups of 3 consecutive lsns share one ts — REAL ties, so the lsn
    # tiebreak is exercised by every fixture (SURVEY §7.3: load-bearing)
    ts = base_ts + ((lsn // 3) * 1_000_000).astype("timedelta64[us]")
    seg = (lsn % n_segments).astype(np.int32)

    cols = {
        "conv_id": np.char.add("conv-", conv.astype(str)),
        "turn_idx": turn,
        "role": roles,
        "text": text,
        "tool": tool,
        "ts": ts,
        "op": op,
        "lsn": lsn,
        "seg_id": seg,
    }
    t = pa.Table.from_pydict({k: pa.array(v) for k, v in cols.items()})
    t = t.cast(CHANGELOG_SCHEMA)

    if evolve_from_lsn is not None:
        model = pc.if_else(
            pc.greater_equal(t["lsn"], evolve_from_lsn),
            pa.scalar("model-x"),
            pa.scalar(None, pa.string()),
        )
        t = t.append_column("model", model)
        t = t.set_column(
            t.schema.get_field_index("turn_idx"),
            "turn_idx",
            pc.cast(t["turn_idx"], pa.int64()),
        )

    if shuffle:
        perm = rng.permutation(n_events)
        t = t.take(pa.array(perm))
    return t


def suppress_noop_updates(
    changelog: "ray.data.Dataset",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    payload_cols: tuple[str, ...] = ("text",),
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "delete",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Changelog compression: drop upserts whose payload is identical to the
    key's immediately preceding event (in ``(ts, lsn)`` order) when that
    event was also an upsert.  Connectors that emit full row images on
    every commit produce long runs of such no-op updates; suppressing them
    shrinks every downstream exchange without changing the replayed final
    state (LWW keeps only the latest version anyway) OR the SCD2 history's
    distinct-version sequence.

    Deletes are always kept, and an insert immediately after a delete is
    kept even if its payload matches the pre-delete version (the interval
    genuinely closed and reopened).  Equality treats null == null as
    equal.  Runs of equal payloads collapse to the first row — comparing
    to the immediate predecessor equals comparing to the last survivor
    because payload equality is transitive.

    Distributed shape: one hash-bucketed exchange on the key
    (:func:`raycdc.partition.bucket_keys`) co-locates each key's events;
    the group body is one ``np.lexsort`` plus vectorized shifted-column
    comparisons — no per-key loop.
    """
    from raycdc.engine import _configure_shuffle
    from raycdc.partition import bucket_keys

    _configure_shuffle()
    bcol = "__noop_bucket"

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(bcol, bucket_keys(t, key_cols, num_partitions))

    from raycdc.partition import key_codes as _codes

    def drop_noops(g: pa.Table) -> pa.Table:
        g = g.drop_columns([bcol])
        if len(g) < 2:
            return g
        ts = (
            g[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        lsn = g[lsn_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = [_codes(g[k]) for k in key_cols]
        order = np.lexsort((lsn, ts, *reversed(keys)))
        same_prev = np.ones(len(order), dtype=bool)
        same_prev[0] = False
        for k in keys:
            ks = k[order]
            same_prev[1:] &= ks[1:] == ks[:-1]
        op = g[op_col].combine_chunks().to_numpy(zero_copy_only=False)[order]
        upsert = op != delete_op
        prev_upsert = np.empty_like(upsert)
        prev_upsert[0] = False
        prev_upsert[1:] = upsert[:-1]
        eq_all = np.ones(len(order), dtype=bool)
        eq_all[0] = False
        idx = pa.array(order)
        for p in payload_cols:
            s = g[p].combine_chunks().take(idx)
            x, y = s.slice(1), s.slice(0, len(s) - 1)
            eq = pc.or_(
                pc.fill_null(pc.equal(x, y), False),
                pc.and_(pc.is_null(x), pc.is_null(y)),
            ).to_numpy(zero_copy_only=False)
            eq_all[1:] &= eq
        drop = same_prev & upsert & prev_upsert & eq_all
        return g.take(pa.array(order[~drop]))

    return (
        changelog.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(bcol, num_partitions=num_partitions)
        .map_groups(drop_noops, batch_format="pyarrow")
    )
