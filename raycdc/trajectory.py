"""Transcript-trajectory operators: ordered per-conversation sequence
analytics and training-prep transforms over replayed transcript state.

Where :mod:`raycdc.relational` reconstructs transcripts
(``assemble_group_text``) and validates them (``sequence_integrity``),
this module mines the ORDER of a conversation's turns and shapes it for
training:

- :func:`transition_counts` — the first-order transition matrix of a
  categorical column along each group's order (role alternation, tool-call
  chains) — the trajectory statistic agent-log curation thresholds on.
- :func:`trim_to_token_budget` — keep each conversation's maximal SUFFIX of
  turns whose cumulative whitespace-token count fits a context budget (the
  "last-k-turns that fit" truncation every SFT packer applies before
  assembly).
- :func:`sliding_windows` — fixed-size stride-advanced windows of
  consecutive turns, each joined into one training document (the
  long-conversation chunking alternative to whole-transcript assembly).
- :func:`edit_pairs` — mine the CHANGELOG (not the replayed state) for
  (before, after) text pairs: every ``update`` event paired with the
  version it replaced in the engine's LWW order.  The WAL is the only
  place the superseded text still exists — replay destroys it — so this
  is the CDC-native source of edit/preference training examples
  (regenerated assistant turns, human corrections).

All four follow this repo's segmented-kernel contract (CLAUDE.md): ONE
group-bucketed exchange (``num_partitions`` UDF calls, never one per
conversation — :func:`raycdc.partition.bucket_keys`), then a single
vectorized sort + segment-boundary pass inside each bucket; no Python row
loops.  The analog surface in the reference is the projector stage
(`/root/reference/handler.go:126-169` row-transform loop), generalized
here to ORDER-AWARE group transforms the row-at-a-time projector cannot
express.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _segments(g: pa.Table, group_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Segment starts + lengths of a table SORTED by ``group_col`` (nulls
    grouped).  Shared boundary mask used by every kernel in this module."""
    n = len(g)
    grp = g[group_col].combine_chunks()
    new_grp = np.ones(n, dtype=bool)
    if n > 1:
        a, b = grp.slice(1), grp.slice(0, n - 1)
        eq = pc.or_(
            pc.fill_null(pc.equal(a, b), False),
            pc.and_(pc.is_null(a), pc.is_null(b)),
        )
        new_grp[1:] = ~eq.to_numpy(zero_copy_only=False)
    starts = np.where(new_grp)[0]
    lens = np.diff(np.append(starts, n))
    return starts, lens


def transition_counts(
    ds: "ray.data.Dataset",
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    value_col: str = "role",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """First-order transition matrix of ``value_col`` along each group's
    ``order_col`` order: one output row per observed (previous value,
    value) pair with its corpus-wide count.

    Output columns: ``from_<value_col>``, ``to_<value_col>``,
    ``n_transitions`` (int64).  Each group's first row has no predecessor
    and emits nothing (SQL ``lag() ... IS NOT NULL`` semantics); null
    values participate as nulls.

    Shape at scale: the bucketed exchange moves only (group, order, value)
    triples; each bucket emits its LOCAL (from, to, n) matrix — at most
    |distinct values|² rows — and the final combine over those partials is
    a second, near-empty exchange (:func:`raycdc.relational.pre_aggregate`
    over a bounded key space)."""
    from raycdc.engine import _configure_shuffle
    from raycdc.relational import _tag_bucket, pre_aggregate

    _configure_shuffle()
    tag = _tag_bucket(group_col, num_partitions)
    from_col, to_col = f"from_{value_col}", f"to_{value_col}"

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(
            [(group_col, "ascending"), (order_col, "ascending")]
        )
        n = len(g)
        vals = g[value_col].combine_chunks()
        out_schema = pa.schema(
            [
                pa.field(from_col, vals.type),
                pa.field(to_col, vals.type),
                pa.field("n_transitions", pa.int64()),
            ]
        )
        if n < 2:
            return out_schema.empty_table()
        starts, _ = _segments(g, group_col)
        keep = np.ones(n, dtype=bool)
        keep[starts] = False  # first row of each group has no predecessor
        idx = np.where(keep)[0]
        pairs = pa.table(
            {
                from_col: vals.take(pa.array(idx - 1)),
                to_col: vals.take(pa.array(idx)),
            }
        )
        import polars as pl

        agg = (
            pl.from_arrow(pairs)
            .group_by([from_col, to_col])
            .agg(pl.len().alias("n_transitions"))
            .to_arrow()
        )
        return pa.table(
            {
                from_col: agg[from_col].cast(vals.type),
                to_col: agg[to_col].cast(vals.type),
                "n_transitions": agg["n_transitions"].cast(pa.int64()),
            },
            schema=out_schema,
        )

    partials = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    # bounded key space (|values|²) — the combine exchange is near-empty
    combined = pre_aggregate(
        partials,
        key_cols=[from_col, to_col],
        sum_cols=["n_transitions"],
        count_alias="__n_partials",
        num_partitions=min(8, num_partitions),
    )
    return combined.map_batches(
        lambda t: t.drop_columns(["__n_partials"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def edit_pairs(
    ds: "ray.data.Dataset",
    group_col: str = "conv_id",
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    op_col: str = "op",
    text_col: str = "text",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """(before, after) edit pairs from a changelog's update events.

    For every ``update`` event, the pair of the text it carried and the
    text of the SAME key's immediately-preceding version in the engine's
    LWW merge order (``ts`` then ``lsn`` — :func:`raycdc.merge.lww_dedup`),
    i.e. exactly the row the update overwrote in the lake.  Updates with
    no prior version in the log, or whose predecessor is a ``delete``
    (the key was dead — the update re-creates it, there is no "before"),
    emit nothing.  SQL: ``lag(text) / lag(op) OVER (PARTITION BY key
    ORDER BY ts, lsn)`` filtered to live-predecessor updates.

    Output: ``key_cols`` + ``before_text, after_text`` + ``lsn_col`` (the
    update's WAL position — unique, so downstream dedup/sampling can key
    on it).

    Shape at scale: one group-bucketed exchange of (key, ts, lsn, op,
    text) rows — a key's events co-locate because ``group_col`` is a
    prefix of ``key_cols`` — then one vectorized sort + boundary-mask +
    two gathers per bucket.  No second exchange, no per-key loop."""
    from raycdc.engine import _configure_shuffle
    from raycdc.relational import _tag_bucket

    _configure_shuffle()
    if key_cols[0] != group_col:
        raise ValueError(
            "edit_pairs: key_cols must start with group_col so a key's "
            "events co-locate in one bucket"
        )
    tag = _tag_bucket(group_col, num_partitions)
    # only these five columns ride the exchange — role/tool/etc. stay home
    ds = ds.select_columns(
        list(dict.fromkeys([*key_cols, ts_col, lsn_col, op_col, text_col]))
    )
    sort_keys = [(k, "ascending") for k in key_cols] + [
        (ts_col, "ascending"),
        (lsn_col, "ascending"),
    ]

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(sort_keys)
        n = len(g)
        text = pc.fill_null(g[text_col].combine_chunks().cast(pa.string()), "")
        out_schema = pa.schema(
            [pa.field(k, g.schema.field(k).type) for k in key_cols]
            + [
                pa.field("before_text", pa.string()),
                pa.field("after_text", pa.string()),
                pa.field(lsn_col, g.schema.field(lsn_col).type),
            ]
        )
        if n < 2:
            return out_schema.empty_table()
        from raycdc.relational import _key_boundaries

        new_key = _key_boundaries(g, key_cols)
        op = g[op_col].combine_chunks()
        is_update = pc.equal(op, "update").to_numpy(zero_copy_only=False)
        prev_is_delete = np.zeros(n, dtype=bool)
        prev_is_delete[1:] = pc.equal(op, "delete").to_numpy(
            zero_copy_only=False
        )[:-1]
        idx = np.where(is_update & ~new_key & ~prev_is_delete)[0]
        if len(idx) == 0:
            return out_schema.empty_table()
        take_cur = pa.array(idx)
        return pa.table(
            {
                **{
                    k: g[k].combine_chunks().take(take_cur)
                    for k in key_cols
                },
                "before_text": text.take(pa.array(idx - 1)),
                "after_text": text.take(take_cur),
                lsn_col: g[lsn_col].combine_chunks().take(take_cur),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def _token_counts(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Whitespace token count per row, null → '' (SQL
    ``len(string_split(coalesce(text, ''), ' '))`` — identical formula to
    ``q_conv_stats``'s n_tokens so budgets mean the same thing across the
    curation pipelines)."""
    filled = pc.fill_null(text, "")
    return (
        pc.list_value_length(pc.split_pattern(filled, " "))
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )


def trim_to_token_budget(
    ds: "ray.data.Dataset",
    budget: int,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Keep each group's maximal SUFFIX of rows whose cumulative
    whitespace-token count is ≤ ``budget`` — context-window truncation
    that preserves the most recent turns ("drop the oldest history until
    the conversation fits").

    A row survives iff the token sum from it THROUGH ITS GROUP'S LAST ROW
    (in ``order_col`` order) is within budget — exactly SQL's
    ``sum(n_tok) OVER (PARTITION BY g ORDER BY o DESC) <= budget``.  Rows
    keep all input columns; a group whose final turn alone exceeds the
    budget vanishes entirely (no partial-turn splitting).

    One bucketed exchange; inside a bucket the suffix sums for ALL groups
    come from one global prefix-sum with per-segment end offsets — no
    per-group loop."""
    from raycdc.engine import _configure_shuffle
    from raycdc.relational import _tag_bucket

    _configure_shuffle()
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    tag = _tag_bucket(group_col, num_partitions)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(
            [(group_col, "ascending"), (order_col, "ascending")]
        )
        n = len(g)
        if n == 0:
            return g
        starts, lens = _segments(g, group_col)
        tok = _token_counts(g[text_col])
        prefix = np.cumsum(tok)  # prefix[i] = sum of tok[0..i]
        seg_end = starts + lens - 1
        end_totals = np.repeat(prefix[seg_end], lens)
        # suffix sum from row i through its segment end, inclusive
        suffix = end_totals - prefix + tok
        return g.filter(pa.array(suffix <= budget))

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def sliding_windows(
    ds: "ray.data.Dataset",
    window: int,
    stride: int,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Fixed-size sliding windows of consecutive rows per group, each
    joined into one document — the chunking transform for conversations
    too long to train on whole.

    Windows start at 0-based within-group POSITIONS (dense rank along
    ``order_col``, so turn-index gaps from deletes don't misalign windows)
    divisible by ``stride``; only FULL windows emit (a group with fewer
    than ``window`` rows produces nothing).  Output: ``group_col``,
    ``win_start`` (int64 position of the window's first row),
    ``window_text`` (texts joined by ``sep``, nulls read as ''),
    ``n_turns`` (= ``window``).

    One bucketed exchange; inside a bucket every window of every group is
    materialized by ONE gather (start positions × arange(window)) feeding
    ONE ``pc.binary_join`` over constant-width list offsets."""
    from raycdc.engine import _configure_shuffle
    from raycdc.relational import _tag_bucket

    _configure_shuffle()
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    tag = _tag_bucket(group_col, num_partitions)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(
            [(group_col, "ascending"), (order_col, "ascending")]
        )
        n = len(g)
        grp_type = g.schema.field(group_col).type
        out_schema = pa.schema(
            [
                pa.field(group_col, grp_type),
                pa.field("win_start", pa.int64()),
                pa.field("window_text", pa.string()),
                pa.field("n_turns", pa.int64()),
            ]
        )
        if n < window:
            return out_schema.empty_table()
        starts, lens = _segments(g, group_col)
        # 0-based position within each group
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        seg_len = np.repeat(lens, lens)
        ok = (pos % stride == 0) & (pos + window <= seg_len)
        win_rows = np.where(ok)[0]
        if len(win_rows) == 0:
            return out_schema.empty_table()
        take_idx = (win_rows[:, None] + np.arange(window, dtype=np.int64)).ravel()
        texts = pc.fill_null(
            g[text_col].combine_chunks().cast(pa.string()), ""
        )
        gathered = texts.take(pa.array(take_idx))
        offsets = pa.array(
            np.arange(0, (len(win_rows) + 1) * window, window, dtype=np.int32)
        )
        joined = pc.binary_join(
            pa.ListArray.from_arrays(offsets, gathered), sep
        )
        return pa.table(
            {
                group_col: g[group_col].combine_chunks().take(pa.array(win_rows)),
                "win_start": pa.array(pos[win_rows]),
                "window_text": joined,
                "n_turns": pa.array(
                    np.full(len(win_rows), window, dtype=np.int64)
                ),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pyarrow")
    )
