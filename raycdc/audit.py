"""Changelog observability: per-key churn and delivery-order audits over
the raw CDC stream.

The reference's observability surface is a Slack notifier with per-load
row counts (`/root/reference/notifier.go:17-137`); a continuous CDC engine
needs the same signals at changelog granularity — which keys churn (update
/ delete-heavy keys drive merge cost and history growth), and how
out-of-order the feed arrives (event-time vs WAL-position inversions size
the late-event risk for ``history`` lakes, whose merges REQUIRE per-key
event-time order across segments, CLAUDE.md).

Both operators aggregate the stream WITHOUT materializing it:

- :func:`key_churn` — pure map-side indicator projection +
  :func:`raycdc.relational.pre_aggregate` (partial sums/extrema per batch,
  ONE bucketed exchange over the key hash).
- :func:`event_order_stats` — one conv-bucketed exchange; a conversation's
  events land in exactly one bucket, so the per-conversation inversion
  counts finalize inside the bucket kernel with no second exchange.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def key_churn(
    ds: "ray.data.Dataset",
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    op_col: str = "op",
    lsn_col: str = "lsn",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-key churn profile of a changelog: how many inserts / updates /
    deletes each key received, its total event count, and its first/last
    WAL position.

    Output: ``key_cols`` + ``n_inserts, n_updates, n_deletes`` (int64),
    ``first_lsn, last_lsn`` (type of ``lsn_col``), ``n_events`` (int64).
    Every aggregate is mergeable, so the whole profile combines map-side
    and moves through ONE bucketed exchange regardless of stream size —
    the shuffle payload is one row per (batch, key), never the events."""
    from raycdc.relational import pre_aggregate

    def indicators(t: pa.Table) -> pa.Table:
        op = t[op_col]

        def ind(val: str) -> pa.Array:
            return pc.cast(pc.equal(op, val), pa.int64())

        return pa.table(
            {
                **{k: t[k] for k in key_cols},
                "n_inserts": ind("insert"),
                "n_updates": ind("update"),
                "n_deletes": ind("delete"),
                lsn_col: t[lsn_col],
            }
        )

    return pre_aggregate(
        ds.map_batches(indicators, batch_format="pyarrow", zero_copy_batch=True),
        key_cols=list(key_cols),
        sum_cols=["n_inserts", "n_updates", "n_deletes"],
        count_alias="n_events",
        num_partitions=num_partitions,
        min_cols={lsn_col: "first_lsn"},
        max_cols={lsn_col: "last_lsn"},
    )


def event_order_stats(
    ds: "ray.data.Dataset",
    group_col: str = "conv_id",
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Out-of-orderness audit: per ``group_col``, the total event count
    and how many events arrived with an EARLIER event time than the
    previous event of the same key in WAL order (``ts`` decreases while
    ``lsn`` increases) — exactly SQL's ``ts < lag(ts) OVER (PARTITION BY
    key ORDER BY lsn)``.

    Output: ``group_col, n_events, n_ts_inversions`` (int64).  A nonzero
    inversion count is the signal that a ``history``-policy lake (which
    requires per-key event-time order across segments) needs
    ts-pre-sorted segment replay.

    One bucketed exchange; the bucket is a pure function of ``group_col``,
    so each group's rows co-locate and the kernel's local group-by is
    final — no second exchange."""
    from raycdc.engine import _configure_shuffle
    from raycdc.relational import _tag_bucket

    _configure_shuffle()
    if key_cols[0] != group_col:
        raise ValueError(
            "event_order_stats: key_cols must start with group_col so the "
            "sort groups keys within each group's contiguous run"
        )
    tag = _tag_bucket(group_col, num_partitions)

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__bucket"]).sort_by(
            [(k, "ascending") for k in key_cols] + [(lsn_col, "ascending")]
        )
        n = len(g)
        grp_type = g.schema.field(group_col).type
        out_schema = pa.schema(
            [
                pa.field(group_col, grp_type),
                pa.field("n_events", pa.int64()),
                pa.field("n_ts_inversions", pa.int64()),
            ]
        )
        if n == 0:
            return out_schema.empty_table()
        from raycdc.relational import _key_boundaries

        new_key = _key_boundaries(g, key_cols)
        ts = (
            g[ts_col]
            .combine_chunks()
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        inv = np.zeros(n, dtype=np.int64)
        inv[1:] = (ts[1:] < ts[:-1]).astype(np.int64)
        inv[new_key] = 0  # first event of a key has no predecessor
        import polars as pl

        agg = (
            pl.from_arrow(
                pa.table(
                    {group_col: g[group_col], "__inv": pa.array(inv)}
                )
            )
            .group_by(group_col)
            .agg(
                pl.len().alias("n_events"),
                pl.col("__inv").sum().alias("n_ts_inversions"),
            )
            .to_arrow()
        )
        return pa.table(
            {
                group_col: agg[group_col].cast(grp_type),
                "n_events": agg["n_events"].cast(pa.int64()),
                "n_ts_inversions": agg["n_ts_inversions"].cast(pa.int64()),
            },
            schema=out_schema,
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket", num_partitions=num_partitions)
        .map_groups(per_bucket, batch_format="pyarrow")
    )
