"""Warehouse-history walkthrough: changelog → compressed log → SCD Type-2
history → temporal point-in-time queries.

The reference loads each file as current-state-only (load-and-replace,
/root/reference/bqloader.go:96-117); this example shows the warehousing
layer raycdc adds on top of the same changelog: every version a key ever
held, with validity intervals, and "what did the row say at instant t"
lookups — all as streaming Ray Data pipelines.

    python examples/warehouse_history.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

import ray


def make_changelog() -> pa.Table:
    """A conversation transcript edited over time: turn 0 written, twice
    revised (once a no-op full-row image), deleted, then re-written."""
    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    return pa.table(
        {
            "conv_id": pa.array(["c1"] * 6 + ["c2"] * 2),
            "turn_idx": pa.array([0, 0, 0, 0, 0, 0, 0, 0], pa.int64()),
            "ts": pa.array(
                [ts(0), ts(5), ts(10), ts(20), ts(30), ts(40), ts(2), ts(8)],
                pa.timestamp("us"),
            ),
            "op": pa.array(
                [
                    "insert",  # c1: v1
                    "update",  # c1: v2
                    "update",  # c1: v2 again — full-row-image no-op
                    "delete",  # c1: retracted
                    "insert",  # c1: v3 (rewritten)
                    "update",  # c1: v4
                    "insert",  # c2: w1
                    "update",  # c2: w2
                ]
            ),
            "lsn": pa.array(list(range(8)), pa.int64()),
            "text": pa.array(
                ["v1", "v2", "v2", "", "v3", "v4", "w1", "w2"]
            ),
        }
    )


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raycdc.changelog import suppress_noop_updates
    from raycdc.scd import point_in_time, scd2_history

    log = ray.data.from_arrow(make_changelog())

    # 1. compress: drop full-row-image no-op updates before the wide stages
    compact = suppress_noop_updates(
        log, key_cols=("conv_id", "turn_idx"), payload_cols=("text",),
        num_partitions=4,
    )
    n0, n1 = log.count(), compact.count()
    print(f"changelog: {n0} events, {n1} after no-op suppression")

    # 2. SCD2: every version with its validity interval
    hist = scd2_history(
        compact, key_cols=("conv_id", "turn_idx"), num_partitions=4
    )
    print("\nhistory (valid_from → valid_to, is_current):")
    for row in sorted(
        hist.take_all(), key=lambda r: (r["conv_id"], r["valid_from"])
    ):
        print(
            f"  {row['conv_id']}/{row['turn_idx']} {row['text']!r:6} "
            f"[{row['valid_from']} → {row['valid_to']}] "
            f"current={row['is_current']}"
        )

    # 3. temporal queries: what did c1/0 say at minute 7, 25, 35?
    t0 = dt.datetime(2024, 1, 1)
    probes = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array(["c1"] * 3),
                "turn_idx": pa.array([0] * 3, pa.int64()),
                "ts": pa.array(
                    [t0 + dt.timedelta(minutes=m) for m in (7, 25, 35)],
                    pa.timestamp("us"),
                ),
                "probe": pa.array(["min 7", "min 25", "min 35"]),
            }
        )
    )
    out = point_in_time(
        hist, probes, key_cols=("conv_id", "turn_idx"), as_of_col="ts",
        payload_cols=("text",), num_partitions=4,
    )
    print("\npoint-in-time (c1/0):")
    for row in sorted(out.take_all(), key=lambda r: r["ts"]):
        state = row["text"] if row["text"] is not None else "<deleted>"
        print(f"  {row['probe']:7} → {state}")

    # 4. the same history as a continuously-maintained exactly-once LAKE:
    #    merge_policy='history' gives checkpoints, redelivery no-ops,
    #    atomic installs — replaying the log twice changes nothing
    import tempfile

    from raycdc.engine import read_lake, replay
    from raycdc.schema import TableSpec

    lake = tempfile.mkdtemp(prefix="history_lake_")
    spec = TableSpec(num_partitions=4, merge_policy="history")
    replay(compact, lake, spec)  # the suppressed log: no no-op versions
    lineage = replay(compact, lake, spec)  # full redelivery
    n_versions = read_lake(lake, spec, with_tombstones=True).count()
    print(
        f"\nhistory lake: {n_versions} stored versions; redelivery statuses: "
        f"{sorted(set(lineage['status'].to_pylist()))}"
    )

    ray.shutdown()


if __name__ == "__main__":
    main()
