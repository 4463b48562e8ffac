"""Lake-ecosystem walkthrough: everything that happens AFTER ingest.

The reference's pipeline ends at the warehouse door — one table per
handler, joins/serving deferred to BigQuery
(/root/reference/handler.go:20-48).  This example shows the layer raycdc
adds once the lake itself is the system of record, all zero-shuffle by
construction (the FNV-1a layout is a pure function of the key, so
same-key lakes are co-located partition-for-partition):

1. replay two changelogs into co-partitioned lakes (facts + dimension)
2. join them with one local Arrow hash-join task per partition pair
3. materialize the join as a VIEW and refresh it incrementally —
   only partitions whose sources advanced are recomputed
4. emit a CHANGE FEED (insert/update/delete) between two snapshots
5. keep a REPLICA in lockstep and fail over to it mid-stream
6. maintain a per-conversation AGGREGATE VIEW from the feed's
   before/after images — refresh cost ∝ the change, not the lake

    python examples/lake_ecosystem.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

import ray


def turns(rows: list[tuple]) -> pa.Table:
    """changelog rows: (conv, turn, text, op, lsn)"""
    base_ts = 1_700_000_000_000_000
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows)),
            "text": pa.array([r[2] for r in rows]),
            "tool": pa.array([""] * len(rows)),
            "ts": pa.array([base_ts + r[4] for r in rows], pa.timestamp("us")),
            "op": pa.array([r[3] for r in rows]),
            "lsn": pa.array([r[4] for r in rows], pa.int64()),
            "seg_id": pa.array([0] * len(rows), pa.int32()),
        }
    )


def main() -> None:
    from raycdc.engine import (
        change_feed,
        colocated_join,
        read_lake,
        refresh_join_view,
        replay,
        sync_lake,
    )
    from raycdc.schema import TableSpec
    from raycdc.sink import write_snapshot

    root = tempfile.mkdtemp(prefix="raycdc_eco_")
    facts, dim, view, replica = (os.path.join(root, d) for d in
                                 ("facts", "dim", "view", "replica"))
    spec = TableSpec(num_partitions=8)

    # 1. two co-partitioned lakes -----------------------------------------
    replay(
        ray.data.from_arrow(
            turns(
                [
                    ("alice", 0, "hi", "insert", 0),
                    ("alice", 1, "ship it", "insert", 1),
                    ("bob", 0, "hello", "insert", 2),
                ]
            )
        ),
        facts,
        spec,
    )
    dim_spec = TableSpec(
        name="conv_dim",
        schema=pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("team", pa.string()),
                ("ts", pa.timestamp("us")),
            ]
        ),
        num_partitions=8,
    )
    dim_rows = pa.table(
        {
            "conv_id": pa.array(["alice", "bob"]),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "team": pa.array(["research", "infra"]),
            "ts": pa.array([1, 2], pa.timestamp("us")),
            "op": pa.array(["insert"] * 2),
            "lsn": pa.array([0, 1], pa.int64()),
            "seg_id": pa.array([0, 0], pa.int32()),
        }
    )
    replay(ray.data.from_arrow(dim_rows), dim, dim_spec)

    # 2. zero-shuffle join -------------------------------------------------
    joined = colocated_join(
        facts, dim, on=("conv_id",), spec_left=spec, spec_right=dim_spec,
        left_columns=["conv_id", "turn_idx", "text"], right_columns=["team"],
    )
    print("join:", sorted(joined.to_pandas().itertuples(index=False)))

    # 3. materialized view, refreshed incrementally ------------------------
    kw = dict(on=("conv_id",), spec_left=spec, spec_right=dim_spec,
              left_columns=["conv_id", "turn_idx", "text"],
              right_columns=["team"])
    lin = refresh_join_view(facts, dim, view, **kw)
    print("view build:", lin["status"].to_pylist().count("refreshed"), "refreshed")
    s0 = write_snapshot(facts)
    replay(  # alice edits turn 1 — exactly one fact partition advances
        ray.data.from_arrow(turns([("alice", 1, "ship it NOW", "update", 10)])),
        facts,
        spec,
    )
    lin = refresh_join_view(facts, dim, view, **kw)
    st = lin["status"].to_pylist()
    print("view refresh:", st.count("refreshed"), "refreshed,",
          st.count("noop"), "noop")

    # 4. change feed between snapshots -------------------------------------
    s1 = write_snapshot(facts)
    feed = change_feed(facts, s0, s1, spec).to_pandas()
    print("feed:", sorted(feed.itertuples(index=False)))

    # 5. replica + failover -------------------------------------------------
    sync_lake(facts, replica, spec)
    replay(  # primary dies here; the WAL keeps coming — apply to the replica
        ray.data.from_arrow(turns([("bob", 1, "deploying", "insert", 11)])),
        replica,
        spec,
    )
    final = read_lake(replica, spec).to_pandas()
    print("replica after failover:", len(final), "live rows")

    # 6. incremental aggregate view -----------------------------------------
    from raycdc.engine import maintain_rollup

    rollup = os.path.join(root, "rollup")

    def derive(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        return pa.table(
            {
                "n_turns": pa.array(np.ones(len(t), np.int64)),
                "chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    maintain_rollup(
        replica, rollup, group_cols=("conv_id",),
        value_cols=("n_turns", "chars"), spec=spec,
        num_partitions=4, derive=derive,
    )
    replay(  # one more edit, then a refresh that feeds ONLY the delta
        ray.data.from_arrow(turns([("alice", 0, "hi there", "update", 12)])),
        replica,
        spec,
    )
    maintain_rollup(
        replica, rollup, group_cols=("conv_id",),
        value_cols=("n_turns", "chars"), spec=spec,
        num_partitions=4, derive=derive,
    )
    agg = read_lake(rollup, with_tombstones=True).to_pandas()
    print("rollup view:", sorted(
        agg[["conv_id", "n_turns", "chars"]].itertuples(index=False)))

    # 7. disaster recovery: snapshot restore --------------------------------
    # a corrupt projector ships garbage; rewind the PRIMARY to its last
    # good snapshot (s1) and replay the corrected event exactly-once
    from raycdc.engine import restore_lake

    replay(
        ray.data.from_arrow(
            turns([("alice", 1, "GARBAGE-DEPLOY", "insert", 13)])
        ),
        facts,
        spec,
    )
    restored = restore_lake(facts, s1)
    replay(  # corrected WAL suffix resumes from the rewound floors
        ray.data.from_arrow(turns([("alice", 1, "fixed text", "insert", 13)])),
        facts,
        spec,
    )
    statuses = restored["status"].to_pylist()
    print("restore:", statuses.count("restored"), "restored,",
          statuses.count("noop"), "noop; final:",
          sorted(read_lake(facts, spec).to_pandas()
                 [["conv_id", "turn_idx", "text"]].itertuples(index=False)))


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    main()
    ray.shutdown()
