"""Quickstart: ragged bank-style CSV exports → exactly-once Parquet lake.

The raycdc analog of the reference's quickstart
(/root/reference/examples/quickstart/bqload.go): register a handler with a
path pattern, a decode recipe, and a projector; drop segment files in; run.

    python examples/quickstart.py

Writes everything under a temp dir and prints the materialized state.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc

import ray


def make_segments(seg_dir: str) -> None:
    """Three deterministic 'bank export' CSV segments: Shift-JIS encoded,
    one preamble line, a header, comma-grouped amounts, Y/M/D dates, and a
    payment month embedded in the file name."""
    os.makedirs(seg_dir, exist_ok=True)
    rows = [
        # date, description, amount, op, lsn
        ("2024/01/05", "コーヒー", "1,200", "insert", 0),
        ("2024/01/06", "book", "3,400", "insert", 1),
        ("2024/01/06", "book", "3,500", "update", 2),  # corrected amount
        ("2024/01/07", "refund", "-1,200", "insert", 3),
        ("2024/01/05", "コーヒー", "", "delete", 4),  # charge reversed
    ]
    per_seg = {0: rows[:2], 1: rows[2:4], 2: rows[4:]}
    for seg, seg_rows in per_seg.items():
        body = "bank export / 銀行\ndate,description,amount,op,lsn\n"
        body += "\n".join(",".join(f'"{c}"' for c in map(str, r)) for r in seg_rows)
        path = os.path.join(seg_dir, f"20240{seg + 1}.csv")
        with open(path, "wb") as f:
            f.write(body.encode("shift_jis"))


def main() -> None:
    ray.init(address="local", num_cpus=4, include_dashboard=False)

    from raycdc.engine import read_lake
    from raycdc.ops import append_constant, clean_number, parse_date_multi
    from raycdc.parsers import DecodeSpec
    from raycdc.registry import CollectingNotifier, PipelineHandler, Router
    from raycdc.schema import TableSpec

    root = tempfile.mkdtemp(prefix="raycdc_quickstart_")
    seg_dir = os.path.join(root, "segments")
    lake = os.path.join(root, "lake")
    make_segments(seg_dir)

    # The destination contract: upsert key + version order.  Here one row
    # per (description, date-string); lsn decides last-writer-wins.
    spec = TableSpec(
        key_cols=("description", "date"),
        version_cols=("lsn",),
        partition_key="description",
        num_partitions=4,
        sort_cols=("description", "date"),
    )

    def projector(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "date": parse_date_multi(t["date"], ("%Y/%m/%d",)),
                "description": t["description"],
                "amount": clean_number(t["amount"]),
                "op": t["op"],
                "lsn": pc.cast(t["lsn"], pa.int64()),
                "payment_month": t["payment_month"],
            }
        )

    notifier = CollectingNotifier()
    router = Router()
    router.add_handler(
        PipelineHandler(
            name="bank-statement",
            pattern=r"/\d{6}\.csv$",
            lake_dir=lake,
            spec=spec,
            decode=DecodeSpec(
                encoding="shift_jis",
                skip_head_lines=1,
                skip_leading_rows=1,
                column_names=("date", "description", "amount", "op", "lsn"),
                path_meta=(("payment_month", r"/(\d{6})\.csv$"),),
            ),
            projector=projector,
            notifier=notifier,
        )
    )

    router.run(sorted(glob.glob(f"{seg_dir}/*.csv")))
    for result in notifier.results:
        print(notifier.format(result))

    state = (
        read_lake(lake, spec)
        .to_pandas()
        .sort_values(["description", "date"])
        .reset_index(drop=True)
    )
    print(state[["date", "description", "amount", "payment_month"]].to_string())
    # LWW applied: book=3,500 (updated), coffee deleted, refund kept
    assert state[state.description == "book"]["amount"].iloc[0] == "3500"
    assert "コーヒー" not in set(state["description"])
    print("quickstart OK")
    ray.shutdown()


if __name__ == "__main__":
    main()
