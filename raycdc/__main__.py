"""CLI entry points: ``python -m raycdc <cmd>``.

The operational analog of the reference's Cloud Functions entry
(``/root/reference/examples/quickstart/bqload.go:71-73``) — here a small
driver around the library.  Owns its own Ray session (the library never
calls ray.init, per the embedding contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init(num_cpus: int | None) -> bool:
    """Init Ray if nobody has; returns True when WE own the session (so we
    shut down only what we started — embedding-safe, e.g. under pytest)."""
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
        return True
    return False



def _lake_spec(lake_dir: str, partitions: int):
    """TableSpec for an EXISTING lake: the persisted _spec.json is
    authoritative (policy + layout); CLI args only seed brand-new lakes."""
    from raycdc.schema import TableSpec
    from raycdc.sink import read_spec_meta

    meta = read_spec_meta(lake_dir)
    if meta is None:
        return TableSpec(num_partitions=partitions)
    base = TableSpec()
    return TableSpec(
        num_partitions=int(meta.get("num_partitions", partitions)),
        merge_policy=meta.get("merge_policy", "lww"),
        partition_key=meta.get("partition_key", base.partition_key),
        key_cols=tuple(meta.get("key_cols", base.key_cols)),
        version_cols=tuple(meta.get("version_cols", base.version_cols)),
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="raycdc")
    ap.add_argument("--num-cpus", type=int, default=None)
    # option parity with the reference (/root/reference/option.go:17-47):
    # WithLogLevel (default error) + WithPrettyLogging
    ap.add_argument(
        "--log-level",
        default="error",
        choices=["trace", "debug", "info", "warn", "error", "fatal", "panic"],
    )
    ap.add_argument("--pretty-logging", action="store_true")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_replay = sub.add_parser("replay", help="apply changelog segments into a lake")
    p_replay.add_argument("segments", nargs="+", help="parquet segment paths/globs")
    p_replay.add_argument("--lake", required=True)
    p_replay.add_argument("--partitions", type=int, default=64)
    p_replay.add_argument("--salted", action="store_true")
    p_replay.add_argument("--auto-salt", action="store_true")

    p_boot = sub.add_parser(
        "bootstrap",
        help="initialize an EMPTY lake from a full-state snapshot at a WAL position",
    )
    p_boot.add_argument("snapshot", nargs="+", help="snapshot parquet paths/globs")
    p_boot.add_argument("--lake", required=True)
    p_boot.add_argument(
        "--at-lsn",
        type=int,
        required=True,
        help="WAL position the dump reflects; replay prunes lsn <= this",
    )
    p_boot.add_argument("--partitions", type=int, default=64)

    p_tail = sub.add_parser("tail", help="continuously apply new WAL segments")
    p_tail.add_argument("--watch", required=True, help="directory to poll")
    p_tail.add_argument("--lake", required=True)
    p_tail.add_argument("--partitions", type=int, default=64)
    p_tail.add_argument("--rounds", type=int, default=None)
    p_tail.add_argument("--interval", type=float, default=5.0)
    p_tail.add_argument(
        "--sync-to",
        default=None,
        help="replica lake kept in lockstep (incremental sync after every "
        "round that applied segments)",
    )
    p_tail.add_argument(
        "--prune-keep-last",
        type=int,
        default=None,
        dest="prune_keep_last",
        help="WAL self-retention: after every applying round delete "
        "journaled segment files past the newest N (see `prune`)",
    )
    p_tail.add_argument(
        "--follow",
        action="store_true",
        help="long-lived follower mode: idle rounds back the poll "
        "interval off exponentially up to --max-interval (the "
        "reference's redelivery loop as a daemon)",
    )
    p_tail.add_argument(
        "--max-interval",
        type=float,
        default=60.0,
        dest="max_interval",
        help="backoff cap in seconds for --follow (default 60)",
    )

    p_exp = sub.add_parser(
        "expire",
        help="row-level retention: delete every live row older than a "
        "cutoff timestamp, exactly-once (prune retires WAL files, "
        "compact collects tombstones, expire retires data rows)",
    )
    p_exp.add_argument("--lake", required=True)
    p_exp.add_argument(
        "--older-than", required=True, dest="older_than",
        help="ISO timestamp; live rows with ts strictly below it expire",
    )
    p_exp.add_argument("--ts-col", default="ts", dest="ts_col")
    p_exp.add_argument("--partitions", type=int, default=64)

    p_compact = sub.add_parser("compact", help="drop applied tombstones")
    p_compact.add_argument("--lake", required=True)
    p_compact.add_argument("--partitions", type=int, default=64)
    p_compact.add_argument(
        "--watermark",
        default=None,
        help="ISO timestamp bound: drop tombstones (lww) / closed versions "
        "(history) at or before it; required for history lakes",
    )

    p_verify = sub.add_parser(
        "verify",
        help="fsck: audit each partition's file against its checkpoint "
        "and the layout invariants (read-only)",
    )
    p_verify.add_argument("--lake", default=None)
    p_verify.add_argument("--partitions", type=int, default=64)
    p_verify.add_argument(
        "--export-dir", default=None, dest="export_dir",
        help="fsck an export_lake shard dir instead of a lake "
        "(markers vs shards vs manifest; exit 3 on any defect)",
    )

    p_repair = sub.add_parser(
        "repair",
        help="reset corrupt partitions (from `verify`) so a full-WAL "
        "replay or re-bootstrap rebuilds them exactly-once",
    )
    p_repair.add_argument("--lake", required=True)
    p_repair.add_argument(
        "--part", action="append", type=int, required=True,
        help="partition id to reset (repeatable)",
    )

    p_show = sub.add_parser("show", help="print lake state summary")
    p_show.add_argument(
        "--du",
        action="store_true",
        help="metadata-only storage census instead of a data read: rows, "
        "current vs retained bytes, versions, snapshots, journal length",
    )
    p_show.add_argument("--lake", required=True)
    p_show.add_argument("--partitions", type=int, default=64)
    p_show.add_argument("--as-of", type=int, default=None, help="snapshot id")

    p_hist = sub.add_parser("history", help="apply-history (lineage) summary")
    p_hist.add_argument("--lake", required=True)

    p_vacuum = sub.add_parser("vacuum", help="prune old snapshots/versions")
    p_vacuum.add_argument("--lake", required=True)
    p_vacuum.add_argument("--keep", type=int, default=1)

    p_lookup = sub.add_parser("lookup", help="point lookup one conversation")
    p_lookup.add_argument("--lake", required=True)
    p_lookup.add_argument("--key", required=True)
    p_lookup.add_argument("--partitions", type=int, default=64)

    p_diff = sub.add_parser(
        "diff", help="diff two keyed table snapshots into a changelog parquet"
    )
    p_diff.add_argument("old", help="old snapshot parquet path")
    p_diff.add_argument("new", help="new snapshot parquet path")
    p_diff.add_argument("--keys", required=True, help="comma-separated key columns")
    p_diff.add_argument(
        "--values", required=True, help="comma-separated value columns to compare"
    )
    p_diff.add_argument("--out", required=True, help="output directory (parquet)")
    p_diff.add_argument("--partitions", type=int, default=64)

    p_migrate = sub.add_parser(
        "migrate", help="re-layout a lake under a new partition count"
    )
    p_migrate.add_argument("src", help="source lake dir")
    p_migrate.add_argument("dst", help="destination lake dir (fresh)")
    p_migrate.add_argument("--partitions", type=int, required=True)

    p_scd2 = sub.add_parser(
        "scd2", help="materialize the SCD Type-2 history of a changelog parquet"
    )
    p_scd2.add_argument("segments", nargs="+", help="changelog parquet paths/globs")
    p_scd2.add_argument("--out", required=True, help="output directory (parquet)")
    p_scd2.add_argument(
        "--keys", default="conv_id,turn_idx", help="comma-separated key columns"
    )
    p_scd2.add_argument("--ts-col", default="ts")
    p_scd2.add_argument("--lsn-col", default="lsn")
    p_scd2.add_argument("--partitions", type=int, default=64)

    p_view = sub.add_parser(
        "join-view",
        help="refresh an incrementally maintained join view of two "
        "co-partitioned lakes (only partitions whose sources advanced "
        "are recomputed)",
    )
    p_view.add_argument("left", help="left lake dir")
    p_view.add_argument("right", help="right lake dir")
    p_view.add_argument("--view", required=True, help="view lake dir")
    p_view.add_argument(
        "--on",
        default="conv_id",
        help="comma-separated join keys (first must be the shared partition key)",
    )
    p_view.add_argument(
        "--how", default="inner", choices=["inner", "left", "semi", "anti"]
    )
    p_view.add_argument(
        "--left-columns", default=None, help="comma-separated column prune"
    )
    p_view.add_argument(
        "--right-columns", default=None, help="comma-separated column prune"
    )

    p_distinct = sub.add_parser(
        "distinct",
        help="incrementally maintain an approximate-distinct (HyperLogLog) "
        "view of a lake: distinct VALUE per GROUP ever seen, refreshed "
        "from the change feed (grow-only; deletes cannot decrement)",
    )
    p_distinct.add_argument("src", help="source lake dir")
    p_distinct.add_argument("dst", help="distinct-view lake dir")
    p_distinct.add_argument("--group", required=True, help="group column")
    p_distinct.add_argument("--value", required=True, help="counted column")
    p_distinct.add_argument("--partitions", type=int, default=4)

    p_export = sub.add_parser(
        "export",
        help="sharded trainer-facing export of the lake's live state: "
        "one atomic jsonl/parquet shard per partition with marker-based "
        "resume (re-runs skip up-to-date shards)",
    )
    p_export.add_argument("src", help="source lake dir")
    p_export.add_argument("out", help="output shard dir")
    p_export.add_argument(
        "--format", choices=("jsonl", "parquet"), default="jsonl"
    )
    p_export.add_argument(
        "--columns", default=None, help="comma-separated column prune"
    )
    p_export.add_argument(
        "--overwrite", action="store_true",
        help="ignore existing markers (full re-export)",
    )
    p_export.add_argument(
        "--as-of", type=int, default=None, dest="as_of",
        help="export a PINNED snapshot id (reproducible shards even "
        "after the lake advances)",
    )

    p_digest = sub.add_parser(
        "digest",
        help="incrementally maintain an approximate-quantile (t-digest) "
        "view of a lake: per-group quantiles of VALUE ever inserted, "
        "refreshed from the change feed (grow-only)",
    )
    p_digest.add_argument("src", help="source lake dir")
    p_digest.add_argument("dst", help="digest-view lake dir")
    p_digest.add_argument("--group", required=True, help="group column")
    p_digest.add_argument("--value", required=True, help="sketched column")
    p_digest.add_argument("--partitions", type=int, default=4)
    p_digest.add_argument(
        "--qs",
        default="0.5,0.9,0.99",
        help="comma-separated quantiles in (0,1)",
    )

    p_ext = sub.add_parser(
        "extrema",
        help="incrementally maintain a MIN/MAX/COUNT-per-group view of a "
        "lake (non-invertible aggregates: touched groups recompute from "
        "the pinned snapshot with partition pruning)",
    )
    p_ext.add_argument("src", help="source lake dir")
    p_ext.add_argument("dst", help="extrema-view lake dir")
    p_ext.add_argument("--group", default="conv_id", help="group column (must equal the source partition key)")
    p_ext.add_argument("--value", default="turn_idx", help="min/max column")
    p_ext.add_argument("--partitions", type=int, default=8)

    p_topk = sub.add_parser(
        "topk",
        help="incrementally maintain a TOP-K-per-group view of a lake "
        "(ordered non-invertible: a delete can promote a value the view "
        "never stored — touched groups recompute with partition pruning)",
    )
    p_topk.add_argument("src", help="source lake dir")
    p_topk.add_argument("dst", help="topk-view lake dir")
    p_topk.add_argument("--group", default="conv_id", help="group column (must equal the source partition key)")
    p_topk.add_argument("--order", default="turn_idx", help="ranking column (k largest kept)")
    p_topk.add_argument("-k", type=int, default=3)
    p_topk.add_argument("--partitions", type=int, default=8)

    p_ann = sub.add_parser(
        "ann-index",
        help="incrementally maintain an IVF-PQ vector index lake as a view "
        "of a vector lake (first run trains + persists the quantizer; "
        "later runs re-encode only the change)",
    )
    p_ann.add_argument("src", help="vector lake dir")
    p_ann.add_argument("dst", help="index lake dir")
    p_ann.add_argument("--key", default="vec_id", help="key column (= source partition key)")
    p_ann.add_argument("--vec", default="embedding", help="vector column")
    p_ann.add_argument("--lists", type=int, default=16, dest="n_lists")
    p_ann.add_argument("--msub", type=int, default=4, dest="m_sub")
    p_ann.add_argument("--partitions", type=int, default=8)

    p_roll = sub.add_parser(
        "rollup",
        help="incrementally maintain a SUM/COUNT-per-group aggregate view "
        "of a lake (feeds only the change since the last run)",
    )
    p_roll.add_argument("src", help="source lake dir")
    p_roll.add_argument("dst", help="rollup lake dir")
    p_roll.add_argument(
        "--group", required=True, help="comma-separated group columns"
    )
    p_roll.add_argument(
        "--count",
        default=None,
        metavar="ALIAS",
        help="emit a row-count column under this name",
    )
    p_roll.add_argument(
        "--sum",
        action="append",
        default=[],
        metavar="COL[:ALIAS]",
        help="sum an int64 source column (repeatable)",
    )
    p_roll.add_argument("--partitions", type=int, default=16)

    p_tview = sub.add_parser(
        "transcripts",
        help="incrementally maintain an assembled-transcript view of a "
        "turn-level lake (re-assembles only the changed conversations)",
    )
    p_tview.add_argument("src", help="source (turn-level) lake dir")
    p_tview.add_argument("dst", help="transcript-view lake dir")
    p_tview.add_argument("--group", default="conv_id")
    p_tview.add_argument("--order", default="turn_idx")
    p_tview.add_argument("--text", default="text")
    p_tview.add_argument("--sep", default="\n")
    p_tview.add_argument(
        "--role",
        default="role",
        help="role column for the n_<value> counter ('' disables)",
    )
    p_tview.add_argument("--role-value", default="user")
    p_tview.add_argument("--partitions", type=int, default=16)

    p_snap = sub.add_parser(
        "snapshot",
        help="record the current per-partition versions as a snapshot id "
        "(time-travel / feed anchor)",
    )
    p_snap.add_argument("--lake", required=True)

    p_restore = sub.add_parser(
        "restore",
        help="rewind the lake's CURRENT state to a snapshot (checkpoints "
        "rewind with it, so replaying the corrected WAL suffix resumes "
        "exactly-once; crash-safe, re-run to complete)",
    )
    p_restore.add_argument("--lake", required=True)
    p_restore.add_argument(
        "--as-of", type=int, required=True, dest="as_of",
        help="snapshot id to rewind to (see the _snapshots/ manifests)",
    )

    p_prune = sub.add_parser(
        "prune",
        help="WAL retention GC: delete segment files the lake's journal "
        "records as fully applied (keep the newest N as a margin)",
    )
    p_prune.add_argument("--lake", required=True)
    p_prune.add_argument("--keep-last", type=int, default=0, dest="keep_last")
    p_prune.add_argument("--dry-run", action="store_true", dest="dry_run")

    p_feed = sub.add_parser(
        "feed",
        help="emit the insert/update/delete change feed between two lake "
        "snapshots as parquet (CDC out)",
    )
    p_feed.add_argument("--lake", required=True)
    p_feed.add_argument(
        "--from-snapshot",
        type=int,
        default=None,
        help="base snapshot id (omit for the initial-load feed)",
    )
    p_feed.add_argument(
        "--to-snapshot",
        type=int,
        default=None,
        help="target snapshot id (omit for the current state)",
    )
    p_feed.add_argument("--out", required=True, help="output directory (parquet)")
    p_feed.add_argument(
        "--include-old",
        action="store_true",
        help="add old_<col> before-image columns",
    )

    p_dlq = sub.add_parser(
        "deadletters",
        help="inspect a dead-letter / late-event quarantine directory",
    )
    p_dlq.add_argument("--dir", required=True, help="park directory")
    p_dlq.add_argument(
        "--queue",
        choices=["batch", "late"],
        default=None,
        help="inspect one queue only (the two carry different schemas)",
    )

    p_sync = sub.add_parser(
        "sync",
        help="incrementally replicate a lake (copies only partitions whose "
        "source version advanced; replica stays replay-capable)",
    )
    p_sync.add_argument("src", help="source lake dir")
    p_sync.add_argument("dst", help="replica lake dir")

    p_profile = sub.add_parser(
        "profile", help="sketch-profile parquet column(s): count, distinct, quantiles"
    )
    p_profile.add_argument("paths", nargs="+", help="parquet paths/globs")
    p_profile.add_argument("--cols", required=True, help="comma-separated columns")
    p_profile.add_argument(
        "--quantiles", default="0.01,0.25,0.5,0.75,0.99", help="for numeric columns"
    )

    p_preset = sub.add_parser(
        "preset",
        help="run a contrib preset handler (bank/card statement decode + "
        "projector) over segment files; append records as parquet",
    )
    p_preset.add_argument(
        "name", nargs="?", default=None,
        help="preset name (omit to list available presets)",
    )
    p_preset.add_argument("--paths", nargs="*", default=[], help="input files/globs")
    p_preset.add_argument("--out", default=None, help="output parquet directory")

    args = ap.parse_args(argv)
    from raycdc.runlog import configure_logging

    configure_logging(level=args.log_level, pretty=args.pretty_logging)
    if args.cmd == "show" and args.du:
        # metadata-only census: never touches Ray — answer before any
        # session is started (an early return after _ray_init would also
        # LEAK the session this process owns)
        from raycdc.sink import storage_census

        print(json.dumps(storage_census(args.lake)))
        return 0
    if args.cmd == "verify" and args.export_dir is not None:
        # shard-dir fsck touches only files — same pre-Ray dispatch as
        # show --du (r5 review: the post-init branch paid a full local
        # cluster startup and leaked the session on return)
        from raycdc.engine import verify_export

        rep = verify_export(args.export_dir)
        bad_rows = [r for r in rep.to_pylist() if r["status"] != "ok"]
        print(
            json.dumps(
                {
                    "items": rep.num_rows,
                    "ok": rep.num_rows - len(bad_rows),
                    "defects": bad_rows,
                }
            )
        )
        return 3 if bad_rows else 0
    if args.cmd == "verify" and args.lake is None:
        print("verify: one of --lake / --export-dir is required")
        return 2
    owns_ray = _ray_init(args.num_cpus)

    import ray

    from raycdc.engine import compact, read_lake, replay
    from raycdc.schema import TableSpec

    if args.cmd == "replay":
        import glob as _glob

        import ray.data

        paths: list[str] = []
        for s in args.segments:
            paths.extend(sorted(_glob.glob(s)) or [s])
        spec = _lake_spec(args.lake, args.partitions)
        salted: bool | str = "auto" if args.auto_salt else args.salted
        lineage = replay(
            ray.data.read_parquet(paths), args.lake, spec, salted=salted
        )
        applied = sum(lineage["rows_applied"].to_pylist())
        print(
            json.dumps(
                {
                    "partitions": lineage.num_rows,
                    "rows_applied": applied,
                    "statuses": sorted(set(lineage["status"].to_pylist())),
                }
            )
        )
    elif args.cmd == "bootstrap":
        import glob as _glob

        import ray.data

        from raycdc.engine import bootstrap

        paths = []
        for s in args.snapshot:
            paths.extend(sorted(_glob.glob(s)) or [s])
        lineage = bootstrap(
            ray.data.read_parquet(paths),
            args.lake,
            TableSpec(num_partitions=args.partitions),
            snapshot_lsn=args.at_lsn,
        )
        print(
            json.dumps(
                {
                    "partitions": lineage.num_rows,
                    "rows": int(sum(lineage["rows_applied"].to_pylist())),
                    "at_lsn": args.at_lsn,
                }
            )
        )
    elif args.cmd == "tail":
        from raycdc.engine import tail

        spec = _lake_spec(args.lake, args.partitions)

        def report(i, new, lineage):
            applied = (
                sum(lineage["rows_applied"].to_pylist()) if lineage is not None else 0
            )
            print(
                json.dumps(
                    {"round": i, "new_segments": len(new), "rows_applied": applied}
                ),
                flush=True,
            )

        total = tail(
            args.watch,
            args.lake,
            spec,
            rounds=args.rounds,
            interval_s=args.interval,
            on_round=report,
            sync_to=args.sync_to,
            prune_keep_last=args.prune_keep_last,
            max_interval_s=args.max_interval if args.follow else None,
        )
        print(json.dumps({"segments_applied": total}))
    elif args.cmd == "diff":
        import ray.data

        from raycdc.changelog import diff_snapshots
        from raycdc.storage import resolve_uri_paths

        (old_p, new_p), fs = resolve_uri_paths([args.old, args.new])
        out = diff_snapshots(
            ray.data.read_parquet([old_p], filesystem=fs),
            ray.data.read_parquet([new_p], filesystem=fs),
            key_cols=args.keys.split(","),
            value_cols=args.values.split(","),
            num_partitions=args.partitions,
        )
        out.write_parquet(args.out)
        import numpy as np

        counts: dict[str, int] = {}
        for b in ray.data.read_parquet(args.out).iter_batches(batch_format="pyarrow"):
            u, n = np.unique(
                b["op"].to_numpy(zero_copy_only=False), return_counts=True
            )
            for op, c in zip(u, n):
                counts[str(op)] = counts.get(str(op), 0) + int(c)
        print(json.dumps({"out": args.out, "events": counts}))
    elif args.cmd == "migrate":
        from raycdc.engine import migrate_lake

        summary = migrate_lake(
            args.src, args.dst, TableSpec(num_partitions=args.partitions)
        )
        print(
            json.dumps(
                {
                    "dst": args.dst,
                    "partitions": summary.num_rows,
                    "rows": sum(summary["rows"].to_pylist()),
                    "tombstones": sum(summary["tombstones"].to_pylist()),
                }
            )
        )
    elif args.cmd == "scd2":
        import glob as _glob

        import ray.data

        from raycdc.scd import scd2_history
        from raycdc.storage import resolve_uri_paths

        paths = []
        for s in args.segments:
            paths.extend(sorted(_glob.glob(s)) or [s])
        paths, fs = resolve_uri_paths(paths)
        hist = scd2_history(
            ray.data.read_parquet(paths, filesystem=fs),
            key_cols=tuple(args.keys.split(",")),
            ts_col=args.ts_col,
            lsn_col=args.lsn_col,
            num_partitions=args.partitions,
        )
        hist.write_parquet(args.out)
        import pyarrow.compute as _pc

        versions = 0
        current = 0
        for b in ray.data.read_parquet(
            args.out, columns=["is_current"]
        ).iter_batches(batch_format="pyarrow"):
            versions += len(b)
            current += int(_pc.sum(b["is_current"]).as_py() or 0)
        print(json.dumps({"out": args.out, "versions": versions, "current": current}))
    elif args.cmd == "profile":
        import glob as _glob

        import pyarrow as pa
        import ray.data

        from raycdc.sketch import approx_ndistinct, approx_quantiles
        from raycdc.storage import resolve_uri_paths

        paths = []
        for s in args.paths:
            paths.extend(sorted(_glob.glob(s)) or [s])
        read_paths, fs = resolve_uri_paths(paths)
        cols = args.cols.split(",")
        qs = [float(q) for q in args.quantiles.split(",")]
        out = {}
        for col in cols:
            ds = ray.data.read_parquet(read_paths, columns=[col], filesystem=fs)
            entry = {"rows": ds.count()}
            est, rse = approx_ndistinct(ds, col)
            entry["approx_ndistinct"] = est
            entry["ndistinct_rse"] = round(rse, 4)
            t = ds.schema()
            typ = dict(zip(t.names, t.types))[col]
            if pa.types.is_integer(typ) or pa.types.is_floating(typ):
                est_q = approx_quantiles(ds, col, qs)
                entry["quantiles"] = {
                    str(q): round(float(v), 6) for q, v in zip(qs, est_q)
                }
            out[col] = entry
        print(json.dumps(out))
    elif args.cmd == "compact":
        import datetime as _dt

        spec = _lake_spec(args.lake, args.partitions)
        wm = (
            _dt.datetime.fromisoformat(args.watermark)
            if args.watermark
            else None
        )
        lineage = compact(args.lake, spec, watermark=wm)
        print(
            json.dumps(
                {
                    "partitions": lineage.num_rows,
                    "tombstones_dropped": sum(lineage["tombstones"].to_pylist()),
                }
            )
        )
    elif args.cmd == "verify":
        from raycdc.engine import verify_lake

        spec = _lake_spec(args.lake, args.partitions)
        report = verify_lake(args.lake, spec)
        # part=-1 rows are lake-level findings, not partitions
        statuses = [
            r["status"] for r in report.to_pylist() if r["part"] >= 0
        ]
        bad = [
            {"part": r["part"], "issues": r["issues"]}
            for r in report.to_pylist()
            if r["status"] == "corrupt"
        ]
        print(
            json.dumps(
                {
                    "partitions": len(statuses),
                    "ok": statuses.count("ok"),
                    "empty": statuses.count("empty"),
                    "corrupt": bad,
                }
            )
        )
        if bad:
            return 3
    elif args.cmd == "repair":
        from raycdc.engine import repair_partition

        reset = repair_partition(args.lake, args.part)
        print(
            json.dumps(
                {
                    "reset": reset,
                    "next": "replay the full retained WAL (or re-bootstrap) "
                    "to rebuild the reset partitions",
                }
            )
        )
    elif args.cmd == "show":
        spec = _lake_spec(args.lake, args.partitions)
        ds = read_lake(args.lake, spec, as_of=args.as_of)
        print(json.dumps({"live_rows": ds.count(), "schema": ds.schema().names}))
    elif args.cmd == "history":
        from raycdc.engine import read_lineage
        from raycdc.sink import lineage_files

        pdf = read_lineage(args.lake).to_pandas()
        print(
            json.dumps(
                {
                    # one lineage file is written per apply round
                    "apply_rounds": len(lineage_files(args.lake)),
                    "rows_applied_total": int(pdf["rows_applied"].sum())
                    if len(pdf)
                    else 0,
                    "partitions_touched": int(pdf["part"].nunique())
                    if len(pdf)
                    else 0,
                    "statuses": sorted(pdf["status"].unique().tolist())
                    if len(pdf)
                    else [],
                }
            )
        )
    elif args.cmd == "join-view":
        from raycdc.engine import refresh_join_view

        lin = refresh_join_view(
            args.left,
            args.right,
            args.view,
            on=tuple(args.on.split(",")),
            spec_left=_lake_spec(args.left, 64),
            spec_right=_lake_spec(args.right, 64),
            how=args.how,
            left_columns=args.left_columns.split(",") if args.left_columns else None,
            right_columns=args.right_columns.split(",")
            if args.right_columns
            else None,
        )
        statuses = lin["status"].to_pylist()
        print(
            json.dumps(
                {
                    "view": args.view,
                    "partitions": lin.num_rows,
                    "refreshed": statuses.count("refreshed"),
                    "noop": statuses.count("noop"),
                    "rows_total": int(sum(lin["rows_total"].to_pylist())),
                }
            )
        )
    elif args.cmd == "export":
        import pyarrow.compute as _pcc

        from raycdc.engine import export_lake

        lin = export_lake(
            args.src,
            args.out,
            spec=_lake_spec(args.src, 64),
            format=args.format,
            columns=args.columns.split(",") if args.columns else None,
            overwrite=args.overwrite,
            as_of=args.as_of,
        )
        print(
            json.dumps(
                {
                    "partitions": lin.num_rows,
                    "rows": int(_pcc.sum(lin["rows"]).as_py() or 0),
                    "statuses": {
                        s: lin.filter(
                            _pcc.equal(lin["status"], s)
                        ).num_rows
                        for s in set(lin["status"].to_pylist())
                    },
                }
            )
        )
    elif args.cmd == "digest":
        from raycdc.engine import maintain_digest

        est = maintain_digest(
            args.src,
            args.dst,
            group_col=args.group,
            value_col=args.value,
            spec=_lake_spec(args.src, 64),
            qs=tuple(float(q) for q in args.qs.split(",")),
            num_partitions=args.partitions,
        )
        print(json.dumps(est.to_pylist()))
    elif args.cmd == "distinct":
        from raycdc.engine import maintain_distinct

        est = maintain_distinct(
            args.src,
            args.dst,
            group_col=args.group,
            value_col=args.value,
            spec=_lake_spec(args.src, 64),
            num_partitions=args.partitions,
        )
        print(
            json.dumps(
                dict(
                    zip(
                        est[args.group].to_pylist(),
                        est["n_distinct"].to_pylist(),
                    )
                )
            )
        )
    elif args.cmd == "extrema":
        from raycdc.engine import maintain_extrema

        lin = maintain_extrema(
            args.src,
            args.dst,
            group_col=args.group,
            value_col=args.value,
            spec=_lake_spec(args.src, 64),
            num_partitions=args.partitions,
        )
        print(json.dumps({"applied_partitions": lin.num_rows}))
    elif args.cmd == "expire":
        from raycdc.engine import expire_rows

        lin = expire_rows(
            args.lake,
            args.older_than,
            spec=_lake_spec(args.lake, args.partitions),
            ts_col=args.ts_col,
        )
        import pyarrow.compute as pc

        print(
            json.dumps(
                {
                    "partitions": lin.num_rows,
                    "rows_expired": int(
                        pc.sum(lin["tombstones"]).as_py() or 0
                    ),
                }
            )
        )
    elif args.cmd == "ann-index":
        from raycdc.similarity import maintain_vector_index

        lin = maintain_vector_index(
            args.src,
            args.dst,
            vec_col=args.vec,
            key_col=args.key,
            n_lists=args.n_lists,
            m_sub=args.m_sub,
            spec=_lake_spec(args.src, 64),
            num_partitions=args.partitions,
        )
        print(json.dumps({"applied_partitions": lin.num_rows}))
    elif args.cmd == "topk":
        from raycdc.engine import maintain_topk

        lin = maintain_topk(
            args.src,
            args.dst,
            group_col=args.group,
            order_col=args.order,
            k=args.k,
            spec=_lake_spec(args.src, 64),
            num_partitions=args.partitions,
        )
        print(json.dumps({"applied_partitions": lin.num_rows}))
    elif args.cmd == "rollup":
        import pyarrow as pa
        import pyarrow.compute as pc

        from raycdc.engine import maintain_rollup

        sums = [
            (s.split(":")[0], s.split(":")[-1]) for s in args.sum
        ]  # COL or COL:ALIAS
        value_cols = ([args.count] if args.count else []) + [a for _, a in sums]
        if not value_cols:
            raise SystemExit("rollup: pass --count and/or --sum")

        def derive(t: pa.Table) -> pa.Table:
            cols = {}
            if args.count:
                cols[args.count] = pa.array([1] * len(t), pa.int64())
            for col, alias in sums:
                cols[alias] = pc.cast(t[col], pa.int64())
            return pa.table(cols)

        lin = maintain_rollup(
            args.src,
            args.dst,
            group_cols=tuple(args.group.split(",")),
            value_cols=tuple(value_cols),
            spec=_lake_spec(args.src, 64),
            num_partitions=args.partitions,
            derive=derive,
        )
        statuses = lin["status"].to_pylist() if lin.num_rows else []
        print(
            json.dumps(
                {
                    "dst": args.dst,
                    "partitions_applied": sum(
                        1 for s in statuses if s != "noop"
                    ),
                    "rows_applied": int(sum(lin["rows_applied"].to_pylist()))
                    if lin.num_rows
                    else 0,
                }
            )
        )
    elif args.cmd == "transcripts":
        from raycdc.engine import maintain_transcripts

        lin = maintain_transcripts(
            args.src,
            args.dst,
            spec=_lake_spec(args.src, 64),
            group_col=args.group,
            order_col=args.order,
            text_col=args.text,
            sep=args.sep,
            role_col=args.role or None,
            role_value=args.role_value,
            num_partitions=args.partitions,
        )
        statuses = lin["status"].to_pylist() if lin.num_rows else []
        print(
            json.dumps(
                {
                    "dst": args.dst,
                    "partitions_applied": sum(
                        1 for s in statuses if s != "noop"
                    ),
                    "rows_applied": int(sum(lin["rows_applied"].to_pylist()))
                    if lin.num_rows
                    else 0,
                }
            )
        )
    elif args.cmd == "snapshot":
        from raycdc.sink import write_snapshot

        print(json.dumps({"snapshot": write_snapshot(args.lake)}))
    elif args.cmd == "restore":
        import pyarrow.compute as pc

        from raycdc.engine import restore_lake

        lineage = restore_lake(args.lake, args.as_of)
        counts = {
            s: lineage.filter(pc.equal(lineage["status"], s)).num_rows
            for s in ("restored", "reset_empty", "noop")
        }
        print(json.dumps({"as_of": args.as_of, **counts}))
    elif args.cmd == "prune":
        import pyarrow.compute as pc

        from raycdc.engine import prune_segments

        out = prune_segments(
            args.lake, keep_last=args.keep_last, dry_run=args.dry_run
        )
        counts = {
            s: out.filter(pc.equal(out["status"], s)).num_rows
            for s in ("pruned", "kept", "missing")
        }
        print(json.dumps({"dry_run": args.dry_run, **counts}))
    elif args.cmd == "feed":
        from raycdc.engine import change_feed

        out = change_feed(
            args.lake,
            args.from_snapshot,
            args.to_snapshot,
            _lake_spec(args.lake, 64),
            include_old=args.include_old,
        )
        out.write_parquet(args.out)
        import numpy as np

        counts: dict[str, int] = {}
        for b in ray.data.read_parquet(args.out).iter_batches(
            batch_format="pyarrow"
        ):
            u, n = np.unique(
                b["op"].to_numpy(zero_copy_only=False), return_counts=True
            )
            for op, c in zip(u, n):
                counts[str(op)] = counts.get(str(op), 0) + int(c)
        print(json.dumps({"out": args.out, "events": counts}))
    elif args.cmd == "deadletters":
        from raycdc.engine import read_dead_letters
        from raycdc.storage import get_storage

        t = read_dead_letters(args.dir, prefix=args.queue)
        st = get_storage(args.dir)
        want_prefixes = (
            ("batch-", "late-") if args.queue is None else (f"{args.queue}-",)
        )
        errors: dict[str, int] = {}
        nfiles = 0
        for name in sorted(st.listdir(args.dir)):
            if not (
                name.startswith(want_prefixes)
                and name.endswith(".parquet")
            ):
                continue
            nfiles += 1
            # the park error string travels as parquet schema metadata
            meta = st.read_parquet_schema(
                os.path.join(args.dir, name)
            ).metadata or {}
            err = meta.get(b"raycdc.error", b"").decode() or "(late event)"
            errors[err] = errors.get(err, 0) + 1
        print(
            json.dumps(
                {
                    "rows": 0 if t is None else len(t),
                    "files": nfiles,
                    "columns": [] if t is None else t.column_names,
                    "errors": errors,
                }
            )
        )
    elif args.cmd == "sync":
        from raycdc.engine import sync_lake

        lin = sync_lake(args.src, args.dst, _lake_spec(args.src, 64))
        statuses = lin["status"].to_pylist()
        print(
            json.dumps(
                {
                    "dst": args.dst,
                    "copied": statuses.count("copied"),
                    "noop": statuses.count("noop"),
                    "rows_total": int(sum(lin["rows_total"].to_pylist())),
                }
            )
        )
    elif args.cmd == "vacuum":
        from raycdc.sink import vacuum

        removed = vacuum(args.lake, keep_snapshots=args.keep)
        print(json.dumps({"files_removed": removed}))
    elif args.cmd == "lookup":
        from raycdc.engine import lookup

        spec = _lake_spec(args.lake, args.partitions)
        t = lookup(args.lake, args.key, spec)
        print(json.dumps({"rows": len(t), "columns": t.column_names}))
    elif args.cmd == "preset":
        import glob as _glob

        from raycdc.presets import PRESETS

        if args.name is None:
            print(json.dumps({"presets": sorted(PRESETS)}))
        else:
            if args.name not in PRESETS:
                print(
                    json.dumps(
                        {"error": f"unknown preset {args.name}",
                         "presets": sorted(PRESETS)}
                    )
                )
                if owns_ray:
                    ray.shutdown()
                return 2
            preset = PRESETS[args.name]()
            paths: list[str] = []
            for s in args.paths:
                paths.extend(sorted(_glob.glob(s)) or [s])
            matched = [p for p in paths if preset.matches(p)]
            if not matched:
                print(json.dumps({"error": "no input matches the preset "
                                  f"pattern {preset.pattern!r}", "inputs": paths}))
                if owns_ray:
                    ray.shutdown()
                return 2
            ds = preset.records(matched)
            if args.out:
                # append-only parquet sink — the reference's BigQuery load
                # disposition (loader.go:45-57) is append, not merge
                ds.write_parquet(args.out)
                print(json.dumps({"preset": args.name, "files": len(matched),
                                  "out": args.out}))
            else:
                n = ds.count()
                print(json.dumps({"preset": args.name, "files": len(matched),
                                  "records": n}))
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
