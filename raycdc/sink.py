"""Exactly-once lake sink: atomic partition rewrite + checkpoints + lineage.

The reference's loader buffers the whole projected file to CSV in memory and
submits one BigQuery load job, blocking on completion
(``/root/reference/loader.go:33-60``); re-delivery double-appends (no
idempotence, SURVEY.md §2.6).  Here the sink is a *pure function of state*:

* lake layout ``<lake>/part=<K>/data-v{N}.parquet`` — one deterministic current file per
  hash partition, holding the merged rows INCLUDING tombstones (op='delete'),
  so LWW replay of stale segments can never resurrect deleted keys;
* writes go to a temp file then ``os.replace`` (atomic on POSIX) — a failed
  or retried Ray task can only ever leave a complete old or complete new
  partition file, never a torn one;
* per-partition checkpoint ``<lake>/_ckpt/part-<K>.json``
  ``{max_lsn, row_count, content_hash}`` — replays filter ``lsn > max_lsn``
  per partition, so redelivered segments are no-ops (exactly-once effect);
* per-apply lineage rows (the Notifier analog,
  ``/root/reference/notifier.go:17-26``) appended under ``<lake>/_lineage/``.

All functions are callable from inside distributed ``map_groups`` tasks; the
driver never holds partition data.

Storage contract: every byte of lake IO goes through
:mod:`raycdc.storage` — plain paths use the POSIX temp+rename publish
(multi-node clusters need an NFS-like shared mount at the lake path);
``scheme://`` lake paths resolve to an fsspec backend where publish is a
single atomic PUT.  See ``storage.py`` for the per-backend atomicity
reasoning.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raycdc.partition import hash_strings
from raycdc.storage import get_storage, read_json, write_json_atomic

# One row per partition per apply round.  Contract notes:
#  * status: 'applied' | 'noop' | 'compacted' | 'skipped'.
#  * tombstones = -1 is a sentinel meaning "not recomputed on this path"
#    (checkpoint-backed noop rows answer from the checkpoint alone and never
#    open the partition file).  Consumers aggregating lineage history must
#    filter on status before summing tombstones.
LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("part", pa.int32()),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_applied", pa.int64()),
        pa.field("rows_skipped_ckpt", pa.int64()),
        pa.field("rows_total", pa.int64()),
        pa.field("tombstones", pa.int64()),
        pa.field("max_lsn", pa.int64()),
        pa.field("content_hash", pa.int64()),
        pa.field("status", pa.string()),
    ]
)


def part_dir(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, f"part={part:05d}")


def part_file(lake_dir: str, part: int, version: int | None = None) -> str:
    """Path of one partition data file.

    ``version=None`` resolves the CURRENT version via the checkpoint
    (versioned files ``data-v{N}.parquet`` enable snapshots/time travel
    and give concurrent readers a consistent file while a writer installs
    the next version; ``vacuum`` prunes old ones).  Falls back to version
    0 for a never-written partition.
    """
    if version is None:
        ckpt = read_checkpoint(lake_dir, part)
        version = ckpt.get("version", 0) if ckpt else 0
    return os.path.join(part_dir(lake_dir, part), f"data-v{version:06d}.parquet")


def current_files(lake_dir: str) -> list[str]:
    """Current-version data file per existing partition (sorted)."""
    st = get_storage(lake_dir)
    out = []
    for name in sorted(st.listdir(lake_dir)):
        if not name.startswith("part="):
            continue
        part = int(name.split("=")[1])
        path = part_file(lake_dir, part)
        if st.exists(path):
            out.append(path)
    return out


def ckpt_file(lake_dir: str, part: int) -> str:
    return os.path.join(lake_dir, "_ckpt", f"part-{part:05d}.json")


def bootstrap_marker_file(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_bootstrap_pending.json")


def bootstrap_pending(lake_dir: str) -> bool:
    """True while a bootstrap is in flight (marker written first, cleared
    last) — replay/sync/feed refuse such a lake, re-bootstrap is allowed."""
    return get_storage(lake_dir).exists(bootstrap_marker_file(lake_dir))


def restore_marker_file(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_restore_pending.json")


def restore_pending(lake_dir: str) -> int | None:
    """The snapshot id a crashed :func:`raycdc.engine.restore_lake` was
    rewinding to, or None.  While present the lake is a MIX of restored
    and tip-state partitions — replay/sync/feed refuse it; re-running
    restore (any target snapshot) completes the rewind and clears it."""
    payload = read_json(get_storage(lake_dir), restore_marker_file(lake_dir))
    return None if payload is None else int(payload["snapshot"])


def wipe_lake_state(lake_dir: str) -> None:
    """Remove every partition/metadata artifact of a lake EXCEPT the
    bootstrap-pending marker — used by re-bootstrap of a crashed
    half-initialization, where the retry may use a different partition
    count: stale ``part=``/checkpoint entries beyond the new count would
    otherwise survive as live ghost state."""
    st = get_storage(lake_dir)
    keep = os.path.basename(bootstrap_marker_file(lake_dir))
    for name in st.listdir(lake_dir):
        if name != keep:
            st.remove_tree(os.path.join(lake_dir, name))


def read_partition(
    lake_dir: str,
    part: int,
    version: int | None = None,
    columns: list[str] | None = None,
) -> pa.Table | None:
    """One partition's stored table; ``columns`` prunes at the file read
    (columns absent from the stored schema are simply skipped — partitions
    written before a schema evolution lack the evolved columns)."""
    st = get_storage(lake_dir)
    path = part_file(lake_dir, part, version)
    if not st.exists(path):
        return None
    if columns is not None:
        have = set(st.read_parquet_schema(path).names)
        columns = [c for c in columns if c in have]
    return st.read_parquet(path, columns=columns)


def read_checkpoint(lake_dir: str, part: int) -> dict | None:
    return read_json(get_storage(lake_dir), ckpt_file(lake_dir, part))


def read_all_checkpoints(lake_dir: str) -> dict[int, dict]:
    st = get_storage(lake_dir)
    d = os.path.join(lake_dir, "_ckpt")
    out: dict[int, dict] = {}
    for name in st.listdir(d):
        if name.startswith("part-") and name.endswith(".json"):
            out[int(name[5:-5])] = json.loads(st.read_bytes(os.path.join(d, name)))
    return out


def write_partition_atomic(
    table: pa.Table, lake_dir: str, part: int, version: int | None = None
) -> str:
    """Publish one partition file atomically; returns final path.

    Deterministic writer options (fixed compression, no nondeterministic
    metadata beyond parquet's created_by) so identical state produces
    identical files — the idempotent-rewrite invariant.  The version is
    only visible to readers once the checkpoint advances to it.
    """
    dst = part_file(lake_dir, part, version)
    get_storage(lake_dir).write_parquet_atomic(
        table, dst, compression="zstd", write_statistics=True
    )
    return dst


# ---------------------------------------------------------------------------
# snapshots / time travel


def write_snapshot(lake_dir: str) -> int:
    """Record the current per-partition versions as a snapshot; returns the
    snapshot id (monotone).  Readers can later open the lake ``as_of`` this
    id and see exactly this state regardless of later applies.

    The full per-partition checkpoint payloads (``max_lsn`` floors,
    ``row_count``, ``content_hash``) ride along under ``checkpoints`` —
    they are what :func:`raycdc.engine.restore_lake` rewinds to, so a
    restored lake resumes WAL replay exactly-once from the snapshot's
    position, not from the abandoned tip."""
    st = get_storage(lake_dir)
    snaps_dir = os.path.join(lake_dir, "_snapshots")
    ckpts = read_all_checkpoints(lake_dir)
    versions = {
        str(part): ckpt.get("version", 0) for part, ckpt in ckpts.items()
    }
    existing = sorted(
        int(n[5:-5]) for n in st.listdir(snaps_dir)
        if n.startswith("snap-") and n.endswith(".json")
    )
    # monotonicity must survive vacuum: ids derived from surviving FILES
    # alone would reset after vacuum(keep_snapshots=0) and a reused id
    # would silently time-travel to the WRONG state — a persisted
    # high-water mark (never pruned; 'snap-' prefix filter skips it)
    # keeps the counter moving forward
    hwm = read_json(st, os.path.join(snaps_dir, "_hwm.json")) or {"next": 0}
    snap_id = max((existing[-1] + 1) if existing else 0, int(hwm["next"]))
    write_json_atomic(
        st, os.path.join(snaps_dir, "_hwm.json"), {"next": snap_id + 1}
    )
    write_json_atomic(
        st,
        os.path.join(snaps_dir, f"snap-{snap_id:06d}.json"),
        {
            "id": snap_id,
            "versions": versions,
            "checkpoints": {str(p): c for p, c in ckpts.items()},
        },
    )
    return snap_id


def read_snapshot_payload(lake_dir: str, snap_id: int) -> dict | None:
    """Full snapshot manifest (``versions`` + ``checkpoints`` when the
    snapshot was written by a restore-aware build); None if absent."""
    return read_json(
        get_storage(lake_dir),
        os.path.join(lake_dir, "_snapshots", f"snap-{snap_id:06d}.json"),
    )


def read_snapshot(lake_dir: str, snap_id: int) -> dict[int, int] | None:
    payload = read_snapshot_payload(lake_dir, snap_id)
    if payload is None:
        return None
    return {int(k): int(v) for k, v in payload["versions"].items()}


def list_snapshots(lake_dir: str) -> list[int]:
    d = os.path.join(lake_dir, "_snapshots")
    return sorted(
        int(n[5:-5]) for n in get_storage(lake_dir).listdir(d)
        if n.startswith("snap-") and n.endswith(".json")
    )


def storage_census(lake_dir: str) -> dict:
    """Metadata-only storage report (the ``show --du`` payload): per-lake
    totals of live rows (from checkpoints — no data file is opened),
    current vs retained bytes, version counts, snapshots, lineage files
    and WAL-journal length.  The current/retained split is the vacuum
    planning signal: retained − current is what `vacuum` could reclaim
    (minus whatever snapshots still pin)."""
    st = get_storage(lake_dir)
    ckpts = read_all_checkpoints(lake_dir)
    parts = 0
    stored_rows = 0  # checkpoint row counts (INCLUDES stored tombstones)
    tombstones = 0
    cur_bytes = 0
    ret_bytes = 0
    n_versions = 0
    for name in st.listdir(lake_dir):
        if not name.startswith("part="):
            continue
        parts += 1
        part = int(name.split("=")[1])
        pdir = os.path.join(lake_dir, name)
        ck = ckpts.get(part) or {}
        cur_v = int(ck.get("version", -1))
        stored_rows += int(ck.get("row_count", 0))
        t = ck.get("tombstones", 0)
        tombstones += int(t) if t is not None and int(t) >= 0 else 0
        for fn in st.listdir(pdir):
            if fn.startswith("data-v") and fn.endswith(".parquet"):
                n_versions += 1
                b = st.size(os.path.join(pdir, fn))
                ret_bytes += b
                if int(fn[6:-8]) == cur_v:
                    cur_bytes += b
    journal = os.path.join(lake_dir, "_segments.jsonl")
    n_journal = (
        len(st.read_bytes(journal).decode().splitlines())
        if st.exists(journal)
        else 0
    )
    return {
        "partitions": parts,
        "stored_rows": stored_rows,
        "stored_tombstones": tombstones,
        "current_bytes": cur_bytes,
        "retained_bytes": ret_bytes,
        "data_file_versions": n_versions,
        "snapshots": len(list_snapshots(lake_dir)),
        "lineage_files": len(lineage_files(lake_dir)),
        "wal_journal_entries": n_journal,
    }


def vacuum(lake_dir: str, keep_snapshots: int = 1) -> int:
    """Prune old snapshots and any partition-file version no snapshot (nor
    the current checkpoint) references; returns files removed."""
    pend = restore_pending(lake_dir)
    if pend is not None:
        # vacuuming now could delete the very snapshot the crashed restore
        # must be re-run against — bricking the lake behind its marker
        raise RuntimeError(
            f"lake {lake_dir} has an unfinished restore to snapshot {pend} "
            "(_restore_pending.json present) — re-run restore_lake to "
            "complete the rewind before vacuuming"
        )
    st = get_storage(lake_dir)
    snaps = list_snapshots(lake_dir)
    drop_snaps = snaps[:-keep_snapshots] if keep_snapshots > 0 else snaps
    for sid in drop_snaps:
        st.remove(os.path.join(lake_dir, "_snapshots", f"snap-{sid:06d}.json"))
    keep: dict[int, set[int]] = {}
    for sid in list_snapshots(lake_dir):
        for part, v in (read_snapshot(lake_dir, sid) or {}).items():
            keep.setdefault(part, set()).add(v)
    for part, ckpt in read_all_checkpoints(lake_dir).items():
        keep.setdefault(part, set()).add(ckpt.get("version", 0))
    removed = 0
    for name in st.listdir(lake_dir):
        if not name.startswith("part="):
            continue
        part = int(name.split("=")[1])
        pdir = os.path.join(lake_dir, name)
        for fn in st.listdir(pdir):
            if fn.startswith("data-v") and fn.endswith(".parquet"):
                v = int(fn[6:-8])
                if v not in keep.get(part, set()):
                    st.remove(os.path.join(pdir, fn))
                    removed += 1
            elif fn.startswith(".tmp-"):
                # orphaned publish temp from a crashed/killed writer —
                # nothing else ever deletes these (vacuum already assumes
                # no concurrent apply, same as the version pruning above)
                st.remove(os.path.join(pdir, fn))
                removed += 1
    return removed


def write_checkpoint(lake_dir: str, part: int, payload: dict) -> None:
    write_json_atomic(get_storage(lake_dir), ckpt_file(lake_dir, part), payload)


def content_hash(table: pa.Table, key_cols=("conv_id", "turn_idx", "lsn")) -> int:
    """Order-insensitive deterministic int64 digest of a partition's rows.

    Row order must not matter (partitions are rewritten sorted), but row
    CONTENT must: each row's column hashes are combined positionally into
    one per-row hash (distinct multiplier per column, then an avalanche
    mix), and only then summed — so swapping values between columns or
    compensating edits across rows change the digest.
    """
    if len(table) == 0:
        return 0
    n = len(table)
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        row_h = np.full(n, np.uint64(0xCBF29CE484222325))
        for ci, c in enumerate(key_cols):
            if c not in table.column_names:
                continue
            col = table[c]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                h = hash_strings(col)
            else:
                cc = (
                    col.combine_chunks()
                    if isinstance(col, pa.ChunkedArray)
                    else col
                )
                arr = cc.cast(pa.int64())
                # null cells get a fixed marker BEFORE the numpy round-trip:
                # a raw null would go float64 NaN and astype(int64) of NaN
                # is platform-dependent (INT64_MIN on x86, 0 on some ARM) —
                # the digest must agree across heterogeneous nodes
                import pyarrow.compute as _pc

                vals = (
                    _pc.fill_null(arr, 0)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                h = vals.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                if cc.null_count:
                    valid = cc.is_valid().to_numpy(zero_copy_only=False)
                    h = h.copy()
                    h[~valid] = np.uint64(0xA5A5A5A55A5A5A5A)
            # positional combine: column index participates in the mix
            row_h = (row_h ^ h) * np.uint64(1099511628211 + 2 * ci)
        # avalanche (splitmix64-style) before the commutative row sum
        row_h = row_h ^ (row_h >> np.uint64(30))
        row_h = row_h * np.uint64(0xBF58476D1CE4E5B9)
        row_h = row_h ^ (row_h >> np.uint64(27))
        total = row_h.sum(dtype=np.uint64)
    return int(total & np.uint64(0x7FFFFFFFFFFFFFFF))


def update_lake_schema(lake_dir: str, parts: list[int] | None = None) -> pa.Schema | None:
    """Refresh the lake-level schema registry (``<lake>/_schema.json``).

    The registry is the union of the partition schemas (parquet footers
    only — no data read), widened via the same evolution lattice the merge
    uses, persisted atomically.  ``parts`` limits the footer scan to the
    partitions an apply round touched; the previously registered schema is
    folded in so untouched partitions keep contributing.
    """
    from raycdc.schema import merge_schemas

    merged: pa.Schema | None = read_lake_schema(lake_dir)
    st = get_storage(lake_dir)
    part_ids = parts
    if part_ids is None:
        part_ids = [
            int(name.split("=")[1])
            for name in st.listdir(lake_dir)
            if name.startswith("part=")
        ]
    for part in part_ids:
        path = part_file(lake_dir, part)
        if not st.exists(path):
            continue
        s = st.read_parquet_schema(path)
        merged = s if merged is None else merge_schemas(merged, s)
    if merged is None:
        return None
    import base64

    write_json_atomic(
        st,
        os.path.join(lake_dir, "_schema.json"),
        {
            # lossless: Arrow IPC serialization round-trips EVERY type
            # (tz timestamps, decimals, lists, ...); the readable field
            # list is informational only
            "ipc_b64": base64.b64encode(merged.serialize().to_pybytes()).decode(),
            "fields": [[fld.name, str(fld.type)] for fld in merged],
        },
    )
    return merged


def read_lake_schema(lake_dir: str) -> pa.Schema | None:
    """The registered lake schema, or None when never written."""
    import base64

    payload = read_json(get_storage(lake_dir), os.path.join(lake_dir, "_schema.json"))
    if payload is None:
        return None
    return pa.ipc.read_schema(
        pa.BufferReader(base64.b64decode(payload["ipc_b64"]))
    )


def lineage_dir(lake_dir: str) -> str:
    """The lake's lineage directory (owned here with the rest of the layout)."""
    return os.path.join(lake_dir, "_lineage")


def lineage_files(lake_dir: str) -> list[str]:
    """One file per apply round, sorted — the round count IS the file count."""
    d = lineage_dir(lake_dir)
    return sorted(
        os.path.join(d, n)
        for n in get_storage(lake_dir).listdir(d)
        if n.endswith(".parquet")
    )


def write_lineage(lake_dir: str, rows: pa.Table) -> str:
    """Append a lineage parquet under <lake>/_lineage/ (one file per apply)."""
    dst = os.path.join(lineage_dir(lake_dir), f"apply-{uuid.uuid4().hex}.parquet")
    get_storage(lake_dir).write_parquet_atomic(rows, dst)
    return dst


# ---------------------------------------------------------------------------
# lake spec metadata — the policy/layout contract readers and writers share


def spec_meta_file(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_spec.json")


def write_spec_meta(lake_dir: str, spec) -> None:
    """Persist the layout-critical TableSpec fields so later sessions (and
    the CLI) cannot silently apply the wrong policy or partition count —
    an LWW replay against a history lake would collapse every superseded
    version; a different num_partitions would orphan rows."""
    write_json_atomic(
        get_storage(lake_dir),
        spec_meta_file(lake_dir),
        {
            "merge_policy": spec.merge_policy,
            "num_partitions": spec.num_partitions,
            "key_cols": list(spec.key_cols),
            "version_cols": list(spec.version_cols),
            "partition_key": spec.partition_key,
        },
    )


def read_spec_meta(lake_dir: str) -> dict | None:
    return read_json(get_storage(lake_dir), spec_meta_file(lake_dir))
