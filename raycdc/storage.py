"""Pluggable lake storage: atomic-publish file IO behind one interface.

The lake layout (``sink.py``) needs five primitives: read bytes, list,
exists, remove, and — the load-bearing one — PUBLISH ATOMICALLY: a reader
must only ever observe a complete old or complete new object at a path,
never a torn one.  How that's achieved differs by backend:

* **POSIX / shared filesystem** (:class:`LocalStorage`): write a temp file
  in the destination directory, then ``os.replace`` (atomic rename on the
  same filesystem).  This is the contract the sink was born with — on a
  real multi-node cluster it requires an NFS-like shared mount.
* **Object stores via fsspec** (:class:`FsspecStorage`): a single PUT is
  already atomic on S3/GCS-class stores (readers see the old or the new
  object, never a partial), so publish is one ``pipe_file``.  For
  rename-capable fsspec backends (``file://``, ``local``) the temp+mv path
  is used instead, because a plain local write IS observable half-done.

Multi-writer note: the layout needs no cross-file transactions — data
files are versioned (``data-v{N}.parquet``; a version is only visible once
the checkpoint names it) and each tiny checkpoint JSON has exactly one
writer (the engine partitions applies by ``part``), so atomic
single-object publish suffices on every backend.

Consistency requirements per backend class (race-tested in
tests/test_storage_races.py):

* **All backends** — atomic single-object visibility (reader sees old or
  new, never torn) and read-after-write consistency on the lake prefix
  (S3 provides both since 2020; POSIX rename gives them natively).
  Listing may lag writes (S3 lists are only eventually exhaustive under
  heavy churn) — the layout tolerates that because every read resolves
  via checkpoints, never via listing.
* **Per-partition single writer AT A TIME** — the apply path is
  read-checkpoint → merge → publish data-v(N+1) → publish checkpoint,
  with no compare-and-swap.  Two writers racing DIFFERENT batches into
  the SAME partition can interleave those steps and the loser's rows
  silently vanish under the winner's checkpoint; the engine guarantees
  the one-writer-per-partition discipline (one replay per lake at a
  time; Ray's groupby gives each partition to exactly one task).  Racing
  the SAME batch (duplicate delivery, crash-retry) is safe on every
  backend: both writers derive byte-identical files and an identical
  checkpoint, so any interleaving converges — pinned by the race tests.
* **Journal appends are single-appender** — object-store ``append_bytes``
  is read-modify-write (no append primitive), so concurrent appenders
  can lose entries; run ONE tail process per lake.  A lost journal entry
  is re-delivery, not corruption (checkpoints make the re-replay a
  no-op), but the discipline keeps the journal an honest WAL record.

Resolution is by URI scheme: plain paths → :class:`LocalStorage`;
``scheme://...`` → :class:`FsspecStorage` (whatever fsspec has installed:
``file``, ``memory``, ``s3``, ``gcs``...).  Library code asks
:func:`get_storage` once per lake path and never touches ``os`` directly.
"""

from __future__ import annotations

import io
import json
import os
import uuid
from typing import Protocol

import pyarrow as pa
import pyarrow.parquet as pq


class Storage(Protocol):
    """What the lake sink needs from a backing store."""

    def exists(self, path: str) -> bool: ...

    def isdir(self, path: str) -> bool: ...

    def listdir(self, path: str) -> list[str]:
        """Basenames of entries under ``path`` ([] if absent)."""
        ...

    def makedirs(self, path: str) -> None: ...

    def remove(self, path: str) -> None: ...

    def remove_tree(self, path: str) -> None:
        """Remove a file or directory tree (no-op if absent)."""
        ...

    def read_bytes(self, path: str) -> bytes: ...

    def size(self, path: str) -> int:
        """File size in bytes (storage census; raises if absent)."""
        ...

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        """Publish ``data`` at ``path`` atomically (old-or-new, never torn)."""
        ...

    def append_bytes(self, path: str, data: bytes) -> None:
        """Durably append to a journal file (created if absent)."""
        ...

    def read_parquet(self, path: str, columns=None) -> pa.Table: ...

    def read_parquet_schema(self, path: str) -> pa.Schema: ...

    def write_parquet_atomic(self, table: pa.Table, path: str, **kwargs) -> None: ...


class LocalStorage:
    """POSIX implementation — temp file + ``os.replace`` publish.

    Cluster contract: every node applying partitions must see the SAME
    filesystem at the lake path (NFS-like shared mount); rename atomicity
    is per-filesystem, so the temp file is created next to its target.
    """

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path) if os.path.isdir(path) else []

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        os.remove(path)

    def remove_tree(self, path: str) -> None:
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    @staticmethod
    def _publish(tmp: str, path: str) -> None:
        """fsync-then-rename: without the data fsync the rename can become
        durable BEFORE the data blocks on ext4/xfs, and a power loss
        publishes an empty/torn file at the final path — exactly the state
        the atomic contract forbids.  The directory fsync makes the rename
        itself durable."""
        try:
            with open(tmp, "rb") as f:
                os.fsync(f.fileno())
            os.replace(tmp, path)
            dfd = os.open(os.path.dirname(path), os.O_DIRECTORY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        try:
            with open(tmp, "wb") as f:
                f.write(data)
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        self._publish(tmp, path)

    def append_bytes(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "ab") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())

    def read_parquet(self, path: str, columns=None) -> pa.Table:
        return pq.read_table(path, columns=columns)

    def read_parquet_schema(self, path: str) -> pa.Schema:
        return pq.read_schema(path)

    def write_parquet_atomic(self, table: pa.Table, path: str, **kwargs) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.parquet")
        try:
            pq.write_table(table, tmp, **kwargs)
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        self._publish(tmp, path)


class FsspecStorage:
    """fsspec-backed implementation (object stores, ``file://``, memory).

    Object-store publish is a single PUT (atomic by store semantics);
    rename-capable backends (local/file) go through temp+mv because local
    writes are observable half-done.
    """

    def __init__(self, fs) -> None:
        self.fs = fs
        proto = fs.protocol if isinstance(fs.protocol, str) else fs.protocol[0]
        self._renames = proto in ("file", "local")

    def _p(self, path: str) -> str:
        """URI → fs-native path (fsspec methods want scheme-less paths)."""
        return self.fs._strip_protocol(path)

    def exists(self, path: str) -> bool:
        return self.fs.exists(self._p(path))

    def isdir(self, path: str) -> bool:
        return self.fs.isdir(self._p(path))

    def listdir(self, path: str) -> list[str]:
        p = self._p(path)
        if not self.fs.isdir(p):
            return []
        return [e.rstrip("/").rsplit("/", 1)[-1] for e in self.fs.ls(p, detail=False)]

    def makedirs(self, path: str) -> None:
        self.fs.makedirs(self._p(path), exist_ok=True)

    def remove(self, path: str) -> None:
        self.fs.rm(self._p(path))

    def remove_tree(self, path: str) -> None:
        p = self._p(path)
        if self.fs.exists(p):
            self.fs.rm(p, recursive=True)

    def read_bytes(self, path: str) -> bytes:
        return self.fs.cat_file(self._p(path))

    def size(self, path: str) -> int:
        return int(self.fs.size(self._p(path)))

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        p = self._p(path)
        parent = p.rsplit("/", 1)[0]
        self.fs.makedirs(parent, exist_ok=True)
        if self._renames:
            tmp = f"{parent}/.tmp-{uuid.uuid4().hex}"
            self.fs.pipe_file(tmp, data)
            self.fs.mv(tmp, p)
        else:
            self.fs.pipe_file(p, data)  # single PUT: atomic on object stores

    def append_bytes(self, path: str, data: bytes) -> None:
        # object stores have no append: read-modify-write, published
        # atomically.  O(journal size) per call — acceptable for the tiny
        # segment journal; heavy appenders should shard files instead.
        p = self._p(path)
        old = self.fs.cat_file(p) if self.fs.exists(p) else b""
        self.write_bytes_atomic(path, old + data)

    def read_parquet(self, path: str, columns=None) -> pa.Table:
        return pq.read_table(self._p(path), filesystem=self.fs, columns=columns)

    def read_parquet_schema(self, path: str) -> pa.Schema:
        with self.fs.open(self._p(path), "rb") as f:
            return pq.read_schema(f)

    def write_parquet_atomic(self, table: pa.Table, path: str, **kwargs) -> None:
        buf = io.BytesIO()
        pq.write_table(table, buf, **kwargs)
        self.write_bytes_atomic(path, buf.getvalue())


_LOCAL = LocalStorage()


def get_storage(path: str) -> Storage:
    """Storage for a lake path: ``scheme://`` → fsspec, else local POSIX."""
    if "://" in path:
        import fsspec

        scheme = path.split("://", 1)[0]
        return FsspecStorage(fsspec.filesystem(scheme))
    return _LOCAL


def resolve_uri_paths(paths: list[str]) -> tuple[list[str], "object | None"]:
    """(scheme-less paths, pyarrow filesystem) for Ray readers.

    Ray's ``read_parquet``/``read_binary_files`` mishandle a LIST of URIs:
    only the first path's scheme is stripped during filesystem resolution
    and the rest reach the resolved filesystem still scheme-prefixed
    (ArrowInvalid 'Expected a local filesystem path, got a URI').  Resolve
    the filesystem from the first URI ourselves and hand Ray plain paths +
    the filesystem object.  Plain paths pass through with fs=None."""
    schemes = {p.split("://", 1)[0] if "://" in p else "" for p in paths}
    if len(schemes) > 1:
        # deciding from paths[0] alone would either pass later URIs
        # through unresolved (plain-first) or silently read them against
        # the WRONG filesystem (s3-first + gs later) — the exact failures
        # this helper exists to prevent
        raise ValueError(
            f"resolve_uri_paths: mixed path schemes {sorted(schemes)!r} — "
            "a read resolves ONE filesystem; split the list per scheme"
        )
    if not paths or "://" not in paths[0]:
        return list(paths), None
    import pyarrow.fs as pafs

    fs, _ = pafs.FileSystem.from_uri(paths[0])
    return [pafs.FileSystem.from_uri(p)[1] for p in paths], fs


def read_json(storage: Storage, path: str) -> dict | None:
    if not storage.exists(path):
        return None
    return json.loads(storage.read_bytes(path))


def write_json_atomic(storage: Storage, path: str, payload: dict) -> None:
    storage.write_bytes_atomic(path, json.dumps(payload, sort_keys=True).encode())
