"""Storage-interface tests: the lake through a file:// URI (fsspec backend)
must behave byte-identically to the plain-path POSIX backend, and segment
extraction must accept non-local URI schemes (the remote object-reader
analog of /root/reference/extractor.go:16-37)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import read_lake, replay
from raycdc.schema import TableSpec
from raycdc.sink import current_files, read_all_checkpoints, write_snapshot
from raycdc.storage import FsspecStorage, LocalStorage, get_storage


def test_get_storage_resolves_by_scheme():
    assert isinstance(get_storage("/tmp/x"), LocalStorage)
    st = get_storage("file:///tmp/x")
    assert isinstance(st, FsspecStorage)
    st2 = get_storage("memory://lake")
    assert isinstance(st2, FsspecStorage)


def test_storage_atomic_publish_roundtrip(tmp_path):
    for st, root in (
        (get_storage(str(tmp_path)), str(tmp_path / "a")),
        (get_storage("file://" + str(tmp_path)), "file://" + str(tmp_path / "b")),
        (get_storage("memory://t"), "memory://t/c"),
    ):
        p = root + "/sub/obj.json"
        st.write_bytes_atomic(p, b'{"k": 1}')
        assert st.exists(p)
        assert st.read_bytes(p) == b'{"k": 1}'
        assert st.listdir(root + "/sub") == ["obj.json"]
        t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
        pp = root + "/sub/t.parquet"
        st.write_parquet_atomic(t, pp)
        assert st.read_parquet(pp).equals(t)
        assert st.read_parquet_schema(pp).equals(t.schema)
        st.remove(p)
        assert not st.exists(p)


def test_replay_through_file_uri_matches_plain_path(ray_session, tmp_path):
    """Same changelog replayed into a plain-path lake and a file:// lake:
    identical live state, checkpoints, and snapshot mechanics."""
    t = synthetic_changelog(n_events=800, seed=31, shuffle=True)
    spec = TableSpec(num_partitions=4)
    plain = str(tmp_path / "lake_plain")
    uri = "file://" + str(tmp_path / "lake_uri")

    replay(ray.data.from_arrow(t), plain, spec)
    replay(ray.data.from_arrow(t), uri, spec)

    df_p = read_lake(plain, spec).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    df_u = read_lake(uri, spec).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert df_p.equals(df_u)

    ck_p, ck_u = read_all_checkpoints(plain), read_all_checkpoints(uri)
    assert {k: v["max_lsn"] for k, v in ck_p.items()} == {
        k: v["max_lsn"] for k, v in ck_u.items()
    }
    assert {k: v["content_hash"] for k, v in ck_p.items()} == {
        k: v["content_hash"] for k, v in ck_u.items()
    }

    # redelivery through the URI is still a no-op
    lin2 = replay(ray.data.from_arrow(t), uri, spec)
    assert set(lin2["status"].to_pylist()) == {"noop"}

    # snapshots + time travel through the URI
    sid = write_snapshot(uri)
    assert read_lake(uri, spec, as_of=sid).count() == read_lake(uri, spec).count()
    assert len(current_files(uri)) == len(current_files(plain))


def test_read_segments_accepts_uri_scheme(ray_session, tmp_path):
    """read_segments (the extractor) must take object-store URIs, not just
    local paths — exercised with file:// (the scheme machinery is identical
    for s3://gs:// once the backend is installed)."""
    from raycdc.parsers import read_segments

    payload = b"h1,h2\na,1\nb,2\n"
    segs = []
    for i in range(3):  # MULTIPLE URIs — the exact shape that trips Ray
        seg = tmp_path / f"seg-{i:03d}.csv"
        seg.write_bytes(payload)
        segs.append("file://" + str(seg))
    ds = read_segments(segs)
    rows = ds.take_all()
    assert len(rows) == 3  # one {bytes, path} row per segment file
    assert all(r["bytes"] == payload for r in rows)
    assert sorted(r["path"].rsplit("/", 1)[-1] for r in rows) == [
        "seg-000.csv",
        "seg-001.csv",
        "seg-002.csv",
    ]


def test_missing_uri_lake_raises_cleanly(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_lake("file://" + str(tmp_path / "nope"), TableSpec(num_partitions=4))


def test_tail_and_dead_letter_through_file_uri(ray_session, tmp_path):
    """tail_once + dead-letter parking both work on file:// URIs: journal
    append-read roundtrip, new-segment detection, parked-batch readback."""
    import pyarrow.compute as pc

    from raycdc.engine import read_dead_letters, replay, tail_once

    log = synthetic_changelog(n_events=400, n_convs=10, seed=41)
    watch = tmp_path / "wal"
    watch.mkdir()
    for seg in range(2):
        part = log.filter(pc.equal(log["seg_id"], seg))
        pq.write_table(part, watch / f"seg-{seg:03d}.parquet")

    lake_uri = "file://" + str(tmp_path / "lake")
    watch_uri = "file://" + str(watch)
    spec = TableSpec(num_partitions=4)
    new, lineage = tail_once(watch_uri, lake_uri, spec)
    assert len(new) == 2 and lineage is not None
    # second round: nothing new (journal read back through the URI)
    new2, lin2 = tail_once(watch_uri, lake_uri, spec)
    assert new2 == [] and lin2 is None
    # a third segment appears
    part = log.filter(pc.equal(log["seg_id"], 2))
    pq.write_table(part, watch / "seg-002.parquet")
    new3, _ = tail_once(watch_uri, lake_uri, spec)
    assert len(new3) == 1 and new3[0].endswith("seg-002.parquet")

    # dead-letter parking through a URI dir
    dl_uri = "file://" + str(tmp_path / "dl")

    def bad(batch):
        raise ValueError("poison")

    replay(
        ray.data.read_parquet([str(watch / "seg-000.parquet")]),
        "file://" + str(tmp_path / "lake2"),
        spec,
        projector=bad,
        dead_letter_dir=dl_uri,
    )
    parked = read_dead_letters(dl_uri)
    assert parked is not None and len(parked) > 0


def test_compact_and_vacuum_through_file_uri(ray_session, tmp_path):
    """Tombstone GC + snapshot vacuum over a file:// lake — the full
    maintenance lifecycle through the fsspec backend."""
    from raycdc.engine import compact, read_lake
    from raycdc.sink import list_snapshots, vacuum

    log = synthetic_changelog(n_events=1000, seed=43, p_delete=0.25)
    uri = "file://" + str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(log), uri, spec)
    before = read_lake(uri, spec).count()
    sid = write_snapshot(uri)
    lineage = compact(uri, spec)
    assert sum(lineage["tombstones"].to_pylist()) > 0
    assert read_lake(uri, spec).count() == before
    # old (pre-compact) snapshot still readable, then vacuumed away
    assert read_lake(uri, spec, as_of=sid).count() == before
    write_snapshot(uri)
    removed = vacuum(uri, keep_snapshots=1)
    assert removed > 0
    assert list_snapshots(uri)[-1] > sid


def test_object_store_semantics_apply_checkpoint_snapshot_vacuum():
    """Drive the engine's own apply/checkpoint/snapshot/vacuum functions
    against an fsspec memory:// lake — a PUT-semantics object store with
    NO rename (FsspecStorage takes the single-PUT publish path and the
    read-modify-write append path).  Tightens the S2 cloud-backend
    contract (/root/reference/extractor.go:16-37) beyond file://: every
    metadata primitive the apply path uses must hold under object-store
    semantics.  (memory:// is per-process, so this exercises the
    driver-side contract directly, without Ray tasks.)"""
    import uuid as _uuid

    import pyarrow.compute as pc

    from raycdc.engine import _make_apply_fn
    from raycdc.partition import PART_KEY, add_part_key
    from raycdc.sink import (
        list_snapshots,
        read_checkpoint,
        read_partition,
        read_snapshot,
        vacuum,
    )

    lake = f"memory://lake-{_uuid.uuid4().hex}"
    spec = TableSpec(num_partitions=2)
    apply_fn = _make_apply_fn(lake, spec)

    log = synthetic_changelog(n_events=300, seed=5, p_delete=0.1)
    tagged = add_part_key(log, key_col="conv_id", num_partitions=2)
    groups = [tagged.filter(pc.equal(tagged[PART_KEY], p)) for p in (0, 1)]

    lineage = [apply_fn(g) for g in groups if len(g)]
    assert all(row["status"][0].as_py() == "applied" for row in lineage)
    for p in (0, 1):
        ck = read_checkpoint(lake, p)
        assert ck is not None and ck["version"] == 0
        t = read_partition(lake, p)
        assert t is not None and len(t) == ck["row_count"]

    # redelivery: checkpoint filter answers from metadata, no rewrite
    noop = apply_fn(groups[0])
    assert noop["status"][0].as_py() == "noop"

    # snapshot + a second apply advances versions; vacuum prunes the old one
    snap0 = write_snapshot(lake)
    assert read_snapshot(lake, snap0) == {0: 0, 1: 0}
    more = synthetic_changelog(n_events=420, seed=6)
    more = more.filter(pc.greater(more["lsn"], 300))
    tagged2 = add_part_key(more, key_col="conv_id", num_partitions=2)
    apply_fn(tagged2.filter(pc.equal(tagged2[PART_KEY], 0)))
    assert read_checkpoint(lake, 0)["version"] == 1
    write_snapshot(lake)
    removed = vacuum(lake, keep_snapshots=1)
    assert removed >= 1  # snap0 + the version-0 file of partition 0
    assert read_snapshot(lake, snap0) is None
    assert read_partition(lake, 0, version=0) is None
    assert read_partition(lake, 0, version=1) is not None
    assert snap0 not in list_snapshots(lake)
