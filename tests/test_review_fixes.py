"""Regression tests for review findings: compact watermark semantics,
large_string hashing, content-hash sensitivity, as_of integrity, null-key
validation, lossless schema registry."""

import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import compact, read_lake, replay
from raycdc.partition import add_part_key, add_salt_key, hash_strings
from raycdc.schema import CHANGELOG_SCHEMA, TableSpec
from raycdc.sink import content_hash, part_file, read_lake_schema, update_lake_schema


def _log(rows):
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "lsn", "seg_id"]
    data = [dict(zip(cols, r)) for r in rows]
    for d in data:
        d["ts"] = datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=d["ts"])
    return pa.Table.from_pylist(data, schema=CHANGELOG_SCHEMA)


def test_compact_watermark_protects_out_of_order_ts(ray_session, tmp_path):
    """A tombstone newer (by ts) than the watermark survives compaction and
    still beats a later-lsn/older-ts row — the resurrection scenario."""
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=2)
    # insert(ts=50) then delete(ts=100)
    replay(
        ray.data.from_arrow(
            _log(
                [
                    ["c1", 0, "user", "first", "", 50, "insert", 1, 0],
                    ["c1", 0, "user", "", "", 100, "delete", 2, 0],
                ]
            )
        ),
        lake,
        spec,
    )
    # watermark BELOW the delete's ts → tombstone kept
    compact(lake, spec, watermark=datetime.datetime(2024, 1, 1, 0, 0, 40))
    # future segment: higher lsn but OLDER ts than the delete
    replay(
        ray.data.from_arrow(
            _log([["c1", 0, "user", "stale-update", "", 70, "update", 3, 0]])
        ),
        lake,
        spec,
    )
    assert read_lake(lake, spec).count() == 0  # delete still wins


def test_compact_no_watermark_drops_all_tombstones(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=2)
    t = synthetic_changelog(n_events=400, seed=96, p_delete=0.3)
    replay(ray.data.from_arrow(t), lake, spec)
    lineage = compact(lake, spec)  # watermark=None → drop everything
    assert sum(lineage["tombstones"].to_pylist()) > 0


def test_hash_strings_large_string_consistent():
    vals = ["conv-1", "conv-42", "x" * 50, ""]
    small = pa.array(vals, pa.string())
    large = pa.array(vals, pa.large_string())
    assert (hash_strings(small) == hash_strings(large)).all()


def test_content_hash_distinguishes_column_swaps():
    a = pa.table(
        {"conv_id": ["c"], "turn_idx": pa.array([5], pa.int64()), "lsn": pa.array([9], pa.int64())}
    )
    b = pa.table(
        {"conv_id": ["c"], "turn_idx": pa.array([9], pa.int64()), "lsn": pa.array([5], pa.int64())}
    )
    assert content_hash(a) != content_hash(b)
    # row order insensitivity still holds
    two = pa.table(
        {
            "conv_id": ["c", "d"],
            "turn_idx": pa.array([1, 2], pa.int64()),
            "lsn": pa.array([3, 4], pa.int64()),
        }
    )
    rev = two.take(pa.array([1, 0]))
    assert content_hash(two) == content_hash(rev)


def test_content_hash_large_string_no_crash():
    t = pa.table(
        {
            "conv_id": pa.array(["conv-1"], pa.large_string()),
            "turn_idx": pa.array([1], pa.int64()),
            "lsn": pa.array([2], pa.int64()),
        }
    )
    assert content_hash(t) != 0


def test_as_of_missing_file_raises(ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=2)
    replay(ray.data.from_arrow(synthetic_changelog(n_events=200, seed=97)), lake, spec)
    from raycdc.sink import list_snapshots, read_snapshot

    snap = list_snapshots(lake)[0]
    part, version = next(iter(read_snapshot(lake, snap).items()))
    os.remove(part_file(lake, part, version))
    with pytest.raises(FileNotFoundError, match="missing partition file"):
        read_lake(lake, spec, as_of=snap).count()


def test_null_lsn_fails_fast(ray_session, tmp_path):
    t = synthetic_changelog(n_events=50, seed=98)
    lsn = t["lsn"].to_pylist()
    lsn[3] = None
    t = t.set_column(t.schema.get_field_index("lsn"), "lsn", pa.array(lsn, pa.int64()))
    with pytest.raises(Exception, match="null lsn"):
        replay(ray.data.from_arrow(t), str(tmp_path / "lake"), TableSpec(num_partitions=2))


def test_null_salt_key_fails_fast():
    t = pa.table(
        {
            "conv_id": ["a", "b"],
            "turn_idx": pa.array([1, None], pa.int32()),
        }
    )
    t = add_part_key(t, num_partitions=4)
    with pytest.raises(ValueError, match="non-null"):
        add_salt_key(t, salt_col="turn_idx", num_salts=4)


def test_schema_registry_roundtrips_exotic_types(tmp_path):
    """tz-aware timestamps / decimals round-trip losslessly and a second
    update does not explode in widen_type."""
    import pyarrow.parquet as pq

    lake = str(tmp_path / "lake")
    os.makedirs(os.path.join(lake, "part=00000"), exist_ok=True)
    t = pa.table(
        {
            "conv_id": pa.array(["a"], pa.string()),
            "ts_tz": pa.array(
                [datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)],
                pa.timestamp("us", tz="UTC"),
            ),
            "d": pa.array([datetime.date(2024, 1, 1)]),
        }
    )
    from raycdc.sink import write_checkpoint, write_partition_atomic

    write_partition_atomic(t, lake, 0, version=0)
    write_checkpoint(lake, 0, {"max_lsn": 1, "row_count": 1, "content_hash": 0, "version": 0})
    s1 = update_lake_schema(lake, parts=[0])
    got = read_lake_schema(lake)
    assert got.field("ts_tz").type == pa.timestamp("us", tz="UTC")
    assert got.field("d").type == t.schema.field("d").type
    # second update folds the registered schema back in without error
    s2 = update_lake_schema(lake, parts=[0])
    assert s2.equals(s1)
