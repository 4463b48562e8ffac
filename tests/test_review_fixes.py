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


def test_compact_watermark_missing_ts_col_skips(ray_session, tmp_path):
    """watermark given but the stored partition has no ts column → the
    partition is SKIPPED (status='skipped'), never silently GC'd unbounded."""
    lake = str(tmp_path / "lake")
    no_ts = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("text", pa.string()),
        ]
    )
    spec = TableSpec(
        schema=no_ts, version_cols=("lsn",), num_partitions=2, sort_cols=("conv_id",)
    )
    log = pa.table(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "text": ["hello", ""],
            "op": ["insert", "delete"],
            "lsn": pa.array([1, 2], pa.int64()),
            "seg_id": pa.array([0, 0], pa.int32()),
        }
    )
    replay(ray.data.from_arrow(log), lake, spec)
    # ts_col = version_cols[0] = 'lsn'?? no: build a spec whose ts col is absent
    spec_wm = TableSpec(
        schema=no_ts, version_cols=("ts", "lsn"), num_partitions=2,
        sort_cols=("conv_id",),
    )
    lineage = compact(lake, spec_wm, watermark=datetime.datetime(2024, 1, 1))
    statuses = set(lineage["status"].to_pylist())
    assert statuses <= {"skipped"}
    assert sum(lineage["tombstones"].to_pylist()) == 0
    # the tombstone is still there
    assert read_lake(lake, spec, with_tombstones=True).count() == 1


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


# --- second review round ---------------------------------------------------


def test_sessionize_handles_non_us_timestamps(ray_session):
    import numpy as np

    from raycdc.relational import sessionize

    base = np.datetime64("2024-01-01T00:00:00", "ns")
    mins = np.array([0, 5, 70], dtype="timedelta64[m]").astype("timedelta64[ns]")
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array(base + mins, pa.timestamp("ns")),
            "event_id": pa.array([0, 1, 2], pa.int64()),
        }
    )
    out = (
        sessionize(ray.data.from_arrow(t), gap_seconds=1800, num_partitions=2)
        .to_pandas()
        .sort_values("event_id")
    )
    # 5-min gap same session, 65-min gap splits — regardless of ns unit
    assert out["session_idx"].tolist() == [0, 0, 1]


def test_lang_id_large_string_consistent():
    from raycdc.text import lang_id

    texts = ["the quick brown fox jumps over the lazy dog", "eeee nnnn ssss"]
    small = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(texts, pa.string())})
    large = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(texts, pa.large_string())})
    assert lang_id(small).equals(lang_id(large))


def test_decode_segment_header_only_files():
    from raycdc.parsers import DecodeSpec, decode_segment

    spec = DecodeSpec(skip_leading_rows=1, column_names=("a", "b"))
    # exactly one (header) row in every format → empty, not a crash
    t1 = decode_segment(b"a,b\n", "p.csv", spec)
    assert len(t1) == 0 and t1.column_names[:2] == ["a", "b"]
    t2 = decode_segment(
        b"x,y\n", "p.csv", DecodeSpec(skip_leading_rows=1, lazy_quotes=True,
                                      column_names=("a", "b"))
    )
    assert len(t2) == 0
    t3 = decode_segment(
        b'{"a": 1}\n', "p.jsonl",
        DecodeSpec(format="jsonl", skip_leading_rows=1, column_names=("a",)),
    )
    assert len(t3) == 0
    # unnamed empty segment fails fast with a clear message
    with pytest.raises(ValueError, match="column_names"):
        decode_segment(b"", "p.csv", DecodeSpec())


def test_hash_sample_matches_train_split_cutoffs():
    from raycdc.ops import hash_sample, train_split

    t = pa.table({"k": pa.array(range(50_000), pa.int64())})
    for frac in (0.043, 0.1, 0.8):
        sampled = set(hash_sample(t, "k", frac)["k"].to_pylist())
        split = train_split(t, "k", fractions={"in": frac, "out": 1 - frac})
        in_keys = {
            k for k, s in zip(split["k"].to_pylist(), split["split"].to_pylist())
            if s == "in"
        }
        assert sampled == in_keys, f"cutoff drift at fraction {frac}"


def test_exact_dedup_null_texts_group(ray_session):
    from raycdc.dedup import exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["x", None, None, "x"]),
        }
    )
    out = exact_dedup(ray.data.from_arrow(t), num_partitions=2).to_pandas()
    # SQL GROUP BY: one row for 'x' (id 1), one for NULL (id 2)
    assert sorted(out["doc_id"].tolist()) == [1, 2]


def test_knn_ties_broken_by_vec_id(ray_session):
    import numpy as np

    from raycdc import similarity as S

    # 40 identical vectors with shuffled ids — top-5 must be the 5 SMALLEST
    # ids regardless of batch/argpartition order
    rng = np.random.default_rng(7)
    ids = rng.permutation(40).astype(np.int64)
    vec = np.ones((40, 8), dtype=np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vec.reshape(-1)), 8
            ),
        }
    )
    q = np.ones((1, 8))
    res = (
        S.knn_brute_force(ray.data.from_arrow(t), q, np.array([99]), k=5)
        .to_pandas()
        .sort_values("rank")
    )
    assert res["vec_id"].tolist() == [0, 1, 2, 3, 4]


def test_simhash_hot_bucket_capped_not_dropped(ray_session):
    from raycdc import dedup as D

    # >512 identical docs: the hot chunk bucket must still yield pairs
    texts = ["same words everywhere forever"] * 600
    t = pa.table(
        {"doc_id": pa.array(range(600), pa.int64()), "text": pa.array(texts)}
    )
    sigs = ray.data.from_arrow(t).map_batches(
        D.simhash_signatures, batch_format="pyarrow"
    )
    pairs = D.simhash_candidate_pairs(sigs, num_partitions=4).to_pandas()
    assert len(pairs) > 0
    assert (pairs["hamming"] == 0).all()


def test_broadcast_join_rejects_bad_how():
    from raycdc.relational import broadcast_join

    with pytest.raises(ValueError, match="how"):
        broadcast_join(None, pa.table({"k": [1]}), "k", [], how="outer")


def test_read_lake_null_op_rows_are_live(ray_session, tmp_path):
    """A lake row with a NULL op column (e.g. written by an evolved schema)
    is a live row, not a tombstone: not_equal(null, 'delete') is null and a
    bare filter would silently drop it."""
    import pyarrow.parquet as pq

    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=2)
    replay(
        ray.data.from_arrow(
            _log(
                [
                    ["c1", 0, "user", "keep-me", "", 10, "insert", 1, 0],
                    ["c2", 0, "user", "gone", "", 10, "delete", 2, 0],
                    ["c2", 0, "user", "gone", "", 5, "insert", 1, 0],
                ]
            )
        ),
        lake,
        spec,
    )
    # null out op in every stored partition file (simulating a writer that
    # predates the op column)
    for part in sorted(os.listdir(lake)):
        pdir = os.path.join(lake, part)
        if not part.startswith("part=") or not os.path.isdir(pdir):
            continue
        for f in os.listdir(pdir):
            if f.startswith("data-"):
                p = os.path.join(pdir, f)
                t = pq.read_table(p)
                i = t.schema.get_field_index("op")
                # null out op on LIVE rows only (tombstones keep theirs):
                # null op must read as live, not as delete
                nulled = pc.if_else(
                    pc.equal(t["op"], "delete"),
                    t["op"],
                    pa.nulls(len(t), t.schema.field("op").type),
                )
                t = t.set_column(i, "op", nulled)
                pq.write_table(t, p)
    out = read_lake(lake, spec).to_pandas()
    assert list(out["conv_id"]) == ["c1"]  # live row survives a null op


def test_repetition_stats_null_text_yields_null_stats():
    """Null text must produce NULL stats (SQL semantics), never a wrapped
    INT64_MIN from a NaN length cast."""
    from raycdc.text import repetition_stats

    b = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b a b", None, "x y"]),
        }
    )
    out = repetition_stats(b)
    assert out["n_bigrams"].to_pylist() == [3, None, 1]
    assert out["n_uniq_bigrams"].to_pylist() == [2, None, 1]
    assert out["dup_bigram_ratio"].to_pylist()[1] is None
    assert out["dup_bigram_ratio"][0].as_py() > 0


def test_asof_tiebreak_int64_exact_and_type_guard(ray_session):
    """Integer tiebreaks beyond 2^53 must stay exact (no float64 collapse),
    and a non-orderable tiebreak type fails fast at the API boundary."""
    import datetime as dt

    from raycdc.relational import asof_join

    big = 9007199254740992  # 2^53
    left = pa.table(
        {
            "k": pa.array(["u"]),
            "ts": pa.array([dt.datetime(2024, 1, 1, 0, 0, 30)], pa.timestamp("us")),
            "eid": pa.array([1], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(["u", "u"]),
            "ts": pa.array([dt.datetime(2024, 1, 1)] * 2, pa.timestamp("us")),
            "v": pa.array([big + 1, big + 2], pa.int64()),
        }
    )
    out = asof_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        on="k",
        ts_col="ts",
        right_cols=("v",),
        num_partitions=2,
        right_tiebreak="v",
        l_schema=left.schema,
        r_schema=right.schema,
    ).to_pandas()
    assert out["r_v"].tolist() == [big + 2]  # adjacent at float64 precision

    with pytest.raises(ValueError, match="unsupported type"):
        asof_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right.set_column(2, "v", pa.array(["a", "b"]))),
            on="k",
            ts_col="ts",
            right_cols=("v",),
            right_tiebreak="v",
            l_schema=left.schema,
            r_schema=pa.schema(
                [("k", pa.string()), ("ts", pa.timestamp("us")), ("v", pa.string())]
            ),
        )
