"""Regression pins for the round-3 continuation review findings:
batch_lsn misuse in the incremental dedup paths must fail fast (silent
index stagnation otherwise), zero-shingle docs must not SimHash-pair,
and degenerate LSH band counts must be rejected."""

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from raycdc import dedup as D


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows),
            }
        )
    )


def test_incremental_dedup_requires_batch_lsn(ray_session, tmp_path):
    with pytest.raises(ValueError, match="batch_lsn is required"):
        D.incremental_dedup(_docs(["a b c"]), str(tmp_path / "idx"))


def test_incremental_dedup_rejects_stale_batch_lsn(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    D.incremental_dedup(_docs(["alpha beta"]), idx, batch_lsn=5, num_partitions=4)
    with pytest.raises(ValueError, match="behind the index position"):
        D.incremental_dedup(_docs(["gamma delta"]), idx, batch_lsn=4, num_partitions=4)
    # reusing the CURRENT position (crash-retry of the same batch) stays legal
    D.incremental_dedup(_docs(["alpha beta"]), idx, batch_lsn=5, num_partitions=4)


def test_incremental_near_dedup_lsn_guards(ray_session, tmp_path):
    idx = str(tmp_path / "nidx")
    text = "the quick brown fox jumps over the lazy dog " * 3
    with pytest.raises(ValueError, match="batch_lsn is required"):
        D.incremental_near_dedup(_docs([text]), idx)
    D.incremental_near_dedup(_docs([text]), idx, batch_lsn=10, num_partitions=4)
    with pytest.raises(ValueError, match="behind the index position"):
        D.incremental_near_dedup(
            _docs([text + " tail"]), idx, batch_lsn=3, num_partitions=4
        )


def test_simhash_zero_shingle_docs_never_pair(ray_session):
    """600 one-token docs (shorter than shingle_k=2 → zero shingles) all
    used to share the all-zero signature and pair at hamming 0."""
    t = pa.table(
        {
            "doc_id": pa.array(range(600), pa.int64()),
            "text": pa.array([f"w{i}" for i in range(600)]),
        }
    )
    sigs = ray.data.from_arrow(t).map_batches(
        D.simhash_signatures, batch_format="pyarrow"
    )
    pairs = D.simhash_candidate_pairs(sigs, num_partitions=4).take_all()
    assert pairs == []


def test_simhash_real_docs_still_pair(ray_session):
    base = "the quick brown fox jumps over the lazy dog"
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([base, base, "completely different words here"]),
        }
    )
    sigs = ray.data.from_arrow(t).map_batches(
        D.simhash_signatures, batch_format="pyarrow"
    )
    pairs = D.simhash_candidate_pairs(sigs, num_partitions=2).take_all()
    assert {(p["a"], p["b"]) for p in pairs} == {(0, 1)}
    assert all(p["hamming"] == 0 for p in pairs)


def test_lsh_band_rows_rejects_degenerate_bands():
    sig = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(np.arange(128, dtype=np.int64)), 128
            ),
        }
    )
    with pytest.raises(ValueError, match="must divide num_perm"):
        D.lsh_band_rows(sig, bands=200)
    with pytest.raises(ValueError, match="must divide num_perm"):
        D.lsh_band_rows(sig, bands=48)
    out = D.lsh_band_rows(sig, bands=32)  # valid divisor unchanged
    assert len(out) == 32


# ---------------------------------------------------------------------------
# engine/relational review fixes


def test_assemble_group_text_survives_null_role(ray_session):
    from raycdc.relational import assemble_group_text

    t = pa.table(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "text": ["hi", "there", "solo"],
            "role": pa.array(["user", None, "user"]),
        }
    )
    out = {
        r["conv_id"]: r
        for r in assemble_group_text(
            ray.data.from_arrow(t), role_col="role", num_partitions=2
        ).take_all()
    }
    assert out["a"]["transcript"] == "hi\nthere"
    assert out["a"]["n_user"] == 1  # the null role is not a user turn
    assert out["b"]["n_user"] == 1


def test_lookup_uses_persisted_layout_and_keeps_null_op(ray_session, tmp_path):
    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import lookup, replay
    from raycdc.schema import TableSpec

    t = synthetic_changelog(n_events=400, seed=81)
    lake = str(tmp_path / "lake128")
    replay(ray.data.from_arrow(t), lake, TableSpec(num_partitions=16))
    key = t["conv_id"][0].as_py()
    # caller passes a STALE partition count: the persisted meta must win
    got = lookup(lake, key, TableSpec(num_partitions=4))
    assert len(got) > 0
    assert set(got["conv_id"].to_pylist()) == {key}
    # a null op (schema-evolution padding) is a LIVE row
    import pyarrow.parquet as pq
    from raycdc.engine import hash_part
    from raycdc.sink import part_file, read_all_checkpoints

    part = hash_part(key, 16)
    path = part_file(lake, part, read_all_checkpoints(lake)[part]["version"])
    pt = pq.read_table(path)
    ops = pt["op"].to_pylist()
    ops[pt["conv_id"].to_pylist().index(key)] = None
    pt = pt.set_column(
        pt.schema.get_field_index("op"), "op", pa.array(ops, pa.string())
    )
    pq.write_table(pt, path)
    got2 = lookup(lake, key, TableSpec(num_partitions=16))
    assert len(got2) == len(got)  # the nulled-op row did not vanish


def test_asof_join_null_ts_and_null_key_never_match(ray_session):
    from raycdc.relational import asof_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["a", "a", None]),
                "ts": pa.array([10, None, 10], pa.timestamp("us")),
                "lv": [1, 2, 3],
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["a", "a", None]),
                "ts": pa.array([5, None, 5], pa.timestamp("us")),
                "rv": [100, 200, 300],
            }
        )
    )
    out = {
        r["lv"]: r
        for r in asof_join(
            left, right, on="k", ts_col="ts", right_cols=("rv",),
            num_partitions=2, how="left",
        ).take_all()
    }
    assert out[1]["r_rv"] == 100  # real match: ts 10 >= 5
    assert out[2]["r_rv"] is None  # null left ts matches nothing
    assert out[3]["r_rv"] is None  # null key matches nothing


def test_sessionize_null_and_large_entities(ray_session):
    from raycdc.relational import sessionize

    big = 2**53
    t = pa.table(
        {
            "user_id": pa.array([big, big + 1, None, None], pa.int64()),
            "ts": pa.array([0, 0, 0, 10_000_000_000], pa.timestamp("us")),
        }
    )
    rows = sessionize(
        ray.data.from_arrow(t), gap_seconds=1800, num_partitions=2
    ).take_all()
    by_ent = {}
    for r in rows:
        by_ent.setdefault(r["user_id"], []).append(r["session_idx"])
    # 2^53 and 2^53+1 are DISTINCT entities (no float collapse)
    assert by_ent[big] == [0] and by_ent[big + 1] == [0]
    # nulls group together (SQL PARTITION BY): second event is a new session
    assert sorted(by_ent[None]) == [0, 1]


def test_sequence_integrity_null_order_fails_fast_and_keeps_type(ray_session):
    from raycdc.relational import sequence_integrity

    ok = pa.table(
        {
            "conv_id": pa.array([7, 7, 8], pa.int64()),
            "turn_idx": pa.array([0, 2, 0], pa.int32()),
            "role": pa.array(["user", None, None]),
        }
    )
    out = sequence_integrity(
        ray.data.from_arrow(ok), num_partitions=2
    )
    tbl = out.to_arrow() if hasattr(out, "to_arrow") else out
    rows = {r["conv_id"]: r for r in out.take_all()}
    assert isinstance(rows[7]["conv_id"], int)  # int group type preserved
    assert rows[7]["n_gaps"] == 1
    assert rows[7]["n_adjacent_repeats"] == 0  # NULL = NULL is not a repeat

    bad = ok.set_column(
        1, "turn_idx", pa.array([0, None, 0], pa.int32())
    )
    with pytest.raises(Exception, match="must be non-null"):
        sequence_integrity(
            ray.data.from_arrow(bad), num_partitions=2
        ).take_all()


def test_sample_to_quota_null_stratum_is_a_stratum(ray_session):
    from raycdc.relational import sample_to_quota

    t = pa.table(
        {
            "src": pa.array(["a"] * 50 + [None] * 50),
            "doc_id": pa.array(range(100), pa.int64()),
        }
    )
    kept = sample_to_quota(
        ray.data.from_arrow(t), "src", "doc_id", quota=1000
    ).take_all()
    # both strata are under quota: EVERY row survives, nulls included
    assert len(kept) == 100


def test_standardize_huge_magnitudes_no_overflow(ray_session):
    from raycdc.relational import standardize

    v = 10_000_000_000  # v*v wraps int64
    t = pa.table(
        {
            "user_id": ["u"] * 3,
            "value": pa.array([v, v + 1, v + 2], pa.int64()),
        }
    )
    rows = sorted(
        standardize(ray.data.from_arrow(t), num_partitions=2).take_all(),
        key=lambda r: r["value"],
    )
    zs = [r["z"] for r in rows]
    assert all(z is not None for z in zs), zs
    import math

    sd = math.sqrt(2 / 3)
    assert abs(zs[0] - (-1 / sd)) < 1e-9 and abs(zs[2] - (1 / sd)) < 1e-9


def test_maintain_rollup_steady_state_is_metadata_only(ray_session, tmp_path):
    import datetime as dt

    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import maintain_rollup, replay
    from raycdc.schema import TableSpec

    lake = str(tmp_path / "src")
    roll = str(tmp_path / "roll")
    spec = TableSpec(num_partitions=4)
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=300, seed=82)),
        lake,
        spec,
    )

    def derive(t: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array(np.ones(len(t), dtype=np.int64))}
        )

    l1 = maintain_rollup(lake, roll, ("conv_id",), ("n",), spec, derive=derive)
    assert l1.num_rows > 0
    import glob

    files_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(roll, "**", "*"), recursive=True)
        if os.path.isfile(p) and "_feed_pos" not in p
    }
    l2 = maintain_rollup(lake, roll, ("conv_id",), ("n",), spec, derive=derive)
    assert l2.num_rows == 0  # no change -> empty lineage
    files_after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(roll, "**", "*"), recursive=True)
        if os.path.isfile(p) and "_feed_pos" not in p
    }
    assert files_after == files_before  # nothing re-applied, nothing touched


# ---------------------------------------------------------------------------
# text/similarity/merge review fixes


def test_redact_text_null_rows_count_zero():
    from raycdc.text import redact_text

    t = pa.table({"text": pa.array(["call 123-456-7890", None])})
    out = redact_text(t)
    assert out["n_redacted"][0].as_py() >= 1
    assert out["n_redacted"][1].as_py() == 0


def test_group_centroids_string_labels(ray_session):
    from raycdc.similarity import group_centroids

    t = pa.table(
        {
            "label": pa.array(["web", "web", "code"]),
            "embedding": pa.array(
                [[1.0, 0.0], [0.0, 1.0], [2.0, 2.0]],
                pa.list_(pa.float64()),
            ),
        }
    )
    rows = group_centroids(
        ray.data.from_arrow(t), num_partitions=2
    ).take_all()
    got = {(r["label"], r["idx"]): r["c"] for r in rows}
    assert got[("web", 0)] == 0.5 and got[("web", 1)] == 0.5
    assert got[("code", 0)] == 2.0 and got[("code", 1)] == 2.0


def test_knn_kernels_survive_empty_blocks(ray_session):
    from raycdc.similarity import knn_brute_force, knn_ivf, knn_lsh

    vecs = pa.table(
        {
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array(
                [[float(i), 1.0, 0.0, 0.5] for i in range(20)],
                pa.list_(pa.float64()),
            ),
        }
    )
    # over-partitioning a 20-row table guarantees some EMPTY blocks
    ds = ray.data.from_arrow(vecs).repartition(40)
    q = np.array([[1.0, 1.0, 0.0, 0.5]])
    qid = np.array([7], dtype=np.int64)
    bf = knn_brute_force(ds, q, qid, k=3, num_partitions=2).take_all()
    assert len(bf) == 3 and all(r["q_id"] == 7 for r in bf)
    lsh = knn_lsh(ds, q, qid, k=3, num_partitions=4).take_all()
    assert len(lsh) <= 3  # approximate: recall bounded in its own tests
    ivf = knn_ivf(
        ds, q, qid, k=3, n_lists=4, num_partitions=4, train_sample=20
    ).take_all()
    assert len(ivf) <= 3


# ---------------------------------------------------------------------------
# sink/storage/parsers review fixes


def test_jsonl_empty_segments_keep_declared_types():
    from raycdc.parsers import DecodeSpec, decode_segment

    spec = DecodeSpec(
        format="jsonl",
        column_names=("a", "b"),
        column_types=(pa.int64(), pa.string()),
    )
    full = decode_segment(b'{"a": 1, "b": "x"}', "p1", spec)
    empty = decode_segment(b"", "p2", spec)
    # identical schemas -> blocks from mixed tasks concat cleanly
    merged = pa.concat_tables([full, empty])
    assert merged.schema.field("a").type == pa.int64()
    assert len(merged) == 1


def test_lazy_quotes_blank_lines_produce_no_rows():
    from raycdc.parsers import DecodeSpec, decode_segment

    spec = DecodeSpec(lazy_quotes=True, column_names=("x", "y"))
    t = decode_segment(b"a,b\n\nc,d\n", "p", spec)
    assert t["x"].to_pylist() == ["a", "c"]  # the blank line is NOT a row


def test_snapshot_ids_stay_monotone_after_vacuum(ray_session, tmp_path):
    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import replay
    from raycdc.schema import TableSpec
    from raycdc.sink import vacuum, write_snapshot

    lake = str(tmp_path / "lake")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=200, seed=90)),
        lake,
        TableSpec(num_partitions=2),
    )
    s0, s1 = write_snapshot(lake), write_snapshot(lake)
    assert s1 == s0 + 1
    vacuum(lake, keep_snapshots=0)
    s2 = write_snapshot(lake)
    # NOT reset to 0: a reused id would time-travel to the wrong state
    assert s2 == s1 + 1


def test_vacuum_removes_orphaned_publish_temps(ray_session, tmp_path):
    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import replay
    from raycdc.schema import TableSpec
    from raycdc.sink import part_dir, vacuum

    lake = str(tmp_path / "lake")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=200, seed=91)),
        lake,
        TableSpec(num_partitions=2),
    )
    orphan = os.path.join(part_dir(lake, 0), ".tmp-deadbeef.parquet")
    with open(orphan, "wb") as f:
        f.write(b"torn")
    vacuum(lake)
    assert not os.path.exists(orphan)


def test_resolve_uri_paths_rejects_mixed_schemes():
    from raycdc.storage import resolve_uri_paths

    with pytest.raises(ValueError, match="mixed path schemes"):
        resolve_uri_paths(["/plain/x.csv", "file:///y.csv"])
    with pytest.raises(ValueError, match="mixed path schemes"):
        resolve_uri_paths(["s3://b/x", "gs://b/y"])
    paths, fs = resolve_uri_paths(["/a", "/b"])
    assert paths == ["/a", "/b"] and fs is None


def test_content_hash_null_keys_deterministic():
    import warnings

    from raycdc.sink import content_hash

    t_null = pa.table(
        {
            "conv_id": ["a", "b"],
            "turn_idx": pa.array([1, None], pa.int32()),
            "lsn": pa.array([10, 11], pa.int64()),
        }
    )
    t_zero = t_null.set_column(
        1, "turn_idx", pa.array([1, 0], pa.int32())
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # the old NaN cast warned here
        h1 = content_hash(t_null)
        h2 = content_hash(t_null)
    assert h1 == h2
    assert h1 != content_hash(t_zero)  # null is not the same key as 0


def test_binary_decoder_empty_batch_reuses_schema():
    from raycdc.parsers import BinarySegmentDecoder

    def fake_codec(data: bytes, path: str) -> pa.Table:
        return pa.table({"c0": pa.array(["x"]), "c1": pa.array(["y"])})

    d = BinarySegmentDecoder(fake_codec)
    full = d(pa.table({"path": ["p"], "bytes": [b"z"]}))
    empty = d(pa.table({"path": pa.array([], pa.string()),
                        "bytes": pa.array([], pa.binary())}))
    assert empty.schema.names == full.schema.names  # c0/c1 survive
    assert pa.concat_tables([full, empty]).num_rows == 1


# ---------------------------------------------------------------------------
# hashing/core review fixes (null-bearing int columns, long outliers)


def test_int_hashes_ignore_null_neighbors_and_keep_big_keys():
    from raycdc.partition import bucket_keys, hash_key_column

    big = 2**60 + 1
    solo = hash_key_column(pa.array([big], pa.int64()))
    with_null = hash_key_column(pa.array([big, None], pa.int64()))
    # the SAME key hashes identically whether or not a NEIGHBOR is null
    # (the float64 round-trip used to corrupt values above 2^53)
    assert solo[0] == with_null[0]
    t1 = pa.table({"k": pa.array([big], pa.int64())})
    t2 = pa.table({"k": pa.array([big, None], pa.int64())})
    b1 = bucket_keys(t1, ["k"], 64).to_pylist()
    b2 = bucket_keys(t2, ["k"], 64).to_pylist()
    assert b1[0] == b2[0]
    assert b2[1] is not None  # nulls get a deterministic bucket


def test_hash_bucket_null_keys_and_big_keys():
    from raycdc.ops import hash_bucket

    big = 2**60 + 1
    b = hash_bucket(pa.array([big, None, big], pa.int64()))
    assert b[0].as_py() == b[2].as_py()
    assert b[1].as_py() is None  # SQL formula on NULL -> NULL
    # exact Knuth formula parity for big keys (what the SQL oracle computes)
    want = (((big * 2654435761) % 2**32) * 10_000) // 2**32
    assert b[0].as_py() == want


def test_diff_tagged_null_key_rows_do_not_churn():
    from raycdc.changelog import diff_tagged

    g = pa.table(
        {
            "k": pa.array([None, None], pa.string()),
            "v": pa.array(["same", "same"]),
            "__side": pa.array([0, 1], pa.int8()),
        }
    )
    out = diff_tagged(g, key_cols=("k",), value_cols=("v",))
    assert len(out) == 0  # identical null-key rows emit nothing
    g2 = pa.table(
        {
            "k": pa.array([None, None], pa.string()),
            "v": pa.array(["old", "new"]),
            "__side": pa.array([0, 1], pa.int8()),
        }
    )
    out2 = diff_tagged(g2, key_cols=("k",), value_cols=("v",))
    assert out2["op"].to_pylist() == ["update"]


def test_extract_json_field_escaped_quotes():
    from raycdc.ops import extract_json_field

    t = pa.table({"props": [r'{"k": "a\"b", "x": 1}', '{"x": 2}']})
    out = extract_json_field(t, "props", "k", "val")
    assert out["val"].to_pylist() == [r'a\"b', None]


def test_hash_strings_long_outlier_consistent():
    from raycdc.partition import hash_strings

    texts = ["short", "x" * 200_000, "", "another one"]
    batch = hash_strings(pa.array(texts))
    solo = np.concatenate(
        [hash_strings(pa.array([t])) for t in texts]
    )
    assert np.array_equal(batch, solo)  # sweep order never changes values


def test_sketches_null_and_big_int_determinism():
    from raycdc import sketch as SK

    big = 2**60 + 1
    a = pa.array([big, None, big + 2], pa.int64())
    regs1 = SK.hll_registers(a, p=8)
    regs2 = SK.hll_registers(pa.array([big, big + 2], pa.int64()), p=8)
    # the two real values hash identically with or without the null row
    merged = SK.hll_merge(regs2, SK.hll_registers(pa.array([None], pa.int64()), p=8))
    assert np.array_equal(regs1, merged)
    words = SK.bloom_bits(a, 1 << 10)
    assert SK.bloom_contains(words, pa.array([big], pa.int64()))[0]
