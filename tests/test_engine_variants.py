"""Engine variants: actor-pool merge, auto-salting, hot-key detection."""

import glob

import pyarrow as pa
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import detect_hot_keys, replay
from raycdc.schema import TableSpec

from .oracle import lake_state as _lake_state, python_lww_replay




def test_actor_pool_merge_matches_task_merge(ray_session, tmp_path):
    t = synthetic_changelog(n_events=1500, seed=31, shuffle=True)
    spec = TableSpec(num_partitions=8)
    lake_a = str(tmp_path / "actors")
    lake_b = str(tmp_path / "tasks")
    replay(ray.data.from_arrow(t), lake_a, spec, merge_concurrency=2)
    replay(ray.data.from_arrow(t), lake_b, spec)
    assert _lake_state(lake_a) == _lake_state(lake_b)
    expect = {k: r["text"] for k, r in python_lww_replay([t]).items()}
    assert _lake_state(lake_a) == expect


def test_detect_hot_keys_flags_skew(ray_session):
    hot = synthetic_changelog(n_events=2000, seed=32, zipf_skew=0.9, n_convs=20)
    keys = detect_hot_keys(ray.data.from_arrow(hot), TableSpec())
    assert keys == ["conv-0"]
    uniform = synthetic_changelog(n_events=2000, seed=33, n_convs=50)
    assert detect_hot_keys(ray.data.from_arrow(uniform), TableSpec()) == []


def test_replay_auto_salting_correct(ray_session, tmp_path):
    t = synthetic_changelog(n_events=2000, seed=34, zipf_skew=0.9, n_convs=20)
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "auto")
    replay(ray.data.from_arrow(t), lake, spec, salted="auto")
    expect = {k: r["text"] for k, r in python_lww_replay([t]).items()}
    assert _lake_state(lake) == expect


def test_migrate_lake_repartition(ray_session, tmp_path):
    """Repartition migration: state identical after 4->8 migration
    (including tombstones), point lookup works under the NEW spec, and
    replaying the log's second half (with overlap) into the migrated lake
    lands on the same final state as a one-shot replay into a fresh
    8-way lake — the conservative checkpoint floor + LWW idempotence."""
    import ray.data

    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import lookup, migrate_lake, read_lake, replay
    from raycdc.schema import TableSpec

    from .oracle import lake_state

    log = synthetic_changelog(n_events=900, seed=54, p_delete=0.2)
    half = log.sort_by("lsn").slice(0, 450)

    src = str(tmp_path / "src4")
    spec4 = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(half), src, spec4)

    dst = str(tmp_path / "dst8")
    spec8 = TableSpec(num_partitions=8)
    summary = migrate_lake(src, dst, spec8)
    assert 0 < summary.num_rows <= 8
    assert lake_state(src) == lake_state(dst)

    some_key = read_lake(dst, spec8).take(1)[0]["conv_id"]
    found = lookup(dst, some_key, spec8)
    assert len(found) > 0

    # stored-ordering invariant survives migration: the migrated files are
    # key-sorted like any merged partition, so a second migration of the
    # same source is byte-identical (deterministic re-layout)
    from raycdc import sink as S

    dst2 = str(tmp_path / "dst8b")
    migrate_lake(src, dst2, spec8)
    for f1, f2 in zip(sorted(S.current_files(dst)), sorted(S.current_files(dst2))):
        with open(f1, "rb") as a, open(f2, "rb") as b:
            assert a.read() == b.read(), (f1, f2)
    t = S.read_partition(dst, int(S.read_all_checkpoints(dst).popitem()[0]))
    keys = t["conv_id"].to_pylist()
    assert keys == sorted(keys)

    replay(ray.data.from_arrow(log), dst, spec8)
    fresh = str(tmp_path / "fresh8")
    replay(ray.data.from_arrow(log), fresh, spec8)
    assert lake_state(dst) == lake_state(fresh)


def test_migrate_lake_heterogeneous_partition_schemas(ray_session, tmp_path):
    """Migration of a lake where SOME partitions never saw a schema
    evolution (their stored files lack the evolved column): the re-layout
    must null-fill, not crash or drop — Ray's parquet reader unifies the
    fragment schemas and the exchange regroups mixed blocks."""
    import ray.data

    from raycdc import sink as S
    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import migrate_lake, replay
    from raycdc.partition import add_part_key
    from raycdc.schema import TableSpec

    from .oracle import lake_state

    spec4 = TableSpec(num_partitions=4)
    log = synthetic_changelog(n_events=400, seed=21, evolve_from_lsn=200)
    # widened turn_idx everywhere (type evolution is uniform), but deliver
    # the evolved-COLUMN rows only to partition 0's keys: partitions 1-3
    # keep pre-evolution files without the `model` column
    keyed = add_part_key(log, key_col=spec4.partition_key, num_partitions=4)
    import pyarrow.compute as pc_

    pre = keyed.filter(pc_.less(keyed["lsn"], 200)).drop_columns(
        ["part_key", "model"]
    )
    evolved = keyed.filter(
        pc_.and_(
            pc_.greater_equal(keyed["lsn"], 200), pc_.equal(keyed["part_key"], 0)
        )
    ).drop_columns(["part_key"])

    src = str(tmp_path / "src_het")
    replay(ray.data.from_arrow(pre), src, spec4)
    replay(ray.data.from_arrow(evolved), src, spec4)
    schemas = {
        p: set((S.read_partition(src, p) or pa.table({})).column_names)
        for p in range(4)
    }
    has_model = {p for p, s in schemas.items() if "model" in s}
    assert has_model and has_model != {0, 1, 2, 3}, (
        "fixture must create genuinely heterogeneous partition files"
    )

    dst = str(tmp_path / "dst_het")
    migrate_lake(src, dst, TableSpec(num_partitions=8))
    assert lake_state(src) == lake_state(dst)


def test_migrate_lake_guards(ray_session, tmp_path):
    """migrate_lake refuses additive-policy specs (overlap re-apply would
    double-count deltas) and non-fresh destinations (stale part dirs would
    double rows)."""
    import pytest
    import ray.data

    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import migrate_lake, replay
    from raycdc.schema import TableSpec

    src = str(tmp_path / "src")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=200, seed=3)),
        src,
        TableSpec(num_partitions=4),
    )
    with pytest.raises(ValueError, match="additive"):
        migrate_lake(
            src, str(tmp_path / "d1"),
            TableSpec(num_partitions=8, merge_policy="additive"),
        )
    with pytest.raises(FileExistsError, match="fresh"):
        migrate_lake(src, src, TableSpec(num_partitions=8))


def test_replay_history_policy_lake(ray_session, tmp_path):
    """merge_policy='history' turns the exactly-once lake into a
    continuously maintained SCD2 history: the stored state equals
    scd2_history of the full log, a second replay of the same segments is
    a pure no-op, and applying the log in two ts-ordered halves equals the
    one-shot replay."""
    import pandas as pd
    import ray.data

    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import read_lake, replay
    from raycdc.scd import scd2_history
    from raycdc.schema import TableSpec

    log = synthetic_changelog(n_events=400, seed=21, p_delete=0.2).sort_by(
        [("ts", "ascending"), ("lsn", "ascending")]
    )
    spec = TableSpec(num_partitions=4, merge_policy="history")

    def canon(df):
        return (
            df.sort_values(["conv_id", "turn_idx", "valid_from", "lsn"])
            .reset_index(drop=True)[
                ["conv_id", "turn_idx", "lsn", "text", "valid_from",
                 "valid_to", "is_current"]
            ]
        )

    lake = str(tmp_path / "histlake")
    replay(ray.data.from_arrow(log), lake, spec)
    got = canon(read_lake(lake, spec, with_tombstones=True).to_pandas())
    want = canon(
        scd2_history(
            ray.data.from_arrow(log), key_cols=("conv_id", "turn_idx"),
            num_partitions=4,
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(got, want)

    # exactly-once: full redelivery must change nothing
    lineage = replay(ray.data.from_arrow(log), lake, spec)
    assert set(lineage["status"].to_pylist()) == {"noop"}
    again = canon(read_lake(lake, spec, with_tombstones=True).to_pandas())
    pd.testing.assert_frame_equal(again, want)

    # incremental: two ts-ordered halves == one shot
    lake2 = str(tmp_path / "histlake2")
    replay(ray.data.from_arrow(log.slice(0, 200)), lake2, spec)
    replay(ray.data.from_arrow(log.slice(200)), lake2, spec)
    inc = canon(read_lake(lake2, spec, with_tombstones=True).to_pandas())
    pd.testing.assert_frame_equal(inc, want)


def test_lake_spec_metadata_guards(ray_session, tmp_path):
    """The first replay persists the lake's policy/layout; later applies
    with a mismatched merge_policy or num_partitions fail fast instead of
    silently collapsing history or orphaning rows, and the CLI picks up
    the stored spec so a history lake stays a history lake."""
    import json

    import pytest
    import ray.data

    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import read_lake, replay
    from raycdc.schema import TableSpec

    log = synthetic_changelog(n_events=300, seed=31, p_delete=0.2).sort_by(
        [("ts", "ascending"), ("lsn", "ascending")]
    )
    lake = str(tmp_path / "histlake")
    spec = TableSpec(num_partitions=4, merge_policy="history")
    replay(ray.data.from_arrow(log.slice(0, 150)), lake, spec)
    n_after_half = read_lake(lake, spec, with_tombstones=True).count()

    with pytest.raises(ValueError, match="merge_policy"):
        replay(
            ray.data.from_arrow(log.slice(150)), lake,
            TableSpec(num_partitions=4),  # lww against a history lake
        )
    with pytest.raises(ValueError, match="num_partitions"):
        replay(
            ray.data.from_arrow(log.slice(150)), lake,
            TableSpec(num_partitions=8, merge_policy="history"),
        )

    # the CLI derives the spec from the lake, not its --partitions default
    import pyarrow.parquet as pq

    from raycdc.__main__ import main

    seg = tmp_path / "seg2.parquet"
    pq.write_table(log.slice(150), seg)
    assert main(["replay", str(seg), "--lake", lake]) == 0
    out = read_lake(lake, spec, with_tombstones=True).to_pandas()
    # history grew (superseded versions retained, not LWW-collapsed)
    assert len(out) > n_after_half
    assert (out.groupby(["conv_id", "turn_idx"]).size() > 1).any()


def test_history_lake_retention_compaction(ray_session, tmp_path):
    """History compaction drops only closed versions with valid_to <= the
    retention watermark; open versions and recent closes survive, so
    point-in-time probes at or after the watermark are unchanged; an
    unbounded history compact is refused."""
    import datetime as dt

    import pytest
    import ray.data

    from raycdc.engine import compact, read_lake, replay
    from raycdc.scd import point_in_time
    from raycdc.schema import TableSpec

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    log = pa.table(
        {
            "conv_id": pa.array(["a"] * 3 + ["b"]),
            "turn_idx": pa.array([0, 0, 0, 1], pa.int64()),
            "role": pa.array(["user"] * 4),
            "text": pa.array(["v1", "v2", "v3", "w1"]),
            "tool": pa.array([""] * 4),
            "ts": pa.array([ts(1), ts(10), ts(20), ts(2)], pa.timestamp("us")),
            "op": pa.array(["insert", "update", "update", "insert"]),
            "lsn": pa.array([1, 2, 3, 4], pa.int64()),
            "seg_id": pa.array([0] * 4, pa.int32()),
        }
    )
    lake = str(tmp_path / "hl")
    spec = TableSpec(num_partitions=2, merge_policy="history")
    replay(ray.data.from_arrow(log), lake, spec)

    with pytest.raises(ValueError, match="retention watermark"):
        compact(lake, spec)

    # watermark 15: v1 [1,10) expires; v2 [10,20) closed at 20 > 15 stays
    lineage = compact(lake, spec, watermark=ts(15))
    assert sum(lineage["tombstones"].to_pylist()) == 1
    left = read_lake(lake, spec, with_tombstones=True).to_pandas()
    assert sorted(left["text"]) == ["v2", "v3", "w1"]

    # probes at/after the watermark answer identically post-GC
    probes = pa.table(
        {
            "conv_id": pa.array(["a", "a"]),
            "turn_idx": pa.array([0, 0], pa.int64()),
            "ts": pa.array([ts(15), ts(25)], pa.timestamp("us")),
            "pid": pa.array([0, 1], pa.int64()),
        }
    )
    out = (
        point_in_time(
            read_lake(lake, spec, with_tombstones=True),
            ray.data.from_arrow(probes),
            key_cols=("conv_id", "turn_idx"),
            as_of_col="ts",
            payload_cols=("text",),
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("pid")
    )
    assert out["text"].tolist() == ["v2", "v3"]


def test_history_current_view_equals_lww_state(ray_session, tmp_path):
    """Cross-policy equivalence: the current view of a history lake
    (is_current rows) equals the LWW lake's live state on the same
    changelog — same keys, same winning text."""
    import ray.data

    from raycdc.engine import read_lake, replay
    from raycdc.schema import TableSpec

    log = synthetic_changelog(n_events=400, seed=41, p_delete=0.25).sort_by(
        [("ts", "ascending"), ("lsn", "ascending")]
    )
    hist_lake = str(tmp_path / "hl")
    lww_lake = str(tmp_path / "ll")
    hspec = TableSpec(num_partitions=4, merge_policy="history")
    lspec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(log), hist_lake, hspec)
    replay(ray.data.from_arrow(log), lww_lake, lspec)

    cur = read_lake(hist_lake, hspec, current_only=True).to_pandas()
    lww = read_lake(lww_lake, lspec).to_pandas()

    def state(df):
        return {
            (r.conv_id, r.turn_idx): r.text for r in df.itertuples()
        }

    assert state(cur) == state(lww)


def test_spec_meta_hardening(ray_session, tmp_path):
    """Second review round: version_cols mismatch fails fast; a first
    replay whose plan is rejected does NOT lock the lake to the wrong
    spec; current_only works under a columns projection and errors
    clearly on a non-history lake; CLI lookup honors a custom persisted
    partition_key."""
    import pytest
    import ray.data

    from raycdc.engine import read_lake, replay
    from raycdc.schema import TableSpec
    from raycdc.sink import read_spec_meta

    log = synthetic_changelog(n_events=200, seed=13).sort_by(
        [("ts", "ascending"), ("lsn", "ascending")]
    )

    # rejected first replay leaves no meta behind
    lake = str(tmp_path / "l1")
    bad = TableSpec(num_partitions=4, merge_policy="additive")
    with pytest.raises(ValueError):
        replay(ray.data.from_arrow(log), lake, bad, salted=True)
    assert read_spec_meta(lake) is None

    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(log), lake, spec)
    with pytest.raises(ValueError, match="version_cols"):
        replay(
            ray.data.from_arrow(log), lake,
            TableSpec(num_partitions=4, version_cols=("lsn",)),
        )

    # current_only on an LWW lake: clear error, not KeyError
    with pytest.raises(Exception, match="HISTORY lake"):
        read_lake(lake, spec, current_only=True).materialize()

    # current_only + columns projection on a history lake
    hlake = str(tmp_path / "l2")
    hspec = TableSpec(num_partitions=4, merge_policy="history")
    replay(ray.data.from_arrow(log), hlake, hspec)
    cur = read_lake(
        hlake, hspec, columns=["conv_id", "turn_idx", "text"],
        current_only=True,
    ).to_pandas()
    assert set(cur.columns) == {"conv_id", "turn_idx", "text"}
    assert len(cur) > 0


def test_ensure_parallel_input_splits_large_single_block(ray_session):
    """A big in-memory table arrives as ONE block — the unit of Ray Data
    parallelism — so replay's front half would serialize; the guard splits
    it (streaming, non-shuffle).  Small inputs and lazy reads pass through
    untouched (measured 3x on a 375 MB single-block replay at 32 CPUs)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from raycdc.engine import _ensure_parallel_input

    big = ray.data.from_arrow(
        pa.table({"x": np.zeros(3_000_000, np.int64)})  # ~24 MiB, 1 block
    )
    out = _ensure_parallel_input(big)
    assert out.materialize().num_blocks() > 1

    small = ray.data.from_arrow(pa.table({"x": np.zeros(10, np.int64)}))
    assert _ensure_parallel_input(small) is small

    lazy = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    assert _ensure_parallel_input(lazy) is lazy
