"""Additive merge policy: incrementally maintained rollups with
exactly-once semantics (non-idempotent addition made safe by the
per-partition lsn checkpoints)."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raycdc.engine import read_lake, replay
from raycdc.merge import additive_merge
from raycdc.schema import TableSpec


def _spec():
    return TableSpec(
        num_partitions=4, merge_policy="additive", value_cols=("cents",)
    )


def _deltas(n=600, seed=9):
    rng = np.random.default_rng(seed)
    users = rng.integers(0, 12, n)
    return pa.table(
        {
            "conv_id": pa.array([f"u{u}" for u in users]),
            "turn_idx": pa.array(rng.integers(0, 3, n).astype(np.int32)),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(s))
                 for s in range(n)],
                pa.timestamp("us"),
            ),
            "op": pa.array(
                np.where(rng.random(n) < 0.05, "delete", "insert")
            ),
            "lsn": pa.array(np.arange(n, dtype=np.int64)),
            "cents": pa.array(rng.integers(-50, 200, n).astype(np.int64)),
        }
    )


def _python_rollup(t: pa.Table) -> dict:
    """Reference: per key, sum of insert cents newer than the last delete."""
    state: dict = {}
    rows = sorted(
        t.to_pylist(), key=lambda r: (r["ts"], r["lsn"])
    )
    last_del: dict = {}
    for r in rows:
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            last_del[k] = (r["ts"], r["lsn"])
    out: dict = {}
    for r in rows:
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            continue
        d = last_del.get(k)
        if d is None or (r["ts"], r["lsn"]) > d:
            out[k] = out.get(k, 0) + r["cents"]
    return out


def test_additive_replay_matches_python_reference(ray_session, tmp_path):
    t = _deltas()
    lake = str(tmp_path / "lake")
    spec = _spec()
    lineage = replay(ray.data.from_arrow(t), lake, spec)
    assert set(lineage["status"].to_pylist()) == {"applied"}
    out = read_lake(lake, spec).to_pandas()
    got = {
        (r.conv_id, r.turn_idx): r.cents for r in out.itertuples()
    }
    assert got == _python_rollup(t)


def test_additive_redelivery_is_noop(ray_session, tmp_path):
    """THE additive hazard: re-applying deltas would double-count — the
    checkpoints must make redelivery a byte-level no-op."""
    t = _deltas(seed=10)
    lake = str(tmp_path / "lake")
    spec = _spec()
    replay(ray.data.from_arrow(t), lake, spec)
    before = read_lake(lake, spec).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    lin2 = replay(ray.data.from_arrow(t), lake, spec)
    assert set(lin2["status"].to_pylist()) == {"noop"}
    after = read_lake(lake, spec).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert before.equals(after)


def test_additive_crash_resume_overlap(ray_session, tmp_path):
    """Half the log, then the FULL log (overlapping redelivery): final
    state equals one clean replay."""
    t = _deltas(seed=11)
    lake = str(tmp_path / "lake")
    lake2 = str(tmp_path / "lake2")
    spec = _spec()
    half = t.filter(pc.less(t["lsn"], 300))
    replay(ray.data.from_arrow(half), lake, spec)
    replay(ray.data.from_arrow(t), lake, spec)  # full log incl. overlap
    replay(ray.data.from_arrow(t), lake2, spec)  # clean one-shot
    a = read_lake(lake, spec).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    b = read_lake(lake2, spec).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a.equals(b)


def test_additive_delete_resets_and_tombstone_blocks_stale(ray_session, tmp_path):
    base = dt.datetime(2024, 1, 1)
    spec = _spec()

    def row(s, lsn, op, cents):
        return {
            "conv_id": "u1",
            "turn_idx": 0,
            "ts": base + dt.timedelta(seconds=s),
            "op": op,
            "lsn": lsn,
            "cents": cents,
        }

    lake = str(tmp_path / "lake")
    first = pa.Table.from_pylist(
        [row(1, 0, "insert", 10), row(5, 1, "delete", 0), row(6, 2, "insert", 7)],
        schema=_deltas().schema,
    )
    replay(ray.data.from_arrow(first), lake, spec)
    out = read_lake(lake, spec).to_pandas()
    assert list(out["cents"]) == [7]  # delete@5 reset the 10
    # stale delta: NEW lsn but event-time BEFORE the delete — must not count
    stale = pa.Table.from_pylist(
        [row(3, 3, "insert", 1000)], schema=_deltas().schema
    )
    replay(ray.data.from_arrow(stale), lake, spec)
    out2 = read_lake(lake, spec).to_pandas()
    assert list(out2["cents"]) == [7]


def test_additive_merge_associativity_random():
    rng = np.random.default_rng(12)
    t = _deltas(n=300, seed=13)
    one = additive_merge(t, value_cols=("cents",))
    cut = int(rng.integers(50, 250))
    h = pa.concat_tables(
        [
            additive_merge(t.slice(0, cut), value_cols=("cents",)),
            additive_merge(t.slice(cut), value_cols=("cents",)),
        ]
    )
    again = additive_merge(h, value_cols=("cents",))
    assert again.equals(one)


def test_salted_additive_rejected(ray_session, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="additive"):
        replay(
            ray.data.from_arrow(_deltas(n=50)),
            str(tmp_path / "lake"),
            _spec(),
            salted=True,
        )


def test_additive_late_delete_guard_and_span_exactness():
    """A delete landing INSIDE an existing aggregate's span raises (the
    fold cannot be split exactly); a delete BELOW the span folds exactly;
    a delete ABOVE the aggregate cancels it."""
    import pytest

    schema = _deltas().schema

    def row(s, lsn, op, cents):
        return {
            "conv_id": "u1",
            "turn_idx": 0,
            "ts": dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s),
            "op": op,
            "lsn": lsn,
            "cents": cents,
        }

    contrib = pa.Table.from_pylist(
        [row(1, 0, "insert", 2), row(5, 1, "insert", 3)], schema=schema
    )
    agg = additive_merge(contrib, value_cols=("cents",))

    def fold(extra_rows):
        extra = pa.Table.from_pylist(extra_rows, schema=schema)
        return additive_merge(
            pa.concat_tables([agg, extra], promote_options="default"),
            value_cols=("cents",),
        )

    # inside the span (1..5): ambiguous -> raise
    with pytest.raises(ValueError, match="event-time-monotone"):
        fold([row(3, 2, "delete", 0)])
    # below the span: exact whole-fold
    out = fold([row(0, 3, "delete", 0)])
    by_op = {r["op"]: r for r in out.to_pylist()}
    assert by_op["agg"]["cents"] == 5 and "delete" in by_op
    # above the aggregate: cancelled
    out2 = fold([row(9, 4, "delete", 0)])
    assert {r["op"] for r in out2.to_pylist()} == {"delete"}


def test_additive_progressive_fold_matches_one_shot():
    """Folding the log in version-ordered chunks (the multi-round replay
    shape) must equal the one-shot merge, for several random chunkings."""
    t = _deltas(n=400, seed=21)
    one = additive_merge(t, value_cols=("cents",))
    rng = np.random.default_rng(22)
    for _ in range(5):
        cuts = np.sort(rng.choice(np.arange(20, 380), size=3, replace=False))
        acc = None
        prev = 0
        for c in [*cuts, 400]:
            chunk = t.slice(prev, c - prev)
            prev = c
            inp = (
                chunk
                if acc is None
                else pa.concat_tables([acc, chunk], promote_options="default")
            )
            acc = additive_merge(inp, value_cols=("cents",))
        # compare key -> (op, cents) ignoring bookkeeping columns
        def norm(tbl):
            return {
                (r["conv_id"], r["turn_idx"], r["op"]): r["cents"]
                for r in tbl.to_pylist()
            }
        assert norm(acc) == norm(one)


def test_additive_input_guards_and_schema_stability():
    """Null versions/values fail fast (NaN would alias to INT64_MIN in the
    watermark math); large_string op folds fine; empty input returns the
    SAME schema as the non-empty path."""
    import pytest

    schema = _deltas().schema
    base = dt.datetime(2024, 1, 1)
    rows = [
        {"conv_id": "a", "turn_idx": 0, "ts": base, "op": "insert", "lsn": 0,
         "cents": 5},
        {"conv_id": "a", "turn_idx": 0, "ts": base, "op": "delete", "lsn": 1,
         "cents": 0},
    ]
    ok = pa.Table.from_pylist(rows, schema=schema)

    null_ts = ok.set_column(2, "ts", pa.array([None, base], pa.timestamp("us")))
    with pytest.raises(ValueError, match="null value"):
        additive_merge(null_ts, value_cols=("cents",))
    null_val = ok.set_column(5, "cents", pa.array([None, 0], pa.int64()))
    with pytest.raises(ValueError, match="null value"):
        additive_merge(null_val, value_cols=("cents",))
    with pytest.raises(ValueError, match="missing column"):
        additive_merge(ok.drop_columns(["cents"]), value_cols=("cents",))

    # large_string op (evolved lakes widen): agg + tombstone concat fine
    wide = ok.set_column(3, "op", ok["op"].cast(pa.large_string()))
    # delete at lsn 1 > insert version (same ts, higher lsn) -> tombstone only
    out_wide = additive_merge(wide, value_cols=("cents",))
    assert out_wide["op"].type == pa.large_string()
    # and a surviving agg alongside a tombstone concats across types
    rows2 = rows + [
        {"conv_id": "a", "turn_idx": 0, "ts": base + dt.timedelta(seconds=9),
         "op": "insert", "lsn": 2, "cents": 4}
    ]
    wide2 = pa.Table.from_pylist(rows2, schema=schema).set_column(
        3, "op", pa.array(["insert", "delete", "insert"], pa.large_string())
    )
    out2 = additive_merge(wide2, value_cols=("cents",))
    assert sorted(out2["op"].to_pylist()) == ["agg", "delete"]

    # empty input: identical schema to the non-empty output
    empty = additive_merge(ok.slice(0, 0), value_cols=("cents",))
    full = additive_merge(ok, value_cols=("cents",))
    assert empty.schema.equals(full.schema)


def test_additive_floor_survives_compaction(ray_session, tmp_path):
    """Tombstone GC must not reopen the delete watermark: after compact()
    drops an additive lake's tombstones, the aggregate's __floor_* still
    excludes stale pre-delete deltas."""
    from raycdc.engine import compact

    base = dt.datetime(2024, 1, 1)
    spec = _spec()
    schema = _deltas().schema

    def row(s, lsn, op, cents):
        return {
            "conv_id": "u1",
            "turn_idx": 0,
            "ts": base + dt.timedelta(seconds=s),
            "op": op,
            "lsn": lsn,
            "cents": cents,
        }

    lake = str(tmp_path / "lake")
    first = pa.Table.from_pylist(
        [row(1, 0, "insert", 10), row(5, 1, "delete", 0), row(6, 2, "insert", 7)],
        schema=schema,
    )
    replay(ray.data.from_arrow(first), lake, spec)
    lineage = compact(lake, spec)
    assert sum(lineage["tombstones"].to_pylist()) > 0  # tombstone dropped
    assert list(read_lake(lake, spec).to_pandas()["cents"]) == [7]
    # stale delta older than the (now GC'd) delete: floor must exclude it
    stale = pa.Table.from_pylist([row(3, 3, "insert", 1000)], schema=schema)
    replay(ray.data.from_arrow(stale), lake, spec)
    assert list(read_lake(lake, spec).to_pandas()["cents"]) == [7]
