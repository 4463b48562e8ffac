"""LWW merge semantics: unit kernels + Dataset pipeline vs python oracle."""

import pyarrow as pa
import pytest
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import merged_state
from raycdc.merge import combine_batch, lww_dedup
from raycdc.schema import TableSpec

from .oracle import python_lww_replay


def _mini(rows):
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "lsn", "seg_id"]
    import datetime

    def ts(s):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)

    data = [dict(zip(cols, r)) for r in rows]
    for d in data:
        d["ts"] = ts(d["ts"])
    return pa.Table.from_pylist(data)


def test_lww_picks_max_version():
    t = _mini(
        [
            ["c1", 0, "user", "v1", "", 1, "insert", 1, 0],
            ["c1", 0, "user", "v2", "", 2, "update", 2, 0],
            ["c1", 1, "user", "other", "", 1, "insert", 3, 0],
        ]
    )
    out = lww_dedup(t, drop_deletes=True)
    assert out.num_rows == 2
    state = {(r["conv_id"], r["turn_idx"]): r["text"] for r in out.to_pylist()}
    assert state[("c1", 0)] == "v2"


def test_lsn_tiebreak_on_equal_ts():
    t = _mini(
        [
            ["c1", 0, "user", "a", "", 5, "insert", 10, 0],
            ["c1", 0, "user", "b", "", 5, "update", 11, 0],  # same ts, higher lsn wins
        ]
    )
    out = lww_dedup(t, drop_deletes=True)
    assert out["text"].to_pylist() == ["b"]


def test_delete_tombstones_win_and_are_replaceable():
    # insert -> delete -> insert chain (SURVEY §7.3)
    t = _mini(
        [
            ["c1", 0, "user", "first", "", 1, "insert", 1, 0],
            ["c1", 0, "user", "", "", 2, "delete", 2, 0],
            ["c1", 0, "user", "reborn", "", 3, "insert", 3, 0],
            ["c2", 0, "user", "gone", "", 1, "insert", 4, 0],
            ["c2", 0, "user", "", "", 9, "delete", 5, 0],
        ]
    )
    out = lww_dedup(t, drop_deletes=True)
    state = {(r["conv_id"], r["turn_idx"]): r["text"] for r in out.to_pylist()}
    assert state == {("c1", 0): "reborn"}
    # tombstones kept when not materializing
    kept = lww_dedup(t, drop_deletes=False)
    assert kept.num_rows == 2


def test_combiner_keeps_tombstones_and_output_sorted():
    t = synthetic_changelog(n_events=300, shuffle=True, seed=3)
    c = combine_batch(t)
    assert c.num_rows <= t.num_rows
    assert "delete" in set(c["op"].to_pylist())
    keys = list(zip(c["conv_id"].to_pylist(), c["turn_idx"].to_pylist()))
    assert keys == sorted(keys)


@pytest.mark.parametrize("shuffle,salted", [(False, False), (True, False), (True, True)])
def test_merged_state_matches_python_oracle(shuffle, salted):
    t = synthetic_changelog(n_events=1500, seed=11, shuffle=shuffle)
    ds = ray.data.from_arrow(t)
    out = merged_state(ds, TableSpec(num_partitions=8), salted=salted).to_pandas()
    expect = python_lww_replay([t])
    got = {
        (r.conv_id, r.turn_idx): r.text for r in out.itertuples()
    }
    assert len(got) == len(expect)
    assert got == {k: r["text"] for k, r in expect.items()}


def test_skewed_hot_key_salted_merge():
    t = synthetic_changelog(n_events=3000, seed=5, zipf_skew=0.9, n_convs=20)
    ds = ray.data.from_arrow(t)
    out = merged_state(ds, TableSpec(num_partitions=4), salted=True, num_salts=4).to_pandas()
    expect = python_lww_replay([t])
    got = {(r.conv_id, r.turn_idx): r.text for r in out.itertuples()}
    assert got == {k: r["text"] for k, r in expect.items()}
