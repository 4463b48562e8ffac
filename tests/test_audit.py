"""Tests for raycdc.audit (key churn + delivery-order stats) and the
min/max extension of relational.pre_aggregate, checked against plain-Python
re-aggregation of a shuffled synthetic changelog."""

import collections

import pyarrow as pa
import pytest

import ray.data

from raycdc import audit as A
from raycdc.changelog import synthetic_changelog
from raycdc.relational import pre_aggregate


@pytest.fixture(scope="module")
def log() -> pa.Table:
    import numpy as np
    import pyarrow.compute as pc

    t = synthetic_changelog(n_events=3000, n_convs=40, seed=7, shuffle=True)
    # the generator's ts is monotone in lsn; jitter event time so the
    # ts-vs-lsn inversion path is actually exercised
    rng = np.random.default_rng(11)
    us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    jitter = rng.integers(-30_000_000, 30_000_000, len(t))
    return t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        pa.array(us + jitter).cast(pa.timestamp("us")),
    )


def test_key_churn_matches_python(log):
    ds = ray.data.from_arrow(log).repartition(6)
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in A.key_churn(ds, num_partitions=8).take_all()
    }
    want: dict = {}
    for r in log.to_pylist():
        k = (r["conv_id"], r["turn_idx"])
        w = want.setdefault(
            k,
            {
                "n_inserts": 0, "n_updates": 0, "n_deletes": 0,
                "n_events": 0, "first_lsn": r["lsn"], "last_lsn": r["lsn"],
            },
        )
        w[f"n_{r['op']}s"] += 1
        w["n_events"] += 1
        w["first_lsn"] = min(w["first_lsn"], r["lsn"])
        w["last_lsn"] = max(w["last_lsn"], r["lsn"])
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for col, val in w.items():
            assert g[col] == val, (k, col, g, w)


def test_event_order_stats_match_python(log):
    ds = ray.data.from_arrow(log).repartition(5)
    got = {
        r["conv_id"]: (r["n_events"], r["n_ts_inversions"])
        for r in A.event_order_stats(ds, num_partitions=8).take_all()
    }
    by_key: dict = collections.defaultdict(list)
    for r in log.to_pylist():
        by_key[(r["conv_id"], r["turn_idx"])].append(r)
    n_events: collections.Counter = collections.Counter()
    n_inv: collections.Counter = collections.Counter()
    for (conv, _), rows in by_key.items():
        rows.sort(key=lambda r: r["lsn"])
        n_events[conv] += len(rows)
        n_inv[conv] += sum(
            1 for a, b in zip(rows, rows[1:]) if b["ts"] < a["ts"]
        )
    assert got == {c: (n_events[c], n_inv[c]) for c in n_events}
    # the shuffled fixture must actually exercise the inversion path
    assert sum(v for _, v in got.values()) > 0


def test_event_order_requires_group_prefix(log):
    ds = ray.data.from_arrow(log)
    with pytest.raises(ValueError, match="must start with group_col"):
        A.event_order_stats(ds, group_col="conv_id", key_cols=("turn_idx",))


def test_pre_aggregate_minmax_alias_validation(log):
    ds = ray.data.from_arrow(log)
    with pytest.raises(ValueError, match="aliases"):
        pre_aggregate(
            ds,
            key_cols=["conv_id"],
            sum_cols=["lsn"],
            min_cols={"lsn": "lsn"},  # collides with sum col
        )
    with pytest.raises(ValueError, match="aliases"):
        pre_aggregate(
            ds,
            key_cols=["conv_id"],
            sum_cols=[],
            min_cols={"lsn": "x"},
            max_cols={"turn_idx": "x"},  # duplicate alias
        )


def test_pre_aggregate_minmax_on_sum_col(log):
    # a column may be summed AND min/max'd at once
    ds = ray.data.from_arrow(log).repartition(4)
    out = {
        r["conv_id"]: r
        for r in pre_aggregate(
            ds,
            key_cols=["conv_id"],
            sum_cols=["lsn"],
            min_cols={"lsn": "lo"},
            max_cols={"lsn": "hi"},
            num_partitions=4,
        ).take_all()
    }
    per_conv: dict = collections.defaultdict(list)
    for r in log.to_pylist():
        per_conv[r["conv_id"]].append(r["lsn"])
    for conv, lsns in per_conv.items():
        g = out[conv]
        assert (g["lsn"], g["lo"], g["hi"], g["n_rows"]) == (
            sum(lsns), min(lsns), max(lsns), len(lsns),
        )
