"""Relational operators: broadcast join, sessionization, pre-aggregation."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from raycdc.relational import broadcast_join, pre_aggregate, sessionize


def test_broadcast_join_inner_and_left(ray_session):
    probe = pa.table({"k": pa.array([1, 2, 3, 9]), "v": pa.array(list("abcd"))})
    build = pa.table({"k": pa.array([1, 2, 3]), "name": pa.array(list("xyz"))})
    inner = (
        broadcast_join(ray.data.from_arrow(probe), build, "k", ["name"])
        .to_pandas()
        .sort_values("k")
    )
    assert inner["k"].tolist() == [1, 2, 3]
    assert inner["name"].tolist() == ["x", "y", "z"]
    left = (
        broadcast_join(ray.data.from_arrow(probe), build, "k", ["name"], how="left")
        .to_pandas()
        .sort_values("k")
    )
    assert len(left) == 4
    assert left[left.k == 9]["name"].isna().all()


def test_sessionize_gap_semantics(ray_session):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    mins = np.array([0, 5, 70, 75, 200], dtype="timedelta64[m]")
    t = pa.table(
        {
            "user_id": pa.array([7] * 5 + [8], pa.int64()),
            "ts": pa.array(
                list(base + mins.astype("timedelta64[us]")) + [base],
                pa.timestamp("us"),
            ),
            "event_id": pa.array(range(6), pa.int64()),
        }
    )
    out = (
        sessionize(
            ray.data.from_arrow(t), gap_seconds=1800, num_partitions=2
        )
        .to_pandas()
        .sort_values("event_id")
    )
    # gaps >30min at events 2 and 4 → sessions 0,0,1,1,2 for user 7; user 8 → 0
    assert out["session_idx"].tolist() == [0, 0, 1, 1, 2, 0]


def test_pre_aggregate_matches_flat_groupby(ray_session):
    li = pq.read_table(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    out = (
        pre_aggregate(
            ray.data.from_arrow(li),
            key_cols=["l_returnflag", "l_linestatus"],
            sum_cols=["l_quantity"],
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    import pandas as pd

    expect = (
        li.to_pandas()
        .groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .agg(l_quantity=("l_quantity", "sum"), n_rows=("l_quantity", "size"))
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    assert out["n_rows"].tolist() == expect["n_rows"].tolist()
    assert np.allclose(out["l_quantity"], expect["l_quantity"])


def test_tumbling_window_boundaries(ray_session):
    from raycdc.relational import tumbling_window

    base = np.datetime64("2024-01-01T00:59:59", "us")
    t = pa.table(
        {
            "ts": pa.array([base, base + np.timedelta64(1, "s")], pa.timestamp("us")),
            "x": pa.array([1, 2]),
        }
    )
    out = tumbling_window(ray.data.from_arrow(t), window_seconds=3600).to_pandas()
    starts = sorted(out["window_start"].astype(str))
    assert starts == ["2024-01-01 00:00:00", "2024-01-01 01:00:00"]


def test_asof_previous_semantics(ray_session):
    from raycdc.relational import asof_previous

    base = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                [base, base + np.timedelta64(10, "s"), base + np.timedelta64(20, "s"), base],
                pa.timestamp("us"),
            ),
            "event_id": pa.array([100, 101, 102, 200], pa.int64()),
        }
    )
    out = (
        asof_previous(
            ray.data.from_arrow(t),
            value_cols=["event_id"],
            order_cols=["event_id"],
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    prev = out["prev_event_id"].tolist()
    # first event per user has no predecessor; others chain in ts order
    assert out["prev_event_id"].isna().iloc[0]
    assert prev[1] == 100 and prev[2] == 101
    assert out["prev_event_id"].isna().iloc[3]


def test_asof_join_cross_table(ray_session):
    """Two-table as-of: inclusive tie (l.ts == r.ts matches), latest-earlier
    wins, string keys, left-join nulls for unmatched, and entity isolation
    (a right row never leaks to another key)."""
    import datetime as dt

    from raycdc.relational import asof_join

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = pa.table(
        {
            "user_id": pa.array(["u1", "u1", "u1", "u2", "u3"]),
            "ts": pa.array([ts(5), ts(10), ts(20), ts(7), ts(9)], pa.timestamp("us")),
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array(["u1", "u1", "u2", "u9"]),
            "ts": pa.array([ts(10), ts(15), ts(8), ts(1)], pa.timestamp("us")),
            "price": pa.array([1.0, 2.0, 3.0, 9.0]),
        }
    )
    out = (
        asof_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="user_id",
            ts_col="ts",
            right_cols=("ts", "price"),
            how="left",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(out) == 5
    # u1@5: no purchase yet; u1@10: inclusive tie -> price 1.0;
    # u1@20: latest earlier is ts 15 -> 2.0; u2@7: r is ts 8 (later) -> null;
    # u3: key absent from right -> null (u9's row must not leak)
    assert np.isnan(out["r_price"][0]) and out["r_ts"].isna()[0]
    assert out["r_price"][1] == 1.0 and out["r_ts"][1] == ts(10)
    assert out["r_price"][2] == 2.0 and out["r_ts"][2] == ts(15)
    assert np.isnan(out["r_price"][3])
    assert np.isnan(out["r_price"][4])

    inner = asof_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        on="user_id",
        ts_col="ts",
        right_cols=("price",),
        how="inner",
        num_partitions=2,
    ).to_pandas()
    assert sorted(inner["event_id"]) == [2, 3]


def test_asof_join_right_tiebreak(ray_session):
    """right_tiebreak resolves same-(key, ts) right duplicates to the
    greatest tiebreak value inside the join's own exchange (no pre-dedup
    shuffle), including at an inclusive left==right ts tie; explicit
    l_schema/r_schema skip driver-side inference."""
    import datetime as dt

    from raycdc.relational import asof_join

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = pa.table(
        {
            "user_id": pa.array(["u1", "u1"]),
            "ts": pa.array([ts(10), ts(20)], pa.timestamp("us")),
            "event_id": pa.array([1, 2], pa.int64()),
        }
    )
    # u1 has THREE purchases at ts=10 (values 5, 9, 7) and two at ts=15
    right = pa.table(
        {
            "user_id": pa.array(["u1"] * 5),
            "ts": pa.array(
                [ts(10), ts(10), ts(10), ts(15), ts(15)], pa.timestamp("us")
            ),
            "price": pa.array([5.0, 9.0, 7.0, 2.0, 4.0]),
        }
    )
    out = (
        asof_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="user_id",
            ts_col="ts",
            right_cols=("ts", "price"),
            how="inner",
            num_partitions=2,
            right_tiebreak="price",
            l_schema=left.schema,
            r_schema=right.schema,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    # inclusive tie at ts=10 → max of the three duplicates (9.0)
    assert out["r_price"][0] == 9.0 and out["r_ts"][0] == ts(10)
    # latest earlier group is ts=15 → max of its duplicates (4.0)
    assert out["r_price"][1] == 4.0 and out["r_ts"][1] == ts(15)

    with pytest.raises(ValueError, match="right_tiebreak"):
        asof_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="user_id",
            ts_col="ts",
            right_cols=("ts",),
            right_tiebreak="price",
            l_schema=left.schema,
            r_schema=right.schema,
        )


def test_running_aggregate_matches_pandas(ray_session):
    """Segmented cumsum must equal a pandas groupby().cumsum() per entity,
    with per-entity 1-based row numbers, across entity boundaries."""
    import datetime as dt

    import pandas as pd

    from raycdc.relational import running_aggregate

    rng = np.random.default_rng(5)
    n = 500
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 20, n).astype(np.int64)),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(s))
                 for s in rng.permutation(n)],
                pa.timestamp("us"),
            ),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(rng.integers(-50, 50, n).astype(np.int64)),
        }
    )
    out = (
        running_aggregate(
            ray.data.from_arrow(t),
            entity_col="user_id",
            ts_col="ts",
            order_cols=["event_id"],
            sum_cols=["x"],
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    expect_run = df.groupby("user_id")["x"].cumsum()
    expect_rn = df.groupby("user_id").cumcount() + 1
    assert (out["run_x"].values == expect_run.values).all()
    assert (out["row_num"].values == expect_rn.values).all()


def test_broadcast_join_semi_anti_modes(ray_session):
    from raycdc.relational import broadcast_join

    probe = pa.table(
        {"k": pa.array([1, 2, 3, 4], pa.int64()), "v": pa.array(list("abcd"))}
    )
    build = pa.table({"k": pa.array([2, 4], pa.int64()), "extra": pa.array(["x", "y"])})
    semi = broadcast_join(
        ray.data.from_arrow(probe), build, "k", [], how="semi"
    ).to_pandas()
    assert sorted(semi["k"]) == [2, 4] and list(semi.columns) == ["k", "v"]
    anti = broadcast_join(
        ray.data.from_arrow(probe), build, "k", [], how="anti"
    ).to_pandas()
    assert sorted(anti["k"]) == [1, 3]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="semi/anti"):
        broadcast_join(ray.data.from_arrow(probe), build, "k", [], how="outer")


def test_top_k_per_group_rank_and_ties(ray_session):
    from raycdc.relational import top_k_per_group

    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "v": pa.array([5.0, 9.0, 9.0, 1.0, 3.0, 3.0]),
            "id": pa.array([10, 11, 12, 13, 20, 21], pa.int64()),
        }
    )
    out = (
        top_k_per_group(
            ray.data.from_arrow(t), "g", "v", k=2, tie_cols=["id"], num_partitions=2
        )
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    # g=1: the two 9.0s win, tie broken by id ascending; g=2 has only 2 rows
    assert list(out["id"]) == [11, 12, 20, 21]
    assert list(out["rank"]) == [1, 2, 1, 2]


def test_hopping_window_covers_each_row_m_times(ray_session):
    import datetime as dt

    from raycdc.relational import hopping_window

    t = pa.table(
        {
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 10, 30), dt.datetime(2024, 1, 1, 11, 0)],
                pa.timestamp("us"),
            ),
            "x": pa.array([1, 2], pa.int64()),
        }
    )
    out = (
        hopping_window(
            ray.data.from_arrow(t), window_seconds=7200, hop_seconds=3600
        )
        .to_pandas()
        .sort_values(["x", "window_start"])
        .reset_index(drop=True)
    )
    assert len(out) == 4  # every row in exactly size/hop = 2 windows
    # 10:30 event covered by windows starting 09:00 and 10:00
    assert list(out["window_start"][:2]) == [
        dt.datetime(2024, 1, 1, 9, 0),
        dt.datetime(2024, 1, 1, 10, 0),
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple"):
        hopping_window(ray.data.from_arrow(t), window_seconds=5000, hop_seconds=3600)


def test_pivot_wide_matches_pandas(ray_session):
    """Wide pivot equals a pandas pivot_table; unlisted pivot values
    contribute only to the count; null pivot values contribute 0."""
    import pandas as pd

    from raycdc.relational import pivot_wide

    t = pa.table(
        {
            "g": pa.array(["a", "a", "b", "b", "a"]),
            "p": pa.array(["x", "y", "x", None, "z"]),  # z unlisted
            "v": pa.array([1, 2, 4, 8, 16], pa.int64()),
        }
    )
    out = (
        pivot_wide(
            ray.data.from_arrow(t),
            group_col="g",
            pivot_col="p",
            value_col="v",
            values=["x", "y"],
            count_alias="n",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out[["g", "v_x", "v_y", "n"]].values.tolist() == [
        ["a", 1, 2, 3],
        ["b", 4, 0, 2],
    ]


def test_count_distinct_per_group_null_and_dedup(ray_session):
    """Exact distinct counts: nulls ignored, within- and cross-batch
    duplicates collapse, all-null groups absent."""
    from raycdc.relational import count_distinct_per_group

    t = pa.table(
        {
            "g": pa.array(["a"] * 4 + ["b"] * 3 + ["c"]),
            "v": pa.array(["x", "x", "y", None, "x", None, "z", None]),
        }
    )
    # two single-row blocks force cross-batch duplicates through the exchange
    ds = ray.data.from_arrow(t).union(
        ray.data.from_arrow(pa.table({"g": pa.array(["a"]), "v": pa.array(["y"])}))
    )
    out = (
        count_distinct_per_group(ds, "g", "v", num_partitions=4)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["g"].tolist() == ["a", "b"]  # c is all-null -> absent
    assert out["n_distinct"].tolist() == [2, 2]


def test_range_join_agg_window_bounds(ray_session):
    """Per-left-row windowed count/sum: lower bound inclusive, upper
    exclusive, other-key right rows cancel out, zero-match left rows kept
    with count 0, integer sums exact."""
    import datetime as dt

    from raycdc.relational import range_join_agg

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array(["u1", "u1", "u2", "u3"]),
            "ts": pa.array([ts(10), ts(30), ts(10), ts(50)], pa.timestamp("us")),
        }
    )
    # window [-10, 0): matches r.ts in [l.ts-10, l.ts)
    right = pa.table(
        {
            "user_id": pa.array(["u1", "u1", "u1", "u1", "u2", "u9"]),
            "ts": pa.array(
                [ts(0), ts(5), ts(10), ts(25), ts(5), ts(45)],
                pa.timestamp("us"),
            ),
            "v": pa.array([100, 20, 3, 4, 7, 999], pa.int64()),
        }
    )
    out = (
        range_join_agg(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="user_id",
            left_ts="ts",
            right_ts="ts",
            lower=-10.0,
            upper=0.0,
            value_col="v",
            count_alias="n",
            sum_alias="sv",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(out) == 4
    # u1@10 window [0,10): ts0 incl, ts5 incl, ts10 EXCLUDED -> 100+20
    assert out["n"][0] == 2 and out["sv"][0] == 120
    # u1@30 window [20,30): only ts25 -> 4
    assert out["n"][1] == 1 and out["sv"][1] == 4
    # u2@10 window [0,10): ts5 -> 7 (u1's rows must not leak)
    assert out["n"][2] == 1 and out["sv"][2] == 7
    # u3@50: key absent from right -> kept, zero matches
    assert out["n"][3] == 0 and out["sv"][3] == 0


def test_range_join_agg_count_only_and_forward_window(ray_session):
    """No value_col -> count-only schema; a forward window [0, upper)
    includes the left row's own instant on the right side."""
    import datetime as dt

    from raycdc.relational import range_join_agg

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = pa.table(
        {
            "k": pa.array([7, 8], pa.int64()),
            "ts": pa.array([ts(0), ts(0)], pa.timestamp("us")),
            "id": pa.array([1, 2], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([7, 7, 7], pa.int64()),
            "ts": pa.array([ts(0), ts(4), ts(5)], pa.timestamp("us")),
        }
    )
    out = (
        range_join_agg(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="k",
            left_ts="ts",
            right_ts="ts",
            lower=0.0,
            upper=5.0,
            count_alias="n",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # [0, 5): ts0 and ts4 match, ts5 excluded
    assert out["n"].tolist() == [2, 0]
    assert "sv" not in out.columns and len(out.columns) == 4


def test_scd2_history_intervals(ray_session):
    """SCD2: upserts chain validity intervals per key in (ts, lsn) order,
    a delete closes the prior version without emitting a row, a key whose
    last event is a delete has no current row, and re-insert after delete
    opens a fresh current version."""
    import datetime as dt

    from raycdc.scd import scd2_history

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    log = pa.table(
        {
            "conv_id": pa.array(["a", "a", "a", "a", "b", "b", "c"]),
            "turn_idx": pa.array([0, 0, 0, 0, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                [ts(1), ts(5), ts(9), ts(12), ts(2), ts(6), ts(3)],
                pa.timestamp("us"),
            ),
            "op": pa.array(
                ["insert", "update", "delete", "insert", "insert", "delete", "insert"]
            ),
            "lsn": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "text": pa.array(["v1", "v2", "", "v3", "w1", "", "x1"]),
        }
    )
    out = (
        scd2_history(
            ray.data.from_arrow(log),
            key_cols=("conv_id", "turn_idx"),
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["conv_id", "valid_from"])
        .reset_index(drop=True)
    )
    # a: v1 [1,5), v2 [5,9) closed by delete@9, v3 [12,-) current
    # b: w1 [2,6) closed by delete -> key has NO current row
    # c: x1 [3,-) current
    assert len(out) == 5
    assert out["text"].tolist() == ["v1", "v2", "v3", "w1", "x1"]
    assert out["valid_from"].tolist() == [ts(1), ts(5), ts(12), ts(2), ts(3)]
    assert out["valid_to"][0] == ts(5) and out["valid_to"][1] == ts(9)
    assert out["valid_to"].isna().tolist() == [False, False, True, False, True]
    assert out["is_current"].tolist() == [0, 0, 1, 0, 1]
    assert "op" not in out.columns and "ts" not in out.columns


def test_scd2_history_ts_tie_lsn_order(ray_session):
    """Equal timestamps fall back to lsn order: the later-lsn version wins
    the open interval and the earlier closes at the SAME ts (zero-width)."""
    import datetime as dt

    from raycdc.scd import scd2_history

    t0 = dt.datetime(2024, 1, 1)
    log = pa.table(
        {
            "k": pa.array([9, 9], pa.int64()),
            "ts": pa.array([t0, t0], pa.timestamp("us")),
            "op": pa.array(["insert", "update"]),
            "lsn": pa.array([2, 1], pa.int64()),
            "v": pa.array([20, 10], pa.int64()),
        }
    )
    out = (
        scd2_history(
            ray.data.from_arrow(log), key_cols=("k",), num_partitions=1
        )
        .to_pandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    assert out["v"].tolist() == [10, 20]
    assert out["is_current"].tolist() == [0, 1]
    assert out["valid_to"][0] == t0 and out["valid_to"].isna()[1]


def test_rolling_aggregate_rows_window(ray_session):
    """Bounded ROWS window: sum of the last k rows per entity in (ts,
    order) order; windows shorter than k at segment starts; entities never
    bleed into each other; integer sums exact."""
    import datetime as dt

    from raycdc.relational import rolling_aggregate

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array(
                [ts(1), ts(2), ts(3), ts(4), ts(1), ts(2)], pa.timestamp("us")
            ),
            "eid": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
            "v": pa.array([1, 2, 3, 4, 100, 200], pa.int64()),
        }
    )
    out = (
        rolling_aggregate(
            ray.data.from_arrow(t),
            entity_col="user_id",
            ts_col="ts",
            order_cols=("eid",),
            value_col="v",
            window_rows=3,
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    # user 1: 1, 1+2, 1+2+3, 2+3+4; user 2 restarts: 100, 300
    assert out["roll_v"].tolist() == [1, 3, 6, 9, 100, 300]


def test_group_quantiles_interpolation(ray_session):
    """quantile_cont semantics: linear interpolation between order
    statistics, nulls ignored, all-null groups dropped, multiple
    quantiles from one sort."""
    from raycdc.relational import group_quantiles

    t = pa.table(
        {
            "g": pa.array(["a"] * 4 + ["b"] * 3 + ["c"] * 2),
            "v": pa.array([4.0, 1.0, 2.0, 3.0, 10.0, None, 20.0, None, None]),
        }
    )
    out = (
        group_quantiles(
            ray.data.from_arrow(t),
            group_col="g",
            value_col="v",
            qs=(0.5, 1.0),
            aliases=("p50", "p100"),
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out["g"].tolist() == ["a", "b"]  # c all-null -> dropped
    # a: sorted 1,2,3,4 -> p50 = 2.5; b: 10,20 -> 15 (null ignored)
    assert out["p50"].tolist() == [2.5, 15.0]
    assert out["p100"].tolist() == [4.0, 20.0]


def test_point_in_time_over_scd2(ray_session):
    """Temporal lookup composed over scd2_history: inclusive at
    valid_from, exclusive at valid_to, null during a deleted gap and
    before birth, re-insert visible after its instant, key isolation."""
    import datetime as dt

    from raycdc.scd import point_in_time, scd2_history

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    log = pa.table(
        {
            "conv_id": pa.array(["a", "a", "a", "a", "b"]),
            "turn_idx": pa.array([0, 0, 0, 0, 1], pa.int64()),
            "ts": pa.array(
                [ts(1), ts(5), ts(9), ts(12), ts(2)], pa.timestamp("us")
            ),
            "op": pa.array(["insert", "update", "delete", "insert", "insert"]),
            "lsn": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["v1", "v2", "", "v3", "w1"]),
        }
    )
    hist = scd2_history(
        ray.data.from_arrow(log), key_cols=("conv_id", "turn_idx"),
        num_partitions=2,
    )
    probes = pa.table(
        {
            "conv_id": pa.array(["a", "a", "a", "a", "a", "a", "b"]),
            "turn_idx": pa.array([0, 0, 0, 0, 0, 0, 1], pa.int64()),
            "ts": pa.array(
                [ts(0), ts(1), ts(5), ts(9), ts(10), ts(30), ts(2)],
                pa.timestamp("us"),
            ),
            "pid": pa.array(list(range(7)), pa.int64()),
        }
    )
    out = (
        point_in_time(
            hist,
            ray.data.from_arrow(probes),
            key_cols=("conv_id", "turn_idx"),
            as_of_col="ts",
            payload_cols=("text",),
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    # pid0 @0: before birth -> null; pid1 @1: v1 (inclusive valid_from);
    # pid2 @5: v2 (v1 expired exactly at 5); pid3 @9: deleted gap -> null;
    # pid4 @10: still deleted -> null; pid5 @30: v3 (open); pid6: b/w1
    assert out["text"].tolist() == [None, "v1", "v2", None, None, "v3", "w1"]
    assert out["valid_from"].isna().tolist() == [
        True, False, False, True, True, False, False,
    ]
    assert out["valid_from"][5] == ts(12)


def test_point_in_time_partial_key_overlap(ray_session):
    """Keys that share SOME key columns with a neighbor in sort order
    (('b',0) right after ('a',0)) must not inherit its history — the
    segment boundary is 'ANY key column differs', not 'all differ'."""
    import datetime as dt

    from raycdc.scd import point_in_time

    t0 = dt.datetime(2024, 1, 1)
    hist = pa.table(
        {
            "conv_id": pa.array(["a"]),
            "turn_idx": pa.array([0], pa.int64()),
            "lsn": pa.array([1], pa.int64()),
            "text": pa.array(["av"]),
            "valid_from": pa.array([t0], pa.timestamp("us")),
            "valid_to": pa.array([None], pa.timestamp("us")),
        }
    )
    probes = pa.table(
        {
            "conv_id": pa.array(["b", "a"]),
            "turn_idx": pa.array([0, 0], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2024, 1, 2)] * 2, pa.timestamp("us")
            ),
            "pid": pa.array([0, 1], pa.int64()),
        }
    )
    out = (
        point_in_time(
            ray.data.from_arrow(hist),
            ray.data.from_arrow(probes),
            key_cols=("conv_id", "turn_idx"),
            as_of_col="ts",
            payload_cols=("text",),
            num_partitions=1,
        )
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == [None, "av"]


def test_assemble_group_text(ray_session):
    """Transcript assembly: texts join in order_col order per group with
    the separator, counters match, role counter counts only the given
    value, single-turn groups join to the bare text."""
    from raycdc.relational import assemble_group_text

    t = pa.table(
        {
            "conv_id": pa.array(["c2", "c1", "c1", "c1"]),
            "turn_idx": pa.array([0, 2, 0, 1], pa.int64()),
            "role": pa.array(["user", "user", "user", "assistant"]),
            "text": pa.array(["solo", "three", "one", "two"]),
        }
    )
    out = (
        assemble_group_text(
            ray.data.from_arrow(t),
            group_col="conv_id",
            order_col="turn_idx",
            text_col="text",
            sep="\n",
            role_col="role",
            role_value="user",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert out["transcript"].tolist() == ["one\ntwo\nthree", "solo"]
    assert out["n_turns"].tolist() == [3, 1]
    assert out["n_chars"].tolist() == [len("one\ntwo\nthree"), 4]
    assert out["n_user"].tolist() == [2, 1]


def test_range_join_agg_null_keys_and_inverted_window(ray_session):
    """SQL equality semantics on NULL keys: null-key right rows never
    match, null-key left rows are kept with zero counts; an inverted
    window raises instead of returning negative counts."""
    import datetime as dt

    import pytest

    from raycdc.relational import range_join_agg

    t0 = dt.datetime(2024, 1, 1)
    left = pa.table(
        {
            "k": pa.array(["a", None]),
            "ts": pa.array([t0, t0], pa.timestamp("us")),
            "lid": pa.array([1, 2], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(["a", None, None]),
            "ts": pa.array([t0] * 3, pa.timestamp("us")),
            "v": pa.array([10, 100, 100], pa.int64()),
        }
    )
    out = (
        range_join_agg(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="k",
            lower=0.0,
            upper=5.0,
            value_col="v",
            count_alias="n",
            sum_alias="s",
            num_partitions=2,
            l_schema=left.schema,
            r_schema=right.schema,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [1, 0]
    assert out["s"].tolist() == [10, 0]
    with pytest.raises(ValueError, match="lower"):
        range_join_agg(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="k",
            lower=0.0,
            upper=-10.0,
            l_schema=left.schema,
            r_schema=right.schema,
        )


def test_assemble_group_text_null_texts(ray_session):
    """string_agg semantics: null texts are skipped (not transcript-
    nulling); a group with only null texts gets a null transcript and
    null n_chars but keeps its row counters."""
    from raycdc.relational import assemble_group_text

    t = pa.table(
        {
            "conv_id": pa.array(["c1", "c1", "c1", "c2"]),
            "turn_idx": pa.array([0, 1, 2, 0], pa.int64()),
            "text": pa.array(["a", None, "b", None]),
        }
    )
    out = (
        assemble_group_text(
            ray.data.from_arrow(t),
            group_col="conv_id",
            order_col="turn_idx",
            text_col="text",
            sep="\n",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert out["transcript"].tolist()[0] == "a\nb"
    assert out["transcript"].isna().tolist() == [False, True]
    assert out["n_turns"].tolist() == [3, 1]
    assert out["n_chars"].isna().tolist() == [False, True]


def test_grouping_rollup_levels(ray_session):
    """ROLLUP: full-key rows, prefix subtotal rows with collapsed keys
    null, and one grand-total row; sums/counts consistent across levels."""
    from raycdc.relational import grouping_rollup

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y"]),
            "b": pa.array(["p", "q", "p"]),
            "v": pa.array([1, 2, 4], pa.int64()),
        }
    )
    out = (
        grouping_rollup(
            ray.data.from_arrow(t),
            key_cols=("a", "b"),
            sum_cols=("v",),
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    # 3 full rows + 2 prefix rows + 1 grand total
    assert len(out) == 6
    full = out[out.b.notna()]
    assert sorted(full.v.tolist()) == [1, 2, 4]
    pref = out[out.b.isna() & out.a.notna()].set_index("a")
    assert pref.loc["x", "v"] == 3 and pref.loc["y", "v"] == 4
    total = out[out.a.isna()]
    assert len(total) == 1
    assert total.v.iloc[0] == 7 and total.n_rows.iloc[0] == 3


def test_standardize_zscores(ray_session):
    """Per-group z-scores: mean 0 / unit variance within each group,
    constant groups get null z (no signal), groups don't contaminate
    each other."""
    from raycdc.relational import standardize

    t = pa.table(
        {
            "g": pa.array(["a"] * 4 + ["b"] * 3 + ["c"] * 2),
            "v": pa.array([1, 3, 1, 3, 10, 20, 30, 7, 7], pa.int64()),
        }
    )
    out = (
        standardize(
            ray.data.from_arrow(t), group_col="g", value_col="v",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    a = out[out.g == "a"]["z"].to_numpy()
    # a: values 1,1,3,3 -> mean 2, std 1 -> z = -1,-1,1,1
    np.testing.assert_allclose(a, [-1, -1, 1, 1])
    b = out[out.g == "b"]["z"].to_numpy()
    np.testing.assert_allclose(sorted(b), [-1.22474487, 0, 1.22474487], rtol=1e-6)
    assert out[out.g == "c"]["z"].isna().all()  # constant group -> null


def test_standardize_floats_and_nulls(ray_session):
    """Float value columns work (float64 accumulation path); null values
    are excluded from group stats and get null z themselves; other rows
    in the group stay correct."""
    from raycdc.relational import standardize

    t = pa.table(
        {
            "g": pa.array(["a"] * 5),
            "v": pa.array([1.5, None, 3.5, 1.5, 3.5], pa.float64()),
        }
    )
    out = (
        standardize(
            ray.data.from_arrow(t), group_col="g", value_col="v",
            num_partitions=1,
        )
        .to_pandas()
        .sort_values("v", na_position="last")
        .reset_index(drop=True)
    )
    # valid values 1.5,1.5,3.5,3.5 -> mean 2.5, std 1 -> z = ±1
    np.testing.assert_allclose(out["z"][:4].to_numpy(), [-1, -1, 1, 1])
    assert out["z"].isna().tolist() == [False] * 4 + [True]


def test_percent_rank_ties_and_singletons(ray_session):
    """percent_rank: ties share the first row's rank, endpoints are 0/1,
    single-row groups score 0, groups isolated."""
    from raycdc.relational import percent_rank

    t = pa.table(
        {
            "g": pa.array(["a"] * 5 + ["b"]),
            "v": pa.array([10, 20, 20, 30, 40, 7], pa.int64()),
        }
    )
    out = (
        percent_rank(
            ray.data.from_arrow(t), group_col="g", value_col="v",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    # a: ranks 1,2,2,4,5 over n=5 -> (r-1)/4 = 0, .25, .25, .75, 1
    np.testing.assert_allclose(
        out[out.g == "a"]["pct_rank"].to_numpy(), [0, 0.25, 0.25, 0.75, 1.0]
    )
    assert out[out.g == "b"]["pct_rank"].tolist() == [0.0]


def test_ntile_bucket_sizes(ray_session):
    """NTILE(k): first n%k buckets get the extra row; n<k gives one row
    per bucket starting at 1; deterministic under a total order."""
    from raycdc.relational import ntile

    t = pa.table(
        {
            "g": pa.array(["a"] * 7 + ["b"] * 2),
            "v": pa.array([1, 2, 3, 4, 5, 6, 7, 10, 20], pa.int64()),
        }
    )
    out = (
        ntile(
            ray.data.from_arrow(t), group_col="g", order_cols=("v",), k=3,
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    # a: n=7, k=3 -> sizes 3,2,2
    assert out[out.g == "a"]["tile"].tolist() == [1, 1, 1, 2, 2, 3, 3]
    # b: n=2 < k -> buckets 1 and 2
    assert out[out.g == "b"]["tile"].tolist() == [1, 2]


def test_scd2_update_incremental(ray_session):
    """Incremental history update regenerates the delete lost in
    materialization (the gap survives), chains the new segment's versions
    onto open intervals, and rejects new events that precede the existing
    history for a key."""
    import datetime as dt

    import pytest

    from raycdc.scd import scd2_history, scd2_update

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    log1 = pa.table(
        {
            "k": pa.array(["a", "a", "b"]),
            "ts": pa.array([ts(1), ts(5), ts(2)], pa.timestamp("us")),
            "op": pa.array(["insert", "delete", "insert"]),
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([10, 0, 20], pa.int64()),
        }
    )
    log2 = pa.table(
        {
            "k": pa.array(["a", "b"]),
            "ts": pa.array([ts(9), ts(8)], pa.timestamp("us")),
            "op": pa.array(["insert", "update"]),
            "lsn": pa.array([4, 5], pa.int64()),
            "v": pa.array([11, 21], pa.int64()),
        }
    )
    kw = dict(key_cols=("k",), ts_col="ts", lsn_col="lsn", num_partitions=2)
    hist1 = scd2_history(ray.data.from_arrow(log1), **kw)
    out = (
        scd2_update(hist1, ray.data.from_arrow(log2), **kw)
        .to_pandas()
        .sort_values(["k", "valid_from"])
        .reset_index(drop=True)
    )
    # a: v10 [1,5) — closed by the REGENERATED delete, not by v11 —
    #    then v11 [9, open); b: v20 [2,8), v21 [8, open)
    assert out["v"].tolist() == [10, 11, 20, 21]
    assert out["valid_to"][0] == ts(5)  # not ts(9): the gap survived
    assert out["is_current"].tolist() == [0, 1, 0, 1]

    stale = pa.table(
        {
            "k": pa.array(["a"]),
            "ts": pa.array([ts(3)], pa.timestamp("us")),  # inside history
            "op": pa.array(["insert"]),
            "lsn": pa.array([9], pa.int64()),
            "v": pa.array([99], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="settled history"):
        scd2_update(hist1, ray.data.from_arrow(stale), **kw).to_pandas()


def test_scd2_update_chains_across_segments(ray_session):
    """Repeated incremental updates compose: applying three WAL segments
    one at a time equals one full recompute — the continuous-tail usage."""
    from raycdc.changelog import synthetic_changelog
    from raycdc.scd import scd2_history, scd2_update

    log = synthetic_changelog(n_events=300, seed=77, p_delete=0.2).sort_by(
        [("ts", "ascending"), ("lsn", "ascending")]
    )
    segs = [log.slice(0, 100), log.slice(100, 100), log.slice(200)]
    kw = dict(key_cols=("conv_id", "turn_idx"), num_partitions=4)

    full = (
        scd2_history(ray.data.from_arrow(log), **kw)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx", "valid_from", "lsn"])
        .reset_index(drop=True)
    )
    hist = scd2_history(ray.data.from_arrow(segs[0]), **kw)
    for seg in segs[1:]:
        hist = scd2_update(hist, ray.data.from_arrow(seg), **kw)
    inc = (
        hist.to_pandas()
        .sort_values(["conv_id", "turn_idx", "valid_from", "lsn"])
        .reset_index(drop=True)
    )
    cols = ["conv_id", "turn_idx", "lsn", "text", "valid_from", "valid_to", "is_current"]
    assert inc[cols].equals(full[cols])


def test_sample_to_quota_rates_and_determinism(ray_session):
    """Data-derived quota sampling: over-quota strata sample at the exact
    integer threshold 10000*quota//count, under-quota strata keep every
    row, membership is the pure Knuth-hash function of the key (so two
    runs agree row-for-row).  A NULL stratum is a stratum (SQL GROUP BY
    semantics) — it caps at the quota like any other instead of silently
    vanishing."""
    from raycdc.ops import hash_bucket
    from raycdc.relational import sample_to_quota

    n_big, n_small = 400, 30
    t = pa.table(
        {
            "k": pa.array(np.arange(n_big + n_small + 2, dtype=np.int64)),
            "s": pa.array(
                ["big"] * n_big + ["small"] * n_small + [None, None]
            ),
        }
    )
    quota = 100
    out = sample_to_quota(
        ray.data.from_arrow(t), strata_col="s", key_col="k", quota=quota
    ).to_pandas()

    th_big = 10_000 * quota // n_big
    b = hash_bucket(t["k"]).to_numpy(zero_copy_only=False)
    s = t["s"].to_numpy(zero_copy_only=False)
    want = set(
        int(k)
        for k, bk, st in zip(t["k"].to_numpy(), b, s)
        if (st == "big" and bk < th_big) or st == "small" or st is None
    )
    assert set(out["k"]) == want          # exact membership, incl. null stratum
    assert (out["s"] == "small").sum() == n_small  # under quota: all kept

    # deterministic: a second run returns the identical row set
    again = sample_to_quota(
        ray.data.from_arrow(t), strata_col="s", key_col="k", quota=quota
    ).to_pandas()
    assert set(again["k"]) == want


def test_sequence_integrity_semantics(ray_session):
    """Gaps, duplicate order keys, and adjacent same-value runs are
    counted per group exactly; clean groups report zeros."""
    from raycdc.relational import sequence_integrity

    t = pa.table(
        {
            # c1: clean alternation, contiguous 0..3
            # c2: gap (0->2), adjacent repeat ('a','a' at 2,3)
            # c3: duplicate idx 1 (same value - not an adjacent repeat)
            "conv_id": pa.array(
                ["c1"] * 4 + ["c2"] * 3 + ["c3"] * 3
            ),
            "turn_idx": pa.array(
                [0, 1, 2, 3, 0, 2, 3, 0, 1, 1], pa.int64()
            ),
            "role": pa.array(
                ["u", "a", "u", "a", "u", "a", "a", "u", "a", "a"]
            ),
        }
    )
    out = (
        sequence_integrity(
            ray.data.from_arrow(t),
            group_col="conv_id",
            order_col="turn_idx",
            value_col="role",
            num_partitions=4,
        )
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert out.loc["c1"].tolist() == [4, 0, 3, 0, 0, 0]
    assert out.loc["c2"].tolist() == [3, 0, 3, 0, 1, 1]
    # c3: dup idx counted once; the dup pair (same role, same idx) is NOT
    # an adjacent repeat (d_idx == 0 excluded)
    assert out.loc["c3"].tolist() == [3, 0, 1, 1, 0, 0]
    assert list(out.columns) == [
        "n_rows", "min_idx", "max_idx", "n_dup_idx", "n_gaps",
        "n_adjacent_repeats",
    ]


def test_context_response_pairs_semantics(ray_session):
    """Window truncation, group-boundary isolation, orphan-response drop,
    chronological context order, and non-response rows excluded."""
    from raycdc.relational import context_response_pairs

    t = pa.table(
        {
            "conv_id": pa.array(["c1"] * 6 + ["c2"]),
            "turn_idx": pa.array([1, 2, 3, 4, 5, 6, 1], pa.int64()),
            "role": pa.array(
                ["user", "assistant", "user", "assistant", "user",
                 "assistant", "assistant"]
            ),
            "text": pa.array(["q1", "a1", "q2", "a2", "q3", "a3", "orphan"]),
        }
    )
    out = (
        context_response_pairs(
            ray.data.from_arrow(t), window=4, sep="\n", num_partitions=2
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # c2's assistant turn has no preceding turn -> dropped; user turns never
    # emit; c1 yields one pair per assistant turn
    assert out.conv_id.tolist() == ["c1", "c1", "c1"]
    assert out.turn_idx.tolist() == [2, 4, 6]
    assert out.response.tolist() == ["a1", "a2", "a3"]
    assert out.n_ctx_turns.tolist() == [1, 3, 4]
    assert out.context[0] == "user: q1"
    assert out.context[1] == "user: q1\nassistant: a1\nuser: q2"
    # window=4 truncates: turn 6 sees turns 2..5, oldest first
    assert out.context[2] == "assistant: a1\nuser: q2\nassistant: a2\nuser: q3"


def test_context_response_pairs_window_one(ray_session):
    from raycdc.relational import context_response_pairs

    t = pa.table(
        {
            "conv_id": pa.array(["c"] * 3),
            "turn_idx": pa.array([10, 20, 30], pa.int64()),
            "role": pa.array(["user", "assistant", "assistant"]),
            "text": pa.array(["hello", "hi", "again"]),
        }
    )
    out = (
        context_response_pairs(
            ray.data.from_arrow(t), window=1, num_partitions=2
        )
        .to_pandas()
        .sort_values("turn_idx")
    )
    assert out.context.tolist() == ["user: hello", "assistant: hi"]
    with pytest.raises(ValueError):
        context_response_pairs(ray.data.from_arrow(t), window=0)


def test_merge_adjacent_turns_islands(ray_session):
    from raycdc.relational import merge_adjacent_turns

    t = pa.table(
        {
            "conv_id": pa.array(["a"] * 5 + ["b"] * 2),
            "turn_idx": pa.array([0, 1, 2, 3, 4, 0, 1], pa.int32()),
            "role": pa.array(
                ["user", "user", "assistant", "assistant", "user",
                 "user", "user"]
            ),
            "text": pa.array(["q1", "q2", "a1", None, "q3", "x", "y"]),
        }
    )
    out = (
        merge_adjacent_turns(ray.data.from_arrow(t), num_partitions=2)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # conv a: runs (user 0-1), (assistant 2-3), (user 4); conv b: (user 0-1)
    assert out.conv_id.tolist() == ["a", "a", "a", "b"]
    assert out.turn_idx.tolist() == [0, 2, 4, 0]
    assert out.role.tolist() == ["user", "assistant", "user", "user"]
    # null text is SKIPPED inside a run (string_agg semantics)
    assert out.text.tolist() == ["q1\nq2", "a1", "q3", "x\ny"]
    assert out.n_merged.tolist() == [2, 2, 1, 2]


def test_merge_adjacent_turns_all_null_run_and_single_roles(ray_session):
    from raycdc.relational import merge_adjacent_turns

    t = pa.table(
        {
            "conv_id": pa.array(["c"] * 3),
            "turn_idx": pa.array([1, 2, 3], pa.int32()),
            "role": pa.array(["tool", "tool", "user"]),
            "text": pa.array([None, None, "ok"], pa.string()),
        }
    )
    out = (
        merge_adjacent_turns(ray.data.from_arrow(t), num_partitions=2)
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert out.turn_idx.tolist() == [1, 3]
    # a run with zero non-null texts keeps a null transcript
    assert out.text.isna().tolist() == [True, False]
    assert out.n_merged.tolist() == [2, 1]


def test_preference_pairs_semantics(ray_session):
    import ray.data

    from raycdc.relational import preference_pairs

    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 2, 2, 3, 4, 4, 4], pa.int64()),
            "score": pa.array(
                [5.0, 9.0, 1.0, 4.0, 4.0, 7.0, None, 2.0, 3.0]
            ),
            "id": pa.array([10, 11, 12, 20, 21, 30, 40, 41, 42], pa.int64()),
            "txt": pa.array(list("abcdefghi")),
        }
    )
    out = (
        preference_pairs(
            ray.data.from_arrow(t),
            group_col="g",
            score_col="score",
            id_col="id",
            text_col="txt",
            num_partitions=4,
        )
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    # g=1: chosen id 11 (score 9), rejected id 12 (score 1), margin 8
    assert out.loc[1, "chosen_id"] == 11 and out.loc[1, "rejected_id"] == 12
    assert out.loc[1, "margin"] == 8.0 and out.loc[1, "n_candidates"] == 3
    assert out.loc[1, "chosen_text"] == "b" and out.loc[1, "rejected_text"] == "c"
    # g=2: equal scores -> deterministic (min-id chosen, max-id rejected)
    assert out.loc[2, "chosen_id"] == 20 and out.loc[2, "rejected_id"] == 21
    assert out.loc[2, "margin"] == 0.0
    # g=3: single candidate -> no pair; g=4: null score dropped, 2 remain
    assert 3 not in out.index
    assert out.loc[4, "chosen_id"] == 42 and out.loc[4, "rejected_id"] == 41
    assert out.loc[4, "n_candidates"] == 2
