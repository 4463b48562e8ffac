"""Compaction semantics + CLI smoke (subprocess-free: calls main())."""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import compact, read_lake, replay
from raycdc.schema import TableSpec
from raycdc.sink import current_files  # used by tombstone scan below

from .oracle import lake_state, python_lww_replay




def test_compact_drops_tombstones_preserves_state(ray_session, tmp_path):
    t = synthetic_changelog(n_events=1200, seed=50, p_delete=0.25)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(t), lake, spec)
    before = lake_state(lake)
    lineage = compact(lake, spec)
    assert sum(lineage["tombstones"].to_pylist()) > 0
    assert lake_state(lake) == before
    # stored files now hold zero tombstones
    for p in current_files(lake):
        t2 = pq.read_table(p)
        assert (
            pa.compute.sum(
                pa.compute.cast(pa.compute.equal(t2["op"], "delete"), pa.int64())
            ).as_py()
            or 0
        ) == 0
    # second compact is a noop
    lineage2 = compact(lake, spec)
    assert set(lineage2["status"].to_pylist()) == {"noop"}


def test_compact_then_future_segments_still_correct(ray_session, tmp_path):
    """Tombstone GC must not change the outcome of later (higher-lsn)
    segments — including a re-insert after a compacted delete."""
    t = synthetic_changelog(n_events=1600, seed=51, p_delete=0.25)
    first = t.filter(pa.compute.less(t["lsn"], 800))
    second = t.filter(pa.compute.greater_equal(t["lsn"], 800))
    spec = TableSpec(num_partitions=4)

    lake_a = str(tmp_path / "compacted")
    replay(ray.data.from_arrow(first), lake_a, spec)
    compact(lake_a, spec)
    replay(ray.data.from_arrow(second), lake_a, spec)

    lake_b = str(tmp_path / "plain")
    replay(ray.data.from_arrow(first), lake_b, spec)
    replay(ray.data.from_arrow(second), lake_b, spec)

    assert lake_state(lake_a) == lake_state(lake_b)
    expect = {k: r["text"] for k, r in python_lww_replay([t]).items()}
    assert lake_state(lake_a) == expect


def test_cli_replay_compact_show(ray_session, tmp_path, capsys):
    import json

    from raycdc.__main__ import main

    t = synthetic_changelog(n_events=600, seed=52)
    seg = tmp_path / "seg.parquet"
    pq.write_table(t, seg)
    lake = str(tmp_path / "clilake")

    assert main(["replay", str(seg), "--lake", lake, "--partitions", "4"]) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["rows_applied"] > 0

    assert main(["compact", "--lake", lake, "--partitions", "4"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["tombstones_dropped"] >= 0

    assert main(["show", "--lake", lake, "--partitions", "4"]) == 0
    out3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["live_rows"] > 0
    assert "conv_id" in out3["schema"]


def test_cli_history_and_lookup(ray_session, tmp_path, capsys):
    import json

    from raycdc.__main__ import main

    t = synthetic_changelog(n_events=400, seed=53)
    seg = tmp_path / "seg.parquet"
    pq.write_table(t, seg)
    lake = str(tmp_path / "histlake")
    main(["replay", str(seg), "--lake", lake, "--partitions", "4"])
    capsys.readouterr()

    assert main(["history", "--lake", lake]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_applied_total"] > 0
    assert out["partitions_touched"] >= 1

    conv = t["conv_id"][0].as_py()
    assert main(["lookup", "--lake", lake, "--key", conv, "--partitions", "4"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["rows"] >= 1


def test_cli_history_counts_rounds_and_handles_empty(ray_session, tmp_path, capsys):
    import json

    from raycdc.__main__ import main

    lake = str(tmp_path / "roundslake")
    # empty lake → empty summary, no crash
    import os

    os.makedirs(lake, exist_ok=True)
    assert main(["history", "--lake", lake]) == 0
    out0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out0 == {
        "apply_rounds": 0,
        "rows_applied_total": 0,
        "partitions_touched": 0,
        "statuses": [],
    }

    t = synthetic_changelog(n_events=400, seed=54)
    first = t.filter(pa.compute.less(t["lsn"], 200))
    second = t.filter(pa.compute.greater_equal(t["lsn"], 200))
    for part in (first, second):
        seg = tmp_path / "seg_tmp.parquet"
        pq.write_table(part, seg)
        main(["replay", str(seg), "--lake", lake, "--partitions", "4"])
    capsys.readouterr()
    assert main(["history", "--lake", lake]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["apply_rounds"] == 2  # one lineage file per apply round


def test_cli_profile_sketches(ray_session, capsys):
    """profile command: row count, HLL distinct, quantiles for numeric
    columns — one JSON line per invocation."""
    import json

    from raycdc.__main__ import main

    rc = main(
        [
            "profile",
            "/root/testdata/sf0.001/events.parquet",
            "--cols",
            "user_id,value,event_type",
        ]
    )
    assert rc in (0, None)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["user_id"]["rows"] == 1000
    assert 13 <= out["user_id"]["approx_ndistinct"] <= 17
    assert "quantiles" in out["value"] and out["value"]["quantiles"]["0.5"] > 0
    assert "quantiles" not in out["event_type"]  # string column: no quantiles
    assert 4 <= out["event_type"]["approx_ndistinct"] <= 6


def test_cli_diff_command(ray_session, tmp_path, capsys):
    import json

    from raycdc.__main__ import main

    old = pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array(["a", "b", "c"])})
    new = pa.table({"k": pa.array([1, 2, 4], pa.int64()), "v": pa.array(["a", "B", "d"])})
    po, pn = str(tmp_path / "old.parquet"), str(tmp_path / "new.parquet")
    pq.write_table(old, po)
    pq.write_table(new, pn)
    out_dir = str(tmp_path / "diff_out")
    rc = main(
        [
            "diff", po, pn, "--keys", "k", "--values", "v",
            "--out", out_dir, "--partitions", "2",
        ]
    )
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["events"] == {"update": 1, "insert": 1, "delete": 1}
    assert len(glob.glob(out_dir + "/*.parquet")) > 0


def test_cli_scd2_history(ray_session, tmp_path, capsys):
    """`raycdc scd2` materializes the version history of a changelog
    parquet: versions >= live keys, every key with a surviving last upsert
    has exactly one current row, and the history agrees with a python LWW
    replay on the current snapshot."""
    import json

    from raycdc.__main__ import main

    t = synthetic_changelog(n_events=600, seed=53, p_delete=0.2)
    seg = tmp_path / "seg.parquet"
    pq.write_table(t, seg)
    out_dir = str(tmp_path / "hist")

    assert main(
        ["scd2", str(seg), "--out", out_dir, "--partitions", "4"]
    ) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    hist = ray.data.read_parquet(out_dir).to_pandas()
    assert rep["versions"] == len(hist)
    assert rep["current"] == int(hist["is_current"].sum())
    # current rows must equal the python LWW final state's text per key
    want = python_lww_replay([t])
    cur = hist[hist.is_current == 1]
    got = {
        (r.conv_id, r.turn_idx): r.text for r in cur.itertuples()
    }
    assert got == {k: v["text"] for k, v in want.items()}


def test_cli_bootstrap_then_replay(ray_session, tmp_path, capsys):
    """`raycdc bootstrap` initializes a fresh lake from a snapshot parquet;
    a following `replay` of the full log prunes the pre-snapshot head."""
    import json

    import pyarrow.compute as pc
    import ray

    import ray.data

    from raycdc.__main__ import main
    from raycdc.engine import merged_state, read_lake
    from raycdc.schema import TableSpec

    t = synthetic_changelog(n_events=800, seed=54)
    cut = 500
    head = t.filter(pc.less_equal(t["lsn"], cut))
    spec = TableSpec(num_partitions=4)
    snap_ds = merged_state(
        ray.data.from_arrow(head), spec, keep_envelope=True, drop_deletes=False
    )
    snap = pa.concat_tables([ray.get(r) for r in snap_ds.to_arrow_refs()])
    snap_p = tmp_path / "snapshot.parquet"
    pq.write_table(snap, snap_p)
    seg = tmp_path / "wal.parquet"
    pq.write_table(t, seg)
    lake = str(tmp_path / "bootlake")

    assert (
        main(
            [
                "bootstrap", str(snap_p), "--lake", lake,
                "--at-lsn", str(cut), "--partitions", "4",
            ]
        )
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["partitions"] == 4 and out["at_lsn"] == cut

    assert main(["replay", str(seg), "--lake", lake, "--partitions", "4"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["rows_applied"] > 0

    # final state equals a clean one-shot replay
    want_lake = str(tmp_path / "want")
    assert main(["replay", str(seg), "--lake", want_lake, "--partitions", "4"]) == 0
    capsys.readouterr()
    got = read_lake(lake, spec).to_pandas().sort_values(["conv_id", "turn_idx"])
    want = (
        read_lake(want_lake, spec).to_pandas().sort_values(["conv_id", "turn_idx"])
    )
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_compact_fast_path_skips_clean_partitions(ray_session, tmp_path):
    """After a compact, checkpoints record zero stored tombstones; the next
    compact must not even READ those partitions — proven by removing a
    clean partition's data file and compacting anyway."""
    import os

    from raycdc.sink import part_file, read_checkpoint

    t = synthetic_changelog(n_events=800, seed=51, p_delete=0.25)
    lake = str(tmp_path / "lake")
    spec = TableSpec(num_partitions=4)
    replay(ray.data.from_arrow(t), lake, spec)
    compact(lake, spec)
    for p in range(4):
        assert read_checkpoint(lake, p)["tombstones"] == 0

    victim = 2
    os.remove(part_file(lake, victim))  # unreadable if compact tried
    lineage = compact(lake, spec)
    assert set(lineage["status"].to_pylist()) == {"noop"}
    assert lineage.num_rows == 4
