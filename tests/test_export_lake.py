"""Trainer-facing sharded export (engine.export_lake): one atomic shard
per lake partition with marker-based resume — the brief's resumable
output contract (a failed run skips finished partitions; stale shards
re-export when the lake advances)."""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import export_lake, read_lake, replay
from raycdc.schema import TableSpec

from .oracle import python_lww_replay


def _statuses(t: pa.Table) -> dict:
    return {
        int(p): s for p, s in zip(t["part"].to_pylist(), t["status"].to_pylist())
    }


@pytest.fixture()
def lake(ray_session, tmp_path):
    spec = TableSpec(num_partitions=4)
    lk = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=400, seed=81, p_delete=0.1)
    replay(ray.data.from_arrow(log), lk, spec)
    return lk, spec, log, tmp_path


def test_export_jsonl_roundtrip_and_resume(lake):
    lk, spec, log, tmp = lake
    out = str(tmp / "out")
    lin = export_lake(lk, out, spec, format="jsonl")
    st = _statuses(lin)
    assert "exported" in st.values()

    # shard contents == the live LWW state (keys + texts round-trip)
    live = python_lww_replay([log])
    got = {}
    import glob
    import os

    for p in sorted(glob.glob(os.path.join(out, "part-*.jsonl"))):
        for line in open(p):
            r = json.loads(line)
            got[(r["conv_id"], r["turn_idx"])] = r["text"]
    assert got == {k: v["text"] for k, v in live.items()}
    # tombstones are NOT exported
    assert all("op" not in json.loads(line) for line in open(p))

    # second run: everything skipped, bytes untouched
    mtimes = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "part-*.jsonl"))
    }
    lin2 = export_lake(lk, out, spec, format="jsonl")
    assert set(_statuses(lin2).values()) <= {"skipped", "empty"}
    assert mtimes == {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "part-*.jsonl"))
    }


def test_export_crash_window_and_staleness(lake):
    lk, spec, log, tmp = lake
    out = str(tmp / "out")
    export_lake(lk, out, spec, format="jsonl")

    import glob
    import os

    # crash window: data landed, marker lost -> exactly that shard redoes
    markers = sorted(glob.glob(os.path.join(out, "_done-*.json")))
    lost = markers[0]
    part = int(lost.split("-")[-1].split(".")[0])
    os.remove(lost)
    lin = export_lake(lk, out, spec, format="jsonl")
    st = _statuses(lin)
    assert st[part] == "exported"
    assert all(
        v in ("skipped", "empty") for p, v in st.items() if p != part
    )

    # lake advances: only the touched partitions re-export
    more = synthetic_changelog(n_events=80, seed=82)
    more = pa.Table.from_pydict(
        {
            **{c: more[c] for c in more.column_names if c != "lsn"},
            "lsn": pc.add(more["lsn"], 10_000),
        },
        schema=more.schema,
    )
    replay(ray.data.from_arrow(more), lk, spec)
    lin3 = export_lake(lk, out, spec, format="jsonl")
    st3 = _statuses(lin3)
    assert "exported" in st3.values()
    # and the shards again mirror the (new) live state
    live = python_lww_replay([log, more])
    got = {}
    for p in sorted(glob.glob(os.path.join(out, "part-*.jsonl"))):
        for line in open(p):
            r = json.loads(line)
            got[(r["conv_id"], r["turn_idx"])] = r["text"]
    assert got == {k: v["text"] for k, v in live.items()}


def test_export_parquet_and_column_pruning(lake):
    lk, spec, log, tmp = lake
    out = str(tmp / "outp")
    export_lake(lk, out, spec, format="parquet", columns=["conv_id", "turn_idx"])

    import glob
    import os

    import pyarrow.parquet as pq

    shards = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert shards
    t = pa.concat_tables([pq.read_table(p) for p in shards])
    assert t.column_names == ["conv_id", "turn_idx"]
    live = python_lww_replay([log])
    assert sorted(
        zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())
    ) == sorted(live)

    # changing the requested projection is refused (one dataset per
    # dir); overwrite=True re-exports under the new projection
    with pytest.raises(ValueError, match="fresh dir"):
        export_lake(lk, out, spec, format="parquet", columns=["conv_id"])
    lin = export_lake(lk, out, spec, format="parquet", columns=["conv_id"],
                      overwrite=True)
    assert "exported" in _statuses(lin).values()
    t1 = pa.concat_tables(
        [pq.read_table(p_) for p_ in
         sorted(glob.glob(os.path.join(out, "part-*.parquet")))]
    )
    assert t1.column_names == ["conv_id"]
    with pytest.raises(ValueError, match="format"):
        export_lake(lk, out, spec, format="csv")


def test_export_cli_smoke(lake, capsys):
    lk, spec, log, tmp = lake
    from raycdc.__main__ import main

    assert main(["export", lk, str(tmp / "cli_out")]) == 0
    out = capsys.readouterr().out
    assert '"exported"' in out or "exported" in out


def test_export_as_of_reproducible_and_manifest(lake):
    """Snapshot-pinned export: re-exporting the same as_of after the lake
    advanced yields byte-identical shards (the reproducible-training-run
    contract); mixing dataset versions in one dir is refused; the
    manifest describes the finished export."""
    import glob
    import os

    from raycdc import sink as S

    lk, spec, log, tmp = lake
    snap = S.write_snapshot(lk)
    out = str(tmp / "pinned")
    export_lake(lk, out, spec, format="jsonl", as_of=snap,
                columns=["conv_id", "turn_idx", "text"])
    shards = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))
    bytes_before = {p: open(p, "rb").read() for p in shards}
    man = json.load(open(os.path.join(out, "_manifest.json")))
    assert man["as_of"] == snap and man["rows_total"] > 0
    assert man["columns"] == ["conv_id", "turn_idx", "text"]

    # the lake advances...
    more = synthetic_changelog(n_events=120, seed=83)
    more = pa.Table.from_pydict(
        {
            **{c: more[c] for c in more.column_names if c != "lsn"},
            "lsn": pc.add(more["lsn"], 20_000),
        },
        schema=more.schema,
    )
    replay(ray.data.from_arrow(more), lk, spec)

    # ...but the pinned export is bit-stable: everything skipped
    lin = export_lake(lk, out, spec, format="jsonl", as_of=snap,
                      columns=["conv_id", "turn_idx", "text"])
    assert set(_statuses(lin).values()) <= {"skipped", "empty"}
    assert bytes_before == {p: open(p, "rb").read() for p in shards}

    # mixing versions in one dir is refused by the manifest guard
    with pytest.raises(ValueError, match="fresh dir"):
        export_lake(lk, out, spec, format="jsonl",
                    columns=["conv_id", "turn_idx", "text"])
    with pytest.raises(FileNotFoundError, match="no snapshot"):
        export_lake(lk, str(tmp / "nope"), spec, as_of=987654)


def test_export_empty_partition_and_format_guards(ray_session, tmp_path):
    """r5 review regressions: a fully-tombstoned partition publishes a
    rows=0 marker and NO shard (a blank-line jsonl shard crashes
    line-oriented readers) and resumes as skipped; a format change into
    the same dir is refused (old-format shards would sit next to new
    ones); overwrite=True clears the stale configuration's files."""
    import datetime as dt
    import glob
    import os

    spec = TableSpec(num_partitions=2)
    lk = str(tmp_path / "lake")
    n = 40
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i % 6}" for i in range(n)]),
            "turn_idx": pa.array([i % 5 for i in range(n)], pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(["x"] * n),
            "tool": pa.array([""] * n),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, second=i % 60) for i in range(n)],
                pa.timestamp("us"),
            ),
            "op": pa.array(["insert"] * n),
            "lsn": pa.array(range(n), type=pa.int64()),
        }
    )
    replay(ray.data.from_arrow(t), lk, spec)
    # tombstone EVERYTHING: live state empty, both partitions checkpointed
    dels = t.set_column(
        t.schema.get_field_index("op"), "op", pa.array(["delete"] * n)
    ).set_column(
        t.schema.get_field_index("lsn"),
        "lsn",
        pa.array(range(n, 2 * n), type=pa.int64()),
    ).set_column(
        t.schema.get_field_index("ts"),
        "ts",
        pa.array(
            [dt.datetime(2024, 1, 2, second=i % 60) for i in range(n)],
            pa.timestamp("us"),
        ),
    )
    replay(ray.data.from_arrow(dels), lk, spec)

    out = str(tmp_path / "out")
    lin = export_lake(lk, out, spec, format="jsonl")
    assert set(lin["status"].to_pylist()) <= {"empty"}
    assert glob.glob(os.path.join(out, "part-*")) == []  # NO blank shards
    assert glob.glob(os.path.join(out, "_done-*"))  # markers exist
    # resume: the empty result is remembered, nothing re-reads as export
    lin2 = export_lake(lk, out, spec, format="jsonl")
    assert set(lin2["status"].to_pylist()) <= {"skipped", "empty"}

    # format change refused; overwrite clears the old configuration
    with pytest.raises(ValueError, match="fresh dir"):
        export_lake(lk, out, spec, format="parquet")
    export_lake(lk, out, spec, format="parquet", overwrite=True)
    assert glob.glob(os.path.join(out, "part-*.jsonl")) == []


def test_export_refuses_pending_bootstrap(ray_session, tmp_path):
    from raycdc import sink as S

    spec = TableSpec(num_partitions=2)
    lk = str(tmp_path / "lake")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=50, seed=84)),
        lk,
        spec,
    )
    from raycdc.storage import get_storage, write_json_atomic

    write_json_atomic(
        get_storage(lk), S.bootstrap_marker_file(lk), {"pending": True}
    )
    with pytest.raises(RuntimeError, match="unfinished bootstrap"):
        export_lake(lk, str(tmp_path / "o"), spec)


def test_export_jsonl_float_roundtrip(ray_session, tmp_path):
    """double_precision=15 (the pandas writer's cap): float columns keep
    15 significant digits through the jsonl hand-off — the default 10
    silently truncated (r5 review); parquet is the bit-exact path."""
    import datetime as dt
    import glob
    import os

    x = 0.12345678901234567
    spec = TableSpec(
        name="scores",
        schema=pa.schema(
            [
                pa.field("conv_id", pa.string()),
                pa.field("turn_idx", pa.int64()),
                pa.field("score", pa.float64()),
            ]
        ),
        key_cols=("conv_id", "turn_idx"),
        version_cols=("ts", "lsn"),
        partition_key="conv_id",
        num_partitions=2,
        sort_cols=("conv_id", "turn_idx"),
    )
    t = pa.table(
        {
            "conv_id": pa.array(["a", "b"]),
            "turn_idx": pa.array([0, 0], pa.int64()),
            "score": pa.array([x, 2.0]),
            "ts": pa.array([dt.datetime(2024, 1, 1)] * 2, pa.timestamp("us")),
            "op": pa.array(["insert"] * 2),
            "lsn": pa.array([0, 1], pa.int64()),
        }
    )
    lk = str(tmp_path / "lake")
    replay(ray.data.from_arrow(t), lk, spec)
    out = str(tmp_path / "out")
    export_lake(lk, out, spec, format="jsonl")
    got = {}
    for p in glob.glob(os.path.join(out, "part-*.jsonl")):
        for line in open(p):
            r = json.loads(line)
            got[r["conv_id"]] = r["score"]
    # 15 significant digits (the writer's cap); parquet is bit-exact
    assert abs(got["a"] - x) <= abs(x) * 1e-14 and got["a"] != round(x, 10)
    assert got["b"] == 2.0


def test_verify_export_clean_and_defects(lake, capsys):
    """Shard-dir fsck (engine.verify_export): clean export all-ok; a
    deleted shard, a stray file, and a doctored manifest each surface as
    named defects; the CLI exits 3 on any of them."""
    import glob
    import os

    from raycdc.engine import verify_export

    lk, spec, log, tmp = lake
    out = str(tmp / "out")
    export_lake(lk, out, spec, format="jsonl")
    rep = verify_export(out)
    assert set(rep["status"].to_pylist()) == {"ok"}

    from raycdc.__main__ import main

    assert main(["verify", "--export-dir", out]) == 0
    capsys.readouterr()

    # marker present, shard gone -> shard-missing
    shard = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))[0]
    os.rename(shard, os.path.join(out, "bak"))
    rep = verify_export(out)
    assert "shard-missing" in rep["status"].to_pylist()
    assert main(["verify", "--export-dir", out]) == 3
    capsys.readouterr()
    os.rename(os.path.join(out, "bak"), shard)

    # a second shard file claiming the same partition -> duplicate
    dup = shard.replace(".jsonl", ".parquet")
    open(dup, "wb").write(b"junk")
    rep = verify_export(out)
    assert "duplicate" in rep["status"].to_pylist()
    os.remove(dup)

    # stray shard without a marker -> orphan
    stray = os.path.join(out, "part-09999.jsonl")
    open(stray, "w").write('{"x": 1}\n')
    rep = verify_export(out)
    assert "orphan" in rep["status"].to_pylist()
    os.remove(stray)

    # doctored shard -> row-mismatch against its marker
    with open(shard, "a") as f:
        f.write('{"conv_id": "zz", "turn_idx": 0}\n')
    rep = verify_export(out)
    statuses = rep["status"].to_pylist()
    assert "row-mismatch" in statuses

    # doctored manifest totals -> total-mismatch
    man_p = os.path.join(out, "_manifest.json")
    man = json.load(open(man_p))
    man["rows_total"] += 7
    json.dump(man, open(man_p, "w"))
    rep = verify_export(out)
    assert "total-mismatch" in rep["status"].to_pylist()

    # no manifest at all -> single 'missing' finding
    rep = verify_export(str(tmp / "never_exported"))
    assert rep["status"].to_pylist() == ["missing"]


def test_export_concurrent_exporters_converge(lake):
    """Two exporters racing on one out dir (a retried job overlapping a
    stuck one) must converge to a clean verified dir: shard writes are
    temp+rename atomic and markers idempotent, so interleaved runs can
    only ever publish identical bytes."""
    import threading

    from raycdc.engine import verify_export

    lk, spec, log, tmp = lake
    # tombstone one conversation wholesale so at least one partition
    # exercises the empty-path stale-shard cleanup (the TOCTOU branch —
    # r5 review: the race only bites where both racers remove)
    import datetime as dt

    conv = log["conv_id"][0].as_py()
    doomed = log.filter(pc.equal(log["conv_id"], conv))
    dels = pa.table(
        {
            "conv_id": doomed["conv_id"],
            "turn_idx": doomed["turn_idx"],
            "role": doomed["role"],
            "text": doomed["text"],
            "tool": doomed["tool"],
            "ts": pa.array(
                [dt.datetime(2030, 1, 1)] * len(doomed), pa.timestamp("us")
            ),
            "op": pa.array(["delete"] * len(doomed)),
            "lsn": pc.add(doomed["lsn"], 50_000),
            "seg_id": doomed["seg_id"],
        },
        schema=log.schema,
    )
    replay(ray.data.from_arrow(dels), lk, spec)
    out = str(tmp / "race_out")
    # seed a stale shard state so the empty partition has something to
    # clean concurrently
    export_lake(lk, out, spec, format="jsonl")
    import glob as _g
    import os as _o
    for mk in _g.glob(_o.path.join(out, "_done-*.json")):
        _o.remove(mk)  # force both racers down the re-export/clean path
    errs: list = []

    def run():
        try:
            export_lake(lk, out, spec, format="jsonl")
        except Exception as e:  # pragma: no cover - failure surface
            errs.append(e)

    ts = [threading.Thread(target=run) for _ in range(2)]
    for t_ in ts:
        t_.start()
    for t_ in ts:
        t_.join()
    assert errs == []
    rep = verify_export(out)
    assert set(rep["status"].to_pylist()) == {"ok"}
    live = python_lww_replay([log, dels])
    import glob
    import os

    got = {}
    for p in sorted(glob.glob(os.path.join(out, "part-*.jsonl"))):
        for line in open(p):
            r = json.loads(line)
            got[(r["conv_id"], r["turn_idx"])] = r["text"]
    assert got == {k: v["text"] for k, v in live.items()}


def test_verify_export_tolerates_corruption(lake):
    """The fsck must FLAG corruption, never crash on it (r5 review):
    garbage marker JSON, a stale other-format shard next to the real
    one, and unparseable filenames all surface as defect rows."""
    import glob
    import os

    from raycdc.engine import verify_export

    lk, spec, log, tmp = lake
    out = str(tmp / "outc")
    export_lake(lk, out, spec, format="jsonl")

    marker = sorted(glob.glob(os.path.join(out, "_done-*.json")))[0]
    open(marker, "w").write("{truncated")
    shard = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))[0]
    open(shard.replace(".jsonl", ".parquet"), "wb").write(b"junk")
    open(os.path.join(out, "part-old.bak"), "w").write("x")

    rep = verify_export(out)
    statuses = rep["status"].to_pylist()
    assert "unreadable" in statuses  # garbage marker flagged, no crash
    assert "duplicate" in statuses  # stale-format file next to real one
    assert "stray" in statuses  # unparseable name flagged
    # and the recount ran against the MANIFEST's format, not the junk
    items = dict(zip(rep["item"].to_pylist(), statuses))
    assert items.get(os.path.basename(shard)) in ("ok", None)
