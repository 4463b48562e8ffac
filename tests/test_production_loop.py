"""End-to-end production loop capstone: WAL segments arriving over
three rounds drive tail → incrementally-maintained transcript view →
resumable sharded export, and the final shards must equal the one-shot
oracle.  This is the whole engine composed the way an operator would
run it (the reference's event-triggered loop — bqloader.go:105-137 —
stretched into lake + view + hand-off), with exactly-once pinned at
every joint: re-tailing is a no-op, view refreshes cost only the
change, and re-export skips every up-to-date shard."""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import (
    export_lake,
    maintain_transcripts,
    read_lake,
    tail_once,
)
from raycdc.schema import TableSpec

from .oracle import python_lww_replay


def _shard_rows(out: str) -> dict:
    got = {}
    for f in sorted(os.listdir(out)):
        if not f.startswith("part-"):
            continue
        for line in open(os.path.join(out, f)):
            r = json.loads(line)
            got[r["conv_id"]] = (r["transcript"], r["n_turns"])
    return got


def test_tail_view_export_loop_three_rounds(ray_session, tmp_path):
    watch = tmp_path / "wal"
    watch.mkdir()
    lake = str(tmp_path / "lake")
    view = str(tmp_path / "view")
    out = str(tmp_path / "shards")
    spec = TableSpec(num_partitions=4)
    vspec = TableSpec(num_partitions=4)

    log = synthetic_changelog(n_events=900, n_convs=60, seed=200, p_delete=0.1)
    cuts = (300, 600, 900)
    feeds = []
    for i, hi in enumerate(cuts):
        lo = 0 if i == 0 else cuts[i - 1]
        seg = log.filter(
            pc.and_(pc.greater_equal(log["lsn"], lo), pc.less(log["lsn"], hi))
        )
        pq.write_table(seg, str(watch / f"seg-{i:03d}.parquet"))

        new, _ = tail_once(str(watch), lake, spec)
        assert [os.path.basename(p) for p in new] == [f"seg-{i:03d}.parquet"]
        lin = maintain_transcripts(lake, view, spec=spec,
                                   num_partitions=4)
        feeds.append(int(pc.sum(lin["rows_in"]).as_py() or 0))
        exp = export_lake(view, out, vspec, format="jsonl",
                          columns=["conv_id", "transcript", "n_turns"])
        assert "exported" in set(exp["status"].to_pylist())

    # later rounds fed only the change, never the whole lake
    assert feeds[0] > 0 and all(f > 0 for f in feeds)

    # idle round: tail no-op, view steady, export all-skipped
    new, lineage = tail_once(str(watch), lake, spec)
    assert new == [] and lineage is None
    maintain_transcripts(lake, view, spec=spec, num_partitions=4)
    exp = export_lake(view, out, vspec, format="jsonl",
                      columns=["conv_id", "transcript", "n_turns"])
    assert set(exp["status"].to_pylist()) <= {"skipped", "empty"}

    # final shards == the one-shot oracle (python LWW over the full log,
    # assembled per conversation in turn order)
    live = python_lww_replay([log])
    convs: dict = {}
    for (conv, turn), row in sorted(live.items()):
        convs.setdefault(conv, []).append(row["text"])
    want = {c: ("\n".join(ts), len(ts)) for c, ts in convs.items()}
    assert _shard_rows(out) == want
