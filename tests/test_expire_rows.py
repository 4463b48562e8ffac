"""Row-level retention (engine.expire_rows): TTL sweeps expressed as
derived delete changelogs through the ordinary replay path."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import expire_rows, read_lake, replay
from raycdc.schema import TableSpec

from .oracle import python_lww_replay


def _state(lake, spec):
    pdf = read_lake(lake, spec).to_pandas()
    return {(r.conv_id, r.turn_idx): r.ts for r in pdf.itertuples(index=False)}


def test_expire_removes_only_older_rows_and_renoops(ray_session, tmp_path):
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=600, seed=71, p_delete=0.1)
    replay(ray.data.from_arrow(log), lake, spec)

    live = python_lww_replay([log])
    all_ts = sorted(r["ts"] for r in live.values())
    cutoff = all_ts[len(all_ts) // 2]

    lin = expire_rows(lake, cutoff, spec)
    assert int(pc.sum(lin["rows_applied"]).as_py()) > 0
    got = _state(lake, spec)
    want = {k: r["ts"] for k, r in live.items() if r["ts"] >= cutoff}
    assert got == want

    # second sweep: nothing left below the cutoff — state unchanged and
    # no partition applies rows
    lin2 = expire_rows(lake, cutoff, spec)
    applied = int(pc.sum(lin2["rows_applied"]).as_py() or 0)
    assert applied == 0
    assert _state(lake, spec) == want


def test_expire_tombstones_cancel_late_redelivery(ray_session, tmp_path):
    """An expired key's tombstone carries (cutoff, next_lsn): a LATE
    redelivered insert of the expired row (old ts, old lsn) must lose LWW
    and stay expired — retention survives at-least-once delivery."""
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=300, seed=72)
    replay(ray.data.from_arrow(log), lake, spec)
    live = python_lww_replay([log])
    all_ts = sorted(r["ts"] for r in live.values())
    cutoff = all_ts[len(all_ts) // 2]
    expire_rows(lake, cutoff, spec)
    want = {k: r["ts"] for k, r in live.items() if r["ts"] >= cutoff}

    # full redelivery of the original log (checkpoint-pruned) PLUS a
    # fresh segment re-inserting an expired key at its old event time
    # with a NEW lsn (passes the checkpoint filter; loses LWW on ts)
    expired_key = next(k for k, r in live.items() if r["ts"] < cutoff)
    late = log.filter(
        pc.and_(
            pc.equal(log["conv_id"], expired_key[0]),
            pc.equal(log["turn_idx"], expired_key[1]),
        )
    ).slice(0, 1)
    max_lsn = int(pc.max(log["lsn"]).as_py())
    late = late.set_column(
        late.schema.get_field_index("lsn"),
        "lsn",
        pa.array(np.array([max_lsn + 100], np.int64)),
    )
    replay(ray.data.from_arrow(pa.concat_tables([log, late])), lake, spec)
    assert _state(lake, spec) == want  # the expired key stayed expired


def test_expire_refuses_non_lww(ray_session, tmp_path):
    spec = TableSpec(num_partitions=4, merge_policy="history")
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=100, seed=73)
    # history replay requires ts-sorted per-key event order
    order = pc.sort_indices(log, sort_keys=[("ts", "ascending"), ("lsn", "ascending")])
    replay(ray.data.from_arrow(log.take(order)), lake, spec)
    with pytest.raises(ValueError, match="lww"):
        expire_rows(lake, dt.datetime(2030, 1, 1), spec)


def test_expire_unreplayed_lake_raises(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError, match="not a replayed lake"):
        expire_rows(str(tmp_path / "nope"), dt.datetime(2030, 1, 1))


def test_expire_cli_smoke(ray_session, tmp_path, capsys):
    import json

    from raycdc.__main__ import main

    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    log = synthetic_changelog(n_events=200, seed=74)
    replay(ray.data.from_arrow(log), lake, spec)
    rc = main(["expire", "--lake", lake, "--older-than", "2200-01-01T00:00:00",
               "--partitions", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_deleted"] > 0  # far-future cutoff expires everything
    assert _state(lake, spec) == {}
