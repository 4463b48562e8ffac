"""Incrementally maintained approximate-quantile view (maintain_digest):
per-group t-digests kept fresh from the change feed — grow-only, like
maintain_distinct, but with a NON-idempotent merge, so the crash-retry
drill here pins that the protocol's checkpoint layer alone carries
exactly-once (a double-merged retry row is only ever addressed to a
partition that prunes it)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

import raycdc.storage as storage_mod
from raycdc.changelog import synthetic_changelog
from raycdc.engine import maintain_digest, replay
from raycdc.schema import TableSpec

from .oracle import python_lww_replay

SPEC = dict(group_col="role", value_col="turn_idx")


def _as_dict(t: pa.Table) -> dict:
    cols = [c for c in t.column_names if c != "role"]
    return {
        r["role"]: tuple(r[c] for c in cols) for r in t.to_pylist()
    }


def _rank_of(values: np.ndarray, x: float) -> float:
    return float(np.mean(values <= x)) if len(values) else float("nan")


def test_digest_tracks_live_distribution(ray_session, tmp_path):
    log = synthetic_changelog(n_events=1200, n_convs=100, seed=170)
    spec = TableSpec(num_partitions=4)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    replay(ray.data.from_arrow(log), src, spec)
    est = maintain_digest(src, view, **SPEC, spec=spec)

    live = python_lww_replay([log])
    by_role: dict = {}
    for (_conv, turn), row in live.items():
        by_role.setdefault(row["role"], []).append(turn)
    got = {r["role"]: r for r in est.to_pylist()}
    assert set(got) == set(by_role)
    for role, vals in by_role.items():
        v = np.array(sorted(vals), dtype=np.float64)
        assert got[role]["n_values"] == len(v)  # counts are EXACT
        # rank accuracy: the q-estimate must sit within ±0.05 of its
        # target rank (δ=200 is far tighter; 0.05 keeps the pin stable)
        for q, col in ((0.5, "q500"), (0.9, "q900"), (0.99, "q990")):
            r = _rank_of(v, got[role][col])
            assert abs(r - q) <= 0.05 or len(v) < 40


def test_digest_grow_only_across_refreshes(ray_session, tmp_path):
    """Incremental refreshes fold exactly the feed's contributions: the
    union multiset of per-boundary changed-row values (updates re-count
    under the NEW group; deletes fold nothing)."""
    log = synthetic_changelog(n_events=1500, n_convs=120, seed=171, p_delete=0.15)
    spec = TableSpec(num_partitions=4)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")

    cuts = (500, 1000, 1500)
    prev_state: dict = {}
    contrib: dict = {}
    for i, hi in enumerate(cuts):
        lo = 0 if i == 0 else cuts[i - 1]
        seg = log.filter(
            pc.and_(pc.greater_equal(log["lsn"], lo), pc.less(log["lsn"], hi))
        )
        replay(ray.data.from_arrow(seg), src, spec)
        est = maintain_digest(src, view, **SPEC, spec=spec)
        state = python_lww_replay([log.filter(pc.less(log["lsn"], hi))])
        for key, row in state.items():
            if key not in prev_state or prev_state[key] != row:
                contrib.setdefault(row["role"], []).append(key[1])
        prev_state = state

    got = {r["role"]: r for r in est.to_pylist()}
    assert set(got) == set(contrib)
    for role, vals in contrib.items():
        v = np.array(sorted(vals), dtype=np.float64)
        assert got[role]["n_values"] == len(v)
        r = _rank_of(v, got[role]["q500"])
        assert abs(r - 0.5) <= 0.06 or len(v) < 40


def test_digest_steady_noop_and_param_pin(ray_session, tmp_path):
    log = synthetic_changelog(n_events=500, seed=172)
    spec = TableSpec(num_partitions=4)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    replay(ray.data.from_arrow(log), src, spec)
    est1 = _as_dict(maintain_digest(src, view, **SPEC, spec=spec))
    est2 = _as_dict(maintain_digest(src, view, **SPEC, spec=spec))
    assert est1 == est2  # steady no-op: estimates bit-stable
    with pytest.raises(ValueError, match="delta"):
        maintain_digest(src, view, **SPEC, spec=spec, delta=100)
    with pytest.raises(ValueError, match="qs"):
        maintain_digest(src, view, **SPEC, spec=spec, qs=(0.5, 0.9))


def test_digest_crash_retry_never_double_merges(ray_session, tmp_path):
    """The hard window for a NON-idempotent fold: promote fails after a
    completed install; the retry recomputes the same delta AND re-reads
    a view that already folded it — the doubled rows must be pruned by
    the view checkpoints, so the converged estimates equal a run that
    never crashed."""
    log = synthetic_changelog(n_events=900, n_convs=80, seed=173)
    head = log.filter(pc.less(log["lsn"], 450))
    tail = log.filter(pc.greater_equal(log["lsn"], 450))
    spec = TableSpec(num_partitions=4)

    src_a, view_a = str(tmp_path / "src_a"), str(tmp_path / "view_a")
    src_b, view_b = str(tmp_path / "src_b"), str(tmp_path / "view_b")
    for src in (src_a, src_b):
        replay(ray.data.from_arrow(head), src, spec)
    maintain_digest(src_a, view_a, **SPEC, spec=spec)
    maintain_digest(src_b, view_b, **SPEC, spec=spec)
    for src in (src_a, src_b):
        replay(ray.data.from_arrow(tail), src, spec)

    # control: clean second refresh
    est_ctl = _as_dict(maintain_digest(src_b, view_b, **SPEC, spec=spec))

    # faulted: the promote write of view_a's second refresh dies once
    real = storage_mod.write_json_atomic
    state = {"armed": True}

    def flaky(st, path, payload):
        if (
            state["armed"]
            and path.endswith("_feed_pos.json")
            and "pending" not in payload
        ):
            state["armed"] = False
            raise OSError("injected: promote write lost")
        return real(st, path, payload)

    storage_mod.write_json_atomic = flaky
    try:
        with pytest.raises(OSError, match="injected"):
            maintain_digest(src_a, view_a, **SPEC, spec=spec)
    finally:
        storage_mod.write_json_atomic = real

    est_retry = _as_dict(maintain_digest(src_a, view_a, **SPEC, spec=spec))
    assert est_retry == est_ctl


def test_digest_cli_smoke(ray_session, tmp_path, capsys):
    from raycdc.__main__ import main

    log = synthetic_changelog(n_events=400, seed=174)
    spec = TableSpec(num_partitions=4)
    src = str(tmp_path / "src")
    replay(ray.data.from_arrow(log), src, spec)
    assert (
        main(
            [
                "digest", src, str(tmp_path / "view"),
                "--group", "role", "--value", "turn_idx",
                "--qs", "0.5,0.95",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert '"q500"' in out and '"q950"' in out
