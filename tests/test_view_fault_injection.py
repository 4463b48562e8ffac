"""Partial-failure drills for the VIEW maintenance protocol — the three
crash windows of claim → install → promote, injected at the protocol's
own storage writes: (1) the CLAIM write fails (nothing happened), (2) the
PROMOTE write fails after a completed install (the hard window: data
landed, position didn't), (3) a data-file PUT fails inside the install
itself (driven through the raw apply path in test_storage_races — Ray
workers can't see a test-registered fsspec protocol, so the in-worker
window is covered there with the identical _make_apply_fn code path).
In every window the retry must converge to the clean two-step state."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data

import raycdc.storage as storage_mod
from raycdc.changelog import synthetic_changelog
from raycdc.engine import maintain_extrema, read_lake, replay
from raycdc.schema import TableSpec
from raycdc.storage import get_storage, read_json


def _view_state(view):
    parts = [
        t
        for t in ray.get(
            read_lake(view, TableSpec(num_partitions=4)).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return {}
    t = pa.concat_tables(parts)
    return {
        g: (mn, mx, n)
        for g, mn, mx, n in zip(
            t["conv_id"].to_pylist(),
            t["vmin"].to_pylist(),
            t["vmax"].to_pylist(),
            t["n_rows"].to_pylist(),
        )
    }


def _arm_pos_fault(monkeypatch, when: str):
    """Make the NEXT _feed_pos.json write of kind `when` raise once:
    'claim' = the pending-claim write, 'promote' = the position advance."""
    real = storage_mod.write_json_atomic
    state = {"armed": True}

    def flaky(st, path, payload):
        if (
            state["armed"]
            and path.endswith("_feed_pos.json")
            and (
                ("pending" in payload)
                if when == "claim"
                else ("pending" not in payload)
            )
        ):
            state["armed"] = False
            raise OSError(f"injected PUT failure: {when} write of {path}")
        return real(st, path, payload)

    monkeypatch.setattr(storage_mod, "write_json_atomic", flaky)
    return state


def _two_step_reference(tmp_path, head, log, spec, kw):
    ref_src, ref_view = str(tmp_path / "rsrc"), str(tmp_path / "rview")
    replay(ray.data.from_arrow(head), ref_src, spec)
    maintain_extrema(ref_src, ref_view, **kw)
    replay(ray.data.from_arrow(log), ref_src, spec)
    maintain_extrema(ref_src, ref_view, **kw)
    return _view_state(ref_view)


@pytest.mark.parametrize("window", ["claim", "promote"])
def test_view_protocol_write_failure_retry_converges(
    ray_session, tmp_path, monkeypatch, window
):
    spec = TableSpec(num_partitions=4)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    log = synthetic_changelog(n_events=400, seed=61, p_delete=0.1)
    head = log.filter(pc.less(log["lsn"], 200))
    kw = dict(group_col="conv_id", value_col="turn_idx", spec=spec,
              num_partitions=4)

    replay(ray.data.from_arrow(head), src, spec)
    maintain_extrema(src, view, **kw)
    pos0 = read_json(get_storage(view), f"{view}/_feed_pos.json")

    replay(ray.data.from_arrow(log), src, spec)
    _arm_pos_fault(monkeypatch, window)
    with pytest.raises(OSError, match="injected PUT failure"):
        maintain_extrema(src, view, **kw)
    pos = read_json(get_storage(view), f"{view}/_feed_pos.json")
    if window == "claim":
        # nothing happened: position identical, no pending claim
        assert pos == pos0
    else:
        # the hard window: install LANDED but the position did not move —
        # the claim must still be pending so the retry re-feeds under the
        # SAME lsn (checkpoint-pruned to noops)
        assert pos.get("pending") is not None

    # crash-retry converges to the clean two-step reference
    maintain_extrema(src, view, **kw)
    pos2 = read_json(get_storage(view), f"{view}/_feed_pos.json")
    assert pos2.get("pending") is None
    assert _view_state(view) == _two_step_reference(tmp_path, head, log, spec, kw)

    # steady state afterwards
    lin = maintain_extrema(src, view, **kw)
    assert lin.num_rows == 0
