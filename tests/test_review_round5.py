"""Round-5 self-review fixes: the canonical sorted-segment boundary
helper (partition.segment_starts — one copy of the reduceat-starts
construction instead of one per view kernel) and expire_rows' runlog
lifecycle (record opens BEFORE the sweep, so elapsed_s is real and a
mid-sweep crash leaves a started record)."""

import datetime as dt
import logging

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from raycdc.partition import segment_starts


def test_segment_starts_basics():
    a = pa.array(["a", "a", "b", "b", "b", "c"])
    assert segment_starts(a).tolist() == [0, 2, 5]
    assert segment_starts(pa.array([], pa.string())).tolist() == []
    assert segment_starts(pa.array([7, 7, 7], pa.int64())).tolist() == [0]
    # chunked input and a single run per distinct value
    ch = pa.chunked_array([["x"], ["x", "y"]])
    assert segment_starts(ch).tolist() == [0, 2]
    # reduceat round-trip: group sums via the starts
    keys = pa.array(["a", "a", "b", "c", "c", "c"])
    vals = np.array([1, 2, 10, 100, 200, 300])
    s = segment_starts(keys)
    assert np.add.reduceat(vals, s).tolist() == [3, 10, 600]


def test_segment_starts_refuses_null_keys():
    with pytest.raises(ValueError, match="null keys"):
        segment_starts(pa.array(["a", None, "b"]))


def test_expire_runlog_opens_before_sweep(ray_session, tmp_path, caplog):
    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import expire_rows, replay
    from raycdc.runlog import LOGGER_NAME
    from raycdc.schema import TableSpec

    lg = logging.getLogger(LOGGER_NAME)
    for h in list(lg.handlers):
        lg.removeHandler(h)
    lg.propagate = True
    lg.setLevel(logging.NOTSET)
    caplog.set_level(logging.DEBUG, logger=LOGGER_NAME)

    spec = TableSpec(num_partitions=2)
    lake = str(tmp_path / "lake")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=200, seed=91)),
        lake,
        spec,
    )
    expire_rows(lake, dt.datetime(2200, 1, 1), spec)
    recs = [
        (r.getMessage(), getattr(r, "ctx", {}))
        for r in caplog.records
        if r.name == LOGGER_NAME and r.ctx.get("verb") == "expire"
    ]
    msgs = [m for m, _ in recs]
    assert msgs.index("expire started") < msgs.index("expire finished")
    fin = dict(recs)["expire finished"]
    # elapsed covers the sweep itself, not just the summary write
    assert fin["elapsed_s"] > 0.0
    assert fin["rows_expired"] > 0
