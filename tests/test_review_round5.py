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


def test_chunk_tokens_large_string_and_offsets():
    """chunk_tokens must honor the both-offset-widths rule: a
    large_string text column chunks identically (large_string out), and
    the gather uses int64 list offsets (r5 review — the int32 path had
    no kernel for the large child and overflowed on big blocks)."""
    from raycdc.text import chunk_tokens

    texts = ["a b c d e", "", "x  y"]
    t_small = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    t_large = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    small = chunk_tokens(t_small, window=3, stride=2)
    big = chunk_tokens(t_large, window=3, stride=2)
    assert small.schema.field("chunk").type == pa.string()
    assert big.schema.field("chunk").type == pa.large_string()
    assert big.to_pydict() == small.to_pydict()


def test_digest_invalid_args_do_not_poison_view_dir(ray_session, tmp_path):
    """Argument validation precedes the param pin: a rejected call must
    leave a fresh view dir reusable with corrected args (r5 review)."""
    import ray
    import ray.data

    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import maintain_digest, replay
    from raycdc.schema import TableSpec

    spec = TableSpec(num_partitions=2)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=100, seed=95)),
        src,
        spec,
    )
    with pytest.raises(ValueError, match="collide"):
        maintain_digest(src, view, "role", "turn_idx", spec=spec,
                        qs=(0.5, 0.5001))
    with pytest.raises(ValueError, match="delta"):
        maintain_digest(src, view, "role", "turn_idx", spec=spec, delta=0)
    # corrected retry on the SAME dir succeeds — nothing was pinned
    est = maintain_digest(src, view, "role", "turn_idx", spec=spec)
    assert est.num_rows > 0
