"""Property-based tests (hypothesis) for the merge algebra and scalar ops.

Beyond the reference's test strategy (SURVEY.md §5 notes it has no
property tests): these pin the invariants the distributed plan RELIES on —
LWW merge must be associative/idempotent for combiner + shuffle-merge
splits to be equivalent to a single global merge.
"""

import datetime

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from raycdc.merge import lww_dedup
from raycdc.ops import clean_number
from raycdc.schema import CHANGELOG_SCHEMA

# --- changelog strategy ----------------------------------------------------

_ops = st.sampled_from(["insert", "update", "delete"])


@st.composite
def changelogs(draw, max_rows=60):
    n = draw(st.integers(0, max_rows))
    rows = []
    for i in range(n):
        rows.append(
            {
                "conv_id": f"c{draw(st.integers(0, 5))}",
                "turn_idx": draw(st.integers(0, 4)),
                "role": "user",
                "text": f"t{i}",
                "tool": "",
                "ts": datetime.datetime(2024, 1, 1)
                + datetime.timedelta(seconds=draw(st.integers(0, 8))),
                "op": draw(_ops),
                "lsn": i,  # unique, the tiebreak
                "seg_id": 0,
            }
        )
    if not rows:
        return CHANGELOG_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=CHANGELOG_SCHEMA)


def _state(table: pa.Table) -> dict:
    out = lww_dedup(table, drop_deletes=True)
    return {
        (c, i): t
        for c, i, t in zip(
            out["conv_id"].to_pylist(),
            out["turn_idx"].to_pylist(),
            out["text"].to_pylist(),
        )
    }


@settings(max_examples=60, deadline=None)
@given(changelogs(), st.integers(0, 60))
def test_lww_split_merge_equals_global_merge(log, cut):
    """combiner-then-merge ≡ one global merge, for ANY row split — the
    invariant that makes per-batch pre-dedup + shuffle-merge correct."""
    cut = min(cut, len(log))
    a, b = log.slice(0, cut), log.slice(cut)
    partial = pa.concat_tables(
        [
            lww_dedup(a, drop_deletes=False),
            lww_dedup(b, drop_deletes=False),
        ]
    )
    assert _state(partial) == _state(log)


@settings(max_examples=40, deadline=None)
@given(changelogs())
def test_lww_idempotent_under_self_union(log):
    """merging a log with itself changes nothing — replay idempotence."""
    doubled = pa.concat_tables([log, log])
    assert _state(doubled) == _state(log)


@settings(max_examples=40, deadline=None)
@given(changelogs())
def test_lww_order_insensitive(log):
    """row order never matters (the engine gives no ordering guarantees
    before the final sort — reference analog handler.go:172-175)."""
    if len(log) == 0:
        return
    reversed_ = log.take(pa.array(list(reversed(range(len(log))))))
    assert _state(reversed_) == _state(log)


@settings(max_examples=40, deadline=None)
@given(changelogs())
def test_lww_matches_python_fold(log):
    """vectorized kernel ≡ row-at-a-time reference fold."""
    state = {}
    for r in log.to_pylist():
        k = (r["conv_id"], r["turn_idx"])
        v = (r["ts"], r["lsn"])
        if k not in state or v > state[k][0]:
            state[k] = (v, r)
    expect = {
        k: r["text"] for k, (v, r) in state.items() if r["op"] != "delete"
    }
    assert _state(log) == expect


# --- clean_number ----------------------------------------------------------


@settings(max_examples=120, deadline=None)
@given(st.text(alphabet="0123456789.,-¥円USD ", max_size=16))
def test_clean_number_idempotent_and_shape(s):
    out = clean_number(pa.array([s]))[0].as_py()
    # idempotence: cleaning a cleaned value is a no-op
    again = clean_number(pa.array([out]))[0].as_py()
    assert again == out
    # output alphabet: digits, dots, at most one leading minus
    body = out[1:] if out.startswith("-") else out
    assert all(c in "0123456789." for c in body)
    # empty unless it contains a digit
    if not any(c.isdigit() for c in s):
        assert out == ""
