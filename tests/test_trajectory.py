"""Tests for raycdc.trajectory: transition matrices, token-budget context
trimming, and sliding turn windows — each checked against a plain-Python
re-implementation over a synthetic multi-conversation table."""

import collections

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from raycdc import trajectory as TJ

RNG = np.random.default_rng(421)
ROLES = ["user", "assistant", "tool"]


def _make_table(n_convs: int = 23, max_turns: int = 17) -> pa.Table:
    conv, idx, role, text = [], [], [], []
    for c in range(n_convs):
        n = int(RNG.integers(1, max_turns))
        # non-dense turn indices: deletes punch holes in real transcripts
        turns = sorted(RNG.choice(np.arange(3 * n), size=n, replace=False))
        for t in turns:
            conv.append(f"c{c}")
            idx.append(int(t))
            role.append(ROLES[int(RNG.integers(0, 3))])
            text.append(
                " ".join(f"w{int(w)}" for w in RNG.integers(0, 50, size=int(RNG.integers(1, 9))))
            )
    return pa.table(
        {
            "conv_id": pa.array(conv),
            "turn_idx": pa.array(idx, pa.int32()),
            "role": pa.array(role),
            "text": pa.array(text),
        }
    )


def _rows(tbl: pa.Table) -> list[dict]:
    return tbl.to_pylist()


def _by_conv(tbl: pa.Table) -> dict[str, list[dict]]:
    out: dict[str, list[dict]] = collections.defaultdict(list)
    for r in sorted(_rows(tbl), key=lambda r: (r["conv_id"], r["turn_idx"])):
        out[r["conv_id"]].append(r)
    return out


@pytest.fixture(scope="module")
def table():
    return _make_table()


def test_transition_counts_match_python(table):
    ds = ray.data.from_arrow(table).repartition(5)
    got = {
        (r["from_role"], r["to_role"]): r["n_transitions"]
        for r in TJ.transition_counts(ds, num_partitions=7).take_all()
    }
    want: collections.Counter = collections.Counter()
    for turns in _by_conv(table).values():
        for prev, cur in zip(turns, turns[1:]):
            want[(prev["role"], cur["role"])] += 1
    assert got == dict(want)
    assert sum(got.values()) == len(table) - len(_by_conv(table))


def test_trim_to_token_budget_is_maximal_suffix(table):
    budget = 12
    ds = ray.data.from_arrow(table).repartition(4)
    got = _by_conv(
        pa.Table.from_pylist(
            TJ.trim_to_token_budget(ds, budget, num_partitions=6).take_all(),
            schema=table.schema,
        )
    )
    want: dict[str, list[dict]] = {}
    for conv, turns in _by_conv(table).items():
        kept, total = [], 0
        for r in reversed(turns):
            total += len(r["text"].split(" "))
            if total > budget:
                break
            kept.append(r)
        if kept:
            want[conv] = list(reversed(kept))
    assert dict(got) == want
    # every kept suffix is maximal: adding the preceding turn would overflow
    full = _by_conv(table)
    for conv, kept in got.items():
        all_turns = full[conv]
        k = len(kept)
        assert all_turns[-k:] == kept
        if k < len(all_turns):
            overflow = sum(
                len(r["text"].split(" ")) for r in all_turns[-(k + 1):]
            )
            assert overflow > budget


def test_trim_budget_edges(table):
    ds = ray.data.from_arrow(table)
    assert TJ.trim_to_token_budget(ds, 0).count() == 0
    assert TJ.trim_to_token_budget(ds, 10**9).count() == len(table)
    with pytest.raises(ValueError):
        TJ.trim_to_token_budget(ds, -1)


@pytest.mark.parametrize("window,stride", [(3, 1), (4, 2), (2, 5)])
def test_sliding_windows_match_python(table, window, stride):
    ds = ray.data.from_arrow(table).repartition(3)
    got = {
        (r["conv_id"], r["win_start"]): (r["window_text"], r["n_turns"])
        for r in TJ.sliding_windows(
            ds, window, stride, num_partitions=5
        ).take_all()
    }
    want = {}
    for conv, turns in _by_conv(table).items():
        for s in range(0, len(turns) - window + 1, stride):
            want[(conv, s)] = (
                "\n".join(r["text"] for r in turns[s : s + window]),
                window,
            )
    assert got == want


def test_sliding_windows_short_groups_and_validation(table):
    ds = ray.data.from_arrow(table)
    huge = TJ.sliding_windows(ds, 10**6, 1)
    assert huge.count() == 0
    with pytest.raises(ValueError):
        TJ.sliding_windows(ds, 0, 1)
    with pytest.raises(ValueError):
        TJ.sliding_windows(ds, 2, 0)


# ---------------------------------------------------------------------------
# edit_pairs


def _make_changelog(n_convs: int = 17, n_events: int = 400) -> pa.Table:
    """Random changelog with enough per-key event stacking that updates
    regularly chain onto inserts, other updates, and deletes."""
    rng = np.random.default_rng(97)
    conv = [f"c{int(c)}" for c in rng.integers(0, n_convs, size=n_events)]
    turn = rng.integers(0, 4, size=n_events).astype("int32")  # heavy stacking
    op = np.array(["insert", "update", "delete"])[
        rng.choice(3, size=n_events, p=[0.4, 0.45, 0.15])
    ]
    text = [f"t{i}" for i in range(n_events)]
    ts = rng.integers(0, 10_000, size=n_events)  # duplicate ts values occur
    return pa.table(
        {
            "conv_id": pa.array(conv),
            "turn_idx": pa.array(turn),
            "text": pa.array(text),
            "ts": pa.array(ts, pa.timestamp("us")),
            "op": pa.array(op),
            "lsn": pa.array(np.arange(n_events, dtype=np.int64)),
        }
    )


def _edit_pairs_reference(tbl: pa.Table) -> set[tuple]:
    rows = sorted(
        tbl.to_pylist(),
        key=lambda r: (r["conv_id"], r["turn_idx"], r["ts"], r["lsn"]),
    )
    out = set()
    for prev, cur in zip(rows, rows[1:]):
        if (
            cur["op"] == "update"
            and (prev["conv_id"], prev["turn_idx"])
            == (cur["conv_id"], cur["turn_idx"])
            and prev["op"] != "delete"
        ):
            out.add(
                (
                    cur["conv_id"],
                    cur["turn_idx"],
                    prev["text"],
                    cur["text"],
                    cur["lsn"],
                )
            )
    return out


def test_edit_pairs_match_python_reference():
    tbl = _make_changelog()
    ds = ray.data.from_arrow(tbl).random_shuffle(seed=7).repartition(6)
    got = {
        (
            r["conv_id"],
            r["turn_idx"],
            r["before_text"],
            r["after_text"],
            r["lsn"],
        )
        for r in TJ.edit_pairs(ds, num_partitions=4).take_all()
    }
    want = _edit_pairs_reference(tbl)
    assert want, "fixture must actually produce edit pairs"
    assert got == want


def test_edit_pairs_semantics_pinned():
    """Hand-built log: update-after-insert pairs, update-after-update
    chains, update-after-delete and first-event updates emit nothing."""
    tbl = pa.table(
        {
            "conv_id": pa.array(["a", "a", "a", "a", "a", "b", "c", "c", "c"]),
            "turn_idx": pa.array([0, 0, 0, 0, 0, 1, 2, 2, 2], pa.int32()),
            "text": pa.array(
                ["v1", "v2", "v3", None, "v4", "orphan", "x1", "x2", "x3"]
            ),
            "ts": pa.array([1, 2, 3, 4, 5, 1, 1, 2, 3], pa.timestamp("us")),
            "op": pa.array(
                [
                    "insert",
                    "update",  # (v1 -> v2)
                    "update",  # (v2 -> v3)
                    "delete",
                    "update",  # after delete: no before, emits nothing
                    "update",  # first event of its key: nothing
                    "insert",
                    "delete",
                    "insert",  # re-insert: not an update, nothing
                ]
            ),
            "lsn": pa.array(range(9), pa.int64()),
        }
    )
    got = sorted(
        TJ.edit_pairs(
            ray.data.from_arrow(tbl), num_partitions=2
        ).take_all(),
        key=lambda r: r["lsn"],
    )
    assert [(r["before_text"], r["after_text"]) for r in got] == [
        ("v1", "v2"),
        ("v2", "v3"),
    ]
    assert [r["lsn"] for r in got] == [1, 2]
