"""Zero-shuffle co-partitioned lake join (engine.colocated_join).

Two lakes sharing the FNV-1a layout (same partition key, same
num_partitions) are co-located by construction; the join runs one local
Arrow hash-join task per partition pair — no exchange.  Generalizes the
reference's one-table-per-handler model (/root/reference/handler.go:20-48)
where joins were deferred to the warehouse.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import colocated_join, read_lake, refresh_join_view, replay
from raycdc.schema import TableSpec

from .oracle import python_lww_replay


def _dim_table(conv_ids: list[str]) -> pa.Table:
    """One dimension row per conversation, keyed (conv_id,) at turn 0."""
    n = len(conv_ids)
    return pa.table(
        {
            "conv_id": pa.array(conv_ids),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "ts": pa.array(
                [1_700_000_000_000_000] * n, pa.timestamp("us")
            ),
            "op": pa.array(["insert"] * n),
            "lsn": pa.array(range(n), pa.int64()),
            "seg_id": pa.array([0] * n, pa.int32()),
            "dim": pa.array([f"dim-{c}" for c in conv_ids]),
        }
    )


@pytest.fixture()
def lakes(tmp_path):
    wal = synthetic_changelog(n_events=1500, n_convs=40, seed=11, shuffle=True)
    left_spec = TableSpec(num_partitions=8)
    left = str(tmp_path / "left")
    replay(ray.data.from_arrow(wal), left, left_spec)

    # dimension lake covers only the EVEN conversations — odd ones must
    # drop (inner) or null out (left outer)
    covered = [f"conv-{i}" for i in range(0, 40, 2)]
    right_spec = TableSpec(num_partitions=8)
    right = str(tmp_path / "right")
    replay(ray.data.from_arrow(_dim_table(covered)), right, right_spec)

    live = {
        k: r for k, r in python_lww_replay([wal]).items()
    }
    return left, left_spec, right, right_spec, live, set(covered)


def test_inner_join_matches_python_oracle(lakes):
    left, ls, right, rs, live, covered = lakes
    out = colocated_join(
        left,
        right,
        on=("conv_id",),
        spec_left=ls,
        spec_right=rs,
        left_columns=["conv_id", "turn_idx", "text"],
        right_columns=["dim"],
    )
    t = pa.concat_tables(
        [ray.get(r) for r in out.to_arrow_refs()], promote_options="permissive"
    )
    expect = {
        (c, ti): f"dim-{c}" for (c, ti) in live if c in covered
    }
    got = {
        (c, ti): d
        for c, ti, d in zip(
            t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist(),
            t["dim"].to_pylist(),
        )
    }
    assert got == expect
    # text column survived the join untouched
    texts = {
        (c, ti): x
        for c, ti, x in zip(
            t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist(),
            t["text"].to_pylist(),
        )
    }
    for k, x in texts.items():
        assert x == live[k]["text"]


def test_left_outer_keeps_uncovered_with_nulls(lakes):
    left, ls, right, rs, live, covered = lakes
    out = colocated_join(
        left,
        right,
        on=("conv_id",),
        spec_left=ls,
        spec_right=rs,
        how="left",
        left_columns=["conv_id", "turn_idx"],
        right_columns=["dim"],
    )
    t = pa.concat_tables(
        [ray.get(r) for r in out.to_arrow_refs()], promote_options="permissive"
    )
    assert t.num_rows == len(live)
    null_convs = {
        c
        for c, d in zip(t["conv_id"].to_pylist(), t["dim"].to_pylist())
        if d is None
    }
    assert null_convs == {c for c, _ in live if c not in covered}


def test_join_pads_unevolved_partitions(tmp_path):
    """Partitions written BEFORE a schema evolution lack the evolved
    column and keep the narrow key type; the join must null-pad and widen
    them to the lake's canonical (registry) schema so every task emits one
    block schema."""
    base = synthetic_changelog(n_events=1000, n_convs=16, seed=31)
    evolved = synthetic_changelog(
        n_events=2000, n_convs=16, seed=31, evolve_from_lsn=1000
    )
    later = evolved.filter(pc.greater_equal(evolved["lsn"], 1000))
    # restrict the evolved segment to ONE conversation so only its
    # partition is rewritten with the evolved schema
    target = later["conv_id"][0].as_py()
    later = later.filter(pc.equal(later["conv_id"], target))
    assert len(later) > 0

    spec = TableSpec(num_partitions=8)
    left = str(tmp_path / "left")
    replay(ray.data.from_arrow(base), left, spec)
    replay(ray.data.from_arrow(later), left, spec)

    right_spec = TableSpec(num_partitions=8)
    right = str(tmp_path / "right")
    replay(
        ray.data.from_arrow(_dim_table([f"conv-{i}" for i in range(16)])),
        right,
        right_spec,
    )

    out = colocated_join(
        left,
        right,
        on=("conv_id",),
        spec_left=spec,
        spec_right=right_spec,
        left_columns=["conv_id", "turn_idx", "model"],
        right_columns=["dim"],
    )
    t = pa.concat_tables(
        [ray.get(r) for r in out.to_arrow_refs()], promote_options="permissive"
    )
    assert t.num_rows > 0 and "dim" in t.column_names
    # evolved key type is the widened one everywhere
    assert t.schema.field("turn_idx").type == pa.int64()
    models = dict(zip(t["conv_id"].to_pylist(), t["model"].to_pylist()))
    non_null = {c for c, m in models.items() if m is not None}
    assert non_null <= {target}  # only the evolved conv carries values
    assert any(m is None for m in models.values())  # padded partitions


def test_layout_mismatch_raises(tmp_path, lakes):
    left, ls, *_ = lakes
    other_spec = TableSpec(num_partitions=4)
    other = str(tmp_path / "other")
    replay(
        ray.data.from_arrow(_dim_table(["conv-1"])), other, other_spec
    )
    with pytest.raises(ValueError, match="not co-partitioned"):
        colocated_join(left, other, spec_left=ls, spec_right=other_spec)


def test_join_key_must_lead_partition_key(lakes):
    left, ls, right, rs, *_ = lakes
    with pytest.raises(ValueError, match="partition key"):
        colocated_join(
            left, right, on=("turn_idx",), spec_left=ls, spec_right=rs
        )


# ---------------------------------------------------------------------------
# incrementally maintained join view (engine.refresh_join_view)


def _join_table(ds) -> pa.Table:
    return pa.concat_tables(
        [ray.get(r) for r in ds.to_arrow_refs()], promote_options="permissive"
    )


def _view_state(view: str) -> dict:
    t = _join_table(read_lake(view, with_tombstones=True))
    return {
        (c, ti): d
        for c, ti, d in zip(
            t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist(),
            t["dim"].to_pylist(),
        )
    }


def test_join_view_initial_noop_and_incremental(tmp_path, lakes):
    left, ls, right, rs, live, covered = lakes
    view = str(tmp_path / "view")
    kw = dict(
        on=("conv_id",),
        spec_left=ls,
        spec_right=rs,
        left_columns=["conv_id", "turn_idx", "text"],
        right_columns=["dim"],
    )

    # initial build: every partition refreshed, content == colocated_join
    lin1 = refresh_join_view(left, right, view, **kw)
    assert set(lin1["status"].to_pylist()) == {"refreshed"}
    assert len(lin1) == 8
    expect = {
        k: f"dim-{k[0]}" for k in live if k[0] in covered
    }
    assert _view_state(view) == expect

    # refresh with no source change: pure no-op, files untouched
    import os as _os

    from raycdc import sink as S

    mtimes = {
        p: _os.stat(S.part_file(view, p)).st_mtime_ns for p in range(8)
    }
    lin2 = refresh_join_view(left, right, view, **kw)
    assert set(lin2["status"].to_pylist()) == {"noop"}
    assert {
        p: _os.stat(S.part_file(view, p)).st_mtime_ns for p in range(8)
    } == mtimes

    # replay a new segment updating ONE covered conversation -> only the
    # partitions that replay touched are refreshed, and the view matches a
    # from-scratch join
    target = sorted(covered)[0]
    upd = pa.table(
        {
            "conv_id": pa.array([target]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["patched"]),
            "tool": pa.array([""]),
            "ts": pa.array([1_900_000_000_000_000], pa.timestamp("us")),
            "op": pa.array(["update"]),
            "lsn": pa.array([10_000_000], pa.int64()),
            "seg_id": pa.array([99], pa.int32()),
        }
    )
    rep_lin = replay(ray.data.from_arrow(upd), left, ls)
    touched = {
        p
        for p, s in zip(rep_lin["part"].to_pylist(), rep_lin["status"].to_pylist())
        if s != "noop"
    }
    assert touched  # the update landed somewhere

    lin3 = refresh_join_view(left, right, view, **kw)
    refreshed = {
        p
        for p, s in zip(lin3["part"].to_pylist(), lin3["status"].to_pylist())
        if s == "refreshed"
    }
    assert refreshed == touched
    state = _view_state(view)
    assert state == expect  # dim mapping unchanged
    # and the joined text column carries the patched value
    t = _join_table(read_lake(view, with_tombstones=True))
    texts = dict(
        zip(
            zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()),
            t["text"].to_pylist(),
        )
    )
    assert texts[(target, 0)] == "patched"
    # full recompute agrees with the incrementally maintained view
    full = _join_table(colocated_join(left, right, **kw))
    assert full.num_rows == t.num_rows


def test_join_view_is_itself_joinable(tmp_path, lakes):
    """The view persists its layout spec, so colocated_join can consume it
    downstream without re-validation surprises."""
    left, ls, right, rs, live, covered = lakes
    view = str(tmp_path / "view")
    refresh_join_view(
        left,
        right,
        view,
        on=("conv_id",),
        spec_left=ls,
        spec_right=rs,
        left_columns=["conv_id", "turn_idx"],
        right_columns=["dim"],
    )
    out = colocated_join(
        view,
        right,
        on=("conv_id",),
        spec_right=rs,
        left_columns=["conv_id", "dim"],
        right_columns=["dim"],
        right_suffix="_again",
    )
    t = _join_table(out)
    assert t.num_rows > 0
    assert t["dim"].to_pylist() == t["dim_again"].to_pylist()


def test_join_view_cli_and_vacuum(tmp_path, lakes, capsys):
    """CLI smoke: `raycdc join-view` builds then no-ops; vacuum prunes the
    view's superseded version files like any other lake."""
    import json

    from raycdc.__main__ import main
    from raycdc.sink import vacuum, write_snapshot

    left, ls, right, rs, *_ = lakes
    view = str(tmp_path / "view")
    args = [
        "join-view", left, right, "--view", view,
        "--on", "conv_id",
        "--left-columns", "conv_id,turn_idx,text",
        "--right-columns", "dim",
    ]
    assert main(args) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["refreshed"] == 8 and first["noop"] == 0

    assert main(args) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["noop"] == 8 and second["refreshed"] == 0
    assert second["rows_total"] == first["rows_total"]

    # force a rebuild (new versions) by touching the left lake, then vacuum
    upd = pa.table(
        {
            "conv_id": pa.array(["conv-0"]),
            "turn_idx": pa.array([1], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["v2"]),
            "tool": pa.array([""]),
            "ts": pa.array([1_900_000_000_000_000], pa.timestamp("us")),
            "op": pa.array(["update"]),
            "lsn": pa.array([20_000_000], pa.int64()),
            "seg_id": pa.array([100], pa.int32()),
        }
    )
    replay(ray.data.from_arrow(upd), left, ls)
    assert main(args) == 0
    write_snapshot(view)
    removed = vacuum(view, keep_snapshots=1)
    assert removed >= 1  # the superseded v0 file of the touched partition


def test_read_view_with_column_pruning(tmp_path, lakes):
    """read_lake(columns=...) on an op-less lake (a join view) must not ask
    the parquet reader for the missing op column."""
    left, ls, right, rs, *_ = lakes
    view = str(tmp_path / "view")
    refresh_join_view(
        left,
        right,
        view,
        on=("conv_id",),
        spec_left=ls,
        spec_right=rs,
        left_columns=["conv_id", "turn_idx"],
        right_columns=["dim"],
    )
    got = read_lake(view, columns=["conv_id", "dim"]).to_pandas()
    assert set(got.columns) == {"conv_id", "dim"}
    assert len(got) > 0


def test_history_lakes_refuse_state_ops(tmp_path, lakes):
    """History lakes store every version per key — joins and state feeds
    against them must raise instead of silently fanning out across
    superseded versions."""
    from raycdc.engine import change_feed

    left, ls, *_ = lakes
    hist = str(tmp_path / "hist")
    wal = synthetic_changelog(n_events=300, seed=12)
    # history replays need per-key event-time order: the fixture is
    # ts-ordered by construction (no shuffle)
    replay(
        ray.data.from_arrow(wal),
        hist,
        TableSpec(num_partitions=8, merge_policy="history"),
    )
    with pytest.raises(ValueError, match="history"):
        colocated_join(left, hist, spec_left=ls)
    with pytest.raises(ValueError, match="history"):
        change_feed(hist, None)


def test_join_view_crash_window_is_consistent(tmp_path, lakes):
    """Crash between the version-file install and the checkpoint advance:
    readers stay on the checkpointed version, a no-change refresh stays a
    no-op, and the next real refresh re-installs the same next version
    atomically (idempotent overwrite)."""
    from raycdc import sink as S

    left, ls, right, rs, *_ = lakes
    view = str(tmp_path / "view")
    kw = dict(
        on=("conv_id",),
        spec_left=ls,
        spec_right=rs,
        left_columns=["conv_id", "turn_idx"],
        right_columns=["dim"],
    )
    refresh_join_view(left, right, view, **kw)
    before = _view_state_rows(view)

    # simulate the torn write: a v+1 file exists, checkpoint still at v
    part = 0
    ck = S.read_checkpoint(view, part)
    garbage = S.read_partition(view, part).slice(0, 1)
    S.write_partition_atomic(garbage, view, part, version=ck["version"] + 1)

    assert _view_state_rows(view) == before  # readers ignore the orphan
    lin = refresh_join_view(left, right, view, **kw)
    assert set(lin["status"].to_pylist()) == {"noop"}
    assert _view_state_rows(view) == before

    # a real source change now claims that version slot atomically
    upd = pa.table(
        {
            "conv_id": pa.array(["conv-0"]),
            "turn_idx": pa.array([5], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["new"]),
            "tool": pa.array([""]),
            "ts": pa.array([1_900_000_000_000_000], pa.timestamp("us")),
            "op": pa.array(["insert"]),
            "lsn": pa.array([30_000_000], pa.int64()),
            "seg_id": pa.array([101], pa.int32()),
        }
    )
    replay(ray.data.from_arrow(upd), left, ls)
    refresh_join_view(left, right, view, **kw)
    after = _view_state_rows(view)
    assert ("conv-0", 5) in after and after != before


def _view_state_rows(view: str) -> set:
    t = _join_table(read_lake(view, with_tombstones=True))
    return set(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))


def test_semi_and_anti_join(lakes):
    """semi keeps covered left rows only (no right columns); anti keeps the
    complement; together they tile the left lake."""
    left, ls, right, rs, live, covered = lakes
    kw = dict(
        on=("conv_id",),
        spec_left=ls,
        spec_right=rs,
        left_columns=["conv_id", "turn_idx"],
        right_columns=["dim"],
    )
    semi = _join_table(colocated_join(left, right, how="semi", **kw))
    anti = _join_table(colocated_join(left, right, how="anti", **kw))
    assert "dim" not in semi.column_names and "dim" not in anti.column_names
    semi_keys = set(zip(semi["conv_id"].to_pylist(), semi["turn_idx"].to_pylist()))
    anti_keys = set(zip(anti["conv_id"].to_pylist(), anti["turn_idx"].to_pylist()))
    assert semi_keys == {k for k in live if k[0] in covered}
    assert anti_keys == {k for k in live if k[0] not in covered}
    assert not (semi_keys & anti_keys)
