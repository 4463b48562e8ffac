"""Dead-letter error policy: poison batches are parked, replay continues."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from raycdc.changelog import synthetic_changelog
from raycdc.engine import read_dead_letters, read_lake, replay
from raycdc.schema import TableSpec


def test_dead_letter_parks_poison_and_continues(ray_session, tmp_path):
    t = synthetic_changelog(n_events=800, seed=60)
    lake = str(tmp_path / "lake")
    dlq = str(tmp_path / "dlq")
    spec = TableSpec(num_partitions=4)

    def poison_projector(batch: pa.Table) -> pa.Table:
        # data-dependent failure: any batch containing seg_id == 0 is poison
        if pc.any(pc.equal(batch["seg_id"], 0)).as_py():
            raise ValueError("poison cell in segment 0")
        return batch

    # one block per segment so exactly the seg-0 block is poison
    segs = [t.filter(pc.equal(t["seg_id"], s)) for s in range(8)]
    ds = ray.data.from_arrow_refs(
        [ray.put(s) for s in segs]
    )
    replay(ds, lake, spec, projector=poison_projector, dead_letter_dir=dlq)

    parked = read_dead_letters(dlq)
    assert parked is not None
    parked_segs = set(parked["seg_id"].to_pylist())
    # batch boundaries are Ray's choice: the poison segment must be parked;
    # if Ray ever coalesces blocks, neighbors may be parked with it
    assert 0 in parked_segs
    assert b"poison" in (parked.schema.metadata or {}).get(b"raycdc.error", b"")

    # nothing parked was applied, and something non-parked was
    live = read_lake(lake, spec).to_pandas()
    assert len(live) > 0
    assert parked_segs.isdisjoint(set(live["seg_id"]))


def test_dead_letter_reparks_are_idempotent(ray_session, tmp_path):
    """Park filenames are content-hash keyed: re-parking the same poison
    batch (salted-auto probe + replay, task retries, or a second replay of
    the same segment) overwrites instead of accumulating duplicates."""
    import glob

    t = synthetic_changelog(n_events=400, seed=62)
    dlq = str(tmp_path / "dlq")
    spec = TableSpec(num_partitions=4)

    def poison_projector(batch: pa.Table) -> pa.Table:
        if pc.any(pc.equal(batch["seg_id"], 0)).as_py():
            raise ValueError("poison cell in segment 0")
        return batch

    segs = [t.filter(pc.equal(t["seg_id"], s)) for s in range(8)]
    for attempt in range(2):  # same segments delivered twice
        ds = ray.data.from_arrow_refs([ray.put(s) for s in segs])
        replay(
            ds,
            str(tmp_path / f"lake{attempt}"),
            spec,
            projector=poison_projector,
            dead_letter_dir=dlq,
            salted="auto",  # the probe also parks — must not duplicate
        )
    files = glob.glob(f"{dlq}/batch-*.parquet")
    parked = read_dead_letters(dlq)
    seg0_rows = len(t.filter(pc.equal(t["seg_id"], 0)))
    # every parked file is distinct content; the poison rows appear once
    assert len(files) == len(set(files))
    assert len(parked.filter(pc.equal(parked["seg_id"], 0))) == seg0_rows


def test_default_policy_fails_job(ray_session, tmp_path):
    import pytest

    t = synthetic_changelog(n_events=200, seed=61)

    def bad(batch: pa.Table) -> pa.Table:
        raise ValueError("boom")

    with pytest.raises(Exception, match="boom"):
        replay(
            ray.data.from_arrow(t),
            str(tmp_path / "lake"),
            TableSpec(num_partitions=2),
            projector=bad,
        )


def test_deadletters_cli(tmp_path, capsys):
    """CLI inspection of the park queue: row/file counts plus the error
    strings recovered from parquet schema metadata."""
    import json

    import ray.data

    from raycdc.__main__ import main
    from raycdc.changelog import synthetic_changelog
    from raycdc.schema import TableSpec

    def bad(t):
        raise ValueError("projector exploded")

    wal = synthetic_changelog(n_events=200, seed=55)
    lake = str(tmp_path / "lake")
    dlq = str(tmp_path / "dlq")
    replay(
        ray.data.from_arrow(wal),
        lake,
        TableSpec(num_partitions=4),
        projector=bad,
        dead_letter_dir=dlq,
    )
    assert main(["deadletters", "--dir", dlq]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 200 and out["files"] >= 1
    assert any("projector exploded" in e for e in out["errors"])
