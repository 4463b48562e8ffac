"""Router / handler / notifier tests — the engine lifecycle analog of
/root/reference/bqloader_test.go:13-114 and handler_test.go:84-153."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raycdc.changelog import synthetic_changelog
from raycdc.engine import read_lake
from raycdc.registry import CollectingNotifier, PipelineHandler, Router
from raycdc.schema import TableSpec


@pytest.fixture
def wal_dir(tmp_path):
    log = synthetic_changelog(n_events=400, n_convs=10, seed=7)
    seg_dir = tmp_path / "wal"
    seg_dir.mkdir()
    for seg in range(4):
        part = log.filter(pa.compute.equal(log["seg_id"], seg))
        pq.write_table(part, seg_dir / f"seg-{seg:03d}.parquet")
    return seg_dir


def test_route_every_match_fires(tmp_path):
    r = Router()
    r.add_handler(PipelineHandler("a", r"\.parquet$", str(tmp_path / "a")))
    r.add_handler(PipelineHandler("b", r"seg-00", str(tmp_path / "b")))
    r.add_handler(PipelineHandler("c", r"nomatch", str(tmp_path / "c")))
    routed = r.route(["/x/seg-001.parquet", "/x/seg-999.parquet"])
    # fan-out, not first-match (bqloader.go:121-128)
    assert routed == {
        "a": ["/x/seg-001.parquet", "/x/seg-999.parquet"],
        "b": ["/x/seg-001.parquet"],
        "c": [],
    }


def test_duplicate_handler_name_rejected(tmp_path):
    r = Router()
    r.add_handler(PipelineHandler("a", r".", str(tmp_path)))
    with pytest.raises(ValueError, match="duplicate"):
        r.add_handler(PipelineHandler("a", r".", str(tmp_path)))


def test_run_replays_and_notifies(ray_session, tmp_path, wal_dir):
    notifier = CollectingNotifier()
    spec = TableSpec(num_partitions=8)
    r = Router()
    r.add_handler(
        PipelineHandler(
            "transcripts",
            r"seg-\d+\.parquet$",
            str(tmp_path / "lake"),
            spec=spec,
            notifier=notifier,
        )
    )
    paths = sorted(str(p) for p in wal_dir.iterdir())
    results = r.run(paths)
    assert len(results) == 1 and results[0].ok
    assert len(notifier.results) == 1
    assert notifier.format(notifier.results[0]).startswith("✅")
    # the lake materialized
    n = read_lake(str(tmp_path / "lake"), spec).count()
    assert n > 0


def test_run_error_notifies_and_raises(ray_session, tmp_path, wal_dir):
    notifier = CollectingNotifier()

    def bad_projector(batch: pa.Table) -> pa.Table:
        raise ValueError("poison row")

    r = Router()
    r.add_handler(
        PipelineHandler(
            "broken",
            r"\.parquet$",
            str(tmp_path / "lake2"),
            spec=TableSpec(num_partitions=4),
            projector=bad_projector,
            notifier=notifier,
        )
    )
    paths = sorted(str(p) for p in wal_dir.iterdir())
    with pytest.raises(RuntimeError, match="broken"):
        r.run(paths)
    # notified the failure too (handler.go:89-95)
    assert len(notifier.results) == 1 and not notifier.results[0].ok
    assert notifier.format(notifier.results[0]).startswith("❌")
