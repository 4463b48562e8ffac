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


def test_run_handlers_overlap_concurrently(ray_session, tmp_path, wal_dir):
    """Two handlers matching the same segments must run CONCURRENTLY (the
    errgroup fan-out of bqloader.go:119-134): each handler's build blocks on
    a shared 2-party barrier, so a serial Router would time out."""
    import threading

    import ray.data

    barrier = threading.Barrier(2)
    notifier = CollectingNotifier()

    def make_decode():
        def decode(paths):
            barrier.wait(timeout=30)  # raises BrokenBarrierError if serial
            return ray.data.read_parquet(paths)

        return decode

    r = Router()
    for name in ("alpha", "beta"):
        r.add_handler(
            PipelineHandler(
                name,
                r"\.parquet$",
                str(tmp_path / name),
                spec=TableSpec(num_partitions=4),
                decode=make_decode(),
                notifier=notifier,
            )
        )
    paths = sorted(str(p) for p in wal_dir.iterdir())
    results = r.run(paths)
    # both completed, notified, in registration order
    assert [res.handler for res in results] == ["alpha", "beta"]
    assert all(res.ok for res in results)
    assert len(notifier.results) == 2
    for name in ("alpha", "beta"):
        assert read_lake(str(tmp_path / name), TableSpec(num_partitions=4)).count() > 0


def test_run_concurrent_error_aggregation(ray_session, tmp_path, wal_dir):
    """One failing handler must not stop its sibling (all attempted, both
    notified, first error reported after all complete)."""
    notifier = CollectingNotifier()

    def bad_projector(batch: pa.Table) -> pa.Table:
        raise ValueError("poison row")

    r = Router()
    r.add_handler(
        PipelineHandler(
            "bad",
            r"\.parquet$",
            str(tmp_path / "bad"),
            spec=TableSpec(num_partitions=4),
            projector=bad_projector,
            notifier=notifier,
        )
    )
    r.add_handler(
        PipelineHandler(
            "good",
            r"\.parquet$",
            str(tmp_path / "good"),
            spec=TableSpec(num_partitions=4),
            notifier=notifier,
        )
    )
    paths = sorted(str(p) for p in wal_dir.iterdir())
    with pytest.raises(RuntimeError, match="bad"):
        r.run(paths)
    assert len(notifier.results) == 2
    by_name = {res.handler: res for res in notifier.results}
    assert not by_name["bad"].ok and by_name["good"].ok
    # the good handler's lake materialized despite the sibling failure
    assert read_lake(str(tmp_path / "good"), TableSpec(num_partitions=4)).count() > 0


# --- SlackNotifier (the HTTP push path, notifier.go:31-137) -----------------


class FakeTransport:
    """Captures the request and plays back a canned response — the
    injectable-http.Client pattern of notifier_test.go:15-131."""

    def __init__(self, status=200, body=b'{"ok": true}'):
        self.status, self.body = status, body
        self.calls = []

    def __call__(self, url, headers, body):
        self.calls.append((url, headers, body))
        return self.status, self.body


def _result(ok=True):
    from raycdc.registry import Result

    return Result(
        handler="camecon",
        paths=["wal/seg-001.parquet"],
        error=None if ok else "boom",
    )


def test_slack_notifier_success_message_and_auth():
    import json

    from raycdc.registry import SlackNotifier

    t = FakeTransport()
    n = SlackNotifier("#ch", "xoxb-token", icon_emoji=":rocket:", username="loader")
    n.transport = t
    n(_result(ok=True))
    url, headers, body = t.calls[0]
    assert url == "https://slack.com/api/chat.postMessage"
    assert headers["Authorization"] == "Bearer xoxb-token"
    assert headers["Content-Type"] == "application/json"
    msg = json.loads(body)
    assert msg["channel"] == "#ch"
    assert msg["icon_emoji"] == ":rocket:" and msg["username"] == "loader"
    assert msg["text"].startswith(":white_check_mark: camecon handler successfully loaded")


def test_slack_notifier_failure_message():
    import json

    from raycdc.registry import SlackNotifier

    t = FakeTransport()
    n = SlackNotifier("#ch", "tok", transport=t)
    n(_result(ok=False))
    msg = json.loads(t.calls[0][2])
    assert msg["text"].startswith(":x: camecon handler failed to load")
    assert "boom" in msg["text"]
    assert "icon_emoji" not in msg and "username" not in msg  # omitempty


@pytest.mark.parametrize(
    "status,body,match",
    [
        (500, b"gateway", "status code 500"),
        (200, b'{"ok": false, "error": "invalid_auth"}', "invalid_auth"),
        (200, b"not json", "failed to parse"),
    ],
)
def test_slack_notifier_error_paths(status, body, match):
    from raycdc.registry import SlackNotifier

    n = SlackNotifier("#ch", "tok", transport=FakeTransport(status, body))
    with pytest.raises(RuntimeError, match=match):
        n(_result(ok=True))


def test_notifier_failure_never_masks_success(ray_session, tmp_path, wal_dir):
    """A raising notifier must not fail the run (handler.go:89-95)."""
    from raycdc.registry import SlackNotifier

    n = SlackNotifier("#ch", "tok", transport=FakeTransport(500, b"down"))
    r = Router()
    r.add_handler(
        PipelineHandler(
            "t",
            r"\.parquet$",
            str(tmp_path / "lake3"),
            spec=TableSpec(num_partitions=4),
            notifier=n,
        )
    )
    paths = sorted(str(p) for p in wal_dir.iterdir())
    results = r.run(paths)
    assert len(results) == 1 and results[0].ok
