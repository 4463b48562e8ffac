"""Structured run logging (raycdc.runlog) — observability parity with the
reference's zerolog setup (option.go:17-47 level/pretty options,
bqloader.go:104-116 run records, handler.go:188-209 handler context).
Capture-based, mirroring the reference's handler_test assertions on
notifier payloads."""

import io
import json
import logging

import pyarrow as pa
import pytest
import ray.data

from raycdc.runlog import (
    LOGGER_NAME,
    RunLog,
    configure_logging,
    get_logger,
    lineage_summary,
)


@pytest.fixture(autouse=True)
def _reset_logger():
    yield
    lg = logging.getLogger(LOGGER_NAME)
    for h in list(lg.handlers):
        lg.removeHandler(h)
    lg.propagate = True
    lg.setLevel(logging.NOTSET)


def test_json_records_carry_severity_and_context():
    buf = io.StringIO()
    configure_logging(level="info", stream=buf)
    rl = RunLog(event="seg-001.csv")
    rl.info("started", n_segments=3)
    rl.finish("finished")
    lines = [json.loads(x) for x in buf.getvalue().splitlines()]
    assert lines[0]["severity"] == "info"
    assert lines[0]["msg"] == "started"
    assert lines[0]["event"] == "seg-001.csv"
    assert lines[0]["n_segments"] == 3
    assert "started" in lines[0]
    assert "elapsed_s" in lines[1]  # the deferred closer (bqloader.go:108-116)


def test_handler_child_carries_handler_dict():
    buf = io.StringIO()
    configure_logging(level="info", stream=buf)
    rl = RunLog(run="r1")
    hl = rl.handler("amex", pattern=r"amex/.*\.xls$", lake="/tmp/lake")
    hl.info("handler amex started")
    rec = json.loads(buf.getvalue().splitlines()[0])
    assert rec["handler"]["name"] == "amex"
    assert rec["handler"]["pattern"] == r"amex/.*\.xls$"
    assert rec["handler"]["lake"] == "/tmp/lake"
    assert rec["run"] == "r1"  # parent context inherited


def test_default_level_is_error_and_unknown_level_raises():
    buf = io.StringIO()
    configure_logging(stream=buf)  # reference default: error (bqloader.go:29)
    RunLog().info("suppressed")
    assert buf.getvalue() == ""
    RunLog().error("kept")
    assert "kept" in buf.getvalue()
    with pytest.raises(ValueError, match="unknown log level"):
        configure_logging(level="verbose")


def test_pretty_mode_is_human_not_json():
    buf = io.StringIO()
    configure_logging(level="info", pretty=True, stream=buf)
    RunLog(event="e").info("hello")
    line = buf.getvalue().splitlines()[0]
    with pytest.raises(json.JSONDecodeError):
        json.loads(line)
    assert "hello" in line and "event=e" in line


def test_reconfigure_does_not_stack_handlers():
    buf = io.StringIO()
    configure_logging(level="info", stream=buf)
    configure_logging(level="info", stream=buf)
    RunLog().info("once")
    assert buf.getvalue().count("once") == 1


def test_lineage_summary_folds_statuses():
    lin = pa.table(
        {
            "status": pa.array(["applied", "noop", "applied"]),
            "rows_in": pa.array([12, 0, 6], pa.int64()),
            "rows_applied": pa.array([10, 0, 5], pa.int64()),
        }
    )
    s = lineage_summary(lin)
    assert s == {
        "partitions": 3,
        "rows_in": 18,
        "rows_applied": 15,
        "noops": 1,
    }
    assert lineage_summary(None) == {
        "partitions": 0,
        "rows_in": 0,
        "rows_applied": 0,
        "noops": 0,
    }


def test_router_run_emits_contextual_records(ray_session, tmp_path, caplog):
    """The production path logs run + handler records with structured
    context — the log-side mirror of handler_test.go's notifier checks."""
    import pyarrow.parquet as pq

    from raycdc.changelog import synthetic_changelog
    from raycdc.registry import PipelineHandler, Router
    from raycdc.schema import TableSpec

    log = synthetic_changelog(n_events=300, seed=180)
    seg = str(tmp_path / "seg-000.parquet")
    pq.write_table(log, seg)
    router = Router()
    router.add_handler(
        PipelineHandler(
            name="transcripts",
            pattern=r"seg-\d+\.parquet$",
            lake_dir=str(tmp_path / "lake"),
            spec=TableSpec(num_partitions=4),
        )
    )
    with caplog.at_level(logging.INFO, logger=LOGGER_NAME):
        router.run([seg])
    msgs = [r.getMessage() for r in caplog.records]
    assert any("router started" in m for m in msgs)
    assert any("handler transcripts started" in m for m in msgs)
    finish = [
        r
        for r in caplog.records
        if "handler transcripts finished" in r.getMessage()
    ]
    assert finish, msgs
    ctx = finish[0].ctx
    assert ctx["handler"]["name"] == "transcripts"
    assert ctx["rows_applied"] > 0
    assert "elapsed_s" in ctx
    done = [r for r in caplog.records if "router finished" in r.getMessage()]
    assert done and done[0].ctx["n_errors"] == 0


def test_failing_handler_logs_error_record(ray_session, tmp_path, caplog):
    from raycdc.registry import PipelineHandler, Router
    from raycdc.schema import TableSpec

    def bad_decode(paths):
        raise RuntimeError("boom")

    router = Router()
    router.add_handler(
        PipelineHandler(
            name="bad",
            pattern=r".*",
            lake_dir=str(tmp_path / "lake"),
            spec=TableSpec(num_partitions=4),
            decode=bad_decode,
        )
    )
    with caplog.at_level(logging.INFO, logger=LOGGER_NAME):
        results = router.run(["whatever.csv"], raise_on_error=False)
    assert not results[0].ok
    errs = [r for r in caplog.records if r.levelno == logging.ERROR]
    assert errs and "boom" in errs[0].ctx["error"]
    done = [r for r in caplog.records if "router finished" in r.getMessage()]
    assert done[0].ctx["n_errors"] == 1


# ---------------------------------------------------------------------------
# round-5: the engine verbs emit contextual records (VERDICT r4 #4) —
# replay / maintain_view / restore / migrate mirror handler.go:188-209


def _caplog_records(caplog):
    return [
        (r.getMessage(), getattr(r, "ctx", {}))
        for r in caplog.records
        if r.name == LOGGER_NAME
    ]


def test_replay_emits_start_and_finish_records(ray_session, tmp_path, caplog):
    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import replay
    from raycdc.schema import TableSpec

    caplog.set_level(logging.INFO, logger=LOGGER_NAME)
    lake = str(tmp_path / "lake")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=200, seed=91)),
        lake,
        TableSpec(num_partitions=4),
    )
    recs = _caplog_records(caplog)
    msgs = [m for m, _ in recs]
    assert "replay started" in msgs
    fin = dict(recs)["replay finished"]
    assert fin["verb"] == "replay" and fin["lake"] == lake
    assert fin["rows_applied"] > 0 and "elapsed_s" in fin
    assert fin["policy"] == "lww" and fin["salted"] is False


def test_maintain_view_emits_refresh_records(ray_session, tmp_path, caplog):
    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import maintain_rollup, replay
    from raycdc.schema import TableSpec

    caplog.set_level(logging.INFO, logger=LOGGER_NAME)
    spec = TableSpec(num_partitions=4)
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=300, seed=92)),
        src,
        spec,
    )
    caplog.clear()
    maintain_rollup(src, view, ("conv_id",), ("n",), spec=spec,
                    derive=_count_derive)
    recs = _caplog_records(caplog)
    inst = [c for m, c in recs if m == "view refresh installed"]
    assert inst, [m for m, _ in recs]
    c = inst[0]
    assert c["verb"] == "maintain_rollup"
    assert c["src"] == src and c["view"] == view
    assert c["claim"] is not None  # the feed lsn — links record to lineage
    assert c["rows_applied"] > 0 and "elapsed_s" in c
    # second refresh with no source change: steady / empty-fold record
    caplog.clear()
    maintain_rollup(src, view, ("conv_id",), ("n",), spec=spec,
                    derive=_count_derive)
    msgs = [m for m, _ in _caplog_records(caplog)]
    assert (
        "view refresh steady no-op" in msgs
        or "view refresh empty fold" in msgs
    )


def _count_derive(t: pa.Table) -> pa.Table:
    return pa.table({"n": pa.array([1] * len(t), pa.int64())})


def test_restore_emits_records(ray_session, tmp_path, caplog):
    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import replay, restore_lake
    from raycdc.schema import TableSpec
    from raycdc.sink import list_snapshots

    caplog.set_level(logging.INFO, logger=LOGGER_NAME)
    spec = TableSpec(num_partitions=4)
    lake = str(tmp_path / "lake")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=200, seed=93)),
        lake,
        spec,
    )
    snap = list_snapshots(lake)[-1]
    caplog.clear()
    restore_lake(lake, snap, spec)
    recs = dict(_caplog_records(caplog))
    assert "restore started" in recs
    fin = recs["restore finished"]
    assert fin["as_of"] == snap and fin["lake"] == lake
    assert fin["partitions"] == fin["noop"]  # same-state restore: all noop
    assert "elapsed_s" in fin


def test_migrate_emits_records(ray_session, tmp_path, caplog):
    from raycdc.changelog import synthetic_changelog
    from raycdc.engine import migrate_lake, replay
    from raycdc.schema import TableSpec

    caplog.set_level(logging.INFO, logger=LOGGER_NAME)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    replay(
        ray.data.from_arrow(synthetic_changelog(n_events=200, seed=94)),
        src,
        TableSpec(num_partitions=4),
    )
    caplog.clear()
    migrate_lake(src, dst, TableSpec(num_partitions=8))
    recs = dict(_caplog_records(caplog))
    fin = recs["migrate finished"]
    assert fin["verb"] == "migrate" and fin["dst"] == dst
    assert fin["rows"] > 0 and fin["partitions"] > 0
    assert "elapsed_s" in fin
