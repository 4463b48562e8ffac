"""Structured, contextual run logging — observability parity with the
reference's zerolog setup.

The reference configures a leveled, optionally pretty-printed JSON logger
(``/root/reference/option.go:17-47`` ``WithLogLevel`` /
``WithPrettyLogging``; default level *error*, ``bqloader.go:28-30``),
stamps every record with a ``severity`` field for Cloud Logging
(``bqloader.go:140-150`` ``severityHook``), and builds a CONTEXTUAL logger
per run and per handler — run records carry the trigger event + started /
finished / elapsed times (``bqloader.go:104-116,151-180``), handler
records carry a ``handler`` dict of name, pattern and destination
(``handler.go:188-209``).

This module is that design on stdlib ``logging``: JSON-lines by default
(one object per line, ``severity`` + ``ts`` + ``msg`` + the contextual
fields), a pretty human mode, level control, and :func:`run_logger` /
``RunLog.handler`` for the per-run / per-handler context dicts.  The
engine and Router call it; tests capture records via ``caplog`` exactly
like the reference's handler tests assert on notifier payloads.
"""

from __future__ import annotations

import json
import logging
import time
from typing import Any

LOGGER_NAME = "raycdc.run"

_LEVELS = {
    "trace": logging.DEBUG,  # stdlib has no TRACE; map to DEBUG
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "fatal": logging.CRITICAL,
    "panic": logging.CRITICAL,
}


class JsonFormatter(logging.Formatter):
    """One JSON object per line; ``severity`` mirrors the reference's
    severityHook (bqloader.go:140-150), contextual fields are merged in
    from ``record.ctx`` (set via the ``extra`` mechanism)."""

    def format(self, record: logging.LogRecord) -> str:
        out: dict[str, Any] = {
            "severity": record.levelname.lower(),
            "ts": self.formatTime(record, "%Y-%m-%dT%H:%M:%S"),
            "msg": record.getMessage(),
        }
        ctx = getattr(record, "ctx", None)
        if ctx:
            out.update(ctx)
        if record.exc_info:
            out["error"] = self.formatException(record.exc_info)
        return json.dumps(out, default=str)


class PrettyFormatter(logging.Formatter):
    """Human-friendly mode (WithPrettyLogging, option.go:16-22)."""

    def format(self, record: logging.LogRecord) -> str:
        base = (
            f"{self.formatTime(record, '%H:%M:%S')} "
            f"{record.levelname:<5} {record.getMessage()}"
        )
        ctx = getattr(record, "ctx", None)
        if ctx:
            kv = " ".join(f"{k}={v}" for k, v in ctx.items())
            base = f"{base}  {kv}"
        if record.exc_info:
            base = f"{base}\n{self.formatException(record.exc_info)}"
        return base


def configure_logging(
    level: str = "error", pretty: bool = False, stream=None
) -> logging.Logger:
    """Configure the engine's run logger — the ``WithLogLevel`` /
    ``WithPrettyLogging`` option pair (option.go:17-47).  Level names
    follow the reference (trace/debug/info/warn/error/fatal/panic;
    unknown names raise, like ``zerolog.ParseLevel``); the default is
    *error*, matching the reference's default (bqloader.go:29).

    Idempotent: reconfiguring replaces the handler rather than stacking
    duplicates.  Returns the configured logger.
    """
    if level not in _LEVELS:
        raise ValueError(
            f"unknown log level {level!r}; allowed: {sorted(_LEVELS)}"
        )
    logger = logging.getLogger(LOGGER_NAME)
    logger.setLevel(_LEVELS[level])
    for h in list(logger.handlers):
        logger.removeHandler(h)
    handler = logging.StreamHandler(stream)
    handler.setFormatter(PrettyFormatter() if pretty else JsonFormatter())
    logger.addHandler(handler)
    logger.propagate = False
    return logger


def get_logger() -> logging.Logger:
    """The run logger; unconfigured it propagates to the root logger at
    stdlib defaults (so ``caplog`` captures records without setup)."""
    return logging.getLogger(LOGGER_NAME)


class RunLog:
    """One run's contextual logger (contextualLogger, bqloader.go:151-180):
    every record carries the run fields given at construction; ``finish``
    stamps finished/elapsed like the deferred closer in
    ``bqloader.go:108-116``; :meth:`handler` derives a handler-scoped
    child carrying the ``handler`` context dict (handler.go:188-209)."""

    def __init__(self, logger: logging.Logger | None = None, **fields: Any):
        self._log = logger or get_logger()
        self._ctx = dict(fields)
        self._started = time.monotonic()
        self._ctx["started"] = time.strftime(
            "%Y-%m-%dT%H:%M:%S", time.localtime()
        )

    # -- record emitters ---------------------------------------------------
    def _emit(self, level: int, msg: str, **extra_ctx: Any) -> None:
        self._log.log(level, msg, extra={"ctx": {**self._ctx, **extra_ctx}})

    def debug(self, msg: str, **ctx: Any) -> None:
        self._emit(logging.DEBUG, msg, **ctx)

    def info(self, msg: str, **ctx: Any) -> None:
        self._emit(logging.INFO, msg, **ctx)

    def warning(self, msg: str, **ctx: Any) -> None:
        self._emit(logging.WARNING, msg, **ctx)

    def error(self, msg: str, **ctx: Any) -> None:
        self._emit(logging.ERROR, msg, **ctx)

    def finish(self, msg: str, **ctx: Any) -> None:
        """Closing record with elapsed seconds (bqloader.go:108-116)."""
        self._emit(
            logging.INFO,
            msg,
            elapsed_s=round(time.monotonic() - self._started, 3),
            **ctx,
        )

    # -- derived contexts ----------------------------------------------------
    def child(self, **fields: Any) -> "RunLog":
        c = RunLog.__new__(RunLog)
        c._log = self._log
        c._ctx = {**self._ctx, **fields}
        c._started = time.monotonic()
        return c

    def handler(
        self, name: str, pattern: str | None = None, **dest: Any
    ) -> "RunLog":
        """Handler-scoped child: name + pattern + destination fields under
        a ``handler`` dict, the shape of handler.go:195-206."""
        d: dict[str, Any] = {"name": name}
        if pattern is not None:
            d["pattern"] = pattern
        d.update(dest)
        return self.child(handler=d)


def lineage_summary(lineage) -> dict[str, Any]:
    """Fold a replay lineage table into the fields a finish record carries
    (the Notifier's message content, notifier.go:69-80): partitions
    touched, rows applied, noop count."""
    if lineage is None or lineage.num_rows == 0:
        return {"partitions": 0, "rows_in": 0, "rows_applied": 0, "noops": 0}
    import pyarrow.compute as pc

    statuses = lineage["status"]
    return {
        "partitions": lineage.num_rows,
        "rows_in": int(pc.sum(lineage["rows_in"]).as_py() or 0),
        "rows_applied": int(pc.sum(lineage["rows_applied"]).as_py() or 0),
        "noops": int(
            pc.sum(pc.cast(pc.equal(statuses, "noop"), "int64")).as_py() or 0
        ),
    }
