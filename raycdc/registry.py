"""Handler registry + routing + notification — the engine assembly surface.

The reference's whole library is this surface: users register ``Handler``
structs of five plugins (pattern, parser, preprocessor, projector, loader,
notifier) and the engine fans every matching handler out over each event
(``/root/reference/bqloader.go:63-97,105-137``, ``handler.go:20-58``).  Here
a :class:`PipelineHandler` bundles the Ray-native analogs:

* ``pattern``    — regex over segment paths (``handler.go:56-58``); EVERY
  matching handler runs, not first-match (``bqloader.go:121-128``);
* ``decode``     — a :class:`raycdc.parsers.DecodeSpec` or a callable
  ``Dataset -> Dataset`` building the record stream;
* ``projector``  — Arrow batch fn (the §2.3 operator library);
* ``spec``       — destination :class:`raycdc.schema.TableSpec`;
* ``lake_dir``   — destination lake (the BigQuery table analog);
* ``notifier``   — per-run outcome callback (``notifier.go:17-26``).

``Router.run`` is the ``BQLoad``→``Handle`` lifecycle: route → build →
replay → notify, always notifying on success AND failure
(``handler.go:89-95``) and never letting a notify failure mask the
processing error.
"""

from __future__ import annotations

import re
import traceback
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa

import ray.data

from raycdc.engine import replay
from raycdc.parsers import DecodeSpec, parse_segments, read_segments
from raycdc.schema import TableSpec


@dataclass
class Result:
    """Outcome record (``/root/reference/notifier.go:22-26``)."""

    handler: str
    paths: list[str]
    error: str | None = None
    lineage: pa.Table | None = None

    @property
    def ok(self) -> bool:
        return self.error is None


Notifier = Callable[[Result], None]


@dataclass
class PipelineHandler:
    name: str
    pattern: str
    lake_dir: str
    spec: TableSpec = field(default_factory=TableSpec)
    decode: DecodeSpec | Callable[[list[str]], "ray.data.Dataset"] | None = None
    projector: Callable[[pa.Table], pa.Table] | None = None
    notifier: Notifier | None = None
    salted: bool = False

    def matches(self, path: str) -> bool:
        return re.search(self.pattern, path) is not None

    def build(self, paths: list[str]) -> "ray.data.Dataset":
        """paths → changelog Dataset (extract + decode front half)."""
        if callable(self.decode):
            return self.decode(paths)
        if isinstance(self.decode, DecodeSpec):
            return parse_segments(read_segments(paths), self.decode)
        # default: parquet changelog segments
        return ray.data.read_parquet(paths)


def _stabilize_fsspec_http() -> None:
    """Make concurrent driver-thread dataset builds race-free.

    Ray's path resolution probes ``from fsspec.implementations.http import
    HTTPFileSystem`` on EVERY read (``ray.data.datasource.path_util.
    _is_http_filesystem``), catching only ``ModuleNotFoundError``.  When
    aiohttp is absent that import fails on every probe, and two driver
    threads building datasets concurrently can race the repeated failing
    import — one observes the sibling's partially-initialized module and
    crashes with a plain ``ImportError: cannot import name
    'HTTPFileSystem'``.  If (and only if) the real import fails, install an
    inert stub module once so the probe resolves instantly and race-free;
    ``isinstance`` against the stub class is always False — exactly the
    ``ModuleNotFoundError`` behavior, made thread-safe."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except ImportError:
        pass
    import sys
    import types

    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # inert sentinel; never instantiated by raycdc
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


class Router:
    """Registry + fan-out dispatch (``bqloader.go:63-97,119-134``)."""

    def __init__(self) -> None:
        self.handlers: list[PipelineHandler] = []

    def add_handler(self, handler: PipelineHandler) -> None:
        if any(h.name == handler.name for h in self.handlers):
            raise ValueError(f"duplicate handler name: {handler.name}")
        self.handlers.append(handler)

    def route(self, paths: Sequence[str]) -> dict[str, list[str]]:
        """handler name → matching segment paths; every match fires."""
        return {
            h.name: [p for p in paths if h.matches(p)] for h in self.handlers
        }

    def run(
        self,
        paths: Sequence[str],
        raise_on_error: bool = True,
        max_concurrency: int | None = None,
    ) -> list[Result]:
        """Process a batch of arrived segments through every matching
        handler CONCURRENTLY — the errgroup fan-out of
        ``/root/reference/bqloader.go:119-134``: all matching handlers are
        attempted (none skipped on a sibling's failure), each always
        notifies its own outcome, and the first error is reported after all
        complete.

        Handlers run on driver threads (one per matching handler, bounded
        by ``max_concurrency``); each thread submits its own Ray Data
        pipeline, so N tables tailing one segment stream replay in
        parallel and Ray's scheduler interleaves their stages.  Results
        come back in registration order regardless of completion order.

        A notifier exception is logged and never masks (or poisons) the
        handler outcome (``handler.go:89-95``)."""
        import logging
        from concurrent.futures import ThreadPoolExecutor

        from raycdc.runlog import RunLog, lineage_summary

        routed = self.route(paths)
        active = [h for h in self.handlers if routed[h.name]]
        if not active:
            return []
        _stabilize_fsspec_http()  # concurrent builds trip a lazy-import race
        # contextual run logger (bqloader.go:104-116,151-180): one record
        # pair per run, one per handler, all carrying structured fields
        rl = RunLog(
            n_segments=len(paths), handlers=[h.name for h in active]
        )
        rl.info("router started to handle a segment batch")

        def run_one(h: PipelineHandler) -> Result:
            res = Result(handler=h.name, paths=routed[h.name])
            hl = rl.handler(h.name, h.pattern, lake=h.lake_dir)
            hl.info(
                f"handler {h.name} started to handle an event",
                n_segments=len(routed[h.name]),
            )
            try:
                ds = h.build(routed[h.name])
                res.lineage = replay(
                    ds, h.lake_dir, h.spec, projector=h.projector, salted=h.salted
                )
            except Exception:  # noqa: BLE001 — boundary: collected into Result
                res.error = traceback.format_exc(limit=8)
                hl.error(f"handler {h.name} failed", error=res.error)
            else:
                hl.finish(
                    f"handler {h.name} finished to handle an event",
                    **lineage_summary(res.lineage),
                )
            if h.notifier is not None:
                try:
                    h.notifier(res)
                except Exception:  # noqa: BLE001 — notify must not mask (handler.go:89-95)
                    logging.getLogger("raycdc.registry").warning(
                        "notifier for handler %r failed", h.name, exc_info=True
                    )
            return res

        workers = min(len(active), max_concurrency or len(active))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            results = list(pool.map(run_one, active))
        errors = [r for r in results if not r.ok]
        rl.finish(
            "router finished to handle a segment batch", n_errors=len(errors)
        )
        if errors and raise_on_error:
            raise RuntimeError(
                f"{len(errors)} handler(s) failed; first: {errors[0].handler}: "
                f"{errors[0].error}"
            )
        return results


class CollectingNotifier:
    """Test/ops notifier capturing results (the testNotifier analog,
    ``/root/reference/bqloader_test.go:139-147``); the Slack notifier's
    message format (✅/❌ + handler + event, ``notifier.go:69-80``) maps to
    :meth:`format`."""

    def __init__(self) -> None:
        self.results: list[Result] = []

    def __call__(self, result: Result) -> None:
        self.results.append(result)

    @staticmethod
    def format(result: Result) -> str:
        mark = "✅" if result.ok else "❌"
        detail = "" if result.ok else f"\nerror: {result.error}"
        return (
            f"{mark} [{result.handler}] processed {len(result.paths)} segment(s)"
            f"{detail}"
        )


# Transport: (url, headers, body bytes) -> (status code, response body bytes).
# Injectable so the notifier is testable against a fake — the analog of
# swapping http.Client in /root/reference/notifier_test.go:15-131.
Transport = Callable[[str, dict[str, str], bytes], tuple[int, bytes]]


def _urllib_transport(url: str, headers: dict[str, str], body: bytes) -> tuple[int, bytes]:
    """Default stdlib transport (no third-party HTTP dep)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still carries a body
        return e.code, e.read()


class SlackNotifier:
    """Push notifier for Slack ``chat.postMessage``
    (``/root/reference/notifier.go:31-137``): bot-token bearer auth, the
    reference's exact ✅/❌ text format, and ``{ok, error}`` response
    parsing.  Any failure (HTTP >= 400, non-JSON body, ``ok: false``)
    raises — and the Router logs, never masks, that raise
    (``handler.go:89-95``).

    ``transport`` is injectable for tests / alternative HTTP stacks; the
    default uses urllib.  Instances are callables usable directly as a
    :data:`Notifier`.
    """

    URL = "https://slack.com/api/chat.postMessage"

    def __init__(
        self,
        channel: str,
        token: str,
        icon_emoji: str = "",
        username: str = "",
        transport: Transport | None = None,
    ) -> None:
        self.channel = channel
        self.token = token
        self.icon_emoji = icon_emoji
        self.username = username
        self.transport = transport or _urllib_transport

    def _text(self, result: Result) -> str:
        # message shapes from notifier.go:69-74 (Event.Name → joined paths)
        event = ", ".join(result.paths)
        if result.ok:
            return (
                f":white_check_mark: {result.handler} handler successfully "
                f"loaded {event}"
            )
        return f":x: {result.handler} handler failed to load {event}: {result.error}"

    def __call__(self, result: Result) -> None:
        import json

        message: dict[str, str] = {"channel": self.channel, "text": self._text(result)}
        if self.icon_emoji:
            message["icon_emoji"] = self.icon_emoji
        if self.username:
            message["username"] = self.username
        status, body = self.transport(
            self.URL,
            {
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.token}",
            },
            json.dumps(message).encode(),
        )
        if status >= 400:
            raise RuntimeError(
                f"slack request failed with status code {status} ({body[:200]!r})"
            )
        try:
            parsed = json.loads(body)
        except ValueError as e:
            raise RuntimeError(f"failed to parse slack response: {body[:200]!r}") from e
        if not parsed.get("ok"):
            raise RuntimeError(f"failed to send message: {parsed.get('error')}")
