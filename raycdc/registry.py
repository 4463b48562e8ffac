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

    def run(self, paths: Sequence[str], raise_on_error: bool = True) -> list[Result]:
        """Process a batch of arrived segments through every matching
        handler; always notify; aggregate errors like the errgroup fan-out
        (first error reported, all handlers attempted)."""
        results: list[Result] = []
        routed = self.route(paths)
        for h in self.handlers:
            matched = routed[h.name]
            if not matched:
                continue
            res = Result(handler=h.name, paths=matched)
            try:
                ds = h.build(matched)
                res.lineage = replay(
                    ds, h.lake_dir, h.spec, projector=h.projector, salted=h.salted
                )
            except Exception:  # noqa: BLE001 — boundary: collected into Result
                res.error = traceback.format_exc(limit=8)
            if h.notifier is not None:
                try:
                    h.notifier(res)
                except Exception:  # noqa: BLE001 — notify must not mask (handler.go:89-95)
                    pass
            results.append(res)
        errors = [r for r in results if not r.ok]
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
