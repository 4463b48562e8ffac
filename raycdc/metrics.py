"""Process-local observability counters for lossy safeguards.

The candidate-generation kernels cap degenerate buckets (a hot LSH band, a
hot simhash chunk, a hot sign-bucket) to bound their quadratic pair blowup.
That cap trades recall for boundedness — the no-silent-caps rule requires
the loss to be OBSERVABLE, so every truncation is (a) counted on a
process-local counter and (b) emitted as a ``raycdc.caps`` warning log line
naming the kernel, the bucket size, and the cap.

Scope semantics: the counter is per PROCESS.  Kernel unit tests call the
group kernels directly and assert on ``CAPS`` in-process; in a distributed
run each Ray worker accumulates its own counts and the log lines surface in
the worker logs (`/tmp/ray/.../logs`), so a capped run is never silent.
A cluster-global metric would need a metrics actor — deliberately not done
here: a hot counter actor on the candidate path would serialize the very
stage the cap exists to keep parallel.
"""

from __future__ import annotations

import logging
import threading
from collections import defaultdict

logger = logging.getLogger("raycdc.caps")


class CapCounter:
    """Thread-safe per-process truncation tally, keyed by kernel name."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.buckets_truncated: dict[str, int] = defaultdict(int)
        self.ids_dropped: dict[str, int] = defaultdict(int)

    def record(self, kernel: str, bucket_size: int, cap: int) -> None:
        dropped = bucket_size - cap
        with self._lock:
            self.buckets_truncated[kernel] += 1
            self.ids_dropped[kernel] += dropped
        logger.warning(
            "%s: bucket of %d ids capped to %d (%d ids dropped from pair "
            "candidates — recall loss in this bucket)",
            kernel,
            bucket_size,
            cap,
            dropped,
        )

    def reset(self) -> None:
        with self._lock:
            self.buckets_truncated.clear()
            self.ids_dropped.clear()

    def snapshot(self) -> dict[str, dict[str, int]]:
        with self._lock:
            return {
                "buckets_truncated": dict(self.buckets_truncated),
                "ids_dropped": dict(self.ids_dropped),
            }


CAPS = CapCounter()
