"""Stage profiler: wall-clock stage timings + optional JAX profiler scopes.

Keeps the reference's user-facing "TIMING BREAKDOWN" surface
(`/root/reference/scripts/realtime_inference.py:738,929-973` — a per-stage
seconds dict) while adding TPU-native tracing: every stage is wrapped in
``jax.profiler.TraceAnnotation`` so stages show up in XLA profiles, and
device work is fenced with ``block_until_ready`` when a result is handed in
so timings measure compute, not dispatch.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Iterator, Optional

logger = logging.getLogger(__name__)

try:  # profiling must never be a hard dependency of host-only code paths
    import jax
    _HAVE_JAX = True
except Exception:  # pragma: no cover
    _HAVE_JAX = False


def _block_on(value: Any) -> None:
    """Fence device work referenced by ``value`` (no-op for host data)."""
    if not _HAVE_JAX or value is None:
        return
    try:
        jax.block_until_ready(value)
    except Exception:
        pass


class StageTimer:
    """Accumulates per-stage wall-clock seconds.

    >>> timer = StageTimer()
    >>> with timer.stage("frame_extraction"):
    ...     frames = decode()
    >>> timer.timings["frame_extraction"]  # seconds
    """

    def __init__(self) -> None:
        self.timings: dict[str, float] = {}
        self._order: list[str] = []

    @contextlib.contextmanager
    def stage(self, name: str, result: Optional[Any] = None) -> Iterator[None]:
        t0 = time.perf_counter()
        ctx = (
            jax.profiler.TraceAnnotation(name)
            if _HAVE_JAX
            else contextlib.nullcontext()
        )
        try:
            with ctx:
                yield
        finally:
            _block_on(result)
            dt = time.perf_counter() - t0
            if name not in self.timings:
                self._order.append(name)
                self.timings[name] = 0.0
            self.timings[name] += dt

    def record(self, name: str, seconds: float) -> None:
        if name not in self.timings:
            self._order.append(name)
            self.timings[name] = 0.0
        self.timings[name] += seconds

    @property
    def total(self) -> float:
        return sum(self.timings.values())

    def report(self, title: str = "TIMING BREAKDOWN") -> str:
        """Render the per-stage table the CLI prints after processing."""
        width = max([len(n) for n in self._order] + [10])
        lines = ["=" * (width + 24), title, "-" * (width + 24)]
        for name in self._order:
            secs = self.timings[name]
            pct = 100.0 * secs / self.total if self.total else 0.0
            lines.append(f"{name:<{width}}  {secs:8.2f}s  {pct:5.1f}%")
        lines.append("-" * (width + 24))
        lines.append(f"{'TOTAL':<{width}}  {self.total:8.2f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def stage_scope(name: str) -> Iterator[None]:
    """Standalone profiler scope (named_scope inside jit, trace outside)."""
    if _HAVE_JAX:
        with jax.profiler.TraceAnnotation(name):
            yield
    else:  # pragma: no cover
        yield


def device_memory_stats() -> dict[str, int]:
    """Peak/current HBM stats for device 0 (empty dict on CPU backends)."""
    if not _HAVE_JAX:
        return {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {k: int(v) for k, v in stats.items() if isinstance(v, (int, float))}
    except Exception:
        return {}
