"""Profiling: phase timers and ray-rate meters.

The reference's only instrumentation is wall-clock prints around BVH/OBJ
builds (``src/tlas.rs:46``, ``blas.rs:129,193``; SURVEY.md §5). Here timing is
a first-class utility, plus Mrays/s accounting fed by the integrator's ray
counters and an optional ``jax.profiler`` trace context for TPU work.
"""

from __future__ import annotations

import contextlib
import logging
import time

log = logging.getLogger("path_tracer_tpu")


class PhaseTimer:
    """Accumulates named phase durations; ``report()`` logs a summary."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            log.info("%s: %.3fs", name, dt)

    def report(self) -> str:
        lines = [f"  {k}: {v:.3f}s" for k, v in self.phases.items()]
        return "phase timings:\n" + "\n".join(lines)


class RayRateMeter:
    """Tracks rays traced / wall time -> Mrays/s and spp/s."""

    def __init__(self):
        self.rays = 0.0
        self.samples = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, rays: float, samples: int = 1):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds += time.perf_counter() - t0
            self.rays += rays
            self.samples += samples

    @property
    def mrays_per_s(self) -> float:
        return self.rays / self.seconds / 1e6 if self.seconds else 0.0

    @property
    def spp_per_s(self) -> float:
        return self.samples / self.seconds if self.seconds else 0.0


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """``jax.profiler`` trace wrapper; no-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
