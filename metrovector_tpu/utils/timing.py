"""Timing and profiling helpers.

The reference has no tracing subsystem — only ad-hoc ``Instant`` timing in
its benchmark example (``examples/large_dataset.rs:126-228`` in
thegenem0/metrovector). Here the equivalents are first-class: a phase timer
for harnesses and a ``jax.profiler`` trace context for device-level
inspection (SURVEY.md §5 "Tracing / profiling").
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class PhaseTimer:
    """Accumulates named wall-clock phases; prints a compact report."""

    phases: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.phases.values()) or 1.0
        lines = [f"{'phase':<24}{'total':>10}{'calls':>8}{'share':>8}"]
        for name, t in sorted(self.phases.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"{name:<24}{t * 1e3:>8.1f}ms{self.counts[name]:>8}"
                f"{100 * t / total:>7.1f}%"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/mvt_trace"):
    """Capture a jax profiler trace around a block (view with
    tensorboard / xprof). No-op fallback when the profiler is unavailable
    (e.g. some CPU builds)."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def sync_time(fn, *args, reps: int = 1, **kw) -> tuple[float, object]:
    """Wall time of ``fn`` including device sync; returns (seconds, result)."""
    import jax

    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out
