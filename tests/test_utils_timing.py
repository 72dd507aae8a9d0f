"""Timing utilities."""

import time

from metrovector_tpu.utils import PhaseTimer, sync_time


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.phases["a"] >= 0.01
    rep = t.report()
    assert "a" in rep and "b" in rep and "share" in rep


def test_sync_time_returns_result():
    import jax.numpy as jnp

    dt, out = sync_time(lambda x: jnp.sum(x * 2), jnp.ones(8), reps=2)
    assert dt >= 0
    assert float(out) == 16.0
