"""Shared utilities: timing, profiling."""

from .timing import PhaseTimer, device_trace, sync_time

__all__ = ["PhaseTimer", "device_trace", "sync_time"]
