"""Shared utilities: timing, profiling, logging."""

from .log import get_logger
from .timing import PhaseTimer, device_trace, sync_time

__all__ = ["PhaseTimer", "device_trace", "get_logger", "sync_time"]
