"""Shared utilities: timing, profiling, logging, compile caching."""

from .compile_cache import enable_compilation_cache
from .log import get_logger
from .timing import PhaseTimer, device_trace, sync_time

__all__ = [
    "PhaseTimer",
    "device_trace",
    "enable_compilation_cache",
    "get_logger",
    "sync_time",
]
