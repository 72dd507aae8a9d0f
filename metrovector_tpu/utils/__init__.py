"""Shared utilities: timing, profiling, logging, compile caching,
bounded-size host→device transfers."""

from .compile_cache import enable_compilation_cache
from .log import get_logger
from .timing import PhaseTimer, device_trace, sync_time
from .transfer import put_chunked

__all__ = [
    "PhaseTimer",
    "device_trace",
    "enable_compilation_cache",
    "get_logger",
    "put_chunked",
    "sync_time",
]
