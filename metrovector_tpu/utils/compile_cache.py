"""Persistent XLA compilation cache wiring.

Cold start on the real TPU is dominated by compilation (the round-3 bench
measured 223 s of compile+first-run for the same shapes every process).
JAX ships a persistent on-disk compilation cache keyed by HLO hash —
wiring it means the SECOND process that compiles an identical (shape,
config) kernel loads the serialized executable in seconds instead of
recompiling.

Reference analog: none — the reference has no compiler in the loop at all
(its open is a ~10 ms mmap, ``README.md:146``); this is TPU-framework
operational surface the blueprint's serving story needs.

Opt-in for library users (call :func:`enable_compilation_cache`), default
ON for the repo's own benchmark harness and CLI via ``MVT_COMPILE_CACHE``:

- unset        → harness/CLI enable it at ``~/.cache/metrovector_tpu/jax``
- ``=<path>``  → enable at <path>
- ``=0``/``off`` → disabled
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "metrovector_tpu", "jax"
)
_OFF = ("0", "off", "no", "false")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir`` and relax
    the entry thresholds so even small search kernels are cached.

    ``cache_dir`` defaults to ``$MVT_COMPILE_CACHE`` or
    ``~/.cache/metrovector_tpu/jax``; pass (or set the env var to) ``0`` /
    ``off`` to disable. Safe to call more than once and before or after
    backend initialization. Returns the directory in use, or None when
    disabled."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("MVT_COMPILE_CACHE", _DEFAULT_DIR)
    if not cache_dir or cache_dir.lower() in _OFF:
        return None
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    if prev is not None and prev != cache_dir:
        # JAX initializes its on-disk cache singleton at most once per
        # process (at the first cache-enabled compile); re-pointing the
        # config after that silently keeps writing to the OLD directory
        # unless the singleton is reset.
        try:
            from jax.experimental.compilation_cache import (
                compilation_cache as _cc,
            )

            _cc.reset_cache()
        except (ImportError, AttributeError):  # API drift: best effort
            pass
    # Default thresholds skip sub-second/small executables — exactly the
    # shape-specialized search kernels we want cached.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
