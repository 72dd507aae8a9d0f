"""Persistent compilation cache wiring (utils.compile_cache): the repo's
answer to the 223 s real-TPU cold start — a second process compiling an
identical kernel loads the serialized executable from disk instead."""

import os

import jax
import jax.numpy as jnp
import pytest

from metrovector_tpu.utils import enable_compilation_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    # reset the once-per-process cache singleton too, so later tests don't
    # keep writing into this test's (deleted) tmp directory
    from jax.experimental.compilation_cache import compilation_cache as cc

    cc.reset_cache()


def test_cache_populates_and_search_kernel_is_cached(tmp_path, rng):
    got = enable_compilation_cache(str(tmp_path / "cache"))
    assert got == str(tmp_path / "cache")
    assert jax.config.jax_compilation_cache_dir == got

    from metrovector_tpu import Builder, Reader, SearchEngine

    import numpy as np

    # Shapes unique to this test: under the full suite the in-process jit
    # cache already holds common (n, d, k, batch) search executables, and a
    # cache hit never writes a persistent entry — a fresh compile must be
    # forced for the on-disk cache to populate.
    data = rng.standard_normal((307, 72)).astype(np.float32)
    b = Builder()
    b.add_vector_space("v", dim=72)
    b.add_vectors("v", data)
    path = tmp_path / "c.mvt"
    b.build().save(path)
    eng = SearchEngine(Reader.open(path).vector_space("v"), backend="xla")
    eng.search(rng.standard_normal((3, 72)).astype(np.float32), k=9)
    entries = os.listdir(got)
    assert entries, "search compile produced no persistent cache entries"


def test_cache_off_switch(tmp_path, monkeypatch):
    assert enable_compilation_cache("off") is None
    monkeypatch.setenv("MVT_COMPILE_CACHE", "0")
    assert enable_compilation_cache() is None
    monkeypatch.setenv("MVT_COMPILE_CACHE", str(tmp_path / "envdir"))
    got = enable_compilation_cache()
    assert got == str(tmp_path / "envdir") and os.path.isdir(got)
