"""Bounded-size host→device upload (`utils.transfer.put_chunked`).

The helper must be bit-identical to a direct device_put at every
threshold crossing — it sits on the resident-upload path of every
engine (engine.DeviceSpace.from_space, PQ/IVF-PQ codes, sparse ELL).
"""

import numpy as np
import pytest

from metrovector_tpu.utils.transfer import put_chunked


@pytest.mark.parametrize("shape,dtype", [
    ((100, 64), np.float32),
    ((101, 3), np.uint8),
    ((7,), np.float32),
])
def test_chunked_matches_direct(shape, dtype):
    import jax

    rng = np.random.default_rng(0)
    arr = (rng.standard_normal(shape) * 10).astype(dtype)
    direct = np.asarray(jax.device_put(arr))
    # force chunking with a tiny piece size (several pieces)
    out = put_chunked(arr, max_bytes=256)
    assert out.dtype == arr.dtype and out.shape == arr.shape
    np.testing.assert_array_equal(np.asarray(out), direct)


def test_below_threshold_uploads_directly():
    arr = np.arange(32, dtype=np.float32).reshape(8, 4)
    out = put_chunked(arr)  # default 512 MB threshold: direct path
    np.testing.assert_array_equal(np.asarray(out), arr)


def test_single_row_and_scalar_pass_through():
    np.testing.assert_array_equal(
        np.asarray(put_chunked(np.ones((1, 1000), np.float32), max_bytes=8)),
        np.ones((1, 1000), np.float32),
    )
    assert float(np.asarray(put_chunked(np.float32(3.5), max_bytes=1))) == 3.5


def test_env_var_off_disables(monkeypatch):
    monkeypatch.setenv("MVT_PUT_CHUNK_BYTES", "off")
    arr = np.zeros((64, 64), np.float32)
    np.testing.assert_array_equal(np.asarray(put_chunked(arr)), arr)


def test_env_var_sets_piece_size(monkeypatch):
    monkeypatch.setenv("MVT_PUT_CHUNK_BYTES", "128")
    arr = np.random.default_rng(1).standard_normal((40, 8)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(put_chunked(arr)), arr)


def test_device_pinning():
    import jax

    dev = jax.devices()[-1]
    arr = np.random.default_rng(2).standard_normal((64, 16)).astype(np.float32)
    out = put_chunked(arr, device=dev, max_bytes=512)
    assert list(out.devices()) == [dev]
    np.testing.assert_array_equal(np.asarray(out), arr)
