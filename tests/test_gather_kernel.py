"""Pallas DMA row gather (:mod:`metrovector_tpu.ops.gather_kernel`).

The kernel replaces XLA's scalarized TPU row gather inside
``rescore_topk`` (the ``high_verified`` repair pass). A gather is a byte
copy, so the contract is BIT-identity with ``jnp.take`` — any deviation
whatsoever is a bug. Runs in Pallas interpret mode on CPU (conftest pins
the backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from metrovector_tpu.format.constants import DistanceMetric
from metrovector_tpu.ops.distances import rescore_topk
from metrovector_tpu.ops.gather_kernel import auto_select, gather_rows, supports


@pytest.mark.parametrize(
    "n,d,r",
    [
        (3000, 96, 777),   # padded tail (777 % 256 != 0)
        (512, 128, 256),   # exactly one grid step
        (48, 8, 4),        # tiny: rows_per_step clamps to r
        (1000, 960, 512),  # GIST-wide rows
    ],
)
def test_gather_bit_identical(rng, n, d, r):
    db = rng.standard_normal((n, d)).astype(np.float32)
    idx = rng.integers(0, n, r).astype(np.int32)
    out = np.asarray(
        gather_rows(jnp.asarray(db), jnp.asarray(idx), interpret=True)
    )
    want = np.asarray(jnp.take(jnp.asarray(db), jnp.asarray(idx), axis=0))
    assert out.shape == (r, d)
    assert (out.view(np.uint32) == want.view(np.uint32)).all()


def test_gather_clamps_out_of_range(rng):
    """-1 (rescore's sentinel) and >=N clamp to valid rows instead of
    faulting the DMA; callers mask the scores separately."""
    db = rng.standard_normal((104, 32)).astype(np.float32)
    idx = np.array([-1, 0, 103, 104, 5_000_000, -7], np.int32)
    out = np.asarray(
        gather_rows(jnp.asarray(db), jnp.asarray(idx), interpret=True)
    )
    want = db[np.clip(idx, 0, 103)]
    assert (out == want).all()


@pytest.mark.parametrize("dtype", [np.float32, np.int8, np.uint8])
def test_gather_dtypes(rng, dtype):
    db = (rng.standard_normal((200, 64)) * 50).astype(dtype)
    idx = rng.integers(0, 200, 33).astype(np.int32)
    out = np.asarray(
        gather_rows(jnp.asarray(db), jnp.asarray(idx), interpret=True)
    )
    assert out.dtype == dtype
    assert (out == db[idx]).all()


def test_gather_rejects_ragged_row_count(rng):
    """N % 8 != 0 would need an unaligned last strip — gather_rows
    refuses (supports() steers such callers to jnp.take)."""
    db = rng.standard_normal((61, 32)).astype(np.float32)
    idx = np.array([60, 0, 13], np.int32)
    with pytest.raises(ValueError, match="N % 8"):
        gather_rows(jnp.asarray(db), jnp.asarray(idx), interpret=True)


def test_gather_last_strip_rows(rng):
    """Indices inside the final strip of an aligned corpus."""
    db = rng.standard_normal((64, 32)).astype(np.float32)
    idx = np.array([63, 62, 57, 56, 0, 63, 13], np.int32)
    out = np.asarray(
        gather_rows(jnp.asarray(db), jnp.asarray(idx), interpret=True)
    )
    assert (out.view(np.uint32) == db[idx].view(np.uint32)).all()


def test_gather_duplicate_indices(rng):
    """Many copies of the same source row (the planted-tie shape)."""
    db = rng.standard_normal((64, 16)).astype(np.float32)
    idx = np.full(300, 17, np.int32)
    out = np.asarray(
        gather_rows(jnp.asarray(db), jnp.asarray(idx), interpret=True)
    )
    assert (out == db[17]).all()


def test_supports_predicate(rng):
    assert supports(np.zeros((8, 4), np.float32))
    assert supports(np.zeros((64, 4), np.int8))
    assert not supports(np.zeros((4, 4), np.float32))  # < one 8-row strip
    assert not supports(np.zeros((20, 4), np.float32))  # ragged (N % 8)
    assert not supports(np.zeros((8, 4, 4), np.float32))  # not 2-D
    assert not supports(np.zeros((8, 4), np.float64))  # 8-byte dtype
    assert not supports(np.zeros((8, 4), np.float16))  # no Mosaic f16


def test_auto_select_measured_win_region(rng):
    """auto_select routes to the DMA kernel only where the r5 A/B
    measured a win: TPU-resident, rows >= 2 KB, <= 16384 candidates.
    On the CPU test backend it must always refuse (platform gate)."""
    wide = jnp.zeros((1024, 1024), jnp.float32)   # 4 KB rows
    narrow = jnp.zeros((1024, 128), jnp.float32)  # 512 B rows
    # CPU-resident arrays never route to the kernel
    assert not auto_select(wide, 4608)
    # interpret mode always refuses
    assert not auto_select(wide, 4608, interpret=True)
    # shape gates are platform-independent: narrow rows / big R refuse
    # before the platform check (exercised via numpy, devices()-less)
    assert not auto_select(np.zeros((1024, 128), np.float32), 4608)
    assert not auto_select(np.zeros((1024, 1024), np.float32), 100_000)


def test_rescore_pallas_gather_matches_xla(rng):
    """rescore_topk(pallas_gather=True) is bit-identical to the XLA
    gather path — scores AND indices — including -1 slots and ties."""
    db = rng.standard_normal((400, 48)).astype(np.float32)
    db[11] = db[371]  # exact tie pair
    norms = np.einsum("ij,ij->i", db, db, dtype=np.float64).astype(np.float32)
    q = rng.standard_normal((6, 48)).astype(np.float32)
    cand = rng.integers(0, 400, (6, 9)).astype(np.int32)
    cand[0, :2] = (11, 371)
    cand[3, 4:] = -1
    for metric in (
        DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT
    ):
        args = (
            jnp.asarray(q), jnp.asarray(db), jnp.asarray(norms),
            jnp.asarray(cand), 5, metric,
        )
        s_x, i_x = rescore_topk(*args, pallas_gather=False)
        s_p, i_p = rescore_topk(*args, pallas_gather=True, interpret=True)
        assert (np.asarray(i_x) == np.asarray(i_p)).all()
        sx, sp_ = np.asarray(s_x), np.asarray(s_p)
        both = np.isneginf(sx) & np.isneginf(sp_)
        assert (
            (sx.view(np.uint32) == sp_.view(np.uint32)) | both
        ).all()
