"""Fused Pallas ADC kernel: parity with the XLA ADC path and the f64
reconstruction oracle, padding/tombstone masking, VMEM-retry behavior.
Runs through the Pallas interpreter on CPU (tiny shapes)."""

import numpy as np
import pytest

from metrovector_tpu.format.constants import DistanceMetric
from metrovector_tpu.index.pq import PQIndex, encode_pq, reconstruct_pq, train_pq
from metrovector_tpu.ops import numpy_oracle
from metrovector_tpu.ops.adc_kernel import fused_adc_topk

METRICS = [DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT]


def _fixture(rng, n=700, d=16, m=4, ksub=16):
    data = rng.standard_normal((n, d)).astype(np.float32)
    books = train_pq(data, m=m, ksub=ksub, iters=4)
    codes = encode_pq(data, books)
    recon = reconstruct_pq(codes, books)
    rnorms = np.einsum(
        "ij,ij->i", recon.astype(np.float64), recon.astype(np.float64)
    ).astype(np.float32)
    return data, books, codes, recon, rnorms


@pytest.mark.parametrize("metric", METRICS)
def test_kernel_matches_reconstruction_oracle(rng, metric):
    """exact_lut kernel ranking == f64 brute force over x̂, bit-for-rank
    (including the lane-fold + running-candidate machinery)."""
    _, books, codes, recon, rnorms = _fixture(rng)
    q = rng.standard_normal((9, 16)).astype(np.float32)
    qk = q
    if metric == DistanceMetric.COSINE:
        qk = q / np.linalg.norm(q, axis=1, keepdims=True)
    s, i = fused_adc_topk(
        qk, codes, books, rnorms, np.int32(len(codes)), 10, metric,
        exact_lut=True, block_rows=256, interpret=True,
    )
    _, oi = numpy_oracle(q, recon, 10, metric)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_kernel_matches_xla_adc_path(rng):
    """Pallas and XLA ADC backends agree exactly at exact_lut."""
    data, books, codes, recon, rnorms = _fixture(rng, n=500)
    idx = PQIndex.build(
        data, DistanceMetric.L2, codebooks=books, codes=codes, m=4, ksub=16
    )
    q = rng.standard_normal((6, 16)).astype(np.float32)
    a = idx.search(q, k=8, backend="pallas", exact_lut=True)
    b = idx.search(q, k=8, backend="xla", exact_lut=True)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.scores, b.scores, rtol=1e-6)


def test_kernel_masks_padding_and_tombstones(rng):
    data, books, codes, recon, rnorms = _fixture(rng, n=300)
    # declare only 200 rows valid + tombstone rows 3 and 7
    valid = np.ones(300, np.float32)
    valid[3] = valid[7] = 0.0
    q = rng.standard_normal((4, 16)).astype(np.float32)
    s, i = fused_adc_topk(
        q, codes, books, rnorms, np.int32(200), 290, DistanceMetric.L2,
        valid_mask=valid, exact_lut=True, block_rows=128, interpret=True,
    )
    i = np.asarray(i)
    live = i[i >= 0]
    assert live.max() < 200
    assert 3 not in live and 7 not in live
    # exactly 198 live rows → the rest of the 290 slots are -1 sentinels
    assert (i >= 0).sum(axis=1).tolist() == [198] * 4


def test_kernel_bf16_lut_close(rng):
    data, books, codes, recon, rnorms = _fixture(rng, n=600)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    se, ie = fused_adc_topk(
        q, codes, books, rnorms, np.int32(600), 10, DistanceMetric.L2,
        exact_lut=True, block_rows=256, interpret=True,
    )
    sb, ib = fused_adc_topk(
        q, codes, books, rnorms, np.int32(600), 10, DistanceMetric.L2,
        exact_lut=False, block_rows=256, interpret=True,
    )
    overlap = np.mean(
        [len(set(np.asarray(ie)[r]) & set(np.asarray(ib)[r])) / 10 for r in range(5)]
    )
    assert overlap >= 0.8


def test_near_duplicate_collisions(rng):
    """The pool merge must stay exact on adversarial near-duplicate
    corpora that force fold collisions (full-width insert path)."""
    base = rng.standard_normal((50, 16)).astype(np.float32)
    # many near-duplicates → dense score ties → frequent collisions
    data = np.concatenate([base + 1e-3 * rng.standard_normal((50, 16))
                           for _ in range(12)]).astype(np.float32)
    books = train_pq(data, m=4, ksub=16, iters=4)
    codes = encode_pq(data, books)
    recon = reconstruct_pq(codes, books)
    rnorms = np.einsum(
        "ij,ij->i", recon.astype(np.float64), recon.astype(np.float64)
    ).astype(np.float32)
    q = base[:6] + 0.01 * rng.standard_normal((6, 16)).astype(np.float32)
    s, i = fused_adc_topk(
        q, codes, books, rnorms, np.int32(len(data)), 40, DistanceMetric.L2,
        exact_lut=True, block_rows=128, interpret=True,
    )
    _, oi = numpy_oracle(q, recon, 40, DistanceMetric.L2)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_kernel_odd_sizes(rng):
    """Non-multiple-of-block row counts and tiny query batches."""
    data, books, codes, recon, rnorms = _fixture(rng, n=333)
    q = rng.standard_normal((1, 16)).astype(np.float32)
    s, i = fused_adc_topk(
        q, codes, books, rnorms, np.int32(333), 5, DistanceMetric.L2,
        exact_lut=True, block_rows=128, interpret=True,
    )
    _, oi = numpy_oracle(q, recon, 5, DistanceMetric.L2)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_int8_lut_near_parity(rng):
    """int8-quantized LUT on the integer MXU: candidate sets must stay
    within quantization tolerance of the f32-exact ADC ranking (the knob
    trades a small LUT rounding error for 2x MAC rate; always paired with
    re-ranking in serving)."""
    data, books, codes, recon, rnorms = _fixture(rng, n=2048)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    s_e, i_e = fused_adc_topk(
        q, codes, books, rnorms, np.int32(2048), 40, DistanceMetric.L2,
        exact_lut=True, block_rows=256, interpret=True,
    )
    s_q, i_q = fused_adc_topk(
        q, codes, books, rnorms, np.int32(2048), 40, DistanceMetric.L2,
        int8_lut=True, exact_lut=False, block_rows=256, interpret=True,
    )
    overlap = np.mean([
        len(set(np.asarray(i_e)[r]) & set(np.asarray(i_q)[r])) / 40
        for r in range(8)
    ])
    assert overlap >= 0.9, overlap
    # scores within the quantization error envelope
    np.testing.assert_allclose(
        np.asarray(s_q)[:, :10], np.asarray(s_e)[:, :10], rtol=0.05, atol=0.5
    )


def test_int8_lut_exclusions(rng):
    data, books, codes, recon, rnorms = _fixture(rng, n=512)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    with pytest.raises(ValueError):
        fused_adc_topk(
            q, codes, books, rnorms, np.int32(512), 5, DistanceMetric.L2,
            int8_lut=True, exact_lut=True, block_rows=128, interpret=True,
        )


@pytest.mark.parametrize("m", [4, 5])
def test_packed4_matches_unpacked(rng, m):
    """Nibble-packed 4-bit codes (packed4=True) must rank identically to
    the same codes unpacked, including odd m (padded high nibble) and a
    ragged tail block."""
    from metrovector_tpu.index.pq import pack_codes4, unpack_codes4

    n, dsub = 700, 4
    d = m * dsub
    data = rng.standard_normal((n, d)).astype(np.float32)
    books = train_pq(data, m=m, ksub=16, iters=4)
    codes = encode_pq(data, books)
    assert codes.max() < 16
    packed = pack_codes4(codes)
    assert packed.shape == (n, (m + 1) // 2)
    np.testing.assert_array_equal(unpack_codes4(packed, m), codes)
    recon = reconstruct_pq(codes, books)
    rnorms = np.einsum(
        "ij,ij->i", recon.astype(np.float64), recon.astype(np.float64)
    ).astype(np.float32)
    q = rng.standard_normal((6, d)).astype(np.float32)
    s0, i0 = fused_adc_topk(
        q, codes, books, rnorms, np.int32(n), 10, DistanceMetric.L2,
        exact_lut=True, block_rows=256, interpret=True,
    )
    s1, i1 = fused_adc_topk(
        q, packed, books, rnorms, np.int32(n), 10, DistanceMetric.L2,
        exact_lut=True, block_rows=256, interpret=True, packed4=True,
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    _, oi = numpy_oracle(q, recon, 10, DistanceMetric.L2)
    np.testing.assert_array_equal(np.asarray(i1), oi)


def test_packed4_rejects_wide_ksub(rng):
    data, books, codes, recon, rnorms = _fixture(rng, ksub=32)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    with pytest.raises(ValueError, match="ksub"):
        fused_adc_topk(
            q, codes[:, :2], books, rnorms, np.int32(len(codes)), 5,
            DistanceMetric.L2, interpret=True, packed4=True,
        )
