"""Parity tests for the Pallas fused distance+top-k kernel against the
NumPy oracle and the XLA path. On CPU the kernel runs in interpreter mode
(SURVEY.md §7 step 2: CPU-runnable via the Pallas interpreter)."""

import jax
import numpy as np
import pytest

from metrovector_tpu import DistanceMetric
from metrovector_tpu.ops import fused_topk, numpy_oracle

INTERPRET = jax.default_backend() == "cpu"
METRICS = [DistanceMetric.L2, DistanceMetric.COSINE, DistanceMetric.INNER_PRODUCT]


def _case(rng, n, d, q):
    db = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    norms = (db.astype(np.float64) ** 2).sum(1).astype(np.float32)
    return queries, db, norms


def _run(queries, db, norms, n_valid, k, metric, **kw):
    q = queries
    if metric == DistanceMetric.COSINE:
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    return fused_topk(
        q, db, norms, n_valid, k, metric, interpret=INTERPRET, **kw
    )


@pytest.mark.parametrize("metric", METRICS)
def test_kernel_matches_oracle_single_block(rng, metric):
    queries, db, norms = _case(rng, n=512, d=128, q=5)
    s, i = _run(queries, db, norms, 512, 10, metric, block_rows=512)
    _, oi = numpy_oracle(queries, db, 10, metric)
    assert np.array_equal(np.asarray(i), oi)


@pytest.mark.parametrize("metric", METRICS)
def test_kernel_multi_block_merge(rng, metric):
    queries, db, norms = _case(rng, n=1024, d=128, q=3)
    s, i = _run(queries, db, norms, 1024, 7, metric, block_rows=256)
    _, oi = numpy_oracle(queries, db, 7, metric)
    assert np.array_equal(np.asarray(i), oi)


def test_kernel_ragged_last_block(rng):
    """N not a multiple of block_rows exercises the padded tail block."""
    queries, db, norms = _case(rng, n=640, d=128, q=2)
    s, i = _run(queries, db, norms, 640, 5, DistanceMetric.L2, block_rows=256)
    _, oi = numpy_oracle(queries, db, 5, DistanceMetric.L2)
    assert np.array_equal(np.asarray(i), oi)


def test_kernel_num_valid_masks_padding(rng):
    queries, db, norms = _case(rng, n=512, d=128, q=2)
    db[200:] = 1000.0  # pretend rows ≥ 200 are tile padding w/ garbage
    norms[200:] = 0.0
    s, i = _run(queries, db, norms, 200, 8, DistanceMetric.INNER_PRODUCT,
                block_rows=256)
    assert np.asarray(i).max() < 200
    _, oi = numpy_oracle(queries[:, :], db[:200], 8, DistanceMetric.INNER_PRODUCT)
    assert np.array_equal(np.asarray(i), oi)


def test_kernel_tombstones(rng):
    queries, db, norms = _case(rng, n=256, d=128, q=2)
    _, base = _run(queries, db, norms, 256, 1, DistanceMetric.L2, block_rows=256)
    mask = np.ones(256, np.float32)
    mask[np.asarray(base).ravel()] = 0.0
    _, i2 = _run(queries, db, norms, 256, 4, DistanceMetric.L2,
                 valid_mask=jax.numpy.asarray(mask), block_rows=256)
    assert not np.intersect1d(np.asarray(i2), np.asarray(base)).size


def test_kernel_query_tile_padding(rng):
    """Q not a multiple of the query tile (and > one tile)."""
    queries, db, norms = _case(rng, n=256, d=128, q=19)
    s, i = _run(queries, db, norms, 256, 3, DistanceMetric.L2,
                block_rows=256, query_tile=16)
    _, oi = numpy_oracle(queries, db, 3, DistanceMetric.L2)
    assert np.array_equal(np.asarray(i), oi)


def test_kernel_bf16_db(rng):
    import ml_dtypes

    queries, db, norms = _case(rng, n=512, d=128, q=4)
    db16 = db.astype(ml_dtypes.bfloat16)
    norms16 = (db16.astype(np.float64) ** 2).sum(1).astype(np.float32)
    s, i = fused_topk(
        queries.astype(ml_dtypes.bfloat16), db16, norms16, 512, 10,
        DistanceMetric.L2, block_rows=512, interpret=INTERPRET,
    )
    # bf16 rounding perturbs near-ties; require strong overlap w/ f32 truth.
    _, oi = numpy_oracle(queries, db, 10, DistanceMetric.L2)
    overlap = [
        len(set(map(int, np.asarray(i)[r])) & set(map(int, oi[r]))) / 10
        for r in range(4)
    ]
    assert min(overlap) >= 0.8


def test_kernel_int8_symmetric(rng):
    d = 128
    x = rng.standard_normal((384, d)).astype(np.float32)
    scale_x = float(np.abs(x).max()) / 127.0
    codes = np.clip(np.rint(x / scale_x), -128, 127).astype(np.int8)
    deq = codes.astype(np.float32) * scale_x
    norms = (deq.astype(np.float64) ** 2).sum(1).astype(np.float32)

    queries = rng.standard_normal((3, d)).astype(np.float32)
    scale_q = float(np.abs(queries).max()) / 127.0
    qcodes = np.clip(np.rint(queries / scale_q), -128, 127).astype(np.int8)

    s, i = fused_topk(
        qcodes, codes, norms, 384, 10, DistanceMetric.INNER_PRODUCT,
        scale=scale_q * scale_x, block_rows=384, interpret=INTERPRET,
    )
    # Ranking must match the dequantized-float oracle exactly: the kernel
    # computes sq·sx·(int dot) which equals the dequantized dot.
    _, oi = numpy_oracle(qcodes.astype(np.float32) * scale_q, deq, 10,
                         DistanceMetric.INNER_PRODUCT)
    assert np.array_equal(np.asarray(i), oi)
    deq_scores = (qcodes.astype(np.float64) * scale_q) @ deq.T.astype(np.float64)
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(deq_scores, oi, 1), rtol=1e-5
    )


def test_kernel_k_exceeds_lane_tile(rng):
    queries, db, norms = _case(rng, n=512, d=128, q=2)
    s, i = _run(queries, db, norms, 512, 150, DistanceMetric.L2, block_rows=256)
    _, oi = numpy_oracle(queries, db, 150, DistanceMetric.L2)
    assert np.array_equal(np.asarray(i), oi)


@pytest.mark.parametrize("metric", METRICS)
def test_chunked_merge_matches_oracle(rng, metric):
    """The 'chunks' strategy (per-128-lane skip + direct pool inserts,
    no lane fold) must be bit-for-rank exact like the others."""
    n, d, k = 1024, 32, 10
    db = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((6, d)).astype(np.float32)
    if metric == DistanceMetric.COSINE:
        q = q / np.linalg.norm(q, axis=1, keepdims=True)
    norms = (db.astype(np.float64) ** 2).sum(1).astype(np.float32)
    s, i = fused_topk(
        q, db, norms, np.int32(n), k, metric,
        block_rows=256, interpret=True, merge="chunks",
    )
    _, oi = numpy_oracle(q, db, k, metric)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_chunked_merge_duplicates_and_tombstones(rng):
    """Tie-break (lowest index) and masking discipline under the chunked
    strategy, with heavy duplicates so ties cross chunk boundaries."""
    n, d, k = 512, 16, 12
    base = rng.standard_normal((64, d)).astype(np.float32)
    db = base[rng.integers(0, 64, n)]  # many exact duplicates
    q = rng.standard_normal((4, d)).astype(np.float32)
    norms = (db.astype(np.float64) ** 2).sum(1).astype(np.float32)
    mask = np.ones(n, np.float32)
    mask[rng.choice(n, 40, replace=False)] = 0.0
    s, i = fused_topk(
        q, db, norms, np.int32(n), k, DistanceMetric.L2,
        valid_mask=mask, block_rows=128, interpret=True, merge="chunks",
    )
    masked = db.copy().astype(np.float64)
    masked[mask == 0] = np.nan
    _, oi = numpy_oracle(q, masked, k, DistanceMetric.L2)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_chunked_merge_int8_k100(rng):
    n, d, k = 768, 32, 100
    db = rng.integers(-128, 127, (n, d)).astype(np.int8)
    q = rng.integers(-128, 127, (5, d)).astype(np.int8)
    norms = (db.astype(np.float64) ** 2).sum(1).astype(np.float32)
    s, i = fused_topk(
        q, db, norms, np.int32(n), k, DistanceMetric.L2,
        block_rows=256, interpret=True, merge="chunks",
    )
    _, oi = numpy_oracle(
        q.astype(np.float32), db.astype(np.float64), k, DistanceMetric.L2
    )
    np.testing.assert_array_equal(np.asarray(i), oi)


def _presampled(queries, db, norms, n, k, metric, **kw):
    from metrovector_tpu.ops.topk_kernel import fused_topk_presampled

    q = queries
    if metric == DistanceMetric.COSINE:
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    return fused_topk_presampled(
        q, db, norms, np.int32(n), k, metric, interpret=True, **kw
    )


@pytest.mark.parametrize("metric", METRICS)
def test_presampled_matches_oracle_f32(rng, metric):
    """The generalized two-phase scan (seed pool from [::stride], exclude
    seeded rows via the kernel liveness mask) must be bit-for-rank
    identical to the single-phase kernel on the general f32 path."""
    queries, db, norms = _case(rng, n=1024, d=64, q=5)
    s, i = _presampled(queries, db, norms, 1024, 10, metric,
                       stride=16, block_rows=256)
    _, oi = numpy_oracle(queries, db, 10, metric)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_presampled_k_exceeds_lanes_and_ragged(rng):
    """k > 128 (rolled selection) with N not a multiple of block_rows or
    of the stride."""
    queries, db, norms = _case(rng, n=900, d=32, q=3)
    s, i = _presampled(queries, db, norms, 900, 140, DistanceMetric.L2,
                       stride=32, block_rows=256)
    _, oi = numpy_oracle(queries, db, 140, DistanceMetric.L2)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_presampled_tombstones_and_duplicates(rng):
    """Tombstoned rows must vanish from both phases; exact duplicates
    exercise the seed-vs-scan tie-break (a scan row tying a seeded score
    with a lower index must win)."""
    n, d, k = 768, 16, 12
    base = rng.standard_normal((48, d)).astype(np.float32)
    db = base[rng.integers(0, 48, n)]
    queries = rng.standard_normal((4, d)).astype(np.float32)
    norms = (db.astype(np.float64) ** 2).sum(1).astype(np.float32)
    mask = np.ones(n, np.float32)
    mask[rng.choice(n, 60, replace=False)] = 0.0
    s, i = _presampled(queries, db, norms, n, k, DistanceMetric.L2,
                       stride=16, block_rows=128, valid_mask=mask)
    masked = db.copy().astype(np.float64)
    masked[mask == 0] = np.nan
    _, oi = numpy_oracle(queries, masked, k, DistanceMetric.L2)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_presampled_int8_deferred_scale(rng):
    """The original deferred-scale regime (int8 IP, pad-bias exclusion)
    must still be exact after the generalization."""
    n, d, k = 640, 32, 10
    codes = rng.integers(-128, 128, (n, d)).astype(np.int8)
    q = rng.integers(-128, 128, (3, d)).astype(np.int8)
    scale = 0.031
    deq = codes.astype(np.float32) * scale
    norms = (deq.astype(np.float64) ** 2).sum(1).astype(np.float32)
    s, i = _presampled(q, codes, norms, n, k,
                       DistanceMetric.INNER_PRODUCT,
                       scale=scale * 0.02, stride=16, block_rows=128)
    _, oi = numpy_oracle(q.astype(np.float32) * 0.02, deq, k,
                         DistanceMetric.INNER_PRODUCT)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_presampled_presliced_sub_matches(rng):
    """The steady-state `sub=` fast path must give identical results to
    the self-sliced one."""
    queries, db, norms = _case(rng, n=512, d=32, q=2)
    import jax.numpy as jnp

    sub = (jnp.asarray(db[::8]), jnp.asarray(norms[::8]))
    s1, i1 = _presampled(queries, db, norms, 512, 9, DistanceMetric.L2,
                         stride=8, block_rows=128)
    s2, i2 = _presampled(queries, db, norms, 512, 9, DistanceMetric.L2,
                         stride=8, block_rows=128, sub=sub)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_pool_top2_duplicates_k100(rng):
    """k > 32 engages the top-2 lane fold; heavy duplicates force lanes
    with two and three pool-beating rows (pair insert + full-width
    fallback paths) while keeping the tie-break contract."""
    n, d, k = 2048, 16, 100
    base = rng.standard_normal((96, d)).astype(np.float32)
    db = base[rng.integers(0, 96, n)]  # ~21 copies of each row
    queries = rng.standard_normal((5, d)).astype(np.float32)
    norms = (db.astype(np.float64) ** 2).sum(1).astype(np.float32)
    s, i = fused_topk(
        queries, db, norms, np.int32(n), k, DistanceMetric.L2,
        block_rows=512, interpret=True, merge="pool",
    )
    _, oi = numpy_oracle(queries, db, k, DistanceMetric.L2)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_pool_top2_exact_pair_in_lane(rng):
    """Plant exactly two pool-beating rows in one 128-lane of one block
    (ids 128 apart) — the case the single fold dropped and the pair
    insert must now recover without the full-width fallback."""
    n, d, k = 1024, 8, 40
    db = rng.standard_normal((n, d)).astype(np.float32) * 0.01
    q = np.ones((1, d), np.float32)
    # two huge rows in the same lane (col j, chunks c and c+1 of block 0)
    db[3 * 128 + 17] = 5.0
    db[4 * 128 + 17] = 4.0
    norms = (db.astype(np.float64) ** 2).sum(1).astype(np.float32)
    s, i = fused_topk(
        q, db, norms, np.int32(n), k, DistanceMetric.INNER_PRODUCT,
        block_rows=1024, interpret=True, merge="pool",
    )
    got = set(map(int, np.asarray(i)[0][:2]))
    assert got == {3 * 128 + 17, 4 * 128 + 17}
    _, oi = numpy_oracle(q, db, k, DistanceMetric.INNER_PRODUCT)
    np.testing.assert_array_equal(np.asarray(i), oi)


@pytest.mark.parametrize("merge", ["pool_imp", "rounds_imp"])
@pytest.mark.parametrize("metric", METRICS)
def test_imp_first_gate_matches_oracle(rng, metric, merge):
    """The imp-first variants (2-pass improvement gate before the fold)
    must stay bit-for-rank exact, duplicates and tombstones included."""
    n, d, k = 1024, 32, 10
    db = rng.standard_normal((n, d)).astype(np.float32)
    db[100] = db[700]  # cross-block duplicate: tie-break via gate path
    db[5] = db[6]
    q = rng.standard_normal((6, d)).astype(np.float32)
    if metric == DistanceMetric.COSINE:
        q = q / np.linalg.norm(q, axis=1, keepdims=True)
    norms = (db.astype(np.float64) ** 2).sum(1).astype(np.float32)
    mask = np.ones(n, np.float32)
    mask[50] = 0.0
    s, i = fused_topk(
        q, db, norms, np.int32(n - 24), k, metric,
        valid_mask=mask, block_rows=256, interpret=True, merge=merge,
    )
    sub = np.delete(db[: n - 24], 50, axis=0)  # drop the tombstoned row
    _, oi = numpy_oracle(q, sub, k, metric)
    oi = oi + (oi >= 50)  # back to original row ids
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_imp_first_int8_deferred_scale(rng):
    """imp-first on the deep10m-shaped path: int8 deferred-scale IP."""
    n, d, k = 768, 32, 10
    db = rng.integers(-127, 128, (n, d)).astype(np.int8)
    q = rng.integers(-127, 128, (4, d)).astype(np.int8)
    s, i = fused_topk(
        q, db, np.zeros(n, np.float32), np.int32(n), k,
        DistanceMetric.INNER_PRODUCT, scale=0.25,
        block_rows=256, interpret=True, merge="rounds_imp",
    )
    dots = q.astype(np.int64) @ db.T.astype(np.int64)
    oi = np.argsort(-dots * 4, 1, kind="stable")[:, :k]  # scale>0: same order
    np.testing.assert_array_equal(np.asarray(i), oi)
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(dots * 0.25, oi, 1), rtol=1e-6
    )


def test_imp_first_k_gt_32_top2(rng):
    """pool_imp composes with the top-2 fold (k > 32)."""
    queries, db, norms = _case(rng, n=1024, d=64, q=3)
    s, i = _run(queries, db, norms, 1024, 100, DistanceMetric.L2,
                block_rows=256, merge="pool_imp")
    _, oi = numpy_oracle(queries, db, 100, DistanceMetric.L2)
    assert np.array_equal(np.asarray(i), oi)
