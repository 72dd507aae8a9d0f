"""Distance score conventions and the XLA (non-Pallas) exact top-k path.

This module is the behavioral spec for every search backend: the scalar
loops of the reference (`examples/similarity_search.rs:140-176`,
`examples/simple.rs:80-87` in thegenem0/metrovector) re-expressed as batched
matrix algebra. The Pallas fused kernel (:mod:`.topk_kernel`) must match
these results bit-for-rank; tests compare both against a NumPy oracle.

Score convention
----------------
Internally every metric is mapped to a **score where greater is better**, so
top-k is always a max-k:

* ``INNER_PRODUCT``: ``score = q · x``
* ``COSINE``:        ``score = (q · x) / (‖q‖ ‖x‖)``
* ``L2``:            ``score = 2 q·x − ‖x‖²``  (= ``‖q‖² − ‖q−x‖²``; the
  per-query ``‖q‖²`` shifts all scores equally and cannot change ranking,
  so it is omitted from selection and only restored when converting scores
  to user-facing distances)

All accumulation is f32 regardless of storage dtype (bf16/f16/int8 inputs
feed the MXU; `preferred_element_type=f32` guards against catastrophic
cancellation for near-duplicate vectors — SURVEY.md §7 "exactness").

Exactness contract
------------------
Rankings are exact up to f32 score resolution of the expanded form: two DB
rows whose expanded-form scores differ by less than ~1 ulp at the score's
magnitude (≈1.2e-7 · ‖x‖²) may swap. On integer-valued corpora (SIFT/DEEP
style) every score is exactly representable and rankings are absolutely
exact. For adversarial float data where ‖q−x‖² ≪ ‖x‖² (dense clusters far
from the origin), the reference's direct ``Σ(a−b)²`` form
(`examples/similarity_search.rs:152-157`) resolves ties the expanded form
cannot; such ties are physically meaningless at f32 input precision but can
flip the tail of a top-k list.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import DistanceMetric

# Plain Python float: a module-level jnp scalar would initialize the
# XLA backend at import time, breaking jax.distributed.initialize
# in multi-process programs. Weak-typed, so traced uses are identical.
_NEG_INF = float("-inf")


def _gather_auto(db, r: int, interpret: bool = False) -> bool:
    from .gather_kernel import auto_select

    return auto_select(db, r, interpret=interpret)


def scores_block(
    queries: jax.Array,
    db: jax.Array,
    db_norms: jax.Array,
    metric: DistanceMetric,
    query_inv_norms: jax.Array | None = None,
) -> jax.Array:
    """Greater-is-better score matrix ``[Q, N]`` for one DB block.

    ``queries``: ``[Q, D]`` (same dtype as ``db`` for the MXU-native path),
    ``db``: ``[N, D]``, ``db_norms``: ``[N]`` f32 squared L2 norms.
    ``query_inv_norms``: ``[Q]`` f32 reciprocal query norms (cosine only).
    """
    # precision=HIGHEST: on TPU the default matmul precision multiplies f32
    # inputs in bf16 (~3 decimal digits), which visibly reorders near-ties.
    # Exactness (recall@k = 1.0 vs an f32 oracle) requires full f32 passes;
    # for bf16/int8 storage the flag is a no-op.
    dots = jax.lax.dot_general(
        queries,
        db,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    metric = DistanceMetric(metric)
    if metric == DistanceMetric.INNER_PRODUCT:
        return dots
    if metric == DistanceMetric.L2:
        return 2.0 * dots - db_norms[None, :]
    if metric == DistanceMetric.COSINE:
        inv_db = jax.lax.rsqrt(jnp.maximum(db_norms, 1e-30))
        if query_inv_norms is None:
            q32 = queries.astype(jnp.float32)
            query_inv_norms = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(q32 * q32, axis=-1), 1e-30)
            )
        return dots * inv_db[None, :] * query_inv_norms[:, None]
    raise NotImplementedError(f"metric {metric!r} has no built-in score kernel")


def scores_to_distances(
    scores: jax.Array, metric: DistanceMetric, query_sq_norms: jax.Array | None = None
) -> jax.Array:
    """Convert internal scores to the user-facing quantity per metric:
    Euclidean distance for L2 (ascending = better, like the reference's
    ``find_top_k_similar``), similarity in [-1, 1] for cosine, raw dot
    product for inner product."""
    metric = DistanceMetric(metric)
    if metric == DistanceMetric.L2:
        if query_sq_norms is None:
            raise ValueError("L2 distance conversion requires query norms")
        return jnp.sqrt(jnp.maximum(query_sq_norms[:, None] - scores, 0.0))
    return scores


def distances_np(
    scores, metric: DistanceMetric, query_sq_norms=None
):
    """NumPy twin of :func:`scores_to_distances` for host-side result
    finalization — the conversion is trivial elementwise math, and routing
    it through jax from host arrays costs a full host↔device round trip
    per query batch (~30 ms over a remote-TPU link)."""
    import numpy as np

    metric = DistanceMetric(metric)
    scores = np.asarray(scores)
    if metric == DistanceMetric.L2:
        if query_sq_norms is None:
            raise ValueError("L2 distance conversion requires query norms")
        return np.sqrt(
            np.maximum(np.asarray(query_sq_norms)[:, None] - scores, 0.0)
        )
    return scores


def mask_scores(
    scores: jax.Array,
    row_offset,
    num_valid: int | jax.Array,
    valid_mask: jax.Array | None = None,
) -> jax.Array:
    """Force padded rows (global row id ≥ ``num_valid``) and tombstoned rows
    (``valid_mask == 0``) to −inf so they can never enter the top-k
    (SURVEY.md §7 "padding correctness")."""
    n = scores.shape[1]
    rows = row_offset + jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out = jnp.where(rows < num_valid, scores, _NEG_INF)
    if valid_mask is not None:
        out = jnp.where(valid_mask[None, :] != 0, out, _NEG_INF)
    return out


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_rows"))
def exact_topk_xla(
    queries: jax.Array,
    db: jax.Array,
    db_norms: jax.Array,
    num_valid,
    k: int,
    metric: DistanceMetric,
    valid_mask: jax.Array | None = None,
    block_rows: int = 16384,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k via plain XLA ops — the v0 engine and the oracle the
    Pallas kernel is tested against (build-plan step 2, SURVEY.md §7).

    Scans the DB in ``block_rows`` chunks with a carried candidate list so
    the full ``[Q, N]`` score matrix never materializes in HBM. Returns
    ``(scores [Q, k], indices [Q, k])`` sorted best-first.
    """
    q = queries
    n_pad = db.shape[0]
    metric = DistanceMetric(metric)
    qin = None
    if metric == DistanceMetric.COSINE:
        q32 = q.astype(jnp.float32)
        qin = jax.lax.rsqrt(jnp.maximum(jnp.sum(q32 * q32, axis=-1), 1e-30))

    nq = q.shape[0]
    if n_pad <= block_rows:
        s = scores_block(q, db, db_norms, metric, qin)
        s = mask_scores(s, 0, num_valid, valid_mask)
        s, i = jax.lax.top_k(s, k)
        # Unfilled slots (fewer than k unmasked rows) carry −inf scores and
        # arbitrary positions: normalize to the −1 sentinel.
        return s, jnp.where(jnp.isneginf(s), -1, i)

    nblocks = -(-n_pad // block_rows)
    pad_to = nblocks * block_rows
    if pad_to != n_pad:
        db = jnp.pad(db, ((0, pad_to - n_pad), (0, 0)))
        db_norms = jnp.pad(db_norms, (0, pad_to - n_pad))
        if valid_mask is not None:
            valid_mask = jnp.pad(valid_mask, (0, pad_to - n_pad))

    db_b = db.reshape(nblocks, block_rows, db.shape[1])
    norms_b = db_norms.reshape(nblocks, block_rows)
    mask_b = (
        valid_mask.reshape(nblocks, block_rows) if valid_mask is not None else None
    )

    def step(carry, xs):
        best_s, best_i = carry
        if mask_b is None:
            i, blk, nrm = xs
            msk = None
        else:
            i, blk, nrm, msk = xs
        s = scores_block(q, blk, nrm, metric, qin)
        s = mask_scores(s, i * block_rows, num_valid, msk)
        cand_s = jnp.concatenate([best_s, s], axis=1)
        idx = i * block_rows + jax.lax.broadcasted_iota(
            jnp.int32, (nq, block_rows), 1
        )
        cand_i = jnp.concatenate([best_i, idx], axis=1)
        top_s, pos = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return (top_s, top_i), None

    init = (
        jnp.full((nq, k), _NEG_INF, dtype=jnp.float32),
        jnp.full((nq, k), -1, dtype=jnp.int32),
    )
    xs = (jnp.arange(nblocks, dtype=jnp.int32), db_b, norms_b)
    if mask_b is not None:
        xs = xs + (mask_b,)
    (best_s, best_i), _ = jax.lax.scan(step, init, xs)
    return best_s, jnp.where(jnp.isneginf(best_s), -1, best_i)


def rescore_topk(
    queries: jax.Array,
    db: jax.Array,
    db_norms: jax.Array,
    cand_idx: jax.Array,
    k: int,
    metric: DistanceMetric,
    *,
    pallas_gather: bool | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact (f32 HIGHEST) re-scoring of a small candidate set, returning
    the verified top-k — the second stage of the engine's
    ``precision="high_verified"`` mode (bf16x3 fetch of ``k + margin``
    candidates, then this tiny exact pass repairs any sub-ulp boundary
    swaps; see ``benchmarks/RESULTS.md`` GIST1M 'high' analysis: the
    measured failure mode is a rank-k/k+1 tie flip 3.5e-7 from the
    oracle).

    ``queries``: ``[Q, D]`` f32 (cosine queries pre-normalized, matching
    :meth:`DeviceSpace.prepare_queries`). ``cand_idx``: ``[Q, m]`` row
    indices from the approximate pass, ``m ≥ k``; ``-1`` marks unfilled
    slots (fewer than m unmasked rows) and stays ``-1`` in the output.
    The candidate gather is ``Q·m`` rows — microscopic next to the full
    scan, so the exact pass costs ~nothing while the scan itself runs at
    bf16x3 speed. Ties break to the lowest row index (two-key
    ``lax.sort``), matching :func:`numpy_oracle` exactly.

    ``pallas_gather`` selects the row-gather backend: ``True`` routes it
    through :func:`~.gather_kernel.gather_rows` (in-flight hardware
    DMAs); ``None`` auto-picks the DMA kernel exactly in its measured
    win region — wide rows, small candidate count, TPU-resident corpus
    (see :func:`~.gather_kernel.auto_select`; at D=1024/R=4608 it cuts
    this pass from 3.63 to 2.93 ms, RESULTS.md r5). The gathered rows
    are bit-identical either way; the returned ranks match exactly,
    while scores may differ in the last ulp at wide D because XLA can
    tile the downstream dot differently per program.
    """
    if pallas_gather is None:
        pallas_gather = _gather_auto(db, int(np.prod(cand_idx.shape)), interpret)
    return _rescore_topk(
        queries, db, db_norms, cand_idx, k, DistanceMetric(metric),
        bool(pallas_gather), interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "pallas_gather", "interpret")
)
def _rescore_topk(
    queries, db, db_norms, cand_idx, k, metric, pallas_gather, interpret
):
    q = queries.astype(jnp.float32)
    valid = cand_idx >= 0
    safe = jnp.where(valid, cand_idx, 0)
    if pallas_gather:
        from .gather_kernel import gather_rows

        nq, m = safe.shape
        cand = gather_rows(
            db, safe.reshape(-1).astype(jnp.int32), interpret=interpret
        ).reshape(nq, m, db.shape[1]).astype(jnp.float32)
    else:
        cand = jnp.take(db, safe, axis=0).astype(jnp.float32)  # [Q, m, D]
    dots = jax.lax.dot_general(
        q,
        cand,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [Q, m]
    nrm = jnp.take(db_norms, safe)  # [Q, m]
    if metric == DistanceMetric.L2:
        scores = 2.0 * dots - nrm
    elif metric == DistanceMetric.COSINE:
        qin = jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, axis=-1), 1e-30))
        scores = dots * jax.lax.rsqrt(jnp.maximum(nrm, 1e-30)) * qin[:, None]
    elif metric == DistanceMetric.INNER_PRODUCT:
        scores = dots
    else:
        raise NotImplementedError(
            f"metric {metric!r} has no built-in score kernel"
        )
    scores = jnp.where(valid, scores, _NEG_INF)
    tie = jnp.where(valid, cand_idx, jnp.int32(2**31 - 1))
    neg_s, idx_sorted = jax.lax.sort(
        (-scores, tie), dimension=-1, num_keys=2, is_stable=True
    )
    top_s = -neg_s[:, :k]
    top_i = idx_sorted[:, :k]
    return top_s, jnp.where(jnp.isneginf(top_s), -1, top_i)


def numpy_oracle(queries, db, k, metric, valid_mask=None):
    """Reference-semantics brute force in NumPy (the scalar loops of
    ``examples/similarity_search.rs:140-176`` vectorized, f64 accumulation):
    ground truth for parity tests. Returns (scores [Q,k], indices [Q,k])."""
    import numpy as np

    q = np.asarray(queries, dtype=np.float64)
    x = np.asarray(db, dtype=np.float64)
    metric = DistanceMetric(metric)
    if metric == DistanceMetric.L2:
        d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        s = -d2  # greater-is-better, offset by ‖q‖² vs the jax convention
        s += (q * q).sum(-1)[:, None]
    elif metric == DistanceMetric.COSINE:
        s = (q @ x.T) / np.maximum(
            np.linalg.norm(q, axis=1)[:, None] * np.linalg.norm(x, axis=1)[None, :],
            1e-30,
        )
    elif metric == DistanceMetric.INNER_PRODUCT:
        s = q @ x.T
    else:
        raise NotImplementedError(metric)
    if valid_mask is not None:
        s = np.where(np.asarray(valid_mask)[None, :] != 0, s, -np.inf)
    # Rank at f32 granularity — the precision every engine actually scores
    # in. Ranking the raw f64 values is subtly WRONG for exact-duplicate
    # rows: BLAS dgemm's blocking can give bit-identical columns 1-ulp-
    # different f64 results depending on their position, silently breaking
    # the lowest-index tie contract this oracle defines (found by the
    # duplicate-heavy fuzzer on cosine/IP; the L2 path's elementwise
    # reduction was immune). Casting collapses sub-f32-ulp positional
    # noise so ties are ties.
    s = s.astype(np.float32)
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx
