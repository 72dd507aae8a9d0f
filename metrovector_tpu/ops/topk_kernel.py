"""Pallas TPU kernel: blocked query×DB distance matmul fused with on-chip
running top-k selection.

This is the TPU-native replacement for the reference's scalar brute-force
loop + BinaryHeap (`examples/similarity_search.rs:140-176` in
thegenem0/metrovector) and the heart of the framework (SURVEY.md §7,
build-plan step 3). Design:

* Grid ``(query_tiles, db_blocks)`` with the DB-block axis innermost. Each
  step computes a ``[QT, BN]`` score tile on the MXU (f32/bf16/f16 inputs
  accumulate in f32; int8 uses the integer MXU path with a static dequant
  scale folded into the epilogue).
* A VMEM scratch candidate list ``best[QT, K_PAD]`` (scores + global
  indices) persists across the sequential db-block steps — the full
  ``[Q, N]`` score matrix never exists anywhere, in HBM or VMEM.
* Per step, the block's scores are merged into the candidate list by
  ``k`` rounds of (max, argmax-via-iota, mask) on the VPU. A whole-tile
  threshold test (``block max ≤ current worst candidate``) skips the merge
  entirely for blocks that cannot contribute — on unsorted corpora this
  prunes the vast majority of merges after warm-up.
* Tile padding (rows ≥ ``num_valid``) and tombstoned rows are masked to
  −inf before selection, so physical padding can never surface in results.
* Tie-breaking is "lowest global index wins", matching a stable argsort
  oracle.

Results are exact: no early exit ever drops a true top-k row (the skip
test is conservative — a block is skipped only when its best score cannot
beat any query's worst retained candidate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.constants import LANES, DistanceMetric

_NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def default_block_rows(padded_dim: int, itemsize: int) -> int:
    """DB rows per grid step, sized so the streamed DB block stays ≤ ~2 MB
    of VMEM (leaving room for double-buffering and the score tile)."""
    row_bytes = padded_dim * itemsize
    target = 2 * 1024 * 1024
    bn = max(256, min(2048, target // max(row_bytes, 1)))
    return _round_up(bn, 256)


def _select_k(cand_s, cand_i, best_s_ref, best_i_ref, k: int):
    """k rounds of max/argmax/mask over the candidate tile, writing the
    sorted-descending winners into the scratch refs. ``cand_s`` is f32
    ``[QT, C]``; ties resolve to the lowest position (and candidates are
    ordered old-best-then-ascending-index, so lowest global index wins)."""
    qt, c = cand_s.shape
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (qt, c), 1)
    big = jnp.int32(2**31 - 1)
    for j in range(k):
        m = jnp.max(cand_s, axis=1)
        eq = cand_s == m[:, None]
        pos = jnp.min(jnp.where(eq, pos_iota, big), axis=1)
        onehot = pos_iota == pos[:, None]
        best_s_ref[:, j : j + 1] = m[:, None]
        best_i_ref[:, j : j + 1] = jnp.sum(
            jnp.where(onehot, cand_i, 0), axis=1, dtype=jnp.int32
        )[:, None]
        cand_s = jnp.where(onehot, _NEG_INF, cand_s)


def _make_kernel(k: int, k_pad: int, block_rows: int, metric: DistanceMetric,
                 scale: float, has_valid: bool, int_path: bool):
    metric = DistanceMetric(metric)

    def kernel(nvalid_ref, q_ref, db_ref, norms_ref, *rest):
        if has_valid:
            valid_ref, out_s_ref, out_i_ref, best_s, best_i = rest
        else:
            valid_ref = None
            out_s_ref, out_i_ref, best_s, best_i = rest

        ni = pl.program_id(1)
        nblocks = pl.num_programs(1)

        @pl.when(ni == 0)
        def _init():
            best_s[:] = jnp.full_like(best_s, _NEG_INF)
            best_i[:] = jnp.full_like(best_i, -1)

        if int_path:
            dots = jax.lax.dot_general(
                q_ref[:], db_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            # HIGHEST precision: f32 inputs must not round through bf16 on
            # the MXU or near-tie rankings diverge from the f32 oracle
            # (exactness contract; see ops.distances docstring).
            dots = jax.lax.dot_general(
                q_ref[:], db_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        if scale != 1.0:
            dots = dots * jnp.float32(scale)

        norms = norms_ref[:]  # (1, BN) f32, dequantized squared L2 norms
        if metric == DistanceMetric.L2:
            scores = 2.0 * dots - norms
        elif metric == DistanceMetric.COSINE:
            # queries are pre-normalized by the caller; finish with 1/‖x‖
            scores = dots * jax.lax.rsqrt(jnp.maximum(norms, 1e-30))
        else:  # INNER_PRODUCT
            scores = dots

        row0 = ni * block_rows
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)
        scores = jnp.where(rows < nvalid_ref[0, 0], scores, _NEG_INF)
        if valid_ref is not None:
            scores = jnp.where(valid_ref[:] != 0, scores, _NEG_INF)

        # Conservative whole-tile skip: nothing in this block can beat the
        # worst retained candidate of any query in the tile.
        worst = jnp.min(best_s[:, :k])
        blockmax = jnp.max(scores)

        @pl.when(blockmax > worst)
        def _merge():
            qt = scores.shape[0]
            gidx = row0 + jax.lax.broadcasted_iota(
                jnp.int32, (qt, block_rows), 1
            )
            cand_s = jnp.concatenate([best_s[:], scores], axis=1)
            cand_i = jnp.concatenate([best_i[:], gidx], axis=1)
            _select_k(cand_s, cand_i, best_s, best_i, k)

        @pl.when(ni == nblocks - 1)
        def _flush():
            out_s_ref[:] = best_s[:]
            out_i_ref[:] = best_i[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "scale", "block_rows", "query_tile", "interpret",
    ),
)
def fused_topk(
    queries: jax.Array,
    db: jax.Array,
    db_norms: jax.Array,
    num_valid: jax.Array,
    k: int,
    metric: DistanceMetric,
    valid_mask: jax.Array | None = None,
    scale: float = 1.0,
    block_rows: int | None = None,
    query_tile: int = 128,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k search over one resident DB shard.

    Args:
      queries: ``[Q, D]`` in the DB's compute dtype (pre-normalized for
        cosine; pre-quantized for int8). ``D`` must equal ``db.shape[1]``.
      db: ``[N, D]`` tile-padded corpus block (f32 / bf16 / f16 / int8).
      db_norms: ``[N]`` f32 squared L2 norms in dequantized value space.
      num_valid: scalar int32 — logical rows; rows ≥ this are padding.
      k: number of neighbors (static).
      metric: L2 / COSINE / INNER_PRODUCT (static).
      valid_mask: optional ``[N]`` f32/int mask; 0 ⇒ row is tombstoned.
      scale: static dequant factor applied to raw dots (int8: sq·sx).
      block_rows / query_tile: tile sizes (static; defaults auto-sized).
      interpret: run in the Pallas interpreter (CPU testing).

    Returns:
      ``(scores [Q, k] f32, indices [Q, k] int32)`` sorted best-first with
      the greater-is-better score convention of :mod:`.distances`.
    """
    q, d = queries.shape
    n = db.shape[0]
    if block_rows is None:
        block_rows = default_block_rows(d, db.dtype.itemsize)
    qt = min(query_tile, _round_up(q, 8))
    k_pad = _round_up(k, LANES)

    q_pad = _round_up(q, qt)
    if q_pad != q:
        queries = jnp.pad(queries, ((0, q_pad - q), (0, 0)))

    metric = DistanceMetric(metric)
    int_path = db.dtype in (jnp.int8.dtype, jnp.uint8.dtype)
    nvalid_arr = jnp.asarray(num_valid, dtype=jnp.int32).reshape(1, 1)
    norms_2d = db_norms.reshape(1, n).astype(jnp.float32)

    grid = (q_pad // qt, pl.cdiv(n, block_rows))

    in_specs = [
        pl.BlockSpec((1, 1), lambda qi, ni: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((qt, d), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, d), lambda qi, ni: (ni, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_rows), lambda qi, ni: (0, ni),
                     memory_space=pltpu.VMEM),
    ]
    args = [nvalid_arr, queries, db, norms_2d]
    if valid_mask is not None:
        in_specs.append(
            pl.BlockSpec((1, block_rows), lambda qi, ni: (0, ni),
                         memory_space=pltpu.VMEM)
        )
        args.append(valid_mask.reshape(1, n).astype(jnp.float32))

    kernel = _make_kernel(
        k, k_pad, block_rows, metric, float(scale),
        has_valid=valid_mask is not None, int_path=int_path,
    )

    flops_dot = 2 * q_pad * n * d
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((qt, k_pad), lambda qi, ni: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k_pad), lambda qi, ni: (qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qt, k_pad), jnp.float32),
            pltpu.VMEM((qt, k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_dot,
            bytes_accessed=n * d * db.dtype.itemsize + q_pad * d * 4 + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out_s[:q, :k], out_i[:q, :k]
