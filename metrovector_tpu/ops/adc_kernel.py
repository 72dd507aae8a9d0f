"""Pallas TPU kernel: fused PQ asymmetric-distance scan + on-chip top-k.

The Pallas counterpart of :func:`metrovector_tpu.index.pq._adc_search`'s
XLA path, removing its dominant cost: the XLA formulation materializes a
``[block, m·ksub]`` multi-hot matrix in HBM per block (written by the VPU,
re-read by the MXU). Here the one-hot never leaves VMEM:

* Grid ``(query_tiles, code_blocks)``. Each step loads a ``[BN, m]`` uint8
  code block (``m`` bytes/row — the whole point of PQ) and the per-query
  LUT tile ``[QT, m·ksub]`` (``LUT[q, j·ksub+c] = q_j · C[j, c]``,
  computed once per batch outside the kernel).
* The ``m`` per-subspace one-hots (iota compares in VMEM) concatenate
  along lanes into one ``[BN, m·ksub]`` operand, and a single deep
  (K = m·ksub) MXU matmul against the LUT computes
  ``dots[QT, BN] = Σ_j q_j · C[j, code_j]`` — the classic per-lane ADC
  gather recast as one dense matmul per block.
* Metric epilogue on precomputed reconstruction norms, padding/tombstone
  masking, lane-fold candidate compression and the streaming replace-min
  pool selection are shared with :mod:`.topk_kernel` (same exactness
  discipline: exact with respect to the *reconstructed* corpus; PQ's only
  approximation is the quantization itself).
* Optional gather-free IVF probing: per-(query, bucket) bias columns ride
  the LUT, matched by bucket one-hot columns built from a per-row id
  input — see ``group_bias``/``group_ids`` in :func:`fused_adc_topk`.

MAC cost is ``m·ksub / D`` × an exact matmul (e.g. 32× for m=16, ksub=256,
D=128) — PQ on TPU is a **memory** optimization (HBM capacity + streaming
bandwidth shrink ``4·D/m``×), paid for with abundant MXU FLOPs; see the
module docstring of :mod:`metrovector_tpu.index.pq`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.constants import LANES, DistanceMetric
from ..utils.log import get_logger
from .topk_kernel import _NEG_INF, _pool_flush, _pool_merge_block, _round_up

_log = get_logger("ops.adc")


def default_adc_block_rows(m: int, ksub: int, query_tile: int = 128,
                           k_pad: int = 128, exact_lut: bool = False,
                           extra_cols: int = 0,
                           packed4: bool = False) -> int:
    """Code-block rows per grid step. Live VMEM per step ≈ double-buffered
    codes (``2·BN·m``), the full-width one-hot (``BN·m·ksub·esz`` — the
    m per-subspace one-hots concatenate into one ``[BN, m·ksub]`` operand
    so the MXU sees a single K=m·ksub matmul), the LUT tile
    (``QT·m·ksub·esz``) and the score tile (``QT·BN·4``)."""
    esz = 4 if exact_lut else 2
    # ~20 MB live-set target (measured sweet spot on v5e: block_rows=2048
    # at m=16/ksub=256/bf16 — larger blocks lose to score-tile pressure,
    # smaller ones to per-step overhead; the VMEM-OOM retry in
    # fused_adc_topk guards tighter parts). ``extra_cols`` charges the
    # group-bias one-hot columns of the gather-free IVF path — omitting
    # them over-sizes the block into the silent VMEM-spill regime
    # (measured ~10× slower at n_groups≈1280).
    k_cols = m * ksub + extra_cols
    budget = 20 * 1024 * 1024 - query_tile * k_cols * esz
    budget -= 24 * query_tile * max(k_pad - 128, 0)
    # 12·qt per code row: the f32 score tile (4·qt) plus the pool merge's
    # collision-path full-width (scores, ids) loop carries (8·qt).
    denom = 2 * m + k_cols * esz + 12 * query_tile + 32
    if packed4:
        # The matmul-expansion nibble path materializes two full-width
        # f32 intermediates per row (``expanded`` and the nibble values,
        # 8·m·ksub B) before the one-hot compare — omitting them lands in
        # the silent-spill regime. Measured cliffs pin the caps: plain
        # 4-bit spills at br=4096 (deep100m-pq4, 2048 best); with bias
        # columns the auto 3072 ran 77× slower than 1024
        # (benchmarks/RESULTS.md).
        denom += 8 * m * ksub
    bn = budget // max(denom, 1)
    if packed4:
        bn = min(bn, 1024 if extra_cols else 2048)
    bn = max(256, min(8192, bn))
    return (bn // 256) * 256


def _make_adc_kernel(k: int, k_pad: int, block_rows: int, m: int, ksub: int,
                     metric: DistanceMetric, has_valid: bool,
                     exact_lut: bool, group_rows: int = 0,
                     n_groups: int = 0, has_group_ids: bool = False,
                     int8_lut: bool = False, packed4: bool = False):
    metric = DistanceMetric(metric)
    oh_dtype = (
        jnp.int8 if int8_lut
        else jnp.float32 if exact_lut
        else jnp.bfloat16
    )
    prec = (
        jax.lax.Precision.HIGHEST if exact_lut else jax.lax.Precision.DEFAULT
    )

    def kernel(nvalid_ref, lut_ref, codes_ref, norms_ref, *rest):
        rest = list(rest)
        sq_ref = rest.pop(0) if int8_lut else None
        gid_ref = rest.pop(0) if has_group_ids else None
        valid_ref = rest.pop(0) if has_valid else None
        out_s_ref, out_i_ref, best_s, best_i = rest

        ni = pl.program_id(1)
        nblocks = pl.num_programs(1)

        @pl.when(ni == 0)
        def _init():
            best_s[:] = jnp.full_like(best_s, _NEG_INF)
            best_i[:] = jnp.full_like(best_i, -1)

        ni0 = pl.program_id(1)
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, ksub), 1)
        dims = (((1,), (1,)), ((), ()))
        kk = m * ksub
        cc = (m + 1) // 2 if packed4 else m
        if ksub <= 16:
            # Narrow-subspace regime (4-bit PQ): per-part one-hots are
            # 16-lane slivers far below the native 128-lane register, and
            # concatenating m of them forces Mosaic relayouts that
            # measured SLOWER than the 16×-bigger ksub=256 one-hot (303
            # QPS at br=1024 on deep100m, cliffing at br≥2048). Build the
            # one-hot full-width instead: one tiny bf16 matmul against a
            # constant repeat matrix expands codes to
            # ``expanded[r, l] = byte[r, l // (ksub·per_byte)]`` (integers
            # ≤ 255 are exact in bf16), nibble extraction is full-width
            # f32 arithmetic, and a single lane-iota compare finishes —
            # no sub-register operands anywhere.
            l_iota = jax.lax.broadcasted_iota(jnp.int32, (1, kk), 1)
            part = l_iota // ksub
            sym = (l_iota % ksub).astype(jnp.float32)
            byte_of_lane = part // 2 if packed4 else part
            expand = (
                byte_of_lane
                == jax.lax.broadcasted_iota(jnp.int32, (cc, kk), 0)
            ).astype(jnp.bfloat16)
            # (Mosaic has no direct u8→bf16 cast; stage through i32/f32.
            # Byte values ≤ 255 are exact in bf16.)
            codes_bf = (
                codes_ref[:].astype(jnp.int32).astype(jnp.float32)
                .astype(jnp.bfloat16)
            )
            expanded = jax.lax.dot_general(
                codes_bf, expand,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BN, kk] — the code byte broadcast over its lanes
            if packed4:
                hi = jnp.floor(expanded * 0.0625)
                val = jnp.where(part % 2 == 1, hi, expanded - 16.0 * hi)
            else:
                val = expanded
            oh_parts = [(val == sym).astype(oh_dtype)]
        else:
            # Concatenate the m per-subspace one-hots along lanes and
            # contract in ONE K = m·ksub matmul — deep contractions keep
            # the MXU pipeline full where m separate K=ksub matmuls each
            # pay spin-up. Each part is a whole number of 128-lane
            # registers here, so the concatenation is free.
            codes = codes_ref[:].astype(jnp.int32)  # [BN, m]
            oh_parts = [
                (codes[:, j : j + 1] == iota_k).astype(oh_dtype)
                for j in range(m)
            ]
        if n_groups:
            # Gather-free IVF probing: the LUT carries n_groups extra
            # columns of per-(query, bucket) bias (q·centroid on probed
            # buckets, −BIG elsewhere), and each row's one-hot gains a 1 at
            # its bucket's column — the SAME deep-K matmul then yields
            # rdots + bias in one f32 accumulation. Costs n_groups/(m·ksub)
            # extra MACs; no per-element gathers anywhere (XLA TPU gathers
            # are scalar-slow). The row→bucket map comes either from a
            # fixed group width (group_rows: bucket-major padded layout) or
            # from an explicit per-row id input (group_ids: corpus stays in
            # ORIGINAL row order — no bucket-padding row overhead).
            # [BN, 1] and [1, G] operands keep the int32 intermediates
            # tiny; only the one-hot itself materializes at [BN, G].
            if gid_ref is not None:
                row_bucket = gid_ref[:].reshape(block_rows, 1)
            else:
                row_bucket = (
                    ni0 * block_rows
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (block_rows, 1), 0
                    )
                ) // group_rows
            g_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_groups), 1)
            oh_parts.append((row_bucket == g_iota).astype(oh_dtype))
        onehot = jnp.concatenate(oh_parts, axis=1)  # [BN, m·ksub (+ G)]
        if int8_lut:
            # Integer MXU path (2× the bf16 MAC rate on v5e): the LUT is
            # symmetric-quantized per query outside the kernel; the int32
            # accumulation is exact (|dot| ≤ m·127), and the per-query
            # scale is restored here before the metric epilogue.
            dots_i = jax.lax.dot_general(
                lut_ref[:], onehot, dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            )
            dots = dots_i.astype(jnp.float32) * sq_ref[:]
        else:
            dots = jax.lax.dot_general(
                lut_ref[:], onehot, dimension_numbers=dims,
                preferred_element_type=jnp.float32, precision=prec,
            )

        norms = norms_ref[:]  # (1, BN) f32 — ‖x̂‖² of reconstructions
        if metric == DistanceMetric.L2:
            scores = 2.0 * dots - norms
        elif metric == DistanceMetric.COSINE:
            # queries pre-normalized by the caller
            scores = dots * jax.lax.rsqrt(jnp.maximum(norms, 1e-30))
        else:
            scores = dots
        if n_groups:
            # Rows whose bucket is unprobed carry a −10³⁰-scale bias; clamp
            # them to EXACTLY −inf. Left at finite ~−2·10³⁰ values that
            # vary per row, they churn the candidate pool (≈half of them
            # sit above a −2·10³⁰ theta at any time), firing the collision
            # fallback on every block — measured 10× slower. −inf rows can
            # never enter the pool, so theta rises to real scores at once.
            scores = jnp.where(dots > jnp.float32(-1e28), scores, _NEG_INF)

        row0 = ni * block_rows
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)
        scores = jnp.where(rows < nvalid_ref[0, 0], scores, _NEG_INF)
        if valid_ref is not None:
            scores = jnp.where(valid_ref[:] != 0, scores, _NEG_INF)

        # Shared streaming pool merge (topk_kernel): per-block work scales
        # with actual improvements, not k — this replaced the deferred
        # "merge_every" selection batching, which only divided the k-round
        # frequency by a constant.
        _pool_merge_block(scores, best_s, best_i, row0, k, k_pad, block_rows,
                          top2=k > 32)

        @pl.when(ni == nblocks - 1)
        def _flush():
            _pool_flush(best_s, best_i, out_s_ref, out_i_ref, k, k_pad)

    return kernel


def fused_adc_topk(
    queries,
    codes,
    codebooks,
    recon_norms,
    num_valid,
    k: int,
    metric,
    valid_mask=None,
    exact_lut: bool = False,
    block_rows: int | None = None,
    query_tile: int = 256,
    interpret: bool = False,
    group_bias=None,
    group_rows: int = 0,
    group_ids=None,
    int8_lut: bool = False,
    packed4: bool = False,
    vmem_retry: bool = True,
):
    """VMEM-robust front end: retries with halved ``block_rows`` on Mosaic
    scoped-VMEM rejections (same policy as :func:`.topk_kernel.fused_topk`).
    ``vmem_retry=False`` re-raises the first OOM instead — autotune uses it
    so a failing candidate records an error rather than a silently-halved
    relabeled measurement."""
    bn = block_rows
    last_exc = None
    for _ in range(5 if vmem_retry else 1):
        try:
            return _fused_adc_topk(
                queries, codes, codebooks, recon_norms, num_valid, k, metric,
                valid_mask=valid_mask, exact_lut=exact_lut, block_rows=bn,
                query_tile=query_tile, interpret=interpret,
                group_bias=group_bias, group_rows=group_rows,
                group_ids=group_ids, int8_lut=int8_lut, packed4=packed4,
            )
        except Exception as exc:
            msg = str(exc)
            if "vmem" not in msg.lower():
                raise
            last_exc = exc
            if bn is None:
                m, ksub, _ = codebooks.shape
                qt = min(query_tile, _round_up(queries.shape[0], 8))
                bn = default_adc_block_rows(
                    m, ksub, qt, _round_up(k, LANES), exact_lut,
                    packed4=packed4,
                )
            new_bn = max(LANES, _round_up(bn // 2, LANES))
            _log.warning(
                "Mosaic VMEM OOM at block_rows=%d (ADC); retrying with %d",
                bn, new_bn,
            )
            bn = new_bn
    raise last_exc


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "exact_lut", "block_rows", "query_tile",
                     "interpret", "group_rows", "int8_lut", "packed4"),
)
def _fused_adc_topk(
    queries: jax.Array,
    codes: jax.Array,
    codebooks: jax.Array,
    recon_norms: jax.Array,
    num_valid,
    k: int,
    metric: DistanceMetric,
    valid_mask: jax.Array | None = None,
    exact_lut: bool = False,
    block_rows: int | None = None,
    query_tile: int = 256,
    interpret: bool = False,
    group_bias: jax.Array | None = None,
    group_rows: int = 0,
    group_ids: jax.Array | None = None,
    int8_lut: bool = False,
    packed4: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused ADC top-k over a PQ-coded corpus shard.

    Args:
      queries: ``[Q, D]`` f32 (pre-normalized for cosine).
      codes: ``[N, m]`` uint8/int32 PQ codes, HBM-resident — or, with
        ``packed4=True``, ``[N, ⌈m/2⌉]`` nibble-packed 4-bit codes
        (``ksub ≤ 16``; even subspaces in low nibbles, see
        :func:`metrovector_tpu.index.pq.pack_codes4`).
      codebooks: ``[m, ksub, dsub]`` f32 (``m·dsub == D``).
      recon_norms: ``[N]`` f32 squared norms of the reconstructions.
      num_valid: scalar int32 — rows ≥ this are padding.
      k / metric: as in :func:`.topk_kernel.fused_topk` (static).
      valid_mask: optional ``[N]``; 0 ⇒ tombstoned.
      exact_lut: f32-HIGHEST one-hot matmuls (ranking equals the f64 ADC
        oracle to f32 rounding) instead of single-pass bf16 (default,
        ~6× less MXU time; error ≪ PQ quantization error).
      int8_lut: symmetric per-query int8 LUT quantization on the INTEGER
        MXU (2× the bf16 MAC rate on v5e). Accumulation is exact int32;
        the only extra error is the ±0.5-step LUT rounding (relative to
        the per-query max |entry| — comparable to bf16's mantissa at
        typical LUT dynamic ranges; gate with a measured recall check and
        keep a re-rank stage). Mutually exclusive with exact_lut and with
        the group_bias probing path (−10³⁰ bias is not representable).
      group_bias / group_rows / group_ids: gather-free IVF probing.
        ``group_bias [Q, G]`` f32 adds a per-(query, bucket) dot term —
        ``q·centroid`` for probed buckets (residual ADC: q·x̂ = q·c + q·r̂)
        and a large negative constant for unprobed ones (clamped to −inf
        in-kernel). The row→bucket map is either implicit — ``group_rows``:
        bucket-major layout, bucket = row // group_rows — or explicit —
        ``group_ids [N]`` int32 per-row bucket ids, letting the corpus
        stay in ORIGINAL row order with no bucket-padding overhead.
        Probing then costs extra matmul columns instead of the
        scalar-slow per-query gathers of classic IVF traversal.

    Returns ``(scores [Q, k] f32, indices [Q, k] int32)`` best-first.
    """
    q, d = queries.shape
    m, ksub, dsub = codebooks.shape
    n, code_cols = codes.shape
    if packed4:
        if ksub > 16:
            raise ValueError(f"packed4 requires ksub <= 16, got {ksub}")
        if code_cols != (m + 1) // 2:
            raise ValueError(
                f"packed4 codes must be [N, ceil(m/2)]: m={m}, "
                f"got {code_cols} columns"
            )
    elif code_cols != m:
        raise ValueError(f"codes [N, {code_cols}] vs codebooks m={m}")
    assert m * dsub == d, (codebooks.shape, codes.shape, d)
    if int8_lut and (exact_lut or group_bias is not None):
        raise ValueError(
            "int8_lut is mutually exclusive with exact_lut and group_bias"
        )
    metric = DistanceMetric(metric)
    qt = min(query_tile, _round_up(q, 8))
    k_pad = _round_up(k, LANES)
    n_groups_pad = 0
    if group_rows and group_ids is not None:
        raise ValueError("group_rows and group_ids are mutually exclusive")
    if group_rows:
        if group_rows % LANES:
            raise ValueError(
                f"group_rows must be a multiple of {LANES}, got {group_rows}"
            )
        if n % group_rows:
            raise ValueError(
                f"corpus rows {n} not a multiple of group_rows {group_rows}"
            )
    if group_rows or group_ids is not None:
        n_groups_pad = _round_up(int(group_bias.shape[1]), LANES)
    if block_rows is None:
        block_rows = default_adc_block_rows(
            m, ksub, qt, k_pad, exact_lut, extra_cols=n_groups_pad,
            packed4=packed4,
        )
    block_rows = max(LANES, _round_up(block_rows, LANES))

    # Per-query LUT [Q, m·ksub] — a tiny einsum (Q·ksub·D MACs), f32 for
    # exactness then cast to the kernel's matmul dtype.
    lut = jnp.einsum(
        "qmd,mkd->qmk",
        queries.astype(jnp.float32).reshape(q, m, dsub),
        codebooks,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).reshape(q, m * ksub)
    n_groups = 0
    if n_groups_pad:
        # Bias columns ride the LUT (see kernel comment); the kernel pairs
        # them with per-row bucket one-hot columns in the same matmul.
        # Padded to a 128-lane multiple; padding columns carry −BIG bias
        # and match no row's bucket.
        g_real = int(group_bias.shape[1])
        n_groups = n_groups_pad
        gb = group_bias.astype(jnp.float32)
        if n_groups != g_real:
            gb = jnp.pad(
                gb, ((0, 0), (0, n_groups - g_real)),
                constant_values=-1e30,
            )
        lut = jnp.concatenate([lut, gb], axis=1)
    sq = None
    if int8_lut:
        # symmetric per-query quantization; scale restored in-kernel
        s_q = jnp.maximum(jnp.max(jnp.abs(lut), axis=1, keepdims=True), 1e-30)
        sq = (s_q / 127.0).astype(jnp.float32)
        lut = jnp.clip(jnp.round(lut / sq), -127, 127).astype(jnp.int8)
    else:
        lut = lut.astype(jnp.float32 if exact_lut else jnp.bfloat16)

    q_pad = _round_up(q, qt)
    if q_pad != q:
        lut = jnp.pad(lut, ((0, q_pad - q), (0, 0)))
        if sq is not None:
            sq = jnp.pad(sq, ((0, q_pad - q), (0, 0)), constant_values=1.0)

    codes_u8 = codes.astype(jnp.uint8)
    nvalid_arr = jnp.asarray(num_valid, dtype=jnp.int32).reshape(1, 1)
    norms_2d = recon_norms.reshape(1, n).astype(jnp.float32)

    grid = (q_pad // qt, pl.cdiv(n, block_rows))
    smem_spec = pl.BlockSpec((1, 1), lambda qi, ni: (0, 0),
                             memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((1, block_rows), lambda qi, ni: (0, ni),
                            memory_space=pltpu.VMEM)
    in_specs = [
        smem_spec,
        pl.BlockSpec((qt, m * ksub + n_groups), lambda qi, ni: (qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, code_cols), lambda qi, ni: (ni, 0),
                     memory_space=pltpu.VMEM),
        row_spec,
    ]
    args = [nvalid_arr, lut, codes_u8, norms_2d]
    if sq is not None:
        in_specs.append(
            pl.BlockSpec((qt, 1), lambda qi, ni: (qi, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(sq)
    if group_ids is not None:
        # [N, 1] sublane-major so each block reads [BN, 1] directly (a
        # [1, BN] lane-major block would need an in-kernel transpose).
        in_specs.append(
            pl.BlockSpec((block_rows, 1), lambda qi, ni: (ni, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(group_ids.reshape(n, 1).astype(jnp.int32))
    if valid_mask is not None:
        in_specs.append(row_spec)
        args.append(valid_mask.reshape(1, n).astype(jnp.float32))

    kernel = _make_adc_kernel(
        k, k_pad, block_rows, m, ksub, metric,
        has_valid=valid_mask is not None, exact_lut=exact_lut,
        group_rows=group_rows, n_groups=n_groups,
        has_group_ids=group_ids is not None, int8_lut=int8_lut,
        packed4=packed4,
    )
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
            flops=2 * q_pad * n * m * ksub,
            bytes_accessed=n * code_cols
            + q_pad * m * ksub * lut.dtype.itemsize + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    out_i = jnp.where(jnp.isneginf(out_s), -1, out_i)
    return out_s[:q, :k], out_i[:q, :k]
