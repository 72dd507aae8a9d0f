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
* Per step, the block is **lane-folded** before selection: a ~2-pass sweep
  compresses ``[QT, BN]`` scores to per-lane maxima ``[QT, 128]`` (with
  fold argmax giving global row ids), and the k-round (max,
  min-index-among-ties, mask) selection then runs over just ``128 + K_PAD``
  candidate columns. A per-lane improvement count (entries ≥ the current
  per-query k-th best) detects the rare case where the fold would drop a
  qualifying row — two improvements colliding in one lane — and reruns
  that block's merge at full width, keeping results exact. A whole-tile
  threshold test (``block max ≤ current worst candidate``) skips merging
  entirely for blocks that cannot contribute.
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
from ..utils.log import get_logger

_NEG_INF = float("-inf")
_log = get_logger("ops.topk")

# Latched True the first time the split-plane ('high' precision) kernel
# fails Mosaic compilation on this toolchain, so later calls skip the
# re-attempt (lowering failures are not jit-cached; remote compiles cost
# 30s+ each). Engines should consult split_planes_broken() and drop their
# lo planes permanently (see engine.DeviceSpace._latch_split_fallback).
_SPLIT_PLANES_BROKEN = False


def split_planes_broken() -> bool:
    """True once the split-plane kernel has failed to compile in this
    process; the 'high' path will serve via f32 reconstruction instead."""
    return _SPLIT_PLANES_BROKEN


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def default_block_rows(padded_dim: int, itemsize: int, query_tile: int = 128,
                       bf16x3: bool = False, k_pad: int = 128,
                       pool_merge: bool = True) -> int:
    """DB rows per grid step, sized to fill the VMEM budget: double-buffered
    DB blocks (``2·BN·D·esz``) plus the f32 score tile (``qt·BN·4``) within
    ~9 MB of the ~16 MB core VMEM (rest: queries, candidates, fold arrays,
    pipeline slack). Bigger blocks amortize per-step grid overhead — the
    dominant fixed cost for small query batches. The bf16x3 path allocates
    hi/lo split temporaries (~3·BN·D·esz/2 extra) per block; large ``k``
    charges the candidate/scratch lists (``~24·qt·k_pad`` bytes)."""
    budget = 9 * 1024 * 1024 - 24 * query_tile * max(k_pad - 128, 0)
    # 12·qt per DB row for the pool merge: the f32 score tile (4·qt) plus
    # the collision-path insert loop's full-width (scores, ids) carries
    # (8·qt, persistent across the loop). The rounds merge's concat
    # intermediates are transient and fit the 4·qt model (measured: int8
    # block_rows=8192 runs clean under rounds, spills under pool).
    per_qt = 12 if pool_merge else 4
    denom = 2 * padded_dim * itemsize + per_qt * query_tile + 32
    if bf16x3:
        denom += 3 * padded_dim * itemsize // 2
    bn = budget // max(denom, 1)
    bn = max(256, min(8192, bn))
    return (bn // 256) * 256


_UNROLL_K_MAX = 32


def _select_k_into(cand_s, cand_i, best_s_ref, best_i_ref, rows, k: int):
    """k rounds of (max, min-index-among-ties, mask) over the candidate
    tile, writing the sorted-descending winners into ``ref[rows]``.
    ``cand_s`` is f32 ``[G, C]``. Tie-break is *lowest global row index*,
    matching a stable argsort oracle independent of candidate column order
    (candidate ids are distinct except the initial −1 sentinels, which tie
    only at −inf and resolve to −1 — the desired missing-slot marker).

    Small ``k`` unrolls (static column writes); large ``k`` uses a rolled
    ``fori_loop`` with one-hot column writes so the emitted code stays
    O(1) in ``k`` — a fully unrolled k=100 selection is tens of thousands
    of MLIR ops and takes the Mosaic compiler minutes."""
    big = jnp.int32(2**31 - 1)
    if k <= _UNROLL_K_MAX:
        for j in range(k):
            m = jnp.max(cand_s, axis=1)
            eq = cand_s == m[:, None]
            idx_sel = jnp.min(jnp.where(eq, cand_i, big), axis=1)
            onehot = jnp.logical_and(eq, cand_i == idx_sel[:, None])
            best_s_ref[rows, j : j + 1] = m[:, None]
            best_i_ref[rows, j : j + 1] = idx_sel[:, None]
            cand_s = jnp.where(onehot, _NEG_INF, cand_s)
        return

    g = cand_s.shape[0]
    k_pad = best_s_ref.shape[-1]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (g, k_pad), 1)

    def body(j, cs):
        m = jnp.max(cs, axis=1)
        eq = cs == m[:, None]
        idx_sel = jnp.min(jnp.where(eq, cand_i, big), axis=1)
        onehot = jnp.logical_and(eq, cand_i == idx_sel[:, None])
        sel_col = col_iota == j
        best_s_ref[rows] = jnp.where(sel_col, m[:, None], best_s_ref[rows])
        best_i_ref[rows] = jnp.where(
            sel_col, idx_sel[:, None], best_i_ref[rows]
        )
        return jnp.where(onehot, _NEG_INF, cs)

    jax.lax.fori_loop(0, k, body, cand_s)



def _make_pool_inserter(best_s, best_i, pool_valid, col_iota_k):
    """Vectorized replace-min insert over the UNSORTED candidate pool
    refs — shared by the pool and chunked merge strategies. Each round
    moves every query's best remaining incoming candidate into its pool
    slot holding the worst retained entry, if it beats it. ``n_rounds``
    bounds the trip count (theta only rises, so the pre-insert beat count
    is an upper bound on inserts); the loop also exits as soon as a round
    inserts nothing — candidates are consumed in descending key order per
    query, so once every query's best remaining fails to beat, the rest
    never can. Without the early exit, a loose bound (e.g. while the pool
    still has −inf holes and few candidates qualify) burns the full k
    rounds as no-ops — measured 5× end-to-end on the sparse-candidate
    masked-scan workload."""
    big = jnp.int32(2**31 - 1)

    def insert_candidates(inc_s, inc_i, n_rounds):
        def cond(state):
            j, go, _, _ = state
            return jnp.logical_and(j < n_rounds, go)

        def body(state):
            j, _, cs, ci = state
            m = jnp.max(cs, axis=1)
            eqc = cs == m[:, None]
            sel_i = jnp.min(jnp.where(eqc, ci, big), axis=1)
            ps = jnp.where(pool_valid, best_s[:], jnp.float32(jnp.inf))
            wmin = jnp.min(ps, axis=1)
            eqp = ps == wmin[:, None]
            # worst key among the minima = the one with LARGEST id
            evict_i = jnp.max(
                jnp.where(eqp, best_i[:], jnp.int32(-(2**31))), axis=1
            )
            evict_cols = jnp.logical_and(eqp, best_i[:] == evict_i[:, None])
            evict_col = jnp.min(
                jnp.where(evict_cols, col_iota_k, big), axis=1
            )
            beats = jnp.logical_or(
                m > wmin,
                jnp.logical_and(m == wmin, sel_i < evict_i),
            )
            do_write = jnp.logical_and(
                beats[:, None], col_iota_k == evict_col[:, None]
            )
            best_s[:] = jnp.where(do_write, m[:, None], best_s[:])
            best_i[:] = jnp.where(do_write, sel_i[:, None], best_i[:])
            # Consume the candidate whether or not it beat: if the block's
            # best remaining didn't, none of the rest will.
            consumed = jnp.logical_and(eqc, ci == sel_i[:, None])
            cs = jnp.where(consumed, _NEG_INF, cs)
            ci = jnp.where(consumed, big, ci)
            return j + 1, jnp.any(beats), cs, ci

        jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(True), inc_s, inc_i)
        )

    return insert_candidates


def _pool_merge_block(scores, best_s, best_i, row0, k: int, k_pad: int,
                      block_rows: int):
    """Streaming top-k pool merge for one score block — shared by the
    distance kernel and the ADC kernel.

    The candidate pool (``best_s`` / ``best_i`` scratch refs, ``[qt,
    k_pad]``, first ``k`` columns live) is UNSORTED: per-block selection
    work is proportional to how many rows actually improve the running
    top-k (a heap's replace-min, vectorized over the query tile, O(k·ln N)
    inserts over the whole scan) instead of k full selection rounds per
    merged block. Sorted output is produced once, by :func:`_pool_flush`.

    Exactness: a conservative whole-tile skip (equal scores are skippable —
    the scan visits rows in ascending id order, so a later tie always loses
    the lowest-index tie-break), then a 128-lane fold whose per-lane
    improvement count detects the rare same-lane double-improvement and
    reruns that block's inserts at full width. Key order everywhere is
    (score desc, index asc), matching the stable-argsort oracle.
    """
    lanes = LANES
    n_chunks = block_rows // lanes
    qt = scores.shape[0]
    col_iota_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k_pad), 1)
    pool_valid = col_iota_k < k  # pool occupies the first k columns

    # theta_q = the pool's current minimum = the k-th best score so far.
    theta = jnp.min(
        jnp.where(pool_valid, best_s[:], jnp.float32(jnp.inf)), axis=1
    )

    insert_candidates = _make_pool_inserter(
        best_s, best_i, pool_valid, col_iota_k
    )

    # Conservative whole-tile skip: nothing in this block can beat the
    # worst retained candidate of any query in the tile.
    worst = jnp.min(theta)
    blockmax = jnp.max(scores)

    @pl.when(blockmax > worst)
    def _merge():
        # Lane fold: compress the block to its per-lane maxima — 128
        # candidates per query in ~2 passes. Exact unless one query has two
        # pool-beating rows in the same lane of the same block, which the
        # per-lane improvement count detects; that rare case inserts from
        # the full-width block instead.
        th_col = theta[:, None]
        fm = scores[:, 0:lanes]
        am = jnp.zeros((qt, lanes), jnp.int32)
        imp = (fm >= th_col).astype(jnp.int32)
        for c in range(1, n_chunks):
            sc = scores[:, c * lanes : (c + 1) * lanes]
            gt = sc > fm
            fm = jnp.where(gt, sc, fm)
            am = jnp.where(gt, c, am)
            imp += (sc >= th_col).astype(jnp.int32)
        collision = jnp.max(imp) >= 2
        # Upper bound on insert rounds this block: the largest per-query
        # count of candidates ≥ its current k-th best (ties included),
        # capped at k — a block can insert at most k rows (each insert
        # evicts), and candidates are consumed in descending key order so
        # all inserts precede all no-ops. The cap matters while the pool
        # still has −inf holes (theta=−inf makes the raw count the whole
        # block).
        n_rounds = jnp.minimum(jnp.max(jnp.sum(imp, axis=1)), jnp.int32(k))

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (qt, lanes), 1)
        fold_idx = row0 + am * lanes + lane_iota

        @pl.when(jnp.logical_not(collision))
        def _fast():
            insert_candidates(fm, fold_idx, n_rounds)

        @pl.when(collision)
        def _slow():
            gidx = row0 + jax.lax.broadcasted_iota(
                jnp.int32, (qt, block_rows), 1
            )
            insert_candidates(scores, gidx, n_rounds)


def _pool_flush(best_s, best_i, out_s_ref, out_i_ref, k: int, k_pad: int):
    """One k-round sort of the (tiny) pool per query tile — the only place
    selection still costs O(k) passes."""
    qt = best_s.shape[0]
    col_iota_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k_pad), 1)
    pool_valid = col_iota_k < k
    out_s_ref[:] = jnp.full_like(out_s_ref, _NEG_INF)
    out_i_ref[:] = jnp.full_like(out_i_ref, -1)
    cand_s = jnp.where(pool_valid, best_s[:], _NEG_INF)
    cand_i = jnp.where(pool_valid, best_i[:], -1)
    _select_k_into(cand_s, cand_i, out_s_ref, out_i_ref, slice(None), k)



def _rounds_merge_block(scores, best_s, best_i, row0, k: int, k_pad: int,
                        block_rows: int):
    """k-round unrolled merge keeping the candidate list SORTED descending
    (the round-1 strategy). Per merged block it always pays k selection
    rounds over [qt, 128 + k_pad] — more selection work than the pool
    merge, but straight-line unrolled code with no serialized loop-carried
    bookkeeping, which wins on cheap-matmul paths (single-pass int8 MXU at
    small k) where the pool loop's serialization is visible. Exactness
    discipline (skip test, lane fold, collision fallback) is identical."""
    lanes = LANES
    n_chunks = block_rows // lanes
    qt = scores.shape[0]
    full = slice(None)

    worst = jnp.min(best_s[:, :k])
    blockmax = jnp.max(scores)

    @pl.when(blockmax > worst)
    def _merge():
        theta = best_s[:, k - 1 : k]  # current kth best per query (sorted)
        fm = scores[:, 0:lanes]
        am = jnp.zeros((qt, lanes), jnp.int32)
        imp = (fm >= theta).astype(jnp.int32)
        for c in range(1, n_chunks):
            sc = scores[:, c * lanes : (c + 1) * lanes]
            gt = sc > fm
            fm = jnp.where(gt, sc, fm)
            am = jnp.where(gt, c, am)
            imp += (sc >= theta).astype(jnp.int32)
        collision = jnp.max(imp) >= 2

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (qt, lanes), 1)
        fold_idx = row0 + am * lanes + lane_iota

        @pl.when(jnp.logical_not(collision))
        def _fast():
            cand_s = jnp.concatenate([best_s[:], fm], axis=1)
            cand_i = jnp.concatenate([best_i[:], fold_idx], axis=1)
            _select_k_into(cand_s, cand_i, best_s, best_i, full, k)

        @pl.when(collision)
        def _slow():
            gidx = row0 + jax.lax.broadcasted_iota(
                jnp.int32, (qt, block_rows), 1
            )
            cand_s = jnp.concatenate([best_s[:], scores], axis=1)
            cand_i = jnp.concatenate([best_i[:], gidx], axis=1)
            _select_k_into(cand_s, cand_i, best_s, best_i, full, k)


_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    # Mosaic only lowers DEFAULT and HIGHEST; 'high' maps to a manual
    # bf16x3 split (see kernel body) giving ~f32-faithful dots at half the
    # MXU passes of HIGHEST.
    "high": jax.lax.Precision.DEFAULT,
    "default": jax.lax.Precision.DEFAULT,
}


def _make_kernel(k: int, k_pad: int, block_rows: int, metric: DistanceMetric,
                 scale: float, has_valid: bool, int_path: bool,
                 precision: str, has_bias: bool = False,
                 split_planes: bool = False, merge: str = "pool"):
    metric = DistanceMetric(metric)
    prec = _PRECISIONS[precision]
    bf16x3 = precision == "high" and not int_path and not split_planes
    lanes = 128
    n_chunks = block_rows // lanes

    def kernel(nvalid_ref, *rest):
        # Optional inputs appear in declaration order: bias_scale (SMEM),
        # queries, db, [db_lo], norms, bias_row, valid_mask, then outputs
        # + scratch.
        rest = list(rest)
        bias_scale_ref = rest.pop(0) if has_bias else None
        q_ref, db_ref = rest[:2]
        rest = rest[2:]
        q_lo_ref = rest.pop(0) if split_planes else None
        db_lo_ref = rest.pop(0) if split_planes else None
        norms_ref = rest.pop(0)
        bias_ref = rest.pop(0) if has_bias else None
        valid_ref = rest.pop(0) if has_valid else None
        out_s_ref, out_i_ref, best_s, best_i = rest

        ni = pl.program_id(1)
        nblocks = pl.num_programs(1)

        @pl.when(ni == 0)
        def _init():
            best_s[:] = jnp.full_like(best_s, _NEG_INF)
            best_i[:] = jnp.full_like(best_i, -1)

        dims = (((1,), (1,)), ((), ()))
        if int_path:
            dots = jax.lax.dot_general(
                q_ref[:], db_ref[:], dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        elif split_planes:
            # Precomputed hi/lo bf16 planes (f32 = hi + lo to ~16
            # significand bits; same total HBM bytes as f32). The queries
            # split OUTSIDE the kernel (tiny tensors; in-kernel f32→bf16
            # casts of matmul operands fail Mosaic layout at wide dims —
            # "Bad lhs type" at D=1024) — three single-pass bf16 MXU dots,
            # no per-block VPU casting of the corpus.
            q_hi = q_ref[:]
            q_lo = q_lo_ref[:]
            dots = jax.lax.dot_general(
                q_hi, db_ref[:], dimension_numbers=dims,
                preferred_element_type=jnp.float32, precision=prec,
            )
            dots += jax.lax.dot_general(
                q_hi, db_lo_ref[:], dimension_numbers=dims,
                preferred_element_type=jnp.float32, precision=prec,
            )
            dots += jax.lax.dot_general(
                q_lo, db_ref[:], dimension_numbers=dims,
                preferred_element_type=jnp.float32, precision=prec,
            )
        elif bf16x3:
            # Manual bf16x3 split: q = q_hi + q_lo exactly captures ~16
            # significand bits; q·x ≈ q_hi·x_hi + q_hi·x_lo + q_lo·x_hi
            # (the dropped q_lo·x_lo term is ≤ 2^-16 relative). Three
            # single-pass bf16 MXU dots ≈ 2x faster than HIGHEST's six.
            q32 = q_ref[:]
            x32 = db_ref[:]
            q_hi = q32.astype(jnp.bfloat16)
            x_hi = x32.astype(jnp.bfloat16)
            q_lo = (q32 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            x_lo = (x32 - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dots = jax.lax.dot_general(
                q_hi, x_hi, dimension_numbers=dims,
                preferred_element_type=jnp.float32, precision=prec,
            )
            dots += jax.lax.dot_general(
                q_hi, x_lo, dimension_numbers=dims,
                preferred_element_type=jnp.float32, precision=prec,
            )
            dots += jax.lax.dot_general(
                q_lo, x_hi, dimension_numbers=dims,
                preferred_element_type=jnp.float32, precision=prec,
            )
        else:
            # Default HIGHEST: f32 inputs must not round through bf16 on
            # the MXU or near-tie rankings diverge from the f32 oracle
            # (exactness contract; see ops.distances docstring).
            dots = jax.lax.dot_general(
                q_ref[:], db_ref[:], dimension_numbers=dims,
                preferred_element_type=jnp.float32, precision=prec,
            )
        if scale != 1.0:
            dots = dots * jnp.float32(scale)
        if bias_ref is not None:
            # Affine-offset correction: effective_dot = scale·idot +
            # bias_scale·bias_row, where bias_row is the per-row code sum
            # (see DeviceSpace uint8 offset path). Per-query constants are
            # rank-neutral and restored by the engine after selection.
            dots = dots + bias_scale_ref[0, 0] * bias_ref[:]

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

        if merge == "pool":
            _pool_merge_block(
                scores, best_s, best_i, row0, k, k_pad, block_rows
            )
        else:
            _rounds_merge_block(
                scores, best_s, best_i, row0, k, k_pad, block_rows
            )

        @pl.when(ni == nblocks - 1)
        def _flush():
            if merge == "pool":
                _pool_flush(best_s, best_i, out_s_ref, out_i_ref, k, k_pad)
            else:  # rounds merge keeps the list sorted: plain copy-out
                out_s_ref[:] = best_s[:]
                out_i_ref[:] = best_i[:]

    return kernel


def fused_topk(
    queries,
    db,
    db_norms,
    num_valid,
    k: int,
    metric,
    valid_mask=None,
    scale: float = 1.0,
    block_rows: int | None = None,
    query_tile: int = 128,
    interpret: bool = False,
    precision: str = "highest",
    bias_row=None,
    bias_scale=1.0,
    db_lo=None,
    merge: str | None = None,
):
    """VMEM-robust front end for :func:`_fused_topk`: if Mosaic's scoped
    VMEM allocator rejects the auto-sized block (its live-set model is not
    exactly predictable, e.g. large-``k`` selection), retry with
    successively smaller ``block_rows``. The shrink only triggers on the
    first compile of a shape; steady-state calls hit the jit cache."""
    global _SPLIT_PLANES_BROKEN

    def _reconstructed_highest():
        # Split-plane compilation is toolchain-sensitive (a Mosaic "Bad
        # lhs type" regression appeared mid-cycle on v5e for the two-plane
        # operand layout). Reconstruct f32 = hi + lo on device and serve
        # at HIGHEST — exact, just without the bf16x3 speedup. Callers
        # holding the planes (engine.DeviceSpace) should check
        # :func:`split_planes_broken` and latch the reconstruction so this
        # per-call rebuild happens at most once per corpus.
        db32 = db.astype(jnp.float32) + db_lo.astype(jnp.float32)
        return _fused_topk(
            queries, db32, db_norms, num_valid, k, metric,
            valid_mask=valid_mask, scale=scale, block_rows=None,
            query_tile=query_tile, interpret=interpret,
            precision="highest", bias_row=bias_row,
            bias_scale=bias_scale, db_lo=None,
        )

    if db_lo is not None and _SPLIT_PLANES_BROKEN:
        # Latched: skip the (30s+ remote-compile) re-attempt entirely.
        return _reconstructed_highest()

    bn = block_rows
    last_exc = None
    for _ in range(5):
        try:
            return _fused_topk(
                queries, db, db_norms, num_valid, k, metric,
                valid_mask=valid_mask, scale=scale, block_rows=bn,
                query_tile=query_tile, interpret=interpret,
                precision=precision, bias_row=bias_row,
                bias_scale=bias_scale, db_lo=db_lo, merge=merge,
            )
        except Exception as exc:  # jaxlib runtime error types vary
            msg = str(exc)
            if "vmem" not in msg.lower() and "VMEM" not in msg:
                if db_lo is not None and (
                    "Mosaic" in msg or "mosaic" in msg
                ):
                    _log.warning(
                        "split-plane kernel failed to compile (%s); "
                        "falling back to f32 HIGHEST", msg.splitlines()[0]
                    )
                    _SPLIT_PLANES_BROKEN = True
                    return _reconstructed_highest()
                raise
            last_exc = exc
            if bn is None:
                q = queries.shape[0]
                qt = min(query_tile, _round_up(q, 8))
                bn = default_block_rows(
                    db.shape[1], db.dtype.itemsize, qt,
                    bf16x3=precision == "high" and db.dtype.itemsize == 4,
                    k_pad=_round_up(k, LANES),
                )
            new_bn = max(LANES, _round_up(bn // 2, LANES))
            _log.warning(
                "Mosaic VMEM OOM at block_rows=%d (k=%d); retrying with %d",
                bn, k, new_bn,
            )
            bn = new_bn
    raise last_exc


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "scale", "block_rows", "query_tile", "interpret",
        "precision", "merge",
    ),
)
def _fused_topk(
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
    precision: str = "highest",
    bias_row: jax.Array | None = None,
    bias_scale: jax.Array | float = 1.0,
    db_lo: jax.Array | None = None,
    merge: str | None = None,
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
        CAUTION (measured on v5e): oversized tiles can exceed VMEM
        *silently* — Mosaic spills to HBM at a ~1000× slowdown instead of
        erroring (e.g. block_rows=8192 at D=128, or query_tile=256 with
        auto block_rows). The defaults sit safely below the cliff; when
        overriding, keep ``query_tile·block_rows·4 + 2·block_rows·D·esz``
        well under ~10 MB.
      interpret: run in the Pallas interpreter (CPU testing).
      precision: f32 MXU passes — 'highest' (bf16x6, bit-faithful f32,
        the exactness default), 'high' (bf16x3, f32-faithful for
        low-significand data like integer-valued corpora, ~2x faster),
        'default' (single bf16 pass, fastest, visibly reorders near-ties).
      merge: on-chip selection strategy — 'pool' (streaming replace-min:
        per-block work scales with actual top-k improvements; wins
        wherever the matmul dominates, and at large k) or 'rounds'
        (k unrolled selection rounds per merged block, straight-line
        code with no serialized loop; wins on the single-pass int8 MXU
        path at small k, where the pool loop's serialization is visible
        next to a very cheap matmul). Default None = auto: 'rounds' for
        int8/uint8 at k ≤ 32, else 'pool'. Both are exact.
      bias_row: optional ``[N]`` f32 per-row additive dot correction
        (affine-offset uint8 path: the per-row code sum); applied as
        ``dots += bias_scale · bias_row`` before the metric epilogue.
      bias_scale: dynamic scalar multiplier for ``bias_row`` (traced, so
        per-query-batch offsets don't fragment the jit cache).

    Returns:
      ``(scores [Q, k] f32, indices [Q, k] int32)`` sorted best-first with
      the greater-is-better score convention of :mod:`.distances`.
    """
    if db.dtype == jnp.float16.dtype:
        # Mosaic has no f16 vector type, and device-side f16→f32 casts are
        # pathologically slow on TPU (measured ~3 MB/s — likely an
        # emulated elementwise path). Callers must pre-cast on the host
        # (exact: f16 ⊂ f32); DeviceSpace and StreamingSearcher do.
        raise TypeError(
            "fused_topk does not accept float16 operands on TPU; cast the "
            "block to float32 (or store bfloat16) before the kernel"
        )
    q, d = queries.shape
    n = db.shape[0]
    qt = min(query_tile, _round_up(q, 8))
    k_pad = _round_up(k, LANES)
    split_planes = db_lo is not None
    int_path_early = db.dtype in (jnp.int8.dtype, jnp.uint8.dtype)
    if merge is None:
        merge = "rounds" if int_path_early and k <= _UNROLL_K_MAX else "pool"
    if block_rows is None:
        # split planes stream two bf16 blocks = f32-equivalent bytes
        eff_itemsize = 4 if split_planes else db.dtype.itemsize
        block_rows = default_block_rows(
            d, eff_itemsize, qt,
            bf16x3=precision == "high" and db.dtype.itemsize == 4
            and not split_planes,
            k_pad=k_pad, pool_merge=merge == "pool",
        )
    # The lane-fold merge requires whole 128-lane chunks per block.
    block_rows = max(LANES, _round_up(block_rows, LANES))

    q_pad = _round_up(q, qt)
    if q_pad != q:
        queries = jnp.pad(queries, ((0, q_pad - q), (0, 0)))
    queries_lo = None
    if split_planes:
        # Host/XLA-side query split (see kernel comment): hi plane rides
        # the regular query slot, lo plane is an extra input.
        q_hi = queries.astype(jnp.bfloat16)
        queries_lo = (queries - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        queries = q_hi

    metric = DistanceMetric(metric)
    int_path = int_path_early
    nvalid_arr = jnp.asarray(num_valid, dtype=jnp.int32).reshape(1, 1)
    norms_2d = db_norms.reshape(1, n).astype(jnp.float32)

    grid = (q_pad // qt, pl.cdiv(n, block_rows))

    smem_spec = pl.BlockSpec((1, 1), lambda qi, ni: (0, 0),
                             memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec((1, block_rows), lambda qi, ni: (0, ni),
                            memory_space=pltpu.VMEM)
    in_specs = [smem_spec]
    args = [nvalid_arr]
    if bias_row is not None:
        in_specs.append(smem_spec)
        args.append(jnp.asarray(bias_scale, jnp.float32).reshape(1, 1))
    db_spec = pl.BlockSpec((block_rows, d), lambda qi, ni: (ni, 0),
                           memory_space=pltpu.VMEM)
    in_specs += [
        pl.BlockSpec((qt, d), lambda qi, ni: (qi, 0), memory_space=pltpu.VMEM),
        db_spec,
    ]
    args += [queries, db]
    if split_planes:
        # lo query plane first (matches kernel arg order), then lo db plane
        in_specs.append(
            pl.BlockSpec((qt, d), lambda qi, ni: (qi, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(queries_lo)
        in_specs.append(db_spec)
        args.append(db_lo)
    in_specs.append(row_spec)
    args.append(norms_2d)
    if bias_row is not None:
        in_specs.append(row_spec)
        args.append(bias_row.reshape(1, n).astype(jnp.float32))
    if valid_mask is not None:
        in_specs.append(row_spec)
        args.append(valid_mask.reshape(1, n).astype(jnp.float32))

    kernel = _make_kernel(
        k, k_pad, block_rows, metric, float(scale),
        has_valid=valid_mask is not None, int_path=int_path,
        precision=precision, has_bias=bias_row is not None,
        split_planes=split_planes, merge=merge,
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
    # −inf slots are unfilled (k exceeded valid rows after tombstones):
    # normalize their index to the −1 sentinel.
    out_i = jnp.where(jnp.isneginf(out_s), -1, out_i)
    return out_s[:q, :k], out_i[:q, :k]
