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

# Performance-attribution knob (tests/benchmarks only): skips the
# full-width collision fallback, making results INEXACT when two
# pool-beating rows share a lane. Never set in production paths.
_DEBUG_NO_COLLISION = False


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


_NEG_I32 = -(2**31)
_POS_I32 = 2**31 - 1


def _sentinels(int_dom: bool):
    """(worst, best) sentinel values for the score domain: the int32
    domain keeps raw integer dots (exact ranking, no per-element
    astype/scale passes — the deep10m lever); the f32 domain is the
    default. Real int dots are magnitude-bounded (D·127² ≪ 2³¹) so the
    sentinels are unreachable by data."""
    if int_dom:
        return jnp.int32(_NEG_I32), jnp.int32(_POS_I32)
    return jnp.float32(_NEG_INF), jnp.float32(jnp.inf)



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
    neg = _sentinels(jnp.issubdtype(cand_s.dtype, jnp.integer))[0]
    if k <= _UNROLL_K_MAX:
        for j in range(k):
            m = jnp.max(cand_s, axis=1)
            eq = cand_s == m[:, None]
            idx_sel = jnp.min(jnp.where(eq, cand_i, big), axis=1)
            onehot = jnp.logical_and(eq, cand_i == idx_sel[:, None])
            best_s_ref[rows, j : j + 1] = m[:, None]
            best_i_ref[rows, j : j + 1] = idx_sel[:, None]
            cand_s = jnp.where(onehot, neg, cand_s)
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
        return jnp.where(onehot, neg, cs)

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
    neg, pos = jnp.float32(_NEG_INF), jnp.float32(jnp.inf)

    def insert_candidates(inc_s, inc_i, n_rounds):
        def cond(state):
            j, go, _, _ = state
            return jnp.logical_and(j < n_rounds, go)

        def body(state):
            j, _, cs, ci = state
            m = jnp.max(cs, axis=1)
            eqc = cs == m[:, None]
            sel_i = jnp.min(jnp.where(eqc, ci, big), axis=1)
            ps = jnp.where(pool_valid, best_s[:], pos)
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
            cs = jnp.where(consumed, neg, cs)
            ci = jnp.where(consumed, big, ci)
            return j + 1, jnp.any(beats), cs, ci

        jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(True), inc_s, inc_i)
        )

    return insert_candidates


def _pool_merge_block(scores, best_s, best_i, row0, k: int, k_pad: int,
                      block_rows: int, skip_test: bool = True,
                      top2: bool = False, imp_first: bool = False):
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

    ``skip_test=False`` folds unconditionally and gates only the inserts
    on the fold maxima — for regimes (large query tiles over many-block
    scans) where the whole-tile skip almost never fires and its full-width
    max pass is pure overhead.

    ``top2=True`` (auto at k > 32): the fold tracks per-lane (max,
    second-max). At large ``k`` the threshold is loose enough that ~80% of
    blocks have SOME query with two pool-beating rows in one lane —
    measured 4.7 ms of the 5.9 ms k=10→k=100 gap at batch 256 went to the
    resulting full-width fallback inserts. With the lane's top-2 both
    present, the second-best candidates insert in one cheap extra gated
    call and the fallback fires only for ≥3 improvements in a lane (rare
    even at k=100). Exact: ≤2 improvements in a lane are necessarily that
    lane's top-2 (anything above an improvement is itself ≥ theta).

    ``imp_first=True`` (mutually exclusive with ``skip_test``): run the
    2-ops/elem improvement-count pass ALONE first and gate the whole fold
    on ``max(imp) > 0`` (per-query thresholds — tighter than the
    whole-tile max test) — blocks with no improving row for any query in
    the tile cost ~2 VPU passes instead of ~5. Exact: an insert requires
    sc ≥ that query's theta, which is what imp counts (ties included).
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
    worst = jnp.min(theta)

    neg = jnp.float32(_NEG_INF)

    def imp_only():
        th_col = theta[:, None]
        imp = (scores[:, 0:lanes] >= th_col).astype(jnp.int32)
        for c in range(1, n_chunks):
            imp += (
                scores[:, c * lanes : (c + 1) * lanes] >= th_col
            ).astype(jnp.int32)
        return imp

    def fold(imp_in=None):
        # Lane fold: compress the block to its per-lane maxima — 128
        # candidates per query in ~2 passes. Exact unless one query has two
        # pool-beating rows in the same lane of the same block, which the
        # per-lane improvement count detects; that rare case inserts from
        # the full-width block instead. In top2 mode the per-lane
        # second-max (with its chunk argmax) is tracked alongside, so the
        # fallback threshold moves to three improvements in one lane.
        th_col = theta[:, None]
        fm = scores[:, 0:lanes]
        am = jnp.zeros((qt, lanes), jnp.int32)
        fm2 = jnp.full((qt, lanes), neg)
        am2 = jnp.zeros((qt, lanes), jnp.int32)
        imp = (
            (fm >= th_col).astype(jnp.int32) if imp_in is None else imp_in
        )
        for c in range(1, n_chunks):
            sc = scores[:, c * lanes : (c + 1) * lanes]
            gt = sc > fm
            if top2:
                # Loser of the top spot challenges the second spot. Ties
                # keep the earlier (lower-id) holder everywhere, which
                # only matters below the collision threshold where it is
                # exact (see docstring).
                cand = jnp.where(gt, fm, sc)
                candi = jnp.where(gt, am, c)
                gt2 = cand > fm2
                fm2 = jnp.where(gt2, cand, fm2)
                am2 = jnp.where(gt2, candi, am2)
            fm = jnp.where(gt, sc, fm)
            am = jnp.where(gt, c, am)
            if imp_in is None:
                imp += (sc >= th_col).astype(jnp.int32)
        return fm, am, fm2, am2, imp

    def do_inserts(fm, am, fm2, am2, imp):
        max_imp = jnp.max(imp)
        if _DEBUG_NO_COLLISION:  # attribution-only knob: INEXACT
            collision = jnp.bool_(False)
        else:
            collision = max_imp >= (3 if top2 else 2)
        # Upper bound on insert rounds this block: the largest per-query
        # count of candidates ≥ its current k-th best (ties included),
        # capped at k — a block can insert at most k rows (each insert
        # evicts), and candidates are consumed in descending key order so
        # all inserts precede all no-ops. The cap matters while the pool
        # still has sentinel holes (theta at the worst sentinel makes the
        # raw count the whole block).
        n_rounds = jnp.minimum(jnp.max(jnp.sum(imp, axis=1)), jnp.int32(k))

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (qt, lanes), 1)
        fold_idx = row0 + am * lanes + lane_iota

        @pl.when(jnp.logical_not(collision))
        def _fast():
            insert_candidates(fm, fold_idx, n_rounds)
            if top2:
                pair = imp >= 2
                n2 = jnp.minimum(
                    jnp.max(jnp.sum(pair.astype(jnp.int32), axis=1)),
                    jnp.int32(k),
                )

                @pl.when(max_imp >= 2)
                def _second():
                    # Lanes with exactly two improvements: the runner-up
                    # is a real candidate the single fold would have lost.
                    s2 = jnp.where(pair, fm2, neg)
                    i2 = jnp.where(
                        pair, row0 + am2 * lanes + lane_iota,
                        jnp.int32(2**31 - 1),
                    )
                    insert_candidates(s2, i2, n2)

        @pl.when(collision)
        def _slow():
            gidx = row0 + jax.lax.broadcasted_iota(
                jnp.int32, (qt, block_rows), 1
            )
            insert_candidates(scores, gidx, n_rounds)

    if imp_first:
        imp = imp_only()

        @pl.when(jnp.max(imp) > 0)
        def _merge_gated():
            fm, am, fm2, am2, _ = fold(imp_in=imp)
            do_inserts(fm, am, fm2, am2, imp)
    elif skip_test:
        # Conservative whole-tile skip: nothing in this block can beat the
        # worst retained candidate of any query in the tile.
        blockmax = jnp.max(scores)

        @pl.when(blockmax > worst)
        def _merge():
            do_inserts(*fold())
    else:
        fm, am, fm2, am2, imp = fold()

        @pl.when(jnp.max(fm) > worst)
        def _merge():
            do_inserts(fm, am, fm2, am2, imp)


def _pool_flush(best_s, best_i, out_s_ref, out_i_ref, k: int, k_pad: int,
                out_scale: float = 1.0):
    """One k-round sort of the (tiny) pool per query tile — the only place
    selection still costs O(k) passes. ``out_scale``: deferred dequant
    scale applied here (positive, so −inf sentinels survive and order is
    identical to pre-scaled selection)."""
    qt = best_s.shape[0]
    col_iota_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k_pad), 1)
    pool_valid = col_iota_k < k
    out_s_ref[:] = jnp.full_like(out_s_ref, _NEG_INF)
    out_i_ref[:] = jnp.full_like(out_i_ref, -1)
    cand_s = jnp.where(pool_valid, best_s[:], _NEG_INF)
    if out_scale != 1.0:
        cand_s = cand_s * jnp.float32(out_scale)
    cand_i = jnp.where(pool_valid, best_i[:], -1)
    _select_k_into(cand_s, cand_i, out_s_ref, out_i_ref, slice(None), k)


def _chunked_merge_block(scores, sc_scratch, best_s, best_i, row0, k: int,
                         k_pad: int, block_rows: int):
    """Chunk-granular merge: the round-3 strategy for huge blocks where
    the 128-lane fold's ~5 VPU passes over the full ``[qt, BN]`` tile
    dominate (the deep10m regime — a single-pass int8 matmul next to a
    5-pass f32 fold sits ~5× above the HBM floor; see
    ``benchmarks/RESULTS.md``).

    Instead of folding the whole block, the 128-lane chunks are walked
    with a rolled loop carrying the scalar pool-worst: a skipped chunk
    costs ONE reduce over ``[qt, 128]`` (so a non-contributing block
    costs ~1 pass total, the floor for work that must read the scores),
    and a contributing chunk inserts its full 128-lane width directly
    into the unsorted pool — no fold, hence no same-lane collision case
    at all. The carried worst only rises, so the per-chunk skip is
    conservative-exact; chunks are visited in ascending id order, so
    tie-breaking matches the stable-argsort oracle exactly as in the
    pool merge. Flush is shared (:func:`_pool_flush`)."""
    lanes = LANES
    n_chunks = block_rows // lanes
    qt = scores.shape[0]
    col_iota_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k_pad), 1)
    pool_valid = col_iota_k < k
    insert_candidates = _make_pool_inserter(
        best_s, best_i, pool_valid, col_iota_k
    )
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (qt, lanes), 1)

    worst0 = jnp.min(jnp.where(pool_valid, best_s[:], jnp.float32(jnp.inf)))
    blockmax = jnp.max(scores)

    @pl.when(blockmax > worst0)
    def _merge():
        # Mosaic has no dynamic_slice on VALUES; stage the block's scores
        # through a VMEM scratch ref (one write pass) so the chunk loop
        # can use dynamic ref loads (pl.dslice).
        sc_scratch[:] = scores

        def body(c, worst):
            sc = sc_scratch[:, pl.ds(c * lanes, lanes)]
            cmax = jnp.max(sc)

            def _insert(_):
                idx = row0 + c * lanes + lane_iota
                # Cap k: a chunk can insert at most k rows; the
                # inserter's early exit ends the loop one round after
                # the last actual insert.
                insert_candidates(sc, idx, jnp.int32(k))
                return jnp.min(
                    jnp.where(pool_valid, best_s[:], jnp.float32(jnp.inf))
                )

            return jax.lax.cond(
                cmax > worst, _insert, lambda _: worst, operand=0
            )

        jax.lax.fori_loop(0, n_chunks, body, worst0)


def _rounds_merge_block(scores, best_s, best_i, row0, k: int, k_pad: int,
                        block_rows: int, skip_test: bool = True,
                        imp_first: bool = False):
    """k-round unrolled merge keeping the candidate list SORTED descending
    (the round-1 strategy). Per merged block it always pays k selection
    rounds over [qt, 128 + k_pad] — more selection work than the pool
    merge, but straight-line unrolled code with no serialized loop-carried
    bookkeeping, which wins on cheap-matmul paths (single-pass int8 MXU at
    small k) where the pool loop's serialization is visible. Exactness
    discipline (skip test, lane fold, collision fallback) is identical.
    ``skip_test``: as in :func:`_pool_merge_block`. ``imp_first``: as in
    :func:`_pool_merge_block` (mutually exclusive with ``skip_test``)."""
    lanes = LANES
    n_chunks = block_rows // lanes
    qt = scores.shape[0]
    full = slice(None)

    worst = jnp.min(best_s[:, :k])
    theta = best_s[:, k - 1 : k]  # current kth best per query (sorted)

    def imp_only():
        imp = (scores[:, 0:lanes] >= theta).astype(jnp.int32)
        for c in range(1, n_chunks):
            imp += (
                scores[:, c * lanes : (c + 1) * lanes] >= theta
            ).astype(jnp.int32)
        return imp

    def fold(imp_in=None):
        fm = scores[:, 0:lanes]
        am = jnp.zeros((qt, lanes), jnp.int32)
        imp = (
            (fm >= theta).astype(jnp.int32) if imp_in is None else imp_in
        )
        for c in range(1, n_chunks):
            sc = scores[:, c * lanes : (c + 1) * lanes]
            gt = sc > fm
            fm = jnp.where(gt, sc, fm)
            am = jnp.where(gt, c, am)
            if imp_in is None:
                imp += (sc >= theta).astype(jnp.int32)
        return fm, am, imp

    def do_select(fm, am, imp):
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

    if imp_first:
        # Gate pass first (2 VPU ops/elem: cmp + add, vs the fold's ~5):
        # only blocks where SOME query has an improving row pay the fold.
        # Exact — an insert requires sc ≥ that query's theta (ties enter
        # via the lower-index tie-break), which is exactly what imp counts.
        imp = imp_only()

        @pl.when(jnp.max(imp) > 0)
        def _merge_gated():
            fm, am, _ = fold(imp_in=imp)
            do_select(fm, am, imp)
    elif skip_test:
        blockmax = jnp.max(scores)

        @pl.when(blockmax > worst)
        def _merge():
            fm, am, imp = fold()
            do_select(fm, am, imp)
    else:
        fm, am, imp = fold()

        @pl.when(jnp.max(fm) > worst)
        def _merge():
            do_select(fm, am, imp)


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
                 merge: str = "pool",
                 defer_scale: bool = False, has_seed: bool = False,
                 raw_scores: bool = False,
                 exclude_stride: int | None = None):
    metric = DistanceMetric(metric)
    prec = _PRECISIONS[precision]
    bf16x3 = precision == "high" and not int_path
    lanes = 128
    n_chunks = block_rows // lanes
    # "<base>_imp" merge variants: gate each block's fold on a cheap
    # improvement-count-only pass (see _pool_merge_block docstring).
    imp_first = merge.endswith("_imp")
    if imp_first:
        merge = merge[: -len("_imp")]

    def kernel(nvalid_ref, *rest):
        # Optional inputs appear in declaration order: bias_scale (SMEM),
        # queries, db, norms, bias_row, valid_mask, [seeds], then outputs
        # + scratch.
        rest = list(rest)
        bias_scale_ref = rest.pop(0) if has_bias else None
        q_ref, db_ref = rest[:2]
        rest = rest[2:]
        norms_ref = rest.pop(0)
        bias_ref = rest.pop(0) if has_bias else None
        valid_ref = rest.pop(0) if has_valid else None
        seed_s_ref = rest.pop(0) if has_seed else None
        seed_i_ref = rest.pop(0) if has_seed else None
        sc_scratch = rest.pop() if merge == "chunks" else None
        out_s_ref, out_i_ref, best_s, best_i = rest

        ni = pl.program_id(1)
        nblocks = pl.num_programs(1)

        @pl.when(ni == 0)
        def _init():
            if has_seed:
                # Presampled two-phase scan: the pool starts from the
                # subsample's exact top-k (INTERNAL-domain scores), so the
                # whole-tile skip fires from the first block.
                best_s[:] = seed_s_ref[:]
                best_i[:] = seed_i_ref[:]
            else:
                best_s[:] = jnp.full_like(best_s, _NEG_INF)
                best_i[:] = jnp.full_like(best_i, -1)

        dims = (((1,), (1,)), ((), ()))
        if int_path:
            dots = jax.lax.dot_general(
                q_ref[:], db_ref[:], dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
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
        if scale != 1.0 and not defer_scale:
            # (deferred-scale mode multiplies once at flush instead)
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

        # Unseeded deferred-scale scans AND large-k pool scans drop the
        # whole-tile skip pass (it almost never fires mid-scan: any query
        # × any row beating the TILE-min threshold forces a merge, qt·BN
        # pairs per block add up, and at k > 32 the per-query thresholds
        # are loose on top); SEEDED scans keep it. Group-granular skips
        # and per-query normalization were measured 2–3× SLOWER here
        # (branchy per-group code defeats Mosaic's pipelining) — see
        # benchmarks/RESULTS.md.
        use_skip = has_seed or (not defer_scale and k <= _UNROLL_K_MAX)

        def do_merge(sc):
            if merge == "pool":
                _pool_merge_block(
                    sc, best_s, best_i, row0, k, k_pad, block_rows,
                    skip_test=use_skip and not imp_first,
                    top2=k > _UNROLL_K_MAX, imp_first=imp_first,
                )
            elif merge == "chunks":
                _chunked_merge_block(
                    sc, sc_scratch, best_s, best_i, row0, k, k_pad,
                    block_rows,
                )
            else:
                _rounds_merge_block(
                    sc, best_s, best_i, row0, k, k_pad, block_rows,
                    skip_test=use_skip and not imp_first,
                    imp_first=imp_first,
                )

        if defer_scale:
            # The norms input is unused by the inner-product epilogue, so
            # in deferred-scale mode it carries the PAD BIAS row instead
            # (0 for logical rows, −inf for padding, precomputed in XLA):
            # one fused add replaces the iota-compare + select masking
            # passes over [qt, BN].
            sc = scores + norms_ref[:]
            if valid_ref is not None:
                sc = jnp.where(valid_ref[:] != 0, sc, _NEG_INF)
            do_merge(sc)
        else:
            rows = row0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_rows), 1
            )
            live = rows < nvalid_ref[0, 0]
            if exclude_stride is not None:
                # presampled two-phase scan on the general (non-deferred)
                # path: seeded subsample rows are excluded here so seed ∪
                # scan partitions the corpus (the deferred-scale path does
                # the same via its pad-bias row)
                live = jnp.logical_and(live, rows % exclude_stride != 0)
            sc = jnp.where(live, scores, _NEG_INF)
            if valid_ref is not None:
                sc = jnp.where(valid_ref[:] != 0, sc, _NEG_INF)
            do_merge(sc)

        out_mul = (
            scale if (defer_scale and scale != 1.0 and not raw_scores)
            else 1.0
        )
        @pl.when(ni == nblocks - 1)
        def _flush():
            if merge in ("pool", "chunks"):  # unsorted pool: one k-sort
                _pool_flush(best_s, best_i, out_s_ref, out_i_ref, k, k_pad,
                            out_scale=out_mul)
            elif out_mul != 1.0:  # deferred scale: one [qt, k_pad] mul
                out_s_ref[:] = best_s[:] * jnp.float32(out_mul)
                out_i_ref[:] = best_i[:]
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
    merge: str | None = None,
    seed_s=None,
    seed_i=None,
    raw_scores: bool = False,
    exclude_stride: int | None = None,
    vmem_retry: bool = True,
):
    """VMEM-robust front end for :func:`_fused_topk`: if Mosaic's scoped
    VMEM allocator rejects the auto-sized block (its live-set model is not
    exactly predictable, e.g. large-``k`` selection), retry with
    successively smaller ``block_rows``. The shrink only triggers on the
    first compile of a shape; steady-state calls hit the jit cache.
    ``vmem_retry=False`` re-raises instead (autotune uses it so an OOMing
    candidate records an error, not a silently relabeled measurement)."""
    bn = block_rows
    last_exc = None
    for _ in range(5 if vmem_retry else 1):
        try:
            return _fused_topk(
                queries, db, db_norms, num_valid, k, metric,
                valid_mask=valid_mask, scale=scale, block_rows=bn,
                query_tile=query_tile, interpret=interpret,
                precision=precision, bias_row=bias_row,
                bias_scale=bias_scale, merge=merge,
                seed_s=seed_s, seed_i=seed_i, raw_scores=raw_scores,
                exclude_stride=exclude_stride,
            )
        except Exception as exc:  # jaxlib runtime error types vary
            msg = str(exc)
            if "vmem" not in msg.lower() or not vmem_retry:
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
        "precision", "merge", "raw_scores", "exclude_stride",
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
    merge: str | None = None,
    seed_s: jax.Array | None = None,
    seed_i: jax.Array | None = None,
    raw_scores: bool = False,
    exclude_stride: int | None = None,
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
        low-significand data like integer-valued corpora, ~2x faster on
        wide dims; on float data it can swap sub-ulp near-ties — GIST1M
        measured one rank-10/11 flip in 80 neighbors, oracle gap 3.5e-7),
        'default' (single bf16 pass, fastest, visibly reorders near-ties).
      merge: on-chip selection strategy — 'pool' (streaming replace-min:
        per-block work scales with actual top-k improvements; wins
        wherever the matmul dominates, and at large k), 'rounds'
        (k unrolled selection rounds per merged block, straight-line
        code with no serialized loop; wins on the single-pass int8 MXU
        path at small k, where the pool loop's serialization is visible
        next to a very cheap matmul), or 'chunks' (chunk-granular skip +
        direct 128-wide pool inserts, no lane fold: per-block cost drops
        to ~1 VPU pass when few chunks contribute — the huge-block int8
        regime near the HBM floor, e.g. deep10m). Default None = auto:
        'rounds' for int8/uint8 at k ≤ 32, else 'pool'. All are exact.
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
    int_path_early = db.dtype in (jnp.int8.dtype, jnp.uint8.dtype)
    if merge is None:
        merge = "rounds" if int_path_early and k <= _UNROLL_K_MAX else "pool"
    if merge not in ("pool", "rounds", "chunks", "pool_imp", "rounds_imp"):
        raise ValueError(
            f"unknown merge strategy {merge!r}; one of 'pool', 'rounds', "
            "'chunks', 'pool_imp', 'rounds_imp'"
        )
    # base strategy name for layout/flush decisions; the _imp suffix only
    # changes the per-block gating (parsed again inside _make_kernel)
    merge_base = merge[: -len("_imp")] if merge.endswith("_imp") else merge
    if block_rows is None:
        block_rows = default_block_rows(
            d, db.dtype.itemsize, qt,
            bf16x3=precision == "high" and db.dtype.itemsize == 4,
            k_pad=k_pad, pool_merge=merge_base == "pool",
        )
    # The lane-fold merge requires whole 128-lane chunks per block.
    block_rows = max(LANES, _round_up(block_rows, LANES))

    q_pad = _round_up(q, qt)
    if q_pad != q:
        queries = jnp.pad(queries, ((0, q_pad - q), (0, 0)))
    metric = DistanceMetric(metric)
    # Deferred-scale mode: int8 inner product with no bias ranks the
    # unscaled f32-cast dots (monotone positive scale => identical order
    # AND identical output values — the scale multiplies once at flush),
    # replaces padding masks with a pad-bias add riding the norms slot,
    # and gates inserts on fold maxima instead of a separate whole-tile
    # skip pass.
    defer_scale = (
        db.dtype == jnp.int8.dtype
        and metric == DistanceMetric.INNER_PRODUCT
        and bias_row is None
        and merge_base in ("pool", "rounds")
        and float(scale) > 0.0
    )
    int_path = int_path_early
    nvalid_arr = jnp.asarray(num_valid, dtype=jnp.int32).reshape(1, 1)
    if defer_scale:
        # IP ignores norms; ship the pad-bias row in their slot (see the
        # kernel's deferred-scale masking note). Sized to the full grid
        # extent so the final (possibly partial) block never reads out of
        # bounds — an OOB pad value would poison the whole block's gate
        # (−inf + NaN = NaN, and NaN > worst is false).
        n_grid = _round_up(n, block_rows)
        iota_n = jnp.arange(n_grid, dtype=jnp.int32)
        live = iota_n < jnp.asarray(num_valid, jnp.int32)
        if exclude_stride is not None:
            # presampled two-phase scan: rows already seeded from the
            # strided subsample are excluded here so they cannot enter
            # the pool twice (seed ∪ scan partitions the corpus)
            live = jnp.logical_and(live, iota_n % exclude_stride != 0)
        norms_2d = jnp.where(
            live, jnp.float32(0.0), jnp.float32(_NEG_INF)
        ).reshape(1, n_grid)
    else:
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
    in_specs.append(row_spec)
    args.append(norms_2d)
    if bias_row is not None:
        in_specs.append(row_spec)
        args.append(bias_row.reshape(1, n).astype(jnp.float32))
    if valid_mask is not None:
        in_specs.append(row_spec)
        args.append(valid_mask.reshape(1, n).astype(jnp.float32))
    if seed_s is not None:
        seed_spec = pl.BlockSpec((qt, k_pad), lambda qi, ni: (qi, 0),
                                 memory_space=pltpu.VMEM)
        ss = jnp.asarray(seed_s, jnp.float32)
        si = jnp.asarray(seed_i, jnp.int32)
        pads = ((0, q_pad - ss.shape[0]), (0, k_pad - ss.shape[1]))
        ss = jnp.pad(ss, pads, constant_values=_NEG_INF)
        si = jnp.pad(si, pads, constant_values=-1)
        in_specs += [seed_spec, seed_spec]
        args += [ss, si]

    kernel = _make_kernel(
        k, k_pad, block_rows, metric, float(scale),
        has_valid=valid_mask is not None, int_path=int_path,
        precision=precision, has_bias=bias_row is not None,
        merge=merge, defer_scale=defer_scale,
        has_seed=seed_s is not None, raw_scores=raw_scores,
        exclude_stride=None if defer_scale else exclude_stride,
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
        ]
        + (
            # chunked merge stages block scores in VMEM for dynamic
            # per-chunk ref loads (no value dynamic_slice in Mosaic)
            [pltpu.VMEM((qt, block_rows), jnp.float32)]
            if merge == "chunks"
            else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_dot,
            bytes_accessed=n * d * db.dtype.itemsize + q_pad * d * 4 + n * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    # −inf slots are unfilled (k exceeded valid rows after tombstones):
    # normalize their index to the −1 sentinel.
    out_i = jnp.where(jnp.isneginf(out_s), -1, out_i)
    return out_s[:q, :k], out_i[:q, :k]


def fused_topk_presampled(
    queries,
    db,
    db_norms,
    num_valid,
    k: int,
    metric,
    scale: float = 1.0,
    stride: int = 64,
    block_rows: int | None = None,
    query_tile: int = 128,
    interpret: bool = False,
    merge: str | None = None,
    precision: str = "highest",
    valid_mask=None,
    sub=None,
):
    """Two-phase exact top-k: phase 1 computes the exact top-k of the
    ``[::stride]`` row subsample (~``1/stride`` of the scan) and seeds the
    main kernel's candidate pool with it, so the per-query thresholds
    start near their final values from the first block. Phase 2 excludes
    the subsampled rows (deferred-scale path: via the pad-bias row;
    general path: via the kernel's liveness mask), so seed ∪ scan
    partitions the corpus and no row can enter the pool twice. Results
    are exact and identical to :func:`fused_topk` (both phases share its
    selection semantics; a subsample row in the global top-k is
    necessarily in the subsample's top-k).

    The payoff is regime-dependent and measured in
    ``benchmarks/RESULTS.md``: on the int8 deferred-scale scan it lost
    (the whole-tile skip it feeds almost never fires at qt ≥ 64), while
    at large ``k`` on matmul-heavy paths it cuts the pool's serialized
    insert rounds (total inserts fall from ~k·ln(N/k) toward ~k·ln(stride)
    per query — at k=100 most of the selection overhead over k=10).

    ``sub``: optional pre-sliced ``(db[::stride], db_norms[::stride])``
    pair so steady-state callers don't re-gather the subsample per call.

    Falls back to plain :func:`fused_topk` for corpora too small for a
    two-phase scan to make sense."""
    if db.shape[0] <= 4 * stride:
        return fused_topk(
            queries, db, db_norms, num_valid, k, metric, scale=scale,
            block_rows=block_rows, query_tile=query_tile,
            interpret=interpret, merge=merge, precision=precision,
            valid_mask=valid_mask,
        )
    n = db.shape[0]
    n_sub = -(-n // stride)
    nv = jnp.asarray(num_valid, jnp.int32)
    nv_sub = -(-nv // stride)  # rows i·stride < num_valid
    db_sub, norms_sub = sub if sub is not None else (
        db[::stride], db_norms[::stride]
    )
    seed_s, seed_i = fused_topk(
        queries, db_sub, norms_sub, nv_sub,
        min(k, n_sub), metric, scale=scale, query_tile=query_tile,
        interpret=interpret, merge=merge, raw_scores=True,
        precision=precision,
        valid_mask=None if valid_mask is None else valid_mask[::stride],
    )
    seed_i = jnp.where(seed_i >= 0, seed_i * stride, seed_i)
    return fused_topk(
        queries, db, db_norms, num_valid, k, metric, scale=scale,
        block_rows=block_rows, query_tile=query_tile, interpret=interpret,
        merge=merge, seed_s=seed_s, seed_i=seed_i, exclude_stride=stride,
        precision=precision, valid_mask=valid_mask,
    )
