"""Pallas TPU row gather: ``out[r] = db[idx[r]]`` via in-flight DMAs.

Why this exists: XLA's TPU lowering of a scattered row gather
(``jnp.take(db, idx, axis=0)``) pays a fixed per-launch cost that
dominates at *wide rows / few rows* — the exact shape of the
``high_verified`` repair pass. Measured in rescore context on a 1M-row
corpus (``benchmarks/RESULTS.md`` r5): at D=1024 f32 / R=4608 this
kernel cuts the repair from 3.63 to 2.93 ms (raw device gather 2.4x);
at D=128 PQ-rerank row counts XLA wins instead (its lowering amortizes
with R, while the strip fetch below pays a fixed 8x read amplification
per row), so :func:`auto_select` only routes the measured-win region
here. Caution for future sessions: standalone gather timings that read
back the gathered array measure the dev relay's ~10-20 MB/s readback,
not the gather — an earlier r5 session recorded a phantom "47-77 ms
XLA gather" that way; time through a device-side reduction instead.

Design (TPU-first, no reference analog — the reference's random access
is a host-side mmap pointer chase, ``/root/reference/src/vector_space.rs:101``):

- Row indices arrive as a **scalar-prefetch** argument
  (``pltpu.PrefetchScalarGridSpec``), readable in SMEM before the kernel
  body runs, so they can drive DMA source offsets directly.
- The corpus stays **unblocked in HBM** (``memory_space=ANY``). Mosaic
  requires HBM slices to respect the (8, 128) tiling — a 1-row slice is
  rejected ("must be aligned to tiling (8)") — so each wanted row is
  fetched as its enclosing 8-row aligned strip ``db[8*(i//8) : +8]``
  into a VMEM scratch ``[rows_per_step, 8, D]``. 8x read amplification
  of a microscopic transfer, in exchange for strip starts/extents the
  DMA engine accepts.
- All copies of a grid step signal ONE DMA semaphore; every copy moves
  the same byte count, so waiting ``rows_per_step`` times is a barrier
  for all of them — no per-slot semaphore array, and the DMA queue
  stays full.
- The wanted row is then selected from its strip *vectorially*: a
  ``[rows_per_step, 8]`` one-hot of ``idx % 8`` (built from a
  ``broadcasted_iota`` against a VMEM copy of the indices — SMEM scalars
  can't feed vector ops) masks the strip and a sublane ``sum`` collapses
  it. Exactly one lane of the 8 is non-zero, so the sum *is* the
  selected row — bit-exact for every dtype, no arithmetic rounding.
- Pallas's output pipeline overlaps the block write-back with the next
  step's DMAs.

Exactness: a DMA is a byte copy and the select adds zeros to one
untouched value — the gathered rows are bit-identical to ``jnp.take``
(verified on TPU against a 1M-row corpus, and bit-exact in
``tests/test_gather_kernel.py``). One caveat: swapping the gather
backend changes the surrounding *program*, and XLA may then tile the
downstream rescore dot differently — at D=1024 the two rescore variants
returned identical RANKS but last-ulp-different scores (both equally
close to the f64 oracle; at D=128 they are bit-identical end to end).
That accumulation-order noise is within the f32-HIGHEST gamma_D term
already budgeted by ``SearchEngine._verify_eps``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: VMEM budget for the strip scratch (``rows_per_step`` x 8 x D). 4 MB
#: leaves the double-buffered output blocks far under the ~16 MB budget
#: at any supported dim.
_SCRATCH_BYTES = 4 * 1024 * 1024


def _rows_per_step(d: int, itemsize: int, r: int) -> int:
    by_vmem = _SCRATCH_BYTES // (8 * d * itemsize)
    return int(max(8, min(256, by_vmem, max(8, r))))


def _gather_kernel(
    rows_per_step: int, acc_dtype, starts_ref, sel_ref, db_ref, out_ref,
    strips_ref, sem,
):
    g = pl.program_id(0)
    base = g * rows_per_step

    def copy(c):
        # The prefetch array holds STRIP indices (row // 8); multiplying
        # by 8 here lets Mosaic prove the slice start is tile-aligned
        # ("failed to prove that a tile index in dimension 0 is
        # divisible by the tiling (8)" when handed a raw row start).
        start = starts_ref[base + c] * 8
        return pltpu.make_async_copy(
            db_ref.at[pl.ds(start, 8), :],
            strips_ref.at[c],
            sem,
        )

    def issue(c, carry):
        copy(c).start()
        return carry

    # Mosaic's fori_loop lowering supports only unroll=1 or a full
    # unroll; the body is a scalar-core DMA enqueue (no vector work), so
    # the rolled form issues copies far faster than the engine drains
    # them.
    lax.fori_loop(0, rows_per_step, issue, 0)

    def drain(c, carry):
        # Each wait consumes exactly one strip-copy's byte count on the
        # shared semaphore; all copies are the same size, so
        # rows_per_step waits == "all DMAs done" regardless of order.
        copy(c).wait()
        return carry

    lax.fori_loop(0, rows_per_step, drain, 0)

    # Vector sublane select: out[c] = strips[c, sel[c]]. One-hot + sum
    # is bit-exact (one value plus zeros) and avoids a dynamic per-row
    # index, which Mosaic has no vector lowering for. The one-hot is
    # built at full [rows_per_step, 8, D] shape with int32 operands —
    # reshaping/broadcasting an i1 vector's minor dim is unsupported
    # ("insertion of minor dim that is not a no-op only supported for
    # 32-bit types"), but a full-shape compare never materializes a
    # small i1 vector.
    d = strips_ref.shape[2]
    sel3 = jnp.broadcast_to(
        sel_ref[...][:, :, None], (rows_per_step, 8, d)
    )  # int32 [rp, 1, 1] -> [rp, 8, D]
    iota3 = lax.broadcasted_iota(jnp.int32, (rows_per_step, 8, d), 1)
    picked = jnp.where(
        iota3 == sel3,
        strips_ref[...].astype(acc_dtype),
        jnp.zeros((), acc_dtype),
    )
    out_ref[...] = jnp.sum(picked, axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(
    db: jax.Array, idx: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Gather ``db[idx]`` (``idx``: int32 ``[R]``, values in ``[0, N)``)
    as ``[R, D]`` with the same dtype as ``db``. Out-of-range/negative
    indices are clamped to row 0 (callers mask separately, matching
    ``rescore_topk``'s ``-1 → row 0 + mask`` convention). Requires
    ``N >= 8`` (strip granularity) — callers guard via :func:`supports`.
    """
    if db.ndim != 2:
        raise ValueError(f"db must be [N, D], got {db.shape}")
    n, d = db.shape
    if n % 8 or n < 8:
        # Strip starts must be provably 8-aligned AND in-bounds; a ragged
        # tail row count would need a clamped (unaligned) last strip.
        # Engine-resident corpora are tile-padded so this never triggers
        # on the hot paths; :func:`supports` steers other callers to
        # ``jnp.take``.
        raise ValueError(f"gather_rows requires N % 8 == 0, got N={n}")
    r = idx.shape[0]
    safe = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    step = _rows_per_step(d, np.dtype(db.dtype).itemsize, r)
    pad = (-r) % step
    if pad:
        safe = jnp.concatenate([safe, jnp.zeros((pad,), jnp.int32)])
    rp = r + pad

    # Enclosing 8-row aligned strip per row, passed as a STRIP index so
    # the kernel's ``* 8`` makes tile alignment provable to Mosaic.
    starts = safe // 8
    sel = (safe - starts * 8).reshape(rp, 1)

    acc_dtype = (
        jnp.int32 if jnp.issubdtype(db.dtype, jnp.integer) else jnp.float32
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rp // step,),
        in_specs=[
            pl.BlockSpec((step, 1), lambda g, starts_ref: (g, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((step, d), lambda g, starts_ref: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((step, 8, d), db.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, step, acc_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rp, d), db.dtype),
        interpret=interpret,
    )(starts, sel, db)
    return out[:r] if pad else out


#: dtypes the strip-select path handles. f16 is excluded — Mosaic has no
#: f16 vector type, and the sublane select is vector work (the engine
#: pre-casts FLOAT16 spaces to f32 anyway, CLAUDE.md).
_DTYPES = frozenset(
    np.dtype(t).name
    for t in (np.float32, jnp.bfloat16, np.int8, np.uint8, np.int32,
              np.uint32)
)


def supports(db) -> bool:
    """Whether :func:`gather_rows` handles this corpus array (2-D, a
    whole number of 8-row strips, a dtype Mosaic DMAs + vector-selects
    natively). Callers fall back to ``jnp.take``."""
    return (
        db.ndim == 2
        and db.shape[0] >= 8
        and db.shape[0] % 8 == 0
        and np.dtype(db.dtype).name in _DTYPES
    )


def auto_select(db, r: int, *, interpret: bool = False) -> bool:
    """Route a gather of ``r`` rows through :func:`gather_rows`? True
    exactly in the measured-win region: a supported 2-D corpus resident
    on a real TPU, rows of at least 2 KB, and a small row count.

    The A/B (RESULTS.md r5) puts the crossover here: in-rescore-context
    on a 1M-row corpus the DMA path wins at D=1024 f32 / R=4608 (2.93 vs
    3.63 ms — the ``high_verified`` repair shape) but LOSES at D=128 f32
    at PQ-rerank row counts (R=25600: 3.62 vs 3.03 ms; R=102400: 7.33 vs
    4.64 ms) — XLA's lowering amortizes well at scale while the strip
    fetch pays 8x read amplification per row. Everything outside the
    measured win stays on ``jnp.take``. Shared by
    :func:`~.distances.rescore_topk` and the PQ/IVF-PQ re-rankers."""
    if interpret or not supports(db):
        return False
    if db.shape[1] * np.dtype(db.dtype).itemsize < 2048 or r > 16384:
        return False
    devs = getattr(db, "devices", None)
    if devs is None:
        return False
    try:
        return next(iter(devs())).platform == "tpu"
    except Exception:
        return False
