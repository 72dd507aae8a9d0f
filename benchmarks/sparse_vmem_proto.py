"""Prototype: vocab-tiled Pallas kernel for the sparse ELL contraction
(VERDICT r3 #6 — one structural attempt at the gather-issue bound).

The shipping ELL path (`sparse.py::_ell_dots`) gathers one [Q]-row of
queriesT from HBM per ELL entry — measured issue-bound at ~215M
gathers/s (~220 GB/s effective vs ~819 peak) on the 1M x 30k SPLADE
config. This kernel stages [T, Q] vocab tiles of queriesT through VMEM
and re-walks the ELL entries once per tile, so per-entry gathers hit
VMEM instead of HBM issue slots.

Lowering reality (first finding): Mosaic lowers lax.gather ONLY as
`tpu.dynamic_gather` where input, indices and output share one 2-D
shape — i.e. `jnp.take_along_axis(x, idx, axis=0|1)` with idx the same
shape as x (jax/_src/pallas/mosaic/lowering.py:2484) — and 2-D→1-D
vector reshapes don't lower either, so the kernel avoids flattening
entirely by tying the vocab tile to the row block (T == B) and walking
the R ELL slots as an unrolled loop of same-shape gathers:

    grid = (row_blocks, vocab_tiles)            # vocab minor: acc reuse
    qt_tile = qtT[t*T:(t+1)*T, :]               # [T, Q] VMEM
    for j in range(R):                          # unrolled, R = ELL width
        idx = cols[:, j:j+1] - t*T              # [B, 1]
        g   = take_along_axis(qt_tile, bcast(idx), 0)    # [B=T, Q]
        acc += where(0 <= idx < T, vals[:, j:j+1], 0) * g

Cost model says this LOSES: every entry is re-walked vocab/T times, so
gather volume = nnz * (vocab/T) * Q elements (~184G at T=2048) — the
VMEM gather's extra passes outweigh the HBM issue-slot savings.

FINAL RESULT (negative, recorded in benchmarks/RESULTS.md): the TPU
compile rejects even this form — `tpu.dynamic_gather` supports a single
source vreg along the gather dimension ("Not implemented: Multiple
source vregs along gather dimension"), i.e. gathers across at most 8
sublanes (axis 0) or 128 lanes (axis 1). A vocab tile is therefore
capped at T=128, where the re-walk factor is vocab/128 ≈ 240x —
hopeless. VMEM-staged vocab tiling is unimplementable in Pallas TPU
today; the ELL HBM-gather formulation stands as the plateau. This
script is kept as the executable record (runs correctness in interpret
mode; reproduces the Mosaic error on TPU).
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(qt_ref, cols_ref, vals_ref, out_ref, *, T: int, R: int):
    t = pl.program_id(1)

    B = cols_ref.shape[0]
    Q = qt_ref.shape[1]
    qt = qt_ref[:]                               # [T, Q], T == B
    cols = cols_ref[:]                           # [B, R]
    vals = vals_ref[:]
    acc = jnp.zeros((B, Q), jnp.float32)
    for j in range(R):                           # unrolled ELL slots
        idx = cols[:, j:j + 1] - t * T           # [B, 1]
        in_tile = jnp.logical_and(idx >= 0, idx < T)
        safe = jnp.clip(idx, 0, T - 1)
        g = jnp.take_along_axis(
            qt, jnp.broadcast_to(safe, (B, Q)), axis=0
        )                                        # [B, Q] VMEM gather
        acc = acc + jnp.where(in_tile, vals[:, j:j + 1], 0.0) * g

    @pl.when(t == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(t != 0)
    def _acc():
        out_ref[:] += acc


@functools.partial(
    jax.jit, static_argnames=("block_rows", "interpret")
)
def vmem_tiled_dots(qt, cols_ell, vals_ell, block_rows: int,
                    interpret: bool = False):
    """dots[n, q] via the vocab-tiled VMEM-gather kernel. qt: [dim_pad, Q]
    (dim_pad a multiple of block_rows — the vocab tile is tied to the row
    block so gathers stay same-shape); cols/vals: [n_pad, R]."""
    n_pad, R = cols_ell.shape
    dim_pad, Q = qt.shape
    T = block_rows
    assert dim_pad % T == 0 and n_pad % block_rows == 0
    grid = (n_pad // block_rows, dim_pad // T)
    return pl.pallas_call(
        functools.partial(_kernel, T=T, R=R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, Q), lambda b, t: (t, 0)),
            pl.BlockSpec((block_rows, R), lambda b, t: (b, 0)),
            pl.BlockSpec((block_rows, R), lambda b, t: (b, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, Q), lambda b, t: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, Q), jnp.float32),
        interpret=interpret,
    )(qt, cols_ell, vals_ell)


def main():
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(12)
    n = 1_000_000 if not interpret else 20_000
    d, R, Q = 30_522, 48, 256
    B = 2048  # row block == vocab tile (15 tiles over the padded vocab)
    dim_pad = -(-d // B) * B
    n_pad = -(-n // B) * B
    print(f"n={n} d={d} R={R} Q={Q} B=T={B} tiles={dim_pad//B} "
          f"interpret={interpret}", file=sys.stderr)

    cols = rng.integers(0, d, (n, R)).astype(np.int32)
    vals = np.abs(rng.standard_normal((n, R))).astype(np.float32)
    cols_p = np.zeros((n_pad, R), np.int32)
    vals_p = np.zeros((n_pad, R), np.float32)
    cols_p[:n], vals_p[:n] = cols, vals

    def mkq():
        q = np.zeros((Q, d), np.float32)
        qc = rng.integers(0, d, (Q, 256))
        q[np.arange(Q)[:, None], qc] = np.abs(
            rng.standard_normal((Q, 256))
        ).astype(np.float32)
        qt = np.zeros((dim_pad, Q), np.float32)
        qt[:d] = q.T
        return q, qt

    q_h, qt_h = mkq()
    nc = min(n, 2000)  # oracle subset
    ce, ve = jax.device_put(cols_p), jax.device_put(vals_p)
    jax.block_until_ready((ce, ve))

    # correctness on the subset
    sub = vmem_tiled_dots(
        jax.device_put(qt_h), ce, ve, B, interpret=interpret
    )
    got = np.asarray(sub[:nc, :4]).T  # [4, nc]
    oracle = np.zeros((4, nc))
    for qi in range(4):
        for r in range(nc):
            oracle[qi, r] = (q_h[qi, cols[r]] * vals[r].astype(np.float64)).sum()
    err = np.abs(got - oracle).max() / max(np.abs(oracle).max(), 1e-9)
    print(f"max rel err vs f64 oracle: {err:.2e}", file=sys.stderr)
    assert err < 1e-5

    if interpret:
        print("interpret mode: correctness only", file=sys.stderr)
        return

    # single-launch cliff check, then pipelined timing (suite methodology)
    qts = [jax.device_put(mkq()[1]) for _ in range(8)]
    jax.block_until_ready(qts)
    _ = np.asarray(vmem_tiled_dots(qts[0], ce, ve, B)[0, 0])  # warm
    t0 = time.perf_counter()
    _ = np.asarray(vmem_tiled_dots(qts[1], ce, ve, B)[0, 0])
    single = time.perf_counter() - t0
    print(f"single-launch {single*1e3:.1f} ms", file=sys.stderr)
    if single > 2.0:
        print(f"CLIFF ({single:.2f}s) — skipping pipelined run",
              file=sys.stderr)
        return
    t0 = time.perf_counter()
    outs = [vmem_tiled_dots(qq, ce, ve, B) for qq in qts]
    _ = np.asarray(outs[-1][0, 0])
    dt = (time.perf_counter() - t0) / len(qts)
    print(f"dots-only: {dt*1e3:.1f} ms/batch -> {Q/dt:.0f} QPS-equivalent "
          "(ELL baseline incl. top-k: 1146 QPS / 223 ms)", file=sys.stderr)


if __name__ == "__main__":
    main()
