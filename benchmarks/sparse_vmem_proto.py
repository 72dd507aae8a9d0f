"""Prototype: vocab-tiled Pallas kernel for the sparse ELL contraction
(VERDICT r3 #6 — one structural attempt at the gather-issue bound).

The shipping ELL path (`sparse.py::_ell_dots`) gathers one [Q]-row of
queriesT from HBM per ELL entry — measured issue-bound at ~215M
gathers/s (~220 GB/s effective vs ~819 peak) on the 1M x 30k SPLADE
config. This kernel stages [T, Q] vocab tiles of queriesT through VMEM
and re-walks the ELL entries once per tile, so per-entry gathers hit
VMEM instead of HBM issue slots:

    grid = (row_blocks, vocab_tiles)           # vocab minor: acc reuse
    qt_tile  = qtT[t*T:(t+1)*T, :]             # [T, Q] VMEM
    idx      = cols[blk] - t*T                 # [B, R]
    in_tile  = 0 <= idx < T
    g        = take(qt_tile, clip(idx), 0)     # VMEM gather
    acc[B,Q] += sum_r where(in_tile, vals, 0) * g

Cost model: every entry is touched vocab/T times (~15x entry traffic at
T=2048 — entries are 8 B, so ~5.8 GB/batch vs the 48 GB of HBM-gathered
query rows), and the gather becomes a VMEM dynamic gather, IF Mosaic can
lower `jnp.take` with vector indices at all. That lowering question is
what this prototype answers first; then same-session QPS vs the ELL
baseline decides (record either way in benchmarks/RESULTS.md).
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
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    B = cols_ref.shape[0]
    Q = qt_ref.shape[1]
    idx = cols_ref[:] - t * T                    # [B, R]
    in_tile = jnp.logical_and(idx >= 0, idx < T)
    safe = jnp.clip(idx, 0, T - 1).reshape(-1)   # [B*R]
    g = jnp.take(qt_ref[:], safe, axis=0)        # [B*R, Q] VMEM gather
    w = jnp.where(in_tile, vals_ref[:], 0.0).reshape(-1)[:, None]
    out_ref[:] += (g * w).reshape(B, R, Q).sum(1)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "vocab_tile", "interpret")
)
def vmem_tiled_dots(qt, cols_ell, vals_ell, block_rows: int,
                    vocab_tile: int, interpret: bool = False):
    """dots[n, q] via the vocab-tiled VMEM-gather kernel. qt: [dim_pad, Q]
    (dim_pad a multiple of vocab_tile); cols/vals: [n_pad, R]."""
    n_pad, R = cols_ell.shape
    dim_pad, Q = qt.shape
    grid = (n_pad // block_rows, dim_pad // vocab_tile)
    return pl.pallas_call(
        functools.partial(_kernel, T=vocab_tile, R=R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((vocab_tile, Q), lambda b, t: (t, 0)),
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
    T = 2048
    dim_pad = -(-d // T) * T
    B = 1024
    n_pad = -(-n // B) * B
    print(f"n={n} d={d} R={R} Q={Q} T={T} interpret={interpret}",
          file=sys.stderr)

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
        jax.device_put(qt_h), ce, ve, B, T, interpret=interpret
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

    # pipelined timing (same methodology as suite.py)
    qts = [jax.device_put(mkq()[1]) for _ in range(8)]
    jax.block_until_ready(qts)
    _ = np.asarray(vmem_tiled_dots(qts[0], ce, ve, B, T)[0, 0])  # warm
    t0 = time.perf_counter()
    outs = [vmem_tiled_dots(qq, ce, ve, B, T) for qq in qts]
    _ = np.asarray(outs[-1][0, 0])
    dt = (time.perf_counter() - t0) / len(qts)
    print(f"dots-only: {dt*1e3:.1f} ms/batch -> {Q/dt:.0f} QPS-equivalent "
          "(ELL baseline incl. top-k: 1146)", file=sys.stderr)


if __name__ == "__main__":
    main()
