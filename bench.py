"""Benchmark harness: exact top-10 search QPS/chip on a SIFT1M-scale corpus.

Prints ONE JSON line:
``{"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ...}``.

Workload = the repo's north-star config (BASELINE.json): 1M × 128-d f32
corpus (integer-valued, SIFT-style), L2 metric, exact top-10, corpus
resident in one chip's HBM, full f32 (HIGHEST) matmul precision.

Methodology: batches of distinct pre-uploaded queries are launched
back-to-back and only the final result is read back, so the measurement is
device execution throughput, not host↔device tunnel RTT (in this dev
environment the TPU sits behind a relay whose per-readback RTT is ~30 ms
and whose sync without readback can under-report; pipelined launches with
one trailing readback are the honest middle). Recall@10 is validated
against an independent float64 NumPy oracle — the result is zeroed if
recall < 1.0, so the number can never come from an approximate shortcut.

The reference publishes no search QPS at all (its README numbers are
host-side mmap read throughput, README.md:142-147); the driver-defined
baseline is 10k QPS/chip.

Env knobs: MVT_BENCH_N (corpus rows, default 1_000_000), MVT_BENCH_ITERS
(timed launches per batch size, default 30), MVT_BENCH_BATCHES
(comma-separated batch sizes, default "32,64,128,256").
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from metrovector_tpu.format.constants import DistanceMetric
    from metrovector_tpu.ops.topk_kernel import fused_topk
    from metrovector_tpu.utils import enable_compilation_cache

    # Persistent compile cache: identical shapes in a later process load
    # the serialized executable instead of recompiling (the r3 cold start
    # was 223 s). Opt out with MVT_COMPILE_CACHE=off.
    cache_dir = enable_compilation_cache()
    if cache_dir:
        log(f"compilation cache: {cache_dir}")

    backend = jax.default_backend()
    interpret = backend != "tpu"
    n = int(os.environ.get("MVT_BENCH_N", 1_000_000))
    d = 128
    k = 10
    iters = int(os.environ.get("MVT_BENCH_ITERS", 30))
    batches = [
        int(b) for b in os.environ.get("MVT_BENCH_BATCHES", "32,64,128,256").split(",")
    ]
    if interpret:
        # CPU smoke configuration: the Pallas interpreter is ~10^3× slower.
        n = min(n, 20_000)
        iters = min(iters, 3)
        batches = batches[:1]
    log(f"backend={backend} n={n} d={d} iters={iters} batches={batches}")

    rng = np.random.default_rng(7)
    db = rng.integers(0, 256, size=(n, d)).astype(np.float32)
    norms = np.einsum("ij,ij->i", db, db, dtype=np.float64).astype(np.float32)
    # chunked upload (≤256 MB pieces + on-device concat): single
    # multi-GB device_puts have wedged this dev environment's loopback
    # relay mid-handshake (r3 session); small pieces are gentle and the
    # transient 2× allocation is trivial at this corpus size
    import jax.numpy as jnp

    chunk = max(1, (256 << 20) // (db.shape[1] * 4))
    if n > chunk:
        parts = []
        for s in range(0, n, chunk):
            p = jax.device_put(db[s : s + chunk])
            jax.block_until_ready(p)
            parts.append(p)
        db_dev = jnp.concatenate(parts)
        del parts
    else:
        db_dev = jax.device_put(db)
    norms_dev = jax.device_put(norms)
    jax.block_until_ready((db_dev, norms_dev))
    nvalid = np.int32(n)

    def run(q):
        return fused_topk(
            q, db_dev, norms_dev, nvalid, k, DistanceMetric.L2,
            interpret=interpret,
        )

    # Recall gate: one batch vs the f64 oracle.
    qcheck = rng.integers(0, 256, size=(32, d)).astype(np.float32)
    t0 = time.perf_counter()
    got = np.asarray(run(jax.device_put(qcheck))[1])
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")
    d2 = norms.astype(np.float64)[None, :] - 2.0 * (
        qcheck.astype(np.float64) @ db.T.astype(np.float64)
    )
    oracle_idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    recall = float(
        np.mean([len(set(got[r]) & set(oracle_idx[r])) / k for r in range(32)])
    )
    log(f"recall@10 = {recall:.4f}")

    best = {"qps": 0.0, "batch": 0, "ms": 0.0}
    for qb in batches:
        qs = [
            jax.device_put(rng.integers(0, 256, (qb, d)).astype(np.float32))
            for _ in range(iters)
        ]
        jax.block_until_ready(qs)
        _ = np.asarray(run(qs[0])[1])  # warm this batch shape
        t0 = time.perf_counter()
        outs = [run(q) for q in qs]
        _ = np.asarray(outs[-1][1])  # trailing readback fences the pipeline
        dt = (time.perf_counter() - t0) / iters
        qps = qb / dt
        log(f"batch={qb}: {dt * 1e3:.2f} ms/batch -> {qps:,.0f} QPS")
        if qps > best["qps"]:
            best = {"qps": qps, "batch": qb, "ms": dt * 1e3}

    target_qps = 10_000.0
    value = best["qps"] if recall >= 1.0 else 0.0
    print(
        json.dumps(
            {
                "metric": "exact top-10 L2 QPS/chip (SIFT1M-scale synthetic, "
                          f"n={n}, best batch={best['batch']} at "
                          f"{best['ms']:.2f}ms/batch, recall@10={recall:.3f}, "
                          f"f32 HIGHEST, backend={backend})",
                "value": round(value, 1),
                "unit": "qps",
                "vs_baseline": round(value / target_qps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
