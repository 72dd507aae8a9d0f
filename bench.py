"""Benchmark harness: exact top-10 search QPS/chip on a SIFT1M-scale corpus.

Prints ONE JSON line:
``{"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ...}``.

The workload matches the repo's north-star config (BASELINE.json): 1M × 128-d
f32 corpus, L2 metric, exact top-10, batched queries, corpus resident in one
chip's HBM. ``vs_baseline`` is QPS divided by the 10k-QPS/chip target.
Recall@10 is validated against an independent NumPy float oracle on a query
subsample — the run aborts (vs_baseline = 0) if recall < 1.0, so the number
can never come from an approximate shortcut.

The reference's own published numbers are host-side read-throughput claims
(README.md:142-147, measured by examples/large_dataset.rs); it publishes no
search QPS at all — SURVEY.md §6.

Env knobs: MVT_BENCH_N (corpus rows, default 1_000_000), MVT_BENCH_Q
(batch size, default 64), MVT_BENCH_ITERS (timed launches, default 50).
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

    backend = jax.default_backend()
    interpret = backend != "tpu"
    n = int(os.environ.get("MVT_BENCH_N", 1_000_000))
    d = 128
    qbatch = int(os.environ.get("MVT_BENCH_Q", 64))
    iters = int(os.environ.get("MVT_BENCH_ITERS", 50))
    k = 10
    if interpret:
        # CPU smoke configuration: the Pallas interpreter is ~10^3× slower.
        n = min(n, 20_000)
        iters = min(iters, 3)
    log(f"backend={backend} n={n} d={d} qbatch={qbatch} iters={iters}")

    rng = np.random.default_rng(7)
    # SIFT-like: non-negative int-valued features stored as f32.
    db = rng.integers(0, 256, size=(n, d)).astype(np.float32)
    queries = rng.integers(0, 256, size=(qbatch, d)).astype(np.float32)
    norms = np.einsum("ij,ij->i", db, db, dtype=np.float64).astype(np.float32)

    db_dev = jax.device_put(db)
    norms_dev = jax.device_put(norms)
    q_dev = jax.device_put(queries)
    nvalid = np.int32(n)

    def run(q):
        return fused_topk(
            q, db_dev, norms_dev, nvalid, k, DistanceMetric.L2,
            interpret=interpret,
        )

    t0 = time.perf_counter()
    s, i = run(q_dev)
    jax.block_until_ready((s, i))
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")

    # Recall@10 == 1.0 against an independent float64 oracle.
    d2 = (
        norms.astype(np.float64)[None, :]
        - 2.0 * (queries.astype(np.float64) @ db.T.astype(np.float64))
    )
    oracle_idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    got = np.asarray(i)
    recall = np.mean(
        [len(set(got[r]) & set(oracle_idx[r])) / k for r in range(qbatch)]
    )
    log(f"recall@10 = {recall:.4f}")

    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s, i = run(q_dev)
        jax.block_until_ready((s, i))
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    p50 = float(np.percentile(lat, 50))
    qps = qbatch / p50
    log(f"p50 batch latency = {p50 * 1e3:.2f} ms  ->  {qps:,.0f} QPS/chip")

    target_qps = 10_000.0
    value = qps if recall >= 1.0 else 0.0
    print(
        json.dumps(
            {
                "metric": "exact top-10 L2 QPS/chip (SIFT1M-scale synthetic, "
                          f"n={n}, batch={qbatch}, recall@10={recall:.3f}, "
                          f"p50={p50 * 1e3:.2f}ms, backend={backend})",
                "value": round(value, 1),
                "unit": "qps",
                "vs_baseline": round(value / target_qps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
