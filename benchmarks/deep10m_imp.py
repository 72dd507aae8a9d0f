"""Same-session deep10m measurement of the imp-first fold gate
(VERDICT r3 #8): `merge="rounds_imp"`/`"pool_imp"` run a 2-ops/elem
improvement-count pass first and gate the full ~5-pass lane fold on
`max(imp) > 0`, so mid-scan blocks with no top-k improvement cost ~2
VPU passes instead of ~5.

Measures, in ONE process (same tunnel session, so ratios are valid):
  rounds      br=8192 qt=128   (the r3 tuned deferred-scale baseline)
  rounds_imp  br=8192 qt=128
  pool        br=2048 qt=128   (pool's loop carries spill VMEM at 8192)
  pool_imp    br=2048 qt=128

Discipline per CLAUDE.md: single-launch-time every config BEFORE the
pipelined measurement (silent VMEM-spill cliffs are ~100x).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def put_chunked(arr, max_bytes=256 << 20):
    import jax.numpy as jnp  # noqa: F811

    chunk = max(1, max_bytes // max(1, arr[0:1].nbytes))
    if arr.shape[0] <= chunk:
        out = jax.device_put(arr)
        jax.block_until_ready(out)
        return out
    parts = []
    for s0 in range(0, arr.shape[0], chunk):
        p = jax.device_put(arr[s0 : s0 + chunk])
        jax.block_until_ready(p)
        parts.append(p)
    out = jnp.concatenate(parts)
    jax.block_until_ready(out)
    return out


def main():
    from metrovector_tpu.format.constants import DistanceMetric
    from metrovector_tpu.ops.topk_kernel import fused_topk
    from metrovector_tpu.utils import enable_compilation_cache

    cache = enable_compilation_cache()
    log("compile cache:", cache)
    log("backend:", jax.default_backend())

    rng = np.random.default_rng(4)
    n, d, k, qb = 10_000_000, 96, 10, 128
    pd = 128
    codes = np.zeros((n, pd), np.int8)
    codes[:, :d] = rng.integers(-128, 128, (n, d)).astype(np.int8)
    sc = 0.02
    norms = ((codes.astype(np.float32) * sc) ** 2).sum(1)
    log("uploading corpus (1.28 GB, chunked)...")
    db_d = put_chunked(codes)
    norms_d = jax.device_put(norms)
    jax.block_until_ready(norms_d)
    log("corpus resident")

    def mk():
        q = np.zeros((qb, pd), np.int8)
        q[:, :d] = rng.integers(-128, 128, (qb, d)).astype(np.int8)
        return q

    # oracle for recall gate (4-query subsample)
    qc = mk()[:4]
    dots = qc[:, :d].astype(np.float64) @ codes[:, :d].T.astype(np.float64)
    oracle_idx = np.argsort(-dots, 1, kind="stable")[:, :k]

    configs = [
        ("rounds", dict(block_rows=8192, query_tile=128, merge="rounds")),
        ("rounds_imp", dict(block_rows=8192, query_tile=128,
                            merge="rounds_imp")),
        ("pool", dict(block_rows=2048, query_tile=128, merge="pool")),
        ("pool_imp", dict(block_rows=2048, query_tile=128,
                          merge="pool_imp")),
    ]

    def runner(cfg):
        def run(q):
            return fused_topk(q, db_d, norms_d, np.int32(n), k,
                              DistanceMetric.INNER_PRODUCT,
                              scale=sc * sc, **cfg)
        return run

    for name, cfg in configs:
        run = runner(cfg)
        # correctness + warm compile
        got = np.asarray(run(jax.device_put(qc))[1])
        hit = np.mean([
            len(set(got[i, :k].tolist()) & set(oracle_idx[i].tolist())) / k
            for i in range(4)
        ])
        # warm the measurement batch shape (the correctness run above is
        # batch-4 — a different jit cache entry), then single-launch time
        qd = jax.device_put(mk())
        jax.block_until_ready(qd)
        _ = np.asarray(run(qd)[0][0, 0])
        t0 = time.perf_counter()
        _ = np.asarray(run(qd)[0][0, 0])
        single = time.perf_counter() - t0
        log(f"{name}: recall={hit:.3f} single-launch {single*1e3:.1f} ms")
        if single > 0.5:
            log(f"{name}: CLIFF (>{single:.2f}s) — skipping pipelined run")
            print(f'{{"config": "{name}", "cliff_s": {single:.3f}}}')
            continue
        # pipelined measurement over distinct pre-uploaded inputs
        qs = [jax.device_put(mk()) for _ in range(10)]
        jax.block_until_ready(qs)
        t0 = time.perf_counter()
        outs = [run(q) for q in qs]
        _ = np.asarray(outs[-1][0][0, 0])
        dt = (time.perf_counter() - t0) / len(qs)
        print(f'{{"config": "{name}", "ms_batch": {dt*1e3:.2f}, '
              f'"qps": {qb/dt:.0f}, "recall": {hit:.3f}}}', flush=True)


if __name__ == "__main__":
    main()
