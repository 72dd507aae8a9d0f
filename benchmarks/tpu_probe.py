"""Tiny TPU tunnel health probe: upload, matmul, read back, time it."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)
x = np.random.default_rng(0).standard_normal((512, 512)).astype(np.float32)
t0 = time.perf_counter()
xd = jax.device_put(x)
jax.block_until_ready(xd)
t1 = time.perf_counter()
y = jnp.dot(xd, xd)
r = np.asarray(y)
t2 = time.perf_counter()
print(f"upload {t1-t0:.2f}s matmul+readback {t2-t1:.2f}s sum={r.sum():.3e}",
      file=sys.stderr)
