"""Probe: do the Pallas kernels compile under the real Mosaic TPU lowering,
and how do they time vs the pure-XLA equivalents? (VERDICT round-2 item 3)

Writes raw output; run standalone on the TPU runtime.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

from smap_tpu.ops import pallas_kernels as pk
from smap_tpu.ops.nms import extract_peaks

C, H, W = 15, 128, 208
rng = np.random.RandomState(0)
hm = jnp.asarray(rng.rand(C, H, W).astype(np.float32))


def timeit(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3, out


# 1. nms_fields compiled
try:
    f = jax.jit(lambda x: pk.nms_fields(x))
    ms, out = timeit(f, hm)
    print(f"nms_fields COMPILED OK  {ms:.2f} ms", flush=True)
except Exception as e:
    print(f"nms_fields FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)

# 2. associate_limb compiled
K = 40
try:
    table = jnp.asarray(rng.rand(K, K).astype(np.float32))
    sxy = jnp.asarray(rng.rand(K, 2).astype(np.float32) * 100)
    ssc = jnp.asarray(rng.rand(K).astype(np.float32))
    dxy = jnp.asarray(rng.rand(K, 2).astype(np.float32) * 100)
    bd = jnp.asarray(rng.rand(K).astype(np.float32) * 50)
    pv = jnp.asarray(np.arange(K) < 7)
    dv = jnp.asarray(np.arange(K) < 11)
    g = jax.jit(lambda *a: pk.associate_limb(*a))
    ms, out = timeit(g, table, sxy, ssc, dxy, bd, pv, dv)
    print(f"associate_limb COMPILED OK  {ms:.2f} ms", flush=True)
except Exception as e:
    print(f"associate_limb FAILED: {type(e).__name__}: {str(e)[:500]}",
          flush=True)

# 3. XLA extract_peaks for comparison
e = jax.jit(lambda x: extract_peaks(x, max_peaks=127))
ms, out = timeit(e, hm)
print(f"xla extract_peaks (1 img, C=15) {ms:.2f} ms", flush=True)

# batched like the bench (16 images)
hmb = jnp.asarray(rng.rand(16, C, H, W).astype(np.float32))
eb = jax.jit(jax.vmap(lambda x: extract_peaks(x, max_peaks=127)))
ms, out = timeit(eb, hmb)
print(f"xla extract_peaks (batch 16)   {ms:.2f} ms", flush=True)
