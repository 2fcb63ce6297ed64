"""Compile the existing pallas kernels on the real TPU (Mosaic lowering)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from smap_tpu.ops.pallas_kernels import associate_limb

print("backend:", jax.default_backend(), flush=True)

K = 40
rng = np.random.RandomState(0)
table = jnp.asarray(rng.rand(K, K).astype(np.float32) * 2 - 1)
src_xy = jnp.asarray(rng.rand(K, 2).astype(np.float32) * 100)
src_score = jnp.asarray(rng.rand(K).astype(np.float32))
dst_xy = jnp.asarray(rng.rand(K, 2).astype(np.float32) * 100)
bone_dist = jnp.asarray(rng.rand(K).astype(np.float32) * 50 + 10)
pv = jnp.asarray(np.arange(K) < 7)
dv = jnp.asarray(np.arange(K) < 9)

try:
    out = jax.block_until_ready(
        jax.jit(lambda *a: associate_limb(*a))(
            table, src_xy, src_score, dst_xy, bone_dist, pv, dv))
    print("associate_limb compiled OK:", np.asarray(out)[:10], flush=True)
    ref = np.asarray(associate_limb(table, src_xy, src_score, dst_xy,
                                    bone_dist, pv, dv, interpret=True))
    print("matches interpret:", np.array_equal(np.asarray(out), ref),
          flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.jit(lambda *a: associate_limb(*a))(
            table, src_xy, src_score, dst_xy, bone_dist, pv, dv))
        ts.append(time.perf_counter() - t0)
    print(f"associate_limb: {np.median(ts)*1e3:.2f} ms", flush=True)
except Exception as e:
    print("associate_limb FAILED:", type(e).__name__, str(e)[:2000],
          flush=True)
