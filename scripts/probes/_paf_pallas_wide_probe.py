"""Compile + validate the Pallas PAF sampling kernel at the full 127-peak
capacity (the overflow/adaptive-escalation path: P = 127^2 = 16129 pairs,
non-128-aligned chunk tail) on the real TPU, against impl="onehot"."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from smap_tpu.config import PAF_VECTOR
from smap_tpu.ops.nms import extract_peaks
from smap_tpu.ops.paf import paf_scores

print("backend:", jax.default_backend(), flush=True)

B, H, W = 16, 128, 208
K = 127
rng = np.random.RandomState(0)
hm = jnp.asarray(rng.rand(B, 15, H, W).astype(np.float32))
paf = jnp.asarray(rng.rand(B, 28, H, W).astype(np.float32) - 0.5)
pairs = jnp.asarray(PAF_VECTOR, jnp.int32)

nms = jax.jit(jax.vmap(lambda h: extract_peaks(h, max_peaks=K)))
peaks = jax.block_until_ready(nms(hm))
print("max count:", int(jnp.max(peaks.count)), flush=True)


def run(impl):
    fn = jax.jit(jax.vmap(lambda pf, pk: paf_scores(pf, pk, pairs,
                                                    impl=impl)))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(paf, peaks))
    print(f"{impl}: compile+first {time.perf_counter()-t0:.1f} s",
          flush=True)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(paf, peaks))
        ts.append(time.perf_counter() - t0)
    print(f"{impl}: {np.median(ts)*1e3:.1f} ms", flush=True)
    return np.asarray(out)


try:
    a = run("pallas")
    b = run("onehot")
    print("max diff pallas vs onehot:", np.abs(a - b).max(), flush=True)
except Exception as e:
    print("FAILED:", type(e).__name__, str(e)[:3000], flush=True)
