"""Time associate scan vs pallas and full postprocess (auto impl) on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from smap_tpu.config import PAF_VECTOR, PostProcessConfig
from smap_tpu.ops.nms import extract_peaks, Peaks
from smap_tpu.ops.paf import paf_scores
from smap_tpu.ops.association import associate
from smap_tpu.ops.postprocess import postprocess_batch, ScaleInfo

B, H, W = 16, 128, 208
cfg = PostProcessConfig()
KA = min(cfg.assoc_peaks, cfg.max_peaks)
pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
rng = np.random.RandomState(0)
kpt = jnp.asarray(rng.rand(B, 15, H, W).astype(np.float32))
paf = jnp.asarray(rng.rand(B, 28, H, W).astype(np.float32) - 0.5)
rdm = jnp.asarray(rng.rand(B, H, W).astype(np.float32) * 5)

peaks = jax.jit(jax.vmap(lambda h: extract_peaks(
    h, max_peaks=cfg.max_peaks, threshold=cfg.nms_threshold)))(kpt)
peaks_t = jax.jit(lambda p: Peaks(
    xy=p.xy[:, :, :KA], score=p.score[:, :, :KA],
    count=jnp.minimum(p.count, KA)))(peaks)
table = jax.block_until_ready(jax.jit(jax.vmap(
    lambda pf, pk: paf_scores(pf, pk, pairs)))(paf, peaks_t))


def timeit(name, fn, *a):
    out = jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.1f} ms", flush=True)
    return out


ref = None
for impl in ("scan", "pallas"):
    f = jax.jit(jax.vmap(
        lambda pk, tb, rd, i=impl: associate(pk, tb, rd, impl=i)))
    r = timeit(f"associate_{impl}", f, peaks_t, table, rdm)
    if impl == "scan":
        ref = r
    else:
        print("parity:",
              np.array_equal(np.asarray(ref.joints), np.asarray(r.joints)),
              flush=True)

out2d = jnp.asarray(rng.rand(B, H, W, 43).astype(np.float32) * 255)
out3d = jnp.asarray(rng.rand(B, H, W, 14).astype(np.float32))
outrd = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
info = ScaleInfo(*[jnp.full((B,), v, jnp.float32)
                   for v in (0.433, 1920., 1080., 1500., 1500., 960., 540.)])
pp = jax.jit(lambda a, b, c, s: postprocess_batch(a, b, c, s, cfg))
timeit("postprocess_full_auto", pp, out2d, out3d, outrd, info)
