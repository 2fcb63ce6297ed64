"""Probe: per-stage postproc timings on TPU with the top_k NMS rewrite.

Times each postprocessing stage as its own jit at batch 16, 512x832 maps
(128x208 outputs), worst-case peak counts, plus the combined postprocess jit.
"""
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

rng = np.random.RandomState(0)
# Dense noise -> many peaks (worst case)
kpt = jnp.asarray(rng.rand(B, 15, H, W).astype(np.float32))
paf = jnp.asarray(rng.rand(B, 28, H, W).astype(np.float32) - 0.5)
rdm = jnp.asarray(rng.rand(B, H, W).astype(np.float32) * 5)
pairs = jnp.asarray(PAF_VECTOR, jnp.int32)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.1f} ms", flush=True)
    return out


nms_full = jax.jit(jax.vmap(lambda h: extract_peaks(
    h, max_peaks=cfg.max_peaks, threshold=cfg.nms_threshold)))
peaks = timeit("nms(top_k,127)", nms_full, kpt)

# truncate to assoc capacity
trunc = jax.jit(lambda p: Peaks(xy=p.xy[:, :, :KA], score=p.score[:, :, :KA],
                                count=jnp.minimum(p.count, KA)))
peaks_t = trunc(peaks)

paf_fn = jax.jit(jax.vmap(lambda pf, pk: paf_scores(pf, pk, pairs)))
table = timeit(f"paf_scores(K={KA})", paf_fn, paf, peaks_t)

assoc_fn = jax.jit(jax.vmap(lambda pk, tb, rd: associate(pk, tb, rd)))
bodies = timeit("associate", assoc_fn, peaks_t, table, rdm)

# full postprocess
out2d = jnp.asarray(rng.rand(B, H, W, 43).astype(np.float32) * 255)
out3d = jnp.asarray(rng.rand(B, H, W, 14).astype(np.float32))
outrd = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))
info = ScaleInfo(*[jnp.full((B,), v, jnp.float32)
                   for v in (0.433, 1920., 1080., 1500., 1500., 960., 540.)])
pp = jax.jit(lambda a, b, c, s: postprocess_batch(a, b, c, s, cfg))
timeit("postprocess_full", pp, out2d, out3d, outrd, info)
