"""Probe: break paf_scores into sub-stages to find the real hot spot."""
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

B, H, W = 16, 128, 208
cfg = PostProcessConfig()
KA = min(cfg.assoc_peaks, cfg.max_peaks)
pairs = jnp.asarray(PAF_VECTOR, jnp.int32)

rng = np.random.RandomState(0)
kpt = jnp.asarray(rng.rand(B, 15, H, W).astype(np.float32))
paf = jnp.asarray(rng.rand(B, 28, H, W).astype(np.float32) - 0.5)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.1f} ms  (min {min(ts)*1e3:.1f})",
          flush=True)
    return out


nms_full = jax.jit(jax.vmap(lambda h: extract_peaks(
    h, max_peaks=cfg.max_peaks, threshold=cfg.nms_threshold)))
peaks = nms_full(kpt)
peaks_t = jax.jit(lambda p: Peaks(
    xy=p.xy[:, :, :KA], score=p.score[:, :, :KA],
    count=jnp.minimum(p.count, KA)))(peaks)
peaks_t = jax.block_until_ready(peaks_t)

# full paf_scores (as in postprocess)
paf_fn = jax.jit(jax.vmap(lambda pf, pk: paf_scores(pf, pk, pairs)))
timeit("paf_scores_full", paf_fn, paf, peaks_t)

L = len(PAF_VECTOR)
S = 25


def positions(pk_xy, pk_count):
    src_xy = pk_xy[pairs[:, 0]]
    dst_xy = pk_xy[pairs[:, 1]]
    a = src_xy[:, :, None, :]
    b = dst_xy[:, None, :, :]
    vec = b - a
    norm = jnp.sqrt(jnp.sum(vec * vec, axis=-1))
    vmax = jnp.maximum(jnp.abs(vec[..., 0]), jnp.abs(vec[..., 1]))
    n_pts = jnp.clip(jnp.floor(jnp.sqrt(5.0 * vmax) + 0.5), 5, S)
    unit = vec / jnp.maximum(norm, 1e-12)[..., None]
    lm = jnp.arange(S, dtype=jnp.float32)
    step = vec[..., None, :] / n_pts[..., None, None]
    pos = a[..., None, :] + lm[None, None, None, :, None] * step
    px = jnp.clip(jnp.floor(pos[..., 0] + 0.5), 0, W - 1).astype(jnp.int32)
    py = jnp.clip(jnp.floor(pos[..., 1] + 0.5), 0, H - 1).astype(jnp.int32)
    return px, py, unit, norm, n_pts


@jax.jit
def stage_positions(paf_, pk):
    return jax.vmap(lambda pf, p: positions(p.xy, p.count))(
        paf_, pk)

timeit("positions", stage_positions, paf, peaks_t)


@jax.jit
def stage_gather(paf_, pk):
    def one(pf, p):
        px, py, unit, norm, n_pts = positions(p.xy, p.count)
        flat_idx = py * W + px
        paf_x = pf[0::2].reshape(L, H * W)
        paf_y = pf[1::2].reshape(L, H * W)
        take = jax.vmap(lambda m, i: jnp.take(m, i, axis=0))
        mx = take(paf_x, flat_idx.reshape(L, -1)).reshape(L, KA, KA, S)
        my = take(paf_y, flat_idx.reshape(L, -1)).reshape(L, KA, KA, S)
        return mx, my
    return jax.vmap(one)(paf_, pk)

timeit("positions+gather", stage_gather, paf, peaks_t)
