"""Bisect the paf gather pathology: computed-indices vs input-indices,
sliced operand vs contiguous operand, optimization_barrier, one-hot."""
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

B, H, W = 16, 128, 208
cfg = PostProcessConfig()
KA = min(cfg.assoc_peaks, cfg.max_peaks)
pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
L, S = len(PAF_VECTOR), 25

rng = np.random.RandomState(0)
kpt = jnp.asarray(rng.rand(B, 15, H, W).astype(np.float32))
paf = jnp.asarray(rng.rand(B, 28, H, W).astype(np.float32) - 0.5)

nms_full = jax.jit(jax.vmap(lambda h: extract_peaks(
    h, max_peaks=cfg.max_peaks, threshold=cfg.nms_threshold)))
peaks = nms_full(kpt)
peaks_t = jax.block_until_ready(jax.jit(lambda p: Peaks(
    xy=p.xy[:, :, :KA], score=p.score[:, :, :KA],
    count=jnp.minimum(p.count, KA)))(peaks))


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


def indices_from_peaks(pk_xy):
    src_xy = pk_xy[pairs[:, 0]]
    dst_xy = pk_xy[pairs[:, 1]]
    a = src_xy[:, :, None, :]
    b = dst_xy[:, None, :, :]
    vec = b - a
    vmax = jnp.maximum(jnp.abs(vec[..., 0]), jnp.abs(vec[..., 1]))
    n_pts = jnp.clip(jnp.floor(jnp.sqrt(5.0 * vmax) + 0.5), 5, S)
    lm = jnp.arange(S, dtype=jnp.float32)
    step = vec[..., None, :] / n_pts[..., None, None]
    pos = a[..., None, :] + lm[None, None, None, :, None] * step
    px = jnp.clip(jnp.floor(pos[..., 0] + 0.5), 0, W - 1).astype(jnp.int32)
    py = jnp.clip(jnp.floor(pos[..., 1] + 0.5), 0, H - 1).astype(jnp.int32)
    return py * W + px


def do_gather(pf, flat_idx):
    paf_x = pf[0::2].reshape(L, H * W)
    paf_y = pf[1::2].reshape(L, H * W)
    take = jax.vmap(lambda m, i: jnp.take(m, i, axis=0))
    mx = take(paf_x, flat_idx.reshape(L, -1)).reshape(L, KA, KA, S)
    my = take(paf_y, flat_idx.reshape(L, -1)).reshape(L, KA, KA, S)
    return mx, my


# precompute real indices on device
idx_real = jax.block_until_ready(
    jax.jit(jax.vmap(lambda p: indices_from_peaks(p.xy)))(peaks_t))

# g1: real indices as INPUT, real sliced operand
timeit("g1_inputidx_slicedop",
       jax.jit(jax.vmap(do_gather)), paf, idx_real)

# g2: computed indices, gather from contiguous operand
pafc = jax.block_until_ready(jax.jit(
    lambda p: jnp.stack([p[:, 0::2].reshape(B, L, H * W),
                         p[:, 1::2].reshape(B, L, H * W)], 0))(paf))


@jax.jit
def g2(pxy, pk):
    def one(mxy_x, mxy_y, p):
        fi = indices_from_peaks(p.xy).reshape(L, -1)
        take = jax.vmap(lambda m, i: jnp.take(m, i, axis=0))
        return take(mxy_x, fi), take(mxy_y, fi)
    return jax.vmap(one)(pxy[0], pxy[1], pk)

timeit("g2_compidx_contigop", g2, pafc, peaks_t)


# g3: computed indices + barrier before gather
@jax.jit
def g3(pf, pk):
    def one(pfi, p):
        fi = indices_from_peaks(p.xy)
        fi = jax.lax.optimization_barrier(fi)
        return do_gather(pfi, fi)
    return jax.vmap(one)(pf, pk)

timeit("g3_compidx_barrier", g3, paf, peaks_t)


# g4: computed indices from an INPUT xy (no NMS upstream in program)
xy_in = jax.block_until_ready(jax.jit(lambda p: p.xy)(peaks_t))


@jax.jit
def g4(pf, xy):
    def one(pfi, x):
        fi = indices_from_peaks(x)
        return do_gather(pfi, fi)
    return jax.vmap(one)(pf, xy)

timeit("g4_compidx_inputxy", g4, paf, xy_in)
