"""Same gather code, random indices vs real-peak indices, interleaved."""
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
HW = H * W
cfg = PostProcessConfig()
KA = min(cfg.assoc_peaks, cfg.max_peaks)
pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
L, S = len(PAF_VECTOR), 25

rng = np.random.RandomState(0)
kpt = jnp.asarray(rng.rand(B, 15, H, W).astype(np.float32))
paf_x = jnp.asarray(rng.randn(B, L, HW).astype(np.float32))
paf_y = jnp.asarray(rng.randn(B, L, HW).astype(np.float32))
idx_rand = jnp.asarray(rng.randint(0, HW, (B, L, KA, KA, S)).astype(np.int32))

nms_full = jax.jit(jax.vmap(lambda h: extract_peaks(
    h, max_peaks=cfg.max_peaks, threshold=cfg.nms_threshold)))
peaks = nms_full(kpt)
peaks_t = jax.block_until_ready(jax.jit(lambda p: Peaks(
    xy=p.xy[:, :, :KA], score=p.score[:, :, :KA],
    count=jnp.minimum(p.count, KA)))(peaks))


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


idx_real = jax.block_until_ready(
    jax.jit(jax.vmap(lambda p: indices_from_peaks(p.xy)))(peaks_t))
idx_real = jnp.asarray(np.asarray(idx_real))  # fresh buffer, same values


@jax.jit
def gather(px, py, i):
    def one(mx, my, ii):
        take = jax.vmap(lambda m, j: jnp.take(m, j, axis=0))
        f = ii.reshape(L, -1)
        return (take(mx, f).reshape(L, KA, KA, S),
                take(my, f).reshape(L, KA, KA, S))
    return jax.vmap(one)(px, py, i)


def timeit(name, *args):
    out = jax.block_until_ready(gather(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jax.block_until_ready(gather(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.2f} ms (min {min(ts)*1e3:.2f})",
          flush=True)


for round_ in range(2):
    timeit(f"rand_idx[{round_}]", paf_x, paf_y, idx_rand)
    timeit(f"real_idx[{round_}]", paf_x, paf_y, idx_real)

# sorted real indices (raster-major) to test locality dependence
idx_sorted = jnp.sort(idx_real.reshape(B, L, -1), axis=-1).reshape(
    idx_real.shape)
timeit("real_idx_sorted", paf_x, paf_y, idx_sorted)
# constant indices (all zero)
timeit("zero_idx", paf_x, paf_y, jnp.zeros_like(idx_rand))
