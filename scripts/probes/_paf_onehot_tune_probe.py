"""Tune the one-hot PAF sampler: current vs concat-matmul vs chunked scan."""
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
from smap_tpu.ops.paf import paf_scores, _split_bf16x3

B, H, W = 16, 128, 208
cfg = PostProcessConfig()
KA = min(cfg.assoc_peaks, cfg.max_peaks)
pairs = jnp.asarray(PAF_VECTOR, jnp.int32)
L, S = len(PAF_VECTOR), 25

rng = np.random.RandomState(0)
kpt = jnp.asarray(rng.rand(B, 15, H, W).astype(np.float32))
paf = jnp.asarray(rng.rand(B, 28, H, W).astype(np.float32) - 0.5)

peaks = jax.jit(jax.vmap(lambda h: extract_peaks(
    h, max_peaks=cfg.max_peaks, threshold=cfg.nms_threshold)))(kpt)
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
    print(f"{name}: {np.median(ts)*1e3:.1f} ms (min {min(ts)*1e3:.1f})",
          flush=True)
    return out


# baseline: current lib implementation (impl=onehot)
lib_fn = jax.jit(jax.vmap(lambda pf, pk: paf_scores(pf, pk, pairs,
                                                    impl="onehot")))
base = timeit("lib_onehot", lib_fn, paf, peaks_t)


def positions(pk_xy):
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
    return px, py


def make_concat(chunk):
    @jax.jit
    def run(pf, pk):
        def one(pfi, p):
            px, py = positions(p.xy)
            paf_x = pfi[0::2]                      # [L, H, W]
            paf_y = pfi[1::2]
            xh, xm, xl = _split_bf16x3(paf_x)
            yh, ym, yl = _split_bf16x3(paf_y)
            # [L, 3H, 2W]: bf16 parts stacked on H, x/y maps stacked on W
            m3 = jnp.concatenate([
                jnp.concatenate([xh, yh], axis=-1),
                jnp.concatenate([xm, ym], axis=-1),
                jnp.concatenate([xl, yl], axis=-1)], axis=1)
            P = KA * KA
            pys = py.reshape(L, P, S)
            pxs = px.reshape(L, P, S)

            def step_fn(_, s0):
                sel = jax.lax.dynamic_slice_in_dim(
                    jnp.arange(S), 0, chunk)  # placeholder, not used
                del sel
                ss = jax.lax.dynamic_slice_in_dim(pys, s0, chunk, axis=2)
                xx = jax.lax.dynamic_slice_in_dim(pxs, s0, chunk, axis=2)
                pyc = ss.reshape(L, P * chunk)
                pxc = xx.reshape(L, P * chunk)
                oy = jax.nn.one_hot(pyc, H, dtype=jnp.bfloat16)  # [L,Pc,H]
                oy3 = jnp.concatenate([oy, oy, oy], axis=-1)     # [L,Pc,3H]
                rows = jnp.einsum("lph,lhw->lpw", oy3, m3,
                                  preferred_element_type=jnp.float32)
                ox = jax.nn.one_hot(pxc, W, dtype=jnp.float32)   # [L,Pc,W]
                vx = jnp.sum(rows[..., :W] * ox, axis=-1)
                vy = jnp.sum(rows[..., W:] * ox, axis=-1)
                return _, (vx, vy)

            n_chunks = S // chunk
            _, (vxs, vys) = jax.lax.scan(
                step_fn, 0, jnp.arange(n_chunks) * chunk)
            # [C, L, P*chunk] -> [L, K, K, S]
            vxs = jnp.moveaxis(vxs, 0, -1).reshape(L, P, chunk, n_chunks)
            mx = jnp.swapaxes(vxs, -1, -2).reshape(L, KA, KA, S)
            vys = jnp.moveaxis(vys, 0, -1).reshape(L, P, chunk, n_chunks)
            my = jnp.swapaxes(vys, -1, -2).reshape(L, KA, KA, S)
            return mx, my
        return jax.vmap(one)(pf, pk)
    return run


r1 = timeit("concat_chunk1", make_concat(1), paf, peaks_t)
r5 = timeit("concat_chunk5", make_concat(5), paf, peaks_t)
r25 = timeit("concat_chunk25", make_concat(25), paf, peaks_t)
