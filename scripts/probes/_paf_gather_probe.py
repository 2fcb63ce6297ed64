"""Probe: PAF sample-gather strategies on TPU.

The paf_scores hot spot is gathering 14x40x40x25 map samples per image
(scalar gather from [L, HW]). Compare:
  a) current: vmapped jnp.take per limb
  b) one flat gather per image from [L*HW]
  c) one-hot matmul (bf16), scan over samples
  d) one-hot matmul, f32 HIGHEST precision
Also isolate the non-gather part of paf_scores.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, L, K, S, H, W = 16, 14, 40, 25, 128, 208
HW = H * W

rng = np.random.RandomState(0)
paf_x = jnp.asarray(rng.randn(B, L, HW).astype(np.float32))
paf_y = jnp.asarray(rng.randn(B, L, HW).astype(np.float32))
idx = jnp.asarray(rng.randint(0, HW, (B, L, K, K, S)).astype(np.int32))


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.1f} ms", flush=True)
    return out


@jax.jit
def variant_a(px, py, i):
    def one(mx, my, ii):
        take = jax.vmap(lambda m, j: jnp.take(m, j, axis=0))
        f = ii.reshape(L, -1)
        return take(mx, f).reshape(L, K, K, S), take(my, f).reshape(L, K, K, S)
    return jax.vmap(one)(px, py, i)


@jax.jit
def variant_b(px, py, i):
    def one(mx, my, ii):
        base = jnp.arange(L, dtype=jnp.int32)[:, None, None, None] * HW
        flat = (ii + base).reshape(-1)
        return (jnp.take(mx.reshape(-1), flat).reshape(L, K, K, S),
                jnp.take(my.reshape(-1), flat).reshape(L, K, K, S))
    return jax.vmap(one)(px, py, i)


def _onehot_sample(mx2d, my2d, pys, pxs, dtype):
    # mx2d: [L, H, W]; pys/pxs: [L, K*K] one sample's integer coords
    oy = jax.nn.one_hot(pys, H, dtype=dtype)            # [L, P, H]
    ox = jax.nn.one_hot(pxs, W, dtype=dtype)            # [L, P, W]
    rowx = jnp.einsum("lph,lhw->lpw", oy, mx2d.astype(dtype))
    rowy = jnp.einsum("lph,lhw->lpw", oy, my2d.astype(dtype))
    vx = jnp.sum(rowx * ox, axis=-1)
    vy = jnp.sum(rowy * ox, axis=-1)
    return vx.astype(jnp.float32), vy.astype(jnp.float32)


def make_onehot(dtype, precision):
    @jax.jit
    def run(px, py, i):
        def one(mx, my, ii):
            mx2 = mx.reshape(L, H, W)
            my2 = my.reshape(L, H, W)
            pys = (ii // W).reshape(L, K * K, S)
            pxs = (ii % W).reshape(L, K * K, S)

            def body(_, s):
                with jax.default_matmul_precision(precision):
                    vx, vy = _onehot_sample(mx2, my2, pys[..., s], pxs[..., s],
                                            dtype)
                return _, (vx, vy)
            _, (vxs, vys) = jax.lax.scan(body, 0, jnp.arange(S))
            # [S, L, P] -> [L, K, K, S]
            vxs = jnp.moveaxis(vxs, 0, -1).reshape(L, K, K, S)
            vys = jnp.moveaxis(vys, 0, -1).reshape(L, K, K, S)
            return vxs, vys
        return jax.vmap(one)(px, py, i)
    return run


ra = timeit("a_vmapped_take", variant_a, paf_x, paf_y, idx)
rb = timeit("b_flat_take", variant_b, paf_x, paf_y, idx)
rc = timeit("c_onehot_bf16", make_onehot(jnp.bfloat16, "bfloat16"),
            paf_x, paf_y, idx)
rd = timeit("d_onehot_f32_highest", make_onehot(jnp.float32, "highest"),
            paf_x, paf_y, idx)

for name, r in [("b", rb), ("c", rc), ("d", rd)]:
    err = float(jnp.max(jnp.abs(r[0] - ra[0])))
    print(f"max_abs_err[{name}] = {err:.3e}", flush=True)
