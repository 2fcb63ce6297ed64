import time

import jax
import jax.numpy as jnp

B, H, W, C = 16, 64, 104, 256
M = B * H * W
gflop = 2 * M * C * C / 1e9
key = jax.random.PRNGKey(0)
a2 = jax.random.normal(key, (M, C), jnp.bfloat16)
a3 = a2.reshape(B, H * W, C)
a4 = a2.reshape(B, H, W, C)
w = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.02


def bench(name, f, *args):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name}: {dt*1000:.2f} ms  {gflop/dt/1000:.2f} TFLOPS", flush=True)


bench("2d mm", jax.jit(lambda a, w: a @ w), a2, w)
bench("2d mm+relu", jax.jit(lambda a, w: jnp.maximum(a @ w, 0)), a2, w)
bench("2d mm out-reshape",
      jax.jit(lambda a, w: (a @ w).reshape(B, H, W, C)), a2, w)
bench("4d in-reshape mm",
      jax.jit(lambda a, w: a.reshape(-1, C) @ w), a4, w)
bench("3d batched dot",
      jax.jit(lambda a, w: jnp.einsum("bmc,cd->bmd", a, w)), a3, w)
bench("2d mm f32acc",
      jax.jit(lambda a, w: jnp.dot(a, w, preferred_element_type=jnp.float32)),
      a2, w)
bench("2x chained 2d mm", jax.jit(lambda a, w: (a @ w) @ w), a2, w)
bench("elementwise 4d", jax.jit(lambda a: a * 2 + 1), a4)
