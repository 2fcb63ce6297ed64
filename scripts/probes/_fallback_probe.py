import time

import jax
import jax.numpy as jnp

from smap_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, C = 16, 64, 104, 256
x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (C, C), jnp.bfloat16) * 0.02
gflop = 2 * B * H * W * C * C / 1e9


def bench(name, f, *args):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name}: {dt*1000:.1f} ms  {gflop/dt/1000:.2f} TFLOPS", flush=True)


@jax.jit
def plain_einsum(x, w):
    return jnp.einsum("bhwc,cd->bhwd", x, w,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


@jax.jit
def reshaped_matmul(x, w):
    y = x.reshape(-1, C) @ w
    return y.reshape(B, H, W, C)


@jax.jit
def pad_then_matmul(x, w):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patch = jax.lax.slice(xp, (0, 0, 0, 0), (B, H, W, C))
    y = patch.reshape(-1, C) @ w
    return y.reshape(B, H, W, C)


@jax.jit
def scan_matmul(x, w):
    def body(c, _):
        y = (c.reshape(-1, C) @ w).reshape(B, H, W, C)
        return jnp.maximum(y, 0), ()
    y, _ = jax.lax.scan(body, x, None, length=4)
    return y


bench("plain_einsum", plain_einsum, x, w)
bench("reshaped_matmul", reshaped_matmul, x, w)
bench("pad_then_matmul", pad_then_matmul, x, w)
bench("scan_matmul(x4)", scan_matmul, x, w)
