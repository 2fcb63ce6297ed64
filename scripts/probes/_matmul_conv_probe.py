import time

import jax
import jax.numpy as jnp

from smap_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def conv3x3_as_matmuls(x, w):
    """x: [B, H, W, Cin]; w: [3, 3, Cin, Cout] -> SAME conv via 9 shifted
    matmuls accumulated in f32."""
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, wd, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (b, h, wd, cin))
            acc = acc + jnp.einsum(
                "bhwc,cd->bhwd", patch, w[dy, dx],
                preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def stack(n, ch, h, w):
    weights = jax.random.normal(jax.random.PRNGKey(0),
                                (3, 3, ch, ch), jnp.bfloat16) * 0.02

    @jax.jit
    def f(x):
        def body(x, _):
            y = conv3x3_as_matmuls(x, weights)
            return jnp.maximum(y, 0), ()
        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x)

    return f


for n, ch, h, w in [(20, 256, 64, 104), (20, 64, 128, 208)]:
    f = stack(n, ch, h, w)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, h, w, ch), jnp.bfloat16)
    r = float(f(x))
    t0 = time.perf_counter()
    for _ in range(3):
        r = float(f(x))
    dt = (time.perf_counter() - t0) / 3
    gflop = 2 * 9 * ch * ch * h * w * 16 * n / 1e9
    print(f"mmconv n={n} ch={ch} {h}x{w}: {dt*1000:.0f} ms/call "
          f"{gflop/dt/1000:.2f} TFLOPS", flush=True)
