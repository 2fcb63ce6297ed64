import time

import jax
import jax.numpy as jnp

from smap_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def conv_stack(n, ch, h, w, k=3):
    wkey = jax.random.PRNGKey(0)
    weights = jax.random.normal(wkey, (k, k, ch, ch), jnp.bfloat16) * 0.01

    @jax.jit
    def f(x):
        def body(x, _):
            y = jax.lax.conv_general_dilated(
                x, weights, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y, 0), ()
        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x)

    return f


for n, ch, h, w in [(20, 256, 64, 104), (20, 64, 128, 208)]:
    f = conv_stack(n, ch, h, w)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, h, w, ch), jnp.bfloat16)
    r = float(f(x))
    t0 = time.perf_counter()
    for _ in range(3):
        r = float(f(x))
    dt = (time.perf_counter() - t0) / 3
    gflop = 2 * 9 * ch * ch * h * w * 16 * n / 1e9
    print(f"conv n={n} ch={ch} {h}x{w}: {dt*1000:.0f} ms/call "
          f"{gflop/dt/1000:.2f} TFLOPS", flush=True)
