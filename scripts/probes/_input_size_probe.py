import time

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
C = 256
w3 = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.02


def make(n, h, w):
    @jax.jit
    def f_inputsize_probe(x):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, w3, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y, 0), ()
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y)
    return f_inputsize_probe


for h, w in [(64, 104), (96, 104), (128, 104), (128, 160), (128, 208)]:
    f = make(20, h, w)
    x = jax.random.normal(key, (16, h, w, C), jnp.bfloat16)
    mb = 16 * h * w * C * 2 / 1e6
    r = float(f(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = float(f(x))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    gflop = 2 * 9 * C * C * h * w * 16 * 20 / 1e9
    print(f"input {mb:.0f} MB ({h}x{w}): {dt*1000:.0f} ms "
          f"{gflop/dt/1000:.2f} TFLOPS", flush=True)
