import time

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
ch, h, w = 256, 64, 104
x = jax.random.normal(key, (16, h, w, ch), jnp.bfloat16)
weights = jax.random.normal(key, (3, 3, ch, ch), jnp.bfloat16) * 0.01


def one_conv(x, w3):
    return jnp.maximum(jax.lax.conv_general_dilated(
        x, w3, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")), 0)


def make_scan(n):
    @jax.jit
    def f_scan_hlo_probe(x):
        def body(c, _):
            return one_conv(c, weights), ()
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y)
    return f_scan_hlo_probe


def make_unrolled(n):
    @jax.jit
    def f_unrolled_hlo_probe(x):
        for _ in range(n):
            x = one_conv(x, weights)
        return jnp.sum(x)
    return f_unrolled_hlo_probe


def bench(name, f, n):
    t0 = time.perf_counter()
    r = float(f(x))
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(2):
        r = float(f(x))
    dt = (time.perf_counter() - t0) / 2
    gflop = 2 * 9 * ch * ch * h * w * 16 * n / 1e9
    print(f"{name}: {dt*1000:.0f} ms  {gflop/dt/1000:.2f} TFLOPS", flush=True)


bench("scan20", make_scan(20), 20)
bench("unroll20", make_unrolled(20), 20)
bench("unroll100", make_unrolled(100), 100)
