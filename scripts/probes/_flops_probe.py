import time

import jax
import jax.numpy as jnp


def chain(n):
    @jax.jit
    def f(x):
        def body(x, _):
            return jnp.tanh(x @ x), ()
        x, _ = jax.lax.scan(body, x, None, length=n)
        return x[0, 0]
    return f


for n, size in [(20, 1024), (200, 1024), (20, 4096)]:
    f = chain(n)
    x = jnp.ones((size, size), jnp.bfloat16)
    r = f(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5):
        r = f(x)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 5
    gflop = 2 * n * size ** 3 / 1e9
    print(f"n={n} size={size}: {dt*1000:.1f} ms/call, "
          f"{gflop/dt/1000:.2f} TFLOPS", flush=True)
