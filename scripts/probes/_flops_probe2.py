import time

import jax
import jax.numpy as jnp
import numpy as np


def chain(n):
    @jax.jit
    def f(x, s):
        def body(x, _):
            x = x @ x
            x = x / jnp.max(jnp.abs(x))
            return x + s, ()
        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x)
    return f


key = jax.random.PRNGKey(0)
for n, size in [(20, 1024), (100, 1024), (20, 4096)]:
    f = chain(n)
    x = jax.random.normal(key, (size, size), jnp.bfloat16)
    print("result:", float(f(x, jnp.bfloat16(0.001))), flush=True)
    t0 = time.perf_counter()
    for i in range(5):
        r = f(x, jnp.bfloat16(0.001 + i * 1e-6))
        _ = float(r)  # force full sync incl. D2H
    dt = (time.perf_counter() - t0) / 5
    gflop = 2 * n * size ** 3 / 1e9
    print(f"n={n} size={size}: {dt*1000:.1f} ms/call, "
          f"{gflop/dt/1000:.2f} TFLOPS", flush=True)
