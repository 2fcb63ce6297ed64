import time

import jax
import jax.numpy as jnp

from smap_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def bench(name, f, args, gflop):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name}: {dt*1000:.1f} ms  {gflop/dt/1000:.2f} TFLOPS", flush=True)


@jax.jit
def mm(a, b):
    return a @ b


key = jax.random.PRNGKey(0)
for m, k, n in [(1024, 1024, 1024), (106496, 256, 256), (8192, 1024, 1024),
                (106496, 512, 512), (4096, 4096, 4096)]:
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)
    bench(f"mm {m}x{k}x{n}", mm, (a, b), 2 * m * k * n / 1e9)
