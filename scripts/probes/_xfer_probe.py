import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def matmuls(x):
    for _ in range(20):
        x = jnp.tanh(x @ x)
    return x[0, 0]


x = jnp.ones((1024, 1024), jnp.bfloat16)
t0 = time.perf_counter()
r = matmuls(x)
jax.block_until_ready(r)
print("matmul compile+run", round(time.perf_counter() - t0, 2), flush=True)
t0 = time.perf_counter()
for _ in range(10):
    r = matmuls(x)
jax.block_until_ready(r)
print("matmul steady x10", round(time.perf_counter() - t0, 3), flush=True)


@jax.jit
def bigout(x):
    return jnp.broadcast_to(x, (16, 128, 208, 58)) * 2.0


t0 = time.perf_counter()
r = bigout(jnp.ones((1,), jnp.float32))
jax.block_until_ready(r)
print("bigout compile+run", round(time.perf_counter() - t0, 2), flush=True)
t0 = time.perf_counter()
for _ in range(5):
    r = bigout(jnp.ones((1,), jnp.float32))
jax.block_until_ready(r)
print("bigout steady x5", round(time.perf_counter() - t0, 3), flush=True)

big = np.ones((16, 512, 832, 3), np.float32)
t0 = time.perf_counter()
d = jax.device_put(big)
jax.block_until_ready(d)
print("82MB device_put", round(time.perf_counter() - t0, 3), flush=True)

t0 = time.perf_counter()
h = np.asarray(r)
print("99MB device_get", round(time.perf_counter() - t0, 3), flush=True)
