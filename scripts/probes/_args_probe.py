import time

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
B, H, W, C = 16, 64, 104, 256
x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
N = 20
weights = [jax.random.normal(jax.random.PRNGKey(i), (3, 3, C, C),
                             jnp.bfloat16) * 0.02 for i in range(N)]
wdict = {f"w{i}": w for i, w in enumerate(weights)}
gflop = 2 * 9 * C * C * H * W * B * N / 1e9


def conv(x, w):
    return jnp.maximum(jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")), 0)


def bench(name, f, *args):
    r = f(*args)
    jax.block_until_ready(r)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name}: {dt*1000:.0f} ms  {gflop/dt/1000:.2f} TFLOPS", flush=True)


@jax.jit
def closure_chain_v8(x):
    for w in weights:
        x = conv(x, w)
    return jnp.sum(x)


@jax.jit
def args_chain_v8(x, ws):
    for w in ws:
        x = conv(x, w)
    return jnp.sum(x)


@jax.jit
def dict_chain_v8(x, wd):
    for i in range(N):
        x = conv(x, wd[f"w{i}"])
    return jnp.sum(x)


bench("closure weights", closure_chain_v8, x)
bench("list-arg weights", args_chain_v8, x, weights)
bench("dict-arg weights", dict_chain_v8, x, wdict)
