import time

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)


def bench(name, fn, *args, iters=5):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    return dt


for h, w in [(64, 104), (128, 104), (128, 208), (256, 208)]:
    x = jax.random.normal(key, (16, h, w, 256), jnp.bfloat16)
    mb = 16 * h * w * 256 * 2 / 1e6

    def ew_cliff_v4(x):
        return x * 2.0 + 1.0

    dt = bench(f"ew {h}x{w}", ew_cliff_v4, x)
    print(f"elementwise {h}x{w} ({mb:.0f} MB): {dt*1000:.2f} ms "
          f"{2*mb/1000/dt:.1f} GB/s", flush=True)

w3 = jax.random.normal(key, (3, 3, 256, 256), jnp.bfloat16) * 0.02
for h, w in [(64, 104), (128, 104), (128, 208)]:
    x = jax.random.normal(key, (16, h, w, 256), jnp.bfloat16)

    def conv_cliff_v4(x):
        return jax.lax.conv_general_dilated(
            x, w3, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = bench(f"conv {h}x{w}", conv_cliff_v4, x)
    gflop = 2 * 9 * 256 * 256 * h * w * 16 / 1e9
    print(f"conv3x3 {h}x{w}: {dt*1000:.1f} ms {gflop/dt/1000:.2f} TFLOPS",
          flush=True)
