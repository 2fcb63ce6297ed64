import time

import jax
import jax.numpy as jnp

from smap_tpu.models.smap import DownsampleModule

key = jax.random.PRNGKey(0)
B, H, W, C = 16, 64, 104, 256
xc = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
N = 20
weights = [jax.random.normal(jax.random.PRNGKey(i), (3, 3, C, C),
                             jnp.bfloat16) * 0.02 for i in range(N)]
gflop = 2 * 9 * C * C * H * W * B * N / 1e9


def conv(x, w):
    return jnp.maximum(jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")), 0)


@jax.jit
def control_chain_v9(x):
    for w in weights:
        x = conv(x, w)
    return jnp.sum(x)


def bench(name, f, *args):
    r = f(*args)
    jax.block_until_ready(r)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        times.append(time.perf_counter() - t0)
    print(f"{name}: {min(times)*1000:.0f} ms", flush=True)


bench("control#1 (20 convs, expect ~40ms)", control_chain_v9, xc)

down = DownsampleModule(has_skip=False, dtype=jnp.bfloat16,
                        name="down_defin_v9")
x64 = jax.random.normal(jax.random.PRNGKey(2), (B, 128, 208, 64),
                        jnp.bfloat16)
variables = jax.jit(lambda k, a: down.init(k, a, None, None))(
    jax.random.PRNGKey(0), x64)
f_down = jax.jit(lambda v, a: jnp.sum(
    down.apply(v, a, None, None)[0]))
bench("flax downsample stage", f_down, variables, x64)

bench("control#2 (20 convs)", control_chain_v9, xc)
