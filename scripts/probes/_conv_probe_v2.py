import time

import jax
import jax.numpy as jnp


def conv_stack_v2(n, ch, h, w, k=3):
    weights = jax.random.normal(jax.random.PRNGKey(0),
                                (k, k, ch, ch), jnp.bfloat16) * 0.01

    @jax.jit
    def xla_conv_stack_fresh(x):
        def body(x, _):
            y = jax.lax.conv_general_dilated(
                x, weights, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y, 0), ()
        x, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(x)

    return xla_conv_stack_fresh


def single_conv(ch, h, w, k=3):
    weights = jax.random.normal(jax.random.PRNGKey(0),
                                (k, k, ch, ch), jnp.bfloat16) * 0.01

    @jax.jit
    def one_conv_fresh(x):
        return jax.lax.conv_general_dilated(
            x, weights, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    return one_conv_fresh


for n, ch, h, w in [(20, 256, 64, 104)]:
    f = conv_stack_v2(n, ch, h, w)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, h, w, ch), jnp.bfloat16)
    r = float(f(x))
    t0 = time.perf_counter()
    for _ in range(3):
        r = float(f(x))
    dt = (time.perf_counter() - t0) / 3
    gflop = 2 * 9 * ch * ch * h * w * 16 * n / 1e9
    print(f"xla-conv-scan n={n} ch={ch} {h}x{w}: {dt*1000:.0f} ms "
          f"{gflop/dt/1000:.2f} TFLOPS", flush=True)

g = single_conv(256, 64, 104)
x = jax.random.normal(jax.random.PRNGKey(1), (16, 64, 104, 256), jnp.bfloat16)
r = g(x)
jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(5):
    r = g(x)
jax.block_until_ready(r)
dt = (time.perf_counter() - t0) / 5
gflop = 2 * 9 * 256 * 256 * 64 * 104 * 16 / 1e9
print(f"xla-conv-single ch=256 64x104: {dt*1000:.1f} ms "
      f"{gflop/dt/1000:.2f} TFLOPS", flush=True)
