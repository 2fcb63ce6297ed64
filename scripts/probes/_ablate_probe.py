import time

import jax
import jax.numpy as jnp
from flax import linen as nn

key = jax.random.PRNGKey(0)
B, H, W, C = 16, 64, 104, 256
x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
w3 = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.02
w3_f32 = w3.astype(jnp.float32)
bias = jax.random.normal(key, (C,), jnp.float32)
gflop = 2 * 9 * C * C * H * W * B / 1e9


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bench(name, fn, *args, scale=1.0):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name}: {dt*1000:.1f} ms  {scale*gflop/dt/1000:.2f} TFLOPS",
          flush=True)


def abl_conv_v7(x):
    return jnp.sum(conv(x, w3))


def abl_conv_bias_v7(x):
    return jnp.sum(conv(x, w3) + bias.astype(jnp.bfloat16))


def abl_conv_bn_v7(x):
    y = conv(x, w3)
    scale = bias.astype(jnp.bfloat16)
    return jnp.sum(y * scale + scale)


def abl_conv_res_v7(x):
    return jnp.sum(nn.relu(conv(x, w3) + x))


def abl_conv_wcast_v7(x, wf):
    return jnp.sum(conv(x, wf.astype(jnp.bfloat16)))


def abl_conv_bigout_v7(x):
    return conv(x, w3)


def abl_maxpool_v7(x):
    return jnp.sum(nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)]))


bench("conv->sum", abl_conv_v7, x)
bench("conv+bias->sum", abl_conv_bias_v7, x)
bench("conv+bnmul->sum", abl_conv_bn_v7, x)
bench("conv+res+relu->sum", abl_conv_res_v7, x)
bench("conv wcast->sum", abl_conv_wcast_v7, x, w3_f32)
bench("conv->bigout", abl_conv_bigout_v7, x)
bench("maxpool->sum", abl_maxpool_v7, x, scale=0.01)
