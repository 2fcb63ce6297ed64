import time

import jax
import jax.numpy as jnp

from smap_tpu.models.layers import max_pool_3x3_s2, resize_bilinear

B = 16


def bench(name, fn, *args, iters=3):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms", flush=True)


key = jax.random.PRNGKey(0)

# stem conv 7x7/2 on 3 channels
w7 = jax.random.normal(key, (7, 7, 3, 64), jnp.bfloat16) * 0.05
x_img = jax.random.normal(key, (B, 512, 832, 3), jnp.bfloat16)


def stem_conv_probe_v3(x):
    return jax.lax.conv_general_dilated(
        x, w7, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


bench("stem conv 7x7/2", stem_conv_probe_v3, x_img)

x_pool = jax.random.normal(key, (B, 256, 416, 64), jnp.bfloat16)


def maxpool_probe_v3(x):
    return max_pool_3x3_s2(x)


bench("maxpool 3x3/2", maxpool_probe_v3, x_pool)

# 1x1 conv 2048->256 at 16x26
x_se = jax.random.normal(key, (B, 16, 26, 2048), jnp.bfloat16)
w1 = jax.random.normal(key, (1, 1, 2048, 256), jnp.bfloat16) * 0.02


def conv1x1_probe_v3(x):
    return jax.lax.conv_general_dilated(
        x, w1, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


bench("1x1 conv 2048->256 @16x26", conv1x1_probe_v3, x_se)

# bilinear resize einsum path
x_small = jax.random.normal(key, (B, 16, 26, 256), jnp.bfloat16)


def resize_probe_v3(x):
    return resize_bilinear(x, (128, 208))


bench("bilinear 16x26->128x208 c256", resize_probe_v3, x_small)

# 3x3 conv 256ch at 128x208 (finest upsample head scale)
x_big = jax.random.normal(key, (B, 128, 208, 256), jnp.bfloat16)
w3 = jax.random.normal(key, (3, 3, 256, 256), jnp.bfloat16) * 0.02


def conv3x3_big_probe_v3(x):
    return jax.lax.conv_general_dilated(
        x, w3, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


bench("3x3 conv 256 @128x208", conv3x3_big_probe_v3, x_big)

# bottleneck chain at 128x208 64->256
x_l1 = jax.random.normal(key, (B, 128, 208, 256), jnp.bfloat16)
w1a = jax.random.normal(key, (1, 1, 256, 64), jnp.bfloat16) * 0.05
w3b = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.05
w1c = jax.random.normal(key, (1, 1, 64, 256), jnp.bfloat16) * 0.05


def bottleneck_probe_v3(x):
    y = jax.lax.conv_general_dilated(
        x, w1a, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y, 0)
    y = jax.lax.conv_general_dilated(
        y, w3b, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y, 0)
    y = jax.lax.conv_general_dilated(
        y, w1c, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(y + x, 0)


bench("bottleneck 256/64 @128x208", bottleneck_probe_v3, x_l1)

# batchnorm-style elementwise at 128x208
scale = jnp.ones((256,), jnp.bfloat16)


def bn_probe_v3(x):
    return x * scale + scale


bench("bn elementwise @128x208 c256", bn_probe_v3, x_l1)
