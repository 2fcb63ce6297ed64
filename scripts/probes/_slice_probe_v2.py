import time

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
wctl = jax.random.normal(key, (3, 3, 256, 256), jnp.bfloat16) * 0.02
xctl = jax.random.normal(key, (16, 64, 104, 256), jnp.bfloat16)


@jax.jit
def control_v12(x):
    def body(c, _):
        y = jax.lax.conv_general_dilated(
            c, wctl, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y, 0), ()
    y, _ = jax.lax.scan(body, x, None, length=20)
    return jnp.sum(y)


def ctl(tag):
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(control_v12(xctl))
        ts.append(time.perf_counter() - t0)
    print(f"  [ctl {tag}: {min(ts)*1000:.0f} ms]", flush=True)


float(control_v12(xctl))
ctl("start")

from smap_tpu.models.layers import max_pool_3x3_s2, resize_bilinear
from smap_tpu.models.smap import DownsampleModule

B = 16
dtype = jnp.bfloat16


def bench(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.0f} ms", flush=True)


# maxpool alone
xp = jax.random.normal(key, (B, 256, 416, 64), dtype)
bench("maxpool_v12", lambda x: jnp.sum(max_pool_3x3_s2(x)), xp)
ctl("after maxpool")

# bilinear resize alone
xr = jax.random.normal(key, (B, 16, 26, 256), dtype)
bench("resize_v12", lambda x: jnp.sum(resize_bilinear(x, (128, 208))), xr)
ctl("after resize")

# strided conv alone
ws = jax.random.normal(key, (3, 3, 256, 512), dtype) * 0.02
xs = jax.random.normal(key, (B, 128, 208, 256), dtype)
bench("strided_conv_v12", lambda x: jnp.sum(jax.lax.conv_general_dilated(
    x, ws, (2, 2), [(1, 1), (1, 1)],
    dimension_numbers=("NHWC", "HWIO", "NHWC"))), xs)
ctl("after strided")

# full flax downsample
down = DownsampleModule(has_skip=False, dtype=dtype, name="down_v12")
x64 = jax.random.normal(key, (B, 128, 208, 64), dtype)
dvars = jax.jit(lambda k, a: down.init(k, a, None, None))(key, x64)
bench("downsample_v12",
      lambda v, a: jnp.sum(down.apply(v, a, None, None)[0]), dvars, x64)
ctl("after downsample")

# layer1-only (3 bottlenecks at 128x208)
from smap_tpu.models.layers import Bottleneck
from flax import linen as nn


class Layer1Only(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = Bottleneck(64, stride=1, has_downsample=True,
                       dtype=dtype, name="b0")(x)
        x = Bottleneck(64, dtype=dtype, name="b1")(x)
        x = Bottleneck(64, dtype=dtype, name="b2")(x)
        return x


l1 = Layer1Only(name="l1_v12")
lvars = jax.jit(lambda k, a: l1.init(k, a))(key, x64)
bench("layer1_v12", lambda v, a: jnp.sum(l1.apply(v, a)), lvars, x64)
ctl("after layer1")
