import time

import jax
import jax.numpy as jnp

from smap_tpu.config import ModelConfig
from smap_tpu.models.smap import (DownsampleModule, ResNetTop, Stage,
                                  UpsampleModule)

B = 16
cfg = ModelConfig()
dtype = jnp.bfloat16
imgs = jax.random.normal(jax.random.PRNGKey(1), (B, 512, 832, 3),
                         jnp.float32)


def bench(name, module, *args, method=None):
    def init_fn(key, *a):
        return module.init(key, *a)

    t0 = time.perf_counter()
    variables = jax.jit(init_fn)(jax.random.PRNGKey(0), *args)
    jax.block_until_ready(variables)
    t_init = time.perf_counter() - t0

    def fwd_fn(v, *a):
        out = module.apply(v, *a)
        return sum(jnp.sum(o) for o in jax.tree.leaves(out))

    f = jax.jit(fwd_fn)
    t0 = time.perf_counter()
    r = float(f(variables, *args))
    t_compile = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = float(f(variables, *args))
        times.append(time.perf_counter() - t0)
    print(f"{name}: init {t_init:.0f}s compile {t_compile:.0f}s "
          f"steady {min(times)*1000:.0f} ms", flush=True)
    return variables


top = ResNetTop(dtype=dtype, name="top_slice_v6")
bench("stem", top, imgs)

x64 = jax.random.normal(jax.random.PRNGKey(2), (B, 128, 208, 64), dtype)
down = DownsampleModule(has_skip=False, dtype=dtype, name="down_slice_v6")
bench("downsample(stage0)", down, x64, None, None)

x4 = jax.random.normal(jax.random.PRNGKey(3), (B, 16, 26, 2048), dtype)
x3 = jax.random.normal(jax.random.PRNGKey(4), (B, 32, 52, 1024), dtype)
x2 = jax.random.normal(jax.random.PRNGKey(5), (B, 64, 104, 512), dtype)
x1 = jax.random.normal(jax.random.PRNGKey(6), (B, 128, 208, 256), dtype)
up = UpsampleModule(output_shape=(128, 208), kpt_paf_channels=43,
                    depth_channels=14, gen_skip=True, gen_cross_conv=True,
                    dtype=dtype, name="up_slice_v6")
bench("upsample(stage0)", up, x4, x3, x2, x1)

stage = Stage(output_shape=(128, 208), kpt_paf_channels=43,
              depth_channels=14, has_skip=False, gen_skip=True,
              gen_cross_conv=True, dtype=dtype, name="stage_slice_v6")
bench("full stage0", stage, x64, None, None)
