"""Probe: host->device transfer vs model forward vs full engine call."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from smap_tpu.config import Config
from smap_tpu.models.smap import SMAP

cfg = Config()
model = SMAP(cfg.model)
B = 16

variables = jax.jit(lambda k, x: model.init(k, x))(
    jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))

rng = np.random.RandomState(0)
host_img = rng.randn(B, *cfg.input_shape, 3).astype(np.float32)
host_img_u8 = (rng.rand(B, *cfg.input_shape, 3) * 255).astype(np.uint8)


def timeit(name, fn, iters=5):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.1f} ms (min {min(ts)*1e3:.1f})",
          flush=True)


# pure transfer, f32 65MB
timeit("transfer_f32_65MB",
       lambda: jax.block_until_ready(jnp.asarray(host_img)))
# pure transfer, u8 16MB
timeit("transfer_u8_16MB",
       lambda: jax.block_until_ready(jnp.asarray(host_img_u8)))
# 7 tiny arrays (the ScaleInfo pattern)
scal = [np.full((B,), 1.0, np.float32) for _ in range(7)]
timeit("transfer_7_tiny",
       lambda: jax.block_until_ready([jnp.asarray(s) for s in scal]))

fwd = jax.jit(lambda v, x: model.apply(v, x, method=SMAP.infer))
x_dev = jax.block_until_ready(jnp.asarray(host_img))
timeit("forward_device_input",
       lambda: jax.block_until_ready(fwd(variables, x_dev)))
timeit("forward_host_input",
       lambda: jax.block_until_ready(fwd(variables, host_img)))
