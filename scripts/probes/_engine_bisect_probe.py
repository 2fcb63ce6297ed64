"""Bisect: SMAPInference forward (bench path) vs raw jit forward, one process."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from smap_tpu.config import Config
from smap_tpu.inference import SMAPInference
from smap_tpu.models.smap import SMAP

cfg = Config()
model = SMAP(cfg.model)
B = 16

variables = jax.jit(lambda k, x: model.init(k, x))(
    jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))

rng = np.random.RandomState(0)
images = rng.randn(B, *cfg.input_shape, 3).astype(np.float32)
scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
           "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}
          for _ in range(B)]


def timeit(name, fn, iters=4):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.1f} ms (min {min(ts)*1e3:.1f})",
          flush=True)


# 1. raw forward first (same as transfer probe)
fwd = jax.jit(lambda v, x: model.apply(v, x, method=SMAP.infer))
timeit("raw_forward_host_input",
       lambda: jax.block_until_ready(fwd(variables, images)))

# 2. engine, same process
engine = SMAPInference(variables, cfg)
timeit("engine_run_batch_timed",
       lambda: jax.block_until_ready(
           engine.run_batch_timed(images, scales)[0].bodies_3d))

res, ms = engine.run_batch_timed(images, scales)
print("stage_ms:", ms, flush=True)

# 3. engine forward jit alone
x_dev = jax.block_until_ready(jnp.asarray(images))
timeit("engine_jit_forward_dev_input",
       lambda: jax.block_until_ready(engine._jit_forward(engine.variables,
                                                         x_dev)))

# 4. raw forward again (did the process/grant degrade meanwhile?)
timeit("raw_forward_host_input_again",
       lambda: jax.block_until_ready(fwd(variables, images)))
