import time

import jax
import jax.numpy as jnp

from smap_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from smap_tpu.config import Config
from smap_tpu.models.smap import SMAP

cfg = Config()
model = SMAP(cfg.model)
t0 = time.perf_counter()
variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                jnp.zeros((1, *cfg.input_shape, 3),
                                          jnp.float32))
jax.block_until_ready(variables)
print("init", round(time.perf_counter() - t0, 1), flush=True)

fwd = jax.jit(lambda v, x: model.apply(v, x, method=SMAP.infer))
imgs = jnp.zeros((16, *cfg.input_shape, 3), jnp.float32)
t0 = time.perf_counter()
out = fwd(variables, imgs)
jax.block_until_ready(out)
print("fwd compile+run", round(time.perf_counter() - t0, 1), flush=True)

for trial in range(3):
    t0 = time.perf_counter()
    out = fwd(variables, imgs)
    jax.block_until_ready(out)
    print(f"fwd single call {trial}:",
          round(time.perf_counter() - t0, 3), flush=True)
