import time

import jax
import jax.numpy as jnp

from smap_tpu.config import Config
from smap_tpu.models.smap import SMAP

cfg = Config()
model = SMAP(cfg.model)


def smap_init_probe_v2(key, x):
    return model.init(key, x)


def smap_infer_probe_v2(v, x):
    return model.apply(v, x, method=SMAP.infer)


t0 = time.perf_counter()
variables = jax.jit(smap_init_probe_v2)(
    jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
jax.block_until_ready(variables)
print("init", round(time.perf_counter() - t0, 1), flush=True)

fwd = jax.jit(smap_infer_probe_v2)
imgs = jnp.zeros((16, *cfg.input_shape, 3), jnp.float32)
t0 = time.perf_counter()
out = fwd(variables, imgs)
jax.block_until_ready(out)
print("fwd compile+run", round(time.perf_counter() - t0, 1), flush=True)

for trial in range(4):
    t0 = time.perf_counter()
    out = fwd(variables, imgs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"fwd call {trial}: {dt*1000:.1f} ms -> {16/dt:.1f} img/s",
          flush=True)
