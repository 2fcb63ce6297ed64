import time

import jax
import jax.numpy as jnp

from smap_tpu.config import Config
from smap_tpu.models.smap import SMAP

cfg = Config()
model = SMAP(cfg.model)


def smap_scalar_init_v5(key, x):
    return model.init(key, x)


def smap_scalar_fwd_v5(v, x):
    o2d, o3d, ord_ = model.apply(v, x, method=SMAP.infer)
    return jnp.sum(o2d) + jnp.sum(o3d) + jnp.sum(ord_)


t0 = time.perf_counter()
variables = jax.jit(smap_scalar_init_v5)(
    jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
jax.block_until_ready(variables)
print("init", round(time.perf_counter() - t0, 1), flush=True)

fwd = jax.jit(smap_scalar_fwd_v5)
imgs = jax.random.normal(jax.random.PRNGKey(1),
                         (16, *cfg.input_shape, 3), jnp.float32)
t0 = time.perf_counter()
print("first result:", float(fwd(variables, imgs)),
      "compile+run", round(time.perf_counter() - t0, 1), flush=True)
for trial in range(4):
    t0 = time.perf_counter()
    r = float(fwd(variables, imgs))
    dt = time.perf_counter() - t0
    print(f"scalar fwd call {trial}: {dt*1000:.0f} ms -> {16/dt:.1f} img/s",
          flush=True)
