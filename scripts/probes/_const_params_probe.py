import time

import jax
import jax.numpy as jnp
import numpy as np

from smap_tpu.config import Config
from smap_tpu.models.smap import SMAP

cfg = Config()
model = SMAP(cfg.model)


def const_probe_init_v11(k, x):
    return model.init(k, x)


variables = jax.jit(const_probe_init_v11)(
    jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
jax.block_until_ready(variables)
print("init done", flush=True)

imgs = jax.random.normal(jax.random.PRNGKey(1),
                         (4, *cfg.input_shape, 3), jnp.float32)

# A) params as jit arguments (standard)
fwd_args = jax.jit(lambda v, x: jnp.sum(
    model.apply(v, x, method=SMAP.infer)[0]))
t0 = time.perf_counter()
r = float(fwd_args(variables, imgs))
print("args-variant compile+run", round(time.perf_counter() - t0, 1),
      flush=True)
for i in range(2):
    t0 = time.perf_counter()
    r = float(fwd_args(variables, imgs))
    print(f"args call {i}: {time.perf_counter()-t0:.1f} s", flush=True)

# B) params closed over as constants
host_vars = jax.device_get(variables)


def fwd_const_v11(x):
    return jnp.sum(model.apply(host_vars, x, method=SMAP.infer)[0])


fwd_const = jax.jit(fwd_const_v11)
t0 = time.perf_counter()
r = float(fwd_const(imgs))
print("const-variant compile+run", round(time.perf_counter() - t0, 1),
      flush=True)
for i in range(2):
    t0 = time.perf_counter()
    r = float(fwd_const(imgs))
    print(f"const call {i}: {time.perf_counter()-t0:.1f} s", flush=True)
