import time, jax, jax.numpy as jnp
t0=time.perf_counter()
from smap_tpu.config import Config
from smap_tpu.models.smap import SMAP
cfg = Config()
model = SMAP(cfg.model)
print("imports", round(time.perf_counter()-t0,1), flush=True)
t0=time.perf_counter()
variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1,*cfg.input_shape,3), jnp.float32))
jax.block_until_ready(variables)
print("jitted init", round(time.perf_counter()-t0,1), flush=True)
t0=time.perf_counter()
fwd = jax.jit(lambda v, x: model.apply(v, x, method=SMAP.infer))
out = fwd(variables, jnp.zeros((16,*cfg.input_shape,3), jnp.float32))
jax.block_until_ready(out)
print("fwd compile+run", round(time.perf_counter()-t0,1), flush=True)
t0=time.perf_counter()
for _ in range(5):
    out = fwd(variables, jnp.zeros((16,*cfg.input_shape,3), jnp.float32))
jax.block_until_ready(out)
dt=(time.perf_counter()-t0)/5
print("fwd steady", round(dt,4), "->", round(16/dt,1), "img/s", flush=True)
