import time

import jax
import jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)
C = 256
w3 = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.02
xc = jax.random.normal(key, (16, 64, 104, C), jnp.bfloat16)


@jax.jit
def control_interleave_v10(x):
    def body(c, _):
        y = jax.lax.conv_general_dilated(
            c, w3, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y, 0), ()
    y, _ = jax.lax.scan(body, x, None, length=20)
    return jnp.sum(y)


def t_control(tag):
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = float(control_interleave_v10(xc))
        times.append(time.perf_counter() - t0)
    print(f"control {tag}: {min(times)*1000:.0f} ms", flush=True)


t_control("before-compile")

from smap_tpu.config import Config
from smap_tpu.inference import SMAPInference
from smap_tpu.models.smap import SMAP

cfg = Config()
model = SMAP(cfg.model)


def interleave_init_v10(k, x):
    return model.init(k, x)


t0 = time.perf_counter()
variables = jax.jit(interleave_init_v10)(
    jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
jax.block_until_ready(variables)
print("init", round(time.perf_counter() - t0, 1), flush=True)

t_control("after-init")

engine = SMAPInference(variables, cfg)
rng = np.random.RandomState(0)
images = rng.randn(4, *cfg.input_shape, 3).astype(np.float32)
scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
           "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}] * 4

t0 = time.perf_counter()
res = engine.run_batch(images, scales)
jax.block_until_ready(res)
print("pipeline compile+run (batch 4)", round(time.perf_counter() - t0, 1),
      flush=True)

for i in range(2):
    t0 = time.perf_counter()
    res = engine.run_batch(images, scales)
    jax.block_until_ready(res)
    print(f"pipeline call {i}: {time.perf_counter()-t0:.1f} s", flush=True)

t_control("after-pipeline")
