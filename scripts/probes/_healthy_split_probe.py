import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _calibrate

t = _calibrate()
tries = int(os.environ.get("SPLIT_TRY", "0"))
print(f"# calibration {t*1000:.0f} ms try {tries}", flush=True)
if t > 0.1 and tries < 6:
    os.environ["SPLIT_TRY"] = str(tries + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)

from smap_tpu.config import Config
from smap_tpu.models.smap import SMAP
from smap_tpu.ops.postprocess import ScaleInfo, postprocess_batch

cfg = Config()
model = SMAP(cfg.model)
variables = jax.jit(lambda k, x: model.init(k, x))(
    jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))

B = 16
imgs = jax.random.normal(jax.random.PRNGKey(1), (B, *cfg.input_shape, 3),
                         jnp.float32)
fwd = jax.jit(lambda v, x: model.apply(v, x, method=SMAP.infer))
out = fwd(variables, imgs)
jax.block_until_ready(out)
for i in range(3):
    t0 = time.perf_counter()
    out = fwd(variables, imgs)
    jax.block_until_ready(out)
    print(f"model fwd {i}: {(time.perf_counter()-t0)*1000:.0f} ms", flush=True)

o2d, o3d, ord_ = out
scale = ScaleInfo(*[jnp.full((B,), v, jnp.float32)
                    for v in [0.433, 1920, 1080, 1500, 1500, 960, 540]])
pp = jax.jit(lambda a, b, c, s: postprocess_batch(a, b, c, s, cfg.post))
r = pp(o2d, o3d, ord_, scale)
jax.block_until_ready(r)
for i in range(3):
    t0 = time.perf_counter()
    r = pp(o2d, o3d, ord_, scale)
    jax.block_until_ready(r)
    print(f"postproc {i}: {(time.perf_counter()-t0)*1000:.0f} ms", flush=True)

print("# recalibrate:", round(_calibrate() * 1000), "ms", flush=True)
