"""Train-step throughput on the real TPU: full 3-stage SMAP at 512x832,
bf16 compute, on-device label synthesis, forward+backward+Adam, one chip.
The reference's nominal schedule is 2 img/GPU (config.py:50-56)."""
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
from smap_tpu.parallel.mesh import make_mesh, shard_batch
from smap_tpu.train.solver import make_optimizer
from smap_tpu.train.step import (TrainBatch, create_train_state,
                                 make_jitted_train_step)

print("backend:", jax.default_backend(), flush=True)

cfg = Config()
model = SMAP(cfg.model)
variables = jax.jit(lambda k, x: model.init(k, x))(
    jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
mesh = make_mesh(jax.devices()[:1])
tx = make_optimizer(cfg.train, 1)
state = create_train_state(variables, cfg, 1)
step = make_jitted_train_step(cfg, mesh, tx)

rng = np.random.RandomState(0)
h, w = cfg.input_shape
for b in (2, 8, 16):
    bodys = np.zeros((b, cfg.train.max_people, 15, 11), np.float32)
    bodys[..., 0] = rng.uniform(0, w - 1, bodys.shape[:3])
    bodys[..., 1] = rng.uniform(0, h - 1, bodys.shape[:3])
    bodys[..., 2] = rng.uniform(100, 400, bodys.shape[:3])
    bodys[..., 3] = rng.randint(0, 3, bodys.shape[:3])
    bodys[..., 7] = 1100.0
    def mk():
        return shard_batch(TrainBatch(
            images=rng.randn(b, h, w, 3).astype(np.float32),
            bodys=bodys + rng.rand(*bodys.shape).astype(np.float32) * 1e-3,
            valids=np.ones((b, 57), np.float32),
            scales=np.full((b,), 0.5, np.float32)), mesh)

    t0 = time.perf_counter()
    st, losses = step(state, mk())
    jax.block_until_ready(losses)
    print(f"b={b}: compile+first {time.perf_counter()-t0:.1f} s", flush=True)
    ts = []
    for _ in range(4):
        batch = mk()       # distinct inputs (relay caches identical pairs)
        t0 = time.perf_counter()
        st, losses = step(st, batch)
        jax.block_until_ready(losses)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"b={b}: {med*1e3:.0f} ms/step = {b/med:.1f} img/s "
          f"(incl. 65*{b/16:.2g} MB f32 transfer)", flush=True)
