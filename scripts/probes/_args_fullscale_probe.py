"""Definitive forward-cost probe with DISTINCT inputs per call.

Variants: params as jit args vs closed-over constants; host vs pre-staged
device inputs; plus pure transfer of distinct buffers. Distinct inputs per
call defeat any (program, input-value) result caching in the serving stack.
"""
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
B, N = 16, 6

variables = jax.jit(lambda k, x: model.init(k, x))(
    jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))

rng = np.random.RandomState(0)
base = rng.randn(B, *cfg.input_shape, 3).astype(np.float32)
host_batches = [base + np.float32(0.01 * i) for i in range(N)]


def timeit(name, fn, n=N):
    fn(0)  # warmup with stream 0
    ts = []
    for i in range(1, n):
        t0 = time.perf_counter()
        fn(i)
        ts.append(time.perf_counter() - t0)
    med = np.median(ts)
    print(f"{name}: med {med*1e3:.1f} ms  all "
          f"{[round(t*1e3) for t in ts]}", flush=True)


# E) pure transfer of distinct 65MB buffers
timeit("E_transfer_distinct",
       lambda i: jax.block_until_ready(jnp.asarray(host_batches[i])))

dev_batches = [jax.device_put(b) for b in host_batches]
jax.block_until_ready(dev_batches)

# A) params as args, host input
fwd_args = jax.jit(lambda v, x: model.apply(v, x, method=SMAP.infer))
timeit("A_args_host",
       lambda i: jax.block_until_ready(fwd_args(variables, host_batches[i])))

# B) params as args, device input
timeit("B_args_device",
       lambda i: jax.block_until_ready(fwd_args(variables, dev_batches[i])))

# C/D) params closed over (baked as constants into the executable)
fwd_const = jax.jit(lambda x: model.apply(variables, x, method=SMAP.infer))
timeit("D_const_device",
       lambda i: jax.block_until_ready(fwd_const(dev_batches[i])))
timeit("C_const_host",
       lambda i: jax.block_until_ready(fwd_const(host_batches[i])))

# repeat B: did the process warm up / cache?
timeit("B2_args_device_again",
       lambda i: jax.block_until_ready(fwd_args(variables, dev_batches[i])))
