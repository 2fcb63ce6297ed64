"""Probe: does the host->device link parallelize across Python threads?"""
import concurrent.futures as cf
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = 16
H, W = 512, 832
rng = np.random.RandomState(0)
N = 8
bufs_u8 = [rng.randint(0, 256, (B, H, W, 3), np.uint8) for _ in range(N)]
bufs_f32 = [rng.randn(B, H, W, 3).astype(np.float32) for _ in range(2)]

# warm the link
jax.block_until_ready(jnp.asarray(bufs_u8[0]))


def xfer(b):
    return jax.block_until_ready(jax.device_put(b))


for name, bufs in [("u8_16MB", bufs_u8[1:5]), ("u8_16MB_b", bufs_u8[5:])]:
    t0 = time.perf_counter()
    for b in bufs:
        xfer(b)
    serial = time.perf_counter() - t0
    print(f"serial {name}: {serial*1e3:.0f} ms total "
          f"({len(bufs)} bufs, {serial/len(bufs)*1e3:.0f} ms each)",
          flush=True)

# re-salt to avoid any value caching
for b in bufs_u8:
    b += np.uint8(1)

for nthreads in (2, 4):
    with cf.ThreadPoolExecutor(nthreads) as ex:
        t0 = time.perf_counter()
        list(ex.map(xfer, bufs_u8))
        dt = time.perf_counter() - t0
    print(f"threads={nthreads}: {dt*1e3:.0f} ms for {len(bufs_u8)} bufs "
          f"({dt/len(bufs_u8)*1e3:.0f} ms each)", flush=True)
    for b in bufs_u8:
        b += np.uint8(1)
