"""Probe: per-op overhead inside one compiled program on this backend.

Chains N unfusable op pairs (reduce + broadcast-subtract) on a tiny array
and fits time vs N. If the slope is tens of microseconds per op, programs
are op-count-bound and the optimization target is fewer, bigger ops.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def make_chain(n):
    @jax.jit
    def f(x):
        for _ in range(n):
            x = x - jnp.mean(x) + 1.0   # reduce breaks elementwise fusion
        return jnp.sum(x)
    return f


rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(40, 40).astype(np.float32))

for n in (10, 50, 200, 500):
    f = make_chain(n)
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    med = np.median(ts)
    print(f"n={n}: {med*1e3:.2f} ms  ({med/n*1e6:.1f} us per pair)",
          flush=True)

# same chain on a big array: does size matter or only op count?
xb = jnp.asarray(rng.rand(16, 128, 208).astype(np.float32))
f = make_chain(200)
float(f(xb))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    float(f(xb))
    ts.append(time.perf_counter() - t0)
print(f"n=200 big-array: {np.median(ts)*1e3:.2f} ms", flush=True)
