"""Host->device ingest-floor bisect (VERDICT r4 item 2).

BENCH_r04 recorded transfer_ms=521 per batch-16 I420 (10.2 MB) next to
link_mbps=1088 (~10 ms/batch) — a 50x contradiction. Hypotheses:

  H1  the per-call sync attribution catches a PENALIZED window where the
      relay charges a fixed multi-second per-call cost to everything,
      transfers included (the link probe ran minutes earlier, in a
      healthy window);
  H2  a real fixed ingest cost in the engine's _place path that raw
      device_put doesn't pay (asarray staging, layout, sharding);
  H3  dispatch queueing — transfers serialize behind enqueued compute on
      this relay, so a "transfer" timed while compute drains measures
      the queue, not the link.

This probe needs NO model compile: it interleaves, within ONE window,
(a) raw device_put of a 10.2 MB distinct buffer, (b) jnp.asarray of the
same shape (the engine's exact _place path for mesh=None), (c) device_put
issued while a long compute chain is draining (H3), plus the work-scaling
window classifier from bench.py. Repeats the block over time so a
regime flip mid-probe is visible.

Run on TPU: python scripts/probes/_ingest_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

I420_SHAPE = (16, 768, 832)   # [B, 3H/2, W] at 512x832
ROUNDS = 3


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    from bench import _maybe_reexec_for_healthy_grant, classify_window

    if jax.default_backend() != "cpu":
        _maybe_reexec_for_healthy_grant()

    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    nbytes = int(np.prod(I420_SHAPE))

    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (4096, 4096), jnp.bfloat16) * 0.02

    @jax.jit
    def long_chain(x, s):
        def body(c, _):
            return jnp.tanh(c @ w), ()
        y, _ = jax.lax.scan(body, x + s, None, length=64)
        return jnp.sum(y)

    x0 = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    t0 = time.perf_counter()
    float(long_chain(x0, 0.0))
    print(f"chain compile+first {time.perf_counter()-t0:.1f}s "
          f"(64 x 4096^3 matmuls = 8.8 TFLOP)", flush=True)

    def put_ms(make, tag, n=3):
        times = []
        for _ in range(n):
            buf = make()
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(buf))
            times.append((time.perf_counter() - t0) * 1e3)
        med = float(np.median(times))
        print(f"  {tag:>28}: {med:8.1f} ms med "
              f"({nbytes/med/1e3:.0f} MB/s)  all={['%.0f' % t for t in times]}",
              flush=True)
        return med

    def asarray_ms(n=3):
        times = []
        for _ in range(n):
            buf = rng.randint(0, 256, I420_SHAPE, dtype=np.uint8)
            t0 = time.perf_counter()
            jax.block_until_ready(jnp.asarray(buf))
            times.append((time.perf_counter() - t0) * 1e3)
        med = float(np.median(times))
        print(f"  {'jnp.asarray (_place path)':>28}: {med:8.1f} ms med "
              f"({nbytes/med/1e3:.0f} MB/s)", flush=True)
        return med

    for rnd in range(ROUNDS):
        print(f"--- round {rnd} ---", flush=True)
        label, fixed_ms, marg = classify_window()
        print(f"  window: {label} (fixed {fixed_ms:.0f} ms, marginal "
              f"{marg:.0f} TFLOPS)", flush=True)

        put_ms(lambda: rng.randint(0, 256, I420_SHAPE, dtype=np.uint8),
               "raw device_put 10.2MB")
        asarray_ms()

        # H3: transfer issued while ~8.8 TFLOP of compute drains (>=45 ms
        # device time healthy; seconds penalized). If the put's blocked
        # time ~= the chain's remaining runtime, transfers serialize
        # behind compute on this relay and per-call sync attribution in a
        # busy window measures the queue.
        fut = long_chain(x0, float(rnd + 1) * 1e-3)   # enqueue, don't block
        t0 = time.perf_counter()
        buf = rng.randint(0, 256, I420_SHAPE, dtype=np.uint8)
        jax.block_until_ready(jax.device_put(buf))
        busy_put = (time.perf_counter() - t0) * 1e3
        t1 = time.perf_counter()
        float(fut)
        chain_rest = (time.perf_counter() - t1) * 1e3
        print(f"  {'device_put while busy':>28}: {busy_put:8.1f} ms "
              f"(chain drained {chain_rest:.1f} ms after)", flush=True)
        time.sleep(5)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
