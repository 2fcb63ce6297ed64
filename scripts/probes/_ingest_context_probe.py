"""device_put and host-sync cost IN CONTEXT: idle vs compute-in-flight.

Round-5: _stream_dispatch_probe.py measured the serving loop at 341
ms/batch (place+forward+post) vs 71 ms/batch for the same forward+post
on pre-placed inputs, on a grant whose idle-device link probe says
659 MB/s (10.2 MB batch ~15 ms). And adding the ladder's per-iteration
count fetch (a host int() one batch behind) costs another ~306 ms/batch.
So the gap is not bytes and not device work — it is how the relay
handles (a) host->device puts issued while programs are in flight and
(b) blocking host readbacks in the middle of an async dispatch stream.
This probe times both in controlled contexts using a small jitted
matmul chain (~60-80 ms/exec, no model compile):

  put_idle:       device_put 10.2 MB, device idle            (baseline)
  put_inflight:   device_put 10.2 MB right after enqueueing a chain exec
  put_deep:       device_put with THREE chain execs enqueued
  sync_inflight:  int(scalar) readback right after enqueueing an exec
  async_copy:     copy_to_host_async first, int() later
  loop_noput:     enqueue N chain execs back-to-back          (exec rate)
  loop_put:       same loop with one put per exec             (the serving
                  pattern — if puts serialize, this shows the real cost)

Run on TPU: python scripts/probes/_ingest_context_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

MB = 10.2
N = 10


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant, classify_window

        _maybe_reexec_for_healthy_grant()
        label, fixed_ms, marg = classify_window()
        print(f"window: {label} (fixed {fixed_ms:.0f} ms, marginal "
              f"{marg:.0f} TFLOPS)", flush=True)

    # ~8.9 GFLOP chain -> ~60-90 ms/exec in the healthy regime: a stand-in
    # for the model forward without its compile cost.
    d = 2048

    @jax.jit
    def chain(x):
        for _ in range(64):
            x = jnp.tanh(x @ w)
        return x

    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.01)
    xs = [jnp.asarray(rng.randn(8, d).astype(np.float32))
          for _ in range(N + 4)]
    jax.block_until_ready(chain(xs[0]))
    t0 = time.perf_counter()
    jax.block_until_ready(chain(xs[1]))
    exec_ms = (time.perf_counter() - t0) * 1e3
    print(f"chain exec: {exec_ms:.1f} ms", flush=True)

    nbytes = int(MB * (1 << 20))
    bufs = [rng.randint(0, 256, (nbytes,), np.uint8) for _ in range(N + 6)]

    def put_idle():
        t = []
        for i in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(bufs[i]))
            t.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(t))

    print(f"put_idle: {put_idle():.1f} ms", flush=True)

    def put_inflight(depth):
        t = []
        for i in range(4):
            outs = [chain(xs[i + j]) for j in range(depth)]
            t0 = time.perf_counter()
            y = jax.device_put(bufs[4 + i])
            jax.block_until_ready(y)
            t.append((time.perf_counter() - t0) * 1e3)
            jax.block_until_ready(outs)
        return float(np.median(t))

    print(f"put_inflight(1): {put_inflight(1):.1f} ms", flush=True)
    print(f"put_inflight(3): {put_inflight(3):.1f} ms", flush=True)

    def sync_inflight():
        t = []
        for i in range(4):
            out = chain(xs[i])
            s = jnp.sum(out)          # tiny dependent scalar
            t0 = time.perf_counter()
            _ = float(s)              # blocking readback mid-stream
            t.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(t))

    print(f"sync_inflight: {sync_inflight():.1f} ms "
          f"(includes waiting out the exec)", flush=True)

    def async_copy_then_read():
        t = []
        for i in range(4):
            out = chain(xs[i])
            s = jnp.sum(out)
            try:
                s.copy_to_host_async()
            except Exception as exc:
                print(f"copy_to_host_async unsupported: "
                      f"{type(exc).__name__}", flush=True)
                return -1.0
            nxt = chain(xs[i + 1])    # keep the pipe busy
            t0 = time.perf_counter()
            _ = float(s)
            t.append((time.perf_counter() - t0) * 1e3)
            jax.block_until_ready(nxt)
        return float(np.median(t))

    print(f"async_copy read: {async_copy_then_read():.1f} ms", flush=True)

    def loop(with_put):
        t0 = time.perf_counter()
        outs = []
        for i in range(N):
            if with_put:
                y = jax.device_put(bufs[i])
                outs.append(chain(xs[i]))
                del y
            else:
                outs.append(chain(xs[i]))
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) * 1e3 / N

    print(f"loop_noput: {loop(False):.1f} ms/iter", flush=True)
    print(f"loop_put: {loop(True):.1f} ms/iter", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
