"""In-loop put cost vs payload size: fixed flush or bandwidth?

Round-5: on a grant whose COLD idle-device link measured 1205 MB/s, a
pipelined loop that adds one 10.2 MB put per ~71 ms exec ran at 225
ms/iter (+154 ms/put) — _stream_dispatch_probe.py stream2 vs device2.
So puts interleaved with compute cost ~15x their idle price even on a
fast link. If that cost is a FIXED per-put stream-flush, batching
several frames per transfer amortizes it (a 4-batch super-put would cut
it 4x); if it is in-loop bandwidth, only smaller payloads help. This
probe runs `exec(chain) + put(S)` loops at S in {0, 0.1, 1, 10.2, 40.8}
MB with a ~70 ms jitted matmul chain standing in for the forward.

Run on TPU: python scripts/probes/_stream_put_size_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

N = 12
SIZES_MB = (0.0, 0.1, 1.0, 10.2, 40.8)


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

    d = 4096
    w = jnp.asarray(np.random.RandomState(0).randn(d, d).astype(np.float32)
                    * 0.02)

    @jax.jit
    def chain(x):
        for _ in range(48):
            x = jnp.tanh(x @ w)
        return x

    x0 = jnp.asarray(np.random.RandomState(1).randn(64, d)
                     .astype(np.float32))
    jax.block_until_ready(chain(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(chain(x0))
    print(f"chain exec: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    for mb in SIZES_MB:
        nbytes = int(mb * (1 << 20))
        bufs = [np.frombuffer(os.urandom(nbytes), np.uint8)
                for _ in range(N)] if nbytes else None
        xs = x0
        t0 = time.perf_counter()
        outs = []
        for i in range(N):
            if bufs is not None:
                y = jax.device_put(bufs[i])
                outs.append(y)
            xs = chain(xs)
        jax.block_until_ready((outs, xs))
        per = (time.perf_counter() - t0) * 1e3 / N
        print(f"S={mb:5.1f} MB async: {per:7.1f} ms/iter", flush=True)

    # Blocking alternation: wait out each transfer BEFORE dispatching the
    # next exec. If the idle-link rate survives this pattern, the serving
    # fix is to sync puts instead of letting them starve behind compute.
    for mb in (10.2, 40.8):
        nbytes = int(mb * (1 << 20))
        bufs = [np.frombuffer(os.urandom(nbytes), np.uint8)
                for _ in range(N)]
        xs = x0
        t0 = time.perf_counter()
        put_ms = []
        for i in range(N):
            tp = time.perf_counter()
            y = jax.block_until_ready(jax.device_put(bufs[i]))
            put_ms.append((time.perf_counter() - tp) * 1e3)
            xs = chain(xs)
            del y
        jax.block_until_ready(xs)
        per = (time.perf_counter() - t0) * 1e3 / N
        print(f"S={mb:5.1f} MB blocking: {per:7.1f} ms/iter "
              f"(put median {float(np.median(put_ms)):.1f} ms)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
