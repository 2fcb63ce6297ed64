"""Does the host->device put rate decay with live device memory / age?

Round-5: _link_cold_warm_probe.py (fresh tiny process) measured cold
puts at 444 MB/s; _ingest_context_probe.py (same size puts, after
compiling/running a chain and holding weights) measured 337 ms (~30
MB/s) minutes into the process on a grant that calibrated at 442 MB/s.
And every bench window's per-call transfer (240-824 ms) was measured
late in a big process holding ~350 MB of params + executables. This
probe isolates the suspects in one process:

  t0:        cold puts, fresh process                (baseline)
  t+alloc:   after holding 1.5 GB of device arrays
  t+exec:    after 20 execs of a small jitted chain (program traffic)
  t+free:    after dropping the 1.5 GB
  t+idle60:  after 60 s of idleness (age, not allocation)

Run on TPU: python scripts/probes/_link_decay_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

NBYTES = int(10.2 * (1 << 20))


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    jax.block_until_ready(jax.device_put(np.zeros(1024, np.uint8)))

    def put_rate(tag):
        times = []
        for _ in range(3):
            buf = np.frombuffer(os.urandom(NBYTES), np.uint8)
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(buf))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(f"{tag:10s}: {[f'{t*1e3:.0f}' for t in times]} ms  "
              f"median {NBYTES/med/1e6:.0f} MB/s", flush=True)

    put_rate("t0")

    held = [jax.device_put(np.frombuffer(os.urandom(128 << 20), np.uint8))
            for _ in range(12)]     # 1.5 GB live
    jax.block_until_ready(held)
    put_rate("t+alloc")

    d = 1024
    w = jnp.asarray(np.random.RandomState(0).randn(d, d).astype(np.float32)
                    * 0.01)

    @jax.jit
    def chain(x):
        for _ in range(32):
            x = jnp.tanh(x @ w)
        return x

    x = jnp.asarray(np.random.RandomState(1).randn(8, d).astype(np.float32))
    for _ in range(20):
        x = chain(x)
    jax.block_until_ready(x)
    put_rate("t+exec")

    del held
    put_rate("t+free")

    time.sleep(60)
    put_rate("t+idle60")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
