"""Per-call cost vs ARGUMENT/RESULT handle count on the relay.

Round-5: _output_bytes_probe.py showed result BYTES are free (768 MB at
the 25 ms floor) but multi64 (64 result handles) added ~3-5 ms, and
_step_scaling_probe.py's standalone Adam measured 160 ms (tree,
~1500 arg + 900 result handles) vs 128 ms (flat opt_state, ~900 + 300)
for ~2 ms of real HBM work — both consistent with a ~0.05 ms/handle
marshaling cost. This probe pins the coefficient: a trivial elementwise
program over a pytree of N float32 leaves (fixed 64 MB total bytes),
N in {1, 16, 128, 512, 1024}, N handles in AND out.

If per-handle cost confirms at ~0.05 ms, the levers are obvious: ravel
the train state across step calls (flax param trees are ~700 leaves)
and pass the inference variables as one raveled vector + unravel inside
the jit (free to XLA: slices/reshapes fuse).

Run on TPU: python scripts/probes/_handle_count_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

TOTAL_MB = 64
NS = (1, 16, 128, 512, 1024)
CALLS = 5


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

    total = TOTAL_MB * (1 << 20) // 4
    rng = np.random.RandomState(0)
    big = None
    for n in NS:
        leaf = total // n
        f = jax.jit(lambda xs: [x + 1.0 for x in xs])
        if big is None:
            import jax as _jax

            big = _jax.device_put(rng.rand(total).astype(np.float32))
        split = jax.jit(lambda x, j, n=n, leaf=leaf: [
            x[i * leaf:(i + 1) * leaf] + j for i in range(n)])
        # CALLS distinct input pytrees, device-resident before timing.
        pools = [jax.block_until_ready(split(big, float(j)))
                 for j in range(CALLS)]
        jax.block_until_ready(f(pools[0]))   # compile outside the window
        times = []
        for j in range(CALLS):
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(pools[j]))
            times.append((time.perf_counter() - t0) * 1e3)
            del out
        med = float(np.median(times))
        print(f"N={n:5d} handles ({leaf*4>>10} KiB/leaf): {med:7.1f} ms  "
              f"raw={[f'{t:.0f}' for t in times]}", flush=True)
        del pools
        jax.clear_caches()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
