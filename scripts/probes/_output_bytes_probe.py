"""Does per-call execution cost scale with program OUTPUT bytes?

Round-5 follow-up to _opt_flatten_probe.py: the full train step carries a
~170-215 ms batch-independent overhead over its fwd+bwd section even on
healthy-classified grants, and flattening the opt_state (900 -> ~10
result handles, SAME bytes) moved nothing. Remaining hypothesis: the
relay charges per-call time proportional to result BYTES (~4-5 GB/s
would explain 172 ms for the ~900 MB TrainState output). This probe
times trivial programs that isolate the three candidate drivers:

  gen(key)  -> S bytes out, ~8 B in        (output bytes, no input)
  add(x)    -> S bytes out, S bytes in     (output + input bytes)
  tsum(x)   -> 4 bytes out, S bytes in     (input bytes only)
  multi(x)  -> S bytes out in 64 handles   (handle count at fixed bytes)

at S in {64, 256, 768} MB. If gen/add scale at ~0.2 ms/MB while tsum
stays flat, the step's overhead is its output-state bytes and the fix is
fewer state bytes (bf16 Adam moments) — donation, the normal fix, is
150x-degraded on this relay (docs/perf_notes.md round-3 item 10).

Run on TPU: python scripts/probes/_output_bytes_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

SIZES_MB = (64, 256, 768)
CALLS = 5


def _time_calls(fn, args_iter, n=CALLS):
    times = []
    for _ in range(n):
        import jax

        a = next(args_iter)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*a))
        times.append((time.perf_counter() - t0) * 1e3)
        del out
    return float(np.median(times)), times


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

    for size_mb in SIZES_MB:
        n = size_mb * (1 << 20) // 4
        gen = jax.jit(lambda k, n=n: jax.random.uniform(k, (n,),
                                                        jnp.float32))
        add = jax.jit(lambda x: x + 1.0)
        tsum = jax.jit(lambda x: jnp.sum(x))

        def _multi(x):
            parts = [p + 1.0 for p in jnp.split(x, 64)]
            return tuple(parts)

        multi = jax.jit(_multi)

        # Warm all four compiles outside the timed region.
        keys = iter(jax.random.split(jax.random.PRNGKey(0), 64))
        x0 = jax.block_until_ready(gen(next(keys)))
        for f in (add, tsum, multi):
            jax.block_until_ready(f(x0))

        def key_args():
            for k in keys:
                yield (k,)

        ms_gen, raw_gen = _time_calls(gen, key_args())
        # Distinct input per timed call: the relay replays known
        # (program, input) pairs near-instantly (CLAUDE.md), so a cycled
        # pool shorter than CALLS would fake the later calls.
        xs = [jax.block_until_ready(gen(k))
              for k in jax.random.split(jax.random.PRNGKey(1), CALLS)]

        def cycle_xs():
            i = 0
            while True:
                yield (xs[i % len(xs)],)
                i += 1

        ms_add, raw_add = _time_calls(add, cycle_xs())
        ms_sum, raw_sum = _time_calls(tsum, cycle_xs())
        ms_multi, raw_multi = _time_calls(multi, cycle_xs())
        del xs, x0
        for name, med, raw in (("gen", ms_gen, raw_gen),
                               ("add", ms_add, raw_add),
                               ("sum", ms_sum, raw_sum),
                               ("multi64", ms_multi, raw_multi)):
            rate = size_mb / med * 1e3 if med > 0 else 0.0
            print(f"S={size_mb:4d} MB {name:8s}: {med:7.1f} ms "
                  f"({rate:7.0f} MB/s-of-S)  raw={[f'{t:.0f}' for t in raw]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
