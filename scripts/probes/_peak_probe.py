"""Establish the chip's TRUE peak rate with verifiable, un-replayable work.

Round-2/3 forward timings cluster at two levels: ~7.5-8 ms and ~89 ms
per 5.018-TFLOP batch. Under the v5e assumption (197 TFLOPS peak) the
fast level is impossible and was attributed to the relay's replay state.
But the fast draws VARY with program content (matmul-lowered forward is
consistently ~25% slower than conv-lowered) and across calls (2-14 ms),
which replay would not. If the part is actually v6e-class (~918 TFLOPS
bf16), the fast level is real at ~65% MFU and the slow level is the
degraded tenancy regime.

Anti-replay design:
* fresh random inputs per call, never repeated;
* work scaling: the same program shape at chain lengths N and 2N must
  take ~2x the time if execution is real (a replay returns in constant
  time regardless);
* correctness: random rows of a single matmul product are checked
  against a host computation, so the relay can't fake results.

Run on TPU: python scripts/probes/_peak_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return time.perf_counter() - t0


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()   # roll off degraded grants
    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))

    # 1) Single big matmul, host-verified rows.
    d = 8192
    a = rng.randn(d, d).astype(np.float32) * 0.05
    b = rng.randn(d, d).astype(np.float32) * 0.05

    @jax.jit
    def mm(a, b):
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    da, db = jax.device_put(a), jax.device_put(b)
    rows = rng.randint(0, d, 4)
    # Fetch ONLY the checked rows (the full 256 MB product would take
    # minutes over a bad link draw).
    out = np.asarray(mm(da, db)[rows])
    # Host reference with the same bf16 input rounding; normalize by the
    # row RMS (element-wise relative error is meaningless where the dot
    # products cancel to ~0).
    a16 = np.asarray(jnp.asarray(a[rows], jnp.bfloat16), np.float32)
    b16 = np.asarray(jnp.asarray(b, jnp.bfloat16), np.float32)
    want = a16 @ b16
    err = (np.max(np.abs(out - want), axis=1)
           / np.sqrt(np.mean(want ** 2, axis=1)))
    print(f"matmul correctness: max err/rowRMS {np.max(err):.3e} "
          f"({'OK' if np.max(err) < 0.05 else 'WRONG RESULTS'})",
          flush=True)

    # 2) Work scaling on a dependent matmul chain (bf16, MXU).
    flop_per_step = 2 * d * d * d / 1e12   # 1.10 TFLOP
    for n in (8, 16, 32):
        @jax.jit
        def chain(x, w, n=n):
            def body(c, _):
                c = jnp.tanh(c @ w)   # dependency: no parallel collapse
                return c, ()
            y, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(y)

        x = jax.device_put(jnp.asarray(rng.randn(d, d) * 0.05, jnp.bfloat16))
        w = jax.device_put(jnp.asarray(rng.randn(d, d) * 0.05, jnp.bfloat16))
        dt = timed(chain, x, w)  # includes compile
        dts = []
        for _ in range(3):
            x = jax.device_put(jnp.asarray(rng.randn(d, d) * 0.05, jnp.bfloat16))
            dts.append(timed(chain, x, w))
        med = float(np.median(dts))
        print(f"chain n={n}: median {med*1e3:.1f} ms -> "
              f"{n*flop_per_step/med:.0f} TFLOPS "
              f"[{', '.join(f'{t*1e3:.0f}' for t in dts)}]", flush=True)

    # 3) Same for convs (the forward's op mix).
    cw = jax.device_put(jnp.asarray(rng.randn(3, 3, 256, 256) * 0.02, jnp.bfloat16))
    conv_flop = 2 * 16 * 128 * 208 * 9 * 256 * 256 / 1e12   # 0.50 TFLOP
    for n in (8, 16, 32):
        @jax.jit
        def cchain(x, w, n=n):
            def body(c, _):
                y = jax.lax.conv_general_dilated(
                    c, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.maximum(y, 0), ()
            y, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(y)

        x = jax.device_put(
            jnp.asarray(rng.randn(16, 128, 208, 256) * 0.05, jnp.bfloat16))
        dt = timed(cchain, x, cw)
        dts = []
        for _ in range(3):
            x = jax.device_put(
                jnp.asarray(rng.randn(16, 128, 208, 256) * 0.05, jnp.bfloat16))
            dts.append(timed(cchain, x, cw))
        med = float(np.median(dts))
        print(f"conv chain n={n}: median {med*1e3:.1f} ms -> "
              f"{n*conv_flop/med:.0f} TFLOPS "
              f"[{', '.join(f'{t*1e3:.0f}' for t in dts)}]", flush=True)


if __name__ == "__main__":
    main()
