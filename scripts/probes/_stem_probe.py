"""Decompose the stem's 4.7 ms/call: 7x7/2 conv vs 3x3/2 maxpool vs
layout. The section probe (_fused_block_probe) showed stem at 3% MFU and
the exact s2d rewrite SLOWER (66.6 vs 56.9 ms/12) — so lane starvation
isn't the wall. Candidates: the reduce_window maxpool, the conv itself,
or input relayout. Chains feed a scalar of the output back into the
input (shape changes across the op).

Run on TPU twice: python scripts/probes/_stem_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0
ITERS = 6
BATCH = 16
N = 12


def measure(tag, fn, streams, tflop_per_call):
    min_ms = tflop_per_call / PEAK_TFLOPS * 1e3
    t0 = time.perf_counter()
    try:
        jax.block_until_ready(fn(streams[0]))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(streams[i + 1]) for i in range(ITERS)]
    jax.block_until_ready(outs)
    win_ms = (time.perf_counter() - t0) * 1e3 / ITERS
    sums = [float(o) for o in outs]
    if len(set(sums)) == 1:
        print(f"{tag}: IDENTICAL outputs -> replay, unusable", flush=True)
        return None
    if win_ms < min_ms:
        print(f"{tag}: {win_ms:.1f} ms < {min_ms:.1f} floor -> replay",
              flush=True)
        return None
    print(f"{tag}: {win_ms:.1f} ms/call ({win_ms/N:.2f} ms/op; compile "
          f"{compile_s:.0f}s)", flush=True)
    return win_ms


def chain(body, shape_in):
    @jax.jit
    def run(x):
        def step(c, _):
            y = body(c)
            return c * (0.99 + 0.01 * jnp.tanh(jnp.mean(
                y.astype(jnp.float32)).astype(c.dtype))), ()
        y, _ = jax.lax.scan(step, x, None, length=N)
        return jnp.sum(y.astype(jnp.float32))

    return run


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()
    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    results = {}

    w = jax.device_put((rng.randn(7, 7, 3, 64) * 0.05).astype(jnp.bfloat16))
    w16 = jax.device_put(
        (rng.randn(7, 7, 16, 64) * 0.05).astype(jnp.bfloat16))

    def conv_only(c):
        return jax.lax.conv_general_dilated(
            c, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv16_only(c):
        """Same conv but Cin=16 (channel-padded input): isolates whether
        Cin=3 itself is the tax. 5.3x the FLOPs of Cin=3."""
        return jax.lax.conv_general_dilated(
            c, w16, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def pool_only(c):
        return jax.lax.reduce_window(
            c, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    conv_tflop = 2 * BATCH * 256 * 416 * 49 * 3 * 64 * N / 1e12

    xs3 = [jax.device_put(rng.randn(BATCH, 512, 832, 3)
                          .astype(jnp.bfloat16)) for _ in range(ITERS + 1)]
    jax.block_until_ready(xs3)
    results["conv3"] = measure("stem conv Cin=3", chain(conv_only, None),
                               xs3, conv_tflop)
    del xs3

    xs16 = [jax.device_put(rng.randn(BATCH, 512, 832, 16)
                           .astype(jnp.bfloat16)) for _ in range(ITERS + 1)]
    jax.block_until_ready(xs16)
    results["conv16"] = measure("stem conv Cin=16",
                                chain(conv16_only, None), xs16,
                                conv_tflop * 16 / 3)
    del xs16

    xp = [jax.device_put(rng.randn(BATCH, 256, 416, 64)
                         .astype(jnp.bfloat16)) for _ in range(ITERS + 1)]
    jax.block_until_ready(xp)
    results["pool"] = measure("maxpool 3x3/2 @256x416x64",
                              chain(pool_only, None), xp, 0.0)

    def pool_1d(c):
        """3x3/2 pool as 3x1/2 then 1x3/2 (separable max)."""
        y = jax.lax.reduce_window(
            c, -jnp.inf, jax.lax.max, (1, 3, 1, 1), (1, 2, 1, 1),
            [(0, 0), (1, 1), (0, 0), (0, 0)])
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 1, 3, 1), (1, 1, 2, 1),
            [(0, 0), (0, 0), (1, 1), (0, 0)])

    results["pool_1d"] = measure("maxpool separable 3x1+1x3",
                                 chain(pool_1d, None), xp, 0.0)
    del xp

    # Fused Pallas stem (conv+bias+relu+pool in VMEM) from the double-s2d
    # layout, vs the same including the layout transpose in-program.
    from smap_tpu.ops.fused_stem import double_space_to_depth, fused_stem

    bias = jax.device_put((rng.randn(64) * 0.1).astype(np.float32))
    w7 = jax.device_put((rng.randn(7, 7, 3, 64) * 0.05).astype(jnp.bfloat16))

    def fused_from_s2d(c):
        return fused_stem(c, w7, bias)

    def fused_with_s2d(c):
        return fused_stem(double_space_to_depth(c), w7, bias)

    xs2d = [jax.device_put(np.asarray(
        double_space_to_depth(jnp.asarray(
            rng.randn(BATCH, 512, 832, 3)
            .astype(np.float32))).astype(jnp.bfloat16)))
        for _ in range(ITERS + 1)]
    jax.block_until_ready(xs2d)
    results["fused_stem(s2d in)"] = measure(
        "fused_stem (pre-s2d input)", chain(fused_from_s2d, None), xs2d,
        conv_tflop)
    del xs2d

    xs3b = [jax.device_put(rng.randn(BATCH, 512, 832, 3)
                           .astype(jnp.bfloat16)) for _ in range(ITERS + 1)]
    jax.block_until_ready(xs3b)
    results["fused_stem(+s2d)"] = measure(
        "fused_stem (s2d in-program)", chain(fused_with_s2d, None), xs3b,
        conv_tflop)

    def conv_pool(c):
        return pool_only(conv_only(c))

    results["conv+pool baseline"] = measure(
        "conv+pool baseline", chain(conv_pool, None), xs3b, conv_tflop)
    del xs3b

    print("RESULT", {k: (round(v, 1) if v else None)
                     for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
