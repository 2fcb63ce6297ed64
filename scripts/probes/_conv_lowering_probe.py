"""A/B the conv lowering of the full infer program on the real TPU.

The forward runs at ~56 TFLOPS with XLA's native conv lowering — exactly
the ~58 TFLOPS the conv-chain probe measures, i.e. the program is at the
conv lowering's speed-of-light, while healthy plain-matmul draws reach
~100+ TFLOPS. If the shifted-matmul lowering (`SMAP_TPU_CONV_IMPL=
matmul`, smap_tpu/models/layers.py:matmul_conv2d) inherits the matmul
rate, the forward gets ~2x faster. Replay-guarded: distinct inputs per
call, any draw under the 25.5 ms physical floor (5.018 TFLOP at 197
TFLOPS peak) is discarded; trust only numbers that reproduce across
separate grants (run this twice).

Run on TPU: python scripts/probes/_conv_lowering_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

FORWARD_TFLOP = 5.018          # batch 16 infer program (_flops_probe.py)
PEAK_TFLOPS = 197.0
MIN_MS = FORWARD_TFLOP / PEAK_TFLOPS * 1e3
BATCH = 16
ITERS = 6


def measure(tag, fn, variables, streams, min_ms=MIN_MS):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(variables, streams[0]))
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f} s",
          flush=True)
    # Windowed: enqueue all distinct-input calls, one final block. Harder
    # for the relay to fake than per-call blocking, and it is exactly the
    # production dispatch pattern.
    t0 = time.perf_counter()
    outs = [fn(variables, streams[i + 1]) for i in range(ITERS)]
    jax.block_until_ready(outs)
    win_ms = (time.perf_counter() - t0) * 1e3 / ITERS
    # Replay detection by CONTENT: distinct inputs must give distinct
    # outputs; a replayed window returns one cached result for all.
    sums = [float(jnp.sum(jnp.abs(o[0]))) for o in outs]
    if len(set(sums)) == 1:
        print(f"{tag}: IDENTICAL outputs for distinct inputs -> replay "
              f"state, window unusable", flush=True)
        return None
    # Per-call, for comparison/diagnosis (fresh inputs — the windowed pass
    # already consumed streams[1:ITERS+1]).
    times = []
    for i in range(ITERS):
        x = streams[ITERS + 1 + i]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(variables, x))
        dt = (time.perf_counter() - t0) * 1e3
        times.append(dt)
    print(f"{tag}: window {win_ms:.1f} ms/call; per-call "
          f"[{', '.join(f'{t:.0f}' for t in times)}]", flush=True)
    if win_ms < min_ms:
        print(f"{tag}: window {win_ms:.1f} ms < {min_ms:.1f} physical "
              f"floor -> replay state, window unusable", flush=True)
        return None
    print(f"{tag}: {win_ms:.1f} ms/batch-{BATCH} "
          f"({FORWARD_TFLOP/(win_ms/1e3):.1f} TFLOPS, "
          f"{BATCH/(win_ms/1e3):.0f} img/s)", flush=True)
    return win_ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()   # roll off degraded grants

    from smap_tpu.config import Config
    from smap_tpu.models import layers
    from smap_tpu.models.smap import SMAP

    cfg = Config()
    model = SMAP(cfg.model)
    variables = jax.jit(lambda k, x: model.init(k, x))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    # Distinct device-resident inputs, one per call, never repeated (the
    # relay replays repeated (program, input) pairs; transfer excluded
    # from the timing).
    streams = [jax.device_put(rng.randn(BATCH, *cfg.input_shape, 3)
                              .astype(np.float32))
               for _ in range(2 * ITERS + 1)]
    jax.block_until_ready(streams)

    results = {}
    impls = sys.argv[1:] or ["xla", "matmul"]
    for impl in impls:
        if impl == "int8":
            # Full int8-quantized forward (BN folded, dynamic act quant):
            # the honest end-to-end test of the --int8 serving mode.
            import dataclasses

            from smap_tpu.models.quantize import quantize_variables

            qvars = jax.jit(quantize_variables)(variables)
            qmodel = SMAP(dataclasses.replace(cfg.model, quantized=True))

            def qfwd(v, x):
                return qmodel.apply(v, x, method=SMAP.infer)

            # int8 peak is 2x bf16 on v5e -> the physical floor halves.
            results[impl] = measure("conv=int8", jax.jit(qfwd), qvars,
                                    streams, min_ms=MIN_MS / 2)
            continue
        layers.CONV_IMPL = impl

        def fwd(v, x, _impl=impl):   # fresh identity -> fresh jit cache
            return model.apply(v, x, method=SMAP.infer)

        results[impl] = measure(f"conv={impl}", jax.jit(fwd), variables,
                                streams)
    print("RESULT", results, flush=True)


if __name__ == "__main__":
    main()
