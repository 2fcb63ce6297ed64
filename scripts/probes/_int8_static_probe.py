"""Static vs dynamic int8 serving forward, same grant (VERDICT r3 item 4).

Round-3 anchored plain-bf16 vs dynamic-int8 on 2 grants: int8 ~9% SLOWER
(this runtime's XLA does not lower int8 convs onto the int8 MXU path,
and the per-conv dynamic abs-max reductions serialize between convs —
perf_notes item 9). Static calibration removes exactly those reductions,
so it is the one int8 variant with a mechanism for winning here. This
probe measures the full `SMAP.infer` program at the deployment shape
(batch 16, 512x832) with dynamic-quant variables vs calibrated static
variables, content-verified with the 5.018-TFLOP physics floor.

Run on TPU twice: python scripts/probes/_int8_static_probe.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0
FWD_TFLOP = 5.018    # full infer program, batch 16 (_flops_probe.py)
ITERS = 4
BATCH = 16
N = 2                # dependent infer reps per call


def measure(tag, fn, v, streams, tflop_per_call):
    min_ms = tflop_per_call / PEAK_TFLOPS * 1e3
    t0 = time.perf_counter()
    try:
        jax.block_until_ready(fn(v, streams[0]))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(v, streams[i + 1]) for i in range(ITERS)]
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
    print(f"{tag}: {win_ms:.1f} ms/call ({win_ms/N:.1f} ms/infer; compile "
          f"{compile_s:.0f}s)", flush=True)
    return win_ms


def infer_chain(model):
    from smap_tpu.models.smap import SMAP

    @jax.jit
    def run(v, x):
        def step(c, _):
            o2d, o3d, ord_ = model.apply(v, c, method=SMAP.infer)
            s = (jnp.mean(o2d) + jnp.mean(o3d)
                 + jnp.mean(ord_)).astype(jnp.float32)
            return c * (0.99 + 0.01 * jnp.tanh(s)).astype(c.dtype), ()
        c, _ = jax.lax.scan(step, x, None, length=N)
        return jnp.sum(c.astype(jnp.float32))

    return run


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()
    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))

    from smap_tpu.config import Config
    from smap_tpu.models.quantize import (calibrate_activation_scales,
                                          quantize_variables)
    from smap_tpu.models.smap import SMAP

    cfg = Config()
    model = SMAP(cfg.model)
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
    qvars = jax.jit(quantize_variables)(variables)
    jax.block_until_ready(qvars)
    print(f"init+quantize {time.perf_counter() - t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    calib = jnp.asarray(rng.randn(1, *cfg.input_shape, 3), jnp.float32)
    svars = calibrate_activation_scales(qvars, cfg.model, calib)
    jax.block_until_ready(svars)
    print(f"calibration {time.perf_counter() - t0:.0f}s", flush=True)

    streams = [jax.device_put(rng.randn(BATCH, *cfg.input_shape, 3)
                              .astype(np.float32)) for _ in range(ITERS + 1)]
    jax.block_until_ready(streams)

    dyn = SMAP(dataclasses.replace(cfg.model, quantized=True))
    sta = SMAP(dataclasses.replace(cfg.model, quantized="static"))
    results = {
        "bf16": measure(f"bf16 b{BATCH} x{N}", infer_chain(model),
                        variables, streams, FWD_TFLOP * N),
        "dynamic": measure(f"int8 dynamic b{BATCH} x{N}", infer_chain(dyn),
                           qvars, streams, FWD_TFLOP * N),
        "static": measure(f"int8 static b{BATCH} x{N}", infer_chain(sta),
                          svars, streams, FWD_TFLOP * N),
    }
    print("RESULT", {k: (round(v / N, 1) if v else None)
                     for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
