"""Re-certify adaptive-ladder rung latencies (VERDICT r2 weak item 5).

postprocess_full at each peak capacity, windowed (all distinct-input
calls enqueued, one final block — the production dispatch pattern),
dense synthetic peaks saturating every rung. The round-2 rung-8 value
(0.6 ms) came from a window later shown to replay EVERY capacity at
~0.6 ms; this probe flags sub-floor windows and must be run across >= 2
separate grants (separate process invocations) before any number is
recorded.

Run on TPU: python scripts/probes/_rung_latency_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 16
ITERS = 5
CAPS = (8, 16, 40, 127)
# Not FLOP-bound (the PAF Pallas kernel is opaque to cost analysis); the
# floor is the per-program dispatch cost. Anything under ~1 ms for a
# batch-16 postprocess program is a replay, not execution.
MIN_MS = 1.0


def _reexec(reason: str, max_tries: int = 4) -> None:
    tries = int(os.environ.get("SMAP_PROBE_TRY", "0"))
    if tries >= max_tries:
        print(f"# {reason}; out of re-rolls — giving up", flush=True)
        sys.exit(0)
    os.environ["SMAP_PROBE_TRY"] = str(tries + 1)
    # Give the fresh process its full calibration re-roll budget (an
    # inherited exhausted counter would accept a degraded grant silently).
    os.environ["SMAP_BENCH_TRY"] = "0"
    print(f"# {reason}; re-rolling grant (try {tries + 1})", flush=True)
    sys.stdout.flush()
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()

    import dataclasses

    from smap_tpu.config import Config, PostProcessConfig
    from smap_tpu.ops.postprocess import ScaleInfo, postprocess_batch

    cfg = Config()
    H, W = cfg.output_shape
    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    info = ScaleInfo(*(jnp.full((BATCH,), v, jnp.float32) for v in
                       (0.433, 1920.0, 1080.0, 1500.0, 1500.0, 960.0,
                        540.0)))

    def make_maps():
        # Dense random maps: noise produces peak counts that saturate
        # every rung, so every capacity does its full work.
        return (jnp.asarray(rng.rand(BATCH, H, W, 43).astype(np.float32)
                            * 255.0),
                jnp.asarray(rng.randn(BATCH, H, W, 14).astype(np.float32)),
                jnp.asarray(rng.rand(BATCH, H, W, 1).astype(np.float32)))

    for cap in CAPS:
        pcfg = dataclasses.replace(PostProcessConfig(), assoc_peaks=cap)

        def post(m2, m3, mr, s, _pcfg=pcfg):
            return postprocess_batch(m2, m3, mr, s, _pcfg,
                                     net_w=float(cfg.input_shape[1]),
                                     net_h=float(cfg.input_shape[0]),
                                     stride=cfg.stride)

        jit_post = jax.jit(post)
        staged = [jax.tree.map(jax.device_put, make_maps())
                  for _ in range(ITERS + 1)]
        jax.block_until_ready(staged)
        t0 = time.perf_counter()
        jax.block_until_ready(jit_post(*staged[0], info))
        print(f"cap={cap}: compile+first {time.perf_counter()-t0:.1f} s",
              flush=True)
        t0 = time.perf_counter()
        outs = [jit_post(*staged[i + 1], info) for i in range(ITERS)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) * 1e3 / ITERS
        # Content check: distinct random maps must decode differently.
        sums = [float(jnp.sum(o.bodies_2d)) + float(jnp.sum(o.count))
                for o in outs]
        if ms < MIN_MS or len(set(sums)) == 1:
            _reexec(f"cap={cap}: window {ms:.2f} ms "
                    f"({'identical outputs' if len(set(sums)) == 1 else 'sub-floor'})"
                    f" -> replay state")
        print(f"cap={cap}: {ms:.1f} ms/batch-{BATCH}", flush=True)


if __name__ == "__main__":
    main()
