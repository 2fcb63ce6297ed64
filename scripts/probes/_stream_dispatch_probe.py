"""Does the ladder's COUNT dispatch cost a relay floor in run_stream?

Round-5 serving follow-up (VERDICT r4 item 2/3 context): the pipelined
e2e loop runs ~250 ms/batch-16 while the device pipeline (fwd+post
back-to-back) measures ~80-100 ms and the transfer leg ~10-20 ms. The
gap is per-batch dispatch/queueing. run_stream issues THREE program
dispatches per batch (forward, peak-count, post) plus the transfer; the
synchronous per-call floor on this relay is ~25 ms
(_output_bytes_probe.py), but whether back-to-back ASYNC dispatches
also pay it is unmeasured. This probe times the identical pipelined
loop with and without the count dispatch (rung pinned either way, same
post program), interleaved A/B on one grant:

  stream3: place + forward + counts + post + deferred resolve
           (exactly SMAPInference.run_stream)
  stream2: place + forward + post, rung pinned (no counts, no resolve)
  device2: forward + post on pre-placed inputs (device-pipeline ref)

If stream3 - stream2 >= ~15 ms/batch, folding the count into the
forward program (one dispatch fewer) is worth a product change.

Run on TPU: python scripts/probes/_stream_dispatch_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

BATCH = 16
ITERS = 18
N_STREAMS = 18   # one distinct input batch per pipelined iteration
                 # (repeated (program, input) pairs can replay near-
                 # instantly on this relay — bench.py uses the same rule)


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

    from bench import sparsify_variables
    from smap_tpu.config import Config
    from smap_tpu.data.preprocess import bgr_to_i420
    from smap_tpu.inference import SMAPInference
    from smap_tpu.models.smap import SMAP

    cfg = Config()
    model = SMAP(cfg.model)
    t0 = time.perf_counter()
    variables = jax.jit(lambda k, x: model.init(k, x))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
    variables = jax.jit(sparsify_variables)(variables)
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (N_STREAMS, BATCH, *cfg.input_shape, 3),
                         np.uint8)
    streams = [np.stack([bgr_to_i420(f) for f in b]) for b in frames]
    scales = [{"scale": 0.433, "img_width": 1920.0, "img_height": 1080.0,
               "f_x": 1500.0, "f_y": 1500.0, "cx": 960.0, "cy": 540.0}
              for _ in range(BATCH)]

    engine = SMAPInference(variables, cfg, adaptive_capacities=(8, 16, 40))
    scale_info = jax.tree.map(jnp.asarray, engine._make_scale_info(scales))

    # Warm: settle the rung and compile forward/counts/post outside the
    # timed windows (bench.py's warm-start recipe).
    t0 = time.perf_counter()
    x0, info0 = engine._place(streams[-1], scale_info)
    maps0 = engine._jit_forward(engine.variables, x0)
    n0 = int(engine._jit_counts(maps0[0]))
    engine._spec_cap = engine._rung_for(n0)
    rung = engine._spec_cap
    post = engine._post_program(rung, donate=False)
    jax.block_until_ready(post(engine.refine_variables, *maps0, info0))
    print(f"warm {time.perf_counter()-t0:.0f}s, rung {rung}", flush=True)

    def salt():
        for s in streams:
            s += np.uint8(1)

    def stream3():
        feed = ((streams[i % N_STREAMS], scale_info) for i in range(ITERS))
        t0 = time.perf_counter()
        results = list(engine.run_stream(feed))
        jax.block_until_ready(results)
        return (time.perf_counter() - t0) * 1e3 / ITERS, results

    def stream2():
        t0 = time.perf_counter()
        results = []
        pending = None
        for i in range(ITERS):
            x, info = engine._place(streams[i % N_STREAMS], scale_info)
            maps = engine._jit_forward(engine.variables, x)
            item = post(engine.refine_variables, *maps, info)
            if pending is not None:
                results.append(pending)
            pending = item
        results.append(pending)
        jax.block_until_ready(results)
        return (time.perf_counter() - t0) * 1e3 / ITERS, results

    def device2():
        placed = []
        for i in range(ITERS):
            x, info = engine._place(streams[i % N_STREAMS], scale_info)
            placed.append((jax.block_until_ready(x), info))
        t0 = time.perf_counter()
        results = []
        for i in range(ITERS):
            x, info = placed[i % len(placed)]
            maps = engine._jit_forward(engine.variables, x)
            results.append(post(engine.refine_variables, *maps, info))
        jax.block_until_ready(results)
        return (time.perf_counter() - t0) * 1e3 / ITERS, results

    # Raveled-variables arm: the variables tree is 1608 leaves, and the
    # relay appears to charge per arg/result HANDLE (~0.05 ms each:
    # standalone Adam 160 ms for ~2 ms of HBM work, multi64 +3-5 ms in
    # _output_bytes_probe.py). One flat f32 vector + unravel inside the
    # jit makes the forward a 2-arg program; XLA sees the same graph.
    from jax.flatten_util import ravel_pytree

    flat_vars, unravel = ravel_pytree(engine.variables)
    flat_vars = jax.block_until_ready(jax.device_put(flat_vars))

    def fwd_flat_fn(fv, images):
        return engine._forward(unravel(fv), images)

    fwd_flat = jax.jit(fwd_flat_fn)
    t0 = time.perf_counter()
    jax.block_until_ready(fwd_flat(flat_vars, x0))
    print(f"flat-vars forward compile {time.perf_counter()-t0:.0f}s",
          flush=True)

    def device2_flat():
        placed = []
        for i in range(ITERS):
            x, info = engine._place(streams[i % N_STREAMS], scale_info)
            placed.append((jax.block_until_ready(x), info))
        t0 = time.perf_counter()
        results = []
        for i in range(ITERS):
            x, info = placed[i % len(placed)]
            maps = fwd_flat(flat_vars, x)
            results.append(post(engine.refine_variables, *maps, info))
        jax.block_until_ready(results)
        return (time.perf_counter() - t0) * 1e3 / ITERS, results

    arms = {"stream3": stream3, "stream2": stream2, "device2": device2,
            "device2flat": device2_flat}
    times = {k: [] for k in arms}
    for rnd in range(3):
        for name, fn in arms.items():
            salt()
            ms, results = fn()
            sums = {float(jnp.sum(jnp.abs(r.bodies_2d)) + jnp.sum(r.count))
                    for r in results}
            tag = " [REPLAY? identical outputs]" if len(sums) == 1 else ""
            times[name].append(ms)
            print(f"round {rnd} {name}: {ms:.1f} ms/batch "
                  f"({BATCH/ms*1e3:.0f} img/s){tag}", flush=True)
            del results
    for name, ts in times.items():
        med = float(np.median(ts))
        print(f"RESULT {name}: {med:.1f} ms/batch = {BATCH/med*1e3:.0f} "
              f"img/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
