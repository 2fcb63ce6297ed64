"""Decompose the train-step slowdown: which piece hits the degraded regime?

Across 7+ grants the full jitted train step ran 27-66 s/step at b=2
(~0.07 TFLOPS — the pool's degraded regime) while the same grants'
calibration probes AND the inference forward (~90 ms, similar op count
and the same 160 MB params) were healthy. This probe times the step's
pieces as separate programs on one grant, windowed and content-verified:

  labels    on-device label synthesis only (vmap synthesize_labels)
  fwd       train-mode forward + loss (no grad, BN mutation included)
  step      the production program (make_jitted_train_step, labels in-step)
  scan4     4 steps per execution (make_jitted_multi_step) — if the cost
            is per-EXECUTION (relay queueing of long executables), the
            per-step cost drops ~4x; if the program itself executes in
            the degraded regime, it won't.

Run on TPU: python scripts/probes/_train_decomp_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
ITERS = 4
TRAIN_TFLOP_PER_IMG = 1.1164   # _flops_probe.py --train
FWD_TFLOP_PER_IMG = 0.36       # all-heads train forward (approx)
PEAK_TFLOPS = 197.0


def _mk_batch(rng, cfg):
    from smap_tpu.parallel.mesh import shard_batch
    from smap_tpu.train.step import TrainBatch

    h, w = cfg.input_shape
    bodys = np.zeros((BATCH, cfg.train.max_people, 15, 11), np.float32)
    bodys[..., 0] = rng.uniform(0, w - 1, bodys.shape[:3])
    bodys[..., 1] = rng.uniform(0, h - 1, bodys.shape[:3])
    bodys[..., 2] = rng.uniform(100, 400, bodys.shape[:3])
    bodys[..., 3] = rng.randint(0, 3, bodys.shape[:3])
    bodys[..., 7] = 1100.0
    return TrainBatch(images=rng.randn(BATCH, h, w, 3).astype(np.float32),
                      bodys=bodys,
                      valids=np.ones((BATCH, 57), np.float32),
                      scales=np.full((BATCH,), 0.5, np.float32))


def _window(tag, run, inputs, content, min_ms):
    """Windowed timing over distinct inputs with content replay check."""
    t0 = time.perf_counter()
    jax.block_until_ready(run(inputs[0]))
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    outs = [run(x) for x in inputs[1:]]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) * 1e3 / len(outs)
    sums = [content(o) for o in outs]
    if len(set(sums)) == 1:
        print(f"{tag}: IDENTICAL outputs -> replay, unusable", flush=True)
        return None
    if ms < min_ms:
        print(f"{tag}: {ms:.1f} ms < {min_ms:.1f} floor -> replay, "
              f"unusable", flush=True)
        return None
    print(f"{tag}: {ms:.1f} ms/call (b={BATCH})", flush=True)
    return ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()

    from smap_tpu.config import Config
    from smap_tpu.data.labels import synthesize_labels
    from smap_tpu.losses import smap_loss
    from smap_tpu.models.smap import SMAP
    from smap_tpu.parallel.mesh import make_mesh, shard_batch
    from smap_tpu.train.solver import make_optimizer
    from smap_tpu.train.step import (create_train_state,
                                     make_jitted_multi_step,
                                     make_jitted_train_step)

    cfg = Config()
    model = SMAP(cfg.model)
    variables = jax.jit(lambda k, x: model.init(k, x))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
    mesh = make_mesh(jax.devices()[:1])
    tx = make_optimizer(cfg.train, 1)
    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    batches = [shard_batch(_mk_batch(rng, cfg), mesh)
               for _ in range(ITERS + 1)]
    jax.block_until_ready(batches)
    results = {}

    # --- labels only -----------------------------------------------------
    def render(bodys, scale):
        return synthesize_labels(
            bodys, scale, cfg.output_shape, cfg.stride,
            [k[0] for k in cfg.train.gaussian_kernels],
            cfg.train.paf_line_width, cfg.train.with_mds,
            cfg.train.max_people)

    labels_fn = jax.jit(jax.vmap(render))
    results["labels"] = _window(
        "labels", lambda b: labels_fn(b.bodys, b.scales), batches,
        lambda o: float(jnp.sum(jnp.abs(o[0][0]))), 0.5)

    # --- train-mode forward + loss (no grad) -----------------------------
    def fwd(params_stats, batch):
        params, stats = params_stats
        labels, rdepth = jax.vmap(render)(batch.bodys, batch.scales)
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": stats}, batch.images,
            train=True, mutable=["batch_stats"])
        losses = smap_loss(outputs, batch.valids, labels, rdepth, cfg.train)
        return losses["total_loss"], mutated["batch_stats"]

    fwd_jit = jax.jit(fwd)
    ps = (variables["params"], variables["batch_stats"])
    results["fwd"] = _window(
        "fwd", lambda b: fwd_jit(ps, b), batches,
        lambda o: float(o[0]),
        FWD_TFLOP_PER_IMG * BATCH / PEAK_TFLOPS * 1e3)

    # --- full production step -------------------------------------------
    step = make_jitted_train_step(cfg, mesh, tx)
    state = jax.jit(lambda v: create_train_state(v, cfg, 1))(variables)
    state_box = [state]

    def run_step(b):
        s, losses = step(state_box[0], b)
        state_box[0] = s
        return losses

    results["step"] = _window(
        "step", run_step, batches,
        lambda o: float(o["total_loss"]),
        TRAIN_TFLOP_PER_IMG * BATCH / PEAK_TFLOPS * 1e3)

    # --- 4 steps per execution (lax.scan) --------------------------------
    multi = make_jitted_multi_step(cfg, mesh, tx, 4)
    state2 = jax.jit(lambda v: create_train_state(v, cfg, 1))(variables)
    windows = []
    for _ in range(3):
        win = [_mk_batch(rng, cfg) for _ in range(4)]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *win)
        windows.append(shard_batch(stacked, mesh, stacked=True))
    jax.block_until_ready(windows)
    box2 = [state2]

    def run_multi(w):
        s, losses = multi(box2[0], w)
        box2[0] = s
        return losses

    ms = _window("scan4", run_multi, windows,
                 lambda o: float(jnp.sum(o["total_loss"])),
                 4 * TRAIN_TFLOP_PER_IMG * BATCH / PEAK_TFLOPS * 1e3)
    results["scan4_per_step"] = ms / 4 if ms else None

    print("RESULT", results, flush=True)


if __name__ == "__main__":
    main()
