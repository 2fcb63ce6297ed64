"""One-time FLOP accounting for the bench's MFU field (VERDICT r2 item 1).

Compiles the deployment programs on XLA:CPU and prints cost_analysis()
FLOPs — backend-independent analytic counts. The resulting constants are
hardcoded in bench.py (with provenance pointing here) so the bench can
convert measured latencies into achieved TFLOPS and auto-discard draws
that exceed the chip's physical peak (~197 TFLOPS bf16 on v5e) as relay
replay artifacts.

Run: JAX_PLATFORMS=cpu python scripts/probes/_flops_probe.py
(full-size CPU compiles: expect 10-20 min on the 1-core host)
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from smap_tpu.config import Config
from smap_tpu.models.smap import SMAP
from smap_tpu.ops.postprocess import ScaleInfo, postprocess_batch

BATCH = 16


def flops_of(fn, *args) -> float:
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    return float(cost["flops"])


def main_train():
    """FLOPs of the full jitted train step (fwd+bwd+Adam+label synthesis,
    stage-remat recompute included — it's in the optimized HLO). Batch 2:
    every op in the step scales linearly with batch (global-batch BN means
    included), so per-image FLOPs transfer to any batch size."""
    from smap_tpu.parallel.mesh import make_mesh, shard_batch
    from smap_tpu.train.solver import make_optimizer
    from smap_tpu.train.step import (TrainBatch, create_train_state,
                                     make_jitted_train_step)

    b = 2
    cfg = Config()
    model = SMAP(cfg.model)
    h, w = cfg.input_shape
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                               jnp.zeros((1, h, w, 3), jnp.float32))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             variables)
    mesh = make_mesh(jax.devices()[:1])
    tx = make_optimizer(cfg.train, 1)
    state = create_train_state(variables, cfg, 1)
    step = make_jitted_train_step(cfg, mesh, tx)
    batch = shard_batch(TrainBatch(
        images=np.zeros((b, h, w, 3), np.float32),
        bodys=np.zeros((b, cfg.train.max_people, 15, 11), np.float32),
        valids=np.ones((b, 57), np.float32),
        scales=np.full((b,), 0.5, np.float32)), mesh)
    # The factory composes TWO jitted programs (label render + step);
    # sum their cost analyses.
    import jax.numpy as _jnp

    labels, rdepth = jax.eval_shape(step.render_fn, batch)
    labels = jax.tree.map(lambda s: _jnp.zeros(s.shape, s.dtype), labels)
    rdepth = jax.tree.map(lambda s: _jnp.zeros(s.shape, s.dtype), rdepth)
    f = 0.0
    for prog, args in ((step.render_fn, (batch,)),
                       (step.step_fn, (state, batch, labels, rdepth))):
        cost = prog.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        f += float(cost["flops"])
    print(f"train step (batch {b}, remat off — the reference's "
          f"RUN_EFFICIENT default): {f/1e12:.3f} TFLOP "
          f"= {f/b/1e9:.1f} GFLOP/img", flush=True)


def main():
    cfg = Config()
    model = SMAP(cfg.model)
    x = jnp.zeros((BATCH, *cfg.input_shape, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x[:1])
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    f_skip = flops_of(
        lambda v, x: model.apply(v, x, method=SMAP.infer), variables, x)
    print(f"forward infer (head-skipped): {f_skip/1e12:.3f} TFLOP/batch-16 "
          f"= {f_skip/BATCH/1e9:.1f} GFLOP/img", flush=True)

    def full(v, x):
        out = model.apply(v, x, train=False)
        hm = out["heatmap_2d"][-1]
        return (hm[-1] + hm[-2] + hm[-3], out["det_d"][-1][-1],
                out["root_d"][-1][-1])

    f_full = flops_of(full, variables, x)
    print(f"forward full (all heads):     {f_full/1e12:.3f} TFLOP/batch-16 "
          f"= {f_full/BATCH/1e9:.1f} GFLOP/img "
          f"(skip saves {100*(1-f_skip/f_full):.1f}%)", flush=True)

    info = ScaleInfo(*(jnp.full((BATCH,), v, jnp.float32) for v in
                       (0.433, 1920.0, 1080.0, 1500.0, 1500.0, 960.0,
                        540.0)))
    H, W = cfg.output_shape
    maps = (jnp.zeros((BATCH, H, W, 43), jnp.float32),
            jnp.zeros((BATCH, H, W, 14), jnp.float32),
            jnp.zeros((BATCH, H, W, 1), jnp.float32))
    f_post = flops_of(
        lambda m2, m3, mr, s: postprocess_batch(
            m2, m3, mr, s, cfg.post, net_w=float(cfg.input_shape[1]),
            net_h=float(cfg.input_shape[0]), stride=cfg.stride),
        *maps, info)
    print(f"postprocess (assoc_peaks={cfg.post.assoc_peaks}): "
          f"{f_post/1e12:.3f} TFLOP/batch-16", flush=True)


if __name__ == "__main__":
    if "--train" in sys.argv:
        main_train()
    else:
        main()
