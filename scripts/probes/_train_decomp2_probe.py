"""Bisect the train-step slowdown inside the full-model backward.

_train_decomp_probe.py: labels 13 ms, fwd+loss 65 ms, full step 31 s.
_bwd_conv_probe.py: plain conv-chain backward runs 99-147 TFLOPS. So the
degraded piece is specific to the full model's grad program. Variants
(b=8, labels precomputed as inputs, no optimizer unless noted):

  grad        value_and_grad of forward+smap_loss, remat as configured
  grad_norm   same with remat OFF
  grad_sum    remat OFF, loss = plain sum of every output map (no
              smap_loss) — isolates the loss function's backward
  adam        optax update alone on a gradient-shaped pytree
  step_nolab  the full production step with labels passed in (vs 31 s
              with in-step labels: isolates the label-synthesis backward
              interaction, which should be dead code since labels don't
              depend on params)

Run on TPU: python scripts/probes/_train_decomp2_probe.py [variants...]
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

BATCH = int(os.environ.get("SMAP_PROBE_BATCH", "8"))
ITERS = 3
TRAIN_TFLOP_PER_IMG = 1.1164
PEAK = 197.0


def _window(tag, run, inputs, content, min_ms):
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
        print(f"{tag}: {ms:.1f} ms < {min_ms:.1f} floor -> replay",
              flush=True)
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

    cfg = Config()
    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    h, w = cfg.input_shape

    def mk_images():
        return jnp.asarray(rng.randn(BATCH, h, w, 3).astype(np.float32))

    def mk_bodys():
        bodys = np.zeros((BATCH, cfg.train.max_people, 15, 11), np.float32)
        bodys[..., 0] = rng.uniform(0, w - 1, bodys.shape[:3])
        bodys[..., 1] = rng.uniform(0, h - 1, bodys.shape[:3])
        bodys[..., 2] = rng.uniform(100, 400, bodys.shape[:3])
        bodys[..., 3] = rng.randint(0, 3, bodys.shape[:3])
        bodys[..., 7] = 1100.0
        return jnp.asarray(bodys)

    model = SMAP(cfg.model)
    variables = jax.jit(lambda k, x: model.init(k, x))(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    model_nore = SMAP(dataclasses.replace(cfg.model, remat=False))

    # Precompute labels once per input batch (healthy 13 ms program).
    def render(bodys, scale):
        return synthesize_labels(
            bodys, scale, cfg.output_shape, cfg.stride,
            [k[0] for k in cfg.train.gaussian_kernels],
            cfg.train.paf_line_width, cfg.train.with_mds,
            cfg.train.max_people)

    render_jit = jax.jit(jax.vmap(render))
    scales = jnp.full((BATCH,), 0.5, jnp.float32)
    valids = jnp.ones((BATCH, 57), jnp.float32)
    inputs = []
    for _ in range(ITERS + 1):
        images = mk_images()
        labels, rdepth = render_jit(mk_bodys(), scales)
        inputs.append((images, labels, rdepth))
    jax.block_until_ready(inputs)
    min_ms = TRAIN_TFLOP_PER_IMG * BATCH / PEAK * 1e3

    def loss_with(mdl, images, labels, rdepth, params, stats):
        outputs, mutated = mdl.apply(
            {"params": params, "batch_stats": stats}, images,
            train=True, mutable=["batch_stats"])
        losses = smap_loss(outputs, valids, labels, rdepth, cfg.train)
        return losses["total_loss"], mutated

    results = {}
    variants = sys.argv[1:] or ["grad", "grad_norm", "grad_sum", "adam",
                                "step_nolab"]

    if "grad" in variants:
        g = jax.jit(jax.grad(
            lambda p, x: loss_with(model, x[0], x[1], x[2],
                                   p, variables["batch_stats"])[0]))
        results["grad"] = _window(
            "grad", lambda x: g(variables["params"], x), inputs,
            lambda o: float(jnp.sum(jnp.abs(
                jax.tree.leaves(o)[0].astype(jnp.float32)))), min_ms)

    if "grad_norm" in variants:
        g2 = jax.jit(jax.grad(
            lambda p, x: loss_with(model_nore, x[0], x[1], x[2],
                                   p, variables["batch_stats"])[0]))
        results["grad_norm"] = _window(
            "grad_norm", lambda x: g2(variables["params"], x), inputs,
            lambda o: float(jnp.sum(jnp.abs(
                jax.tree.leaves(o)[0].astype(jnp.float32)))), min_ms)

    if "grad_sum" in variants:
        def sum_loss(p, x):
            outputs, _ = model_nore.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x[0], train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree.leaves(outputs))

        g3 = jax.jit(jax.grad(sum_loss))
        results["grad_sum"] = _window(
            "grad_sum", lambda x: g3(variables["params"], x), inputs,
            lambda o: float(jnp.sum(jnp.abs(
                jax.tree.leaves(o)[0].astype(jnp.float32)))), min_ms)

    if "grad_lab" in variants:
        # grad with the label synthesis INSIDE the same program (as the
        # production step has it) but no optimizer: isolates the
        # synthesis<->backward co-scheduling interaction.
        def loss_lab(p, x):
            labels, rdepth = jax.vmap(render)(x[1], scales)
            outputs, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x[0], train=True, mutable=["batch_stats"])
            losses = smap_loss(outputs, valids, labels, rdepth, cfg.train)
            return losses["total_loss"]

        lab_inputs = [(mk_images(), mk_bodys()) for _ in range(ITERS + 1)]
        jax.block_until_ready(lab_inputs)
        g4 = jax.jit(jax.grad(loss_lab))
        results["grad_lab"] = _window(
            "grad_lab", lambda x: g4(variables["params"], x), lab_inputs,
            lambda o: float(jnp.sum(jnp.abs(
                jax.tree.leaves(o)[0].astype(jnp.float32)))), min_ms)

    if "adam" in variants:
        from smap_tpu.train.solver import make_optimizer

        tx = make_optimizer(cfg.train, 1)
        opt_state = jax.jit(tx.init)(variables["params"])
        upd = jax.jit(lambda g, s, p: tx.update(g, s, p))
        grads = [jax.tree.map(
            lambda a: jnp.asarray(
                rng.randn(*a.shape).astype(np.float32) * 1e-3),
            variables["params"]) for _ in range(ITERS + 1)]
        jax.block_until_ready(grads)
        results["adam"] = _window(
            "adam", lambda g: upd(g, opt_state, variables["params"]),
            grads,
            lambda o: float(jnp.sum(jnp.abs(
                jax.tree.leaves(o[0])[0].astype(jnp.float32)))), 0.1)

    if "step_nolab" in variants:
        import optax

        from smap_tpu.train.solver import make_optimizer

        tx = make_optimizer(cfg.train, 1)

        def step_nolab(carry, x):
            params, stats, opt_state = carry
            images, labels, rdepth = x

            def loss_fn(p):
                out, mut = loss_with(model, images, labels, rdepth,
                                     p, stats)
                return out, mut

            (loss, mutated), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, mutated["batch_stats"], opt_state), loss

        sj = jax.jit(step_nolab)
        carry = [(variables["params"], variables["batch_stats"],
                  jax.jit(tx.init)(variables["params"]))]

        def run(x):
            c, loss = sj(carry[0], x)
            carry[0] = c
            return loss

        results["step_nolab"] = _window("step_nolab", run, inputs,
                                        float, min_ms)

    if any(v.startswith("prod") for v in variants):
        # The PRODUCTION factory exactly as bench_train drives it:
        # split label render + donated TrainState step.
        from smap_tpu.parallel.mesh import make_mesh, shard_batch
        from smap_tpu.train.solver import make_optimizer
        from smap_tpu.train.step import (TrainBatch, create_train_state,
                                         make_jitted_train_step)

        import functools

        from smap_tpu.parallel.mesh import batch_sharding, replicated
        from smap_tpu.train.step import (render_labels,
                                         train_step_with_labels)

        tx = make_optimizer(cfg.train, 1)
        mesh = make_mesh(jax.devices()[:1])
        which = next(v for v in variants if v.startswith("prod"))
        if which == "prod":
            step = make_jitted_train_step(cfg, mesh, tx)
        else:
            # A/B the two ways the production jit differs from the healthy
            # hand-rolled step_nolab: donation and explicit shardings.
            rep, data = replicated(mesh), batch_sharding(mesh)
            render_fn = jax.jit(functools.partial(render_labels, cfg=cfg))
            kwargs = {}
            if which == "prod_nodon":       # shardings, no donation
                kwargs = dict(
                    in_shardings=(rep, TrainBatch(data, data, data, data),
                                  data, data),
                    out_shardings=(rep, rep))
            elif which == "prod_noshard":   # donation, no shardings
                kwargs = dict(donate_argnums=(0,))
            elif which in ("prod_plain", "prod_hostin"):   # neither
                kwargs = {}
            inner = jax.jit(functools.partial(train_step_with_labels,
                                              cfg=cfg, tx=tx), **kwargs)

            def step(state, batch):
                labels, rdepth = render_fn(batch)
                return inner(state, batch, labels, rdepth)

        state_box = [jax.jit(lambda v: create_train_state(v, cfg, 1))(
            variables)]
        prod_inputs = []
        for _ in range(ITERS + 1):
            b = TrainBatch(images=np.asarray(mk_images()),
                           bodys=np.asarray(mk_bodys()),
                           valids=np.asarray(valids),
                           scales=np.asarray(scales))
            if which == "prod_hostin":
                # Stage WITHOUT shard_batch's device_put(NamedSharding):
                # plain asarray placement, as the healthy step_nolab had.
                b = jax.tree.map(jnp.asarray, b)
            else:
                b = shard_batch(b, mesh)
            prod_inputs.append(b)
        jax.block_until_ready(prod_inputs)

        def run_prod(b):
            s, losses = step(state_box[0], b)
            state_box[0] = s
            return losses

        results["prod"] = _window("prod", run_prod, prod_inputs,
                                  lambda o: float(o["total_loss"]), min_ms)

    print("RESULT", results, flush=True)


if __name__ == "__main__":
    main()
