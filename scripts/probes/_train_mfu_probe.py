"""Training-step section decomposition (VERDICT r4 item 5).

The best train config (grad-accum 2x8) runs at 22% MFU while isolated
bwd-conv probes hit 99-147 TFLOPS — this probe decomposes one optimizer
step into its sections, each as its OWN jitted program with analytic
FLOPs from XLA cost analysis, so the gap is attributable:

  render     on-device label synthesis (b=8)
  fwd        loss value only (forward + loss assembly, all heads)
  fwd+bwd    value_and_grad (no optimizer)
  step       full train_step_with_labels (fwd+bwd+BN stats+Adam)
  adam       optax update + apply on pre-built grads
  accum2x8   the production grad-accum step (2 scanned microbatches)

Per section: median ms over 3 distinct-input calls, analytic TFLOP (XLA
cost analysis of the compiled executable), achieved TFLOPS. Replay
guards: distinct inputs per call, content compare (losses / grad sums
must differ across inputs), per-section physics floor from its own
analytic FLOPs at the 197-TFLOPS chip peak.

Run on TPU: python scripts/probes/_train_mfu_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

PEAK_TFLOPS = 197.0
B = 8
REPS = 3


def make_batch(rng, cfg, b):
    from smap_tpu.train.step import TrainBatch

    h, w = cfg.input_shape
    bodys = np.zeros((b, cfg.train.max_people, 15, 11), np.float32)
    bodys[..., 0] = rng.uniform(0, w - 1, bodys.shape[:3])
    bodys[..., 1] = rng.uniform(0, h - 1, bodys.shape[:3])
    bodys[..., 2] = rng.uniform(100, 400, bodys.shape[:3])
    bodys[..., 3] = rng.randint(0, 3, bodys.shape[:3])
    bodys[..., 7] = 1100.0
    return TrainBatch(images=rng.randn(b, h, w, 3).astype(np.float32),
                      bodys=bodys, valids=np.ones((b, 57), np.float32),
                      scales=np.full((b,), 0.5, np.float32))


def flop_of(jitted, *args):
    try:
        comp = jitted.lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) / 1e12
    except Exception as exc:
        print(f"# cost analysis failed: {type(exc).__name__}", flush=True)
        return 0.0


def timed(fn, make_args, label, tflop, reps=REPS):
    """Median seconds over ``reps`` calls on distinct per-call inputs.

    Inputs are staged (and blocked) one call at a time — b=8 fwd+bwd
    needs most of the 16 GB HBM, so holding several staged batches +
    rendered label sets (~290 MB each) alongside it OOMs."""
    import jax

    outs, times = [], []
    for i in range(reps):
        args = make_args(i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
        outs.append(float(np.sum(np.asarray(jax.tree.leaves(out)[0],
                                            np.float32))))
        del args, out
    med = float(np.median(times))
    floor = tflop / PEAK_TFLOPS
    note = ""
    if len(set(outs)) == 1 and len(outs) > 1:
        note = " [REPLAY? identical outputs]"
    if tflop and med < floor:
        note += f" [REPLAY: under {floor*1e3:.0f} ms floor]"
    print(f"{label:>10}: {med*1e3:7.1f} ms  {tflop:6.2f} TFLOP  "
          f"{tflop/med:6.1f} TFLOPS  {tflop/med/PEAK_TFLOPS:5.1%} MFU"
          f"  times={['%.0f' % (t*1e3) for t in times]}{note}", flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "cpu":
        from bench import _maybe_reexec_for_healthy_grant

        _maybe_reexec_for_healthy_grant()

    import optax

    from smap_tpu.config import Config
    from smap_tpu.losses import smap_loss
    from smap_tpu.models.smap import SMAP
    from smap_tpu.parallel.mesh import make_mesh, shard_batch
    from smap_tpu.train.solver import make_optimizer
    from smap_tpu.train.step import (create_train_state, render_labels,
                                     make_jitted_accum_step,
                                     train_step_with_labels)

    cfg = Config()
    model = SMAP(cfg.model)
    mesh = make_mesh(jax.devices()[:1])
    tx = make_optimizer(cfg.train, 1)

    t0 = time.perf_counter()
    variables = jax.jit(lambda k, x: model.init(k, x))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
    state0 = jax.jit(lambda v: create_train_state(v, cfg, 1))(variables)
    clone = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    print(f"init {time.perf_counter()-t0:.0f}s", flush=True)

    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))

    # --- section programs -------------------------------------------------
    render_fn = jax.jit(functools.partial(render_labels, cfg=cfg))

    def fwd_only(state, batch, labels, rdepth):
        outputs, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.images, train=True, mutable=["batch_stats"])
        losses = smap_loss(outputs, batch.valids, labels, rdepth, cfg.train)
        return losses["total_loss"]

    fwd_fn = jax.jit(fwd_only)

    def fwd_bwd(state, batch, labels, rdepth):
        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch.images, train=True, mutable=["batch_stats"])
            losses = smap_loss(outputs, batch.valids, labels, rdepth,
                               cfg.train)
            return losses["total_loss"], mutated["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # Reduce outputs to scalars so host transfer is negligible but
        # every gradient is still computed (sums consume all leaves).
        gsum = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads))
        ssum = sum(jnp.sum(s) for s in jax.tree.leaves(stats))
        return loss, gsum, ssum

    fwd_bwd_fn = jax.jit(fwd_bwd)

    step_fn = jax.jit(functools.partial(train_step_with_labels, cfg=cfg,
                                        tx=tx))

    def adam_only(state, grads):
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return sum(jnp.sum(jnp.abs(p))
                   for p in jax.tree.leaves(new_params)), new_opt

    adam_fn = jax.jit(adam_only)

    # --- host-side inputs (device staging happens per timed call) ----------
    host_batches = [make_batch(rng, cfg, B) for _ in range(REPS + 1)]

    def staged(i):
        return shard_batch(host_batches[i], mesh)

    def staged_rendered(i):
        b = staged(i)
        labels, rdepth = render_fn(b)
        return b, labels, rdepth

    grads_like = jax.jit(
        lambda s: jax.tree.map(lambda p: p * 1e-3, s.params))(state0)
    jax.block_until_ready(grads_like)

    # --- analytic FLOPs ----------------------------------------------------
    # Cost-analysis compiles (lower().compile()) do NOT share the jit
    # executable cache, so running them on the big programs would DOUBLE
    # the 3-7 min TPU compiles. Only the small programs get exact counts;
    # the big sections use provenance constants: the full step is 1.1164
    # TFLOP/img (_flops_probe.py --train, exact), the all-heads train
    # forward ~= infer-fwd / 0.85 (infer statically skips ~15% of head
    # FLOPs; 5.018/16 TFLOP/img at b16) + loss (elementwise, ~0), and
    # fwd+bwd ~= step - adam - render.
    t0 = time.perf_counter()
    fl_render = flop_of(render_fn, staged(0))
    fl_adam = flop_of(adam_fn, state0, grads_like)
    fl_step = 1.1164 * B
    fl_fwd = 5.018 / 16 / 0.85 * B
    fl_bwd = fl_step - fl_adam - fl_render
    print(f"cost analysis {time.perf_counter()-t0:.0f}s: render "
          f"{fl_render:.3f} adam {fl_adam:.4f} TFLOP exact; fwd "
          f"{fl_fwd:.3f} (est) fwd+bwd {fl_bwd:.3f} (est) step "
          f"{fl_step:.3f} (exact/img) (b={B})", flush=True)

    def warm(label, fn, *args):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        print(f"# {label} compile+first {time.perf_counter()-t0:.0f}s",
              flush=True)

    # --- sections, one at a time (b=8 fwd+bwd fills most of HBM; free the
    # previous section's executables + staged arrays between sections) ----
    warm("render", render_fn, staged(REPS))
    timed(render_fn, lambda i: (staged(i),), "render", fl_render)

    scale_tree = jax.jit(lambda g, s: jax.tree.map(lambda x: x * s, g))
    warm("adam", adam_fn, state0, grads_like)
    timed(adam_fn, lambda i: (state0, scale_tree(grads_like, 1.0 + i)),
          "adam", fl_adam)

    warm("fwd", fwd_fn, state0, *staged_rendered(REPS))
    timed(fwd_fn, lambda i: (state0, *staged_rendered(i)), "fwd", fl_fwd)

    jax.clear_caches()   # drop the fwd executable before the bwd programs
    warm("fwd+bwd", fwd_bwd_fn, state0, *staged_rendered(REPS))
    timed(fwd_bwd_fn, lambda i: (state0, *staged_rendered(i)), "fwd+bwd",
          fl_bwd)

    jax.clear_caches()
    # No donation in this probe's raw jit, so state0 survives every call.
    warm("step", step_fn, state0, *staged_rendered(REPS))
    timed(step_fn, lambda i: (state0, *staged_rendered(i)), "step", fl_step)

    del grads_like
    jax.clear_caches()
    # Production accum step for reference (its own render is inside).
    accum = make_jitted_accum_step(cfg, mesh, tx, 2)

    def staged_accum(i):
        st = jax.tree.map(
            lambda a, b: np.stack([np.asarray(a), np.asarray(b)]),
            host_batches[i], make_batch(rng, cfg, B))
        return (shard_batch(st, mesh, stacked=True),)

    warm("accum2x8", lambda b: accum(clone(state0), b), *staged_accum(REPS))
    timed(lambda b: accum(state0, b), staged_accum, "accum2x8", fl_step * 2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
