"""SPMD train-step tests on the virtual 8-device CPU mesh."""

import dataclasses

import numpy as np
import pytest


def _tiny_cfg(stage_num=1, input_shape=(64, 96)):
    from smap_tpu.config import Config, ModelConfig, TrainConfig

    out = (input_shape[0] // 4, input_shape[1] // 4)
    return Config(
        model=ModelConfig(stage_num=stage_num, output_shape=out,
                          compute_dtype="float32"),
        train=TrainConfig(max_people=4),
        input_shape=input_shape, output_shape=out)


def _batch(rng, cfg, batch_size):
    from smap_tpu.train.step import TrainBatch

    h, w = cfg.input_shape
    images = rng.randn(batch_size, h, w, 3).astype(np.float32)
    bodys = np.zeros((batch_size, cfg.train.max_people, 15, 11), np.float32)
    bodys[..., 0] = rng.uniform(0, w - 1, bodys.shape[:3])
    bodys[..., 1] = rng.uniform(0, h - 1, bodys.shape[:3])
    bodys[..., 2] = rng.uniform(100, 400, bodys.shape[:3])
    bodys[..., 3] = rng.randint(0, 3, bodys.shape[:3])
    bodys[..., 7] = 1100.0
    valids = np.ones((batch_size, 57), np.float32)
    scales = np.full((batch_size,), 0.5, np.float32)
    return TrainBatch(images=images, bodys=bodys, valids=valids,
                      scales=scales)


@pytest.mark.slow
def test_train_step_runs_on_8_device_mesh(rng):
    import jax
    import jax.numpy as jnp

    from smap_tpu.models.smap import SMAP
    from smap_tpu.parallel.mesh import make_mesh, shard_batch
    from smap_tpu.train.solver import make_optimizer
    from smap_tpu.train.step import (create_train_state,
                                     make_jitted_train_step)

    cfg = _tiny_cfg()
    mesh = make_mesh()
    assert mesh.devices.size == 8

    model = SMAP(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
    tx = make_optimizer(cfg.train, mesh.devices.size)
    state = create_train_state(variables, cfg, mesh.devices.size)
    step = make_jitted_train_step(cfg, mesh, tx)

    batch = shard_batch(_batch(rng, cfg, 8), mesh)
    state, losses = step(state, batch)
    state, losses = step(state, batch)
    assert int(state.step) == 2
    total = float(losses["total_loss"])
    assert np.isfinite(total) and total > 0
    for key in ["loss_2d", "loss_bone", "loss_root"]:
        assert np.isfinite(float(losses[key]))


@pytest.mark.slow
def test_multi_step_matches_single_steps(rng):
    """K scanned steps (steps-per-execution) follow the same state
    trajectory and per-step losses as K single jitted steps.

    Uses SGD rather than Adam: both are two *different* XLA programs, and
    Adam's first-step update is ±lr·sign(grad), which amplifies fp-noise
    gradient differences (reassociation across fusions) into ±lr param
    flips on near-zero-gradient leaves. SGD keeps fp noise at noise scale,
    so trajectory closeness actually tests the scan mechanics (state
    threading, [K, B] batch stacking, BN stats, step counts)."""
    import jax
    import jax.numpy as jnp
    import optax

    from smap_tpu.models.smap import SMAP
    from smap_tpu.parallel.mesh import make_mesh, shard_batch
    from smap_tpu.train.step import (TrainState, make_jitted_multi_step,
                                     make_jitted_train_step)

    cfg = _tiny_cfg(input_shape=(32, 48))
    # 2-device mesh: still exercises the cross-device grad/BN reductions
    # and the [K, B, ...] stacked sharding, without tripping XLA:CPU's 40 s
    # collective-rendezvous budget (8 device threads serializing a K-times
    # longer scanned program on this 1-core host do).
    mesh = make_mesh(jax.devices()[:2])
    model = SMAP(cfg.model)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
    tx = optax.sgd(1e-4)
    step = make_jitted_train_step(cfg, mesh, tx)
    multi = make_jitted_multi_step(cfg, mesh, tx, 2)

    batches = [_batch(rng, cfg, 4) for _ in range(2)]

    # Both step programs donate their input state, and the state aliases
    # the `variables` buffers — clone per trajectory.
    state0 = TrainState(step=jnp.zeros((), jnp.int32),
                        params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        opt_state=tx.init(variables["params"]))
    clone = jax.jit(lambda s: jax.tree.map(jnp.copy, s))

    state = clone(state0)
    single_losses = []
    for b in batches:
        state, losses = step(state, shard_batch(b, mesh))
        single_losses.append(float(losses["total_loss"]))
    single_params = jax.device_get(state.params)

    state2 = clone(state0)
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    state2, stacked_losses = multi(
        state2, shard_batch(stacked, mesh, stacked=True))
    assert int(state2.step) == 2
    # The tight equivalence gate is the per-step LOSS trajectory: step 2's
    # loss is computed from the params step 1 produced, so matching both
    # losses certifies the scan threads state/batches exactly like the
    # singles. Params themselves only get a sanity band: on this synthetic
    # batch the loss is ~2.5e3 with grads ~1e2-1e3, so the two programs'
    # fp-reassociation noise in step 1 is curvature-amplified into ~1%
    # param differences by step 2 (first-order-flat losses stay tight).
    np.testing.assert_allclose(
        np.asarray(stacked_losses["total_loss"]), single_losses, rtol=2e-5)

    def close_in_norm(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.linalg.norm(a - b)
        assert err < 0.02 * np.linalg.norm(a) + 1e-5, (a.shape, err)

    jax.tree.map(close_in_norm, single_params,
                 jax.device_get(state2.params))


@pytest.mark.slow
def test_accum_step_matches_manual_accumulation(rng):
    """make_jitted_accum_step == the definition: per-microbatch grads at
    CONSTANT params with BN running stats chaining through the scan, one
    optimizer update of the microbatch-averaged gradient, microbatch-mean
    losses. Oracle is a hand-rolled python loop over the same pieces."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from smap_tpu.losses import smap_loss
    from smap_tpu.models.smap import SMAP
    from smap_tpu.parallel.mesh import make_mesh, shard_batch
    from smap_tpu.train.step import (TrainState, make_jitted_accum_step,
                                     render_labels)

    cfg = _tiny_cfg(input_shape=(32, 48))
    # 2-device mesh: covers the SHARDED stacked-batch path (axis-1 batch
    # sharding + the in-scan gradient all-reduce), not just the math.
    mesh = make_mesh(jax.devices()[:2])
    model = SMAP(cfg.model)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
    tx = optax.sgd(1e-4)   # see test_multi_step_matches_single_steps
    accum = make_jitted_accum_step(cfg, mesh, tx, 2)

    batch = _batch(rng, cfg, 4)   # global batch 4 -> 2 microbatches of 2
    stacked = jax.tree.map(
        lambda x: x.reshape(2, 2, *x.shape[1:]), batch)

    state0 = TrainState(step=jnp.zeros((), jnp.int32),
                        params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        opt_state=tx.init(variables["params"]))
    clone = jax.jit(lambda s: jax.tree.map(jnp.copy, s))

    # --- oracle: explicit python accumulation loop. Each microbatch is
    # sharded over the SAME mesh as the production step: an unsharded
    # oracle computes the same math but in a different XLA partitioning,
    # and ~1e-7 reassociation noise amplifies through the 50-layer
    # BN trunk to ~0.5% on output maps — dense-mean losses average it
    # away, but the sparse root-depth gather samples it raw. Sharded
    # identically, the losses match bit-exactly, so this tests the
    # accumulation semantics at full strength.
    state = clone(state0)
    render = jax.jit(functools.partial(render_labels, cfg=cfg))
    stats = state.batch_stats
    grad_sum = None
    micro_losses = []
    for i in range(2):
        mb = shard_batch(jax.tree.map(lambda x: x[i], stacked), mesh)
        labels, rdepth = render(mb)

        def loss_fn(params, stats, mb, labels, rdepth):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": stats},
                mb.images, train=True, mutable=["batch_stats"])
            losses = smap_loss(outputs, mb.valids, labels, rdepth,
                               cfg.train)
            return losses["total_loss"], (losses, mutated["batch_stats"])

        (_, (losses, stats)), grads = jax.jit(jax.value_and_grad(
            loss_fn, has_aux=True))(state.params, stats, mb, labels,
                                    rdepth)
        micro_losses.append(jax.device_get(losses))
        grad_sum = grads if grad_sum is None else jax.tree.map(
            jnp.add, grad_sum, grads)
    grads = jax.tree.map(lambda g: g / 2, grad_sum)
    updates, _ = jax.jit(tx.update)(grads, state.opt_state, state.params)
    ref_params = jax.device_get(
        jax.jit(optax.apply_updates)(state.params, updates))
    ref_stats = jax.device_get(stats)

    # --- the production accum step
    state2, losses2 = accum(clone(state0),
                            shard_batch(stacked, mesh, stacked=True))
    assert int(state2.step) == 1
    losses2 = jax.device_get(losses2)
    for key in micro_losses[0]:
        want = (micro_losses[0][key] + micro_losses[1][key]) / 2
        np.testing.assert_allclose(losses2[key], want, rtol=2e-5)

    def close_in_norm(a, b):
        # Absolute floor 1e-5: zero-initialized biases sit one SGD step
        # (~lr x fp-noise-dominated grad ~ 1e-7) from zero, where a pure
        # relative check amplifies cross-program reassociation noise; a
        # real averaging bug shows up at ~norm(update)/2 ~ 5e-4 on
        # substantive leaves, well above both terms.
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.linalg.norm(a - b)
        assert err < 1e-4 * np.linalg.norm(a) + 1e-5, (a.shape, err)

    jax.tree.map(close_in_norm, ref_params,
                 jax.device_get(state2.params))
    jax.tree.map(close_in_norm, ref_stats,
                 jax.device_get(state2.batch_stats))


def test_jit_policy_gating(monkeypatch):
    """_sharding_kwargs: 1-device meshes carry no sharding annotations;
    state donation follows SMAP_TPU_DONATE / the axon-runtime detection
    (docs/perf_notes.md round-3 item 10 — both annotations make the train
    program execute ~150x degraded on that relay)."""
    import jax

    import smap_tpu.parallel.mesh as mesh_mod
    from smap_tpu.parallel.mesh import batch_sharding, make_mesh
    from smap_tpu.train.step import _sharding_kwargs

    mesh1 = make_mesh(jax.devices()[:1])
    mesh2 = make_mesh(jax.devices()[:2])

    monkeypatch.delenv("SMAP_TPU_DONATE", raising=False)
    monkeypatch.setattr(mesh_mod, "is_axon_runtime", lambda: False)
    render_kw, step_kw = _sharding_kwargs(mesh1, batch_sharding(mesh1))
    assert render_kw == {} and step_kw == {"donate_argnums": (0,)}
    render_kw, step_kw = _sharding_kwargs(mesh2, batch_sharding(mesh2))
    assert "in_shardings" in render_kw and "in_shardings" in step_kw
    assert step_kw["donate_argnums"] == (0,)

    # Axon relay: donation gated off, shardings still off for 1 device.
    monkeypatch.setattr(mesh_mod, "is_axon_runtime", lambda: True)
    render_kw, step_kw = _sharding_kwargs(mesh1, batch_sharding(mesh1))
    assert render_kw == {} and step_kw == {}

    # Env override wins in both directions.
    monkeypatch.setenv("SMAP_TPU_DONATE", "1")
    _, step_kw = _sharding_kwargs(mesh1, batch_sharding(mesh1))
    assert step_kw == {"donate_argnums": (0,)}
    monkeypatch.setattr(mesh_mod, "is_axon_runtime", lambda: False)
    monkeypatch.setenv("SMAP_TPU_DONATE", "0")
    _, step_kw = _sharding_kwargs(mesh1, batch_sharding(mesh1))
    assert step_kw == {}


def test_lr_schedule_matches_reference():
    """Schedule parity vs. lib/utils/solver.py:12-19 semantics."""
    from smap_tpu.config import TrainConfig
    from smap_tpu.train.solver import make_schedule

    cfg = TrainConfig()
    num_devices = 8
    sched = make_schedule(cfg, num_devices)
    base = cfg.base_lr * num_devices
    w, m = cfg.warmup_iters, cfg.max_iter  # 8 devices -> no rescale

    def ref(it):
        if it < w:
            return base * (cfg.warmup_factor + (1 - cfg.warmup_factor) * it / w)
        return base * (1 - (it - w) / (m - w))

    for it in [0, 1, 100, 2399, 2400, 2401, 96000, 191999, 192000]:
        np.testing.assert_allclose(float(sched(it)), ref(it), rtol=1e-6,
                                   err_msg=str(it))


def test_flattened_optimizer_is_bit_identical():
    """TrainConfig.flatten_opt runs the update on one flattened vector
    (the standalone per-leaf Adam program measured 184 ms/call on the
    target relay, docs/perf_notes.md round-5); Adam + folded weight decay
    are purely elementwise, so the flattened math must be BIT-identical."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from smap_tpu.config import TrainConfig
    from smap_tpu.train.solver import make_optimizer

    rng = np.random.RandomState(0)
    params = {"a": {"kernel": jnp.asarray(rng.randn(7, 13), jnp.float32),
                    "bias": jnp.asarray(rng.randn(13), jnp.float32)},
              "bn": {"scale": jnp.asarray(rng.rand(13), jnp.float32)}}
    cfg = TrainConfig()
    tx_flat = make_optimizer(dataclasses.replace(cfg, flatten_opt=True), 1)
    tx_tree = make_optimizer(dataclasses.replace(cfg, flatten_opt=False), 1)

    def run(tx, n=3):
        state = tx.init(params)
        p = params
        for i in range(n):
            grads = jax.tree.map(
                lambda x: jnp.asarray(
                    np.random.RandomState(10 + i).randn(*x.shape),
                    jnp.float32), p)
            updates, state = tx.update(grads, state, p)
            p = jax.tree.map(jnp.add, p, updates)
        return p

    pf, pt = run(tx_flat), run(tx_tree)
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_train_step_with_remat(rng):
    """Gradient checkpointing path compiles and produces finite losses."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from smap_tpu.config import ModelConfig
    from smap_tpu.models.smap import SMAP
    from smap_tpu.parallel.mesh import make_mesh, shard_batch
    from smap_tpu.train.solver import make_optimizer
    from smap_tpu.train.step import (create_train_state,
                                     make_jitted_train_step)

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, remat=True))
    mesh = make_mesh()
    model = SMAP(cfg.model)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
    tx = make_optimizer(cfg.train, mesh.devices.size)
    state = create_train_state(variables, cfg, mesh.devices.size)
    step = make_jitted_train_step(cfg, mesh, tx)
    batch = shard_batch(_batch(rng, cfg, 8), mesh)
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["total_loss"]))


@pytest.mark.slow
def test_train_step_descends_on_memorizable_batch(rng):
    """Optimization sanity (VERDICT r2 item 7): overfitting ONE tiny
    synthetic batch must drive total_loss down materially — the reference
    demonstrably trains (exps/stage3_root2/train.py:67-113); this is the
    equivalent toy-descent proof for the jitted SPMD step.

    Measured curve (CPU, lr=0.1, constant-depth targets so the L1 depth
    terms don't dominate with their slow linear descent): total_loss
    1211 -> ~520 over 220 steps, monotone after warmup; the depth losses
    (loss_bone/loss_root) collapse to ~0 within 20 steps. The >2x gate
    leaves wide margin over run-to-run jitter while still failing for any
    broken-gradient/optimizer regression (a dead step plateaus at <1.1x,
    as seen with mistuned LRs during bring-up)."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.models.smap import SMAP
    from smap_tpu.parallel.mesh import make_mesh, shard_batch
    from smap_tpu.train.solver import make_optimizer
    from smap_tpu.train.step import (TrainBatch, create_train_state,
                                     make_jitted_train_step)

    cfg = _tiny_cfg(stage_num=1, input_shape=(32, 48))
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, base_lr=0.1, warmup_iters=1))
    h, w = cfg.input_shape
    b = 2
    bodys = np.zeros((b, cfg.train.max_people, 15, 11), np.float32)
    bodys[..., 0] = rng.uniform(0, w - 1, bodys.shape[:3])
    bodys[..., 1] = rng.uniform(0, h - 1, bodys.shape[:3])
    bodys[..., 2] = 200.0   # constant depth: delta-Z labels ~0 (see above)
    bodys[..., 3] = rng.randint(0, 3, bodys.shape[:3])
    bodys[..., 7] = 1100.0
    batch = TrainBatch(images=rng.randn(b, h, w, 3).astype(np.float32),
                       bodys=bodys,
                       valids=np.ones((b, 57), np.float32),
                       scales=np.full((b,), 0.5, np.float32))

    mesh = make_mesh(jax.devices()[:1])
    model = SMAP(cfg.model)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32))
    state = create_train_state(variables, cfg, 1)
    step = make_jitted_train_step(cfg, mesh, make_optimizer(cfg.train, 1))
    batch = shard_batch(batch, mesh)

    first = None
    for _ in range(220):
        state, losses = step(state, batch)
        if first is None:
            first = float(losses["total_loss"])
    final = float(losses["total_loss"])
    assert np.isfinite(final)
    assert first / final > 2.0, (first, final)
    # The depth L1 terms must have collapsed onto their ~0 targets.
    assert float(losses["loss_bone"]) < 0.1
    assert float(losses["loss_root"]) < 0.1


def test_packed_state_trajectory_bit_identical(rng, monkeypatch):
    """SMAP_TPU_PACK_STATE=1: the packed-state boundary (PackedTrainState,
    per-dtype flat vectors across the host/device boundary — the
    ~0.06 ms/handle relay finding, scripts/probes/_handle_count_probe.py)
    must leave the training trajectory bit-identical, and as_state_tree
    must rebuild the exact TrainState for checkpointing."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.models.smap import SMAP
    from smap_tpu.parallel.mesh import make_mesh, shard_batch
    from smap_tpu.train.solver import make_optimizer
    from smap_tpu.train.step import (PackedTrainState, as_state_tree,
                                     create_train_state,
                                     make_jitted_train_step)

    cfg = _tiny_cfg(input_shape=(32, 48))
    mesh = make_mesh(jax.devices("cpu")[:1])
    model = SMAP(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.input_shape, 3), jnp.float32))
    tx = make_optimizer(cfg.train, 1)
    batches = [_batch(rng, cfg, 2) for _ in range(2)]

    trajs = {}
    # Donation (the CPU default) would consume the shared `variables`
    # buffers in the first arm; this test isolates packing.
    monkeypatch.setenv("SMAP_TPU_DONATE", "0")
    for flag in ("0", "1"):
        monkeypatch.setenv("SMAP_TPU_PACK_STATE", flag)
        state = create_train_state(variables, cfg, 1)
        step = make_jitted_train_step(cfg, mesh, tx)
        all_losses = []
        for b in batches:
            state, losses = step(state, shard_batch(b, mesh))
            all_losses.append(losses)
        if flag == "1":
            assert isinstance(state, PackedTrainState)
        tree = as_state_tree(state)
        assert int(tree.step) == 2
        trajs[flag] = (tree, all_losses)

    t0, l0 = trajs["0"]
    t1, l1 = trajs["1"]
    for a, b in zip(jax.tree.leaves(t0), jax.tree.leaves(t1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for la, lb in zip(l0, l1):
        for k in la:
            np.testing.assert_array_equal(np.asarray(la[k]),
                                          np.asarray(lb[k]))
