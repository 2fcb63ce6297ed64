"""SPMD training step: on-device label synthesis + forward/backward + Adam.

Replaces the reference's DDP hot loop (``exps/stage3_root2/train.py:67-82``
in zju3dv/SMAP): instead of per-process allreduce hooks, the step is a
single jitted SPMD program over a data-axis mesh — batch inputs arrive
sharded, the loss mean and BatchNorm batch statistics reduce over the
global batch (an upgrade over the reference's unsynced per-GPU BN), and XLA
emits the gradient all-reduce over ICI.

Label rendering (the reference's CPU dataloader hot path,
``dataset/base_dataset.py:177-187``) happens *inside* the step on device,
so the host only ships images + joint tables.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from smap_tpu.config import Config
from smap_tpu.data.labels import synthesize_labels
from smap_tpu.losses import smap_loss
from smap_tpu.models.smap import SMAP
from smap_tpu.parallel.mesh import (DATA_AXIS, Mesh, batch_sharding,
                                    replicated, stacked_batch_sharding)
from smap_tpu.train.solver import make_optimizer


class TrainBatch(NamedTuple):
    """Host-assembled training batch (all float32, batch-leading).

    images: [B, H, W, 3] normalized.
    bodys: [B, P, J, 11] unified joint rows (post-augmentation).
    valids: [B, 57] channel validity.
    scales: [B] letterbox resize scale.
    """

    images: jnp.ndarray
    bodys: jnp.ndarray
    valids: jnp.ndarray
    scales: jnp.ndarray


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, cfg: Config, num_devices: int) -> TrainState:
    tx = make_optimizer(cfg.train, num_devices)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]))


def render_labels(batch: TrainBatch, *, cfg: Config):
    """On-device label synthesis for one batch (vmapped over samples).

    Kept as a SEPARATE jitted program in the production factories below:
    the rendered pytree is a pure function of the (tiny) joint tables, so
    isolating it keeps the big fwd/bwd program's input surface to
    images+labels and lets a data pipeline pre-render labels one batch
    ahead. The split costs one extra dispatch, hidden by async dispatch.
    (It was introduced while bisecting the axon train-step pathology,
    which turned out to be donation/sharding annotations, not program
    composition — docs/perf_notes.md round-3 item 10.)
    """
    def render(bodys, scale):
        return synthesize_labels(
            bodys, scale, cfg.output_shape, cfg.stride,
            [k[0] for k in cfg.train.gaussian_kernels],
            cfg.train.paf_line_width, cfg.train.with_mds,
            cfg.train.max_people)

    return jax.vmap(render)(batch.bodys, batch.scales)


def train_step(state: TrainState, batch: TrainBatch, *, cfg: Config,
               tx: optax.GradientTransformation
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step (pure function; jit at call site)."""
    labels, rdepth = render_labels(batch, cfg=cfg)
    return train_step_with_labels(state, batch, labels, rdepth, cfg=cfg,
                                  tx=tx)


def train_step_with_labels(state: TrainState, batch: TrainBatch, labels,
                           rdepth, *, cfg: Config,
                           tx: optax.GradientTransformation
                           ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Forward/backward/Adam with pre-rendered labels (see render_labels)."""
    model = SMAP(cfg.model)

    def loss_fn(params):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch.images, train=True, mutable=["batch_stats"])
        losses = smap_loss(outputs, batch.valids, labels, rdepth, cfg.train)
        return losses["total_loss"], (losses, mutated["batch_stats"])

    (_, (losses, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats,
                              opt_state=new_opt_state)
    return new_state, losses


class PackedTrainState:
    """TrainState held as per-dtype flat vectors between step calls.

    The tunneled TPU runtime charges ~0.06 ms per program argument/result
    handle on SYNCHRONOUS calls (scripts/probes/_handle_count_probe.py);
    the TrainState tree is ~1610 leaves, so a block-per-step driver pays
    ~180 ms/step of pure marshaling. The packed form crosses the boundary
    as ~4 vectors; the step program unpacks, steps, and re-packs INSIDE
    the jit (static slices/concats, bit-identical math —
    tests/test_train_step.py pins the trajectory). Convert back with
    :func:`as_state_tree` (checkpointing does).

    Opt-in (SMAP_TPU_PACK_STATE=1), default off: the production Trainer
    loop is asynchronous (handle cost doesn't apply), and the in-program
    unpack/repack copies cost HBM headroom — see _pack_state_enabled.
    """

    __slots__ = ("packed", "codec")

    def __init__(self, packed, codec):
        self.packed = packed
        self.codec = codec


def as_state_tree(state) -> TrainState:
    """PackedTrainState -> TrainState (identity on a plain TrainState).

    One jitted unpack call (pays the many-handle result marshal once —
    used at checkpoint cadence, not per step)."""
    if isinstance(state, PackedTrainState):
        codec = state.codec
        if not hasattr(codec, "_jit_unpack"):
            codec._jit_unpack = jax.jit(codec)
        return codec._jit_unpack(state.packed)
    return state


def _pack_state_enabled(mesh: Mesh) -> bool:
    """Default OFF: opt in with SMAP_TPU_PACK_STATE=1 (1-device meshes
    only; multi-device shardings would need their own annotations).

    Packing pays off only on SYNCHRONOUS call boundaries (the tunneled
    runtime's ~0.06 ms/handle marshaling, _handle_count_probe.py), and
    the production Trainer loop is asynchronous — it blocks on losses at
    log cadence and on state at checkpoint cadence, not per step, where
    the handle cost was measured NOT to apply (_stream_dispatch_probe.py
    device2 vs device2flat). Meanwhile the in-program unpack/repack holds
    a second copy of the ~800 MB state live, which pushed every batch>=8
    train row at 512x832 into RESOURCE_EXHAUSTED on v5e (bench_train
    round-5) and made b=2 slightly SLOWER (pack/unpack HBM traffic with
    no marshal to save). Block-per-step drivers are the one shape that
    benefits (~180 ms/step); they can opt in."""
    import os

    from smap_tpu.parallel.mesh import is_axon_runtime

    env = os.environ.get("SMAP_TPU_PACK_STATE", "")
    if env in ("0", "1"):
        return env == "1" and int(mesh.devices.size) == 1
    return False


def _make_state_packed_call(core, mesh: Mesh, step_kw):
    """jit ``core(state, batch, labels, rdepth) -> (state, losses)`` with
    the state boundary packed (when enabled for this runtime).

    Accepts either a TrainState (packed on first use; the codec is cached
    per tree structure) or the PackedTrainState a previous call returned,
    and returns the state in kind (PackedTrainState under packing)."""
    plain_fn = jax.jit(core, **step_kw)
    if not _pack_state_enabled(mesh):
        return plain_fn
    cell = {}

    def call(state, batch, labels, rdepth):
        if isinstance(state, PackedTrainState):
            packed, codec = state.packed, state.codec
        else:
            from smap_tpu.utils.pack import pack_tree

            key = jax.tree.structure(state)
            cached = cell.get("key")
            # (explicit None guard: treedef.__ne__ rejects non-treedefs)
            if cached is None or cached != key:
                packed, codec = pack_tree(state)
                cell.update(key=key, codec=codec, jit=None)
            else:
                codec = cell["codec"]
                if not hasattr(codec, "_jit_pack"):
                    codec._jit_pack = jax.jit(codec.pack)
                packed = codec._jit_pack(state)
        if cell.get("codec") is not codec:
            cell.update(key=None, codec=codec, jit=None)
        if cell.get("jit") is None:
            unpack = codec

            def packed_core(packed, batch, labels, rdepth):
                new_state, losses = core(unpack(packed), batch, labels,
                                         rdepth)
                return unpack.pack(new_state), losses

            cell["jit"] = jax.jit(packed_core, **step_kw)
        new_packed, losses = cell["jit"](packed, batch, labels, rdepth)
        return PackedTrainState(new_packed, codec), losses

    call.plain_fn = plain_fn
    return call


def make_jitted_train_step(cfg: Config, mesh: Mesh,
                           tx: optax.GradientTransformation):
    """Production step: batch on the data axis, state replicated.

    TWO jitted programs composed at the call site — label rendering, then
    the fwd/bwd/optimizer step. Both dispatch asynchronously back-to-back,
    so the behavior and cost match one program EXCEPT for the runtime
    pathology the split avoids (see render_labels' docstring). With
    SMAP_TPU_PACK_STATE=1 the state crosses the boundary packed (see
    :class:`PackedTrainState` — for block-per-step drivers only).
    """
    render_kw, step_kw = _sharding_kwargs(mesh, batch_sharding(mesh))
    render_fn = jax.jit(functools.partial(render_labels, cfg=cfg),
                        **render_kw)
    call = _make_state_packed_call(
        functools.partial(train_step_with_labels, cfg=cfg, tx=tx),
        mesh, step_kw)

    def step(state: TrainState, batch: TrainBatch):
        labels, rdepth = render_fn(batch)
        return call(state, batch, labels, rdepth)

    # Expose the underlying jitted programs (AOT lowering, cost analysis —
    # scripts/probes/_flops_probe.py).
    step.render_fn = render_fn
    step.step_fn = getattr(call, "plain_fn", call)
    return step


def _sharding_kwargs(mesh: Mesh, data):
    """jit kwargs for the render/step program pair.

    On a 1-device mesh every sharding annotation is dropped: there is
    nothing to shard, and NamedSharding-annotated train programs execute
    ~150x degraded on the tunneled axon runtime (docs/perf_notes.md
    round-3 item 10) — the annotations' only effect there is harm.
    State donation (memory headroom on real TPUs) is likewise gated off
    on the axon relay, where donating the ~800 MB state costs ~38 s/step;
    `SMAP_TPU_DONATE=0/1` overrides the auto-detection either way.
    """
    import os

    from smap_tpu.parallel.mesh import is_axon_runtime

    env = os.environ.get("SMAP_TPU_DONATE", "")
    donate = ((env == "1") if env in ("0", "1")
              else not is_axon_runtime())
    step_kw = dict(donate_argnums=(0,)) if donate else {}
    if mesh.devices.size > 1:
        rep = replicated(mesh)
        batch_tree = TrainBatch(data, data, data, data)
        return (dict(in_shardings=(batch_tree,), out_shardings=data),
                dict(in_shardings=(rep, batch_tree, data, data),
                     out_shardings=(rep, rep), **step_kw))
    return {}, step_kw


def make_jitted_accum_step(cfg: Config, mesh: Mesh,
                           tx: optax.GradientTransformation,
                           accum_steps: int):
    """One optimizer step from ``accum_steps`` scanned microbatches.

    Gradient accumulation: batches arrive stacked [A, B/A, ...] (host
    reshape of one global batch), a ``lax.scan`` runs forward/backward per
    microbatch at CONSTANT params accumulating the gradient sum, then one
    Adam update applies the microbatch-averaged gradient. Peak activation
    memory is one microbatch — the lever for effective batches past the
    per-chip HBM cliff (b=16 at 512x832 OOMs on v5e without it,
    docs/perf_notes.md round-3 training bench) without touching the math
    of the LR schedule (one step, one global batch).

    BatchNorm semantics: each microbatch normalizes by its OWN batch
    statistics and the running stats chain through the scan — exactly the
    reference's per-GPU BN behavior under DDP (its BN also sees only the
    local slice of the global batch, train.py:41-44), traded against the
    single-step path's global-batch BN.

    The reference has no analogue (it lowers per-GPU batch to 2 instead,
    config.py solver settings); this exists because one TPU chip replaces
    several 11 GB GPUs and wants their combined batch.
    """
    render_kw, step_kw = _sharding_kwargs(mesh, stacked_batch_sharding(mesh))
    render_fn = jax.jit(
        jax.vmap(functools.partial(render_labels, cfg=cfg)), **render_kw)
    model = SMAP(cfg.model)

    def accum_step(state: TrainState, batches: TrainBatch, labels, rdepth):
        def micro(carry, xs):
            stats, grad_sum = carry
            b, l, r = xs

            def loss_fn(params):
                outputs, mutated = model.apply(
                    {"params": params, "batch_stats": stats},
                    b.images, train=True, mutable=["batch_stats"])
                losses = smap_loss(outputs, b.valids, l, r, cfg.train)
                return losses["total_loss"], (losses,
                                              mutated["batch_stats"])

            (_, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
            return (new_stats, grad_sum), losses

        zero = jax.tree.map(jnp.zeros_like, state.params)
        (new_stats, grad_sum), losses = jax.lax.scan(
            micro, (state.batch_stats, zero), (batches, labels, rdepth),
            length=accum_steps)
        grads = jax.tree.map(lambda g: g / accum_steps, grad_sum)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt_state)
        # Report the microbatch-mean of each loss (one step's losses over
        # the one global batch).
        return new_state, jax.tree.map(lambda a: a.mean(0), losses)

    accum_fn = _make_state_packed_call(accum_step, mesh, step_kw)

    def step(state: TrainState, batches: TrainBatch):
        labels, rdepth = render_fn(batches)
        return accum_fn(state, batches, labels, rdepth)

    return step


def make_jitted_multi_step(cfg: Config, mesh: Mesh,
                           tx: optax.GradientTransformation, n_steps: int):
    """``n_steps`` optimization steps per device execution via ``lax.scan``.

    TPU-idiomatic steps-per-execution (the t5x/pax training-loop pattern):
    batches arrive stacked on a leading scan axis — every ``TrainBatch``
    leaf is [K, B, ...] — and the whole window runs as one scanned XLA
    program (plus the separate label-render program, see render_labels),
    so per-execution dispatch/queueing overhead (host round-trips; seconds
    per executable on shared/tunneled runtimes — docs/perf_notes.md) is
    paid once per K steps instead of per step. The math is exactly K successive
    :func:`train_step` calls — same state trajectory, same BatchNorm /
    optimizer updates (tests/test_train_step.py pins the equivalence);
    per-step losses come back scan-stacked as [K] arrays.

    The reference has no analogue (its DDP loop is one optimizer step per
    Python iteration, exps/stage3_root2/train.py:67-82); this exists
    because on TPU the host-device boundary, not the Python loop body, is
    the overhead to amortize.
    """
    render_kw, step_kw = _sharding_kwargs(mesh, stacked_batch_sharding(mesh))
    render_fn = jax.jit(
        jax.vmap(functools.partial(render_labels, cfg=cfg)), **render_kw)

    def multi_step(state, batches, labels, rdepth):
        def body(s, xs):
            b, l, r = xs
            return train_step_with_labels(s, b, l, r, cfg=cfg, tx=tx)

        return jax.lax.scan(body, state, (batches, labels, rdepth),
                            length=n_steps)

    multi_fn = _make_state_packed_call(multi_step, mesh, step_kw)

    def step(state: TrainState, batches: TrainBatch):
        labels, rdepth = render_fn(batches)
        return multi_fn(state, batches, labels, rdepth)

    return step
