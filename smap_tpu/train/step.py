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
                                    replicated)
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


def train_step(state: TrainState, batch: TrainBatch, *, cfg: Config,
               tx: optax.GradientTransformation
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step (pure function; jit at call site)."""
    model = SMAP(cfg.model)

    def render(bodys, scale):
        return synthesize_labels(
            bodys, scale, cfg.output_shape, cfg.stride,
            [k[0] for k in cfg.train.gaussian_kernels],
            cfg.train.paf_line_width, cfg.train.with_mds,
            cfg.train.max_people)

    labels, rdepth = jax.vmap(render)(batch.bodys, batch.scales)

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


def make_jitted_train_step(cfg: Config, mesh: Mesh,
                           tx: optax.GradientTransformation):
    """jit with explicit shardings: batch on the data axis, state replicated."""
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    step_fn = functools.partial(train_step, cfg=cfg, tx=tx)
    return jax.jit(
        step_fn,
        in_shardings=(rep, TrainBatch(data, data, data, data)),
        out_shardings=(rep, rep),
        donate_argnums=(0,))
