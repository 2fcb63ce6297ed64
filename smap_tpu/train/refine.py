"""RefineNet training + model selection.

Equivalent of the reference's second training stage
(``exps/refinenet_root2/train.py:16-54`` and ``test.py:15-60`` in
zju3dv/SMAP): Adam(0.08) with step decay (x0.5 every 30 epochs), batch
1024, MSE on the 45-dim root-relative output; model selection by mean
per-joint L2 error. The reference's ``nn.DataParallel`` is unnecessary —
the jitted step runs on whatever mesh the arrays are placed on.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from smap_tpu.config import RefineNetConfig
from smap_tpu.data.datasets import P2PDataset
from smap_tpu.models.refinenet import RefineNet


class RefineState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: optax.OptState


def make_refine_optimizer(cfg: RefineNetConfig,
                          steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam + StepLR(step_size=30 epochs, gamma=0.5)."""
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return cfg.base_lr * (cfg.lr_gamma ** (epoch // cfg.lr_step))

    return optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)


def create_refine_state(cfg: RefineNetConfig,
                        tx: optax.GradientTransformation,
                        seed: int = 0) -> RefineState:
    model = RefineNet(cfg)

    def refine_init(key, x):
        return model.init(key, x, train=False)

    variables = jax.jit(refine_init)(jax.random.PRNGKey(seed),
                                     jnp.zeros((2, cfg.in_dim), jnp.float32))
    return RefineState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))


def refine_train_step(state: RefineState, inputs: jnp.ndarray,
                      targets: jnp.ndarray, *, cfg: RefineNetConfig,
                      tx: optax.GradientTransformation
                      ) -> Tuple[RefineState, jnp.ndarray]:
    model = RefineNet(cfg)

    def loss_fn(params):
        preds, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            inputs, train=True, mutable=["batch_stats"])
        return jnp.mean((preds - targets) ** 2), mutated["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    return state.replace(step=state.step + 1,
                         params=optax.apply_updates(state.params, updates),
                         batch_stats=new_stats,
                         opt_state=new_opt), loss


def train_refinenet(dataset: P2PDataset, cfg: RefineNetConfig,
                    num_epochs: Optional[int] = None, seed: int = 0,
                    log_fn=print) -> Dict[int, RefineState]:
    """Epoch loop; returns {epoch: state} snapshots for model selection."""
    n = len(dataset)
    inputs = np.stack([dataset.get_sample(i)[0] for i in range(n)])
    targets = np.stack([dataset.get_sample(i)[1] for i in range(n)])
    steps_per_epoch = max(n // cfg.batch_size, 1)
    tx = make_refine_optimizer(cfg, steps_per_epoch)
    state = create_refine_state(cfg, tx, seed)
    step = jax.jit(functools.partial(refine_train_step, cfg=cfg, tx=tx))

    rng = np.random.RandomState(seed)
    snapshots = {}
    for epoch in range(num_epochs or cfg.num_epochs):
        order = rng.permutation(n)
        losses = []
        for s in range(steps_per_epoch):
            idx = order[s * cfg.batch_size:(s + 1) * cfg.batch_size]
            state, loss = step(state, jnp.asarray(inputs[idx]),
                               jnp.asarray(targets[idx]))
            losses.append(float(loss))
        log_fn(f"refine epoch {epoch}: mse {np.mean(losses):.5f}")
        snapshots[epoch] = jax.device_get(state)
    return snapshots


def evaluate_refinenet(state: RefineState, dataset: P2PDataset,
                       cfg: RefineNetConfig = RefineNetConfig()
                       ) -> Tuple[np.ndarray, float]:
    """Per-joint mean L2 error (cm) — reference refinenet test.py:44-55."""
    model = RefineNet(cfg)
    n = len(dataset)
    inputs = np.stack([dataset.get_sample(i)[0] for i in range(n)])
    targets = np.stack([dataset.get_sample(i)[1] for i in range(n)])
    preds = model.apply({"params": state.params,
                         "batch_stats": state.batch_stats},
                        jnp.asarray(inputs), train=False)
    preds = np.asarray(preds).reshape(n, 15, 3)
    gts = targets.reshape(n, 15, 3)
    per_joint = np.linalg.norm(preds - gts, axis=-1).mean(axis=0)
    return per_joint, float(per_joint.mean())


def select_best_epoch(snapshots: Dict[int, RefineState],
                      dataset: P2PDataset,
                      cfg: RefineNetConfig = RefineNetConfig()
                      ) -> Tuple[int, float]:
    """Sweep epochs, return (best_epoch, best_error) — test.py:24-60."""
    best_epoch, best_err = -1, float("inf")
    for epoch, state in snapshots.items():
        _, err = evaluate_refinenet(state, dataset, cfg)
        if err < best_err:
            best_epoch, best_err = epoch, err
    return best_epoch, best_err
