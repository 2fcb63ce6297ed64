"""Training engine: loop, checkpoint/resume, metrics logging.

Replaces the reference's ``Engine`` context manager + DDP launcher
(``cvpack/torch_modeling/engine/engine.py:32-181`` in zju3dv/SMAP). State
(params, optimizer moments, batch stats, iteration) is one pytree,
checkpointed with Orbax; resume restores the exact iteration so the
epoch-seeded data order continues deterministically (the reference resumes
through ``start_iter`` enumeration, train.py:67-68).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import numpy as np

from smap_tpu.config import Config
from smap_tpu.parallel.mesh import make_mesh, shard_batch
from smap_tpu.train.solver import make_optimizer
from smap_tpu.train.step import (TrainBatch, TrainState, as_state_tree,
                                 create_train_state, make_jitted_train_step)


def get_logger(name: str = "smap_tpu", log_file: Optional[str] = None,
               rank: int = 0) -> logging.Logger:
    """Per-rank-gated logger (reference: cvpack/utils/logger.py:7-28 —
    non-zero ranks get no file handler and only warnings on the console)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        logger.setLevel(logging.INFO if rank == 0 else logging.WARNING)
        fmt = logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file and rank == 0:
            os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class CheckpointManager:
    """Orbax-backed checkpointing with an ``iter-last`` pointer
    (reference: engine.py:93-170 save/link/restore semantics)."""

    def __init__(self, directory: str, max_to_keep: int = 10):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state: TrainState) -> None:
        import orbax.checkpoint as ocp

        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state: TrainState, step: Optional[int] = None
                ) -> TrainState:
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            return state
        return self.manager.restore(step,
                                    args=ocp.args.StandardRestore(state))


@dataclasses.dataclass
class TrainerConfig:
    output_dir: str = "model_logs/smap_tpu"
    log_every: int = 20
    seed: int = 0
    # Steps per device execution (t5x-style): >1 scans K optimizer steps
    # inside ONE XLA program (make_jitted_multi_step), amortizing host
    # round-trip / dispatch overhead across the window. Math is identical
    # to K single steps. Pick a K dividing log_every and the checkpoint
    # period so the cadences stay exact (they fire when a window's final
    # iteration crosses the boundary); a partial tail window at max_iter
    # falls back to single steps.
    steps_per_execution: int = 1
    # Gradient accumulation: >1 splits each global batch into A scanned
    # microbatches inside one jitted step (make_jitted_accum_step) — peak
    # activation memory of one microbatch, one optimizer update of the
    # microbatch-averaged gradient. Batch size must be divisible by
    # A x device count. Mutually exclusive with steps_per_execution > 1.
    grad_accum_steps: int = 1
    # When set, capture an xprof/TensorBoard device trace over a short
    # step window (smap_tpu.utils.profiling.StepWindowProfiler).
    profile_dir: str = ""
    profile_first_step: int = 10
    profile_num_steps: int = 5


class Trainer:
    """End-to-end SMAP trainer over a data-parallel mesh."""

    def __init__(self, cfg: Config, trainer_cfg: TrainerConfig = TrainerConfig(),
                 mesh=None):
        self.cfg = cfg
        self.tc = trainer_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.num_devices = int(self.mesh.devices.size)
        import jax as _jax

        self.logger = get_logger(
            log_file=os.path.join(trainer_cfg.output_dir, "log.txt"),
            rank=_jax.process_index())
        self.tx = make_optimizer(cfg.train, self.num_devices)
        assert not (trainer_cfg.steps_per_execution > 1
                    and trainer_cfg.grad_accum_steps > 1), (
            "steps_per_execution and grad_accum_steps both stack batches "
            "on the scan axis; pick one")
        self.step_fn = make_jitted_train_step(cfg, self.mesh, self.tx)
        self.multi_step_fn = None
        if trainer_cfg.steps_per_execution > 1:
            from smap_tpu.train.step import make_jitted_multi_step

            self.multi_step_fn = make_jitted_multi_step(
                cfg, self.mesh, self.tx, trainer_cfg.steps_per_execution)
        self.accum_step_fn = None
        if trainer_cfg.grad_accum_steps > 1:
            from smap_tpu.train.step import make_jitted_accum_step

            self.accum_step_fn = make_jitted_accum_step(
                cfg, self.mesh, self.tx, trainer_cfg.grad_accum_steps)
        self.ckpt = CheckpointManager(
            os.path.join(trainer_cfg.output_dir, "checkpoints"))
        from smap_tpu.utils.metrics import MetricWriter

        self.metrics = MetricWriter(
            os.path.join(trainer_cfg.output_dir, "tb_dir"))

    def init_state(self, rng_seed: int = 0) -> TrainState:
        import jax.numpy as jnp

        from smap_tpu.models.smap import SMAP

        model = SMAP(self.cfg.model)

        def smap_trainer_init(key, x):
            return model.init(key, x)

        # jit the init: eager op-by-op init is pathological on tunneled TPUs.
        variables = jax.jit(smap_trainer_init)(
            jax.random.PRNGKey(rng_seed),
            jnp.zeros((1, *self.cfg.input_shape, 3), jnp.float32))
        return create_train_state(variables, self.cfg, self.num_devices)

    def scaled_max_iter(self) -> int:
        return int(self.cfg.train.max_iter
                   * self.cfg.train.nominal_devices / self.num_devices)

    def scaled_checkpoint_period(self) -> int:
        return int(self.cfg.train.checkpoint_period
                   * self.cfg.train.nominal_devices / self.num_devices)

    def fit(self, batch_iter: Iterator, state: Optional[TrainState] = None,
            resume: bool = False, max_steps: Optional[int] = None
            ) -> TrainState:
        """Run the training loop (reference hot loop: train.py:67-113)."""
        if state is None:
            state = self.init_state(self.tc.seed)
        if resume:
            state = self.ckpt.restore(state)
            self.logger.info("resumed at iteration %d", int(state.step))
        max_iter = max_steps or self.scaled_max_iter()
        ckpt_period = self.scaled_checkpoint_period()

        from smap_tpu.utils.profiling import StepWindowProfiler

        profiler = StepWindowProfiler(self.tc.profile_dir,
                                      self.tc.profile_first_step,
                                      self.tc.profile_num_steps)
        def run_one(state, b):
            """One optimizer step on one global batch (accumulated or not)."""
            if self.accum_step_fn is not None:
                a = self.tc.grad_accum_steps
                bs = int(np.asarray(b.images).shape[0])
                if bs % a:
                    raise ValueError(f"batch {bs} not divisible by "
                                     f"grad_accum_steps={a}")
                stacked = jax.tree.map(
                    lambda x: np.asarray(x).reshape(
                        a, x.shape[0] // a, *x.shape[1:]), b)
                return self.accum_step_fn(
                    state, shard_batch(stacked, self.mesh, stacked=True))
            return self.step_fn(state, shard_batch(b, self.mesh))

        k = max(1, self.tc.steps_per_execution)
        t0 = time.time()
        window, last_logged = [], None
        for iteration, batch in batch_iter:
            it = iteration + 1
            window.append(batch)
            if len(window) < k and it < max_iter:
                continue
            n = len(window)
            scanned = n == k and self.multi_step_fn is not None
            if scanned:
                # K steps in one device execution (lax.scan window).
                stacked = jax.tree.map(lambda *xs: np.stack(xs), *window)
                state, losses = self.multi_step_fn(
                    state, shard_batch(stacked, self.mesh, stacked=True))
            else:   # k == 1, or the partial tail window at max_iter
                for b in window:
                    state, losses = run_one(state, b)
            window = []
            profiler.step(it, n)
            # Cadences fire when a boundary falls inside the executed
            # window (it - n, it] — exact when k divides them (n == 1
            # reduces to the plain `it % every == 0`).
            if it % self.tc.log_every < n or it == max_iter:
                if scanned:
                    # Report the window's final step (losses stacked [K]);
                    # sliced only here so non-logging windows dispatch
                    # nothing eagerly.
                    losses = jax.tree.map(lambda a: a[-1], losses)
                losses = jax.device_get(losses)
                self.metrics.write_scalars(it, losses)
                dt = time.time() - t0
                t0 = time.time()
                done = it - last_logged if last_logged else it
                last_logged = it
                eta_s = dt / max(done, 1) * (max_iter - it)
                self.logger.info(
                    "Iter:%d, %s, ETA %dh%02dm", it,
                    ", ".join(f"{k}: {float(v):.3f}"
                              for k, v in losses.items()),
                    eta_s // 3600, eta_s % 3600 // 60)
            if it % ckpt_period < n or it == max_iter:
                # Checkpoints always hold the TREE state (stable format;
                # as_state_tree is the identity unless the step runs with
                # the packed-state boundary, smap_tpu.train.step).
                self.ckpt.save(it, jax.device_get(as_state_tree(state)))
                self.logger.info("checkpoint saved at iteration %d", it)
            if it >= max_iter:
                break
        if window:
            # The iterator exhausted mid-window before max_iter: train the
            # tail batches singly so every yielded batch is used, and
            # checkpoint the final state (mirrors the max_iter exit).
            for b in window:
                state, losses = run_one(state, b)
            self.metrics.write_scalars(it, jax.device_get(losses))
            self.ckpt.save(it, jax.device_get(as_state_tree(state)))
            self.logger.info("checkpoint saved at iteration %d (tail)", it)
        profiler.close()
        return as_state_tree(state)
