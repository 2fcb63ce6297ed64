"""Trainer engine tests: fit loop, checkpoint save/restore, metrics."""

import json
import os

import numpy as np
import pytest

from test_train_step import _batch, _tiny_cfg


@pytest.mark.slow
def test_trainer_fit_checkpoint_resume(tmp_path, rng):
    import jax

    from smap_tpu.config import TrainConfig
    from smap_tpu.train.engine import Trainer, TrainerConfig

    cfg = _tiny_cfg()
    cfg = type(cfg)(model=cfg.model,
                    train=TrainConfig(max_people=4, checkpoint_period=2,
                                      max_iter=100),
                    input_shape=cfg.input_shape, output_shape=cfg.output_shape)
    trainer = Trainer(cfg, TrainerConfig(output_dir=str(tmp_path),
                                         log_every=1))

    batch = _batch(rng, cfg, 8)

    def batches(start, stop):
        for i in range(start, stop):
            yield i, batch

    state = trainer.fit(batches(0, 3), max_steps=3)
    assert int(jax.device_get(state.step)) == 3
    # periodic checkpoint at 2 plus the max_iter checkpoint at 3
    assert trainer.ckpt.latest_step() == 3

    # resume: restore and continue
    restored = trainer.ckpt.restore(trainer.init_state(), step=2)
    assert int(restored.step) == 2
    # snapshot before fit(): the jitted step donates the state buffers
    restored_param0 = np.array(jax.tree.leaves(
        jax.device_get(restored.params))[0])
    state2 = trainer.fit(batches(2, 4), state=restored, max_steps=4)
    assert int(jax.device_get(state2.step)) == 4

    # metrics written
    mfile = os.path.join(str(tmp_path), "tb_dir", "metrics.jsonl")
    lines = [json.loads(l) for l in open(mfile)]
    assert any("total_loss" in l for l in lines)

    # restored params actually equal the saved ones
    saved = trainer.ckpt.restore(trainer.init_state(), step=2)
    a = jax.tree.leaves(jax.device_get(saved.params))[0]
    np.testing.assert_array_equal(np.asarray(a), restored_param0)


@pytest.mark.slow
def test_trainer_fit_steps_per_execution(tmp_path, rng):
    """fit with a scanned K=2 window: cadences fire on window boundaries,
    a partial tail (max_steps=5) falls back to single steps, checkpoints
    land at the true iteration numbers."""
    import jax

    from smap_tpu.config import TrainConfig
    from smap_tpu.train.engine import Trainer, TrainerConfig

    cfg = _tiny_cfg(input_shape=(32, 48))
    cfg = type(cfg)(model=cfg.model,
                    train=TrainConfig(max_people=4, checkpoint_period=4,
                                      max_iter=100),
                    input_shape=cfg.input_shape, output_shape=cfg.output_shape)
    trainer = Trainer(cfg, TrainerConfig(output_dir=str(tmp_path),
                                         log_every=2,
                                         steps_per_execution=2))
    assert trainer.multi_step_fn is not None

    batch = _batch(rng, cfg, 8)
    state = trainer.fit(((i, batch) for i in range(5)), max_steps=5)
    assert int(jax.device_get(state.step)) == 5
    # periodic checkpoint at the 4-boundary plus the max_iter one at 5
    assert sorted(trainer.ckpt.manager.all_steps()) == [4, 5]

    mfile = os.path.join(str(tmp_path), "tb_dir", "metrics.jsonl")
    steps = [json.loads(l)["step"] for l in open(mfile)]
    assert steps == [2, 4, 5]

    # Iterator exhausting mid-window BEFORE max_iter: the tail batch must
    # still train and the final state must be checkpointed.
    trainer2 = Trainer(cfg, TrainerConfig(output_dir=str(tmp_path / "t2"),
                                          log_every=2,
                                          steps_per_execution=2))
    state2 = trainer2.fit(((i, batch) for i in range(3)), max_steps=100)
    assert int(jax.device_get(state2.step)) == 3
    assert trainer2.ckpt.latest_step() == 3
