from smap_tpu.train.engine import CheckpointManager, Trainer, TrainerConfig
from smap_tpu.train.solver import make_optimizer, make_schedule
from smap_tpu.train.step import (TrainBatch, TrainState, create_train_state,
                                 make_jitted_train_step, train_step)

__all__ = ["CheckpointManager", "Trainer", "TrainerConfig", "make_optimizer",
           "make_schedule", "TrainBatch", "TrainState", "create_train_state",
           "make_jitted_train_step", "train_step"]
