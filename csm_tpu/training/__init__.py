"""Training stack: losses, optimizer, jitted steps, checkpointing.

TPU-native equivalent of the reference training layer
(src/csm/training/ — trainer.py, utils.py, mlx_trainer.py): one compiled
train step (semantic + compute-amortized acoustic loss, per-component
AdamW), orbax checkpoints, mesh sharding via csm_tpu.parallel.
"""

from csm_tpu.training.losses import Batch, compute_loss
from csm_tpu.training.optimizer import (
    TrainState,
    component_labels,
    init_train_state,
    make_optimizer,
)
from csm_tpu.training.train_step import make_eval_step, make_train_step

__all__ = [
    "Batch",
    "compute_loss",
    "TrainState",
    "component_labels",
    "init_train_state",
    "make_optimizer",
    "make_eval_step",
    "make_train_step",
]
