"""Training machinery: jitted multi-term step, state, loop, checkpointing."""

from mmvae_tpu.train.step import (
    make_train_step,
    make_eval_step,
    make_eval_runner,
    make_epoch_runner,
    make_gather_epoch_runner,
    multi_term_loss,
)
from mmvae_tpu.train.state import TrainState, create_train_state

__all__ = [
    "make_train_step",
    "make_epoch_runner",
    "make_gather_epoch_runner",
    "make_eval_step",
    "make_eval_runner",
    "multi_term_loss",
    "TrainState",
    "create_train_state",
]
