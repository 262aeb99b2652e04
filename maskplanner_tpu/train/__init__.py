"""Training stack: train/eval steps, schedulers, checkpointing."""
from .trainer import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    build_loss_batch,
)
from .schedulers import lr_schedule, PSACDScheduler, apply_delayed_activations
from .rollout import sample_autoregressive_inference_sop
from . import checkpoints

__all__ = [
    "sample_autoregressive_inference_sop",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "build_loss_batch",
    "lr_schedule",
    "PSACDScheduler",
    "apply_delayed_activations",
    "checkpoints",
]
