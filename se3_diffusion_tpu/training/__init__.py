from se3_diffusion_tpu.training.losses import framediff_loss, t_stratified_loss
from se3_diffusion_tpu.training.train_step import (
    TrainState,
    create_optimizer,
    create_train_state,
    loss_fn,
    make_train_step,
    prepare_train_features,
)

__all__ = [
    "TrainState",
    "create_optimizer",
    "create_train_state",
    "framediff_loss",
    "loss_fn",
    "make_train_step",
    "prepare_train_features",
    "t_stratified_loss",
]
