"""Training: masked-inpainting pretraining and CycleGAN training."""

from .losses import l1_loss, mse_loss, lsgan_loss, masked_l1
from .cyclegan import (
    CycleGANState, cyclegan_init_state, cyclegan_train_step, save_models,
)
from .pool import ImagePool, pool_init, pool_sample
from .pretrain import (
    PretrainState, pretrain_init_state, pretrain_train_step, save_pretrain_checkpoint,
)

__all__ = [
    "l1_loss", "mse_loss", "lsgan_loss", "masked_l1",
    "CycleGANState", "cyclegan_init_state", "cyclegan_train_step", "save_models",
    "ImagePool", "pool_init", "pool_sample",
    "PretrainState", "pretrain_init_state", "pretrain_train_step",
    "save_pretrain_checkpoint",
]
