from .env import (
    TrainState, make_train_step, make_eval_step,
    calculate_adaptive_weight, grad_norm_wrt,
)
from .trainer import Trainer, TrainerConfig, create_optimizer
from .schedules import build_schedule
from .sampler import HardExampleSampler, MiningMethod
from .ema import ema_init, ema_update
from .confusion_matrix import SoftmaxConfusionMatrix
from .wd_groups import wd_mask

__all__ = [
    "TrainState", "make_train_step", "make_eval_step",
    "calculate_adaptive_weight", "grad_norm_wrt",
    "Trainer", "TrainerConfig", "create_optimizer", "build_schedule",
    "HardExampleSampler", "MiningMethod", "ema_init", "ema_update",
    "SoftmaxConfusionMatrix", "wd_mask",
]
