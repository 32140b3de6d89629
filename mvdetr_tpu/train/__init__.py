from mvdetr_tpu.train.checkpoint import latest_step, restore_checkpoint, restore_weights, save_checkpoint
from mvdetr_tpu.train.optim import build_optimizer, onecycle_b1_schedule, onecycle_lr_schedule
from mvdetr_tpu.train.state import TrainState, create_train_state, load_full_variables
from mvdetr_tpu.train.trainer import Trainer, eval_step, supervised_loss, train_step

__all__ = [
    "TrainState",
    "Trainer",
    "build_optimizer",
    "create_train_state",
    "load_full_variables",
    "eval_step",
    "latest_step",
    "onecycle_b1_schedule",
    "onecycle_lr_schedule",
    "restore_checkpoint",
    "restore_weights",
    "save_checkpoint",
    "supervised_loss",
    "train_step",
]
