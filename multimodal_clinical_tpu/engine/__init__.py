from .checkpoint import BestCheckpointer
from .metrics import EpochAccumulator, eval_epoch_summary, train_epoch_summary
from .spec import CONTRACTS, ModelSpec
from .state import TrainState, create_train_state, make_lr_schedule, make_optimizer
from .steps import make_eval_step, make_train_step
from .trainer import Trainer

__all__ = [
    "BestCheckpointer",
    "EpochAccumulator",
    "eval_epoch_summary",
    "train_epoch_summary",
    "CONTRACTS",
    "ModelSpec",
    "TrainState",
    "create_train_state",
    "make_lr_schedule",
    "make_optimizer",
    "make_eval_step",
    "make_train_step",
    "Trainer",
]
