from .optim import PlateauState, adam_coupled_wd, make_optimizer, set_lr
from .trainer import EpochRecord, FitResult, Trainer

__all__ = [
    "PlateauState",
    "adam_coupled_wd",
    "make_optimizer",
    "set_lr",
    "EpochRecord",
    "FitResult",
    "Trainer",
]
