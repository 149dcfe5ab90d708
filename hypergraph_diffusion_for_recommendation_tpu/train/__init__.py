from .optim import PlateauState, adam_coupled_wd, make_optimizer, set_lr
from .recommender import Recommender
from .trainer import EpochRecord, FitResult, Trainer

__all__ = [
    "PlateauState",
    "adam_coupled_wd",
    "make_optimizer",
    "set_lr",
    "Recommender",
    "EpochRecord",
    "FitResult",
    "Trainer",
]
