"""Training: optimizer/state construction, the pjit train loop, checkpoints."""
from .checkpoint import FoldCheckpointer, find_run_checkpoint
from .loop import Trainer, TrainerConfig, init_state, make_optimizer, state_variables

__all__ = [
    "FoldCheckpointer",
    "Trainer",
    "TrainerConfig",
    "find_run_checkpoint",
    "init_state",
    "make_optimizer",
    "state_variables",
]
