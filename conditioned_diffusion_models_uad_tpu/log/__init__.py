"""Logging / observability (L8)."""
from .loggers import CSVLogger, MultiLogger, WandbLogger, log_hyperparameters, summarize

__all__ = [
    "CSVLogger",
    "MultiLogger",
    "WandbLogger",
    "log_hyperparameters",
    "summarize",
]
