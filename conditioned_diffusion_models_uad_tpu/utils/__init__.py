"""Shared runtime utilities."""
from .jax_setup import enable_compilation_cache
from .profiling import StepTimer, flops_summary, trace
from .shapes import calc_interres

__all__ = [
    "StepTimer",
    "calc_interres",
    "enable_compilation_cache",
    "flops_summary",
    "trace",
]
