"""Shared runtime utilities."""
from ..native.mempool import enable_host_alloc_cache, pool_stats, pool_trim
from .convert_torch import convert_reference_unet_state_dict
from .jax_setup import enable_compilation_cache
from .profiling import StepTimer, flops_summary, trace
from .shapes import calc_interres

__all__ = [
    "StepTimer",
    "calc_interres",
    "convert_reference_unet_state_dict",
    "enable_compilation_cache",
    "enable_host_alloc_cache",
    "flops_summary",
    "pool_stats",
    "pool_trim",
    "trace",
]
