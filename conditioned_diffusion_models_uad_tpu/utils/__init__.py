"""Shared runtime utilities."""
from .jax_setup import enable_compilation_cache
from .shapes import calc_interres

__all__ = ["calc_interres", "enable_compilation_cache"]
