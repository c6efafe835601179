"""JAX runtime setup helpers."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on the persistent XLA compilation cache (big win for the large
    UNet programs: recompiles across processes/runs become disk loads)."""
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache")
    )
    # scope by backend: CPU AOT results are host-machine-feature specific and
    # must not be shared with entries produced for/by other machines
    path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
