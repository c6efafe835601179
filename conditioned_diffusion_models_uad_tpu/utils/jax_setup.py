"""JAX runtime setup helpers."""
from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Short hash of the host CPU feature set. XLA:CPU AOT results are
    compiled for the build host's ISA extensions; loading them on a host
    with a different feature set is flagged by XLA as a potential SIGILL."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        flags = platform.processor() or platform.machine()
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on the persistent XLA compilation cache (big win for the large
    UNet programs: recompiles across processes/runs become disk loads)."""
    # Host-memory hygiene first: every process that talks to the device
    # also churns large numpy buffers (loader/transforms/fetches), and on
    # this platform first-touch page faults are ~150-600us each once the
    # tunnel client is active (see native/np_mempool.cpp). Idempotent,
    # gated by NP_MEMPOOL=0.
    from ..native.mempool import enable_host_alloc_cache

    enable_host_alloc_cache()

    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache")
    )
    # scope by backend; CPU entries additionally by the host's CPU feature
    # set — CPU AOT results are host-ISA specific and must not be shared
    # with entries produced on machines with different features
    backend = jax.default_backend()
    if backend == "cpu":
        backend = f"cpu-{_host_fingerprint()}"
    path = os.path.join(path, backend)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
