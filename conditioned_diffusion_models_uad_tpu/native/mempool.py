"""Lazy build + install of the caching numpy data allocator (np_mempool.cpp).

`enable_host_alloc_cache()` compiles the extension with g++ on first use and
swaps it in via numpy's PyDataMem_SetHandler. Idempotent; returns True when
the pool is active. Gate with NP_MEMPOOL=0 to keep numpy's default allocator.

Rationale (measured, PARITY.md "host allocation"): in a jax/axon-tunnel
process, first-touch page faults cost ~150-600us/page, so any fresh >~MB
numpy allocation in the per-volume eval loop burns seconds of kernel time;
retaining freed blocks makes repeat allocations run at memset speed. The
reference gets the same hygiene for free from long-lived torch DataLoader
workers (reference src/datamodules/create_dataset.py:95-141).

NOTE: arrays whose data was pool-allocated must not be resized in place
across the 1 MB boundary from below (ndarray.resize); the handler supports
it, but the copy degrades to a fresh allocation.
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "np_mempool.cpp")
_LIB = os.path.join(_DIR, "np_mempool.so")

_lock = threading.Lock()
_installed: Optional[bool] = None
_module = None


def _build() -> Optional[str]:
    import numpy as np

    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-DNPY_TARGET_VERSION=NPY_1_22_API_VERSION", _SRC, "-o", _LIB,
        f"-I{np.get_include()}", f"-I{sysconfig.get_paths()['include']}",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True,
                       timeout=180)
        return None
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def _load():
    global _module
    if _module is not None:
        return _module
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        err = _build()
        if err:
            raise RuntimeError(f"np_mempool build failed: {err}")
    spec = importlib.util.spec_from_file_location("np_mempool", _LIB)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _module = mod
    return mod


def enable_host_alloc_cache() -> bool:
    """Install the caching allocator as numpy's data handler (idempotent)."""
    global _installed
    with _lock:
        if _installed is not None:
            return _installed
        if os.environ.get("NP_MEMPOOL", "1") == "0":
            _installed = False
            return False
        try:
            _load().install()
            _installed = True
        except Exception:
            _installed = False
        return _installed


def pool_stats() -> Optional[dict]:
    """Pool statistics, or None when the pool is not active."""
    if not _installed:
        return None
    return _module.stats()


def pool_trim() -> None:
    """Release all retained blocks back to the OS (pool stays installed)."""
    if _installed:
        _module.trim()
