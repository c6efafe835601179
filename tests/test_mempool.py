"""Caching numpy data allocator (native/np_mempool.cpp).

Host-memory hygiene replacing the reference's long-lived DataLoader worker
allocators (reference src/datamodules/create_dataset.py:95-141): freed large
numpy blocks are retained and reused so repeat per-volume allocations never
re-fault pages (first-touch faults cost ~150-600us/page on the target box).

Correctness is exercised in-process (the handler stays installed for the
rest of the suite — that is the production configuration); the install/gate
behavior runs in subprocesses.
"""
from __future__ import annotations

import subprocess
import sys

import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.native.mempool import (
    enable_host_alloc_cache,
    pool_stats,
    pool_trim,
)

pytestmark = pytest.mark.skipif(
    not enable_host_alloc_cache(), reason="np_mempool build unavailable"
)

MB = 1 << 20


def test_reuse_and_stats():
    pool_trim()
    s0 = pool_stats()
    a = np.empty(4 * MB, np.uint8)
    a[:] = 7
    del a
    s1 = pool_stats()
    assert s1["cached_bytes"] >= 4 * MB  # retained, not returned to the OS
    b = np.empty(4 * MB, np.uint8)  # same class -> must come from the pool
    s2 = pool_stats()
    assert s2["hits"] == s1["hits"] + 1
    assert s2["cached_bytes"] < s1["cached_bytes"]
    del b


def test_zeros_are_zero_after_reuse():
    x = np.full(3 * MB, 0xFF, np.uint8)
    del x
    z = np.zeros(3 * MB, np.uint8)  # calloc path must memset reused pages
    assert not z.any()


def test_values_roundtrip_large():
    rng = np.random.default_rng(0)
    for _ in range(3):
        a = rng.random((192, 192, 40), np.float32)
        assert np.isfinite(a).all()
        csum = a.sum()
        b = a.copy()
        del a
        assert b.sum() == csum


def test_resize_across_pool_boundary():
    d = np.empty((300,), np.float32)
    d.resize((2_000_000,), refcheck=False)  # small (glibc) -> pooled class
    d[:] = 3.0
    assert (d == 3.0).all()
    d.resize((4_000_000,), refcheck=False)  # pooled -> larger pooled (copy)
    assert (d[:2_000_000] == 3.0).all()
    d.resize((100,), refcheck=False)  # shrink keeps the block
    assert (d == 3.0).all()


def test_trim_releases():
    a = np.empty(8 * MB, np.uint8)
    del a
    assert pool_stats()["cached_bytes"] >= 8 * MB
    pool_trim()
    assert pool_stats()["cached_bytes"] == 0


def test_env_gate_disables():
    code = (
        "import os; os.environ['NP_MEMPOOL']='0';"
        "from conditioned_diffusion_models_uad_tpu.native.mempool import "
        "enable_host_alloc_cache, pool_stats;"
        "assert enable_host_alloc_cache() is False;"
        "assert pool_stats() is None;"
        "import numpy as np; a=np.zeros(2<<20, np.uint8); assert not a.any()"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=120)


def test_multithreaded_alloc_free():
    from concurrent.futures import ThreadPoolExecutor

    def churn(seed):
        rng = np.random.default_rng(seed)
        tot = 0.0
        for _ in range(20):
            a = rng.random((128, 128, 16), np.float32)  # 1 MB: pooled
            tot += float(a[0, 0, 0])
        return tot

    with ThreadPoolExecutor(4) as ex:
        vals = list(ex.map(churn, range(4)))
    assert all(np.isfinite(v) for v in vals)
