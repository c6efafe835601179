#!/usr/bin/env python
"""Host-allocation microbenchmark: quantify the page-fault cost the caching
numpy allocator (native/np_mempool.cpp) removes, inside a REAL device-client
process.

Background (measured on the target box, PARITY.md "Round-2 eval-path
changes"): once the device tunnel client is active in a process, first-touch
page faults cost ~150-600us each, so a fresh ~44 MB numpy allocation costs
seconds of kernel time while reusing an existing buffer runs at memset speed.
The per-volume eval loop allocates fresh multi-MB arrays (loader output,
transforms, fetch destinations) every volume — without allocation caching it
degrades several-fold at 100+ volumes.

Runs the same fresh-allocation loop twice in SUBPROCESSES sharing this
interpreter's environment: NP_MEMPOOL=0 (numpy default allocator) vs
NP_MEMPOOL=1 (the pool), each after initializing the jax backend the way
every entry point does. Prints one JSON line:

  {"alloc_mb": ..., "iters": ..., "s_per_iter_nopool": ...,
   "s_per_iter_pool": ..., "speedup": ...}
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache
enable_compilation_cache()  # installs the pool unless NP_MEMPOOL=0
import jax, jax.numpy as jnp
import numpy as np

mb = int(sys.argv[1]); iters = int(sys.argv[2])
# touch the device once so the client/transport is fully active
float(jax.jit(lambda x: x + 1)(jnp.float32(1.0)))

shape = (mb * (1 << 20) // 4,)
rng = np.random.default_rng(0)
times = []
for i in range(iters):
    t0 = time.perf_counter()
    a = rng.random(shape, np.float32)   # fresh numpy allocation + fill
    s = float(a[::4096].sum())          # touch pages again, defeat DCE
    times.append(time.perf_counter() - t0)
    del a
times.sort()
print(json.dumps({"median_s": times[len(times) // 2], "sum": s}))
"""


def _run(pool: bool, mb: int, iters: int) -> float:
    env = dict(os.environ, NP_MEMPOOL="1" if pool else "0")
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(mb), str(iters)],
        capture_output=True, text=True, env=env, timeout=1800, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["median_s"]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=44,
                   help="allocation size per iteration (44 ~ one raw subject)")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    nopool = _run(False, args.mb, args.iters)
    pool = _run(True, args.mb, args.iters)
    print(json.dumps({
        "alloc_mb": args.mb,
        "iters": args.iters,
        "s_per_iter_nopool": round(nopool, 3),
        "s_per_iter_pool": round(pool, 3),
        "speedup": round(nopool / max(pool, 1e-9), 1),
    }))


if __name__ == "__main__":
    main()
