#!/usr/bin/env python
"""Link-health probe for the tunneled TPU transport.

Benchmarks on this box ride a network tunnel whose health varies by hours
(measured: H2D 1.2 GB/s <-> 60 MB/s, dispatch+fetch RTT 4 <-> 45 ms).
Run this BEFORE trusting any wall-clock benchmark, and record its output
next to the numbers (PARITY.md convention).

Prints one JSON line: {"rtt_ms", "h2d_mb_s", "d2h_mb_s"}.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8,))
    float(x.sum())  # backend init + first-dispatch stall absorbed here

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        float(np.asarray(x + 1.0)[0])
    rtt_ms = (time.perf_counter() - t0) / n * 1000

    a = np.ones((192, 192, 100), np.float32)  # 14.7 MB, the ingest unit
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        x_up = jax.device_put(a)
    # close the timed window with a VALUE FETCH off the last upload —
    # block_until_ready can return before a queued transfer lands here
    float(np.asarray(x_up[0, 0, :1])[0])
    h2d = a.nbytes * reps / (time.perf_counter() - t0) / 1e6

    d = jax.device_put(np.ones((1024, 1024), np.float32))  # 4 MB
    np.asarray(d)  # absorb the documented first-fetch stall
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(d + 0.0)
    d2h = d.nbytes * 3 / (time.perf_counter() - t0) / 1e6

    print(json.dumps({
        "rtt_ms": round(rtt_ms, 1),
        "h2d_mb_s": round(h2d, 1),
        "d2h_mb_s": round(d2h, 1),
    }))


if __name__ == "__main__":
    main()
