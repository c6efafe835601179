#!/usr/bin/env python
"""North-star benchmark: reverse-diffusion eval throughput on one chip.

Measures slice-denoises/sec of the flagship cDDPM volume-reconstruction path
(encoder conditioning + 3-timestep noise ensemble, the reference's eval hot
loop, src/models/DDPM_2D.py:209-248). The reference does ~50 slice-denoises/s
on its benchmark GPU (BASELINE.md: ~3 s/volume, 50 slices x 3 ensemble
members); `vs_baseline` is the speedup over that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "link"}.

Variance control (the tunneled transport's health swings by hours — measured
H2D 1.2 GB/s ↔ 34 MB/s, RTT 4 ↔ 63 ms): the link is probed first and its
RTT/H2D/D2H ride along in the JSON under "link"; the throughput is the BEST
of ≥3 independent enqueue-10 batches (the program is deterministic — slower
batches measure link stalls, not compute), so a healthy-link number is
recoverable even inside a degraded window, and a degraded window is visible
in the link fields instead of silently deflating the metric.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference anchor (BASELINE.md): 3.0-3.3 s/volume with 50 slices x 3 ensemble
# members = 150 slice-denoises per ~3.1 s ≈ 48.4 slice-denoises/s.
BASELINE = 150.0 / 3.1


def probe_link() -> dict:
    """Inline tunnel-health probe (tools/tunnel_probe.py, same measurements):
    dispatch+fetch RTT, H2D and D2H bandwidth of this process's live client."""
    x = jnp.ones((8,))
    float(x.sum())  # first-dispatch stall absorbed before timing

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        float(np.asarray(x + 1.0)[0])
    rtt_ms = (time.perf_counter() - t0) / n * 1000

    a = np.ones((192, 192, 100), np.float32)  # 14.7 MB, the ingest unit
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        x_up = jax.device_put(a)
    # block_until_ready can return before a queued transfer lands on this
    # transport (the repo-wide timing rule): close the timed window with a
    # VALUE FETCH derived from the last upload so the puts are provably done
    float(np.asarray(x_up[0, 0, :1])[0])
    h2d = a.nbytes * reps / (time.perf_counter() - t0) / 1e6

    d = jax.device_put(np.ones((1024, 1024), np.float32))  # 4 MB
    np.asarray(d)  # absorb the documented first-fetch stall
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(d + 0.0)
    d2h = d.nbytes * 3 / (time.perf_counter() - t0) / 1e6
    return {
        "rtt_ms": round(rtt_ms, 1),
        "h2d_mb_s": round(h2d, 1),
        "d2h_mb_s": round(d2h, 1),
    }


def main():
    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig
    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    task = DDPMTask(DDPMTaskConfig())  # flagship: 96x96, resnet50, ensemble x3
    variables = task.init(jax.random.PRNGKey(0))

    # Two 96-slice volumes per dispatch — the production eval's
    # eval.volumes_per_call=2 grouped layout (VolumeReconstructor.batch_call):
    # the UNet runs at batch 2*96*3 = 576, the measured-best ms/slice point.
    depth = 192
    slices = jax.random.uniform(jax.random.PRNGKey(1), (depth, 96, 96, 1))

    # The timed program reduces the reconstruction to one scalar that is
    # VALUE-FETCHED: over the tunneled-chip transport, block_until_ready can
    # return before execution finishes for queued programs, so only a D2H
    # value fetch is a reliable sync point.
    reconstruct = jax.jit(
        lambda v, x, k: task.reconstruct(v, x, k).astype(jnp.float32).sum()
    )
    key = jax.random.PRNGKey(2)

    link = probe_link()

    # compile + warmup
    float(reconstruct(variables, slices, key))
    float(reconstruct(variables, slices, key))

    # steady-state THROUGHPUT: enqueue all iterations (the orchestrated eval
    # dispatches ahead the same way, scorer threads fetching behind), then
    # sync on the value fetches — programs execute in enqueue order, so the
    # elapsed time covers exactly the n programs. BEST of k batches: the
    # program is deterministic, so the fastest batch is the one least
    # polluted by transport stalls (see module docstring)
    n, k = 10, 4
    batch_dts = []
    for b in range(k):
        t0 = time.perf_counter()
        outs = [reconstruct(variables, slices, jax.random.fold_in(key, i))
                for i in range(b * n, b * n + n)]
        for o in outs:
            float(o)
        batch_dts.append((time.perf_counter() - t0) / n)
    dt = min(batch_dts)

    ensemble = len(task.cfg.step_ensemble)
    denoises_per_sec = depth * ensemble / dt
    print(
        json.dumps(
            {
                "metric": "eval_slice_denoises_per_sec_per_chip",
                "value": round(denoises_per_sec, 2),
                "unit": "slice-denoises/s (96x96, cond encoder + UNet fwd, "
                        "x3 t-ensemble, 2-volume grouped dispatch)",
                "vs_baseline": round(denoises_per_sec / BASELINE, 2),
                "link": link,
                "batch_s_per_call": [round(d, 4) for d in batch_dts],
            }
        )
    )


if __name__ == "__main__":
    main()
