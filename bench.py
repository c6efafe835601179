#!/usr/bin/env python
"""North-star benchmark: reverse-diffusion eval throughput on one chip.

Measures slice-denoises/sec of the flagship cDDPM volume-reconstruction path
(encoder conditioning + 3-timestep noise ensemble, the reference's eval hot
loop, src/models/DDPM_2D.py:209-248). The reference does ~50 slice-denoises/s
on its benchmark GPU (BASELINE.md: ~3 s/volume, 50 slices x 3 ensemble
members); `vs_baseline` is the speedup over that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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

    # compile + warmup
    float(reconstruct(variables, slices, key))
    float(reconstruct(variables, slices, key))

    # steady-state THROUGHPUT: enqueue all iterations (the orchestrated eval
    # dispatches ahead the same way, scorer threads fetching behind), then
    # sync on the value fetches — programs execute in enqueue order, so the
    # elapsed time covers exactly the n programs
    n = 10
    t0 = time.perf_counter()
    outs = [reconstruct(variables, slices, jax.random.fold_in(key, i))
            for i in range(n)]
    for o in outs:
        float(o)
    dt = (time.perf_counter() - t0) / n

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
            }
        )
    )


if __name__ == "__main__":
    main()
