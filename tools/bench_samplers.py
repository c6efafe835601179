#!/usr/bin/env python
"""Iterative-sampler benchmark: truncated reverse sampling on one chip.

BASELINE config 1 runs the reference's "truncated reverse sampling" eval —
noise the volume to t=50, then run the full ancestral chain (or DDIM) back to
x_0 (reference src/models/modules/cond_DDPM.py:432-515). The fork's own
implementation of that path is broken upstream; this repo rebuilds it as a
single `lax.scan` (diffusion/gaussian.py:226-270, 316-380) selected by
`model.reco_mode`. This tool measures its chip throughput at flagship shapes
(96x96 slices, depth-as-batch) so the capability has a recorded TPU number
next to the single-shot path bench.py measures.

Timing follows the tunnel rule (CLAUDE.md): a D2H VALUE FETCH per iteration,
median over iterations.

Prints one JSON line per mode:
  {"mode", "unet_steps_per_slice", "slice_denoises_per_sec", "s_per_volume"}
where a "denoise" is one UNet forward on one slice (so iterative modes do
`start_t` (ancestral) or `sampling_steps` (DDIM) denoises per slice).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=96, help="slices per volume")
    p.add_argument("--start-t", type=int, default=50,
                   help="truncation point of the reverse chain (BASELINE cfg 1)")
    p.add_argument("--ddim-steps", type=int, default=25)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--modes", nargs="+",
                   default=["single_shot", "ancestral", "ddim"])
    args = p.parse_args()

    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig

    base = DDPMTaskConfig()
    slices = jax.random.uniform(
        jax.random.PRNGKey(1), (args.depth, 96, 96, 1), jnp.float32
    )

    for mode in args.modes:
        cfg = dataclasses.replace(
            base,
            reco_mode=mode,
            test_timesteps=args.start_t if mode != "single_shot"
            else base.test_timesteps,
            sampling_steps=args.ddim_steps,
        )
        task = DDPMTask(cfg)
        variables = task.init(jax.random.PRNGKey(0))
        fn = jax.jit(
            lambda v, x, k, _t=task: _t.reconstruct(v, x, k)
            .astype(jnp.float32).sum()
        )
        key = jax.random.PRNGKey(2)
        float(fn(variables, slices, key))  # compile
        float(fn(variables, slices, key))  # warm
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            float(fn(variables, slices, jax.random.fold_in(key, i)))
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2]
        # UNet forwards per slice in this mode
        if mode == "single_shot":
            steps = len(cfg.step_ensemble) if cfg.noise_ensemble else 1
        elif mode == "ancestral":
            steps = args.start_t
        else:
            steps = args.ddim_steps
        print(json.dumps({
            "mode": mode,
            "unet_steps_per_slice": steps,
            "slice_denoises_per_sec": round(args.depth * steps / dt, 1),
            "s_per_volume": round(dt, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
