#!/usr/bin/env python
"""Iterative-sampler benchmark: truncated reverse diffusion on one chip.

Times the rebuilt samplers (diffusion/gaussian.py:p_sample_loop / ddim_sample
— the upstream capability the reference fork broke, cond_DDPM.py:432-530) at
flagship shapes: a 96-slice volume noised to t=start_t and denoised through
the full truncated chain (BASELINE config 1's "truncated 50-step reverse
sampling"), with conditioning and per-step simplex noise.

Timing uses a D2H VALUE FETCH per iteration (block_until_ready can return
before queued programs execute on the tunneled transport).

usage: python tools/bench_sampler.py [--start-t 50] [--depth 96]
           [--mode ancestral|ddim|both] [--ddim-steps 50] [--iters 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--start-t", type=int, default=50)
    p.add_argument("--depth", type=int, default=96)
    p.add_argument("--mode", choices=("ancestral", "ddim", "both"), default="both")
    p.add_argument("--ddim-steps", type=int, default=50)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig

    task = DDPMTask(DDPMTaskConfig())  # flagship 96x96 cDDPM
    variables = task.init(jax.random.PRNGKey(0))
    d = args.depth
    slices = jax.random.uniform(jax.random.PRNGKey(1), (d, 96, 96, 1))

    def run_mode(use_ddim: bool) -> dict:
        steps = args.ddim_steps if use_ddim else args.start_t

        @jax.jit
        def sample_fn(variables, slices01, key):
            cond, _ = task.encode(variables, slices01, train=False)
            out = task.sample(
                variables, slices01.shape, key, cond=cond, x_start01=slices01,
                start_t=args.start_t, use_ddim=use_ddim,
                sampling_timesteps=args.ddim_steps,
            )
            return out.astype(jnp.float32).sum()  # scalar for the value fetch

        key = jax.random.PRNGKey(2)
        float(sample_fn(variables, slices, key))  # compile + warm
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            float(sample_fn(variables, slices, jax.random.fold_in(key, i)))
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2]
        return {
            "sampler": "ddim" if use_ddim else "ancestral",
            "start_t": args.start_t,
            "unet_steps": steps,
            "depth": d,
            "s_per_volume": round(dt, 3),
            "slices_per_sec": round(d / dt, 2),
            "slice_denoises_per_sec": round(d * steps / dt, 1),
        }

    out = []
    if args.mode in ("ancestral", "both"):
        out.append(run_mode(False))
    if args.mode in ("ddim", "both"):
        out.append(run_mode(True))
    for r in out:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
