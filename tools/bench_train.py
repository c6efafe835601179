#!/usr/bin/env python
"""Flagship train-step throughput on one chip.

Times the full fused training step — on-device slice gather -> augmentation
-> simplex noise -> encoder+UNet fwd/bwd -> optax update — at the reference's
training scale (batch 32 slices @ 96x96, BASELINE.md row 6), with the tunnel
timing rule (value-fetch sync on the returned loss).

Prints one JSON line: {"s_per_step", "slices_per_sec", "steps_timed"}.
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
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--vols", type=int, default=8, help="device-resident volumes")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig
    from conditioned_diffusion_models_uad_tpu.train.loop import (
        Trainer, TrainerConfig, init_state,
    )

    task = DDPMTask(DDPMTaskConfig())  # flagship 96x96 cDDPM
    trainer = Trainer(task, TrainerConfig(max_epochs=1, epoch_scan=False))
    state = init_state(task, jax.random.PRNGKey(0), trainer.tx)

    rng = np.random.default_rng(0)
    vols = jnp.asarray(rng.random((args.vols, 96, 96, 32), np.float32))
    masks = jnp.ones_like(vols)
    data = (vols, masks)
    vi = jnp.asarray(rng.integers(0, args.vols, args.batch), jnp.int32)
    si = jnp.asarray(rng.integers(0, 32, args.batch), jnp.int32)
    key = jax.random.PRNGKey(1)

    state, loss = trainer._train_step(state, data, vi, si, key)  # compile
    float(loss)
    state, loss = trainer._train_step(state, data, vi, si, key)  # warm
    float(loss)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, loss = trainer._train_step(state, data, vi, si, key)
    final = float(loss)  # value fetch syncs the enqueued chain
    dt = (time.perf_counter() - t0) / args.iters

    assert np.isfinite(final)
    print(json.dumps({
        "s_per_step": round(dt, 4),
        "slices_per_sec": round(args.batch / dt, 1),
        "steps_timed": args.iters,
        "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
