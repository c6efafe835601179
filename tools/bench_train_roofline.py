#!/usr/bin/env python
"""Train-step roofline: achieved TFLOP/s vs v5e bf16 peak for the full
fwd+bwd flagship training step (VERDICT r2 next-round #2).

The reference trains 1200 epochs (reference: configs/trainer/default.yaml:8-10,
configs/datamodule/IXI.yaml:63-65) so the train step dominates total pipeline
cost; eval already has a measured MFU accounting (PARITY.md "Measured
utilization") and this gives the train side the same rigor.

Per batch size it measures the real fused step (device slice gather ->
augment -> simplex noise -> encoder+UNet fwd/bwd -> optax update) under the
tunnel timing rule (enqueue-n, ONE value fetch), then converts to TFLOP/s
with the analytic UNet FLOP count x3 (fwd + ~2x bwd — the standard
fwd:bwd = 1:2 conv accounting). Variants:

  * batch 32 (reference protocol) and a larger batch (MXU saturation probe)
  * `--remat`: per-ResBlock nn.remat (DDPMTaskConfig.use_checkpoint) to see
    whether trading HBM activations for recompute changes the layout
  * `--fused-attn`: Pallas middle-block attention in the train step

Prints one JSON line per configuration.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0  # one v5e chip, bf16 MXU peak


def bench_step(batch: int, iters: int, *, remat: bool, fused_attn: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig
    from conditioned_diffusion_models_uad_tpu.models.unet import unet_flops_per_forward
    from conditioned_diffusion_models_uad_tpu.train.loop import (
        Trainer, TrainerConfig, init_state,
    )

    cfg = dataclasses.replace(
        DDPMTaskConfig(), use_checkpoint=remat, fused_attention=fused_attn
    )
    task = DDPMTask(cfg)
    trainer = Trainer(task, TrainerConfig(max_epochs=1, epoch_scan=False))
    # fwd_only below hand-mirrors train_step's gather/augment/loss body on
    # the aug_intensity path; fail loudly if the benched config ever diverges
    # from that assumption instead of silently mismeasuring the fwd/bwd split
    assert trainer.cfg.aug_full is False and trainer.cfg.aug_intensity is True, (
        "fwd_only mirrors the aug_intensity train_step body; update it if "
        "the benched TrainerConfig changes augmentation defaults"
    )
    state = init_state(task, jax.random.PRNGKey(0), trainer.tx)

    rng = np.random.default_rng(0)
    n_vols, depth = 8, 32
    vols = jnp.asarray(rng.random((n_vols, 96, 96, depth), np.float32))
    data = (vols, jnp.ones_like(vols))
    vi = jnp.asarray(rng.integers(0, n_vols, batch), jnp.int32)
    si = jnp.asarray(rng.integers(0, depth, batch), jnp.int32)
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, loss = trainer._train_step(state, data, vi, si, key)
    float(loss)
    compile_s = time.perf_counter() - t0
    state, loss = trainer._train_step(state, data, vi, si, key)  # warm
    float(loss)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = trainer._train_step(state, data, vi, si, key)
    final = float(loss)  # value fetch syncs the enqueued chain
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(final)

    # forward-only twin of the step (same gather + augment + noise + loss
    # body that value_and_grad differentiates in train/loop.py::train_step,
    # minus the backward and the optax update) — timing it at the same batch
    # splits the step's MFU into fwd vs bwd residency instead of borrowing
    # the eval-side attribution (VERDICT r3 next-round #7)
    from conditioned_diffusion_models_uad_tpu.data.augment import (
        aug_intensity_batch,
    )

    def fwd_only(state, data, vi, si, key):
        k_aug, k_loss = jax.random.split(jax.random.fold_in(key, state["step"]))
        vols, masks = data
        v = aug_intensity_batch(k_aug, vols[vi, :, :, si][..., None])
        m = masks[vi, :, :, si][..., None]
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        loss, _ = task.loss(variables, {"vol": v, "mask": m}, k_loss,
                            train=True)
        return loss

    fwd_jit = jax.jit(fwd_only)
    float(fwd_jit(state, data, vi, si, key))  # compile
    float(fwd_jit(state, data, vi, si, key))  # warm
    t0 = time.perf_counter()
    outs = [fwd_jit(state, data, vi, si, key) for _ in range(iters)]
    for o in outs:
        float(o)
    fwd_dt = (time.perf_counter() - t0) / iters

    per_fwd = unet_flops_per_forward(cfg.unet_config, (96, 96))
    total_flops = per_fwd * batch * 3.0  # fwd + bwd(2x)
    tflops = total_flops / dt / 1e12
    bwd_dt = max(dt - fwd_dt, 1e-9)  # the residual is bwd + optax update
    fwd_tflops = per_fwd * batch / fwd_dt / 1e12
    bwd_tflops = per_fwd * batch * 2.0 / bwd_dt / 1e12
    return {
        "bench": "train_roofline",
        "batch": batch,
        "remat": remat,
        "fused_attn": fused_attn,
        "s_per_step": round(dt, 4),
        "slices_per_sec": round(batch / dt, 1),
        "unet_gflops_fwd_per_slice": round(per_fwd / 1e9, 2),
        "achieved_tflops": round(tflops, 1),
        "pct_of_v5e_bf16_peak": round(100.0 * tflops / V5E_BF16_PEAK_TFLOPS, 1),
        "fwd_s": round(fwd_dt, 4),
        "bwd_s": round(bwd_dt, 4),
        "fwd_pct_of_peak": round(100.0 * fwd_tflops / V5E_BF16_PEAK_TFLOPS, 1),
        "bwd_pct_of_peak": round(100.0 * bwd_tflops / V5E_BF16_PEAK_TFLOPS, 1),
        "compile_s": round(compile_s, 1),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batches", nargs="+", type=int, default=[32, 128, 256])
    p.add_argument("--remat", action="store_true", help="also run remat variants")
    p.add_argument("--fused-attn", action="store_true",
                   help="also run Pallas-attention variants")
    args = p.parse_args()

    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    variants = [(False, False)]
    if args.remat:
        variants.append((True, False))
    if args.fused_attn:
        variants.append((False, True))
    for batch in args.batches:
        for remat, fattn in variants:
            try:
                print(json.dumps(bench_step(batch, args.iters,
                                            remat=remat, fused_attn=fattn)),
                      flush=True)
            except Exception as e:
                print(json.dumps({
                    "bench": "train_roofline", "batch": batch, "remat": remat,
                    "fused_attn": fattn,
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                }), flush=True)


if __name__ == "__main__":
    main()
