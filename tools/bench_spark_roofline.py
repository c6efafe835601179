#!/usr/bin/env python
"""SparK pretrain-step roofline: achieved TFLOP/s vs v5e bf16 peak for the
full fwd+bwd masked-image-modeling step.

The reference pretrains the conditioning encoder for 1200 epochs
(configs/experiment/cDDPM/Spark_2D_pretrain.yaml:28 max_epochs: 1200;
reference src/models/Spark_2D.py:12-127), so this is the second training
path that dominates pipeline cost after the cDDPM fold — and the one without
an MFU accounting (tools/bench_train_roofline.py covers the DDPM step).

FLOP accounting: unlike the UNet there is no analytic count in-tree for
ResNet-50 + LightDecoder, so this uses XLA's own HLO cost analysis of the
COMPILED fused step (gather -> augment -> mask -> sparse encoder + decoder
fwd/bwd -> optax update): `jitted.lower(...).compile().cost_analysis()`.
That counts exactly what the chip executes (fwd + bwd + update), so no
fwd:bwd heuristic is needed. Timing follows the tunnel rule: enqueue-n
iterations, ONE value fetch to sync.

Prints one JSON line per batch size.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0  # one v5e chip, bf16 MXU peak


def _cost_flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    if flops <= 0.0:  # some PJRT backends report -1 / omit the key entirely
        raise RuntimeError(
            "cost_analysis reported no flops — the roofline numbers would be "
            "meaningless 0% figures; use a backend with HLO cost accounting"
        )
    return flops


def bench_step(batch: int, iters: int, norm_precision: str = "compute") -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conditioned_diffusion_models_uad_tpu.models import SparkTask, SparkTaskConfig
    from conditioned_diffusion_models_uad_tpu.train.loop import (
        Trainer, TrainerConfig, init_state,
    )

    # flagship: 96x96 resnet50, ratio .65; norm_precision='compute' is the
    # NON-default folded MaskedBatchNorm apply, compared against the task
    # default 'float32' f32-normalize chain (SparkTaskConfig defaults to
    # 'float32': measured faster at the protocol batch 32, models/tasks.py)
    task = SparkTask(SparkTaskConfig(norm_precision=norm_precision))
    trainer = Trainer(task, TrainerConfig(max_epochs=1, epoch_scan=False))
    state = init_state(task, jax.random.PRNGKey(0), trainer.tx)

    rng = np.random.default_rng(0)
    n_vols, depth = 8, 32
    vols = jnp.asarray(rng.random((n_vols, 96, 96, depth), np.float32))
    data = (vols, jnp.ones_like(vols))
    vi = jnp.asarray(rng.integers(0, n_vols, batch), jnp.int32)
    si = jnp.asarray(rng.integers(0, depth, batch), jnp.int32)
    key = jax.random.PRNGKey(1)

    # the AOT compile exists for cost_analysis; execution below goes through
    # the jit call path (same HLO — the persistent cache dedupes the compile),
    # so compile_s covers the AOT compile only, not first-call latency
    t0 = time.perf_counter()
    lowered = trainer._train_step.lower(state, data, vi, si, key)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    step_flops = _cost_flops(compiled)

    state, loss = trainer._train_step(state, data, vi, si, key)  # warm (donation)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = trainer._train_step(state, data, vi, si, key)
    final = float(loss)  # value fetch syncs the enqueued chain
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(final)

    tflops = step_flops / dt / 1e12
    return {
        "bench": "spark_roofline",
        "batch": batch,
        "norm_precision": norm_precision,
        "s_per_step": round(dt, 4),
        "slices_per_sec": round(batch / dt, 1),
        "xla_gflops_per_step": round(step_flops / 1e9, 1),
        "achieved_tflops": round(tflops, 1),
        "pct_of_v5e_bf16_peak": round(100.0 * tflops / V5E_BF16_PEAK_TFLOPS, 1),
        "aot_compile_s": round(compile_s, 1),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batches", nargs="+", type=int, default=[32, 128, 512])
    p.add_argument("--norm-precision", nargs="+", default=["compute"],
                   choices=["compute", "float32"])
    args = p.parse_args()

    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    for norm in args.norm_precision:
        for batch in args.batches:
            try:
                print(json.dumps(bench_step(batch, args.iters, norm)), flush=True)
            except Exception as e:
                print(json.dumps({
                    "bench": "spark_roofline", "batch": batch,
                    "norm_precision": norm,
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                }), flush=True)


if __name__ == "__main__":
    main()
