#!/usr/bin/env python
"""Fused-Pallas vs einsum middle-block attention on the real chip.

Three measurements (VERDICT r2 next-round #1):
  A. attention-op microbench at the flagship middle-block shape
     qkv [B, 576, 3, 4, 64] bf16, B in {576, 1152}: XLA einsum lowering
     (HBM-materialized [B,4,576,576] scores) vs the VMEM-resident Pallas
     kernel (ops/attention_pallas.py), plus jax.nn.dot_product_attention
     for reference.
  B. whole flagship reconstruct (bench.py layout: depth 192 -> UNet batch
     576) with DDPMTaskConfig.fused_attention off/on.
  C. the 4-volume grouped dispatch (depth 384 -> batch 1152) compile
     attempt off/on — the einsum path is known NOT to compile on one v5e
     chip (PARITY.md "UNet batch scaling", 3.2 GB scores + resblock
     activations vs 15.75 GB HBM).

Timing: enqueue-n + value-fetch sync (tunnel rule, CLAUDE.md). Prints one
JSON line per measurement.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_fetch(fn, *args, n=10, warm=2):
    for _ in range(warm):
        float(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        float(o)
    return (time.perf_counter() - t0) / n


def bench_op(B, n):
    import jax
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.ops.attention_pallas import (
        attention_reference,
        fused_attention,
    )

    S, H, D = 576, 4, 64
    qkv = jax.random.normal(
        jax.random.PRNGKey(0), (B, S, 3, H, D), jnp.bfloat16
    )
    jax.block_until_ready(qkv)

    def dpa(qkv):
        # jax.nn.dot_product_attention comparison point (expects [B,S,H,D];
        # fold the reference's ch^-1/4 double-scaling into its 1/sqrt(D))
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        return jax.nn.dot_product_attention(q, k, v)

    results = {}
    for name, op in (
        ("einsum", attention_reference),
        ("pallas", fused_attention),
        ("dot_product_attention", dpa),
    ):
        fn = jax.jit(lambda x, _op=op: _op(x).astype(jnp.float32).sum())
        try:
            dt = _time_fetch(fn, qkv, n=n)
            results[name] = round(dt * 1e3, 3)
        except Exception as e:  # compile failure at this batch
            results[name] = f"FAILED: {type(e).__name__}"
    print(json.dumps({"bench": "attention_op_ms", "batch": B, **results}),
          flush=True)


def bench_reconstruct(depth, fused, n):
    import jax
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.models import (
        DDPMTask,
        DDPMTaskConfig,
    )

    cfg = dataclasses.replace(DDPMTaskConfig(), fused_attention=fused)
    task = DDPMTask(cfg)
    variables = task.init(jax.random.PRNGKey(0))
    slices = jax.random.uniform(jax.random.PRNGKey(1), (depth, 96, 96, 1))
    reconstruct = jax.jit(
        lambda v, x, k: task.reconstruct(v, x, k).astype(jnp.float32).sum()
    )
    key = jax.random.PRNGKey(2)
    try:
        dt = _time_fetch(reconstruct, variables, slices, key, n=n)
    except Exception as e:
        print(json.dumps({
            "bench": "reconstruct", "depth": depth, "fused": fused,
            "error": f"{type(e).__name__}: {str(e)[:200]}",
        }), flush=True)
        return
    ens = len(cfg.step_ensemble)
    print(json.dumps({
        "bench": "reconstruct", "depth": depth, "fused": fused,
        "unet_batch": depth * ens, "s_per_call": round(dt, 4),
        "slice_denoises_per_sec": round(depth * ens / dt, 1),
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--skip-op", action="store_true")
    p.add_argument("--skip-reconstruct", action="store_true")
    p.add_argument("--depths", nargs="+", type=int, default=[192, 384])
    args = p.parse_args()

    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if not args.skip_op:
        for B in (576, 1152):
            bench_op(B, args.iters)
    if not args.skip_reconstruct:
        for depth in args.depths:
            for fused in (False, True):
                bench_reconstruct(depth, fused, args.iters)


if __name__ == "__main__":
    main()
