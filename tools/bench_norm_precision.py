#!/usr/bin/env python
"""Folded bf16-apply GroupNorm vs reference f32 GroupNorm32, on the chip.

The round-2 fused-GN study (PARITY.md "Measured utilization") showed the
UNet's ~36 GN sites are VPU-throughput-bound: XLA's f32 normalize chain is
the op-count floor, and a single-pass Pallas kernel lost (0.7-0.75x). This
measures the remaining algebraic lever: fold gamma/mu/sigma into
per-(sample,channel) a*x+b coefficients (stats still f32, one pass) and
apply as ONE compute-dtype FMA per element (UNetConfig.norm_precision=
'compute', models/unet.py::GroupNorm32).

Measurements (tunnel rule: enqueue-n + value fetch):
  A. GN-site microbench at the dominant shape [288, 96, 96, 128] bf16.
  B. whole flagship reconstruct (depth 192 -> UNet batch 576) f32 vs folded.
  C. output deviation of the folded path on identical params/inputs.

Prints one JSON line per measurement.
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


def bench_site(n):
    import jax
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.models.unet import GroupNorm32

    x = jax.random.normal(jax.random.PRNGKey(0), (288, 96, 96, 128), jnp.bfloat16)
    jax.block_until_ready(x)
    out = {}
    for name, f32_apply in (("f32", True), ("folded", False)):
        mod = GroupNorm32(dtype=jnp.bfloat16, f32_apply=f32_apply)
        v = mod.init(jax.random.PRNGKey(1), x)
        fn = jax.jit(lambda v, x, _m=mod: _m.apply(v, x).astype(jnp.float32).sum())
        out[name] = round(_time_fetch(fn, v, x, n=n) * 1e3, 3)
    print(json.dumps({"bench": "gn_site_ms", "shape": [288, 96, 96, 128], **out}),
          flush=True)


def bench_reconstruct(depth, n):
    import jax
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig

    import jax.tree_util as jtu

    slices = jax.random.uniform(jax.random.PRNGKey(1), (depth, 96, 96, 1))
    key = jax.random.PRNGKey(2)
    outs = {}
    for prec in ("float32", "compute"):
        cfg = dataclasses.replace(DDPMTaskConfig(), norm_precision=prec)
        task = DDPMTask(cfg)
        variables = task.init(jax.random.PRNGKey(0))
        # randomize params (batch_stats kept: negative randomized variance
        # would NaN the encoder BN): fresh init has zero-init output convs,
        # which would make the deviation check trivially 0
        leaves, treedef = jtu.tree_flatten(variables["params"])
        ks = jax.random.split(jax.random.PRNGKey(42), len(leaves))
        variables = dict(
            variables,
            params=jtu.tree_unflatten(
                treedef,
                [0.05 * jax.random.normal(k, l.shape, l.dtype)
                 for k, l in zip(ks, leaves)],
            ),
        )
        rec = jax.jit(lambda v, x, k, _t=task: _t.reconstruct(v, x, k))
        fn = jax.jit(
            lambda v, x, k, _t=task: _t.reconstruct(v, x, k)
            .astype(jnp.float32).sum()
        )
        dt = _time_fetch(fn, variables, slices, key, n=n)
        ens = len(cfg.step_ensemble)
        outs[prec] = {
            "s_per_call": round(dt, 4),
            "slice_denoises_per_sec": round(depth * ens / dt, 1),
        }
        if prec == "float32":
            ref_out = rec(variables, slices, key)
            ref_vars = variables
        else:
            # same params (tree-identical by construction): deviation of the
            # folded path on identical inputs
            alt_out = rec(ref_vars, slices, key)
            d = float(jnp.max(jnp.abs(ref_out - alt_out)))
            s = float(jnp.max(jnp.abs(ref_out)))
            outs["max_abs_diff"] = round(d, 6)
            outs["rel_diff"] = round(d / (s + 1e-12), 6)
    print(json.dumps({"bench": "reconstruct_norm_precision", "depth": depth,
                      **outs}), flush=True)


def bench_film_fold(depth, n):
    """FiLM-into-fold A/B (VERDICT r4 #4): flagship eval reconstruct and
    train step under norm_precision='compute' with UNetConfig.film_fold
    on vs off, plus the output deviation between the two variants."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    import numpy as np

    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig
    from conditioned_diffusion_models_uad_tpu.train.loop import (
        Trainer, TrainerConfig, init_state,
    )

    slices = jax.random.uniform(jax.random.PRNGKey(1), (depth, 96, 96, 1))
    key = jax.random.PRNGKey(2)
    out = {}
    ref_vars = None
    recs = {}
    for fold in (True, False):
        cfg = dataclasses.replace(DDPMTaskConfig(), norm_precision="compute",
                                  film_fold=fold)
        task = DDPMTask(cfg)
        variables = task.init(jax.random.PRNGKey(0))
        leaves, treedef = jtu.tree_flatten(variables["params"])
        ks = jax.random.split(jax.random.PRNGKey(42), len(leaves))
        variables = dict(
            variables,
            params=jtu.tree_unflatten(
                treedef,
                [0.05 * jax.random.normal(k, l.shape, l.dtype)
                 for k, l in zip(ks, leaves)],
            ),
        )
        if ref_vars is None:
            ref_vars = variables
        fn = jax.jit(
            lambda v, x, k, _t=task: _t.reconstruct(v, x, k)
            .astype(jnp.float32).sum()
        )
        dt = _time_fetch(fn, ref_vars, slices, key, n=n)
        ens = len(cfg.step_ensemble)
        name = "film_fold_on" if fold else "film_fold_off"
        out[name] = {
            "s_per_call": round(dt, 4),
            "slice_denoises_per_sec": round(depth * ens / dt, 1),
        }
        recs[fold] = jax.jit(
            lambda v, x, k, _t=task: _t.reconstruct(v, x, k)
        )(ref_vars, slices, key)

        # train step at the protocol batch 32
        trainer = Trainer(task, TrainerConfig(max_epochs=1, epoch_scan=False))
        state = init_state(task, jax.random.PRNGKey(0), trainer.tx)
        rng = np.random.default_rng(0)
        vols = jnp.asarray(rng.random((8, 96, 96, 32), np.float32))
        data = (vols, jnp.ones_like(vols))
        vi = jnp.asarray(rng.integers(0, 8, 32), jnp.int32)
        si = jnp.asarray(rng.integers(0, 32, 32), jnp.int32)

        def step_loss(state, data, vi, si, k, _tr=trainer):
            new_state, loss = _tr._train_step(state, data, vi, si, k)
            return new_state, loss

        # warm
        state2, loss = step_loss(state, data, vi, si, key)
        float(loss)
        t0 = time.perf_counter()
        st = state2
        losses = []
        for i in range(n):
            st, loss = step_loss(st, data, vi, si, jax.random.fold_in(key, i))
            losses.append(loss)
        for l in losses:
            float(l)
        out[name]["s_per_train_step"] = round((time.perf_counter() - t0) / n, 4)

    d = float(jnp.max(jnp.abs(recs[True] - recs[False])))
    s = float(jnp.max(jnp.abs(recs[False])))
    out["fold_vs_twopass_rel_diff"] = round(d / (s + 1e-12), 6)
    print(json.dumps({"bench": "film_fold", "depth": depth, **out}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--depth", type=int, default=192)
    p.add_argument("--skip-site", action="store_true")
    p.add_argument("--film-fold", action="store_true",
                   help="run the FiLM-into-fold A/B instead of the f32-vs-"
                        "folded comparison")
    args = p.parse_args()

    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if args.film_fold:
        bench_film_fold(args.depth, args.iters)
        return
    if not args.skip_site:
        bench_site(args.iters)
    bench_reconstruct(args.depth, args.iters)


if __name__ == "__main__":
    main()
