#!/usr/bin/env python
"""Measure the checkpoint cycle cost on the (tunneled) device (VERDICT r4 #2).

The r4 dress rehearsal measured ~50 s per best+last save at val-every-1 on a
degraded link: the FULL train state (~280 MB incl. Adam moments) crossed the
~15 MB/s D2H link synchronously. Round 5 redesigned the cycle:
  * 'best' stores params+batch_stats only (~1/3 the payload);
  * the fetch+write runs on a background writer against an on-device
    snapshot, overlapped with the next epochs' compute.

This tool times, at FLAGSHIP state size (DDPM_cond_spark_2D: UNet 128 +
resnet50 encoder + Adam moments):
  a. the on-device snapshot dispatch (what the fit loop now blocks on),
  b. a synchronous full-state device_get+orbax save (the OLD cycle),
  c. a synchronous variables-only save (the new 'best' payload),
  d. the wall-clock the fit loop observes per cycle with the async writer
     (snapshot + submit, writer drains in background; then a join to show
     the background cycle really completed).

Prints one JSON line. Run tools/tunnel_probe.py first and record both.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig
    from conditioned_diffusion_models_uad_tpu.train.checkpoint import (
        FoldCheckpointer, variables_only,
    )
    from conditioned_diffusion_models_uad_tpu.train.loop import (
        _AsyncCheckpointWriter, init_state, make_optimizer,
    )
    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    task = DDPMTask(DDPMTaskConfig())  # flagship
    state = init_state(task, jax.random.PRNGKey(0), make_optimizer(task))
    nbytes_full = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(state)
    )
    nbytes_best = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(variables_only(state))
    )

    snapshot = jax.jit(lambda s: jax.tree_util.tree_map(jnp.copy, s))
    snap = snapshot(state)  # compile
    float(jnp.asarray(snap["step"]))  # value-fetch sync
    t0 = time.perf_counter()
    snap = snapshot(state)
    float(jnp.asarray(snap["step"]))
    t_snapshot = time.perf_counter() - t0

    tmp = tempfile.mkdtemp(prefix="ckpt_cycle_")
    try:
        # OLD cycle: synchronous full fetch + best + last writes
        ck = FoldCheckpointer(os.path.join(tmp, "old"), 0)
        t0 = time.perf_counter()
        host_state = jax.device_get(state)
        t_fetch_full = time.perf_counter() - t0
        ck.maybe_save_best(host_state, 1, 0.5)
        ck.save_last(host_state, 1, 0.5)
        t_old_cycle = time.perf_counter() - t0

        # new 'best' payload alone: variables-only fetch + write. Fetch from
        # a FRESH on-device snapshot — device_get on `state` above cached
        # host copies on those exact arrays, which would zero out this timing
        ck2 = FoldCheckpointer(os.path.join(tmp, "best_only"), 0)
        snap_b = snapshot(state)
        t0 = time.perf_counter()
        host_vars = jax.device_get(variables_only(snap_b))
        t_fetch_best = time.perf_counter() - t0
        ck2.maybe_save_best(host_vars, 1, 0.5)
        t_best_cycle = time.perf_counter() - t0

        # NEW cycle as the fit loop sees it: snapshot + submit (non-blocking)
        ck3 = FoldCheckpointer(os.path.join(tmp, "async"), 0)
        writer = _AsyncCheckpointWriter()
        t0 = time.perf_counter()
        snap = snapshot(state)

        def _write(snap=snap):
            host = jax.device_get(snap)
            ck3.maybe_save_best(host, 1, 0.5)
            ck3.save_last(host, 1, 0.5)

        writer.submit(_write)
        t_loop_observed = time.perf_counter() - t0
        writer.join()
        t_async_total = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({
        "state_mb": round(nbytes_full / 1e6, 1),
        "best_payload_mb": round(nbytes_best / 1e6, 1),
        "snapshot_s": round(t_snapshot, 3),
        "old_sync_cycle_s": round(t_old_cycle, 2),
        "old_fetch_s": round(t_fetch_full, 2),
        "best_only_cycle_s": round(t_best_cycle, 2),
        "best_only_fetch_s": round(t_fetch_best, 2),
        "fit_loop_observed_s": round(t_loop_observed, 3),
        "async_total_s": round(t_async_total, 2),
    }))


if __name__ == "__main__":
    main()
