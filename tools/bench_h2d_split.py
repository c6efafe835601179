#!/usr/bin/env python
"""Split the fused eval dispatch into H2D upload vs device compute
(VERDICT r4 #7).

The production eval group dispatch (eval.volumes_per_call=2, fused) uploads
~30 MB of host payload (slice stack + orig/mask/seg per volume) and then
runs reconstruct+score as one program. On a nominal 1.2 GB/s link the upload
is ~2% of the 0.64 s dispatch; on a degraded link it can dominate. This tool
measures, at flagship eval shapes on the real chip:

  a. upload_s    — device_put of one group's full payload, value-fetch closed
  b. dispatch_s  — the full batch_call_scored (upload + program + packed
                   fetch), steady-state
  c. compute_s   — dispatch with the payload ALREADY device-resident
                   (the preprocess_backend=device production path)

Run tools/tunnel_probe.py first; upload share = a / b, and (b - c) ≈ what a
host-side double-buffer could hide at most.

Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conditioned_diffusion_models_uad_tpu.eval.harness import EvalConfig, EvalSession
    from conditioned_diffusion_models_uad_tpu.eval.reconstruct import VolumeReconstructor
    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig
    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    task = DDPMTask(DDPMTaskConfig())  # flagship
    variables = task.init(jax.random.PRNGKey(0))
    recon = VolumeReconstructor(task)

    rng = np.random.default_rng(0)
    # model/orig space of the 192x192x100 flagship raw after rescale 2 —
    # the shape the r4 chip sweep's device_fast eval compiled (cache hit)
    shape = (96, 96, 50)
    subs = []
    for i in range(2):
        subs.append({
            "vol": rng.random(shape, dtype=np.float32),
            "vol_orig": rng.random(shape, dtype=np.float32),
            "mask_orig": np.ones(shape, np.float32),
            "seg_orig": (rng.random(shape) > 0.99).astype(np.float32),
            "seg_available": True, "ID": f"S{i}", "label": 1,
        })
    payload_mb = sum(
        a.nbytes for s in subs
        for a in (s["vol"], s["vol_orig"], s["mask_orig"], s["seg_orig"])
    ) / 1e6

    session = EvalSession(EvalConfig(cc_backend="device",
                                     hausdorff_backend="device"),
                          "Brats21", "val")
    flags = session._fused_flags(shape, seg_is_host=True)
    key = jax.random.PRNGKey(7)
    keys = jnp.stack([jax.random.fold_in(key, i) for i in range(2)])

    def upload_once():
        t0 = time.perf_counter()
        devs = [
            jax.device_put(a) for s in subs
            for a in (s["vol"], s["vol_orig"], s["mask_orig"], s["seg_orig"])
        ]
        float(np.asarray(devs[-1][0, 0, :1])[0])  # value-fetch close
        return time.perf_counter() - t0, devs

    def dispatch(subjects):
        t0 = time.perf_counter()
        out = recon.batch_call_scored(variables, subjects, keys, flags)
        np.asarray(out[1])  # the packed group fetch (the production fetch)
        return time.perf_counter() - t0

    # compile + warm
    dispatch(subs)
    n = 4
    upload_s = min(upload_once()[0] for _ in range(n))
    dispatch_s = min(dispatch(subs) for _ in range(n))

    # device-resident payload variant (preprocess_backend=device path)
    dev_subs = [
        {**s, "vol": jax.device_put(s["vol"]),
         "vol_orig": jax.device_put(s["vol_orig"]),
         "mask_orig": jax.device_put(s["mask_orig"]),
         "seg_orig": jax.device_put(s["seg_orig"])} for s in subs
    ]
    jax.block_until_ready([d["seg_orig"] for d in dev_subs])
    dispatch(dev_subs)  # warm (same executable, committed inputs)
    compute_s = min(dispatch(dev_subs) for _ in range(n))

    print(json.dumps({
        "bench": "eval_h2d_split",
        "group_payload_mb": round(payload_mb, 1),
        "upload_s": round(upload_s, 3),
        "dispatch_s": round(dispatch_s, 3),
        "compute_s_device_resident": round(compute_s, 3),
        "upload_share_pct": round(100 * upload_s / dispatch_s, 1),
        "hidable_s": round(dispatch_s - compute_s, 3),
    }))


if __name__ == "__main__":
    main()
