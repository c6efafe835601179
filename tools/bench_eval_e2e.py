#!/usr/bin/env python
"""End-to-end orchestrated eval benchmark (the north-star wall-clock path).

Drives the REAL `orchestrate.evaluate()` protocol — threaded NIfTI prefetch,
mesh/single-chip slice-parallel reconstruction with the t-ensemble flattened
into the batch, device-fused post-processing, val-threshold-fit → test — over
a synthetic flagship-sized eval set (192×192×100 raw → 96×96×50 model space),
and reports per-volume wall-clock. Counterpart of the reference's measured
3.0–4.1 s/volume on its benchmark GPU (BASELINE.md, NEW_OUTPUT.txt:6880).

usage:
  python tools/bench_eval_e2e.py [--volumes 5] [--backend host|device]
      [--data-dir /tmp/bench_e2e_data] [--keep-logs]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--volumes", type=int, default=5,
                   help="eval subjects per set per stage")
    p.add_argument("--backend", choices=("host", "device"), default="host")
    p.add_argument("--data-dir", default="/tmp/bench_e2e_data")
    p.add_argument("--image-dim", type=int, nargs=3, default=(192, 192, 100))
    p.add_argument("--testsets", nargs="+", default=["Brats21", "MSLUB"])
    p.add_argument("--scorer-threads", type=int, default=None,
                   help="override EvalConfig.scorer_threads")
    p.add_argument("--volumes-per-call", type=int, default=1,
                   help="volumes reconstructed per device dispatch "
                        "(2 = batch-576 UNet layout)")
    p.add_argument("--cc-backend", choices=("host", "device"), default="host",
                   help="connected-component filter: scipy on host or the "
                        "fused device labeler (eval/cc.py)")
    p.add_argument("--hausdorff-backend", choices=("host", "device"),
                   default="host",
                   help="surface Hausdorff: bbox scipy EDT or the device "
                        "separable squared-EDT (eval/hausdorff.py)")
    p.add_argument("--no-fused-dispatch", action="store_true",
                   help="disable the one-dispatch reconstruct+score chaining "
                        "(EvalConfig.fused_dispatch) for A/B timing")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the timed pass")
    args = p.parse_args()

    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from conditioned_diffusion_models_uad_tpu.config import RunConfig
    from conditioned_diffusion_models_uad_tpu.data.datamodules import DataConfig
    from conditioned_diffusion_models_uad_tpu.data.synthetic import build_synthetic_root
    from conditioned_diffusion_models_uad_tpu.eval.harness import EvalConfig
    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig
    from conditioned_diffusion_models_uad_tpu.orchestrate import evaluate

    dims = tuple(args.image_dim)
    # stamp the generation parameters: a rerun with different --volumes /
    # --image-dim / --testsets must rebuild, not silently reuse a stale set
    import json

    gen_params = json.dumps(
        {"volumes": args.volumes, "image_dim": list(dims),
         "testsets": sorted(args.testsets), "v": 2}, sort_keys=True,
    )
    stamp = os.path.join(args.data_dir, ".built")
    stale = True
    if os.path.exists(stamp):
        with open(stamp) as f:
            stale = f.read() != gen_params
    if stale:
        shutil.rmtree(args.data_dir, ignore_errors=True)
        build_synthetic_root(
            args.data_dir, shape=dims, n_train=1, n_val=args.volumes,
            n_test=args.volumes, n_eval=args.volumes, eval_sets=tuple(args.testsets),
        )
        with open(stamp, "w") as f:
            f.write(gen_params)

    cfg = RunConfig(
        name="bench_eval_e2e",
        seed=0,
        log_dir=tempfile.mkdtemp(prefix="bench_e2e_logs_"),
        model=DDPMTaskConfig(),  # flagship: 96x96, resnet50 cond, x3 ensemble
        data=DataConfig(
            data_dir=args.data_dir, image_dim=dims, rescale_factor=2.0,
            testsets=tuple(args.testsets), preprocess_backend=args.backend,
        ),
        eval=EvalConfig(save_output_images=False),
    )
    if args.scorer_threads is not None:
        cfg.eval.scorer_threads = args.scorer_threads
    cfg.eval.volumes_per_call = args.volumes_per_call
    cfg.eval.cc_backend = args.cc_backend
    cfg.eval.hausdorff_backend = args.hausdorff_backend
    cfg.eval.fused_dispatch = not args.no_fused_dispatch
    cfg.eval.out_dir = cfg.run_dir

    task = DDPMTask(cfg.model)
    variables = task.init(jax.random.PRNGKey(0))

    class _NullLogger:
        def log_metrics(self, metrics, step=0):
            pass

    # warm pass over one (subset) testset to amortize XLA compiles out of the
    # timing (steady-state is what the <10 min full-eval target measures)
    import dataclasses as _dc

    warm = _dc.replace(
        cfg, data=_dc.replace(cfg.data, sample_set=True, testsets=(args.testsets[0],))
    )
    t0 = time.perf_counter()
    evaluate(warm, task, variables, fold=0, logger=_NullLogger())
    compile_s = time.perf_counter() - t0

    n_vols = len(args.testsets) * 2 * args.volumes
    if args.trace:
        jax.profiler.start_trace(args.trace)
    t0 = time.perf_counter()
    preds = evaluate(cfg, task, variables, fold=0, logger=_NullLogger())
    dt = time.perf_counter() - t0
    if args.trace:
        jax.profiler.stop_trace()

    for stage in preds:
        for s, ev in preds[stage].items():
            assert "DicePerVolMean" in ev

    print(
        f"backend={args.backend} volumes={n_vols} "
        f"group={args.volumes_per_call} cc={args.cc_backend} "
        f"total={dt:.1f}s per-volume={dt / n_vols:.2f}s "
        f"(warm+compile pass {compile_s:.1f}s)"
    )


if __name__ == "__main__":
    main()
