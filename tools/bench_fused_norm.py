#!/usr/bin/env python
"""Measure the fused GroupNorm+FiLM+SiLU Pallas kernel vs XLA at UNet shapes.

The eval UNet's MFU gap is inter-conv HBM traffic at ~36 GroupNorm sites
(PARITY.md roofline). This times, per site shape, the XLA lowering of
flax-GroupNorm+FiLM+SiLU against the single-pass Pallas kernel
(ops/fused_norm.py), value-fetch-synced. Shapes: the flagship eval batch
(96 slices x 3 ensemble = 288) at each UNet level.

usage: python tools/bench_fused_norm.py [--batch 288] [--iters 10]
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
    p.add_argument("--batch", type=int, default=288)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--loop", type=int, default=50,
                   help="op applications chained inside one jit; the tunnel's "
                        "D2H RTT (~40ms) would otherwise swamp sub-ms kernels")
    p.add_argument("--probe", action="store_true",
                   help="decompose cost: pure stream FMA / silu-only / "
                        "GN-only / full chain, XLA lowering, first shape only")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.ops.fused_norm import (
        fused_groupnorm_silu,
        groupnorm_silu_reference,
    )

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b = args.batch
    shapes = [(b, 96, 96, 128), (b, 48, 48, 256), (b, 24, 24, 256)]
    key = jax.random.PRNGKey(0)

    def timed(fn, x, *rest):
        # Chain the op through a scan so one dispatch runs `loop` data-
        # dependent applications; a single scalar fetch syncs the program.
        @jax.jit
        def many(x, *rest):
            def body(h, _):
                return fn(h, *rest), None
            h, _ = jax.lax.scan(body, x, None, length=args.loop)
            return h
        out = many(x, *rest)
        float(jnp.ravel(out)[0].astype(jnp.float32))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = many(x, *rest)
            float(jnp.ravel(out)[0].astype(jnp.float32))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2] / args.loop

    for shape in shapes:
        ks = jax.random.split(jax.random.fold_in(key, shape[-1]), 4)
        # pre-flatten to [B, N, C]: the scan carry must keep one shape
        x = jax.random.normal(
            ks[0], (shape[0], shape[1] * shape[2], shape[3]), dt
        )
        c = shape[-1]
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        fs = (jax.random.normal(ks[1], (b, c), jnp.float32) * 0.1)
        fsh = (jax.random.normal(ks[2], (b, c), jnp.float32) * 0.1)

        if args.probe:
            bytes_rw = 2 * x.size * x.dtype.itemsize
            probes = {
                "stream_fma": lambda x, g, bb, s, sh: x * 1.0001 + 0.0001,
                "silu_only": lambda x, g, bb, s, sh: x / (1.0 + jnp.exp(-x)),
                "gn_only": lambda x, g, bb, s, sh: groupnorm_silu_reference(
                    x, g, bb, None, apply_silu=False),
                "gn_film_silu": lambda x, g, bb, s, sh:
                    groupnorm_silu_reference(x, g, bb, (s, sh)),
            }
            for name, fn in probes.items():
                t = timed(fn, x, gamma, beta, fs, fsh)
                print(json.dumps({
                    "probe": name, "shape": list(shape),
                    "ms": round(t * 1e3, 3),
                    "gbps_2touch": round(bytes_rw / t / 1e9, 1),
                }))
            break

        xla_fn = lambda x, g, bb, s, sh: groupnorm_silu_reference(
            x, g, bb, (s, sh)
        )
        pallas_fn = lambda x, g, bb, s, sh: fused_groupnorm_silu(
            x, g, bb, (s, sh), use_pallas=True
        )
        t_xla = timed(xla_fn, x, gamma, beta, fs, fsh)
        t_pal = timed(pallas_fn, x, gamma, beta, fs, fsh)
        bytes_rw = 2 * x.size * x.dtype.itemsize  # 1 read + 1 write ideal
        print(json.dumps({
            "shape": list(shape), "dtype": args.dtype,
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "speedup": round(t_xla / t_pal, 2),
            "pallas_gbps": round(bytes_rw / t_pal / 1e9, 1),
        }))


if __name__ == "__main__":
    main()
