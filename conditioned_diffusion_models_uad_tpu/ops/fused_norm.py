"""Pallas TPU kernel: fused GroupNorm(32) + FiLM scale-shift + SiLU.

Motivation (PARITY.md roofline): the eval UNet runs at ~49% of bf16 peak while
its bare convs run at ~83% — the gap is HBM traffic at the ~36 GroupNorm/SiLU/
FiLM sites between convs (reference sites: GroupNorm32 at
LDM/modules/diffusionmodules/util.py:199-216, FiLM scale-shift at
OpenAI_Unet.py:325-331). XLA computes a group norm as two HBM passes over the
activation (stats read + normalize read) plus the write; this kernel keeps one
sample's activation resident in VMEM (96x96x128 bf16 = 2.4 MB << 16 MB) and
does read -> stats -> normalize+FiLM+SiLU -> write in a single pass: 2 HBM
touches instead of 3.

Layout: x is [B, N, C] (N = H*W flattened, C in lanes — the natural NHWC
flatten). Grid over B; per-step DMA is double-buffered by Pallas. Group stats
use a one-hot [C, G] matmul on the MXU (lane-segmented reductions are awkward
on the VPU; a [C]x[C,G] matmul is free at these sizes).

`groupnorm_silu_reference` is the identical math in plain JAX (flax
nn.GroupNorm's mean/mean-of-squares formulation) — the parity twin and the
non-TPU fallback.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, gamma_ref, beta_ref, fs_ref, fsh_ref, o_ref, *,
            groups: int, eps: float, apply_silu: bool, has_film: bool):
    # block holds S samples; unrolled loop amortizes per-grid-step overhead
    for s in range(x_ref.shape[0]):
        _one_sample(x_ref, gamma_ref, beta_ref, fs_ref, fsh_ref, o_ref, s,
                    groups=groups, eps=eps, apply_silu=apply_silu,
                    has_film=has_film)


def _one_sample(x_ref, gamma_ref, beta_ref, fs_ref, fsh_ref, o_ref, s, *,
                groups: int, eps: float, apply_silu: bool, has_film: bool):
    x = x_ref[s]  # [N, C], input dtype — never materialized in f32
    n, c = x.shape
    cg = c // groups
    # one-hot group matrix [C, G] from 2D iotas (TPU needs >=2D iota)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    G = (ch // cg == gr).astype(jnp.float32)

    # Per-channel sums via MXU ones-matmuls with f32 accumulation (Mosaic's
    # dot lowering wants 2D x 2D operands). The elementwise square is taken in
    # the input dtype: its rounding errors are independent across the ~n*cg
    # elements of a group, so the accumulated relative error is ~0.4%/sqrt(n),
    # negligible against the bf16 output quantization.
    ones = jnp.ones((1, n), x.dtype)
    dn = (((1,), (0,)), ((), ()))
    s1 = jax.lax.dot_general(ones, x, dn,
                             preferred_element_type=jnp.float32)  # [1, C]
    s2 = jax.lax.dot_general(ones, x * x, dn,
                             preferred_element_type=jnp.float32)  # [1, C]
    sg = jnp.dot(jnp.concatenate([s1, s2], axis=0), G,
                 preferred_element_type=jnp.float32)  # [2, G]
    cnt = jnp.float32(n * cg)
    mean_g = sg[0:1] / cnt  # [1, G]
    var_g = sg[1:2] / cnt - mean_g * mean_g  # flax _compute_stats formulation
    inv_g = jax.lax.rsqrt(var_g + eps)
    stats = jnp.concatenate([mean_g, inv_g], axis=0)  # [2, G]
    per_c = jnp.dot(stats, G.T, preferred_element_type=jnp.float32)  # [2, C]

    # Fold GN affine + FiLM into one per-channel y = a*x + b (coefficient
    # algebra in f32 on [1, C] arrays; the big array sees 2 fused VPU ops).
    mean_c, inv_c = per_c[0:1], per_c[1:2]
    a = inv_c * gamma_ref[...].astype(jnp.float32)[None, :]
    b = beta_ref[...].astype(jnp.float32)[None, :] - mean_c * a
    if has_film:
        fi = s if fs_ref.shape[0] > 1 else 0  # broadcast film carries 1 row
        fs = fs_ref[fi].astype(jnp.float32)  # [1, C]
        fsh = fsh_ref[fi].astype(jnp.float32)
        a = a * (1.0 + fs)
        b = b * (1.0 + fs) + fsh
    y = x * a.astype(x.dtype) + b.astype(x.dtype)
    if apply_silu:
        # silu spelled out: jax.nn.sigmoid's internal f32 constant broadcast
        # fails Mosaic verification on bf16 vectors; weak-typed literals keep
        # the computation in y's dtype
        y = y / (1.0 + jnp.exp(-y))
    o_ref[s] = y.astype(o_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("groups", "eps", "apply_silu", "interpret"),
)
def _fused_pallas(x, gamma, beta, film_scale, film_shift, *,
                  groups: int, eps: float, apply_silu: bool,
                  interpret: bool = False):
    b, n, c = x.shape
    has_film = film_scale is not None
    if not has_film:  # placeholders keep one kernel signature
        film_scale = jnp.zeros((1, c), x.dtype)
        film_shift = jnp.zeros((1, c), x.dtype)
    fb = film_scale.shape[0]
    # Mosaic requires the last two block dims to divide (8, 128) or equal the
    # array dims; a [B, C] film input with block (1, C) violates that when
    # B > 1 — carry film as [B, 1, C] so the block (1, 1, C) matches exactly.
    film_scale = film_scale.reshape(fb, 1, c)
    film_shift = film_shift.reshape(fb, 1, c)
    # Pack several samples per grid step: per-step fixed overhead (~10us of
    # DMA issue + semaphore latency) dominated the 1-sample layout. Budget
    # ~24 MB of in+out blocks (x2 for double buffering stays under the cap).
    bytes_per = 2 * n * c * x.dtype.itemsize
    s_blk = max(1, min(b, (24 * 1024 * 1024) // max(bytes_per, 1)))
    while b % s_blk:
        s_blk -= 1
    return pl.pallas_call(
        partial(_kernel, groups=groups, eps=eps, apply_silu=apply_silu,
                has_film=has_film),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b // s_blk,),
        in_specs=[
            pl.BlockSpec((s_blk, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_blk if fb > 1 else 1, 1, c),
                         (lambda i: (i, 0, 0)) if fb > 1 else
                         (lambda i: (0, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_blk if fb > 1 else 1, 1, c),
                         (lambda i: (i, 0, 0)) if fb > 1 else
                         (lambda i: (0, 0, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s_blk, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # One f32 working copy of a 96x96x128 sample plus double-buffered bf16
        # blocks exceeds the default 16 MB scoped-vmem budget; v5e has 128 MB
        # of VMEM, so raise the cap (same approach as jax's ragged-attention
        # kernel) and mark the sample grid parallel.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, gamma, beta, film_scale, film_shift)


def groupnorm_silu_reference(x, gamma, beta, film: Optional[Tuple] = None,
                             *, groups: int = 32, eps: float = 1e-6,
                             apply_silu: bool = True):
    """Plain-JAX twin (flax nn.GroupNorm math: mean / mean-of-squares over the
    group axes, f32 internal). x: [B, N, C]."""
    b, n, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, n, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    mean2 = (xf * xf).mean(axis=(1, 3), keepdims=True)
    var = mean2 - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, n, c)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if film is not None:
        fs, fsh = film
        y = y * (1.0 + fs.astype(jnp.float32)[:, None, :]) \
            + fsh.astype(jnp.float32)[:, None, :]
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def fused_groupnorm_silu(x, gamma, beta, film: Optional[Tuple] = None, *,
                         groups: int = 32, eps: float = 1e-6,
                         apply_silu: bool = True,
                         use_pallas: Optional[bool] = None,
                         interpret: bool = False):
    """GroupNorm + optional FiLM (y*(1+scale)+shift) + optional SiLU.

    x: [B, H, W, C] or [B, N, C]; film = (scale [B or 1, C], shift). Uses the
    Pallas single-pass kernel on TPU, the JAX twin elsewhere."""
    shape = x.shape
    if x.ndim == 4:
        x = x.reshape(shape[0], shape[1] * shape[2], shape[3])
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        fs, fsh = (film if film is not None else (None, None))
        out = _fused_pallas(
            x, gamma, beta, fs, fsh, groups=groups, eps=eps,
            apply_silu=apply_silu, interpret=interpret,
        )
    else:
        out = groupnorm_silu_reference(
            x, gamma, beta, film, groups=groups, eps=eps, apply_silu=apply_silu
        )
    return out.reshape(shape)
