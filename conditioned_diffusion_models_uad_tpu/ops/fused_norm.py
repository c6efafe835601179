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
    x = x_ref[0].astype(jnp.float32)  # [N, C]
    n, c = x.shape
    cg = c // groups
    # one-hot group matrix [C, G] from 2D iotas (TPU needs >=2D iota)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    G = (ch // cg == gr).astype(jnp.float32)

    s1 = jnp.dot(x.sum(axis=0), G, preferred_element_type=jnp.float32)
    s2 = jnp.dot((x * x).sum(axis=0), G, preferred_element_type=jnp.float32)
    cnt = jnp.float32(n * cg)
    mean_g = s1 / cnt
    var_g = s2 / cnt - mean_g * mean_g  # flax _compute_stats formulation
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(G, mean_g, preferred_element_type=jnp.float32)  # [C]
    inv_c = jnp.dot(G, inv_g, preferred_element_type=jnp.float32)

    y = (x - mean_c[None, :]) * inv_c[None, :]
    y = y * gamma_ref[...].astype(jnp.float32)[None, :] \
        + beta_ref[...].astype(jnp.float32)[None, :]
    if has_film:
        y = y * (1.0 + fs_ref[0].astype(jnp.float32)[None, :]) \
            + fsh_ref[0].astype(jnp.float32)[None, :]
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


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
    return pl.pallas_call(
        partial(_kernel, groups=groups, eps=eps, apply_silu=apply_silu,
                has_film=has_film),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), (lambda i: (i, 0)) if fb > 1 else
                         (lambda i: (0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), (lambda i: (i, 0)) if fb > 1 else
                         (lambda i: (0, 0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
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
