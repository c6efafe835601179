"""Fused (flash-style) self-attention Pallas TPU kernel for the UNet
middle block.

Reference counterpart: QKVAttention "new order" attention at the 24x24
middle block (reference: src/models/modules/OpenAI_Unet.py:341-480). The
XLA lowering of the einsum formulation (models/unet.py::AttentionBlock)
materializes the attention scores as a [B, H, S, S] HBM tensor — at the
flagship eval layout (S=576 tokens, 4 heads) that is ~1.5 GB of HBM traffic
per direction at batch 576, and at batch 1152 (a 4-volume grouped eval
dispatch) the 3.2 GB score buffer is what makes the program fail to compile
on one v5e chip (PARITY.md "UNet batch scaling").

This kernel never touches HBM with the scores: one grid program per
(batch, head) loads that head's q/k/v rows ([S, D] ~ 72 KB each at the
flagship shape), computes logits + softmax + the value contraction entirely
in VMEM (logits [S, S] f32 ~ 1.3 MB), and writes only the [S, D] output.
HBM traffic drops from O(B*H*S^2) to O(B*S*H*D) — the kernel is DMA-bound
at ~0.3 MB/program instead of score-bound.

No online-softmax tiling is needed: S = 576 rows fit comfortably in VMEM
(16 MB/core), so the whole row block is resident and the softmax is exact
single-pass. The numerics mirror the einsum path exactly: q and k are
scaled by ch^-1/4 in the INPUT dtype (the reference's "new attention
order", q*scale and k*scale before the product), the logit accumulation and
softmax run in float32, and the value contraction accumulates in float32
before casting back.

Training still differentiates through the op: a custom VJP recomputes the
einsum formulation for the backward pass (same gradients, the old memory
cost — the kernel's memory win is aimed at the forward-only eval path).

`attention_reference` is the identical math in plain JAX — the twin used to
test the kernel exactly and to serve non-TPU backends.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attention_reference(qkv: jax.Array) -> jax.Array:
    """Plain-JAX twin: qkv [B, S, 3, H, D] -> out [B, S, H, D] (the einsum
    formulation of models/unet.py::AttentionBlock, new-order scaling)."""
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = 1.0 / math.sqrt(math.sqrt(q.shape[-1]))
    logits = jnp.einsum(
        "bthc,bshc->bhts", q * scale, k * scale,
        preferred_element_type=jnp.float32,
    )
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshc->bthc", weights, v)


def _attn_kernel(qkv_ref, out_ref):
    """One (batch, head) program: q/k/v rows resident in VMEM, scores never
    leave the chip. Block shapes: qkv [1, 1, 3, S, D], out [1, 1, S, D] —
    (S, D) must be the trailing two dims (Mosaic tiling constraint: the last
    two block dims are the sublane/lane axes)."""
    q = qkv_ref[0, 0, 0, :, :]
    k = qkv_ref[0, 0, 1, :, :]
    v = qkv_ref[0, 0, 2, :, :]
    scale = 1.0 / math.sqrt(math.sqrt(q.shape[-1]))
    # scale in the INPUT dtype first (bit-matches the einsum path's q*scale)
    qs = q * jnp.asarray(scale, q.dtype)
    ks = k * jnp.asarray(scale, k.dtype)
    logits = jax.lax.dot_general(
        qs, ks,
        dimension_numbers=(((1,), (1,)), ((), ())),  # [S, S] = q @ k^T
        preferred_element_type=jnp.float32,
    )
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        weights, v,
        dimension_numbers=(((1,), (0,)), ((), ())),  # [S, D]
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0, :, :] = out.astype(out_ref.dtype)


def _fused_attention_fwd_impl(qkv: jax.Array, *, interpret: bool) -> jax.Array:
    b, s, three, h, d = qkv.shape
    assert three == 3, f"expected qkv axis of size 3, got {three}"
    # (S, D) must be the trailing two dims for the kernel's VMEM blocks; the
    # [B,S,3,H,D] -> [B,H,3,S,D] transpose is O(B*S*H*D) HBM traffic —
    # negligible next to the O(B*H*S^2) score tensor this kernel removes
    qkv_t = jnp.transpose(qkv, (0, 3, 2, 1, 4))
    flops = 2 * 2 * b * h * s * s * d  # two matmuls per (b, h)
    bytes_accessed = 2 * qkv.size * qkv.dtype.itemsize
    out = pl.pallas_call(
        _attn_kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 3, s, d),
                lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, s, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=b * h * s * s
        ),
        interpret=interpret,
    )(qkv_t)
    return jnp.transpose(out, (0, 2, 1, 3))  # -> [B, S, H, D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_attention(qkv: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused middle-block self-attention: qkv [B, S, 3, H, D] (the Dense
    projection's natural layout) -> [B, S, H, D]. Forward runs the Pallas
    kernel; gradients fall back to the einsum formulation (recompute)."""
    return _fused_attention_fwd_impl(qkv, interpret=interpret)


def _fused_attention_fwd(qkv, interpret):
    return _fused_attention_fwd_impl(qkv, interpret=interpret), qkv


def _fused_attention_bwd(interpret, qkv, g):
    # recompute-einsum VJP: exact gradients at the einsum path's memory cost
    _, vjp = jax.vjp(attention_reference, qkv)
    return vjp(g)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
