"""Fused Pallas middle-block attention (ops/attention_pallas.py) vs the
einsum formulation it replaces (models/unet.py::AttentionBlock, reference
QKVAttention OpenAI_Unet.py:449-476). The kernel runs in interpret mode on
the CPU test mesh; numerics are pinned against the plain-JAX twin, and the
custom VJP against the einsum gradients."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.ops.attention_pallas import (
    attention_reference,
    fused_attention,
)


def _qkv(b, s, h, d, dtype, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(0, 1, size=(b, s, 3, h, d)).astype(np.float32), dtype
    )


@pytest.mark.parametrize(
    "b,s,h,d",
    [
        (2, 576, 4, 64),   # the flagship middle-block shape (24x24 tokens)
        (3, 64, 2, 32),    # small odd mix
        (1, 128, 1, 128),
    ],
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_attention_matches_reference(b, s, h, d, dtype):
    qkv = _qkv(b, s, h, d, dtype)
    want = attention_reference(qkv)
    got = fused_attention(qkv, True)  # interpret mode on CPU
    assert got.shape == want.shape and got.dtype == want.dtype
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )


def test_fused_attention_reference_matches_unet_einsum():
    """The plain-JAX twin really is the AttentionBlock einsum math (scale in
    input dtype, f32 softmax, value contraction)."""
    b, s, h, d = 2, 36, 4, 16
    qkv = _qkv(b, s, h, d, jnp.float32, seed=3)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    want = jnp.einsum("bhts,bshc->bthc", weights, v)
    np.testing.assert_allclose(
        np.asarray(attention_reference(qkv)), np.asarray(want),
        rtol=1e-6, atol=1e-6,
    )


def test_fused_attention_grads_match_einsum():
    """custom_vjp backward (recompute-einsum) == differentiating the einsum
    path directly."""
    qkv = _qkv(1, 32, 2, 16, jnp.float32, seed=7)

    def loss_fused(x):
        return jnp.sum(fused_attention(x, True) ** 2)

    def loss_ref(x):
        return jnp.sum(attention_reference(x) ** 2)

    g_fused = jax.grad(loss_fused)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )


def test_attention_block_fused_flag_fallback_on_cpu():
    """On non-TPU backends the flag must be a no-op (einsum path), so the
    same variables produce identical outputs with the flag on and off."""
    from conditioned_diffusion_models_uad_tpu.models.unet import AttentionBlock

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 32)).astype(np.float32))
    blk_off = AttentionBlock(num_head_channels=16, fused=False)
    blk_on = AttentionBlock(num_head_channels=16, fused=True)
    variables = blk_off.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(
        np.asarray(blk_off.apply(variables, x)),
        np.asarray(blk_on.apply(variables, x)),
    )
