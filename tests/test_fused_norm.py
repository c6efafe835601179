"""Fused GroupNorm+FiLM+SiLU kernel: parity with flax nn.GroupNorm math.

The Pallas kernel (ops/fused_norm.py) single-passes the norm sites that sit
between the UNet's convs (GroupNorm32 ref LDM util.py:199-216, FiLM ref
OpenAI_Unet.py:325-331). Tested here in interpreter mode against the plain
JAX twin and against flax's own nn.GroupNorm.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.ops.fused_norm import (
    fused_groupnorm_silu,
    groupnorm_silu_reference,
)


@pytest.fixture(scope="module")
def data():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    b, h, w, c = 3, 8, 8, 256
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    gamma = jax.random.normal(ks[1], (c,)) * 0.1 + 1.0
    beta = jax.random.normal(ks[2], (c,)) * 0.1
    fs = jax.random.normal(ks[3], (b, c)) * 0.2
    fsh = jax.random.normal(ks[4], (b, c)) * 0.2
    return x, gamma, beta, fs, fsh


def test_reference_matches_flax_groupnorm(data):
    x, gamma, beta, _, _ = data
    b, h, w, c = x.shape
    gn = nn.GroupNorm(num_groups=32, dtype=jnp.float32, param_dtype=jnp.float32)
    variables = {"params": {"scale": gamma, "bias": beta}}
    want = gn.apply(variables, x)
    got = groupnorm_silu_reference(
        x.reshape(b, h * w, c), gamma, beta, apply_silu=False
    ).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("film,silu", [(False, False), (True, True), (False, True)])
def test_pallas_kernel_matches_reference(data, film, silu):
    x, gamma, beta, fs, fsh = data
    f = (fs, fsh) if film else None
    want = fused_groupnorm_silu(
        x, gamma, beta, f, apply_silu=silu, use_pallas=False
    )
    got = fused_groupnorm_silu(
        x, gamma, beta, f, apply_silu=silu, use_pallas=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_kernel_bf16(data):
    x, gamma, beta, fs, fsh = data
    xb = x.astype(jnp.bfloat16)
    want = fused_groupnorm_silu(xb, gamma, beta, (fs, fsh), use_pallas=False)
    got = fused_groupnorm_silu(
        xb, gamma, beta, (fs, fsh), use_pallas=True, interpret=True
    )
    # the kernel folds GN affine + FiLM into bf16 per-channel a*x+b coeffs:
    # ~0.4% relative error on top of the twin's own bf16 output quantization
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2
    )
