"""Golden tests for diffusion schedules against the published formulas
(reference semantics: src/models/modules/cond_DDPM.py:271-377)."""
import math

import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.diffusion import (
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
)


def _ref_cosine(T, s=0.008):
    steps = T + 1
    x = np.linspace(0, T, steps, dtype=np.float64)
    ac = np.cos(((x / T) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


@pytest.mark.parametrize("T", [10, 100, 1000])
def test_cosine_schedule_matches_formula(T):
    np.testing.assert_allclose(cosine_beta_schedule(T), _ref_cosine(T), rtol=1e-12)


def test_linear_schedule_endpoints():
    T = 1000
    b = linear_beta_schedule(T)
    assert b[0] == pytest.approx(1e-4)
    assert b[-1] == pytest.approx(0.02)
    assert np.all(np.diff(b) > 0)


def test_derived_tables():
    sched = make_schedule(timesteps=100, beta_schedule="cosine")
    betas = _ref_cosine(100)
    alphas_cumprod = np.cumprod(1 - betas)
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), alphas_cumprod, rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod), np.sqrt(alphas_cumprod), rtol=1e-6, atol=1e-7
    )
    acp = np.concatenate([[1.0], alphas_cumprod[:-1]])
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod_prev), acp, rtol=1e-6, atol=1e-7
    )
    post_var = betas * (1 - acp) / (1 - alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance), post_var, rtol=1e-5
    )
    c1 = betas * np.sqrt(acp) / (1 - alphas_cumprod)
    c2 = (1 - acp) * np.sqrt(1 - betas) / (1 - alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef1), c1, rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef2), c2, rtol=1e-5, atol=1e-8
    )


def test_p2_weight_gamma_zero_is_ones():
    sched = make_schedule(timesteps=50, p2_loss_weight_gamma=0.0)
    np.testing.assert_allclose(np.asarray(sched.p2_loss_weight), 1.0)


def test_p2_weight_gamma_one():
    sched = make_schedule(timesteps=50, p2_loss_weight_gamma=1.0)
    betas = _ref_cosine(50)
    ac = np.cumprod(1 - betas)
    expected = (1 + ac / (1 - ac)) ** -1.0
    np.testing.assert_allclose(np.asarray(sched.p2_loss_weight), expected, rtol=1e-5)
