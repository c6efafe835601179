"""Unit + golden tests for the Gaussian diffusion process
(reference semantics: src/models/modules/cond_DDPM.py:379-655)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.diffusion import (
    GaussianDiffusionConfig,
    box_to_mask,
    ddim_sample,
    diffusion_call,
    make_schedule,
    model_predictions,
    p_losses,
    p_sample_loop,
    predict_noise_from_start,
    predict_start_from_noise,
    q_sample,
)

SCHED = make_schedule(timesteps=100)
CFG = GaussianDiffusionConfig(objective="pred_x0", loss_type="l1")


def test_q_sample_formula():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (4, 8, 8, 1))
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
    t = jnp.array([0, 10, 50, 99])
    xt = q_sample(SCHED, x0, t, noise)
    ac = np.asarray(SCHED.alphas_cumprod)
    for i, ti in enumerate([0, 10, 50, 99]):
        expected = np.sqrt(ac[ti]) * np.asarray(x0)[i] + np.sqrt(1 - ac[ti]) * np.asarray(noise)[i]
        np.testing.assert_allclose(np.asarray(xt)[i], expected, rtol=1e-5, atol=1e-6)


def test_predict_start_noise_roundtrip():
    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(key, (3, 8, 8, 1))
    noise = jax.random.normal(jax.random.PRNGKey(3), (3, 8, 8, 1))
    t = jnp.array([5, 40, 90])
    xt = q_sample(SCHED, x0, t, noise)
    # invert: recover x0 from (xt, noise) and noise from (xt, x0)
    x0_rec = predict_start_from_noise(SCHED, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), rtol=1e-3, atol=1e-4)
    n_rec = predict_noise_from_start(SCHED, xt, t, x0)
    np.testing.assert_allclose(np.asarray(n_rec), np.asarray(noise), rtol=1e-3, atol=1e-4)


def test_p_losses_perfect_model_zero_loss():
    """A model that outputs exactly x_start gives zero loss under pred_x0."""
    x0 = jax.random.uniform(jax.random.PRNGKey(4), (2, 8, 8, 1)) * 2 - 1

    def perfect_model(x, t, cond):
        return x0

    t = jnp.array([10, 20])
    loss, reco = p_losses(
        SCHED, CFG, perfect_model, x0, t, key=jax.random.PRNGKey(5)
    )
    assert float(loss) == pytest.approx(0.0, abs=1e-6)
    np.testing.assert_allclose(np.asarray(reco), (np.asarray(x0) + 1) / 2, atol=1e-6)


def test_p_losses_l1_value():
    """Loss equals mean |model_out - x0| when p2 weights are 1."""
    x0 = jnp.zeros((2, 4, 4, 1))

    def biased_model(x, t, cond):
        return jnp.full_like(x, 0.5)

    t = jnp.array([1, 2])
    loss, _ = p_losses(SCHED, CFG, biased_model, x0, t, key=jax.random.PRNGKey(6))
    assert float(loss) == pytest.approx(0.5, abs=1e-6)


def test_p_losses_pred_noise_target():
    cfg = GaussianDiffusionConfig(objective="pred_noise", loss_type="l2")
    x0 = jnp.zeros((2, 4, 4, 1))
    noise = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 4, 1))

    def noise_oracle(x, t, cond):
        return noise

    t = jnp.array([3, 7])
    loss, reco = p_losses(SCHED, cfg, noise_oracle, x0, t, noise=noise)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)
    # reco for a perfect noise prediction recovers x0 scaled by sqrt(a_t) -> unnormalized
    ac = np.asarray(SCHED.alphas_cumprod)
    for i, ti in enumerate([3, 7]):
        expected = (np.sqrt(ac[ti]) * np.asarray(x0)[i] + 1) / 2
        np.testing.assert_allclose(np.asarray(reco)[i], expected, atol=1e-5)


def test_brain_mask_zeroes_outside():
    x0 = jnp.ones((1, 4, 4, 1)) * 0.5
    mask = jnp.zeros((1, 4, 4, 1)).at[:, 1:3, 1:3].set(1.0)

    def model(x, t, cond):
        return jnp.ones_like(x)

    t = jnp.array([10])
    # masked model_out = mask; target = x0 -> per-pixel err |mask - 0.5|
    loss, _ = p_losses(SCHED, CFG, model, x0, t, key=jax.random.PRNGKey(8), brain_mask=mask)
    assert float(loss) == pytest.approx(0.5, abs=1e-6)


def test_box_mask_semantics():
    box = jnp.array([[1, 1, 3, 3]], dtype=jnp.int32)  # x0,y0,x1,y1
    m = box_to_mask(box, 4, 4)
    expected = np.zeros((1, 4, 4, 1), bool)
    expected[0, 1:3, 1:3, 0] = True
    np.testing.assert_array_equal(np.asarray(m), expected)

    # x outside the box must stay clean (x_start)
    x0 = jnp.zeros((1, 4, 4, 1))
    seen = {}

    def capture_model(x, t, cond):
        seen["x"] = x
        return x0

    t = jnp.array([50])
    noise = jnp.ones((1, 4, 4, 1))
    p_losses(SCHED, CFG, capture_model, x0, t, noise=noise, box_mask=m)
    x_in = np.asarray(seen["x"])
    assert np.all(x_in[0, 0, :, 0] == 0)  # outside: clean
    assert np.all(x_in[0, 1:3, 1:3, 0] != 0)  # inside: noised


def test_diffusion_call_fixed_t_broadcast():
    x01 = jnp.full((3, 4, 4, 1), 0.25)
    captured = {}

    def model(x, t, cond):
        captured["t"] = t
        return jnp.zeros_like(x)

    diffusion_call(SCHED, CFG, model, x01, key=jax.random.PRNGKey(9), t=42)
    np.testing.assert_array_equal(np.asarray(captured["t"]), [42, 42, 42])


def test_p_sample_loop_perfect_model_recovers_x0():
    """With a model that always predicts the true x0, ancestral sampling from a
    truncated start converges to x0 (posterior mean collapses onto x0 as t->0)."""
    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(10), (2, 8, 8, 1)) * 0.3, -1, 1)

    def perfect_model(x, t, cond):
        return x0

    out = p_sample_loop(
        SCHED, CFG, perfect_model, (2, 8, 8, 1),
        key=jax.random.PRNGKey(11), start_t=50, x_start=x0,
    )
    np.testing.assert_allclose(np.asarray(out), (np.asarray(x0) + 1) / 2, atol=0.02)


def test_ddim_sample_runs_and_is_finite():
    x0 = jnp.zeros((1, 8, 8, 1))

    def model(x, t, cond):
        return jnp.zeros_like(x)

    out = ddim_sample(
        SCHED, CFG, model, (1, 8, 8, 1),
        key=jax.random.PRNGKey(12), sampling_timesteps=10, start_t=50, x_start=x0,
    )
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=0.05)


def test_model_predictions_consistency():
    """pred_noise derived from pred_x0 objective satisfies the q_sample identity."""
    x0 = jax.random.normal(jax.random.PRNGKey(13), (2, 4, 4, 1)) * 0.1
    noise = jax.random.normal(jax.random.PRNGKey(14), (2, 4, 4, 1))
    t = jnp.array([30, 60])
    xt = q_sample(SCHED, x0, t, noise)

    def perfect_model(x, tt, cond):
        return x0

    pred_noise, pred_x0 = model_predictions(SCHED, CFG, perfect_model, xt, t)
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_noise), np.asarray(noise), rtol=1e-2, atol=1e-3)


def test_interpolate():
    """Latent interpolation capability (ref cond_DDPM.py:532-546)."""
    import jax
    import jax.numpy as jnp
    from conditioned_diffusion_models_uad_tpu.diffusion import (
        GaussianDiffusionConfig,
        interpolate,
        make_schedule,
    )

    sched = make_schedule(8)
    cfg = GaussianDiffusionConfig()
    model_fn = lambda x, t, cond: x * 0.5  # dummy pred_x0 model
    x1 = jnp.zeros((2, 8, 8, 1))
    x2 = jnp.ones((2, 8, 8, 1))
    out = interpolate(
        sched, cfg, model_fn, x1, x2, key=jax.random.PRNGKey(0), t=4, lam=0.5
    )
    assert out.shape == x1.shape
    assert bool(jnp.isfinite(out).all())
