"""Eval-forward scalar parity: latentSpace / AnomalyScoreRegPerVol / the
use_postprocessed_score=False scoring branch.

The reference's task modules record model-side scalars before delegating to
_test_step: the encoder latent mean (DDPM_2D.py:214-223,267), the diffusion
loss of the last ensemble member (:251-254,272), and — when
use_postprocessed_score is off — volume scores derived from that loss
(:276-280). Spark scores volumes by its forward loss built on L1_AE
(Spark_2D.py:26-33,86-112).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.diffusion import diffusion_call
from conditioned_diffusion_models_uad_tpu.eval.harness import EvalConfig, EvalSession
from conditioned_diffusion_models_uad_tpu.eval.reconstruct import VolumeReconstructor
from conditioned_diffusion_models_uad_tpu.models.tasks import (
    DDPMTask,
    DDPMTaskConfig,
    SparkTask,
    SparkTaskConfig,
)

TINY = dict(
    image_hw=(32, 32), cond_dim=16, encoder_backbone="resnet18",
    timesteps=20, unet_dim=32, num_res_blocks=1, channel_mult=(1, 2),
    attention_resolutions=(), test_timesteps=10, step_ensemble=(5, 10),
    dtype="float32",
)


@pytest.fixture(scope="module")
def ddpm():
    task = DDPMTask(DDPMTaskConfig(**TINY))
    return task, task.init(jax.random.PRNGKey(0))


def test_single_shot_aux_matches_scalar_loss(ddpm):
    """mean(loss_per_slice) == the scalar diffusion loss at the same key,
    and latent_per_slice == the conditioning features."""
    task, variables = ddpm
    cfg = DDPMTaskConfig(**TINY, noise_ensemble=False)
    task1 = DDPMTask(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 1))
    key = jax.random.PRNGKey(2)
    reco, aux = jax.jit(task1.reconstruct_with_aux)(variables, x, key)
    assert aux["loss_per_slice"].shape == (4,)
    assert aux["latent_per_slice"].shape == (4, 16)

    cond, _ = task1.encode(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(aux["latent_per_slice"]), np.asarray(cond), rtol=1e-5
    )
    noise = task1.noise_fn(key, x.shape)
    loss, _ = diffusion_call(
        task1.sched, task1.gd_cfg, task1._model_fn(variables), x,
        key=key, t=cfg.test_timesteps - 1, cond=cond, noise=noise,
    )
    np.testing.assert_allclose(
        float(aux["loss_per_slice"].mean()), float(loss), rtol=1e-5
    )


def test_ensemble_aux_is_last_member(ddpm):
    """The ensemble aux loss reproduces the reference's overwrite semantics:
    only the LAST step_ensemble member's loss survives (DDPM_2D.py:225-254)."""
    task, variables = ddpm
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 1))
    key = jax.random.PRNGKey(4)
    _, aux = jax.jit(task.reconstruct_with_aux)(variables, x, key)

    # replicate the flattened call's noise for the last member
    e = len(task.cfg.step_ensemble)
    keys = jax.random.split(key, e)
    noise_last = task.noise_fn(keys[-1], x.shape)
    cond, _ = task.encode(variables, x, train=False)
    loss_last, _ = diffusion_call(
        task.sched, task.gd_cfg, task._model_fn(variables), x,
        key=key, t=task.cfg.step_ensemble[-1] - 1, cond=cond,
        noise=noise_last, reduce=False,
    )
    np.testing.assert_allclose(
        np.asarray(aux["loss_per_slice"]), np.asarray(loss_last), rtol=2e-5
    )


def test_reconstructor_aux_excludes_padding(ddpm):
    """VolumeReconstructor reduces aux over the TRUE depth: padded edge
    slices must not shift the volume scalars."""
    task, variables = ddpm
    vol = np.random.default_rng(0).random((32, 32, 5), np.float32)
    key = jax.random.PRNGKey(5)

    recon8 = VolumeReconstructor(task, depth_bucket=8)
    reco, aux = recon8(variables, vol, key, return_aux=True)
    assert reco.shape == vol.shape
    assert np.isfinite(float(aux["loss"]))
    assert np.asarray(aux["latent"]).shape == (16,)

    # manual reference: run the task on the unpadded-but-padded stack and
    # reduce over the first 5 rows only
    slices = np.moveaxis(vol, -1, 0)[..., None]
    padded = np.pad(slices, ((0, 3), (0, 0), (0, 0), (0, 0)), mode="edge")
    _, raw = jax.jit(task.reconstruct_with_aux)(variables, jnp.asarray(padded), key)
    np.testing.assert_allclose(
        float(aux["loss"]), float(raw["loss_per_slice"][:5].mean()), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(aux["latent"]),
        np.asarray(raw["latent_per_slice"][:5].mean(axis=0)),
        rtol=1e-6,
    )


def test_spark_aux_l1_ae_scoring():
    """loss_on_mask=False: per-slice loss = L1_AE('sum') recon_error +
    delta_mask * masked spatial loss (Spark_2D.py:26-33)."""
    cfg = SparkTaskConfig(
        image_hw=(32, 32), backbone="resnet18", dtype="float32",
        loss_on_mask=False, delta_mask=0.5, loss_strategy="sum",
    )
    task = SparkTask(cfg)
    variables = task.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 1))
    key = jax.random.PRNGKey(2)
    reco, aux = jax.jit(task.reconstruct_with_aux)(variables, x, key)
    assert aux["loss_per_slice"].shape == (4,)
    assert aux["latent_per_slice"].shape == (4, 0)  # Spark records no latent

    from conditioned_diffusion_models_uad_tpu.models.losses import l1_ae_loss
    from conditioned_diffusion_models_uad_tpu.models.spark import (
        random_mask,
        spark_spatial_loss,
    )

    scfg = cfg.spark_config
    active = random_mask(key, 4, scfg.fmap_size, scfg.len_keep)
    expected = (
        l1_ae_loss(reco, x, "sum", per_sample=True)["recon_error"]
        + 0.5 * spark_spatial_loss(scfg, x, reco, active, per_sample=True)
    )
    np.testing.assert_allclose(
        np.asarray(aux["loss_per_slice"]), np.asarray(expected), rtol=1e-4
    )

    scores = task.anomaly_scores(2.0)
    assert scores == {"reco": 2.0, "reg": 0.0, "comb": 0.0, "combi": 0.0,
                      "comb_prior": 0.0, "combi_prior": 0.0}


def test_eval_session_records_aux_scalars():
    """test_step(aux=...) populates latentSpace + AnomalyScoreRegPerVol, and
    the use_postprocessed_score=False branch scores volumes by the loss."""
    rng = np.random.default_rng(0)
    vol = rng.random((16, 16, 8), np.float32)
    reco = vol + 0.1 * rng.random((16, 16, 8), np.float32)
    seg = np.zeros_like(vol)
    seg[4:8, 4:8, 2:5] = 1
    mask = np.ones_like(vol)
    scores = DDPMTask(DDPMTaskConfig(**TINY)).anomaly_scores

    for upps in (True, False):
        cfg = EvalConfig(erode_brainmask=False, use_postprocessed_score=upps)
        sess = EvalSession(cfg, "Brats21", "val")
        aux = {"loss": jnp.float32(0.25), "latent": jnp.ones((16,)),
               "score_fn": scores}
        sess.test_step(reco, vol, seg, mask, batch_idx=0, ID="id0", label_vol=1, aux=aux)
        d = sess.eval_dict
        assert len(d["latentSpace"]) == 1
        assert d["latentSpace"][0].shape == (16,)
        assert d["AnomalyScoreRegPerVol"] == [0.25]
        if upps:
            # residual-based volume score (ref utils_eval.py:156,185-194)
            assert d["AnomalyScoreRecoPerVol"][0] != 0.25
        else:
            assert d["AnomalyScoreRecoPerVol"] == [0.25]
            assert d["AnomalyScoreCombiPerVol"] == [0.0625]
            assert d["AnomalyScoreCombiPriorPerVol"] == [0.0]
