"""Slice-parallel volume reconstruction tests (eval/reconstruct.py): depth
padding/bucketing, center-crop num_eval_slices, and mesh sharding on the
8-virtual-device CPU mesh (the v5e-8 slice-parallel eval of SURVEY.md §2.7)."""
import numpy as np
import jax
import pytest

from conditioned_diffusion_models_uad_tpu.eval.reconstruct import VolumeReconstructor
from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig
from conditioned_diffusion_models_uad_tpu.parallel import local_mesh

TINY = dict(
    image_hw=(32, 32), cond_dim=16, encoder_backbone="resnet18", timesteps=20,
    unet_dim=32, num_res_blocks=1, channel_mult=(1, 2), attention_resolutions=(),
    step_ensemble=(5, 10), test_timesteps=10, dtype="float32",
)


@pytest.fixture(scope="module")
def task_and_vars():
    task = DDPMTask(DDPMTaskConfig(**TINY))
    return task, task.init(jax.random.PRNGKey(0))


def test_reconstructor_single_device(task_and_vars):
    task, v = task_and_vars
    rng = np.random.default_rng(0)
    vol = rng.random((32, 32, 11), dtype=np.float32)  # odd depth -> padding
    recon = VolumeReconstructor(task, mesh=None, depth_bucket=4)
    out = recon(v, vol, jax.random.PRNGKey(1))
    assert out.shape == vol.shape
    assert np.isfinite(out).all()


def test_reconstructor_center_crop(task_and_vars):
    task, v = task_and_vars
    vol = np.random.default_rng(1).random((32, 32, 12), dtype=np.float32)
    recon = VolumeReconstructor(task, mesh=None, depth_bucket=4, num_eval_slices=4)
    out = recon(v, vol, jax.random.PRNGKey(1))
    assert out.shape == (32, 32, 4)  # the center-cropped depth (ref :193-203)


def test_flattened_ensemble_matches_per_member_average(task_and_vars):
    """`reconstruct` flattens the t-ensemble into the batch axis (one UNet
    call at batch E*D, reference DDPM_2D.py:225-239); its output must equal
    the explicit per-member average with the same key-split discipline."""
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.diffusion import diffusion_call

    task, v = task_and_vars
    slices = jax.random.uniform(jax.random.PRNGKey(7), (6, 32, 32, 1))
    key = jax.random.PRNGKey(8)

    out = jax.jit(task.reconstruct)(v, slices, key)

    cond, _ = task.encode(v, slices, train=False)
    model_fn = task._model_fn(v)
    members = []
    for t, k in zip(task.cfg.step_ensemble,
                    jax.random.split(key, len(task.cfg.step_ensemble))):
        noise = task.noise_fn(k, slices.shape)
        _, reco = diffusion_call(
            task.sched, task.gd_cfg, model_fn, slices,
            key=k, t=t - 1, cond=cond, noise=noise,
        )
        members.append(reco)
    expected = jnp.stack(members).mean(axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_flattened_ensemble_unconditional():
    """The flattened path must handle cond=None (unconditional DDPM with a
    noise ensemble, e.g. `model.condition=false` on an ensemble config)."""
    cfg = dict(TINY)
    cfg["condition"] = False
    task = DDPMTask(DDPMTaskConfig(**cfg))
    v = task.init(jax.random.PRNGKey(0))
    slices = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 1))
    out = jax.jit(task.reconstruct)(v, slices, jax.random.PRNGKey(2))
    assert out.shape == slices.shape
    assert np.isfinite(np.asarray(out)).all()


def test_reconstructor_mesh_sharded(task_and_vars):
    """Depth-as-batch sharded over the 8-device mesh; identical shape/finite
    output, depth padded to a multiple of the mesh size."""
    task, v = task_and_vars
    mesh = local_mesh()
    assert mesh.devices.size == 8
    vol = np.random.default_rng(2).random((32, 32, 13), dtype=np.float32)
    recon = VolumeReconstructor(task, mesh=mesh, depth_bucket=8)
    out = recon(v, vol, jax.random.PRNGKey(3))
    assert out.shape == vol.shape
    assert np.isfinite(out).all()
