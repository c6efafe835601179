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
