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


class _DetTask:
    """Deterministic stand-in: reco = 1 - x, per-slice loss/latent reductions.

    Lets the batch_call group pad/split/true-depth logic be checked EXACTLY
    against per-volume __call__ (the real task draws noise per batch element,
    so grouped and ungrouped runs legitimately differ there)."""

    def reconstruct_with_aux(self, variables, slices, key):
        import jax.numpy as jnp

        reco = 1.0 - slices
        return reco, {
            "loss_per_slice": jnp.mean(slices, axis=(1, 2, 3)),
            "latent_per_slice": jnp.stack(
                [slices.max(axis=(1, 2, 3)), slices.min(axis=(1, 2, 3))], -1
            ),
        }


def test_batch_call_matches_per_volume_calls():
    """Grouped reconstruction (eval.volumes_per_call>1) must reproduce the
    per-volume contract bit-for-bit on a deterministic task: group padding to
    the common bucketed depth, split, and true-depth aux reductions."""
    rng = np.random.default_rng(5)
    vols = [rng.random((16, 16, d), dtype=np.float32) for d in (11, 7)]
    recon = VolumeReconstructor(_DetTask(), mesh=None, depth_bucket=4)
    key = jax.random.PRNGKey(9)
    grouped = recon.batch_call({}, vols, key)
    for vol, (reco_g, aux_g) in zip(vols, grouped):
        reco_s, aux_s = recon({}, vol, key, return_aux=True)
        assert reco_g.shape == vol.shape
        np.testing.assert_array_equal(np.asarray(reco_g), np.asarray(reco_s))
        np.testing.assert_allclose(
            np.asarray(aux_g["loss"]), np.asarray(aux_s["loss"]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(aux_g["latent"]), np.asarray(aux_s["latent"]), rtol=1e-6
        )


def test_batch_call_real_task_shapes_and_determinism(task_and_vars):
    task, v = task_and_vars
    rng = np.random.default_rng(6)
    vols = [rng.random((32, 32, 6), dtype=np.float32) for _ in range(2)]
    recon = VolumeReconstructor(task, mesh=None, depth_bucket=4)
    key = jax.random.PRNGKey(11)
    a = recon.batch_call(v, vols, key)
    b = recon.batch_call(v, vols, key)
    assert len(a) == 2
    for (ra, xa), (rb, _) in zip(a, b):
        assert ra.shape == (32, 32, 6)
        assert np.isfinite(np.asarray(ra)).all()
        assert np.isfinite(float(xa["loss"]))
        np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))


def test_batch_call_mesh_sharded(task_and_vars):
    task, v = task_and_vars
    mesh = local_mesh()
    recon = VolumeReconstructor(task, mesh=mesh, depth_bucket=8)
    vols = [np.random.default_rng(i).random((32, 32, 9), dtype=np.float32)
            for i in range(2)]
    out = recon.batch_call(v, vols, jax.random.PRNGKey(12))
    for vol, (reco, _) in zip(vols, out):
        assert reco.shape == vol.shape
        assert np.isfinite(np.asarray(reco)).all()


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


def test_batch_call_scored_mesh_matches_single(task_and_vars):
    """ONE-dispatch reconstruct+score on the 8-device mesh: the group axis is
    VOLUME-parallel (each device scores whole volumes locally; the UNet stays
    batch-sharded) — packed metrics and residuals must match the
    single-device fused path bit-for-bit up to float tolerance."""
    from conditioned_diffusion_models_uad_tpu.eval.fused import parse_packed
    from conditioned_diffusion_models_uad_tpu.eval.harness import (
        EvalConfig,
        EvalSession,
    )

    task, v = task_and_vars
    rng = np.random.default_rng(5)
    shape = (32, 32, 6)
    subs = []
    for i in range(8):
        vol = rng.random(shape, dtype=np.float32)
        seg = np.zeros(shape, np.float32)
        seg[10:20, 8:18, 2:5] = 1.0
        mask = (vol > 0.05).astype(np.float32)
        subs.append(
            {"vol": vol, "vol_orig": vol, "mask_orig": mask, "seg_orig": seg}
        )

    sess = EvalSession(
        EvalConfig(cc_backend="device", hausdorff_backend="device"),
        "Brats21",
        "val",
    )
    flags = sess._fused_flags(shape, seg_is_host=True)
    key = jax.random.PRNGKey(3)

    mesh = local_mesh()
    recon_m = VolumeReconstructor(task, mesh=mesh, depth_bucket=8)
    recon_s = VolumeReconstructor(task, mesh=None, depth_bucket=8)
    diff_m, packed_m = recon_m.batch_call_scored(v, subs, key, flags)
    diff_s, packed_s = recon_s.batch_call_scored(v, subs, key, flags)

    # outputs stay sharded over the mesh (group axis = volume-parallel)
    assert len(diff_m.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(diff_m), np.asarray(diff_s), rtol=1e-5, atol=1e-6
    )

    llen = recon_s.latent_len(v, subs[0]["vol"], key)
    pm, ps = np.asarray(packed_m), np.asarray(packed_s)
    st = flags["statics"]
    for j in range(8):
        a = parse_packed(pm[j], shape, llen, st["pack_seg"], st["pack_maps"])
        b = parse_packed(ps[j], shape, llen, st["pack_seg"], st["pack_maps"])
        for k in a["scalars"]:
            np.testing.assert_allclose(
                a["scalars"][k], b["scalars"][k],
                rtol=1e-5, atol=1e-6, err_msg=k,
            )
        np.testing.assert_allclose(
            a["per_slice"], b["per_slice"], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            a["latent"], b["latent"], rtol=1e-5, atol=1e-6
        )
