"""Tests for the L4 task modules, the trainer loop, and checkpointing.

Mirrors the reference behaviors: cDDPM train/val objective (DDPM_2D.py:114-155),
noise-ensemble volume reconstruction (DDPM_2D.py:225-248), SparK masked loss
(Spark_2D.py:26-50), encoder checkpoint surgery (DDPM_2D.py:79-96), best/last
checkpoint semantics (configs/callbacks/checkpoint.yaml), and the multi-device
data-parallel step on the virtual 8-CPU mesh (SURVEY.md §4d)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conditioned_diffusion_models_uad_tpu.data.datamodules import DataConfig, TrainSliceSource
from conditioned_diffusion_models_uad_tpu.models import (
    DDPMTask,
    DDPMTaskConfig,
    SparkTask,
    SparkTaskConfig,
    import_spark_encoder,
)
from conditioned_diffusion_models_uad_tpu.parallel import local_mesh
from conditioned_diffusion_models_uad_tpu.train import (
    FoldCheckpointer,
    Trainer,
    TrainerConfig,
    init_state,
    make_optimizer,
    state_variables,
)

TINY = dict(
    image_hw=(32, 32),
    cond_dim=16,
    encoder_backbone="resnet18",
    timesteps=20,
    unet_dim=32,
    num_res_blocks=1,
    channel_mult=(1, 2),
    attention_resolutions=(),
    step_ensemble=(5, 10),
    test_timesteps=10,
    dtype="float32",
)


@pytest.fixture(scope="module")
def ddpm_task():
    return DDPMTask(DDPMTaskConfig(**TINY))


@pytest.fixture(scope="module")
def ddpm_vars(ddpm_task):
    return ddpm_task.init(jax.random.PRNGKey(0))


def _batch(b=2, hw=(32, 32)):
    k = jax.random.PRNGKey(1)
    vol = jax.random.uniform(k, (b, *hw, 1))
    return {"vol": vol, "mask": jnp.ones((b, *hw, 1))}


def test_ddpm_loss_finite_and_reco_range(ddpm_task, ddpm_vars):
    loss, (stats, aux) = ddpm_task.loss(
        ddpm_vars, _batch(), jax.random.PRNGKey(2), train=True
    )
    assert jnp.isfinite(loss)
    assert aux["reco"].shape == (2, 32, 32, 1)
    # mutated encoder batch stats returned
    assert "encoder" in stats


def test_ddpm_unconditional():
    cfg = DDPMTaskConfig(**{**TINY, "condition": False})
    task = DDPMTask(cfg)
    v = task.init(jax.random.PRNGKey(0))
    assert "encoder" not in v["params"]
    loss, _ = task.loss(v, _batch(), jax.random.PRNGKey(2), train=True)
    assert jnp.isfinite(loss)


def test_ddpm_dropout_unet():
    """dropout_unet (reference DDPM_2D.py:44): active + stochastic in training,
    inert at eval (deterministic reconstruction)."""
    cfg = DDPMTaskConfig(**{**TINY, "dropout_unet": 0.3})
    task = DDPMTask(cfg)
    v = task.init(jax.random.PRNGKey(0))
    l1, _ = task.loss(v, _batch(), jax.random.PRNGKey(2), train=True)
    l2, _ = task.loss(v, _batch(), jax.random.PRNGKey(3), train=True)
    assert jnp.isfinite(l1) and jnp.isfinite(l2)
    # different dropout keys -> different losses (dropout actually applied);
    # note the noise field also differs across keys, so the stronger check is
    # the eval side: reconstruction ignores dropout and is key-reproducible
    r1 = task.reconstruct(v, jnp.ones((2, 32, 32, 1)) * 0.5, jax.random.PRNGKey(4))
    r2 = task.reconstruct(v, jnp.ones((2, 32, 32, 1)) * 0.5, jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_ddpm_reconstruct_ensemble(ddpm_task, ddpm_vars):
    slices = jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 1))
    reco = ddpm_task.reconstruct(ddpm_vars, slices, jax.random.PRNGKey(4))
    assert reco.shape == slices.shape
    assert bool(jnp.isfinite(reco).all())


def test_ddpm_truncated_sampling(ddpm_task, ddpm_vars):
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 32, 32, 1))
    cond, _ = ddpm_task.encode(ddpm_vars, x)
    out = ddpm_task.sample(
        ddpm_vars, x.shape, jax.random.PRNGKey(6), cond=cond, x_start01=x, start_t=5
    )
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_patched_ddpm_train_and_eval():
    cfg = DDPMTaskConfig(
        **{**TINY, "condition": False, "patched": True, "patch_hw": (16, 16),
           "inpaint": True, "step_ensemble": ()},
    )
    task = DDPMTask(cfg)
    v = task.init(jax.random.PRNGKey(0))
    loss, _ = task.loss(v, _batch(), jax.random.PRNGKey(2), train=True)
    assert jnp.isfinite(loss)
    slices = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 1))
    reco = task.reconstruct_patched(v, slices, jax.random.PRNGKey(4))
    assert reco.shape == slices.shape
    assert bool(jnp.isfinite(reco).all())


# --------------------------------------------------------------------------- #
def _spark_cfg():
    return SparkTaskConfig(
        image_hw=(64, 64), backbone="resnet18", dec_dim=64, dtype="float32"
    )


def test_spark_loss_and_encoder_import():
    stask = SparkTask(_spark_cfg())
    sv = stask.init(jax.random.PRNGKey(0))
    batch = _batch(b=2, hw=(64, 64))
    loss_masked, (stats, aux) = stask.loss(sv, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(loss_masked)
    assert aux["reco"].shape == batch["vol"].shape

    # dense-loss variant (loss_on_mask=False): full L1 + delta*masked
    cfg2 = SparkTaskConfig(
        image_hw=(64, 64), backbone="resnet18", dec_dim=64, dtype="float32",
        loss_on_mask=False,
    )
    loss_full, _ = SparkTask(cfg2).loss(sv, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(loss_full)

    # encoder surgery into a DDPM with the same backbone
    dtask = DDPMTask(
        DDPMTaskConfig(**{**TINY, "image_hw": (64, 64), "encoder_backbone": "resnet18"})
    )
    dv = dtask.init(jax.random.PRNGKey(2))
    merged = import_spark_encoder(dv, sv)
    # backbone params replaced, fc head kept fresh
    got = jax.tree_util.tree_leaves(merged["params"]["encoder"]["backbone"])
    want = jax.tree_util.tree_leaves(sv["params"]["encoder"])
    assert all(np.allclose(a, b) for a, b in zip(got, want))
    assert "fc" in merged["params"]["encoder"]
    # merged variables still run
    loss, _ = dtask.loss(merged, _batch(b=2, hw=(64, 64)), jax.random.PRNGKey(3))
    assert jnp.isfinite(loss)


# --------------------------------------------------------------------------- #
def _source(n=8, hw=(32, 32), d=6, bs=4):
    rng = np.random.default_rng(0)
    vols = rng.random((n, *hw, d), dtype=np.float32)
    masks = (vols > 0.1).astype(np.float32)
    cfg = DataConfig(batch_size=bs)
    return TrainSliceSource(vols, masks, cfg)


def test_trainer_fit_loss_decreases(tmp_path, ddpm_task):
    tcfg = TrainerConfig(
        max_epochs=3, check_val_every_n_epoch=2, ckpt_dir=str(tmp_path),
        aug_intensity=False, epoch_scan=True, seed=0,
    )
    tr = Trainer(ddpm_task, tcfg)
    src = _source()
    state = tr.fit(src, val_source=src, fold=0)
    assert int(state["step"]) == 3 * 2  # 3 epochs x (8 subjects / bs 4)
    # best + last checkpoints written with meta
    ck = FoldCheckpointer(str(tmp_path), 0)
    restored, meta = ck.restore("best", target=jax.device_get(state))
    assert "val_loss" in meta and meta["val_loss"] is not None
    v = state_variables(restored)
    loss, _ = ddpm_task.loss(v, _batch(), jax.random.PRNGKey(9), train=False)
    assert jnp.isfinite(loss)


def test_trainer_resume(tmp_path, ddpm_task):
    tcfg = TrainerConfig(
        max_epochs=2, check_val_every_n_epoch=1, ckpt_dir=str(tmp_path),
        aug_intensity=False, seed=0,
    )
    src = _source()
    tr = Trainer(ddpm_task, tcfg)
    tr.fit(src, val_source=src, fold=0)
    # resume continues from epoch 2 -> no extra epochs to run
    tcfg2 = TrainerConfig(
        max_epochs=2, check_val_every_n_epoch=1, ckpt_dir=str(tmp_path),
        aug_intensity=False, seed=0, resume=True,
    )
    tr2 = Trainer(ddpm_task, tcfg2)
    state = tr2.fit(src, val_source=src, fold=0)
    assert int(state["step"]) == 2 * 2


def test_trainer_multidevice_mesh(ddpm_task, tmp_path):
    mesh = local_mesh()  # 8 virtual CPU devices (conftest)
    assert mesh.devices.size == 8
    tcfg = TrainerConfig(
        max_epochs=1, check_val_every_n_epoch=10, ckpt_dir=str(tmp_path),
        aug_intensity=False, epoch_scan=True, seed=0,
    )
    tr = Trainer(ddpm_task, tcfg, mesh=mesh)
    state = tr.fit(_source(n=16, bs=8), fold=0)
    assert int(state["step"]) == 2  # 16 subjects / bs 8
    assert all(
        jnp.isfinite(x).all() for x in jax.tree_util.tree_leaves(state["params"])
    )


def test_checkpoint_best_rejects_nonfinite(tmp_path):
    ck = FoldCheckpointer(str(tmp_path), 0)
    state = {"params": {"w": np.zeros(3, np.float32)}}
    # a NaN val loss must never become 'best' (it would win every later
    # x < nan comparison and pin the diverged state for the whole run)
    assert ck.maybe_save_best(state, 1, float("nan")) is False
    assert ck.maybe_save_best(state, 2, 0.5) is True
    assert ck.maybe_save_best(state, 3, float("inf")) is False
    assert ck.maybe_save_best(state, 4, 0.4) is True
    assert ck.meta["best"]["val_loss"] == 0.4


def test_epoch_shuffle_is_resume_invariant(ddpm_task, tmp_path):
    """The per-epoch shuffle stream is a function of (seed, fold, epoch):
    a run resumed at epoch k must draw the same orders epochs would have
    seen uninterrupted, not replay epoch 0's."""
    src = _source()
    tcfg = TrainerConfig(max_epochs=1, ckpt_dir=str(tmp_path),
                         aug_intensity=False, seed=0)
    tr = Trainer(ddpm_task, tcfg)
    a = tr._epoch_index_arrays(src, np.random.default_rng([0, 5]))
    b = tr._epoch_index_arrays(src, np.random.default_rng([0, 5]))
    c = tr._epoch_index_arrays(src, np.random.default_rng([0, 6]))
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.array_equal(a[0], c[0])


def test_log_every_n_steps_cadence(ddpm_task, tmp_path):
    """The non-scan path value-fetches/logs only at the configured step
    cadence (plus epoch end) — not every step."""
    class Counter:
        def __init__(self):
            self.train_logs = 0

        def log_metrics(self, metrics, step=0):
            if "train/loss" in metrics:
                self.train_logs += 1

    log = Counter()
    tcfg = TrainerConfig(max_epochs=2, ckpt_dir=str(tmp_path),
                         aug_intensity=False, epoch_scan=False,
                         log_every_n_steps=3, seed=0,
                         check_val_every_n_epoch=10)
    Trainer(ddpm_task, tcfg, logger=log).fit(_source(), fold=0)
    # 2 epochs x 2 steps: logs at step 3 (cadence) + steps 2, 4 (epoch ends)
    assert log.train_logs == 3


def test_epoch_scan_logs_per_step_losses(ddpm_task, tmp_path):
    """epoch_scan already returns every step's loss; the fast path must log
    the SAME step/cadence stream as the eager path (the reference Lightning
    loop logs train/loss every step, src/models/DDPM_2D.py:130-135) from one
    stacked fetch per epoch — not just the epoch's last loss."""
    class Rec:
        def __init__(self):
            self.rows = []

        def log_metrics(self, metrics, step=0):
            if "train/loss" in metrics:
                self.rows.append((step, metrics["train/loss"]))

    logs = {}
    for scan in (False, True):
        log = Rec()
        tcfg = TrainerConfig(max_epochs=2, ckpt_dir=str(tmp_path / str(scan)),
                             aug_intensity=False, epoch_scan=scan,
                             log_every_n_steps=3, seed=0,
                             check_val_every_n_epoch=10)
        Trainer(ddpm_task, tcfg, logger=log).fit(_source(), fold=0)
        logs[scan] = log.rows
    # 2 epochs x 2 steps, cadence 3: rows at step 3 (cadence) + 2, 4 (epoch
    # ends) — identical step stream in both modes
    assert [s for s, _ in logs[True]] == [s for s, _ in logs[False]] == [2, 3, 4]
    for (s_a, v_a), (s_b, v_b) in zip(logs[True], logs[False]):
        assert np.isfinite(v_a) and np.isfinite(v_b)


def test_fast_dev_run(ddpm_task, tmp_path):
    tcfg = TrainerConfig(
        fast_dev_run=True, ckpt_dir=str(tmp_path), aug_intensity=False, seed=0
    )
    state = Trainer(ddpm_task, tcfg).fit(_source(), fold=0)
    assert int(state["step"]) == 1


def test_optimizer_selection(ddpm_task):
    import optax

    assert isinstance(make_optimizer(ddpm_task), optax.GradientTransformation)
    stask = SparkTask(_spark_cfg())
    assert isinstance(make_optimizer(stask), optax.GradientTransformation)


def test_iterative_reco_modes(ddpm_vars):
    """Truncated iterative reverse sampling as the eval reconstruction
    (upstream capability, cond_DDPM.py:432-530; BASELINE config 1)."""
    import dataclasses as _dc

    for mode in ("ancestral", "ddim"):
        cfg = DDPMTaskConfig(**{**TINY, "reco_mode": mode, "sampling_steps": 4,
                                "test_timesteps": 8})
        task = DDPMTask(cfg)
        slices = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 1))
        reco = task.reconstruct(ddpm_vars, slices, jax.random.PRNGKey(4))
        assert reco.shape == slices.shape
        assert bool(jnp.isfinite(reco).all()), mode


def test_step_timer_and_flops():
    from conditioned_diffusion_models_uad_tpu.utils import StepTimer, flops_summary
    from conditioned_diffusion_models_uad_tpu.models.unet import UNetConfig

    t = StepTimer()
    t.lap()  # start mark
    for _ in range(3):
        t.lap(jnp.ones((4,)))
    s = t.summary()
    assert s["steps"] == 3 and s["steps_per_sec"] > 0
    f = flops_summary(UNetConfig(), (96, 96), batch=32, step_time_s=0.1)
    assert f["unet_gflops_per_forward"] > 1.0
    assert f["achieved_tflops"] > 0


def test_device_data_cached_across_validations(ddpm_task, tmp_path):
    """The replicated train/val buffers upload ONCE per source: `validate`
    runs every N epochs and must reuse the committed device arrays (an H2D
    re-upload per validation is a multi-MB tunnel transfer)."""
    tr = Trainer(ddpm_task, TrainerConfig(max_epochs=1, ckpt_dir=str(tmp_path)))
    src = _source()
    d1 = tr._device_data(src)
    d2 = tr._device_data(src)
    assert d1[0] is d2[0] and d1[1] is d2[1]
    # distinct sources get distinct buffers
    other = _source(n=4)
    d3 = tr._device_data(other)
    assert d3[0] is not d1[0]


def test_multi_epoch_dispatch_matches_per_epoch(tmp_path, ddpm_task):
    """TrainerConfig.epochs_per_dispatch: chunking epochs into one
    multi-epoch scan (the RTT-amortizing TPU path) follows the SAME data
    order and key stream as the per-epoch dispatch — final params close,
    step counts and checkpoint cadence identical."""
    src = _source()
    states = {}
    for epd, tag in ((1, "per_epoch"), (None, "chunked")):
        tcfg = TrainerConfig(
            max_epochs=4, check_val_every_n_epoch=2,
            ckpt_dir=str(tmp_path / tag), aug_intensity=False,
            epoch_scan=True, seed=0, epochs_per_dispatch=epd,
        )
        tr = Trainer(ddpm_task, tcfg)
        states[tag] = tr.fit(src, val_source=src, fold=0)

    a, b = states["per_epoch"], states["chunked"]
    assert int(a["step"]) == int(b["step"]) == 4 * 2
    for la, lb in zip(jax.tree_util.tree_leaves(a["params"]),
                      jax.tree_util.tree_leaves(b["params"])):
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            rtol=2e-4, atol=2e-5,
        )
    # both wrote best/last with the boundary-epoch step stamps
    for tag in ("per_epoch", "chunked"):
        ck = FoldCheckpointer(str(tmp_path / tag), 0)
        assert ck.meta["last"]["step"] == 4
        assert "best" in ck.meta


def test_multi_epoch_dispatch_no_val_single_chunk(tmp_path, ddpm_task):
    """Without a val source the whole run is ONE dispatch; step count and
    the final save_last checkpoint are unchanged."""
    tcfg = TrainerConfig(
        max_epochs=3, ckpt_dir=str(tmp_path), aug_intensity=False,
        epoch_scan=True, seed=0,
    )
    tr = Trainer(ddpm_task, tcfg)
    calls = []
    orig = tr._multi_epoch_scan

    def spy(*a, **k):
        calls.append(a[2].shape)
        return orig(*a, **k)

    tr._multi_epoch_scan = spy
    state = tr.fit(src := _source(), fold=0)
    assert int(state["step"]) == 3 * 2
    assert calls == [(3, 2, 4)]  # [E, S, B]: one 3-epoch dispatch
    ck = FoldCheckpointer(str(tmp_path), 0)
    assert ck.meta["last"]["step"] == 3
