"""Shape-bucketed fused-dispatch grouping (VERDICT r4 #5).

Eval volumes group by identical (orig, model) shapes instead of raw dataset
order, so a heterogeneous-resolution dataset keeps the ONE-dispatch fused
path for every full bucket; only true leftovers dispatch as padded partial
groups. Out-of-order dispatch is reconciled by the commit reorder buffer
(eval/harness.py::_commit_in_order) — eval_dict rows still land in dataset
order. Reference counterpart: full-res evaluation is the capability that
produces heterogeneous shapes (utils_eval.py:24-27); the reference loops
volumes one at a time so ordering is trivial there.
"""
import numpy as np
import jax
import pytest

from conditioned_diffusion_models_uad_tpu.config import RunConfig
from conditioned_diffusion_models_uad_tpu.data.datamodules import DataConfig
from conditioned_diffusion_models_uad_tpu.eval.harness import EvalConfig
from conditioned_diffusion_models_uad_tpu.eval.reconstruct import VolumeReconstructor
from conditioned_diffusion_models_uad_tpu.models.tasks import DDPMTask, DDPMTaskConfig
from conditioned_diffusion_models_uad_tpu.orchestrate import evaluate

TINY = dict(
    image_hw=(32, 32), cond_dim=16, encoder_backbone="resnet18",
    timesteps=20, unet_dim=32, num_res_blocks=1, channel_mult=(1, 2),
    attention_resolutions=(), test_timesteps=10, step_ensemble=(5, 10),
    dtype="float32",
)


class _NullLogger:
    def log_metrics(self, metrics, step=0):
        pass


def _subject(rng, i, orig_shape, model_depth):
    vol_orig = rng.random(orig_shape, dtype=np.float32)
    mask = np.ones(orig_shape, np.float32)
    seg = (rng.random(orig_shape) > 0.98).astype(np.float32)
    vol = rng.random((32, 32, model_depth), dtype=np.float32)
    return {
        "vol": vol, "vol_orig": vol_orig, "mask_orig": mask, "seg_orig": seg,
        "seg_available": True, "ID": f"S{i:02d}", "label": 1,
    }


class _MixedShapeDataset:
    """Interleaved A/B shapes: A B A B A B A — 4 of shape A, 3 of shape B."""

    def __init__(self, seed=0):
        rng = np.random.default_rng(seed)
        self.subs = []
        for i in range(7):
            if i % 2 == 0:
                self.subs.append(_subject(rng, i, (64, 64, 40), 12))
            else:
                self.subs.append(_subject(rng, i, (64, 64, 48), 16))

    def __len__(self):
        return len(self.subs)

    def __getitem__(self, i):
        return self.subs[i]


class _MixedModule:
    def __init__(self, cfg, fold):
        pass

    def val_eval(self):
        return _MixedShapeDataset(seed=1)

    def test_eval(self):
        return _MixedShapeDataset(seed=2)


@pytest.fixture
def mixed_cfg(tmp_path):
    cfg = RunConfig(
        name="bucketed", seed=0, log_dir=str(tmp_path / "logs"),
        model=DDPMTaskConfig(**TINY),
        data=DataConfig(data_dir=str(tmp_path), image_dim=(64, 64, 40),
                        rescale_factor=2.0, testsets=("Brats21",)),
        eval=EvalConfig(save_output_images=False, volumes_per_call=2,
                        fused_dispatch=True),
    )
    cfg.eval.out_dir = cfg.run_dir
    return cfg


def test_mixed_shapes_keep_fused_dispatch(mixed_cfg, monkeypatch, caplog):
    import logging

    from conditioned_diffusion_models_uad_tpu import orchestrate as O
    from conditioned_diffusion_models_uad_tpu.eval import harness as H

    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 1000)
    monkeypatch.setitem(O.EVAL_MODULES, "Brats21", _MixedModule)

    task = DDPMTask(mixed_cfg.model)
    variables = task.init(jax.random.PRNGKey(0))

    fused_groups = []
    separate_groups = []
    orig_scored = VolumeReconstructor.batch_call_scored
    orig_batch = VolumeReconstructor.batch_call

    def spy_scored(self, variables, subs, key, flags):
        fused_groups.append(tuple(tuple(s["vol_orig"].shape) for s in subs))
        return orig_scored(self, variables, subs, key, flags)

    def spy_batch(self, variables, vols, key):
        separate_groups.append(len(vols))
        return orig_batch(self, variables, vols, key)

    monkeypatch.setattr(VolumeReconstructor, "batch_call_scored", spy_scored)
    monkeypatch.setattr(VolumeReconstructor, "batch_call", spy_batch)

    logger_name = "conditioned_diffusion_models_uad_tpu.orchestrate"
    with caplog.at_level(logging.WARNING, logger=logger_name):
        preds = evaluate(
            mixed_cfg, task, variables, fold=0, logger=_NullLogger()
        )

    # every dispatch group is shape-homogeneous and fused — 4xA + 3xB per
    # stage buckets into (A,A) (B,B) (A,A) + padded (B,B) per stage
    assert separate_groups == []
    assert len(fused_groups) == 8  # 4 groups x 2 stages
    for g in fused_groups:
        assert len(set(g)) == 1, f"mixed-shape group dispatched: {g}"
    # the mixed-shape fallback warning never fires under bucketing
    assert not any("mixes volume shapes" in r.getMessage()
                   for r in caplog.records)

    # rows land in dataset order despite out-of-order bucket dispatch
    for stage in ("val", "test"):
        ev = preds[stage]["Brats21"]
        assert ev["IDs"] == [f"S{i:02d}" for i in range(7)]
        assert len(ev["DiceScorePerVol"]) == 7
        assert np.isfinite(ev["DicePerVolMean"])


def test_mixed_shapes_match_per_volume_layout(mixed_cfg, monkeypatch):
    """Layout invariance holds across shapes too: the bucketed vpc=2 fused
    run reproduces the vpc=1 run's science rows."""
    import dataclasses as dc

    from conditioned_diffusion_models_uad_tpu import orchestrate as O
    from conditioned_diffusion_models_uad_tpu.eval import harness as H

    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 1000)
    monkeypatch.setitem(O.EVAL_MODULES, "Brats21", _MixedModule)

    task = DDPMTask(mixed_cfg.model)
    variables = task.init(jax.random.PRNGKey(0))

    res = {}
    for vpc in (1, 2):
        cfg = dc.replace(mixed_cfg, eval=dc.replace(
            mixed_cfg.eval, volumes_per_call=vpc))
        res[vpc] = evaluate(cfg, task, variables, fold=0, logger=_NullLogger())

    for stage in ("val", "test"):
        a, b = res[1][stage]["Brats21"], res[2][stage]["Brats21"]
        assert a["IDs"] == b["IDs"]
        for k in ("DiceScorePerVol", "AUCPerVol", "TPPerVol", "FPPerVol",
                  "lesionSizePerVol", "labelPerVol"):
            np.testing.assert_allclose(
                np.asarray(a[k], np.float64), np.asarray(b[k], np.float64),
                rtol=1e-5, atol=1e-7, err_msg=f"{stage}/{k}",
            )
