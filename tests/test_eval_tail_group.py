"""Grouped eval dispatch with a short TAIL group (dataset size not a multiple
of eval.volumes_per_call): the tail must be padded to the full group size so
it reuses the full-group compiled reconstruction program (a second
single-volume executable would cost an extra XLA compile), while the padded
duplicate's results are discarded — per-volume counts, order, and IDs intact.
Reference counterpart: the torch loop evaluates volumes one at a time
(src/models/DDPM_2D.py:193-257); grouping is a TPU-side dispatch optimization
and must be invisible in the eval_dict.
"""
import jax
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.config import RunConfig
from conditioned_diffusion_models_uad_tpu.data.datamodules import DataConfig
from conditioned_diffusion_models_uad_tpu.data.synthetic import build_synthetic_root
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


def test_tail_group_pads_to_full_group(tmp_path, monkeypatch):
    root = build_synthetic_root(
        str(tmp_path / "data"), shape=(64, 64, 40), n_train=1, n_val=1,
        n_test=1, n_eval=3, eval_sets=("Brats21",),
    )
    cfg = RunConfig(
        name="tail_group", seed=0, log_dir=str(tmp_path / "logs"),
        model=DDPMTaskConfig(**TINY),
        data=DataConfig(data_dir=root, image_dim=(64, 64, 40),
                        rescale_factor=2.0, testsets=("Brats21",)),
        eval=EvalConfig(save_output_images=False),
    )
    cfg.eval.volumes_per_call = 2
    cfg.eval.fused_dispatch = False  # this test pins the separate-dispatch path
    cfg.eval.out_dir = cfg.run_dir

    task = DDPMTask(cfg.model)
    variables = task.init(jax.random.PRNGKey(0))

    group_sizes = []
    orig_bc = VolumeReconstructor.batch_call

    def spy(self, variables, vols, key):
        group_sizes.append(len(vols))
        return orig_bc(self, variables, vols, key)

    monkeypatch.setattr(VolumeReconstructor, "batch_call", spy)
    preds = evaluate(cfg, task, variables, fold=0, logger=_NullLogger())

    # 3 volumes x (val, test): each stage dispatches one pair + one padded
    # tail — every device call sees the FULL group size (one compiled shape)
    assert group_sizes == [2, 2, 2, 2]
    for stage in ("val", "test"):
        ev = preds[stage]["Brats21"]
        assert len(ev["IDs"]) == 3
        assert len(set(ev["IDs"])) == 3
        assert len(ev["AnomalyScoreRegPerVol"]) == 3
        assert np.isfinite(ev["DicePerVolMean"])


def test_fused_dispatch_matches_separate(tmp_path, monkeypatch):
    """EvalConfig.fused_dispatch chains the scoring program onto the grouped
    reconstruction dispatch (one program + one packed fetch per group,
    eval/reconstruct.py::batch_call_scored). It is a pure dispatch
    optimization: every eval_dict row — including the padded tail group's —
    must match the separate-dispatch path exactly."""
    import dataclasses as dc

    from conditioned_diffusion_models_uad_tpu.eval import harness as H

    # the tiny fixture volumes are below the real fused-path size gate;
    # lower it so both the separate fused scoring and the fused dispatch run
    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 1000)

    root = build_synthetic_root(
        str(tmp_path / "data"), shape=(64, 64, 40), n_train=1, n_val=1,
        n_test=1, n_eval=3, eval_sets=("Brats21",),
    )
    base = RunConfig(
        name="fused_dispatch", seed=0, log_dir=str(tmp_path / "logs"),
        model=DDPMTaskConfig(**TINY),
        data=DataConfig(data_dir=root, image_dim=(64, 64, 40),
                        rescale_factor=2.0, testsets=("Brats21",)),
        eval=EvalConfig(save_output_images=False),
    )
    base.eval.volumes_per_call = 2
    base.eval.out_dir = base.run_dir
    task = DDPMTask(base.model)
    variables = task.init(jax.random.PRNGKey(0))

    results = {}
    for fused in (True, False):
        cfg = dc.replace(base, eval=dc.replace(base.eval, fused_dispatch=fused))
        scored_calls = []
        orig_scored = VolumeReconstructor.batch_call_scored

        def spy(self, variables, subs, key, flags):
            scored_calls.append(len(subs))
            return orig_scored(self, variables, subs, key, flags)

        VolumeReconstructor.batch_call_scored = spy
        try:
            results[fused] = evaluate(
                cfg, task, variables, fold=0, logger=_NullLogger()
            )
        finally:
            VolumeReconstructor.batch_call_scored = orig_scored
        # the fused path must actually engage (incl. the padded tail), and
        # must not when disabled
        assert (len(scored_calls) > 0) == fused
        if fused:
            assert all(n == 2 for n in scored_calls)

    for stage in ("val", "test"):
        ev_f = results[True][stage]["Brats21"]
        ev_s = results[False][stage]["Brats21"]
        assert ev_f["IDs"] == ev_s["IDs"]
        for k in ("DiceScorePerVol", "BestDicePerVol", "BestThresholdPerVol",
                  "AUCPerVol", "AUPRCPerVol", "TPPerVol", "FPPerVol",
                  "HausPerVol", "AnomalyScoreRegPerVol",
                  "AnomalyScoreRecoPerVol", "l1recoErrorAll",
                  "AnomalyScoreRecoPerSlice", "labelPerSlice",
                  "lesionSizePerVol", "labelPerVol"):
            np.testing.assert_allclose(
                np.asarray(ev_f[k], dtype=np.float64),
                np.asarray(ev_s[k], dtype=np.float64),
                rtol=1e-5, atol=1e-6, err_msg=f"{stage}/{k}",
            )
        for a, b in zip(ev_f["latentSpace"], ev_s["latentSpace"]):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fused_dispatch_matches_separate_missing_seg(tmp_path, monkeypatch):
    """A lesion-set subject WITHOUT a seg file (empty seg_path cell) must be
    recorded identically by the fused one-dispatch path and the host path:
    seg_available=False is threaded per volume through the grouped dispatch
    (orchestrate._score_group), not hard-coded True — the reference treats
    such a volume as seg-less (utils_eval.py:58-59 consumes the caller's
    zeros), so both paths score it against zeros and must agree row for row."""
    import dataclasses as dc

    import pandas as pd

    from conditioned_diffusion_models_uad_tpu.eval import harness as H

    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 1000)

    root = build_synthetic_root(
        str(tmp_path / "data"), shape=(64, 64, 40), n_train=1, n_val=1,
        n_test=1, n_eval=2, eval_sets=("Brats21",),
    )
    # blank the FIRST subject's seg in both eval splits: the group then mixes
    # a seg-less volume with a normal one inside one fused dispatch
    for split in ("Brats21_val.csv", "Brats21_test.csv"):
        p = f"{root}/Data/splits/{split}"
        df = pd.read_csv(p)
        df.loc[0, "seg_path"] = ""
        df.to_csv(p, index=False)

    base = RunConfig(
        name="fused_noseg", seed=0, log_dir=str(tmp_path / "logs"),
        model=DDPMTaskConfig(**TINY),
        data=DataConfig(data_dir=root, image_dim=(64, 64, 40),
                        rescale_factor=2.0, testsets=("Brats21",)),
        eval=EvalConfig(save_output_images=False),
    )
    base.eval.volumes_per_call = 2
    base.eval.out_dir = base.run_dir
    task = DDPMTask(base.model)
    variables = task.init(jax.random.PRNGKey(0))

    results = {}
    for fused in (True, False):
        cfg = dc.replace(base, eval=dc.replace(base.eval, fused_dispatch=fused))
        results[fused] = evaluate(
            cfg, task, variables, fold=0, logger=_NullLogger()
        )

    for stage in ("val", "test"):
        ev_f = results[True][stage]["Brats21"]
        ev_s = results[False][stage]["Brats21"]
        assert ev_f["IDs"] == ev_s["IDs"]
        assert len(ev_f["IDs"]) == 2
        for k in ("DiceScorePerVol", "BestDicePerVol", "AUCPerVol",
                  "AUPRCPerVol", "TPPerVol", "FPPerVol", "FNPerVol",
                  "HausPerVol", "AnomalyScoreRegPerVol", "lesionSizePerVol",
                  "l1recoErrorAll", "labelPerVol", "labelPerSlice"):
            np.testing.assert_allclose(
                np.asarray(ev_f[k], dtype=np.float64),
                np.asarray(ev_s[k], dtype=np.float64),
                rtol=1e-5, atol=1e-6, err_msg=f"{stage}/{k}",
            )
        # the seg-less volume really is degenerate in both paths: no true
        # positives, empty lesion
        assert ev_f["lesionSizePerVol"][0] == 0
        assert ev_f["TPPerVol"][0] == 0


def test_fused_fallback_warnings_fire_once(tmp_path, monkeypatch, caplog):
    """Every condition that silently disables the one-dispatch fused path must
    say why, ONCE per run (VERDICT r3 weak #5): here the sub-FUSED_MIN_VOXELS
    gate (fires in val AND test stages but logs once) and the
    save_output_images gate."""
    import dataclasses as dc
    import logging

    from conditioned_diffusion_models_uad_tpu.eval import harness as H

    root = build_synthetic_root(
        str(tmp_path / "data"), shape=(64, 64, 40), n_train=1, n_val=1,
        n_test=1, n_eval=2, eval_sets=("Brats21",),
    )
    base = RunConfig(
        name="fused_fallback_warn", seed=0, log_dir=str(tmp_path / "logs"),
        model=DDPMTaskConfig(**TINY),
        data=DataConfig(data_dir=root, image_dim=(64, 64, 40),
                        rescale_factor=2.0, testsets=("Brats21",)),
        eval=EvalConfig(save_output_images=False, save_to_disc=False),
    )
    base.eval.volumes_per_call = 2
    base.eval.fused_dispatch = True
    base.eval.out_dir = base.run_dir
    task = DDPMTask(base.model)
    variables = task.init(jax.random.PRNGKey(0))
    logger_name = "conditioned_diffusion_models_uad_tpu.orchestrate"

    # volumes below the fused-path size gate -> one warning across 2 stages
    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 10**12)
    with caplog.at_level(logging.WARNING, logger=logger_name):
        evaluate(base, task, variables, fold=0, logger=_NullLogger())
    gate_msgs = [r.getMessage() for r in caplog.records
                 if "size gate" in r.getMessage()]
    assert len(gate_msgs) == 1
    assert "separate-dispatch" in gate_msgs[0]

    # save_output_images forces the separate path -> its own one-time warning
    caplog.clear()
    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 1000)
    cfg = dc.replace(base, eval=dc.replace(
        base.eval, save_output_images=True, save_to_disc=False))
    with caplog.at_level(logging.WARNING, logger=logger_name):
        evaluate(cfg, task, variables, fold=0, logger=_NullLogger())
    img_msgs = [r.getMessage() for r in caplog.records
                if "save_output_images" in r.getMessage()]
    assert len(img_msgs) == 1
