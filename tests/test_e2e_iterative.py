"""End-to-end iterative reconstruction (`model.reco_mode=ancestral|ddim`).

The reference capability is the truncated reverse-sampling path (BASELINE
config 1; reference src/models/modules/cond_DDPM.py:432-530 — broken in the
fork, rebuilt here from the math as lax.scans). Previously unit-tested at the
task level only; this drives the PRODUCT surface — full config composition
with the `model.reco_mode=…` CLI override — through `orchestrate.evaluate()`,
where the NaN `loss_per_slice` sentinel (no single diffusion loss exists on a
sampling chain) meets `_record_volume_scores`, aggregation, and BOTH dispatch
modes (fused one-dispatch and separate)."""
import dataclasses as dc
import os

import jax
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.config import compose, materialize
from conditioned_diffusion_models_uad_tpu.data.synthetic import build_synthetic_root
from conditioned_diffusion_models_uad_tpu.models.tasks import DDPMTask
from conditioned_diffusion_models_uad_tpu.orchestrate import evaluate

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

TINY_OVERRIDES = [
    "model.unet_dim=32",
    "model.num_res_blocks=1",
    "model.channel_mult=[1,2]",
    "model.attention_resolutions=[]",
    "model.cond_dim=16",
    "model.encoder_backbone=resnet18",
    "model.timesteps=20",
    "model.step_ensemble=[5,10]",  # unused by iterative modes; must be in range
    "model.test_timesteps=8",
    "model.sampling_steps=4",
    "model.dtype=float32",
    "datamodule.image_dim=[64,64,40]",
    "datamodule.rescale_factor=2.0",
    "datamodule.testsets=[Brats21]",
    "eval.save_output_images=false",
    "eval.volumes_per_call=2",
]


class _NullLogger:
    def log_metrics(self, metrics, step=0):
        pass


@pytest.mark.parametrize("mode", ["ddim", "ancestral"])
def test_e2e_iterative_reco_both_dispatch_modes(tmp_path, monkeypatch, mode):
    monkeypatch.setenv("LOG_DIR", str(tmp_path / "logs"))
    root = build_synthetic_root(
        str(tmp_path / "data"), shape=(64, 64, 40), n_train=1, n_val=1,
        n_test=1, n_eval=2, eval_sets=("Brats21",),
    )
    monkeypatch.setenv("DATA_DIR", root)
    tree = compose(
        CONFIG_DIR,
        "cDDPM/DDPM_cond_spark_2D",
        TINY_OVERRIDES + [f"model.reco_mode={mode}", f"name=iter_{mode}"],
    )
    base = materialize(tree)
    assert base.model.reco_mode == mode  # the CLI override reached the task
    task = DDPMTask(base.model)
    variables = task.init(jax.random.PRNGKey(0))

    results = {}
    for fused in (True, False):
        cfg = dc.replace(base, eval=dc.replace(base.eval, fused_dispatch=fused))
        cfg.eval.out_dir = cfg.run_dir
        results[fused] = evaluate(
            cfg, task, variables, fold=0, logger=_NullLogger()
        )

    for stage in ("val", "test"):
        ev_f = results[True][stage]["Brats21"]
        ev_s = results[False][stage]["Brats21"]
        assert ev_f["IDs"] == ev_s["IDs"] and len(ev_f["IDs"]) == 2
        # the NaN loss sentinel flows into the loss-derived score family and
        # is EXCLUDED by nanmean aggregation — never crashes, never fakes 0.0
        for ev in (ev_f, ev_s):
            assert np.isnan(ev["AnomalyScoreRegPerVol"]).all()
            # residual-based scores stay real (use_postprocessed_score=True)
            assert np.isfinite(ev["AnomalyScoreRecoPerVol"]).all()
            assert np.isfinite(ev["DicePerVolMean"])
            assert np.isfinite(ev["AUCPerVolMean"])
            assert len(ev["latentSpace"]) == 2
        # fused one-dispatch and separate dispatch agree row for row
        for k in ("DiceScorePerVol", "BestDicePerVol", "AUCPerVol",
                  "AUPRCPerVol", "TPPerVol", "FPPerVol", "HausPerVol",
                  "AnomalyScoreRecoPerVol", "l1recoErrorAll",
                  "lesionSizePerVol"):
            np.testing.assert_allclose(
                np.asarray(ev_f[k], np.float64),
                np.asarray(ev_s[k], np.float64),
                rtol=1e-4, atol=1e-6, err_msg=f"{stage}/{k}",
            )
    # the val-fit threshold crossed into the test stage on both paths
    np.testing.assert_allclose(
        results[True]["test"]["Brats21"]["BestThresholdPerVol"],
        results[False]["test"]["Brats21"]["BestThresholdPerVol"], rtol=1e-4,
    )
