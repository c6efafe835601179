"""Training LEARNS — the round-3 verdict's top gap: nothing asserted that the
loss *decreases* or that a trained model localizes lesions better than an
untrained one (every other e2e asserts protocol + finiteness only).

The reference's evidence of learning is its shipped training log
(reference results.txt:3-6, monitor `1/val/Loss_comb` = 0.03452 after the
cDDPM fold) and the trained behavior the whole pipeline exists for
(src/train.py:156). This is the hermetic, CPU-fast equivalent:

1. a tiny cDDPM fits the synthetic healthy fixtures for a few hundred real
   optimizer steps through the REAL Trainer (epoch_scan path) and the
   per-step loss stream must fall materially below its start;
2. the trained weights must beat the *untrained* init through the REAL eval
   protocol (`orchestrate.evaluate`) on lesioned fixtures — higher pixel
   AUROC and a much lower healthy-tissue reconstruction error. The untrained
   model is not a strawman: with the reference's zero-init output head it
   predicts x0=0, so its residual |x-0|=x already highlights hyper-intense
   lesions; beating it requires actually reconstructing healthy anatomy.
"""
import dataclasses as dc

import jax
import numpy as np

from conditioned_diffusion_models_uad_tpu.config import RunConfig
from conditioned_diffusion_models_uad_tpu.data.datamodules import DataConfig, IXI
from conditioned_diffusion_models_uad_tpu.data.synthetic import build_synthetic_root
from conditioned_diffusion_models_uad_tpu.eval.harness import EvalConfig
from conditioned_diffusion_models_uad_tpu.models.tasks import DDPMTask, DDPMTaskConfig
from conditioned_diffusion_models_uad_tpu.orchestrate import evaluate
from conditioned_diffusion_models_uad_tpu.train.loop import (
    Trainer,
    TrainerConfig,
    state_variables,
)

TINY = dict(
    image_hw=(32, 32), cond_dim=16, encoder_backbone="resnet18",
    timesteps=20, unet_dim=32, num_res_blocks=1, channel_mult=(1, 2),
    attention_resolutions=(), test_timesteps=10, step_ensemble=(5, 10),
    dtype="float32", lr=1e-3,
)


class _CaptureLogger:
    def __init__(self):
        self.losses = []

    def log_metrics(self, metrics, step=0):
        if "train/loss" in metrics:
            self.losses.append((step, float(metrics["train/loss"])))


class _NullLogger:
    def log_metrics(self, metrics, step=0):
        pass


def test_training_learns_and_beats_untrained(tmp_path):
    root = build_synthetic_root(
        str(tmp_path / "data"), shape=(64, 64, 40), n_train=8, n_val=2,
        n_test=1, n_eval=2, eval_sets=("Brats21",),
    )
    cfg = RunConfig(
        name="learning", seed=0, log_dir=str(tmp_path / "logs"),
        model=DDPMTaskConfig(**TINY),
        data=DataConfig(data_dir=root, image_dim=(64, 64, 40),
                        rescale_factor=2.0, testsets=("Brats21",),
                        batch_size=4),
        eval=EvalConfig(save_output_images=False, save_to_disc=False),
    )
    cfg.eval.out_dir = cfg.run_dir

    task = DDPMTask(cfg.model)
    untrained = task.init(jax.random.PRNGKey(0))

    capture = _CaptureLogger()
    trainer = Trainer(
        task,
        TrainerConfig(
            max_epochs=150, check_val_every_n_epoch=10**6, seed=0,
            ckpt_dir=str(tmp_path / "ckpt"), log_every_n_steps=1,
            epoch_scan=True, save_last=False,
        ),
        logger=capture,
    )
    dm = IXI(cfg.data, fold=0)
    state = trainer.fit(dm.train_slices(), val_source=None, fold=0,
                        init_variables=untrained)

    losses = np.asarray([l for _, l in sorted(capture.losses)], np.float64)
    assert losses.size >= 300  # 8 subjects / batch 4 = 2 steps x 150 epochs
    start, end = losses[:5].mean(), losses[-20:].mean()
    # the l1 pred_x0 loss starts at ~E|x0| (zero-init head) and must fall
    # MATERIALLY, not by noise: >=60% below its start
    assert np.isfinite(losses).all()
    assert end < 0.4 * start, (start, end)

    # the real eval protocol, trained vs untrained weights
    evs = {}
    for tag, variables in (("trained", state_variables(jax.device_get(state))),
                           ("untrained", untrained)):
        ecfg = dc.replace(cfg, name=f"learning_{tag}")
        ecfg.eval.out_dir = ecfg.run_dir
        evs[tag] = evaluate(ecfg, task, variables, fold=0,
                            logger=_NullLogger())["test"]["Brats21"]

    tr, un = evs["trained"], evs["untrained"]
    print("\nlearning-proof metrics (trained vs untrained):")
    for k in ("AUCPerVolMean", "AUPRCPerVolMean", "BestDicePerVolMean",
              "l1recoErrorHealthyMean", "l1recoErrorUnhealthyMean"):
        print(f"  {k}: {tr[k]:.4f} vs {un[k]:.4f}")
    print(f"  loss start {start:.4f} -> end {end:.4f}")

    # healthy anatomy is actually reconstructed: >=2x lower healthy-tissue
    # reconstruction error than predicting zeros
    assert tr["l1recoErrorHealthyMean"] < 0.5 * un["l1recoErrorHealthyMean"]
    # and lesions are localized BETTER than the untrained residual
    assert tr["AUCPerVolMean"] > un["AUCPerVolMean"] + 0.02
    assert tr["BestDicePerVolMean"] >= un["BestDicePerVolMean"]
