"""End-to-end smoke: synthetic data -> compose -> train -> eval -> artifacts.

The TPU-world equivalent of the reference's `debug` fast-dev mode
(reference src/utils/utils.py:47-61) plus the full test-after-training protocol
(src/train.py:182-237): fits a tiny cDDPM on synthetic NIfTI volumes, runs the
val-threshold-fit -> test eval over Brats21/MSLUB fixtures, and checks every
run artifact (checkpoints, metrics CSV, preds pickle, final_config.yaml)."""
import os
import pickle

import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.config import compose, materialize
from conditioned_diffusion_models_uad_tpu.data.synthetic import build_synthetic_root
from conditioned_diffusion_models_uad_tpu.orchestrate import train

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

TINY_OVERRIDES = [
    "model.unet_dim=32",
    "model.num_res_blocks=1",
    "model.channel_mult=[1,2]",
    "model.attention_resolutions=[]",
    "model.cond_dim=16",
    "model.encoder_backbone=resnet18",
    "model.timesteps=20",
    "model.step_ensemble=[5,10]",
    "model.test_timesteps=10",
    "model.dtype=float32",
    "datamodule.image_dim=[64,64,40]",
    "datamodule.rescale_factor=2.0",
    "datamodule.batch_size=2",
    "datamodule.aug_intensity=false",
    "trainer.max_epochs=2",
    "trainer.check_val_every_n_epoch=1",
    "trainer.epoch_scan=false",
    "eval.save_output_images=false",
]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    return build_synthetic_root(
        str(root), shape=(64, 64, 40), n_train=4, n_val=2, n_test=2, n_eval=2
    )


def test_e2e_cddpm_train_eval(data_root, tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", data_root)
    monkeypatch.setenv("LOG_DIR", str(tmp_path))
    tree = compose(
        CONFIG_DIR,
        "cDDPM/DDPM_cond_spark_2D",
        TINY_OVERRIDES + ["name=smoke_cddpm"],
    )
    cfg = materialize(tree)
    results = train(cfg)

    preds = results[0]
    assert set(preds) == {"val", "test"}
    for stage in ("val", "test"):
        assert "Brats21" in preds[stage] and "MSLUB" in preds[stage]
        for setname in ("Brats21", "MSLUB"):
            d = preds[stage][setname]
            assert np.isfinite(d["DicePerVolMean"])
            assert np.isfinite(d["AUPRCPerVolMean"])
            assert len(d["DiceScorePerVol"]) == 2
            # eval-forward scalars (ref DDPM_2D.py:214-223,267-272): the
            # encoder latent mean and the diffusion loss land per volume
            assert len(d["latentSpace"]) == 2
            assert d["latentSpace"][0].shape == (16,)  # cond_dim
            assert len(d["AnomalyScoreRegPerVol"]) == 2
            assert np.isfinite(d["AnomalyScoreRegPerVol"]).all()

    run_dir = cfg.run_dir
    assert os.path.exists(os.path.join(run_dir, "checkpoints", "fold-0", "best"))
    assert os.path.exists(os.path.join(run_dir, "checkpoints", "fold-0", "last"))
    assert os.path.exists(os.path.join(run_dir, "csv_fold0", "metrics.csv"))
    with open(os.path.join(run_dir, "0_preds_dict.pkl"), "rb") as f:
        loaded = pickle.load(f)
    assert loaded["test"]["Brats21"]["DicePerVolMean"] == preds["test"]["Brats21"]["DicePerVolMean"]

    # test stage applied the val-fit threshold: stored per-volume thresholds on
    # the val stage exist and the test stage produced CC-filtered dice scores
    assert len(preds["val"]["Brats21"]["BestThresholdPerVol"]) == 2


def test_e2e_only_eval_reuses_checkpoint(data_root, tmp_path, monkeypatch):
    monkeypatch.setenv("DATA_DIR", data_root)
    monkeypatch.setenv("LOG_DIR", str(tmp_path))
    base = TINY_OVERRIDES + ["name=smoke_cddpm2", "datamodule.testsets=[Brats21]"]
    tree = compose(CONFIG_DIR, "cDDPM/DDPM_cond_spark_2D", base)
    cfg = materialize(tree)
    first = train(cfg)

    # only_eval reload, with the device-fused preprocessing backend: the whole
    # orchestrated eval (device-resident subjects -> reconstructor -> scoring)
    # must reproduce the training run's eval metrics
    tree2 = compose(
        CONFIG_DIR, "cDDPM/DDPM_cond_spark_2D",
        base + ["only_eval=true", "datamodule.preprocess_backend=device"],
    )
    cfg2 = materialize(tree2)
    results = train(cfg2)
    got = results[0]["test"]["Brats21"]["DicePerVolMean"]
    assert np.isfinite(got)
    np.testing.assert_allclose(
        got, first[0]["test"]["Brats21"]["DicePerVolMean"], rtol=1e-4
    )

    # grouped reconstruction (eval.volumes_per_call=2, the batch-576-layout
    # knob at flagship shapes): per-volume ordering/counts must be preserved
    # and metrics finite (noise keys differ by design, so values may move)
    tree3 = compose(
        CONFIG_DIR, "cDDPM/DDPM_cond_spark_2D",
        base + ["only_eval=true", "eval.volumes_per_call=2"],
    )
    results3 = train(materialize(tree3))
    ev3 = results3[0]["test"]["Brats21"]
    assert np.isfinite(ev3["DicePerVolMean"])
    assert len(ev3["IDs"]) == len(first[0]["test"]["Brats21"]["IDs"])
    assert ev3["IDs"] == first[0]["test"]["Brats21"]["IDs"]


def test_e2e_healthy_ixi_testset(data_root, tmp_path, monkeypatch):
    """IXI as healthy testset: FPR-quantile thresholds fit on the val stage
    (reference utils_eval.py:289-297, train.py gating)."""
    monkeypatch.setenv("DATA_DIR", data_root)
    monkeypatch.setenv("LOG_DIR", str(tmp_path))
    tree = compose(
        CONFIG_DIR,
        "cDDPM/DDPM_cond_spark_2D",
        TINY_OVERRIDES + ["name=smoke_healthy", "datamodule.testsets=[IXI]",
                          "trainer.max_epochs=1"],
    )
    cfg = materialize(tree)
    results = train(cfg)
    val = results[0]["val"]["IXI"]
    # healthy sets produce the 1/5/10% FPR thresholds, no lesion metrics
    assert "t_1p" in val and "t_5p" in val and "t_10p" in val
    assert val["t_1p"] >= val["t_5p"] >= val["t_10p"]


SPARK_TINY = [
    "model.backbone=resnet18",
    "model.dec_dim=64",
    "model.dtype=float32",
    "datamodule.image_dim=[64,64,40]",
    "datamodule.rescale_factor=1.0",   # spark wants 64x64 (downsample 32 -> f=2)
    "datamodule.batch_size=2",
    "datamodule.aug_intensity=false",
    "datamodule.testsets=[]",
    "trainer.max_epochs=1",
    "trainer.check_val_every_n_epoch=1",
    "trainer.epoch_scan=false",
]


def test_e2e_spark_pretrain_then_cddpm_encoder_import(data_root, tmp_path, monkeypatch):
    """The two-pipeline flow: SparK MIM pretraining -> checkpoint ->
    cDDPM with the pretrained encoder imported (reference encoder_path +
    pretrained_encoder, DDPM_2D.py:79-96)."""
    monkeypatch.setenv("DATA_DIR", data_root)
    monkeypatch.setenv("LOG_DIR", str(tmp_path))

    tree = compose(
        CONFIG_DIR, "cDDPM/Spark_2D_pretrain",
        SPARK_TINY + ["name=smoke_spark", "model.image_hw=[64,64]"],
    )
    scfg = materialize(tree)
    train(scfg)
    spark_run = scfg.run_dir
    assert os.path.exists(os.path.join(spark_run, "checkpoints", "fold-0", "last"))

    tree2 = compose(
        CONFIG_DIR, "cDDPM/DDPM_cond_spark_2D",
        TINY_OVERRIDES + [
            "name=smoke_cddpm_pre",
            "model.image_hw=[64,64]",
            "model.encoder_backbone=resnet18",
            "datamodule.image_dim=[64,64,40]",
            "datamodule.rescale_factor=1.0",
            "datamodule.testsets=[Brats21]",
            f"pretrained_encoder={spark_run}",
            "checkpoint=last",
            "trainer.max_epochs=1",
        ],
    )
    cfg = materialize(tree2)
    results = train(cfg)
    assert np.isfinite(results[0]["test"]["Brats21"]["DicePerVolMean"])


def test_e2e_multifold(tmp_path_factory, tmp_path, monkeypatch):
    """Fold loop parity (reference src/train.py:72-82): per-fold CSVs, separate
    checkpoints and preds pickles."""
    root = tmp_path_factory.mktemp("folds")
    data_root = build_synthetic_root(
        str(root), shape=(64, 64, 40), n_train=3, n_val=2, n_test=2, n_eval=2,
        num_folds=2,
    )
    monkeypatch.setenv("DATA_DIR", data_root)
    monkeypatch.setenv("LOG_DIR", str(tmp_path))
    tree = compose(
        CONFIG_DIR, "cDDPM/DDPM_cond_spark_2D",
        TINY_OVERRIDES + ["name=smoke_folds", "num_folds=2",
                          "datamodule.testsets=[Brats21]",
                          "trainer.max_epochs=1"],
    )
    cfg = materialize(tree)
    results = train(cfg)
    assert set(results) == {0, 1}
    for fold in (0, 1):
        assert np.isfinite(results[fold]["test"]["Brats21"]["DicePerVolMean"])
        assert os.path.exists(
            os.path.join(cfg.run_dir, "checkpoints", f"fold-{fold}", "last")
        )
        assert os.path.exists(os.path.join(cfg.run_dir, f"{fold}_preds_dict.pkl"))


def test_e2e_atlas_wmh_t1_gating(tmp_path_factory, tmp_path, monkeypatch):
    """ATLAS/WMH eval modules (t1-only per the reference's modality gating,
    src/train.py:187-190): evaluated in t1 mode, skipped in t2 mode."""
    root = tmp_path_factory.mktemp("atlaswmh")
    data_root = build_synthetic_root(
        str(root), shape=(64, 64, 40), n_train=2, n_val=1, n_test=1, n_eval=2,
        eval_sets=("ATLAS", "WMH"),
    )
    monkeypatch.setenv("DATA_DIR", data_root)
    monkeypatch.setenv("LOG_DIR", str(tmp_path))
    base = TINY_OVERRIDES + [
        "name=smoke_atlas", "datamodule.testsets=[ATLAS,WMH]",
        "trainer.max_epochs=1",
    ]
    cfg = materialize(compose(CONFIG_DIR, "cDDPM/DDPM_cond_spark_2D", base))
    results = train(cfg)
    for s in ("ATLAS", "WMH"):
        assert np.isfinite(results[0]["test"][s]["DicePerVolMean"])

    # t2 mode gates both sets out entirely (SETS_BY_MODE)
    from conditioned_diffusion_models_uad_tpu.data.datamodules import SETS_BY_MODE

    assert "ATLAS" not in SETS_BY_MODE["t2"] and "WMH" not in SETS_BY_MODE["t2"]


def test_e2e_t2_mode(tmp_path_factory, tmp_path, monkeypatch):
    """t2 modality: IXI keep-list filtering via avail_t2.csv + t1->t2 path
    rewriting across train and eval modules (reference
    Datamodules_train.py:34-49, Datamodules_eval.py:31-32)."""
    root = tmp_path_factory.mktemp("t2data")
    data_root = build_synthetic_root(
        str(root), shape=(64, 64, 40), n_train=3, n_val=2, n_test=1, n_eval=2,
        eval_sets=("Brats21",), with_t2=True,
    )
    monkeypatch.setenv("DATA_DIR", data_root)
    monkeypatch.setenv("LOG_DIR", str(tmp_path))
    cfg = materialize(compose(
        CONFIG_DIR, "cDDPM/DDPM_cond_spark_2D",
        TINY_OVERRIDES + ["name=smoke_t2", "datamodule.mode=t2",
                          "datamodule.testsets=[Brats21]",
                          "trainer.max_epochs=1"],
    ))
    # datamodule paths really point at the t2 files
    from conditioned_diffusion_models_uad_tpu.data.datamodules import IXI, Brats21

    dm = IXI(cfg.data, fold=0)
    assert all("t2" in p for p in dm.csv["train"]["img_path"])
    ev = Brats21(cfg.data, fold=0)
    assert all("t2" in p for p in ev.csv["test"]["img_path"])

    results = train(cfg)
    assert np.isfinite(results[0]["test"]["Brats21"]["DicePerVolMean"])
