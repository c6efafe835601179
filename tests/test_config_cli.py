"""Config composition / override / materialization tests
(reference behaviors: Hydra composition configs/config.yaml:12-31, env
interpolation :37-39, experiment overlays, debug coercion utils.py:27-64)."""
import os

import pytest

from conditioned_diffusion_models_uad_tpu.config import (
    compose,
    load_env_file,
    materialize,
    parse_overrides,
)
from conditioned_diffusion_models_uad_tpu.models.tasks import DDPMTaskConfig, SparkTaskConfig

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_parse_overrides_types():
    t = parse_overrides(["a.b=1", "a.c=true", "d=[1,2]", "e=hello", "f=1e-4"])
    assert t["a"]["b"] == 1 and t["a"]["c"] is True
    assert t["d"] == [1, 2] and t["e"] == "hello"
    assert abs(t["f"] - 1e-4) < 1e-12


def test_compose_base(monkeypatch):
    monkeypatch.setenv("DATA_DIR", "/tmp/x")
    tree = compose(CONFIG_DIR)
    assert tree["datamodule"]["data_dir"] == "/tmp/x"
    assert tree["seed"] == 3141


def test_env_default(monkeypatch):
    monkeypatch.delenv("LOG_DIR", raising=False)
    monkeypatch.setenv("DATA_DIR", "/tmp/x")
    tree = compose(CONFIG_DIR)
    assert tree["log_dir"] == "./logs"


def test_compose_experiment_and_overrides(monkeypatch):
    monkeypatch.setenv("DATA_DIR", "/tmp/x")
    tree = compose(
        CONFIG_DIR,
        "cDDPM/DDPM_cond_spark_2D",
        ["trainer.max_epochs=7", "model.unet_dim=32"],
    )
    cfg = materialize(tree)
    assert cfg.name == "DDPM_cond_2D_spark"
    assert isinstance(cfg.model, DDPMTaskConfig)
    assert cfg.model.condition and cfg.model.noise_ensemble
    assert tuple(cfg.model.step_ensemble) == (250, 500, 750)
    assert cfg.trainer.max_epochs == 7
    assert cfg.model.unet_dim == 32


@pytest.mark.parametrize(
    "exp,task_cls,cond,patched",
    [
        ("cDDPM/DDPM", DDPMTaskConfig, False, False),
        ("cDDPM/DDPM_patched", DDPMTaskConfig, False, True),
        ("cDDPM/Spark_2D_pretrain", SparkTaskConfig, None, None),
    ],
)
def test_all_experiments_materialize(monkeypatch, exp, task_cls, cond, patched):
    monkeypatch.setenv("DATA_DIR", "/tmp/x")
    cfg = materialize(compose(CONFIG_DIR, exp))
    assert isinstance(cfg.model, task_cls)
    if cond is not None:
        assert cfg.model.condition == cond
        assert cfg.model.patched == patched


def test_test_experiment_is_eval_only(monkeypatch):
    """The eval-only overlay (reference configs/experiment/cDDPM/test.yaml):
    flagship model settings with only_eval + checkpoint=best preset."""
    monkeypatch.setenv("DATA_DIR", "/tmp/x")
    cfg = materialize(compose(CONFIG_DIR, "cDDPM/test"))
    assert cfg.only_eval and cfg.checkpoint == "best"
    assert isinstance(cfg.model, DDPMTaskConfig)
    assert cfg.model.condition and cfg.model.noise_ensemble
    assert tuple(cfg.model.step_ensemble) == (250, 500, 750)


def test_debug_coercion(monkeypatch):
    monkeypatch.setenv("DATA_DIR", "/tmp/x")
    cfg = materialize(compose(CONFIG_DIR, None, ["debug=true"]))
    assert cfg.trainer.fast_dev_run and cfg.data.sample_set


def test_unknown_key_rejected(monkeypatch):
    monkeypatch.setenv("DATA_DIR", "/tmp/x")
    with pytest.raises(KeyError):
        materialize(compose(CONFIG_DIR, None, ["model.not_a_knob=1"]))


def test_load_env_file(tmp_path, monkeypatch):
    p = tmp_path / "environment.env"
    p.write_text("MY_TEST_VAR=hello\n# comment\n")
    monkeypatch.delenv("MY_TEST_VAR", raising=False)
    load_env_file(str(p))
    assert os.environ["MY_TEST_VAR"] == "hello"
    del os.environ["MY_TEST_VAR"]


def test_image_hw_derived_from_datamodule(monkeypatch):
    """model.image_hw follows imageDim/rescaleFactor (ref DDPM_2D.py:37-60)
    unless pinned explicitly."""
    monkeypatch.setenv("DATA_DIR", "/tmp/x")
    cfg = materialize(compose(
        CONFIG_DIR, "cDDPM/DDPM_patched",
        ["datamodule.image_dim=[64,64,40]", "datamodule.rescale_factor=2.0"],
    ))
    assert tuple(cfg.model.image_hw) == (32, 32)
    cfg2 = materialize(compose(
        CONFIG_DIR, "cDDPM/DDPM_patched",
        ["datamodule.image_dim=[64,64,40]", "model.image_hw=[64,64]"],
    ))
    assert tuple(cfg2.model.image_hw) == (64, 64)
    # default north-star stays 96x96
    cfg3 = materialize(compose(CONFIG_DIR, "cDDPM/DDPM_cond_spark_2D"))
    assert tuple(cfg3.model.image_hw) == (96, 96)


def test_override_derived_run_dir(tmp_path):
    """Opt-in reference-style run-dir templating (configs/mode/
    default.yaml:8-36): '<task>_<datamodule>_<name>_<key-value_key-value>'."""
    from conditioned_diffusion_models_uad_tpu.config import compose, materialize

    tree = compose(
        CONFIG_DIR, "cDDPM/DDPM_cond_spark_2D",
        ["name=exp1", "run_dir_template=true", "model.timesteps=800",
         "trainer.max_epochs=2", "datamodule.sample_set=true",
         f"log_dir={tmp_path}"],
    )
    cfg = materialize(tree)
    base = os.path.basename(cfg.run_dir)
    assert base == (
        "DDPM_2D_IXI_exp1_model.timesteps-800_trainer.max_epochs-2"
    )
    # excluded keys (sample_set) and name= itself never leak into the dirname
    assert "sample_set" not in base and "exp1_name" not in base

    tree2 = compose(CONFIG_DIR, "cDDPM/DDPM_cond_spark_2D",
                    ["name=exp1", f"log_dir={tmp_path}"])
    cfg2 = materialize(tree2)
    assert os.path.basename(cfg2.run_dir) == "exp1"  # default: plain name
