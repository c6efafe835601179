"""Config-group composition (the reference Hydra tree's trainer/ datamodule/
callbacks/ logger/ mode/ groups, configs/config.yaml:12-31) and its
materialization into typed configs."""
import os

import pytest

from conditioned_diffusion_models_uad_tpu.config import (
    CallbacksConfig,
    compose,
    materialize,
)

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_defaults_compose_groups(tmp_path):
    os.environ.setdefault("DATA_DIR", str(tmp_path))
    tree = compose(CONFIG_DIR)
    # trainer group
    assert tree["trainer"]["max_epochs"] == 1200
    # datamodule group
    assert tree["datamodule"]["name"] == "IXI"
    assert tree["datamodule"]["batch_size"] == 32
    # callbacks group
    assert tree["callbacks"]["checkpoint"]["save_last"] is True
    # logger group
    assert tree["logger"]["use_wandb"] is True
    # mode group merges at top level
    assert tree["run_dir_template"] is False


def test_cli_group_reselection(tmp_path):
    os.environ.setdefault("DATA_DIR", str(tmp_path))
    tree = compose(CONFIG_DIR, overrides=["logger=csv", "mode=reference"])
    assert tree["logger"]["use_wandb"] is False
    assert tree["run_dir_template"] is True and tree["append_datetime"] is True
    rc = materialize(tree)
    assert rc.logger.use_wandb is False and rc.logger.use_csv is True
    assert rc.run_dir_template is True


def test_dotted_overrides_beat_groups(tmp_path):
    os.environ.setdefault("DATA_DIR", str(tmp_path))
    tree = compose(
        CONFIG_DIR,
        overrides=["trainer.max_epochs=7", "callbacks.checkpoint.save_last=false"],
    )
    rc = materialize(tree)
    assert rc.trainer.max_epochs == 7
    assert rc.callbacks.save_last is False
    assert rc.trainer.save_last is False  # threaded into the fit loop


def test_experiment_overlay_keeps_group_defaults(tmp_path):
    os.environ.setdefault("DATA_DIR", str(tmp_path))
    tree = compose(CONFIG_DIR, experiment="cDDPM/DDPM_cond_spark_2D")
    assert tree["trainer"]["max_epochs"] == 1200  # group survives the overlay
    rc = materialize(tree)
    assert rc.datamodule_name == "IXI"
    assert rc.logger.use_csv is True


def test_eval_device_fast_preset(tmp_path):
    os.environ.setdefault("DATA_DIR", str(tmp_path))
    tree = compose(
        CONFIG_DIR, experiment="cDDPM/DDPM_cond_spark_2D",
        overrides=["eval=device_fast"],
    )
    rc = materialize(tree)
    assert rc.eval.volumes_per_call == 2
    assert rc.eval.cc_backend == "device"
    assert rc.eval.hausdorff_backend == "device"
    # the experiment's own eval keys survive the group selection
    assert rc.eval.residualmode == "l1"


def test_group_selection_typo_raises(tmp_path):
    os.environ.setdefault("DATA_DIR", str(tmp_path))
    with pytest.raises(ValueError, match="config group 'trainer'"):
        compose(CONFIG_DIR, experiment="cDDPM/DDPM_cond_spark_2D",
                overrides=["trainer=fsat"])


def test_unknown_group_and_bad_topk():
    with pytest.raises(ValueError):
        CallbacksConfig(save_top_k=3)
    with pytest.raises(KeyError):
        from conditioned_diffusion_models_uad_tpu.config import _parse_defaults

        _parse_defaults([{"nonsense": "x"}])


def test_print_config_rich_tree(tmp_path, capsys):
    """print_config renders the reference's rich tree (src/utils/utils.py:68-104):
    one branch per group, mirrored to config_tree.txt in the run dir."""
    from conditioned_diffusion_models_uad_tpu.config import print_config

    os.environ.setdefault("DATA_DIR", str(tmp_path))
    tree = compose(CONFIG_DIR)
    print_config(tree, run_dir=str(tmp_path))
    out = capsys.readouterr().out
    assert "CONFIG" in out
    path = os.path.join(str(tmp_path), "config_tree.txt")
    assert os.path.exists(path)
    text = open(path).read()
    # reference field order first, then the remaining groups
    for field in ("trainer", "model", "datamodule", "callbacks", "logger"):
        assert field in text
    assert "max_epochs" in text  # YAML content inside the branch
