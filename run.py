#!/usr/bin/env python
"""CLI entry point.

Same CLI shape as the reference (reference: run.py:20-56):

    python run.py experiment=cDDPM/DDPM_cond_spark_2D trainer.max_epochs=10 ...

Composition: configs/config.yaml <- configs/experiment/<name>.yaml <- CLI
key=value overrides (dotted keys, YAML-typed values). `environment.env` is
loaded into os.environ first (the reference's pc_environment.env dotenv load,
run.py:16) for ${env:DATA_DIR}/${env:LOG_DIR} interpolation.
"""
from __future__ import annotations

import os
import sys


USAGE = """usage: python run.py experiment=cDDPM/<name> [key=value ...]

experiments: cDDPM/DDPM_cond_spark_2D (north-star) | cDDPM/DDPM |
             cDDPM/DDPM_patched | cDDPM/Spark_2D_pretrain
overrides:   dotted keys with YAML-typed values, e.g.
             trainer.max_epochs=100 'model.step_ensemble=[250,500,750]'
             only_eval=true load_checkpoint=<run-dir> datamodule.mode=t2
env:         DATA_DIR, LOG_DIR (or put them in environment.env)"""


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if any(a in ("-h", "--help", "help") for a in argv):
        print(USAGE)
        return None

    from conditioned_diffusion_models_uad_tpu.config import (
        compose,
        load_env_file,
        materialize,
        print_config,
        save_config,
    )
    from conditioned_diffusion_models_uad_tpu.orchestrate import train
    from conditioned_diffusion_models_uad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    load_env_file(os.path.join(os.path.dirname(__file__) or ".", "environment.env"))

    experiment = None
    overrides = []
    for a in argv:
        if a.startswith("experiment="):
            experiment = a.split("=", 1)[1]
        else:
            overrides.append(a)

    config_dir = os.path.join(os.path.dirname(__file__) or ".", "configs")
    tree = compose(config_dir, experiment, overrides)
    cfg = materialize(tree)

    os.makedirs(cfg.run_dir, exist_ok=True)
    print_config(tree, run_dir=cfg.run_dir)
    save_config(tree, os.path.join(cfg.run_dir, "final_config.yaml"))

    return train(cfg)


if __name__ == "__main__":
    main()
