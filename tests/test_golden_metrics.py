"""Pinned golden eval metrics: a fixed-seed tiny e2e with COMMITTED expected
values (VERDICT r4 #3).

Every other e2e test asserts protocol, finiteness, or learning ratios — this
one asserts the NUMBERS, so a refactor that silently shifts eval numerics
(a changed reduction order, a key-split reshuffle, a noise-keying change)
fails loudly instead of passing 300 green tests.

The run is hermetic and deterministic in the suite environment (8-virtual-
device XLA:CPU, tests/conftest.py): synthetic dataset from seed 0, untrained
seed-0 variables, the production eval preset (volumes_per_call=2,
fused_dispatch on). Reference counterpart: results.txt:3-6 pins exactly one
number for the reference — this pins the whole headline dict.

Regeneration recipe (ONLY after an intentional numerics change — explain the
change in the commit message):

    UAD_GOLDEN_PRINT=1 python -m pytest tests/test_golden_metrics.py -q -s

and paste the printed GOLDEN dict below verbatim.
"""
import os

import jax
import numpy as np

from conditioned_diffusion_models_uad_tpu.config import RunConfig
from conditioned_diffusion_models_uad_tpu.data.datamodules import DataConfig
from conditioned_diffusion_models_uad_tpu.data.synthetic import build_synthetic_root
from conditioned_diffusion_models_uad_tpu.eval.harness import EvalConfig
from conditioned_diffusion_models_uad_tpu.models.tasks import DDPMTask, DDPMTaskConfig
from conditioned_diffusion_models_uad_tpu.orchestrate import evaluate

TINY = dict(
    image_hw=(32, 32), cond_dim=16, encoder_backbone="resnet18",
    timesteps=20, unet_dim=32, num_res_blocks=1, channel_mult=(1, 2),
    attention_resolutions=(), test_timesteps=10, step_ensemble=(5, 10),
    dtype="float32",
)

# scalar headline metrics pinned per (stage): {key: expected}
GOLDEN = {
    "test": {"AUCPerVolMean": 0.9770184357961019,
             "AUPRCPerVolMean": 0.4260152081648509,
             "BestDicePerVolMean": 0.4563915530840556,
             "BestThresholdPerVolMean": 0.20181147754192352,
             "DicePerVolMean": 0.30660780731617393,
             "HausPerVolMean": 9.315380599529698,
             "l1recoErrorAllMean": 0.40905964374542236},
    "val": {"AUCPerVolMean": 0.9769103527069092,
            "AUPRCPerVolMean": 0.3142950137456258,
            "BestDicePerVolMean": 0.33833854893843335,
            "BestThresholdPerVolMean": 0.192021573583285,
            "DicePerVolMean": 0.3394138187406492,
            "HausPerVolMean": 8.168544568744853,
            "l1recoErrorAllMean": 0.40560243527094525},
}

# per-volume rows pinned in full (stage -> key -> list)
GOLDEN_ROWS = {
    "test": {"AUCPerVol": [0.9722633361816406,
                           0.9878068566322327,
                           0.9709851145744324],
             "BestThresholdPerVol": [0.20181147754192352,
                                     0.20181147754192352,
                                     0.20181147754192352],
             "DiceScorePerVol": [0.2141732283464567,
                                 0.32390745501285345,
                                 0.3817427385892116],
             "FPPerVol": [956.0, 228.0, 347.0],
             "TPPerVol": [136.0, 63.0, 138.0],
             "l1recoErrorAll": [0.4141184985637665,
                                0.39644336700439453,
                                0.4166170656681061],
             "lesionSizePerVol": [178.0, 98.0, 238.0]},
    "val": {"AUCPerVol": [0.9777277112007141,
                          0.9738644361495972,
                          0.9791389107704163],
            "BestThresholdPerVol": [0.1953207552433014,
                                    0.1886349618434906,
                                    0.19210900366306305],
            "DiceScorePerVol": [0.3835616438356164,
                                0.2314540059347181,
                                0.4032258064516129],
            "FPPerVol": [240.0, 171.0, 170.0],
            "TPPerVol": [98.0, 39.0, 100.0],
            "l1recoErrorAll": [0.3984682261943817,
                               0.40254685282707214,
                               0.41579222679138184],
            "lesionSizePerVol": [173.0, 127.0, 226.0]},
}

_SCALARS = (
    "DicePerVolMean", "AUCPerVolMean", "AUPRCPerVolMean",
    "BestDicePerVolMean", "BestThresholdPerVolMean",
    "l1recoErrorAllMean", "HausPerVolMean",
)
_ROWS = ("DiceScorePerVol", "BestThresholdPerVol", "AUCPerVol",
         "TPPerVol", "FPPerVol", "lesionSizePerVol", "l1recoErrorAll")


class _NullLogger:
    def log_metrics(self, metrics, step=0):
        pass


def test_golden_eval_metrics(tmp_path):
    root = build_synthetic_root(
        str(tmp_path / "data"), shape=(64, 64, 40), n_train=1, n_val=1,
        n_test=1, n_eval=3, eval_sets=("Brats21",), seed=0,
    )
    cfg = RunConfig(
        name="golden", seed=0, log_dir=str(tmp_path / "logs"),
        model=DDPMTaskConfig(**TINY),
        data=DataConfig(data_dir=root, image_dim=(64, 64, 40),
                        rescale_factor=2.0, testsets=("Brats21",)),
        eval=EvalConfig(save_output_images=False, volumes_per_call=2,
                        fused_dispatch=True),
    )
    cfg.eval.out_dir = cfg.run_dir
    task = DDPMTask(cfg.model)
    variables = task.init(jax.random.PRNGKey(cfg.seed))

    # lower the fused-path gate so the production scoring path runs on the
    # tiny fixture (the same monkeypatch every fused-eval test applies)
    from conditioned_diffusion_models_uad_tpu.eval import harness as H

    orig_gate = H.FUSED_MIN_VOXELS
    H.FUSED_MIN_VOXELS = 1000
    try:
        preds = evaluate(cfg, task, variables, fold=0, logger=_NullLogger())
    finally:
        H.FUSED_MIN_VOXELS = orig_gate

    got = {"val": {}, "test": {}}
    got_rows = {"val": {}, "test": {}}
    for stage in ("val", "test"):
        ev = preds[stage]["Brats21"]
        for k in _SCALARS:
            got[stage][k] = float(ev[k])
        for k in _ROWS:
            got_rows[stage][k] = [float(v) for v in ev[k]]

    if os.environ.get("UAD_GOLDEN_PRINT", "") not in ("", "0"):
        import pprint

        print("\nGOLDEN = ", end="")
        pprint.pprint(got, width=76)
        print("GOLDEN_ROWS = ", end="")
        pprint.pprint(got_rows, width=76)
        raise AssertionError("UAD_GOLDEN_PRINT set: paste the dicts above")

    assert GOLDEN["val"], (
        "golden constants missing — regenerate per the module docstring"
    )
    for stage in ("val", "test"):
        for k, want in GOLDEN[stage].items():
            np.testing.assert_allclose(
                got[stage][k], want, rtol=0, atol=1e-9,
                err_msg=f"{stage}/{k} moved (golden regression)",
            )
        for k, want in GOLDEN_ROWS[stage].items():
            np.testing.assert_allclose(
                got_rows[stage][k], want, rtol=0, atol=1e-9,
                err_msg=f"{stage}/{k} moved (golden regression)",
            )
