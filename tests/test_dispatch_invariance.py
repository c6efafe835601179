"""Eval metrics are invariant to the dispatch layout (VERDICT r4 #1).

Every volume in a grouped dispatch draws its noise from its OWN
fold_in(key, volume_idx) key inside the grouped program
(diffusion/gaussian.py::noise_for, models/tasks.py::reconstruct_with_aux),
so `eval.volumes_per_call`, `eval.fused_dispatch`, and the device-fast
presets are pure dispatch-layout knobs: the same checkpoint produces the
SAME eval_dict under every layout. The reference re-seeds freshly per call
(src/utils/generate_noise.py:19-25) — pinning the keying to the volume
index is the determinism-respecting refinement of that freedom.

Contract these tests pin:
* every integer/count/identity row (IDs, labels, TP/FP/TN/FN, lesion
  sizes) is EXACTLY equal across all layouts;
* every float row agrees to float-rounding scale (measured max ~1.4e-6
  relative): the residual wiggle is backend reduction tiling — XLA (CPU
  threads here, MXU tiles on chip) partitions a reduction differently at
  different batch shapes and when the scoring program is chained vs
  standalone — NOT keying. The r4 defect this guards against (shared group
  keys) moved dice by ~5e-2, four orders above this tolerance.
On a single-device CPU backend the float rows measure bitwise-identical
across volumes_per_call within each dispatch mode; the suite's 8-virtual-
device env adds the ulp-level thread-partition noise, so the tolerance
here is the honest cross-environment contract.
"""
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.config import RunConfig
from conditioned_diffusion_models_uad_tpu.data.datamodules import DataConfig
from conditioned_diffusion_models_uad_tpu.data.synthetic import build_synthetic_root
from conditioned_diffusion_models_uad_tpu.eval.harness import EvalConfig
from conditioned_diffusion_models_uad_tpu.eval.reconstruct import VolumeReconstructor
from conditioned_diffusion_models_uad_tpu.models.tasks import (
    DDPMTask,
    DDPMTaskConfig,
    SparkTask,
    SparkTaskConfig,
)
from conditioned_diffusion_models_uad_tpu.orchestrate import evaluate

TINY = dict(
    image_hw=(32, 32), cond_dim=16, encoder_backbone="resnet18",
    timesteps=20, unet_dim=32, num_res_blocks=1, channel_mult=(1, 2),
    attention_resolutions=(), test_timesteps=10, step_ensemble=(5, 10),
    dtype="float32",
)

# science rows a layout change must not move (the pickled per-volume lists
# downstream analyses consume)
INT_KEYS = (
    "TPPerVol", "FPPerVol", "TNPerVol", "FNPerVol", "lesionSizePerVol",
    "labelPerSlice", "labelPerVol",
)
FLOAT_KEYS = (
    "DiceScorePerVol", "BestDicePerVol", "BestThresholdPerVol", "AUCPerVol",
    "AUPRCPerVol", "HausPerVol", "l1recoErrorAll", "l2recoErrorAll",
    "AnomalyScoreRegPerVol", "AnomalyScoreRecoPerVol",
    "AnomalyScoreRecoPerSlice",
)


class _NullLogger:
    def log_metrics(self, metrics, step=0):
        pass


def _eval_dicts_equal(ref, other, context):
    for stage in ("val", "test"):
        ev_r, ev_o = ref[stage]["Brats21"], other[stage]["Brats21"]
        assert ev_r["IDs"] == ev_o["IDs"], context
        for k in INT_KEYS:
            np.testing.assert_array_equal(
                np.asarray(ev_r[k], dtype=np.float64),
                np.asarray(ev_o[k], dtype=np.float64),
                err_msg=f"{context}: {stage}/{k}",
            )
        for k in FLOAT_KEYS:
            np.testing.assert_allclose(
                np.asarray(ev_r[k], dtype=np.float64),
                np.asarray(ev_o[k], dtype=np.float64),
                rtol=1e-5, atol=1e-8,
                err_msg=f"{context}: {stage}/{k}",
            )
        for a, b in zip(ev_r["latentSpace"], ev_o["latentSpace"]):
            np.testing.assert_allclose(
                a, b, rtol=1e-5, atol=1e-8, err_msg=context
            )


def test_eval_dict_invariant_to_dispatch_layout(tmp_path, monkeypatch):
    """volumes_per_call 1/2/4 x fused on/off produce the same eval_dict:
    counts/labels/IDs exactly, float rows to float-rounding scale (see
    module docstring; 4 eval volumes -> group layouts with and without
    padded tails)."""
    from conditioned_diffusion_models_uad_tpu.eval import harness as H

    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 1000)

    root = build_synthetic_root(
        str(tmp_path / "data"), shape=(64, 64, 40), n_train=1, n_val=1,
        n_test=1, n_eval=4, eval_sets=("Brats21",),
    )
    base = RunConfig(
        name="layout_inv", seed=0, log_dir=str(tmp_path / "logs"),
        model=DDPMTaskConfig(**TINY),
        data=DataConfig(data_dir=root, image_dim=(64, 64, 40),
                        rescale_factor=2.0, testsets=("Brats21",)),
        eval=EvalConfig(save_output_images=False),
    )
    base.eval.out_dir = base.run_dir
    task = DDPMTask(base.model)
    variables = task.init(jax.random.PRNGKey(0))

    layouts = [(1, False), (1, True), (2, False), (2, True), (4, True)]
    results = {}
    for vpc, fused in layouts:
        cfg = dc.replace(base, eval=dc.replace(
            base.eval, volumes_per_call=vpc, fused_dispatch=fused))
        results[(vpc, fused)] = evaluate(
            cfg, task, variables, fold=0, logger=_NullLogger()
        )

    ref = results[layouts[0]]
    for layout in layouts[1:]:
        _eval_dicts_equal(ref, results[layout], f"layout {layout}")


def test_grouped_reconstruction_bitwise_all_modes():
    """Grouped batch_call with per-volume keys reproduces the single-volume
    reconstruction bitwise in every reco mode (single-shot ensemble,
    ancestral, ddim, patched) and for the SparK task."""
    rng = np.random.default_rng(0)
    vols = [rng.random((32, 32, 12), dtype=np.float32) for _ in range(2)]
    key = jax.random.PRNGKey(7)
    keys = jnp.stack([jax.random.fold_in(key, i) for i in range(2)])

    def check(task, variables, patched=False):
        recon = VolumeReconstructor(task, patched=patched)
        singles = [
            recon(variables, v, jax.random.fold_in(key, i), return_aux=True)
            for i, v in enumerate(vols)
        ]
        grouped = recon.batch_call(variables, vols, keys)
        for (r_s, a_s), (r_g, a_g) in zip(singles, grouped):
            np.testing.assert_array_equal(np.asarray(r_s), np.asarray(r_g))
            np.testing.assert_array_equal(
                np.asarray(a_s["loss"]), np.asarray(a_g["loss"])
            )

    task = DDPMTask(DDPMTaskConfig(**TINY))
    variables = task.init(jax.random.PRNGKey(0))
    check(task, variables)

    for mode in ("ancestral", "ddim"):
        check(
            DDPMTask(DDPMTaskConfig(
                **{**TINY, "reco_mode": mode, "sampling_steps": 4})),
            variables,
        )

    t_p = DDPMTask(DDPMTaskConfig(**{**TINY, "patched": True,
                                     "patch_hw": (16, 16)}))
    check(t_p, t_p.init(jax.random.PRNGKey(1)), patched=True)

    t_s = SparkTask(SparkTaskConfig(image_hw=(32, 32), backbone="resnet18",
                                    dec_dim=32, dtype="float32"))
    check(t_s, t_s.init(jax.random.PRNGKey(2)))


def test_commit_reorder_buffer_out_of_order():
    """The commit reorder buffer lands rows in batch_idx order even when a
    SINGLE thread commits out of dataset order (the shape-bucketed grouping
    dispatch pattern) — the old blocking turnstile would deadlock here."""
    from conditioned_diffusion_models_uad_tpu.eval.harness import EvalSession

    s = EvalSession(EvalConfig(), "Brats21", "test")
    order = []
    for idx in (2, 0, 3, 1):
        s._commit_in_order(idx, lambda i=idx: order.append(i))
    assert order == [0, 1, 2, 3]

    # an aborted turn releases the buffer for later commits
    s2 = EvalSession(EvalConfig(), "Brats21", "test")
    order2 = []
    s2._commit_in_order(1, lambda: order2.append(1))
    s2._abort_turn(0)
    assert order2 == [1]

    # a RAISING closure spends its turn instead of wedging the buffer:
    # later commits still land, in order
    s3 = EvalSession(EvalConfig(), "Brats21", "test")
    order3 = []

    def boom():
        raise RuntimeError("commit failed")

    s3._commit_in_order(1, lambda: order3.append(1))
    s3._commit_in_order(2, lambda: order3.append(2))
    with pytest.raises(RuntimeError):
        s3._commit_in_order(0, boom)
    assert order3 == []  # 1/2 still parked: the drain stopped at the raise
    s3._commit_in_order(3, lambda: order3.append(3))  # next deposit drains
    assert order3 == [1, 2, 3]


def test_preupload_matches_host_arrays(tmp_path, monkeypatch):
    """eval.preupload (loader-thread device_put of subject arrays, hiding
    H2D behind the previous group's compute) is value-preserving: the
    eval_dict is identical with it on or off, in both dispatch modes."""
    from conditioned_diffusion_models_uad_tpu.eval import harness as H

    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 1000)

    root = build_synthetic_root(
        str(tmp_path / "data"), shape=(64, 64, 40), n_train=1, n_val=1,
        n_test=1, n_eval=3, eval_sets=("Brats21",),
    )
    base = RunConfig(
        name="preupload", seed=0, log_dir=str(tmp_path / "logs"),
        model=DDPMTaskConfig(**TINY),
        data=DataConfig(data_dir=root, image_dim=(64, 64, 40),
                        rescale_factor=2.0, testsets=("Brats21",)),
        eval=EvalConfig(save_output_images=False, volumes_per_call=2),
    )
    base.eval.out_dir = base.run_dir
    task = DDPMTask(base.model)
    variables = task.init(jax.random.PRNGKey(0))

    for fused in (True, False):
        results = {}
        for pre in (True, False):
            cfg = dc.replace(base, eval=dc.replace(
                base.eval, preupload=pre, fused_dispatch=fused))
            results[pre] = evaluate(
                cfg, task, variables, fold=0, logger=_NullLogger()
            )
        _eval_dicts_equal(results[True], results[False],
                          f"preupload fused={fused}")
