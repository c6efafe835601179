"""Eval stack tests: post-processing parity vs scipy, metrics parity vs
sklearn/scipy references, and the end-to-end EvalSession protocol
(reference behaviors: src/utils/utils_eval.py; SURVEY.md §2.6)."""
import numpy as np
import pytest
import scipy.ndimage as ndi

from conditioned_diffusion_models_uad_tpu.eval import (
    EvalConfig,
    EvalSession,
    apply_brainmask_volume,
    compute_prc,
    compute_roc,
    dice,
    filter_3d_connected_components,
    find_best_val,
    get_eval_dictionary,
    hausdorff_distance,
    median_filter_3d,
    postprocess_residual,
    slice_anomaly_scores,
)


def test_median_filter_matches_scipy():
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(12, 13, 9)).astype(np.float32)
    ours = np.asarray(median_filter_3d(vol, 5))
    ref = ndi.median_filter(vol, size=5, mode="reflect")
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_median_filter_k3_matches_scipy():
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(8, 8, 8)).astype(np.float32)
    ours = np.asarray(median_filter_3d(vol, 3))
    ref = ndi.median_filter(vol, size=3, mode="reflect")
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_brainmask_erosion_matches_scipy():
    rng = np.random.default_rng(2)
    mask = (rng.uniform(size=(24, 24, 5)) > 0.3).astype(np.float32)
    diff = rng.uniform(size=(24, 24, 5)).astype(np.float32)
    iters = 2
    ours = np.asarray(apply_brainmask_volume(diff, mask, iters))
    strel = ndi.generate_binary_structure(2, 1)
    ref = np.empty_like(diff)
    for s in range(diff.shape[2]):
        er = ndi.binary_erosion(mask[:, :, s] > 0, structure=strel, iterations=iters)
        ref[:, :, s] = diff[:, :, s] * er
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_postprocess_chain_zeroes_outside_brain():
    rng = np.random.default_rng(3)
    orig = rng.uniform(size=(50, 50, 8)).astype(np.float32)
    reco = rng.uniform(size=(50, 50, 8)).astype(np.float32)
    mask = np.zeros((50, 50, 8), np.float32)
    mask[10:40, 10:40, :] = 1
    diff = np.asarray(
        postprocess_residual(orig, reco, mask, erode_iterations=2, median_kernel=5)
    )
    assert diff.shape == orig.shape
    assert np.all(diff[:5, :5] == 0)  # outside the brain mask
    assert diff[25, 25].max() >= 0


def test_dice_and_threshold_search():
    # synthetic score map where the optimal threshold is known
    seg = np.zeros((32, 32, 4), bool)
    seg[8:16, 8:16] = True
    scores = np.where(seg, 0.8, 0.1) + np.random.default_rng(4).normal(
        0, 0.01, seg.shape
    )
    best_dice, best_th = find_best_val(
        scores.ravel(), seg.ravel(), val_range=(0, scores.max()), max_steps=10
    )
    assert best_dice > 0.95
    assert 0.15 < best_th < 0.8
    assert dice(scores > best_th, seg) == pytest.approx(best_dice)


def test_dice_formula():
    p = np.array([1, 1, 0, 0], bool)
    g = np.array([1, 0, 1, 0], bool)
    assert dice(p, g) == pytest.approx(2 * 1 / (2 + 2))


def test_roc_prc_against_sklearn():
    from sklearn.metrics import average_precision_score, roc_auc_score

    rng = np.random.default_rng(5)
    y = rng.uniform(size=500) > 0.7
    x = y * 0.5 + rng.uniform(size=500)
    auc_v, _, _, _ = compute_roc(x, y)
    prc_v, _, _, _ = compute_prc(x, y)
    assert auc_v == pytest.approx(roc_auc_score(y, x))
    assert prc_v == pytest.approx(average_precision_score(y, x))


def test_connected_component_filter():
    vol = np.zeros((16, 16, 16), bool)
    vol[1:3, 1:3, 1:2] = True  # 4 voxels -> dropped (<= 7)
    vol[8:12, 8:12, 8:10] = True  # 32 voxels -> kept
    out = filter_3d_connected_components(vol.copy(), min_size=8)
    assert not out[1:3, 1:3, 1:2].any()
    assert out[8:12, 8:12, 8:10].all()


def test_connected_component_full_connectivity():
    # two diagonal voxels are ONE component under 26-connectivity
    vol = np.zeros((4, 4, 4), bool)
    vol[0, 0, 0] = vol[1, 1, 1] = True
    labeled, n = ndi.label(vol, structure=np.ones((3, 3, 3), bool))
    assert n == 1
    out = filter_3d_connected_components(vol.copy(), min_size=2)
    assert out.sum() == 2  # size-2 component survives min_size=2


def test_hausdorff_identity_and_shift():
    a = np.zeros((20, 20, 20), bool)
    a[5:10, 5:10, 5:10] = True
    assert hausdorff_distance(a, a) == 0.0
    b = np.roll(a, 3, axis=0)
    d = hausdorff_distance(a, b)
    assert d == pytest.approx(3.0, abs=0.01)
    assert np.isnan(hausdorff_distance(a, np.zeros_like(a)))


def test_slice_anomaly_scores_masked_mean():
    diff = np.ones((8, 8, 3), np.float32) * np.array([1.0, 2.0, 3.0])
    mask = np.ones((8, 8, 3), np.float32)
    mask[..., 2] = 0  # empty slice -> score 0
    s = np.asarray(slice_anomaly_scores(diff, mask))
    np.testing.assert_allclose(s, [1.0, 2.0, 0.0], atol=1e-6)


def _run_session(stage, threshold=None, name="Brats21"):
    rng = np.random.default_rng(7)
    cfg = EvalConfig(erode_brainmask=True, median_filtering=True)
    sess = EvalSession(cfg, name, stage, threshold=threshold)
    for i in range(2):
        orig = rng.uniform(0.2, 1.0, size=(48, 48, 8)).astype(np.float32)
        seg = np.zeros_like(orig)
        seg[20:30, 20:30, 2:6] = 1
        reco = orig.copy()
        reco[20:30, 20:30, 2:6] -= 0.5  # big residual inside the lesion
        mask = np.ones_like(orig)
        sess.test_step(reco, orig, seg, mask, batch_idx=i, ID=f"v{i}", label_vol=1)
    return sess, sess.test_end()


def test_eval_session_val_then_test_protocol():
    # val pass fits the threshold...
    sess_val, d_val = _run_session("val")
    assert "total" in sess_val.threshold
    assert d_val["DicePerVolMean"] > 0.3
    # the 5^3 median on a depth-8 fixture dilutes lesion borders; 0.7 is the
    # discriminative floor for this synthetic case
    assert d_val["AUCPerVolMean"] > 0.7
    assert len(d_val["AnomalyScoreRecoPerVol"]) == 2
    assert len(d_val["labelPerSlice"]) == 16
    # ...the test pass consumes it (ref utils_eval.py:92-93)
    sess_t, d_t = _run_session("test", threshold=sess_val.threshold)
    assert d_t["DicePerVolMean"] > 0.3
    assert all(
        t == sess_val.threshold["total"] for t in d_t["BestThresholdPerVol"]
    )


def test_eval_session_healthy_set_quantile_thresholds():
    sess, d = _run_session("val", name="IXI")
    # healthy sets skip seg metrics, fit FPR-quantile thresholds (ref :289-297)
    assert len(d["DiceScorePerVol"]) == 0
    assert sess.threshholds_healthy["thresh_1p"] >= sess.threshholds_healthy["thresh_5p"]
    assert d["t_1p"] >= d["t_5p"] >= d["t_10p"]


def test_eval_dictionary_schema():
    d = get_eval_dictionary()
    # spot-check the reference's schema keys (utils_eval.py:324-445)
    for k in (
        "AUCPerVol", "AUPRCPerVol", "DiceScorePerVol", "BestThresholdPerVol",
        "AnomalyScoreRecoPerVol", "labelPerSlice", "HausPerVol",
        "KLD_to_learned_prior", "AUCAnomalyRecoPerSlice",
    ):
        assert k in d and d[k] == []


def test_l1_ae_loss_strategies():
    """L1_AE parity (reference src/models/losses.py:3-23)."""
    import jax.numpy as jnp
    from conditioned_diffusion_models_uad_tpu.models.losses import l1_ae_loss

    reco = jnp.ones((2, 4, 4, 1)) * 0.5
    target = jnp.zeros((2, 4, 4, 1))
    d_sum = l1_ae_loss(reco, target, "sum")
    d_mean = l1_ae_loss(reco, target, "mean")
    assert float(d_sum["combined_loss"]) == 0.5 * 16
    assert abs(float(d_mean["combined_loss"]) - 0.5) < 1e-6
    assert float(d_sum["reg"]) == 0.0


def test_calc_interres():
    """Pooling-shape helper parity (reference src/utils/utils.py:234-246)."""
    from conditioned_diffusion_models_uad_tpu.utils import calc_interres

    assert calc_interres([192, 192], 2.0, 2, 3, 1, 2) == [24, 24]
    assert calc_interres([192, 192, 100], 2.0, 1, 3, 1, 2) == [48, 48, 25]


def test_find_best_val_device_matches_host():
    """Device threshold search follows the same greedy trajectory as the host
    version (ref utils_eval.py:508-539)."""
    import numpy as np
    from conditioned_diffusion_models_uad_tpu.eval.metrics import (
        find_best_val,
        find_best_val_device,
    )

    rng = np.random.default_rng(0)
    x = rng.random(100_000).astype(np.float32)
    y = x + rng.normal(0, 0.3, x.shape) > 1.0
    d_h, t_h = find_best_val(x, y, val_range=(0, float(x.max())))
    d_d, t_d = find_best_val_device(x, y, val_range=(0, float(x.max())))
    assert abs(d_h - d_d) < 1e-5
    assert abs(t_h - t_d) < 1e-6


def test_device_roc_prc_matches_sklearn():
    """Device AUROC/AP parity with sklearn, including heavy ties."""
    from sklearn.metrics import average_precision_score, roc_auc_score
    from conditioned_diffusion_models_uad_tpu.eval.metrics import (
        compute_roc_prc_device,
    )

    rng = np.random.default_rng(11)
    y = rng.uniform(size=5000) > 0.8
    # quantized scores -> many ties
    x = np.round((y * 0.4 + rng.uniform(size=5000)) * 20) / 20
    auc_d, ap_d = compute_roc_prc_device(x, y)
    assert auc_d == pytest.approx(roc_auc_score(y, x), abs=1e-5)
    assert ap_d == pytest.approx(average_precision_score(y, x), abs=1e-5)

    # continuous scores, no ties
    x2 = y * 0.5 + rng.normal(0, 0.5, size=5000)
    auc_d2, ap_d2 = compute_roc_prc_device(x2, y)
    assert auc_d2 == pytest.approx(roc_auc_score(y, x2), abs=1e-5)
    assert ap_d2 == pytest.approx(average_precision_score(y, x2), abs=1e-5)


def test_seg_metrics_device_matches_host_pipeline():
    """The fused device kernel must reproduce sklearn AUROC/AP and the host
    greedy threshold search on the same inputs."""
    from sklearn.metrics import average_precision_score, roc_auc_score
    from conditioned_diffusion_models_uad_tpu.eval.metrics import (
        find_best_val,
        seg_metrics_device,
    )

    rng = np.random.default_rng(12)
    y = rng.uniform(size=20000) > 0.85
    x = (y * 0.5 + rng.uniform(size=20000)).astype(np.float32)
    auc_d, ap_d, bd_d, bt_d = seg_metrics_device(x, y)
    assert auc_d == pytest.approx(roc_auc_score(y, x), abs=1e-5)
    assert ap_d == pytest.approx(average_precision_score(y, x), abs=1e-5)
    bd_h, bt_h = find_best_val(x, y, val_range=(0, float(x.max())), max_steps=10)
    assert bd_d == pytest.approx(bd_h, abs=1e-5)
    assert bt_d == pytest.approx(bt_h, abs=1e-5)


def test_seg_metrics_device_tie_groups_with_positives():
    """Regression: tied residual values whose tie group CONTAINS positives
    (the realistic post-erosion/median case: lesion voxels zeroed by the
    brain-mask erosion share the value 0 with background). The descending
    tie-group boundary must be the ascending-order group FIRST reversed —
    marking the group start instead silently broke sklearn AP parity and made
    the result depend on the unstable sort's within-tie permutation."""
    from sklearn.metrics import average_precision_score, roc_auc_score
    from conditioned_diffusion_models_uad_tpu.eval.metrics import (
        seg_metrics_device,
    )

    rng = np.random.default_rng(7)
    n = 40000
    y = rng.uniform(size=n) > 0.99
    x = (y * 0.4 + rng.uniform(size=n)).astype(np.float32)
    # a large zero tie-group holding 1% of the positives (eroded lesion rim)
    zeroed = rng.uniform(size=n) < 0.3
    x[zeroed] = 0.0
    # plus coarse quantization: every value ties with many others
    xq = np.round(x * 50.0).astype(np.float32) / 50.0
    for xs in (x, xq):
        auc_d, ap_d, _, _ = seg_metrics_device(xs, y)
        assert auc_d == pytest.approx(roc_auc_score(y, xs), abs=1e-5)
        assert ap_d == pytest.approx(average_precision_score(y, xs), abs=1e-5)


def test_full_resolution_evaluation_path():
    """resized_evaluation=False upsamples the model-res reconstruction onto
    the orig grid (align_corners=True trilinear, ref utils_eval.py:24-27)."""
    rng = np.random.default_rng(9)
    cfg = EvalConfig(resized_evaluation=False, erode_brainmask=False,
                     median_filtering=False)
    sess = EvalSession(cfg, "Brats21", "val")
    reco = rng.uniform(size=(24, 24, 8)).astype(np.float32)   # model res
    orig = rng.uniform(size=(48, 48, 16)).astype(np.float32)  # full res
    seg = np.zeros_like(orig); seg[10:20, 10:20, 4:12] = 1
    mask = np.ones_like(orig)
    sess.test_step(reco, orig, seg, mask, batch_idx=0, ID="v0", label_vol=1)
    d = sess.test_end()
    assert np.isfinite(d["AUCPerVolMean"])
    assert len(d["AnomalyScoreRecoPerVol"]) == 1


def test_resize_trilinear_align_corners():
    """align_corners=True: corners map exactly; a linear ramp stays linear."""
    from conditioned_diffusion_models_uad_tpu.eval.postprocess import resize_trilinear

    v = np.arange(4, dtype=np.float32)[:, None, None] * np.ones((4, 2, 2), np.float32)
    out = np.asarray(resize_trilinear(v, (7, 2, 2)))
    np.testing.assert_allclose(out[0, 0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[-1, 0, 0], 3.0, atol=1e-6)
    np.testing.assert_allclose(out[:, 0, 0], np.linspace(0, 3, 7), atol=1e-6)


def test_eval_session_concurrent_scoring_alignment():
    """test_step commits atomically: with concurrent scorer threads the
    per-volume rows stay aligned across the eval_dict lists."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(21)
    cfg = EvalConfig(erode_brainmask=False, median_filtering=False,
                     scorer_threads=4)
    sess = EvalSession(cfg, "Brats21", "val")

    def one(i):
        orig = rng.uniform(0.2, 1.0, size=(24, 24, 6)).astype(np.float32)
        seg = np.zeros_like(orig); seg[8:16, 8:16, 1:5] = 1
        reco = orig.copy(); reco[8:16, 8:16, 1:5] -= 0.1 * (i + 1)
        sess.test_step(reco, orig, seg, np.ones_like(orig), batch_idx=i, ID=f"v{i}", label_vol=1)

    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(one, range(8)))
    d = sess.test_end()
    assert len(d["IDs"]) == 8
    # commits are ordered by batch_idx: the pickled per-volume lists come out
    # in dataset order no matter which scorer thread finishes first
    assert d["IDs"] == [f"v{k}" for k in range(8)]
    # per-volume alignment: bigger injected residual -> bigger anomaly score;
    # check the ID ordering matches the score ordering
    order_by_score = [d["IDs"][k] for k in np.argsort(d["AnomalyScoreRecoPerVol"])]
    assert order_by_score == [f"v{k}" for k in range(8)]
    # every per-vol list has exactly one row per volume
    for k in ("DiceScorePerVol", "AUCPerVol", "HausPerVol", "labelPerVol"):
        assert len(d[k]) == 8, k


def test_eval_session_failed_volume_releases_commit_slot():
    """A test_step that raises must release its commit slot, or every later
    volume would wait on the ordered-commit turnstile forever."""
    rng = np.random.default_rng(3)
    cfg = EvalConfig(erode_brainmask=False, median_filtering=False)
    sess = EvalSession(cfg, "Brats21", "val")
    with pytest.raises(Exception):
        sess.test_step("not a volume", "nope", None, "nope", batch_idx=0, ID="v0", label_vol=1)
    orig = rng.uniform(0.2, 1.0, size=(24, 24, 6)).astype(np.float32)
    seg = np.zeros_like(orig); seg[8:16, 8:16, 1:5] = 1
    # volume 1 commits without deadlock even though volume 0 never did
    sess.test_step(orig * 0.9, orig, seg, np.ones_like(orig), batch_idx=1, ID="v1", label_vol=1)
    assert sess.eval_dict["IDs"] == ["v1"]
