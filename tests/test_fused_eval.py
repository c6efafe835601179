"""Parity of the ONE-dispatch fused per-volume eval program vs the host path.

The fused program (eval/fused.py) collapses the per-volume scoring into a
single device dispatch with ONE packed fetch; every eval_dict row it
produces must match the host/sklearn path (the reference-shaped
implementation of utils_eval.py:18-194) on the same inputs.
"""
import numpy as np
import pytest

import conditioned_diffusion_models_uad_tpu.eval.harness as H
from conditioned_diffusion_models_uad_tpu.eval.harness import EvalConfig, EvalSession


def _volume(rng, shape=(64, 64, 30)):
    vol = rng.random(shape, np.float32)
    reco = np.clip(vol + 0.15 * rng.standard_normal(shape).astype(np.float32), 0, 1)
    seg = np.zeros(shape, np.float32)
    seg[20:34, 18:30, 8:20] = 1.0
    mask = np.zeros(shape, np.float32)
    mask[4:60, 4:60, :] = 1.0
    return vol, reco, seg, mask


def _run_session(monkeypatch, fused: bool, stage: str, val_threshold=None,
                 dataset="Brats21", **cfg_kw):
    rng = np.random.default_rng(7)
    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 100_000 if fused else 10**12)
    cfg = EvalConfig(**cfg_kw)
    sess = EvalSession(cfg, dataset, stage, threshold=val_threshold)
    for i in range(2):
        vol, reco, seg, mask = _volume(rng)
        sess.test_step(reco, vol, seg, mask, batch_idx=i, ID=f"id{i}", label_vol=1)
    sess.test_end()
    return sess


COMPARE_KEYS = (
    "l1recoErrorAll", "l2recoErrorAll", "l1recoErrorUnhealthy",
    "l1recoErrorHealthy", "AUCPerVol", "AUPRCPerVol", "BestDicePerVol",
    "BestThresholdPerVol", "DiceScorePerVol", "TPPerVol", "FPPerVol",
    "TNPerVol", "FNPerVol", "TPRPerVol", "FPRPerVol", "PrecisionPerVol",
    "RecallPerVol", "SpecificityPerVol", "AccuracyPerVol", "HausPerVol",
    "lesionSizePerVol", "DiceScorePerSlice", "PrecisionPerSlice",
    "RecallPerSlice", "lesionSizePerSlice", "AnomalyScoreRecoPerSlice",
    "labelPerSlice", "AUCAnomalyRecoPerSlice", "AUPRCAnomalyRecoPerSlice",
    "AnomalyScoreRecoPerVol", "labelPerVol",
)


def test_packed_thresholded_roundtrip():
    # odd total size: the last byte carries padding bits that must be dropped
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.eval.fused import unpack_thresholded

    rng = np.random.default_rng(3)
    m = rng.random((33, 41, 17)) > 0.7
    packed = jnp.packbits(jnp.asarray(m).ravel())
    assert packed.size == (m.size + 7) // 8  # 1 bit/voxel on the wire
    out = unpack_thresholded(packed, m.shape)
    assert out.dtype == bool and (out == m).all()


@pytest.mark.parametrize(
    "cc_backend,hausdorff_backend",
    [("host", "host"), ("device", "host"), ("host", "device"),
     ("device", "device")],  # the last runs Hausdorff INSIDE the fused program
)
@pytest.mark.parametrize("stage", ["val", "test"])
def test_fused_matches_host_path(monkeypatch, stage, cc_backend,
                                 hausdorff_backend):
    threshold = {"total": 0.21} if stage == "test" else None
    a = _run_session(monkeypatch, fused=False, stage=stage, val_threshold=threshold)
    b = _run_session(monkeypatch, fused=True, stage=stage, val_threshold=threshold,
                     cc_backend=cc_backend, hausdorff_backend=hausdorff_backend)
    for k in COMPARE_KEYS:
        va = np.asarray(a.eval_dict[k], np.float64)
        vb = np.asarray(b.eval_dict[k], np.float64)
        assert va.shape == vb.shape, k
        np.testing.assert_allclose(va, vb, rtol=1e-4, atol=1e-6, err_msg=k)
    if stage == "val":
        # device-pooled global threshold fit matches the host pooled fit
        assert a.threshold and b.threshold
        np.testing.assert_allclose(
            a.threshold["total"], b.threshold["total"], rtol=1e-4
        )


def test_hist_pool_matches_exact_fit():
    """The bounded histogram pool's best-dice threshold must agree with the
    exact concatenated-pool fit to bin resolution."""
    import conditioned_diffusion_models_uad_tpu.eval.metrics as M

    rng = np.random.default_rng(11)
    diffs = rng.random(200_000).astype(np.float32) * 0.6
    segs = (diffs + 0.12 * rng.standard_normal(diffs.shape) > 0.45)
    hp, hn = M.hist_pool_init()
    hp, hn = M.hist_pool_update(hp, hn, diffs[:90_000], segs[:90_000])
    hp, hn = M.hist_pool_update(hp, hn, diffs[90_000:], segs[90_000:])
    bd_h, bt_h = M.find_best_val_hist(hp, hn)
    # exact best over every candidate threshold (the histogram argmax is a
    # refinement of the greedy search, so compare against brute force)
    order = np.argsort(diffs)[::-1]
    tp = np.cumsum(segs[order]); fp = np.cumsum(~segs[order])
    dice = 2 * tp / (tp + fp + segs.sum())
    assert abs(bd_h - dice.max()) < 1e-3
    # the returned threshold must ACHIEVE (near-)max dice — near-ties can put
    # it at a different position than the brute-force argmax
    pred = diffs > bt_h
    tp_h = (pred & segs).sum(); fp_h = (pred & ~segs).sum()
    dice_h = 2 * tp_h / (tp_h + fp_h + segs.sum())
    assert dice.max() - dice_h < 1e-3


def test_hist_pool_budget_switch(monkeypatch):
    """pool_device_budget_mb=0 forces histogram pooling from the first
    volume; the fitted val threshold must stay close to the exact path's."""
    a = _run_session(monkeypatch, fused=True, stage="val")
    b = _run_session(monkeypatch, fused=True, stage="val",
                     pool_device_budget_mb=0)
    assert b._hist is not None and not b._diffs_list
    # the two methods may pick different thresholds on a flat dice curve;
    # the histogram argmax must achieve at least the greedy search's POOLED
    # dice (it is a strict refinement of the 10-step quartile search)
    diffs = np.concatenate([np.asarray(x) for x in a._diffs_list])
    segs = np.concatenate([np.asarray(x) for x in a._seg_list]).astype(bool)

    def pooled_dice(t):
        pred = diffs > t
        tp = (pred & segs).sum()
        fp = (pred & ~segs).sum()
        return 2 * tp / (tp + fp + segs.sum())

    assert pooled_dice(b.threshold["total"]) >= pooled_dice(
        a.threshold["total"]
    ) - 1e-3
    # per-volume metrics are independent of the pooling method
    assert b.eval_dict["DicePerVolMean"] == a.eval_dict["DicePerVolMean"]


def test_hist_pool_healthy_quantiles(monkeypatch):
    a = _run_session(monkeypatch, fused=True, stage="val", dataset="IXI")
    b = _run_session(monkeypatch, fused=True, stage="val", dataset="IXI",
                     pool_device_budget_mb=0)
    for k in ("t_1p", "t_5p", "t_10p"):
        np.testing.assert_allclose(
            b.eval_dict[k], a.eval_dict[k], rtol=0.02, atol=1e-4, err_msg=k
        )


def test_fused_healthy_set_quantiles(monkeypatch):
    a = _run_session(monkeypatch, fused=False, stage="val", dataset="IXI")
    b = _run_session(monkeypatch, fused=True, stage="val", dataset="IXI")
    for k in ("t_1p", "t_5p", "t_10p"):
        np.testing.assert_allclose(
            a.eval_dict[k], b.eval_dict[k], rtol=1e-3, err_msg=k
        )
    # healthy sets produce no seg metrics on either path
    assert a.eval_dict["AUCPerVol"] == [] and b.eval_dict["AUCPerVol"] == []


def test_fused_aux_through_packed_fetch(monkeypatch):
    """aux loss/latent ride the single packed buffer: the fused path must
    record the same latentSpace / AnomalyScoreRegPerVol values as the host
    path given device-scalar aux inputs."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    vol, reco, seg, mask = _volume(rng)
    latent = np.linspace(-1, 1, 24).astype(np.float32)
    runs = {}
    for fused in (False, True):
        monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 100_000 if fused else 10**12)
        sess = EvalSession(EvalConfig(), "Brats21", "val")
        aux = {"loss": jnp.float32(0.375), "latent": jnp.asarray(latent),
               "score_fn": None}
        sess.test_step(reco, vol, seg, mask, batch_idx=0, ID="id0", label_vol=1, aux=aux)
        runs[fused] = sess.eval_dict
    for d in runs.values():
        assert d["AnomalyScoreRegPerVol"] == [0.375]
        np.testing.assert_allclose(d["latentSpace"][0], latent, rtol=1e-6)
    np.testing.assert_allclose(
        runs[True]["AnomalyScoreRecoPerVol"], runs[False]["AnomalyScoreRecoPerVol"],
        rtol=1e-5,
    )


def test_fused_device_resident_seg(monkeypatch):
    """preprocess_backend='device' hands the harness a device-resident seg:
    it must come back inside the same packed fetch (pack_seg) and reproduce
    the host-array results."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    vol, reco, seg, mask = _volume(rng)
    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 100_000)
    results = {}
    for name, seg_in in (("host", seg), ("device", jnp.asarray(seg))):
        sess = EvalSession(EvalConfig(cc_backend="device",
                                      hausdorff_backend="device"),
                           "Brats21", "val")
        sess.test_step(reco, vol, seg_in, mask, batch_idx=0, ID="id0", label_vol=1)
        results[name] = sess.eval_dict
    for k in ("DiceScorePerVol", "TPPerVol", "FPPerVol", "HausPerVol",
              "PrecisionPerVol", "RecallPerVol"):
        np.testing.assert_allclose(
            np.asarray(results["host"][k], np.float64),
            np.asarray(results["device"][k], np.float64),
            rtol=1e-6, err_msg=k,
        )


def test_full_device_path_fetches_no_maps(monkeypatch):
    """cc_backend=device + hausdorff_backend=device: every map consumer runs
    in-program, so the packed buffer must shrink to the scalar/per-slice/
    latent block — no bit-packed volumes on the D2H link at all."""
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.eval import fused as F

    rng = np.random.default_rng(13)
    vol, reco, seg, mask = _volume(rng)
    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 100_000)

    sizes = []
    orig_parse = F.parse_packed

    def spy(buf, shape, latent_len, pack_seg, pack_maps=True):
        sizes.append((int(np.asarray(buf).size), pack_maps))
        return orig_parse(buf, shape, latent_len, pack_seg, pack_maps)

    monkeypatch.setattr(H, "parse_packed", spy)
    sess = EvalSession(
        EvalConfig(cc_backend="device", hausdorff_backend="device"),
        "Brats21", "val",
    )
    sess.test_step(reco, vol, jnp.asarray(seg), mask, batch_idx=0, ID="id0", label_vol=1)

    d = vol.shape[-1]
    expect = F.N_SCALARS * 4 + d * 5 * 4  # no latent, no maps
    assert sizes == [(expect, False)]
    # the confusion-count scalars replaced the host-side map metrics
    assert sess.eval_dict["TPPerVol"][0] > 0
    assert np.isfinite(sess.eval_dict["DiceScorePerVol"][0])


def test_fused_fixed_threshold(monkeypatch):
    a = _run_session(monkeypatch, fused=False, stage="val", threshold=0.3)
    b = _run_session(monkeypatch, fused=True, stage="val", threshold=0.3)
    for k in ("DiceScorePerVol", "TPPerVol", "BestThresholdPerVol"):
        np.testing.assert_allclose(
            np.asarray(a.eval_dict[k], np.float64),
            np.asarray(b.eval_dict[k], np.float64), rtol=1e-4, err_msg=k,
        )


def test_empty_seg_reco_errors_are_nan_and_excluded(monkeypatch):
    """Reference parity for empty/full seg selections (utils_eval.py:38-49):
    `l1_loss(x[seg > 0], …)` over zero elements is NaN, and the nanmean
    aggregation (utils_eval.py:196-256) then EXCLUDES those volumes. A 0.0
    placeholder would drag healthy-set Unhealthy means to zero instead."""
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.eval.postprocess import reco_errors

    rng = np.random.default_rng(21)
    vol, reco, seg, mask = _volume(rng)

    # unit level: empty seg -> Unhealthy NaN; full seg -> Healthy NaN
    e = {k: float(v) for k, v in reco_errors(
        jnp.asarray(vol), jnp.asarray(reco), jnp.zeros_like(jnp.asarray(seg))
    ).items()}
    assert np.isnan(e["l1recoErrorUnhealthy"]) and np.isnan(e["l2recoErrorUnhealthy"])
    assert np.isfinite(e["l1recoErrorHealthy"])
    np.testing.assert_allclose(e["l1recoErrorHealthy"], e["l1recoErrorAll"], rtol=1e-6)
    f = {k: float(v) for k, v in reco_errors(
        jnp.asarray(vol), jnp.asarray(reco), jnp.ones_like(jnp.asarray(seg))
    ).items()}
    assert np.isnan(f["l1recoErrorHealthy"]) and np.isfinite(f["l1recoErrorUnhealthy"])

    # session level, host AND fused paths: one lesioned volume + one volume
    # with an all-empty seg; the aggregate Unhealthy mean must equal the
    # lesioned volume's value alone (reference exclusion semantics)
    for fused in (False, True):
        monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 100_000 if fused else 10**12)
        sess = EvalSession(EvalConfig(), "Brats21", "val")
        sess.test_step(reco, vol, seg, mask, batch_idx=0, ID="les", label_vol=1)
        sess.test_step(reco, vol, np.zeros_like(seg), mask, batch_idx=1,
                       ID="empty", label_vol=0)
        sess.test_end()
        d = sess.eval_dict
        vals = np.asarray(d["l1recoErrorUnhealthy"], np.float64)
        assert np.isfinite(vals[0]) and np.isnan(vals[1]), fused
        np.testing.assert_allclose(
            d["l1recoErrorUnhealthyMean"], vals[0], rtol=1e-6,
            err_msg=f"fused={fused}",
        )

    # healthy-set volume (seg=None, the IXI case): Unhealthy mean is NaN on
    # both paths, Healthy mean finite
    for fused in (False, True):
        monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 100_000 if fused else 10**12)
        sess = EvalSession(EvalConfig(), "IXI", "val")
        sess.test_step(reco, vol, None, mask, batch_idx=0, ID="h", label_vol=0)
        sess.test_end()
        assert np.isnan(sess.eval_dict["l1recoErrorUnhealthyMean"]), fused
        assert np.isfinite(sess.eval_dict["l1recoErrorHealthyMean"]), fused
