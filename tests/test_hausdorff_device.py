"""Device-side exact Hausdorff (eval/hausdorff.py) vs the scipy-based host
metric. Squared distances are integer-exact in f32, so the two must agree to
float tolerance on every input, including the nan conventions."""
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.eval.hausdorff import (
    hausdorff_distance_device,
    hausdorff_sq_pair,
)
from conditioned_diffusion_models_uad_tpu.eval.metrics import hausdorff_distance


def _rand_mask(rng, shape, density):
    return rng.random(shape) < density


@pytest.mark.parametrize("density", [0.02, 0.15, 0.5])
def test_matches_host_metric(density):
    rng = np.random.default_rng(int(density * 1000))
    shape = (22, 27, 14)
    pred = _rand_mask(rng, shape, density)
    target = _rand_mask(rng, shape, density)
    got = hausdorff_distance_device(pred, target)
    want = hausdorff_distance(pred, target)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_single_voxels_exact():
    shape = (20, 20, 20)
    pred = np.zeros(shape, bool)
    target = np.zeros(shape, bool)
    pred[2, 3, 4] = True
    target[10, 15, 9] = True
    want = np.sqrt(8**2 + 12**2 + 5**2)
    np.testing.assert_allclose(hausdorff_distance_device(pred, target), want)
    np.testing.assert_allclose(hausdorff_distance(pred, target), want)


def test_identical_masks_zero():
    rng = np.random.default_rng(4)
    m = _rand_mask(rng, (22, 27, 14), 0.2)
    m[0, 0, 0] = True  # non-empty
    assert hausdorff_distance_device(m, m) == 0.0


def test_empty_masks_nan():
    shape = (22, 27, 14)
    full = np.ones(shape, bool)
    empty = np.zeros(shape, bool)
    assert np.isnan(hausdorff_distance_device(empty, full))
    assert np.isnan(hausdorff_distance_device(full, empty))
    assert np.isnan(hausdorff_distance_device(empty, empty))


def test_asymmetric_directed_distances():
    # a big blob vs a tiny inner blob: the two directed distances differ;
    # the symmetric metric is their max
    shape = (22, 27, 14)
    big = np.zeros(shape, bool)
    big[2:20, 2:25, 2:12] = True
    small = np.zeros(shape, bool)
    small[10:12, 12:14, 6:8] = True
    d_pt, d_tp = hausdorff_sq_pair(big, small)
    assert float(d_pt) != float(d_tp)
    np.testing.assert_allclose(
        hausdorff_distance_device(big, small),
        hausdorff_distance(big, small), rtol=1e-6,
    )


def test_eval_session_hausdorff_backend(monkeypatch):
    """The fused eval path with hausdorff_backend=device produces the same
    HausPerVol values as the host backend."""
    import conditioned_diffusion_models_uad_tpu.eval.harness as H
    from conditioned_diffusion_models_uad_tpu.eval.harness import (
        EvalConfig, EvalSession,
    )

    monkeypatch.setattr(H, "FUSED_MIN_VOXELS", 100_000)
    rng = np.random.default_rng(7)
    out = {}
    for backend in ("host", "device"):
        cfg = EvalConfig(hausdorff_backend=backend)
        sess = EvalSession(cfg, "Brats21", "val")
        r = np.random.default_rng(7)
        vol = r.random((64, 64, 30), np.float32)
        reco = np.clip(vol + 0.15 * r.standard_normal(vol.shape).astype(
            np.float32), 0, 1)
        seg = np.zeros_like(vol)
        seg[20:34, 18:30, 8:20] = 1.0
        mask = np.ones_like(vol)
        sess.test_step(reco, vol, seg, mask, batch_idx=0, ID="id0", label_vol=1)
        out[backend] = sess.eval_dict["HausPerVol"][0]
    np.testing.assert_allclose(out["device"], out["host"], rtol=1e-6)