"""Offline preprocessing pipeline tests (reference prepare_*.sh stages:
resample/skull-strip/register/N4/crop, SURVEY.md §2.2)."""
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.data.preprocessing import (
    DATASET_STAGES,
    PrepareConfig,
    affine_register,
    apply_affine,
    crop_to_brain_bbox,
    extract_brain_mask,
    n4_bias_correct,
    prepare_subject,
    resample_iso,
)
from conditioned_diffusion_models_uad_tpu.data.synthetic import make_volume
from conditioned_diffusion_models_uad_tpu.data.nifti import write_nifti


@pytest.fixture(scope="module")
def brainish():
    rng = np.random.default_rng(0)
    vol, mask, _ = make_volume(rng, (48, 48, 32), n_lesions=0)
    return vol, mask


def test_resample_iso_shapes():
    v = np.ones((20, 20, 10), np.float32)
    out = resample_iso(v, spacing=(2.0, 2.0, 4.0), target=1.0)
    assert out.shape == (40, 40, 40)
    lab = resample_iso((v > 0).astype(np.float32), (2.0, 2.0, 4.0), 1.0, "nearest")
    assert set(np.unique(lab)) <= {0.0, 1.0}


def test_extract_brain_mask_covers_brain(brainish):
    vol, mask = brainish
    est = extract_brain_mask(vol)
    inter = np.logical_and(est > 0, mask > 0).sum()
    dice = 2 * inter / (est.sum() + mask.sum())
    assert dice > 0.7  # classical stand-in: approximate but usable


def test_crop_to_brain_bbox(brainish):
    vol, mask = brainish
    (v2,), m2 = crop_to_brain_bbox([vol], mask, margin=1)
    assert v2.shape == m2.shape
    assert all(a <= b for a, b in zip(v2.shape, vol.shape))
    assert m2.sum() == mask.sum()  # nothing of the brain lost


def test_n4_bias_correct_removes_smooth_field(brainish):
    vol, mask = brainish
    # apply a strong smooth multiplicative bias
    d, h, w = vol.shape
    gz = np.linspace(-1, 1, d)[:, None, None]
    gy = np.linspace(-1, 1, h)[None, :, None]
    bias = np.exp(0.8 * gz + 0.5 * gy)
    biased = (vol * bias).astype(np.float32)
    corrected, field = n4_bias_correct(biased, mask, order=3, iters=4)
    m = mask > 0
    # coefficient of variation inside the brain should drop toward the clean one
    cv = lambda x: x[m].std() / (x[m].mean() + 1e-8)
    assert cv(corrected) < cv(biased)
    err_before = np.abs(biased - vol)[m].mean()
    # compare up to a global scale (bias correction fixes shape, not level)
    scale = vol[m].mean() / corrected[m].mean()
    err_after = np.abs(corrected * scale - vol)[m].mean()
    assert err_after < err_before * 0.7


def test_affine_register_recovers_translation(brainish):
    vol, _ = brainish
    moved = np.roll(vol, shift=(3, -2, 0), axis=(0, 1, 2))
    warped, params = affine_register(vol, moved, iters_per_level=120, levels=(2, 1))
    before = np.mean((moved - vol) ** 2)
    after = np.mean((warped - vol) ** 2)
    assert after < before * 0.5
    # the same transform applies to companion volumes
    seg_w = apply_affine(moved, params, vol.shape, order=0)
    assert seg_w.shape == vol.shape


def test_prepare_subject_pipeline(tmp_path, brainish):
    vol, mask = brainish
    img = str(tmp_path / "sub-01.nii.gz")
    write_nifti(img, vol.astype(np.float32), spacing=(2.0, 2.0, 2.0))
    out = prepare_subject(
        img, str(tmp_path / "out"), DATASET_STAGES["IXI"]
    )
    from conditioned_diffusion_models_uad_tpu.data.nifti import read_nifti

    v2, _ = read_nifti(out["img"])
    m2, _ = read_nifti(out["mask"])
    assert v2.shape == m2.shape
    assert v2.ndim == 3 and m2.max() == 1.0
    # resampled 2mm -> 1mm before cropping: volume grew then cropped to brain
    assert np.isfinite(v2).all()


def test_prepare_brats_skips_resample(tmp_path, brainish):
    vol, mask = brainish
    img = str(tmp_path / "BraTS2021_00000_t1.nii.gz")
    write_nifti(img, (vol * mask).astype(np.float32))
    seg = str(tmp_path / "BraTS2021_00000_seg.nii.gz")
    write_nifti(seg, (mask * (vol > 0.5)).astype(np.float32))
    out = prepare_subject(
        img, str(tmp_path / "out"), DATASET_STAGES["Brats21"], seg_path=seg
    )
    assert "seg" in out
