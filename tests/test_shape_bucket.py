"""Shape-bucketed device preprocessing (`datamodule.shape_bucket`).

Real eval datasets have heterogeneous raw NIfTI shapes; the fused device
preprocess program is traced per input shape, so without bucketing every new
shape costs a (remote) XLA compile. With `shape_bucket=B` raw arrays are
end-padded to bucket multiples and the true extent rides along as a traced
scalar — these tests pin the invariant that makes that safe: results are
IDENTICAL to the unbucketed path (extent-aware curvature flow, dynamic
tio-CropOrPad split), and distinct raw shapes inside one bucket share one
compiled program.
"""
import dataclasses as dc

import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.data.datamodules import (
    Brats21,
    DataConfig,
    load_subject,
)
from conditioned_diffusion_models_uad_tpu.data.synthetic import build_synthetic_root
from conditioned_diffusion_models_uad_tpu.data.transforms import (
    crop_or_pad,
    crop_or_pad_dynamic,
    curvature_flow,
)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketdata")
    return build_synthetic_root(
        str(root), shape=(34, 30, 18), n_train=1, n_val=1, n_test=1, n_eval=1
    )


@pytest.mark.parametrize(
    "true_shape,target",
    [
        ((20, 33, 9), (16, 16, 12)),   # crop, crop-odd, pad-odd
        ((7, 8, 31), (16, 16, 12)),    # pad, pad, crop
        ((16, 16, 12), (16, 16, 12)),  # exact
        ((17, 15, 13), (16, 16, 12)),  # off-by-one each way
    ],
)
def test_crop_or_pad_dynamic_matches_static(true_shape, target):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    vol = rng.normal(size=true_shape).astype(np.float32)
    want = crop_or_pad(vol, target)

    bucket_shape = tuple(-(-s // 8) * 8 for s in true_shape)
    padded = np.zeros(bucket_shape, np.float32)
    padded[tuple(slice(0, s) for s in true_shape)] = vol
    got = np.asarray(
        crop_or_pad_dynamic(
            jnp.asarray(padded), jnp.asarray(true_shape, jnp.int32), target
        )
    )
    np.testing.assert_array_equal(got, want)


def test_crop_or_pad_dynamic_fuzz():
    """Randomized extents/targets (crop & pad mixed per axis, extent equal to
    or far from the bucket boundary) against the static reference."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for _ in range(20):
        true_shape = tuple(int(rng.integers(3, 40)) for _ in range(3))
        target = tuple(int(rng.integers(3, 40)) for _ in range(3))
        vol = rng.normal(size=true_shape).astype(np.float32)
        want = crop_or_pad(vol, target)
        bucket = int(rng.choice([4, 8, 16]))
        padded = np.zeros(
            tuple(-(-s // bucket) * bucket for s in true_shape), np.float32
        )
        padded[tuple(slice(0, s) for s in true_shape)] = vol
        got = np.asarray(
            crop_or_pad_dynamic(
                jnp.asarray(padded), jnp.asarray(true_shape, jnp.int32), target
            )
        )
        np.testing.assert_array_equal(
            got, want, err_msg=f"{true_shape} -> {target} bucket {bucket}"
        )


def test_curvature_flow_extent_aware_matches_plain():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    true_shape = (19, 23, 11)
    vol = rng.normal(size=true_shape).astype(np.float32)
    want = np.asarray(curvature_flow(jnp.asarray(vol)))

    padded = np.zeros((24, 24, 16), np.float32)
    padded[: true_shape[0], : true_shape[1], : true_shape[2]] = vol
    got = np.asarray(
        curvature_flow(
            jnp.asarray(padded), ext=jnp.asarray(true_shape, jnp.int32)
        )
    )
    np.testing.assert_allclose(
        got[: true_shape[0], : true_shape[1], : true_shape[2]], want,
        atol=1e-6, rtol=1e-6,
    )
    # beyond the true extent the result is zero (pad semantics preserved)
    assert np.abs(got[true_shape[0]:]).max() == 0.0
    assert np.abs(got[:, true_shape[1]:]).max() == 0.0
    assert np.abs(got[:, :, true_shape[2]:]).max() == 0.0


def test_bucketed_device_preprocess_matches_unbucketed(data_root, monkeypatch):
    """shape_bucket on/off must agree on every output (vol/mask/seg and the
    *_orig copies), incl. the bit-packed label route — the raw fixture shape
    (34,30,18) is NOT a multiple of the bucket, so real padding happens."""
    import jax

    from conditioned_diffusion_models_uad_tpu.data import datamodules as dm

    monkeypatch.setattr(dm, "_PACKBITS_MIN_BYTES", 1)
    cfg = DataConfig(
        data_dir=data_root, image_dim=(32, 32, 16), rescale_factor=2.0,
        batch_size=2, use_curvature_flow=True, preprocess_backend="device",
    )
    cfg_b = dc.replace(cfg, shape_bucket=16)
    mod = Brats21(cfg, fold=0)  # has both mask and seg files
    row = mod.csv["val"].iloc[0]
    plain = load_subject(row, cfg, keep_orig=True)
    bucketed = load_subject(row, cfg_b, keep_orig=True)
    assert isinstance(bucketed["vol"], jax.Array)
    for k in ("vol", "mask", "seg", "vol_orig", "mask_orig", "seg_orig"):
        np.testing.assert_allclose(
            np.asarray(bucketed[k]), np.asarray(plain[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


@pytest.mark.parametrize("use_cf", [False, True])
def test_bucketed_matches_unbucketed_with_scl_inter(tmp_path, use_cf):
    """scl_inter != 0 regression: bucket padding is zeros in STORED units, so
    the device-side `x*slope + inter` fold turns the padded margin into
    `inter` — which must be re-zeroed before crop_or_pad_dynamic / the derived
    `(vol > 0)` mask consume it (advisor r2, datamodules._ingest). int16
    payload with slope=0.02, inter=-3.0; raw shape NOT a bucket multiple; the
    use_cf=False leg exercises the derived-mask route directly. inter is
    POSITIVE: the rescale clip hides a negative-inter margin (it maps below
    p_low either way), while a positive margin flips the derived mask to 1
    there and leaks through crop_or_pad_dynamic unclipped."""
    from conditioned_diffusion_models_uad_tpu.data import datamodules as dm
    from conditioned_diffusion_models_uad_tpu.data.nifti import write_nifti

    rng = np.random.default_rng(11)
    true_shape = (34, 30, 18)
    stored = rng.integers(0, 2000, size=true_shape).astype(np.int16)
    stored[:3] = 0  # keep a genuinely empty margin so the mask is non-trivial
    p = str(tmp_path / "scaled.nii.gz")
    write_nifti(p, stored, slope=0.02, inter=3.0)
    row = {"img_path": p, "img_name": "scaled"}

    cfg = DataConfig(
        data_dir=str(tmp_path), image_dim=(32, 32, 16), rescale_factor=2.0,
        batch_size=2, use_curvature_flow=use_cf, preprocess_backend="device",
    )
    plain = dm._load_subject_device(row, cfg, keep_orig=True)
    bucketed = dm._load_subject_device(
        row, dc.replace(cfg, shape_bucket=16), keep_orig=True
    )
    for k in ("vol", "mask", "vol_orig", "mask_orig"):
        np.testing.assert_allclose(
            np.asarray(bucketed[k]), np.asarray(plain[k]),
            rtol=1e-5, atol=1e-5, err_msg=f"{k} use_cf={use_cf}",
        )


def test_bucketed_shapes_share_one_compile(data_root, tmp_path):
    """Two raw shapes inside the same bucket triple -> ONE traced program."""
    from conditioned_diffusion_models_uad_tpu.data import datamodules as dm
    from conditioned_diffusion_models_uad_tpu.data.nifti import write_nifti
    from conditioned_diffusion_models_uad_tpu.data.synthetic import make_volume

    cfg = DataConfig(
        data_dir=data_root, image_dim=(32, 32, 16), rescale_factor=2.0,
        batch_size=2, use_curvature_flow=True, preprocess_backend="device",
        shape_bucket=16,
    )
    rng = np.random.default_rng(3)
    rows = []
    for i, shape in enumerate([(34, 30, 18), (42, 27, 20)]):  # both -> (48,32,32)
        vol, _, _ = make_volume(rng, shape)
        p = str(tmp_path / f"v{i}.nii.gz")
        write_nifti(p, vol.astype(np.float32))
        rows.append({"img_path": p, "img_name": f"v{i}"})

    before = dm._preprocess_subject_fused._cache_size()
    a = dm._load_subject_device(rows[0], cfg, keep_orig=False)
    mid = dm._preprocess_subject_fused._cache_size()
    b = dm._load_subject_device(rows[1], cfg, keep_orig=False)
    after = dm._preprocess_subject_fused._cache_size()
    assert np.isfinite(np.asarray(a["vol"])).all()
    assert np.isfinite(np.asarray(b["vol"])).all()
    assert mid == before + 1
    assert after == mid  # second shape reused the bucketed program
