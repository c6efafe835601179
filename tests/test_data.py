"""End-to-end data layer tests on synthetic NIfTI fixtures
(reference data layer: src/datamodules/*; SURVEY.md §4 synthetic-fixture
strategy)."""
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.data.datamodules import (
    ATLAS,
    Brats21,
    DataConfig,
    IXI,
    MSLUB,
    WMH,
    load_subject,
)
from conditioned_diffusion_models_uad_tpu.data.nifti import read_nifti, write_nifti
from conditioned_diffusion_models_uad_tpu.data.synthetic import (
    build_synthetic_root,
    make_volume,
)

SHAPE = (32, 32, 16)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    return build_synthetic_root(
        str(root), shape=SHAPE, n_train=3, n_val=2, n_test=2, n_eval=2,
        eval_sets=("Brats21", "MSLUB", "ATLAS", "WMH"),
    )


def _cfg(root):
    return DataConfig(
        data_dir=root, image_dim=(32, 32, 16), rescale_factor=2.0, batch_size=2,
        use_curvature_flow=True,
    )


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(7, 9, 11)).astype(np.float32)
    for name in ["a.nii", "a.nii.gz"]:
        p = str(tmp_path / name)
        write_nifti(p, vol, spacing=(1.0, 2.0, 3.0))
        back, hdr = read_nifti(p)
        np.testing.assert_allclose(back, vol, rtol=1e-6)
        assert hdr.shape == (7, 9, 11)
        assert hdr.spacing[:3] == (1.0, 2.0, 3.0)


def test_nifti_int_dtype_roundtrip(tmp_path):
    vol = (np.arange(24).reshape(2, 3, 4) % 5).astype(np.int16)
    p = str(tmp_path / "b.nii.gz")
    write_nifti(p, vol)
    back, _ = read_nifti(p)
    np.testing.assert_array_equal(back, vol.astype(np.float32))


def test_make_volume_lesions():
    rng = np.random.default_rng(1)
    vol, mask, seg = make_volume(rng, SHAPE, n_lesions=2)
    assert vol.shape == mask.shape == seg.shape == SHAPE
    assert seg.sum() > 0
    assert (seg * mask == seg).all()  # lesions inside the brain
    assert mask.sum() > 0.1 * np.prod(SHAPE)


def test_make_volume_lesion_modes():
    """hyper lesions are brighter than healthy brain, hypo darker (ATLAS-like
    T1 stroke contrast), midgray pinned at ~0.5 (the texture-anomaly mode the
    learning proof documents)."""
    rng = np.random.default_rng(2)
    means = {}
    for mode in ("hyper", "hypo", "midgray"):
        vol, mask, seg = make_volume(rng, SHAPE, n_lesions=2, lesion_mode=mode)
        assert seg.sum() > 0 and (seg * mask == seg).all()
        healthy = vol[(mask > 0) & (seg == 0)].mean()
        means[mode] = (vol[seg > 0].mean(), healthy)
    assert means["hyper"][0] > means["hyper"][1] + 0.2
    assert means["hypo"][0] < means["hypo"][1] - 0.2
    assert abs(means["midgray"][0] - 0.5) < 0.02


def test_load_subject_shapes(data_root):
    cfg = _cfg(data_root)
    ixi = IXI(cfg, fold=0)
    sub = load_subject(ixi.csv["train"].iloc[0], cfg, keep_orig=True)
    assert sub["vol"].shape == (16, 16, 8)  # /2 downsample
    assert sub["vol_orig"].shape == (16, 16, 8)  # resizedEvaluation -> also resampled
    # cubic B-spline resampling can ring slightly outside [0,1], exactly like
    # the reference's torchio bspline Resample (no clipping there either)
    assert -0.15 <= sub["vol"].min() and sub["vol"].max() <= 1.15
    assert sub["label"] == 0 and not sub["seg_available"]


def test_device_preprocess_matches_host(data_root):
    """preprocess_backend='device' (one fused jit, device-resident outputs)
    must reproduce the host path bit-for-bit-close: same op order, same
    transforms (create_dataset.py:196-258)."""
    import dataclasses as dc

    import jax

    cfg_h = _cfg(data_root)
    cfg_d = dc.replace(cfg_h, preprocess_backend="device")
    ixi = IXI(cfg_h, fold=0)
    for row in (ixi.csv["train"].iloc[0], ixi.csv["test"].iloc[0]):
        host = load_subject(row, cfg_h, keep_orig=True)
        dev = load_subject(row, cfg_d, keep_orig=True)
        assert isinstance(dev["vol"], jax.Array)
        for k in ("vol", "mask", "vol_orig", "mask_orig", "seg_orig"):
            np.testing.assert_allclose(
                np.asarray(dev[k]), np.asarray(host[k]), rtol=1e-5, atol=1e-5,
                err_msg=k,
            )
        assert dev["seg_available"] == host["seg_available"]
        assert ("seg" in dev) == ("seg" in host)


def test_device_preprocess_packed_labels_match_host(data_root, monkeypatch):
    """Binary uint8 masks/segs upload bit-packed (datamodules._maybe_packbits)
    and are unpacked inside the fused program — results identical to the
    host path. The size gate is lowered so the tiny fixture takes the packed
    route."""
    import dataclasses as dc

    import jax

    from conditioned_diffusion_models_uad_tpu.data import datamodules as dm

    monkeypatch.setattr(dm, "_PACKBITS_MIN_BYTES", 1)
    cfg_h = _cfg(data_root)
    cfg_d = dc.replace(cfg_h, preprocess_backend="device")
    mod = Brats21(cfg_h, fold=0)  # has both mask and seg files
    row = mod.csv["val"].iloc[0]
    host = load_subject(row, cfg_h, keep_orig=True)
    dev = load_subject(row, cfg_d, keep_orig=True)
    assert isinstance(dev["vol"], jax.Array)
    for k in ("vol", "mask", "vol_orig", "mask_orig", "seg_orig", "seg"):
        np.testing.assert_allclose(
            np.asarray(dev[k]), np.asarray(host[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )


def test_train_slice_source_epoch(data_root):
    cfg = _cfg(data_root)
    ixi = IXI(cfg, fold=0)
    src = ixi.train_slices()
    assert len(src) == 3
    rng = np.random.default_rng(0)
    batches = list(src.epoch_indices(rng))
    assert len(batches) == 1  # 3 subjects, bs 2, drop_last
    vol_idx, slice_idx = batches[0]
    x, m = src.gather(vol_idx, slice_idx)
    assert x.shape == (2, 16, 16, 1)
    assert m.shape == (2, 16, 16, 1)
    assert np.asarray(x).max() <= 1.15


def test_unique_slice_mode(data_root):
    cfg = _cfg(data_root)
    cfg.unique_slice = True
    cfg.drop_last = False
    ixi = IXI(cfg, fold=0)
    src = ixi.train_slices()
    rng = np.random.default_rng(0)
    for _, slice_idx in src.epoch_indices(rng):
        assert len(set(slice_idx.tolist())) == 1


def test_eval_modules(data_root):
    cfg = _cfg(data_root)
    for mod_cls, name in [(Brats21, "Brats21"), (MSLUB, "MSLUB"), (ATLAS, "ATLAS"), (WMH, "WMH")]:
        mod = mod_cls(cfg)
        ds = mod.val_eval()
        assert len(ds) == 2
        sub = ds[0]
        assert sub["Dataset"] == name and sub["stage"] == "val"
        assert sub["seg_available"]
        assert sub["seg_orig"].shape == sub["vol_orig"].shape
        assert sub["seg_orig"].sum() > 0
        assert sub["label"] == 1


def test_sample_set_subsetting(data_root):
    cfg = _cfg(data_root)
    cfg.sample_set = True
    mod = MSLUB(cfg)
    assert len(mod.val_eval()) <= 4


# --------------------------------------------------------------------------- #
# full augmentation family set (reference get_augment, create_dataset.py:220-251)
# --------------------------------------------------------------------------- #
def test_full_augment_batch_shapes_and_mask_binary():
    import jax
    import jax.numpy as jnp
    from conditioned_diffusion_models_uad_tpu.data.augment import (
        full_augment_batch,
        spatial_augment_batch,
    )

    k = jax.random.PRNGKey(0)
    vol = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 1))
    mask = (vol > 0.3).astype(jnp.float32)
    v2, m2 = full_augment_batch(k, vol, mask)
    assert v2.shape == vol.shape and m2.shape == mask.shape
    assert bool(jnp.isfinite(v2).all())
    # nearest-neighbor warping keeps the mask binary
    assert bool(jnp.all((m2 == 0) | (m2 == 1)))

    v3, m3 = spatial_augment_batch(jax.random.PRNGKey(2), vol, mask, p_flip=1.0,
                                   p_affine=0.0, p_elastic=0.0)
    # pure flip: values preserved, geometry mirrored
    assert bool(jnp.allclose(v3, vol[:, :, ::-1, :]))
    assert bool(jnp.allclose(m3, mask[:, :, ::-1, :]))


def test_vol2slice_windows_and_unique():
    """start_slice / seq_slices windows and unique_slice per batch
    (reference vol2slice, create_dataset.py:143-193)."""
    import numpy as np
    from conditioned_diffusion_models_uad_tpu.data.datamodules import (
        DataConfig,
        TrainSliceSource,
    )

    rng = np.random.default_rng(0)
    vols = rng.random((6, 8, 8, 20), dtype=np.float32)
    masks = np.ones_like(vols)

    # fixed single slice
    src = TrainSliceSource(vols, masks, DataConfig(batch_size=3, start_slice=7))
    for vi, si in src.epoch_indices(np.random.default_rng(1)):
        assert (si == 7).all()

    # sequential window [5, 9)
    src = TrainSliceSource(
        vols, masks, DataConfig(batch_size=3, start_slice=5, seq_slices=4)
    )
    for vi, si in src.epoch_indices(np.random.default_rng(1)):
        assert ((si >= 5) & (si < 9)).all()

    # unique_slice: one depth for the whole batch
    src = TrainSliceSource(
        vols, masks, DataConfig(batch_size=3, unique_slice=True)
    )
    for vi, si in src.epoch_indices(np.random.default_rng(1)):
        assert len(set(si.tolist())) == 1

    # drop_last=False keeps the remainder batch
    src = TrainSliceSource(
        vols, masks, DataConfig(batch_size=4, drop_last=False)
    )
    sizes = [len(vi) for vi, _ in src.epoch_indices(np.random.default_rng(1))]
    assert sizes == [4, 2]


def test_make_noise_fn_gaussian_and_table():
    import jax
    from conditioned_diffusion_models_uad_tpu.ops.simplex import make_noise_fn

    g = make_noise_fn(None)(jax.random.PRNGKey(0), (2, 16, 16, 1))
    assert g.shape == (2, 16, 16, 1)
    s = make_noise_fn("simplex", impl="table")(jax.random.PRNGKey(0), (2, 16, 16, 1))
    import numpy as np

    assert np.allclose(np.asarray(s[0]), np.asarray(s[1]))  # broadcast field


def test_nifti_scl_inter_with_unit_slope(tmp_path):
    """scl_inter applies even when scl_slope == 1 (NIfTI spec; native parity)."""
    import struct
    from conditioned_diffusion_models_uad_tpu.data import nifti as pynifti

    p = str(tmp_path / "s.nii")
    vol = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    pynifti.write_nifti(p, vol)
    raw = bytearray(open(p, "rb").read())
    raw[112:116] = struct.pack("<f", 1.0)   # scl_slope
    raw[116:120] = struct.pack("<f", 10.0)  # scl_inter
    open(p, "wb").write(bytes(raw))
    out, _ = pynifti.read_nifti(p)
    np.testing.assert_allclose(out, vol + 10.0)


def test_device_train_pool_matches_host(data_root):
    """preprocess_backend='device' now also ingests the TRAIN pool (raw-dtype
    uploads + on-device preprocessing, stacked on device — no host stack, no
    D2H): the resulting TrainSliceSource volumes/masks must match the host
    pipeline's, and the source must drive a normal epoch."""
    import dataclasses as dc

    import jax

    cfg_h = _cfg(data_root)
    cfg_d = dc.replace(cfg_h, preprocess_backend="device")
    src_h = IXI(cfg_h, fold=0).train_slices()
    src_d = IXI(cfg_d, fold=0).train_slices()
    assert isinstance(src_d.vols, jax.Array)
    np.testing.assert_allclose(
        np.asarray(src_d.vols), np.asarray(src_h.vols), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(src_d.masks), np.asarray(src_h.masks), rtol=1e-5, atol=1e-5
    )
    rng = np.random.default_rng(0)
    vi, si = next(iter(src_d.epoch_indices(rng)))
    v, m = src_d.gather(vi, si)
    assert np.isfinite(np.asarray(v)).all()
