"""Native C++ NIfTI IO tests: build, read/write round-trips, parity with the
pure-Python parser, and the threaded prefetch loader."""
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.native.binding import (
    PrefetchLoader,
    native_available,
    read_nifti_native,
    write_nifti_native,
)
from conditioned_diffusion_models_uad_tpu.data import nifti as pynifti

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library failed to build"
)


def test_roundtrip_native(tmp_path):
    vol = np.random.default_rng(0).random((17, 23, 9)).astype(np.float32)
    for name in ("a.nii", "a.nii.gz"):
        p = str(tmp_path / name)
        write_nifti_native(p, vol, spacing=(1.5, 2.0, 2.5))
        out, spacing = read_nifti_native(p)
        np.testing.assert_allclose(out, vol, rtol=1e-6)
        assert spacing == (1.5, 2.0, 2.5)


def test_parity_with_python_parser(tmp_path):
    """Native reader must agree with the pure-Python parser on files written
    by either writer, across dtypes."""
    rng = np.random.default_rng(1)
    p1 = str(tmp_path / "py.nii.gz")
    vol = (rng.random((12, 10, 8)) * 100).astype(np.float32)
    pynifti.write_nifti(p1, vol, spacing=(2.0, 2.0, 2.0))
    nat, sp = read_nifti_native(p1)
    np.testing.assert_allclose(nat, vol, rtol=1e-6)

    p2 = str(tmp_path / "nat.nii.gz")
    write_nifti_native(p2, vol)
    pyv, hdr = pynifti.read_nifti(p2)
    np.testing.assert_allclose(pyv, vol, rtol=1e-6)

    # int16 with scaling written by the python writer
    p3 = str(tmp_path / "i16.nii")
    pynifti.write_nifti(p3, (vol).astype(np.int16))
    nat3, _ = read_nifti_native(p3)
    py3, _ = pynifti.read_nifti(p3)
    np.testing.assert_allclose(nat3, py3, rtol=1e-6)


def test_read_nifti_prefers_native(tmp_path, monkeypatch):
    vol = np.random.default_rng(2).random((6, 5, 4)).astype(np.float32)
    p = str(tmp_path / "v.nii.gz")
    write_nifti_native(p, vol)
    out, hdr = pynifti.read_nifti(p)
    np.testing.assert_allclose(out, vol, rtol=1e-6)


def test_raw_ingest_parity(tmp_path):
    """read_nifti_raw (native stream decode + python fallback) returns the
    voxel payload in file memory order and native dtype; applying
    slope/inter + transpose reproduces read_nifti across dtypes and both
    gz/raw containers."""
    from conditioned_diffusion_models_uad_tpu.native import binding

    rng = np.random.default_rng(3)
    cases = [
        ((11, 7, 5), np.float32, 100.0),
        ((11, 7, 5), np.int16, 300.0),
        ((11, 7, 5), np.uint8, 200.0),
    ]
    for shape, dtype, scale in cases:
        vol = (rng.random(shape) * scale).astype(dtype)
        for name in (f"{dtype.__name__}.nii", f"{dtype.__name__}.nii.gz"):
            p = str(tmp_path / name)
            pynifti.write_nifti(p, vol)
            ref, _ = pynifti.read_nifti(p)
            for native in (True, False):
                if native:
                    raw, shp, slope, inter = pynifti.read_nifti_raw(p)
                else:
                    # force the pure-python fallback
                    import unittest.mock as mock

                    with mock.patch.object(
                        binding, "read_nifti_raw_native",
                        side_effect=IOError("forced"),
                    ):
                        raw, shp, slope, inter = pynifti.read_nifti_raw(p)
                assert raw.dtype == dtype
                assert shp == shape
                assert raw.shape == tuple(reversed(shape))
                got = (
                    raw.astype(np.float32) * slope + inter
                ).transpose(2, 1, 0)
                np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_raw_ingest_4d_first_channel(tmp_path):
    """4D NIfTI (x,y,z,t): the raw payload arrives as [t,z,y,x] and the
    device loader takes volume 0 as a contiguous zero-copy slice (reference
    sitk_reader keeps channel 0 of 4D inputs)."""
    rng = np.random.default_rng(5)
    vol4 = rng.random((6, 5, 4, 3)).astype(np.float32)  # (x, y, z, t)
    p = str(tmp_path / "v4.nii.gz")
    pynifti.write_nifti(p, vol4)
    raw, shp, slope, inter = pynifti.read_nifti_raw(p)
    assert shp == (6, 5, 4, 3)
    assert raw.shape == (3, 4, 5, 6)
    first = raw[0]
    assert first.flags["C_CONTIGUOUS"]
    np.testing.assert_allclose(
        first.transpose(2, 1, 0) * slope + inter, vol4[..., 0], rtol=1e-6
    )


def test_raw_ingest_scl_scaling(tmp_path):
    """scl_slope/scl_inter from the header reach the caller (applied on
    device in the real pipeline)."""
    import struct

    p = str(tmp_path / "scaled.nii")
    vol = np.arange(24, dtype=np.int16).reshape(4, 3, 2)
    pynifti.write_nifti(p, vol)
    with open(p, "r+b") as f:  # patch slope=2.5, inter=-3
        f.seek(112)
        f.write(struct.pack("<ff", 2.5, -3.0))
    raw, shp, slope, inter = pynifti.read_nifti_raw(p)
    assert (slope, inter) == (2.5, -3.0)
    ref, _ = pynifti.read_nifti(p)
    got = (raw.astype(np.float32) * slope + inter).transpose(2, 1, 0)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_error_on_garbage(tmp_path):
    p = str(tmp_path / "junk.nii")
    with open(p, "wb") as f:
        f.write(b"not a nifti at all" * 30)
    with pytest.raises(IOError):
        read_nifti_native(p)


def test_prefetch_loader_order_and_parallel(tmp_path):
    vols = [np.full((4, 4, 2), i, np.float32) for i in range(10)]
    paths = []
    for i, v in enumerate(vols):
        p = str(tmp_path / f"s{i}.nii.gz")
        write_nifti_native(p, v)
        paths.append(p)
    out = list(PrefetchLoader(paths, lambda p: read_nifti_native(p)[0],
                              num_threads=4, prefetch=6))
    assert len(out) == 10
    for i, v in enumerate(out):
        assert float(v[0, 0, 0]) == i  # order preserved
