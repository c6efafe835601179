"""Datamodules: IXI (train) + Brats21 / MSLUB / ATLAS / WMH (eval).

Capability parity with the reference data layer
(reference: src/datamodules/Datamodules_train.py, Datamodules_eval.py,
create_dataset.py):

* CSV split handling with `<pathBase>/Data` prefixing, per-fold train/val CSVs,
  t2-mode path rewriting and keep-list filtering  (Datamodules_train.py:24-49)
* preprocessing pipeline per subject: read (+curvature-flow smoothing of images),
  CropOrPad(imageDim), masked percentile rescale, bspline downsample by
  rescaleFactor (labels nearest)                  (create_dataset.py:196-258)
* Eval subjects keep `*_orig` full-resolution copies excluded from resampling
  when resizedEvaluation=False                    (create_dataset.py:199-202)
* vol2slice: one random depth slice per subject per epoch, optional fixed /
  sequential slice windows and `unique_slice`     (create_dataset.py:143-193)
* sample_set debug subsetting (first 8/4 subjects) (Datamodules_eval.py:37-42)
* ATLAS / WMH eval modules — referenced by the reference's train loop
  (src/train.py:189) but unimplemented in the fork; implemented here for parity
  with the upstream capability set (SURVEY.md §2.2).

TPU-first: after one-time preprocessing the *entire training set* lives on
device as a stacked [N, H, W, D] array (a few GB at most at this scale) and the
per-step slice gather + augmentation happens inside the jitted train step — no
host dataloader in the hot loop (the reference burns host CPU on torchio
workers + per-step noise; see SURVEY.md §3.1)."""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .nifti import read_nifti, read_nifti_raw
from .transforms import (
    bspline_downsample,
    crop_or_pad,
    crop_or_pad_dynamic,
    curvature_flow,
    nearest_downsample,
    percentile_rescale,
    zero_beyond_extent,
)


@dataclasses.dataclass
class DataConfig:
    data_dir: str = ""
    image_dim: Sequence[int] = (192, 192, 100)
    rescale_factor: float = 2.0
    mode: str = "t1"
    batch_size: int = 32
    num_folds: int = 1
    sample_set: bool = False
    perc_low: float = 1.0
    perc_high: float = 99.0
    use_curvature_flow: bool = True
    resized_evaluation: bool = True
    aug_intensity: bool = True
    # 'host' pins per-subject load-time transforms to the host CPU backend
    # (reference semantics: torchio on dataloader workers). 'device' fuses the
    # whole pipeline (curvature flow -> crop/pad -> percentile rescale ->
    # bspline downsample) into ONE jit program on the accelerator with
    # device-resident outputs — for hosts whose CPU would otherwise bottleneck
    # eval (~1.9 s/volume single-core vs ~ms on a TPU chip; H2D of the raw
    # volume rides the fast direction of the transfer link).
    # CAVEAT (device mode): the fused program is traced over the RAW volume
    # shape, so every distinct raw shape triple compiles once (remote compile
    # on a tunneled chip: ~tens of seconds each, amortized by the persistent
    # compile cache). Datasets preprocessed to a common grid (the reference's
    # offline pipeline registers everything to SRI24, prepare_IXI.sh) hit one
    # shape; for heterogeneous raw shapes set `shape_bucket` below (one
    # compile per bucket triple) or prefer preprocess_backend='host'.
    preprocess_backend: str = "host"
    # >0: end-pad each raw array to the next multiple of `shape_bucket` per
    # axis before upload and trace the fused device-preprocess program over
    # the BUCKET shape with the true extent as a traced scalar — results
    # identical to unbucketed (extent-aware curvature flow + dynamic
    # CropOrPad), one compile per bucket instead of per raw shape
    shape_bucket: int = 0
    unique_slice: bool = False
    start_slice: Optional[int] = None
    seq_slices: Optional[int] = None
    drop_last: bool = True
    testsets: Sequence[str] = ("Brats21",)

    def __post_init__(self):
        if self.preprocess_backend not in ("host", "device"):
            raise ValueError(
                f"preprocess_backend must be 'host' or 'device', got "
                f"{self.preprocess_backend!r}"
            )
        if int(self.shape_bucket) < 0:
            raise ValueError(f"shape_bucket must be >= 0, got {self.shape_bucket}")

    @property
    def model_hw(self):
        # ceil, matching bspline_downsample's new-size formula — truncation
        # would disagree with the produced slice shape whenever
        # image_dim / rescale_factor is not exact (ref calc_interres is also
        # a spacing-preserving resample to ceil sizes)
        import math

        return (
            int(math.ceil(self.image_dim[0] / self.rescale_factor)),
            int(math.ceil(self.image_dim[1] / self.rescale_factor)),
        )


def _host_jax():
    """Context pinning jitted preprocessing to the host CPU backend.

    The per-subject load-time transforms are one-time IO-side work; on a TPU
    host they must not occupy (or round-trip to) the accelerator — the hot
    train/eval path owns it. Falls back to the default device when no separate
    CPU backend exists (e.g. the CPU-only test mesh)."""
    import contextlib

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


def _read_image(path: str, cfg: DataConfig, is_label: bool) -> np.ndarray:
    vol = _read_raw(path)
    if not is_label and cfg.use_curvature_flow:
        with _host_jax():
            vol = np.asarray(curvature_flow(jnp.asarray(vol)))
    return vol.astype(np.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "target", "factor", "perc", "use_cf", "has_mask", "has_seg",
        "keep_orig", "resized", "src_rev", "mask_shape", "seg_shape",
    ),
)
def _preprocess_subject_fused(
    vol, mask, seg, scales=None, ext=None, *, target, factor, perc, use_cf,
    has_mask, has_seg, keep_orig, resized, src_rev=False, mask_shape=None,
    seg_shape=None,
):
    """The whole per-subject pipeline as ONE traced program (same op order as
    the host path: curvature flow on the raw image -> CropOrPad -> masked
    percentile rescale -> bspline/nearest downsample, create_dataset.py:196-258).
    Outputs stay on the executing device.

    src_rev=True: inputs arrive in the file's NATIVE dtype and NATIVE memory
    order (C-contiguous reversed dims — NIfTI stores x fastest) with `scales`
    = [[slope, inter], ...] per array. Dtype widening, scl scaling and the
    rev->xyz transpose then run ON DEVICE — a narrow on-disk dtype crosses the
    H2D link at stored width and the host never pays the ~50 ms/volume strided
    transpose copy (single-core loader-feed fix, PARITY.md "loader feed")."""

    def _ingest(x, i, packed_shape=None):
        if packed_shape is not None:
            # binary labels ride the H2D link bit-packed (1 bit/voxel, 8x
            # less on a slow transport); exact 0/1 round trip
            n = 1
            for s in packed_shape:
                n *= s
            x = jnp.unpackbits(x, count=n).reshape(packed_shape)
        x = x.astype(jnp.float32)
        if src_rev:
            x = x * scales[i, 0] + scales[i, 1]
            x = jnp.transpose(x, tuple(reversed(range(x.ndim))))
        if ext is not None:
            # bucket padding was zeros in STORED units; scl_inter != 0 turns
            # it into `inter`, breaking crop_or_pad_dynamic's beyond-extent ==
            # pad_value precondition and the derived (vol > 0) mask — re-zero
            # past the true extent (free: fuses into the scale multiply)
            x = zero_beyond_extent(x, ext[i])
        return x

    vol = _ingest(vol, 0)
    mask = _ingest(mask, 1, mask_shape) if has_mask else mask.astype(jnp.float32)
    seg = _ingest(seg, 2, seg_shape) if has_seg else seg.astype(jnp.float32)
    if use_cf:
        vol = curvature_flow(vol, ext=None if ext is None else ext[0])
    if not has_mask:
        mask = (vol > 0).astype(jnp.float32)
    if ext is None:
        cop = lambda x, i: crop_or_pad(x, target)
    else:
        # shape-bucketed inputs: true per-array extents traced (ext[i]);
        # the mask derived from vol shares vol's extent
        cop = lambda x, i: crop_or_pad_dynamic(x, ext[i], target)
    vol = cop(vol, 0)
    mask = cop(mask, 1 if has_mask else 0)
    seg = cop(seg, 2) if has_seg else None
    vol = percentile_rescale(vol, mask, 0.0, 1.0, perc[0], perc[1])

    out = {}
    if keep_orig:
        if resized:
            out["vol_orig"] = bspline_downsample(vol, factor)
            out["mask_orig"] = nearest_downsample(mask, factor)
            out["seg_orig"] = (
                nearest_downsample(seg, factor)
                if seg is not None
                else jnp.zeros_like(out["mask_orig"])
            )
        else:
            out["vol_orig"] = vol
            out["mask_orig"] = mask
            out["seg_orig"] = seg if seg is not None else jnp.zeros_like(mask)
    out["vol"] = bspline_downsample(vol, factor)
    out["mask"] = nearest_downsample(mask, factor)
    if seg is not None:
        out["seg"] = nearest_downsample(seg, factor)
    return out


def _int_label(v) -> int:
    """Robust CSV label parse: empty cells arrive as NaN (truthy! `NaN or 0`
    never falls back) and int(NaN) raises — treat missing/unparseable as 0."""
    try:
        f = float(v)
    except (TypeError, ValueError):
        return 0
    return 0 if f != f else int(f)


def _read_raw(path: str) -> np.ndarray:
    """Raw NIfTI read (no smoothing): shared by the host `_read_image` path
    and the device-fused path; 4D volumes keep their first channel."""
    vol, _ = read_nifti(path)
    if vol.ndim == 4:
        vol = vol[..., 0]
    return vol


def _read_raw_rev(path: str):
    """Raw ingest read: (payload view in native dtype + file memory order,
    slope, inter). 4D volumes keep their first channel (the outermost axis of
    the reversed layout — a contiguous zero-copy slice)."""
    vol, shape, slope, inter = read_nifti_raw(path)
    if vol.ndim == 4:
        vol = vol[0]
    if vol.dtype == np.float64:  # halve the H2D payload for f64 oddballs
        vol = (vol * slope + inter).astype(np.float32)
        slope, inter = 1.0, 0.0
    return vol, np.float32(slope), np.float32(inter)


_PACKBITS_MIN_BYTES = 1 << 20  # below ~1 MB the host max() pass isn't worth it


def _maybe_packbits(arr, slope, inter):
    """Bit-pack a BINARY uint8 label volume for the H2D hop (8x fewer bytes
    on a slow transport; the fused program unpacks exactly). Returns
    (array, pre-pack shape or None)."""
    if (
        arr.dtype == np.uint8
        and slope == 1.0 and inter == 0.0
        and arr.size >= _PACKBITS_MIN_BYTES
        and int(arr.max()) <= 1
    ):
        return np.packbits(arr.ravel()), arr.shape
    return arr, None


def _pad_to_bucket(arr: np.ndarray, bucket: int) -> np.ndarray:
    """End-pad each axis with zeros to the next multiple of `bucket`."""
    tgt = tuple(-(-s // bucket) * bucket for s in arr.shape)
    if tgt == arr.shape:
        return arr
    out = np.zeros(tgt, arr.dtype)
    out[tuple(slice(0, s) for s in arr.shape)] = arr
    return out


def _load_subject_device(row, cfg: DataConfig, keep_orig: bool) -> dict:
    """Device-fused variant of `load_subject`: zero-copy raw NIfTI decode on
    host (native dtype, file memory order), one H2D upload at STORED width
    (binary labels bit-packed), one fused jit (device-side
    unpack/widen/scale/transpose/preprocess), device-resident jax.Array
    outputs.

    cfg.shape_bucket > 0: each raw array is end-padded to the next bucket
    multiple per axis (one host memcpy) and its true xyz extent rides along
    as a traced scalar row of `ext` — heterogeneous raw shapes then share one
    compiled program per bucket triple instead of one per shape."""
    bucket = int(cfg.shape_bucket)
    ext = np.ones((3, 3), np.int32) if bucket else None

    vol, *vol_sc = _read_raw_rev(row["img_path"])
    if bucket:
        ext[0] = vol.shape[::-1]  # post-transpose (xyz) extent
        vol = _pad_to_bucket(vol, bucket)
    has_mask = isinstance(row.get("mask_path", None), str) and bool(row["mask_path"])
    if has_mask:
        mask, *mask_sc = _read_raw_rev(row["mask_path"])
        if bucket:
            ext[1] = mask.shape[::-1]
            mask = _pad_to_bucket(mask, bucket)
        mask, mask_shape = _maybe_packbits(mask, *mask_sc)
    else:
        mask, mask_sc, mask_shape = np.zeros((1, 1, 1), np.float32), [1.0, 0.0], None
    seg_path = row.get("seg_path", None)
    seg_available = isinstance(seg_path, str) and bool(seg_path)
    if seg_available:
        seg, *seg_sc = _read_raw_rev(seg_path)
        if bucket:
            ext[2] = seg.shape[::-1]
            seg = _pad_to_bucket(seg, bucket)
        seg, seg_shape = _maybe_packbits(seg, *seg_sc)
    else:
        seg, seg_sc, seg_shape = np.zeros((1, 1, 1), np.float32), [1.0, 0.0], None

    scales = np.array([vol_sc, mask_sc, seg_sc], np.float32)
    out = dict(
        _preprocess_subject_fused(
            vol, mask, seg, scales, ext,
            target=tuple(cfg.image_dim),
            factor=cfg.rescale_factor,
            perc=(cfg.perc_low, cfg.perc_high),
            use_cf=cfg.use_curvature_flow,
            has_mask=has_mask,
            has_seg=seg_available,
            keep_orig=keep_orig,
            resized=cfg.resized_evaluation,
            src_rev=True,
            mask_shape=mask_shape,
            seg_shape=seg_shape,
        )
    )
    out["seg_available"] = seg_available
    out["ID"] = str(row.get("img_name", ""))
    out["age"] = row.get("age", 0)
    out["label"] = _int_label(row.get("label", 0))
    return out


def load_subject(
    row,
    cfg: DataConfig,
    keep_orig: bool = False,
) -> dict:
    """Read + preprocess one subject into numpy arrays [H, W, D] (or
    device-resident jax.Arrays when cfg.preprocess_backend == 'device').

    Per-subject eval loads take the device path here (keep_orig); TRAIN pool
    ingest with the device backend goes through IXI._build_source, which
    calls `_load_subject_device` directly and stacks the device-resident
    model-space volumes ON DEVICE (no host stack, no D2H)."""
    if cfg.preprocess_backend == "device" and keep_orig:
        return _load_subject_device(row, cfg, keep_orig)
    vol = _read_image(row["img_path"], cfg, is_label=False)
    if isinstance(row.get("mask_path", None), str) and row["mask_path"]:
        mask = _read_image(row["mask_path"], cfg, is_label=True)
    else:
        mask = (vol > 0).astype(np.float32)
    seg_path = row.get("seg_path", None)
    seg_available = isinstance(seg_path, str) and bool(seg_path)
    seg = _read_image(seg_path, cfg, is_label=True) if seg_available else None

    target = tuple(cfg.image_dim)
    vol = crop_or_pad(vol, target)
    mask = crop_or_pad(mask, target)
    if seg is not None:
        seg = crop_or_pad(seg, target)

    out = {}
    with _host_jax():
        vol = np.asarray(
            percentile_rescale(
                jnp.asarray(vol), jnp.asarray(mask), 0.0, 1.0,
                cfg.perc_low, cfg.perc_high,
            )
        )

        if keep_orig:
            if cfg.resized_evaluation:
                out["vol_orig"] = np.asarray(
                    bspline_downsample(jnp.asarray(vol), cfg.rescale_factor)
                )
                out["mask_orig"] = np.asarray(
                    nearest_downsample(jnp.asarray(mask), cfg.rescale_factor)
                )
                out["seg_orig"] = (
                    np.asarray(nearest_downsample(jnp.asarray(seg), cfg.rescale_factor))
                    if seg is not None
                    else np.zeros_like(out["mask_orig"])
                )
            else:
                out["vol_orig"] = vol.copy()
                out["mask_orig"] = mask.copy()
                out["seg_orig"] = seg.copy() if seg is not None else np.zeros_like(mask)

        out["vol"] = np.asarray(bspline_downsample(jnp.asarray(vol), cfg.rescale_factor))
        out["mask"] = np.asarray(nearest_downsample(jnp.asarray(mask), cfg.rescale_factor))
        if seg is not None:
            out["seg"] = np.asarray(
                nearest_downsample(jnp.asarray(seg), cfg.rescale_factor)
            )
    out["seg_available"] = seg_available
    out["ID"] = str(row.get("img_name", ""))
    out["age"] = row.get("age", 0)
    out["label"] = _int_label(row.get("label", 0))
    return out


class EvalDataset:
    """Per-volume eval dataset yielding the reference's subject dict
    (vol/vol_orig/mask_orig/seg_orig/ID/label/stage/Dataset)."""

    def __init__(self, csv: pd.DataFrame, cfg: DataConfig, setname: str, stage: str):
        self.csv = csv.reset_index(drop=True)
        self.cfg = cfg
        self.setname = setname
        self.stage = stage

    def __len__(self):
        return len(self.csv)

    def __getitem__(self, i: int) -> dict:
        # no caching: the eval loop visits each index exactly once per stage,
        # and keep_orig subjects are tens of MB each — a cache only leaks RAM
        sub = load_subject(self.csv.iloc[i], self.cfg, keep_orig=True)
        sub["Dataset"] = self.setname
        sub["stage"] = self.stage
        return sub

    def __iter__(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield self[i]


class TrainSliceSource:
    """Device-resident training set: stacked volumes + the vol2slice sampler.

    `epoch_indices(rng)` yields (vol_idx, slice_idx) int arrays per batch:
    each epoch visits every subject once in random order and draws one random
    depth slice per subject (reference vol2slice, create_dataset.py:143-193).
    `gather(vol_idx, slice_idx)` is the jitted on-device slice fetch."""

    def __init__(self, vols: np.ndarray, masks: np.ndarray, cfg: DataConfig):
        self.cfg = cfg
        self.vols = jnp.asarray(vols)  # [N, H, W, D]
        self.masks = jnp.asarray(masks)
        self.depth = int(vols.shape[-1])
        self.n = int(vols.shape[0])

        @jax.jit
        def _gather(vol_idx, slice_idx):
            v = self.vols[vol_idx, :, :, slice_idx]  # [B, H, W]
            m = self.masks[vol_idx, :, :, slice_idx]
            return v[..., None], m[..., None]

        self.gather = _gather

    def __len__(self):
        return self.n

    def epoch_indices(self, rng: np.random.Generator):
        cfg = self.cfg
        order = rng.permutation(self.n)
        bs = cfg.batch_size
        end = self.n - (self.n % bs) if (cfg.drop_last and self.n >= bs) else self.n
        lo, hi = 0, self.depth
        if cfg.start_slice is not None:
            if cfg.seq_slices is not None:
                lo, hi = cfg.start_slice, cfg.start_slice + cfg.seq_slices
            else:
                lo, hi = cfg.start_slice, cfg.start_slice + 1
        for i in range(0, max(end, min(bs, self.n)), bs):
            idx = order[i : i + bs]
            if len(idx) == 0 or (cfg.drop_last and len(idx) < bs and self.n >= bs):
                break
            if cfg.unique_slice:
                s = np.full(len(idx), rng.integers(lo, hi))
            else:
                s = rng.integers(lo, hi, size=len(idx))
            yield idx.astype(np.int32), s.astype(np.int32)


def _prefix_paths(csv: pd.DataFrame, base: str, with_seg: bool) -> pd.DataFrame:
    csv = csv.copy()
    csv["img_path"] = base + "/Data" + csv["img_path"]
    csv["mask_path"] = base + "/Data" + csv["mask_path"]
    if with_seg and "seg_path" in csv.columns:
        csv["seg_path"] = base + "/Data" + csv["seg_path"]
    else:
        csv["seg_path"] = None
    return csv


class IXI:
    """Healthy-train datamodule (reference Datamodules_train.IXI)."""

    def __init__(self, cfg: DataConfig, fold: int = 0):
        self.cfg = cfg
        base = cfg.data_dir
        splits = os.path.join(base, "Data", "splits")
        self.csv = {
            "train": pd.read_csv(os.path.join(splits, f"IXI_train_fold{fold}.csv")),
            "val": pd.read_csv(os.path.join(splits, f"IXI_val_fold{fold}.csv")),
            "test": pd.read_csv(os.path.join(splits, "IXI_test.csv")),
        }
        for state, df in self.csv.items():
            df = _prefix_paths(df, base, with_seg=False)
            if cfg.mode == "t2":
                keep_path = os.path.join(splits, "avail_t2.csv")
                if os.path.exists(keep_path):
                    keep_t2 = pd.read_csv(keep_path)
                    df = df[df.img_name.isin(keep_t2["0"].str.replace("t2", "t1"))]
                df["img_path"] = df["img_path"].str.replace("t1", "t2")
            df["setname"] = "IXI"
            df["settype"] = state
            if cfg.sample_set:
                # debug subsetting of the healthy sets too (reference debug
                # slice, Datamodules_train.py:54-58)
                df = df[0:2]
            self.csv[state] = df
        self._train_source = None
        self._val_source = None

    def _build_source(self, state: str) -> TrainSliceSource:
        # threaded read-ahead: the native NIfTI reader releases the GIL, so
        # file decode overlaps with the jitted per-subject preprocessing
        from ..native.binding import PrefetchLoader

        rows = [self.csv[state].iloc[i] for i in range(len(self.csv[state]))]
        if self.cfg.preprocess_backend == "device":
            # device-fused TRAIN ingest: raw-dtype uploads (int16/uint8 —
            # a fraction of the f32 bytes) + the on-device preprocess
            # pipeline, stacked ON DEVICE — zero D2H, and the single-CPU
            # host no longer serializes ~seconds of curvature-flow /
            # rescale per subject (measured the dominant fixed cost of a
            # SparK pretrain run, PARITY "SparK pretrain e2e"). Same fused
            # pipeline the eval path parity-tests against host mode.
            subs = list(PrefetchLoader(
                rows,
                lambda r: _load_subject_device(r, self.cfg, keep_orig=False),
                num_threads=4,
            ))
            vols = jnp.stack([s["vol"] for s in subs])
            masks = jnp.stack([s["mask"] for s in subs])
            return TrainSliceSource(vols, masks, self.cfg)
        subs = list(
            PrefetchLoader(rows, lambda r: load_subject(r, self.cfg), num_threads=4)
        )
        vols = np.stack([s["vol"] for s in subs])
        masks = np.stack([s["mask"] for s in subs])
        return TrainSliceSource(vols, masks, self.cfg)

    def train_slices(self) -> TrainSliceSource:
        if self._train_source is None:
            self._train_source = self._build_source("train")
        return self._train_source

    def val_slices(self) -> TrainSliceSource:
        if self._val_source is None:
            self._val_source = self._build_source("val")
        return self._val_source

    def val_eval(self) -> EvalDataset:
        return EvalDataset(self.csv["val"], self.cfg, "IXI", "val")

    def test_eval(self) -> EvalDataset:
        return EvalDataset(self.csv["test"], self.cfg, "IXI", "test")


class _EvalModule:
    """Shared shape of the eval datamodules (reference Datamodules_eval.py)."""

    SETNAME = ""
    SAMPLE_N = 8

    def __init__(self, cfg: DataConfig, fold: int = 0):
        self.cfg = cfg
        base = cfg.data_dir
        splits = os.path.join(base, "Data", "splits")
        self.csv = {}
        for state in ("val", "test"):
            df = pd.read_csv(os.path.join(splits, f"{self.SETNAME}_{state}.csv"))
            df = _prefix_paths(df, base, with_seg=True)
            df["setname"] = self.SETNAME
            df["settype"] = state
            df = self._mode_rewrite(df)
            if cfg.sample_set:
                df = df[0 : self.SAMPLE_N]
            self.csv[state] = df

    def _mode_rewrite(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.cfg.mode != "t1":
            m = self.cfg.mode
            df["img_path"] = df["img_path"].str.replace("t1", m, regex=False)
        return df

    def val_eval(self) -> EvalDataset:
        return EvalDataset(self.csv["val"], self.cfg, self.SETNAME, "val")

    def test_eval(self) -> EvalDataset:
        return EvalDataset(self.csv["test"], self.cfg, self.SETNAME, "test")

    # reference-compatible aliases (Datamodules_eval val/test_dataloader)
    val_dataloader = val_eval
    test_dataloader = test_eval


class Brats21(_EvalModule):
    SETNAME = "Brats21"
    SAMPLE_N = 8


class MSLUB(_EvalModule):
    SETNAME = "MSLUB"
    SAMPLE_N = 4


class ATLAS(_EvalModule):
    """t1-only stroke-lesion set (named in reference README.md:12-19 and
    train.py:189; unimplemented in the fork — rebuilt here)."""

    SETNAME = "ATLAS"
    SAMPLE_N = 8


class WMH(_EvalModule):
    """t1-mode white-matter-hyperintensity set (same provenance as ATLAS)."""

    SETNAME = "WMH"
    SAMPLE_N = 8


EVAL_MODULES = {"Brats21": Brats21, "MSLUB": MSLUB, "ATLAS": ATLAS, "WMH": WMH}

# modality gating of the reference train loop (src/train.py:187-190)
SETS_BY_MODE = {
    "t1": ["Brats21", "MSLUB", "ATLAS", "WMH", "IXI"],
    "t2": ["Brats21", "MSLUB", "IXI"],
}
