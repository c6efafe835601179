"""Offline dataset preparation: resample, skull-strip, register, crop, N4.

Capability parity with the reference's offline preprocessing scripts
(reference: src/datamodules/__pycache__/preprocessing/ — resample.py,
get_mask.py/extract_masks.py (HD-BET), registration.py (ANTs affine to SRI24),
cut.py (brain bbox crop), n4filter.py (N4 bias correction), orchestrated by
prepare_IXI.sh / prepare_Brats21.sh / prepare_MSLUB.sh).

The reference shells out to ANTs and HD-BET; neither exists here, so each stage
is rebuilt as an explicit algorithm:

* ``resample_iso``     — trilinear resample to isotropic voxels (ANTs
                         ResampleImage equivalent, resample.py)
* ``extract_brain_mask`` — threshold(Otsu) + largest 3D connected component +
                         binary closing; a classical stand-in for the HD-BET
                         CNN (documented deviation — same output contract:
                         a binary brain mask)
* ``affine_register``  — TPU-native intensity-based affine registration:
                         jit-compiled gradient descent (optax) on a smoothed
                         MSE objective over a 12-dof affine, multi-resolution
                         (the ANTs antsRegistrationSyNQuick[a] equivalent)
* ``crop_to_brain_bbox`` — crop volume+mask(+seg) to the mask bounding box
                         with margin (cut.py)
* ``n4_bias_correct``  — N4-style bias correction: iterative low-order
                         polynomial fit to the log-intensity field inside the
                         brain mask (n4filter.py: iters [200x4], tol 5e-4 —
                         here: fixed small iteration count on a closed-form
                         least-squares fit, which converges far faster)
* ``prepare_dataset``  — the per-subject pipeline mirroring prepare_*.sh
                         stage gating (IXI: all stages; Brats21: skip
                         resample/strip; MSLUB: all + consensus seg copy)
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nifti import read_nifti, write_nifti


# --------------------------------------------------------------------------- #
# resampling
# --------------------------------------------------------------------------- #
def resample_iso(
    vol: np.ndarray,
    spacing: Sequence[float],
    target: float = 1.0,
    method: str = "trilinear",
) -> np.ndarray:
    """Resample to isotropic `target` mm voxels given the current spacing
    (reference resample.py). Labels should pass method='nearest'."""
    shape = tuple(
        max(1, int(round(s * sp / target))) for s, sp in zip(vol.shape, spacing)
    )
    m = "nearest" if method == "nearest" else "trilinear"
    return np.asarray(
        jax.image.resize(jnp.asarray(vol, jnp.float32), shape, method=m)
    )


# --------------------------------------------------------------------------- #
# brain mask (HD-BET stand-in)
# --------------------------------------------------------------------------- #
def _otsu_threshold(vol: np.ndarray, bins: int = 256) -> float:
    v = vol[vol > 0]
    if v.size == 0:
        return 0.0
    hist, edges = np.histogram(v, bins=bins)
    centers = (edges[:-1] + edges[1:]) / 2
    w = hist.astype(np.float64)
    total = w.sum()
    best_t, best_var = centers[0], -1.0
    cum_w = np.cumsum(w)
    cum_m = np.cumsum(w * centers)
    mean_all = cum_m[-1] / total
    for i in range(1, bins - 1):
        w0 = cum_w[i]
        w1 = total - w0
        if w0 == 0 or w1 == 0:
            continue
        m0 = cum_m[i] / w0
        m1 = (cum_m[-1] - cum_m[i]) / w1
        var = w0 * w1 * (m0 - m1) ** 2
        if var > best_var:
            best_var, best_t = var, centers[i]
    return float(best_t)


def _largest_cc(mask: np.ndarray) -> np.ndarray:
    from scipy import ndimage

    labels, n = ndimage.label(mask)
    if n == 0:
        return mask
    sizes = ndimage.sum(mask, labels, index=np.arange(1, n + 1))
    return labels == (1 + int(np.argmax(sizes)))


def extract_brain_mask(
    vol: np.ndarray, closing_iters: int = 3, threshold_scale: float = 0.5
) -> np.ndarray:
    """Classical skull-strip mask: scaled-Otsu threshold -> largest 3D
    component -> binary closing -> hole fill (stands in for HD-BET,
    prepare_IXI.sh:30-33 / get_mask.py)."""
    from scipy import ndimage

    t = _otsu_threshold(vol) * threshold_scale
    m = vol > t
    m = _largest_cc(m)
    if closing_iters > 0:
        m = ndimage.binary_closing(m, iterations=closing_iters)
    m = ndimage.binary_fill_holes(m)
    return m.astype(np.float32)


# --------------------------------------------------------------------------- #
# affine registration (ANTs equivalent, TPU-native: autodiff + optax)
# --------------------------------------------------------------------------- #
def _affine_grid(params: jax.Array, shape: Tuple[int, int, int]) -> jax.Array:
    """12-dof affine (3x3 matrix deviation + translation) -> absolute sample
    coordinates [3, D, H, W] in the moving image frame."""
    # translation is expressed as a fraction of the volume extent (x extent/10):
    # scale-invariant across pyramid levels and comparable in step size to the
    # matrix dofs under one Adam learning rate
    mat = jnp.eye(3) + params[:9].reshape(3, 3)
    trans = params[9:12] * jnp.asarray(shape, jnp.float32) / 10.0
    c = (jnp.asarray(shape, jnp.float32) - 1.0) / 2.0
    axes = [jnp.arange(s, dtype=jnp.float32) for s in shape]
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"))  # [3,D,H,W]
    flat = grid.reshape(3, -1) - c[:, None]
    src = mat @ flat + (trans + c)[:, None]
    return src.reshape(3, *shape)


def _trilinear_sample(vol: jax.Array, coords: jax.Array) -> jax.Array:
    return jax.scipy.ndimage.map_coordinates(vol, list(coords), order=1, mode="nearest")


@partial(jax.jit, static_argnames=("iters",))
def _register_level(fixed, moving, params0, lr, iters: int):
    import optax

    tx = optax.adam(lr)

    def loss_fn(p):
        warped = _trilinear_sample(moving, _affine_grid(p, fixed.shape))
        return jnp.mean((warped - fixed) ** 2)

    def step(carry, _):
        p, opt = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, opt = tx.update(g, opt)
        return (optax.apply_updates(p, up), opt), loss

    (p, _), losses = jax.lax.scan(step, (params0, tx.init(params0)), None, length=iters)
    return p, losses


def affine_register(
    fixed: np.ndarray,
    moving: np.ndarray,
    iters_per_level: int = 200,
    levels: Sequence[int] = (4, 2, 1),
    lr: float = 1e-2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Intensity-based affine registration of `moving` onto `fixed`
    (reference registration.py — ANTs affine to the SRI24 atlas).

    TPU-native: the objective (trilinear warp -> MSE) is jit-compiled and
    optimized with Adam in a lax.scan, coarse-to-fine over `levels`.
    Returns (warped_moving, params[12])."""
    fixed = np.asarray(fixed, np.float32)
    moving = np.asarray(moving, np.float32)
    fmax = fixed.max() or 1.0
    mmax = moving.max() or 1.0
    params = jnp.zeros((12,), jnp.float32)
    for lv in levels:
        f = fixed[::lv, ::lv, ::lv] / fmax
        m = moving[::lv, ::lv, ::lv] / mmax
        params, _ = _register_level(jnp.asarray(f), jnp.asarray(m), params,
                                    lr, iters_per_level)
    warped = _trilinear_sample(
        jnp.asarray(moving), _affine_grid(params, fixed.shape)
    )
    return np.asarray(warped), np.asarray(params)


def apply_affine(
    vol: np.ndarray, params: np.ndarray, shape: Tuple[int, int, int], order: int = 1
) -> np.ndarray:
    """Apply a fitted affine to another volume (e.g. the seg, nearest)."""
    coords = _affine_grid(jnp.asarray(params), shape)
    out = jax.scipy.ndimage.map_coordinates(
        jnp.asarray(vol, jnp.float32), list(coords), order=order, mode="nearest"
    )
    return np.asarray(out)


# --------------------------------------------------------------------------- #
# crop to brain bbox (cut.py)
# --------------------------------------------------------------------------- #
def crop_to_brain_bbox(
    vols: Sequence[np.ndarray], mask: np.ndarray, margin: int = 2
) -> Tuple[list, np.ndarray]:
    """Crop all `vols` and the mask to the mask's bounding box + margin."""
    idx = np.where(mask > 0)
    if idx[0].size == 0:
        return list(vols), mask
    sl = tuple(
        slice(max(0, int(i.min()) - margin), min(s, int(i.max()) + 1 + margin))
        for i, s in zip(idx, mask.shape)
    )
    return [v[sl] for v in vols], mask[sl]


# --------------------------------------------------------------------------- #
# N4-style bias correction (n4filter.py)
# --------------------------------------------------------------------------- #
@partial(jax.jit, static_argnames=("order", "iters"))
def _n4_fit(vol, mask, order: int, iters: int):
    d, h, w = vol.shape
    zz = jnp.linspace(-1, 1, d)[:, None, None] * jnp.ones((d, h, w))
    yy = jnp.linspace(-1, 1, h)[None, :, None] * jnp.ones((d, h, w))
    xx = jnp.linspace(-1, 1, w)[None, None, :] * jnp.ones((d, h, w))
    feats = []
    for i in range(order + 1):
        for j in range(order + 1 - i):
            for k in range(order + 1 - i - j):
                feats.append((zz**i) * (yy**j) * (xx**k))
    A = jnp.stack([f.ravel() for f in feats], axis=1)  # [N, F]
    wv = mask.ravel()
    log_v = jnp.log(jnp.clip(vol, 1e-4, None)).ravel()

    def step(log_corr, _):
        # weighted least-squares fit of the smooth field to the current log image
        Aw = A * wv[:, None]
        ATA = A.T @ Aw + 1e-6 * jnp.eye(A.shape[1])
        ATb = Aw.T @ log_corr
        coef = jnp.linalg.solve(ATA, ATb)
        field = A @ coef
        # remove the fitted smooth component, keep the mask-mean level
        mean_f = (field * wv).sum() / (wv.sum() + 1e-8)
        return log_corr - (field - mean_f), field

    log_corr, fields = jax.lax.scan(step, log_v, None, length=iters)
    corrected = jnp.exp(log_corr).reshape(vol.shape)
    bias = jnp.exp((log_v - log_corr)).reshape(vol.shape)
    return corrected, bias


def n4_bias_correct(
    vol: np.ndarray,
    mask: Optional[np.ndarray] = None,
    order: int = 3,
    iters: int = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Estimate and remove a smooth multiplicative bias field
    (reference n4filter.py: SimpleITK N4, 4 fitting levels, tol 5e-4; here a
    closed-form weighted polynomial fit iterated `iters` times — the same
    smooth-bias model solved directly instead of by b-spline gradient descent).
    Returns (corrected, bias_field); the background keeps its original value."""
    v = np.asarray(vol, np.float32)
    m = (np.asarray(mask) > 0).astype(np.float32) if mask is not None else (v > 0).astype(np.float32)
    corrected, bias = _n4_fit(jnp.asarray(v), jnp.asarray(m), order, iters)
    corrected = np.asarray(corrected)
    out = np.where(m > 0, corrected, v)
    return out.astype(np.float32), np.asarray(bias, np.float32)


# --------------------------------------------------------------------------- #
# per-dataset pipelines (prepare_*.sh)
# --------------------------------------------------------------------------- #
@dataclasses.dataclass
class PrepareConfig:
    resample: bool = True  # Brats21 ships 1mm iso already (prepare_Brats21.sh)
    skull_strip: bool = True
    register: bool = False  # needs an atlas volume
    n4: bool = True
    crop: bool = True
    target_spacing: float = 1.0


def prepare_subject(
    img_path: str,
    out_dir: str,
    cfg: PrepareConfig,
    atlas: Optional[np.ndarray] = None,
    seg_path: Optional[str] = None,
) -> dict:
    """Run the staged pipeline on one subject; writes <name>_{t1,mask[,seg]}
    NIfTIs into out_dir and returns the produced paths."""
    from .datamodules import _host_jax

    name = os.path.basename(img_path).split(".")[0]
    vol, meta = read_nifti(img_path)
    spacing = tuple(meta.spacing) if meta.spacing else (1.0, 1.0, 1.0)
    seg = read_nifti(seg_path)[0] if seg_path else None

    with _host_jax():
        return _prepare_stages(
            name, vol, spacing, seg, out_dir, cfg, atlas
        )


def _prepare_stages(name, vol, spacing, seg, out_dir, cfg, atlas):
    """The staged pipeline body; runs under the host-CPU jax context —
    offline data preparation must not occupy the accelerator."""

    if cfg.resample:
        vol = resample_iso(vol, spacing, cfg.target_spacing)
        if seg is not None:
            seg = resample_iso(seg, spacing, cfg.target_spacing, method="nearest")

    mask = extract_brain_mask(vol) if cfg.skull_strip else (vol > 0).astype(np.float32)
    if cfg.skull_strip:
        vol = vol * mask

    if cfg.register and atlas is not None:
        vol, params = affine_register(atlas, vol)
        mask = (apply_affine(mask, params, atlas.shape, order=0) > 0.5).astype(np.float32)
        if seg is not None:
            seg = apply_affine(seg, params, atlas.shape, order=0)

    if cfg.n4:
        vol, _ = n4_bias_correct(vol, mask)

    if cfg.crop:
        vols = [vol] + ([seg] if seg is not None else [])
        vols, mask = crop_to_brain_bbox(vols, mask)
        vol = vols[0]
        if seg is not None:
            seg = vols[1]

    os.makedirs(out_dir, exist_ok=True)
    out = {"img": os.path.join(out_dir, f"{name}_t1.nii.gz"),
           "mask": os.path.join(out_dir, f"{name}_mask.nii.gz")}
    write_nifti(out["img"], vol.astype(np.float32))
    write_nifti(out["mask"], mask.astype(np.float32))
    if seg is not None:
        out["seg"] = os.path.join(out_dir, f"{name}_seg.nii.gz")
        write_nifti(out["seg"], seg.astype(np.float32))
    return out


DATASET_STAGES = {
    # prepare_IXI.sh: resample -> HD-BET -> (register) -> N4 -> crop
    "IXI": PrepareConfig(resample=True, skull_strip=True, n4=True, crop=True),
    # prepare_Brats21.sh: already 1mm/stripped; N4 + crop only
    "Brats21": PrepareConfig(resample=False, skull_strip=False, n4=True, crop=True),
    # prepare_MSLUB.sh: full pipeline + consensus seg carried through
    "MSLUB": PrepareConfig(resample=True, skull_strip=True, n4=True, crop=True),
}
