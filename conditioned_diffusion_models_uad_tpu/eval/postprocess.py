"""Device-side anomaly-map post-processing, fully jittable.

Capability parity with the reference's residual post-processing chain
(reference: src/utils/utils_eval.py):

* residual map |orig - reco| or (orig - reco)^2            (ref :28-33)
* brain-mask erosion — per-slice 2D binary erosion with a cross structuring
  element, iterations = W // 25                            (ref apply_brainmask
  :449-460: strel = generate_binary_structure(2,1), per depth slice)
* 3D median filter, kernel 5, reflect padding              (ref
  apply_3d_median_filter :462-464 → scipy.ndimage.median_filter)
* masked per-slice / per-volume mean anomaly scores        (ref :156-194)
* healthy/unhealthy L1/L2 reconstruction errors            (ref :36-49)

TPU-first: the reference runs this chain per volume on the host CPU with
scipy (a measured bottleneck, SURVEY.md §3.2); here the whole chain is one
fused XLA program on device. The median filter extracts k^3 shifted copies
with `conv_general_dilated_patches` and sorts along the window axis on the
VPU — O(V·k^3·log k^3) elementwise work, no host transfer.

Volumes are [H, W, D] (depth last), matching the reference layout.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def residual_volume(orig: jax.Array, reco: jax.Array, mode: str = "l1") -> jax.Array:
    """|orig-reco| (l1) or squared residual (ref utils_eval.py:28-33)."""
    d = orig.astype(jnp.float32) - reco.astype(jnp.float32)
    return jnp.abs(d) if mode == "l1" else d * d


@jax.jit
def reco_errors(orig: jax.Array, reco: jax.Array, seg: jax.Array) -> dict:
    """Whole/healthy/unhealthy L1+L2 reconstruction errors (ref :36-49).

    `seg > 0` marks anomalous voxels. Means are masked means (the reference
    indexes with the boolean mask; identical arithmetic). An EMPTY selection
    yields NaN — the reference's `l1_loss(x[seg > 0], …)` over zero elements
    is NaN, which the nanmean aggregation then EXCLUDES (utils_eval.py:38-49,
    196-256); returning 0.0 here would silently drag healthy-set aggregate
    means to zero instead. Jitted: all six reductions are ONE device dispatch.
    """
    orig = orig.astype(jnp.float32)
    reco = reco.astype(jnp.float32)
    an = (seg > 0).astype(jnp.float32)
    he = 1.0 - an
    l1 = jnp.abs(reco - orig)
    l2 = (reco - orig) ** 2

    def masked_mean(x, m):
        n = m.sum()
        return jnp.where(n > 0, (x * m).sum() / jnp.maximum(n, 1.0), jnp.nan)

    return {
        "l1recoErrorAll": l1.mean(),
        "l2recoErrorAll": l2.mean(),
        "l1recoErrorUnhealthy": masked_mean(l1, an),
        "l1recoErrorHealthy": masked_mean(l1, he),
        "l2recoErrorUnhealthy": masked_mean(l2, an),
        "l2recoErrorHealthy": masked_mean(l2, he),
    }


def _erode_cross_2d(mask: jax.Array, iterations: int) -> jax.Array:
    """Binary erosion of [H, W, D] per depth-slice with the 3x3 cross structuring
    element, `iterations` times (scipy generate_binary_structure(2,1) parity).

    Erosion by a cross = logical AND of the pixel with its 4 neighbors;
    out-of-bounds counts as False (scipy border_value=0).
    """
    m = mask > 0

    def one(m, _):
        p = jnp.pad(m, ((1, 1), (1, 1), (0, 0)), constant_values=False)
        out = (
            p[1:-1, 1:-1]
            & p[:-2, 1:-1]
            & p[2:, 1:-1]
            & p[1:-1, :-2]
            & p[1:-1, 2:]
        )
        return out, None

    m, _ = jax.lax.scan(one, m, None, length=iterations)
    return m


@partial(jax.jit, static_argnames=("iterations",))
def apply_brainmask_volume(
    diff: jax.Array, mask: jax.Array, iterations: int
) -> jax.Array:
    """Erode the brain mask per slice and zero the residual outside it
    (ref apply_brainmask/apply_brainmask_volume, utils_eval.py:447-460;
    the caller passes iterations = W // 25)."""
    eroded = _erode_cross_2d(mask, iterations)
    return diff * eroded.astype(diff.dtype)


@partial(jax.jit, static_argnames=("kernel",))
def median_filter_3d(vol: jax.Array, kernel: int = 5) -> jax.Array:
    """3D median filter with reflect padding (scipy.ndimage.median_filter
    parity; ref apply_3d_median_filter, utils_eval.py:462-464).

    Implemented as patch extraction + sort along the k^3 window axis: XLA
    lowers the sort to a vectorized sorting network on the VPU; the whole
    filter fuses with the surrounding residual math on device.
    """
    k = kernel
    lo = k // 2
    hi = k - 1 - lo
    # scipy's 'reflect' duplicates the edge sample == numpy/jnp 'symmetric'
    p = jnp.pad(vol, ((lo, hi),) * 3, mode="symmetric")
    # extract all k^3 shifted views: [H, W, D, k^3]
    views = [
        p[i : i + vol.shape[0], j : j + vol.shape[1], l : l + vol.shape[2]]
        for i in range(k)
        for j in range(k)
        for l in range(k)
    ]
    stack = jnp.stack(views, axis=-1)
    return jnp.sort(stack, axis=-1)[..., (k * k * k) // 2]


@partial(jax.jit, static_argnames=("erode_iterations", "median_kernel", "residualmode"))
def postprocess_residual(
    orig: jax.Array,  # [H, W, D]
    reco: jax.Array,  # [H, W, D]
    mask: jax.Array,  # [H, W, D] brain mask
    *,
    residualmode: str = "l1",
    erode_iterations: int = 3,
    median_kernel: int = 5,
) -> jax.Array:
    """The fused chain: residual → brain-mask erosion → 3D median
    (ref _test_step, utils_eval.py:28-69). One XLA program, zero host trips."""
    diff = residual_volume(orig, reco, residualmode)
    if erode_iterations > 0:
        diff = apply_brainmask_volume(diff, mask, erode_iterations)
    if median_kernel > 1:
        diff = median_filter_3d(diff, median_kernel)
    return diff


@jax.jit
def slice_anomaly_scores(diff: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-depth-slice masked mean residual [D] — the slice-wise anomaly score
    (ref utils_eval.py:160-167: mean over brain voxels; 0.0 where the slice
    has no brain)."""
    m = (mask > 0).astype(jnp.float32)
    num = (diff * m).sum(axis=(0, 1))
    den = m.sum(axis=(0, 1))
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


@jax.jit
def volume_anomaly_score(diff: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean residual over the whole volume (ref utils_eval.py:157)."""
    m = (mask > 0).astype(jnp.float32)
    return (diff * m).sum() / jnp.maximum(m.sum(), 1.0)


@partial(jax.jit, static_argnames=("size",))
def resize_trilinear(vol: jax.Array, size: tuple) -> jax.Array:
    """Trilinear resize to `size` with align_corners=True semantics for
    full-resolution evaluation (ref utils_eval.py:24-27 passes
    align_corners=True to F.interpolate): sample positions map
    i -> i*(in-1)/(out-1), unlike jax.image.resize's half-pixel grid."""
    vol = vol.astype(jnp.float32)
    coords = [
        jnp.linspace(0.0, max(s_in - 1, 0), s_out)
        for s_in, s_out in zip(vol.shape, size)
    ]
    grid = jnp.meshgrid(*coords, indexing="ij")
    return jax.scipy.ndimage.map_coordinates(vol, grid, order=1, mode="nearest")
