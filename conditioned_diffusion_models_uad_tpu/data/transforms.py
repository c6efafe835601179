"""Volume preprocessing transforms, jittable for on-device execution.

Capability parity with the reference's torchio/SimpleITK pipeline
(reference: src/datamodules/create_dataset.py:196-258):

* ``crop_or_pad``            — tio.CropOrPad(imageDim, pad 0)
* ``percentile_rescale``     — tio.RescaleIntensity((0,1), percentiles (1,99),
                               masking_method='mask')
* ``bspline_resample``       — tio.Resample(rescaleFactor, 'bspline'): cubic
                               B-spline interpolation with recursive prefiltering
* ``curvature_flow``         — sitk.CurvatureFlow(timeStep=.125, iterations=3)
                               applied to images (not masks/segs) at read time

TPU-first: the reference runs all of this on host CPU inside dataloader workers;
here every transform is a pure jittable function so whole eval sets preprocess on
device.  The B-spline prefilter is a `lax.scan` recursive filter per axis; the
kernel evaluation is a separable 4-tap gather.  Numerical parity is validated
against scipy.ndimage (same Unser prefilter + kernel) in tests.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# -----------------------------------------------------------------------------
# crop or pad. Works on host numpy arrays AND under jit tracing: input shapes
# are static at trace time, so the crop/pad bounds are Python ints either way
# — this is the boundary that makes everything downstream static.
# -----------------------------------------------------------------------------


def crop_or_pad(vol, target: tuple, pad_value: float = 0.0):
    """Center crop/pad to `target` (tio.CropOrPad semantics: the excess is
    split in half with the extra voxel going to the LEADING side — torchio's
    `ini, fin = ceil(half), floor(half)` bounds)."""
    xp = np if isinstance(vol, np.ndarray) else jnp
    out = vol
    for ax, tgt in enumerate(target):
        size = out.shape[ax]
        if size > tgt:
            lo = -(-(size - tgt) // 2)  # ceil: extra cropped from the front
            sl = [slice(None)] * out.ndim
            sl[ax] = slice(lo, lo + tgt)
            out = out[tuple(sl)]
        elif size < tgt:
            lo = -(-(tgt - size) // 2)  # ceil: extra padded at the front
            pads = [(0, 0)] * out.ndim
            pads[ax] = (lo, tgt - size - lo)
            out = xp.pad(out, pads, constant_values=pad_value)
    return out


# -----------------------------------------------------------------------------
# masked percentile rescale
# -----------------------------------------------------------------------------


@jax.jit
def percentile_rescale(
    vol: jax.Array,
    mask: jax.Array,
    out_min: float = 0.0,
    out_max: float = 1.0,
    p_low: float = 1.0,
    p_high: float = 99.0,
) -> jax.Array:
    """Rescale intensities to [out_min, out_max] using percentile cutoffs
    computed over mask>0 voxels (tio.RescaleIntensity masked semantics).

    An EMPTY mask (blank/corrupt scan) yields NaN percentiles which would
    silently poison everything downstream (stacked train arrays, eval
    metrics) — guard by falling back to [0, 1] cutoffs, returning a zero
    volume for an all-zero input instead of NaNs."""
    vals = jnp.where(mask > 0, vol, jnp.nan)
    lo = jnp.nanpercentile(vals, p_low)
    hi = jnp.nanpercentile(vals, p_high)
    lo = jnp.where(jnp.isnan(lo), 0.0, lo)
    hi = jnp.where(jnp.isnan(hi), 1.0, hi)
    rng = jnp.where(hi - lo > 1e-8, hi - lo, 1.0)
    out = (jnp.clip(vol, lo, hi) - lo) / rng
    return out * (out_max - out_min) + out_min


# -----------------------------------------------------------------------------
# curvature flow denoising (the read-time smoother)
# -----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("target", "pad_value"))
def crop_or_pad_dynamic(vol, ext, target: tuple, pad_value: float = 0.0):
    """`crop_or_pad` for a volume whose TRUE extent `ext` (a traced [3] int
    array) may be smaller than its (bucket-padded) array shape — the
    shape-bucketing device-preprocess path: one compiled program serves every
    raw shape within a bucket. Everything at indices >= ext along an axis
    must already equal `pad_value`. Per axis: statically pad `t` on both
    sides, then take ONE dynamic slice of length t whose start encodes the
    tio.CropOrPad ceil-front crop/pad split."""
    import jax

    out = vol
    for ax, t in enumerate(target):
        n = ext[ax]
        pads = [(0, 0)] * out.ndim
        pads[ax] = (t, t)
        p = jnp.pad(out, pads, constant_values=pad_value)
        start = t + jnp.where(n >= t, (n - t + 1) // 2, -((t - n + 1) // 2))
        starts = [jnp.int32(0)] * out.ndim
        starts[ax] = start.astype(jnp.int32)
        sizes = list(out.shape)
        sizes[ax] = t
        out = jax.lax.dynamic_slice(p, starts, sizes)
    return out


def zero_beyond_extent(vol, ext):
    """Zero all positions at or past the true extent along each axis."""
    for ax in range(vol.ndim):
        idx = jnp.arange(vol.shape[ax])
        shape = [1] * vol.ndim
        shape[ax] = -1
        vol = vol * (idx < ext[ax]).reshape(shape).astype(vol.dtype)
    return vol


def _shift_clamped(I, d, ext):
    """Neighbor shift with edge replication AT THE TRUE EXTENT: equivalent to
    slicing an edge-padded copy of I[:ext] — per axis, gather with indices
    clip(arange + d, 0, ext-1)."""
    out = I
    for ax, dd in enumerate(d):
        if dd == 0:
            continue
        idx = jnp.clip(jnp.arange(I.shape[ax]) + dd, 0, ext[ax] - 1)
        out = jnp.take(out, idx, axis=ax)
    return out


@partial(jax.jit, static_argnames=("iterations",))
def curvature_flow(
    vol: jax.Array, timestep: float = 0.125, iterations: int = 3, ext=None
) -> jax.Array:
    """Mean-curvature-flow denoising I_t = kappa * |grad I| on a 3D volume,
    central-difference discretization (the sitk.CurvatureFlow capability;
    exact ITK stencil details differ slightly — this is a preprocessing
    smoother, validated for statistical parity in tests).

    `ext`: optional traced [3] true extent for bucket-padded inputs — the
    stencil then edge-replicates at the true boundary (identical arithmetic
    to running on the unpadded array) and the result is re-zeroed beyond the
    extent."""
    v = vol.astype(jnp.float32)

    if ext is not None:

        def step(_, I):
            sh = lambda dx, dy, dz: _shift_clamped(I, (dx, dy, dz), ext)
            c = I
            xp, xm = sh(1, 0, 0), sh(-1, 0, 0)
            yp, ym = sh(0, 1, 0), sh(0, -1, 0)
            zp, zm = sh(0, 0, 1), sh(0, 0, -1)
            ix = (xp - xm) * 0.5
            iy = (yp - ym) * 0.5
            iz = (zp - zm) * 0.5
            ixx = xp - 2 * c + xm
            iyy = yp - 2 * c + ym
            izz = zp - 2 * c + zm
            ixy = (sh(1, 1, 0) - sh(1, -1, 0) - sh(-1, 1, 0) + sh(-1, -1, 0)) * 0.25
            ixz = (sh(1, 0, 1) - sh(1, 0, -1) - sh(-1, 0, 1) + sh(-1, 0, -1)) * 0.25
            iyz = (sh(0, 1, 1) - sh(0, 1, -1) - sh(0, -1, 1) + sh(0, -1, -1)) * 0.25
            g2 = ix**2 + iy**2 + iz**2
            num = (
                ixx * (iy**2 + iz**2)
                + iyy * (ix**2 + iz**2)
                + izz * (ix**2 + iy**2)
                - 2 * (ix * iy * ixy + ix * iz * ixz + iy * iz * iyz)
            )
            upd = jnp.where(g2 > 1e-12, num / (g2 + 1e-12), 0.0)
            return I + timestep * upd

        out = jax.lax.fori_loop(0, iterations, step, v)
        return zero_beyond_extent(out, ext)

    def step(_, I):
        Ip = jnp.pad(I, 1, mode="edge")
        c = Ip[1:-1, 1:-1, 1:-1]
        xp, xm = Ip[2:, 1:-1, 1:-1], Ip[:-2, 1:-1, 1:-1]
        yp, ym = Ip[1:-1, 2:, 1:-1], Ip[1:-1, :-2, 1:-1]
        zp, zm = Ip[1:-1, 1:-1, 2:], Ip[1:-1, 1:-1, :-2]
        ix = (xp - xm) * 0.5
        iy = (yp - ym) * 0.5
        iz = (zp - zm) * 0.5
        ixx = xp - 2 * c + xm
        iyy = yp - 2 * c + ym
        izz = zp - 2 * c + zm
        ixy = (
            Ip[2:, 2:, 1:-1] - Ip[2:, :-2, 1:-1] - Ip[:-2, 2:, 1:-1] + Ip[:-2, :-2, 1:-1]
        ) * 0.25
        ixz = (
            Ip[2:, 1:-1, 2:] - Ip[2:, 1:-1, :-2] - Ip[:-2, 1:-1, 2:] + Ip[:-2, 1:-1, :-2]
        ) * 0.25
        iyz = (
            Ip[1:-1, 2:, 2:] - Ip[1:-1, 2:, :-2] - Ip[1:-1, :-2, 2:] + Ip[1:-1, :-2, :-2]
        ) * 0.25
        g2 = ix**2 + iy**2 + iz**2
        num = (
            ixx * (iy**2 + iz**2)
            + iyy * (ix**2 + iz**2)
            + izz * (ix**2 + iy**2)
            - 2 * (ix * iy * ixy + ix * iz * ixz + iy * iz * iyz)
        )
        upd = jnp.where(g2 > 1e-12, num / (g2 + 1e-12), 0.0)
        return I + timestep * upd

    return jax.lax.fori_loop(0, iterations, step, v)


# -----------------------------------------------------------------------------
# cubic B-spline resampling (tio.Resample 'bspline')
# -----------------------------------------------------------------------------

_POLE = math.sqrt(3.0) - 2.0  # cubic B-spline prefilter pole
_GAIN = (1.0 - _POLE) * (1.0 - 1.0 / _POLE)  # = 6.0


def _prefilter_axis0(x: jax.Array) -> jax.Array:
    """Recursive causal/anti-causal prefilter along axis 0 (Unser's algorithm):
    converts samples to cubic B-spline interpolation coefficients."""
    n = x.shape[0]
    z = _POLE
    x = x * _GAIN

    # causal init (truncated-horizon mirror; |z|^14 < 1e-8)
    horizon = min(n, 14)
    powers = z ** jnp.arange(horizon, dtype=jnp.float32)
    c0 = jnp.tensordot(powers, x[:horizon], axes=1)

    def causal(carry, xi):
        y = xi + z * carry
        return y, y

    _, cp = jax.lax.scan(causal, c0, x[1:])
    cp = jnp.concatenate([c0[None], cp], axis=0)

    # anti-causal init + backward pass
    last = (z / (z * z - 1.0)) * (cp[n - 1] + z * cp[n - 2])

    def anticausal(carry, ci):
        y = z * (carry - ci)
        return y, y

    _, cm = jax.lax.scan(anticausal, last, cp[:-1][::-1])
    return jnp.concatenate([cm[::-1], last[None]], axis=0)


def bspline_prefilter(vol: jax.Array) -> jax.Array:
    """Prefilter a 3D volume along all axes."""
    c = vol.astype(jnp.float32)
    for ax in range(c.ndim):
        c = jnp.moveaxis(_prefilter_axis0(jnp.moveaxis(c, ax, 0)), 0, ax)
    return c


def _bspline_weights(f: jax.Array):
    """Cubic B-spline weights for taps at offsets (-1, 0, 1, 2) given fractional
    position f in [0,1)."""
    f2 = f * f
    f3 = f2 * f
    w0 = (1 - f) ** 3 / 6.0
    w1 = (3 * f3 - 6 * f2 + 4) / 6.0
    w2 = (-3 * f3 + 3 * f2 + 3 * f + 1) / 6.0
    w3 = f3 / 6.0
    return w0, w1, w2, w3


def _mirror_idx(idx: jax.Array, n: int) -> jax.Array:
    """Reflect out-of-range indices (mirror boundary without edge repeat)."""
    idx = jnp.abs(idx)
    return jnp.where(idx >= n, 2 * (n - 1) - idx, idx)


def _interp_axis0(coeffs: jax.Array, positions: jax.Array) -> jax.Array:
    n = coeffs.shape[0]
    base = jnp.floor(positions).astype(jnp.int32)
    f = positions - base
    w0, w1, w2, w3 = _bspline_weights(f)
    ws = [w0, w1, w2, w3]
    out = 0.0
    for k in range(4):
        idx = _mirror_idx(base + (k - 1), n)
        tap = jnp.take(coeffs, idx, axis=0)
        w = ws[k].reshape((-1,) + (1,) * (coeffs.ndim - 1))
        out = out + w * tap
    return out


@partial(jax.jit, static_argnames=("out_shape",))
def bspline_resample_to(vol: jax.Array, out_shape: tuple, factors: tuple = None) -> jax.Array:
    """Cubic-B-spline resample a 3D volume to `out_shape`, sampling input index
    i_out * factor per axis (ITK/torchio Resample-with-spacing semantics;
    factor defaults to in/out ratio per axis)."""
    c = bspline_prefilter(vol)
    for ax in range(3):
        n_out = out_shape[ax]
        factor = (
            factors[ax] if factors is not None else vol.shape[ax] / out_shape[ax]
        )
        pos = jnp.arange(n_out, dtype=jnp.float32) * factor
        c = jnp.moveaxis(_interp_axis0(jnp.moveaxis(c, ax, 0), pos), 0, ax)
    return c


def bspline_downsample(vol: jax.Array, factor: float) -> jax.Array:
    """tio.Resample(factor, 'bspline') for isotropic-spacing volumes: target
    spacing = factor x source spacing, new size = ceil(size / factor)."""
    out_shape = tuple(int(math.ceil(s / factor)) for s in vol.shape)
    return bspline_resample_to(vol, out_shape, factors=(factor,) * 3)


def nearest_downsample(vol: jax.Array, factor: float) -> jax.Array:
    """Label-map resampling (masks/segs use nearest neighbor)."""
    out_shape = tuple(int(math.ceil(s / factor)) for s in vol.shape)
    idx = [
        jnp.clip(
            jnp.round(jnp.arange(n, dtype=jnp.float32) * factor).astype(jnp.int32),
            0,
            vol.shape[ax] - 1,
        )
        for ax, n in enumerate(out_shape)
    ]
    out = vol
    for ax in range(3):
        out = jnp.take(out, idx[ax], axis=ax)
    return out


