"""Device-side exact euclidean surface Hausdorff distance.

Replaces the last expensive host metric of the per-volume eval chain
(`metrics.hausdorff_distance`, parity with monai's symmetric surface
Hausdorff — reference src/utils/utils_eval.py:132-135): the bbox-cropped
scipy `distance_transform_edt` costs up to seconds on host for large lesions,
while the TPU computes the same thing in milliseconds.

Method — separable squared EDT (Felzenszwalb/Huttenlocher): the squared
euclidean distance transform factorizes into three 1-D min-plus transforms

    dt2[i] = min_j ( f[j] + (i - j)^2 )

applied along each axis in turn. Instead of the sequential lower-envelope
algorithm (stack-based, hostile to XLA), each 1-D transform is evaluated by
BRUTE FORCE as a broadcast [n, n] min-reduction, chunked over the other two
axes with `lax.map` so the intermediate stays ~tens of MB. Work is
O(N * (H + W + D)) f32 min/adds — a few ms of VPU time per volume, exact.

All squared distances are integers below 2^24, so f32 arithmetic is EXACT —
the returned max squared distances match scipy's f64 transform bit-for-bit
after the final host-side sqrt.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_CHUNK = 256  # rows per lax.map step: _CHUNK * n^2 f32 intermediate


def _minplus_pass(f: jax.Array) -> jax.Array:
    """One 1-D squared-EDT min-plus transform along the LAST axis.
    f: [..., n] current squared distances; returns same shape."""
    n = f.shape[-1]
    i = jnp.arange(n, dtype=jnp.float32)
    d2 = (i[:, None] - i[None, :]) ** 2  # [n_out, n_src]

    lead = f.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    flat = f.reshape(rows, n)
    pad = (-rows) % _CHUNK
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))

    def chunk(rows_c):  # [C, n] -> [C, n]
        return jnp.min(rows_c[:, None, :] + d2[None], axis=-1)

    out = lax.map(chunk, flat.reshape(-1, _CHUNK, n)).reshape(-1, n)
    return out[:rows].reshape(*lead, n)


def _edt2(mask: jax.Array) -> jax.Array:
    """Exact squared euclidean distance from every voxel to the nearest TRUE
    voxel of `mask` (scipy: distance_transform_edt(~mask)**2). INF-free: uses
    a finite sentinel larger than any reachable squared distance."""
    h, w, d = mask.shape
    big = jnp.float32(h * h + w * w + d * d + 1)
    f = jnp.where(mask, jnp.float32(0), big)
    for axis in range(3):
        f = jnp.moveaxis(_minplus_pass(jnp.moveaxis(f, axis, -1)), -1, axis)
    return f


def _surface(mask: jax.Array) -> jax.Array:
    """mask minus its 6-connectivity erosion (metrics._surface twin)."""
    m = mask.astype(bool)
    pad = jnp.pad(m, 1, constant_values=False)  # scipy border_value=0
    er = m
    for axis in range(3):
        lo = [slice(1, -1)] * 3
        hi = [slice(1, -1)] * 3
        lo[axis] = slice(0, -2)
        hi[axis] = slice(2, None)
        er = er & pad[tuple(lo)] & pad[tuple(hi)]
    return m & ~er


@jax.jit
def hausdorff_sq_pair(pred: jax.Array, target: jax.Array):
    """(max_sq_dist pred-surface -> target-surface, the reverse) as f32
    scalars; -1.0 signals an empty mask (host maps it to nan, the monai
    convention the reference filters, utils_eval.py:255)."""
    p = pred.astype(bool)
    t = target.astype(bool)
    ps = _surface(p)
    ts = _surface(t)
    dt_t = _edt2(ts)
    dt_p = _edt2(ps)
    d_pt = jnp.max(jnp.where(ps, dt_t, jnp.float32(0)))
    d_tp = jnp.max(jnp.where(ts, dt_p, jnp.float32(0)))
    empty = ~p.any() | ~t.any()
    return (
        jnp.where(empty, jnp.float32(-1), d_pt),
        jnp.where(empty, jnp.float32(-1), d_tp),
    )


def hausdorff_distance_device(pred, target) -> float:
    """Drop-in for metrics.hausdorff_distance computed on device: two scalar
    fetches instead of host distance transforms. Inputs may be host numpy
    (cheap H2D on the fast direction) or device arrays."""
    d_pt, d_tp = hausdorff_sq_pair(jnp.asarray(pred), jnp.asarray(target))
    a, b = float(d_pt), float(d_tp)
    if a < 0 or b < 0:
        return float("nan")
    return float(np.sqrt(max(a, b)))
