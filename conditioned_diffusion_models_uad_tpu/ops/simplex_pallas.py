"""Pallas TPU kernel for fractal OpenSimplex-2D noise.

The reference's native-performance component is a numba-LLVM simplex kernel on
the host CPU (reference: src/utils/generate_noise.py:252-891, SURVEY.md §2.5);
here it is a hand-written TPU kernel: the full fractal field (all octaves)
evaluates in ONE VMEM-resident Pallas program — no HBM round-trips between
octaves, no host involvement.

Key deviation from the table-based implementation in `ops/simplex.py` (which
remains the golden-parity path): the 256-entry permutation-table lookup is a
data-dependent *gather*, which maps poorly onto the TPU VPU. The kernel uses a
murmur-style integer hash of the lattice coordinates instead — pure arithmetic,
fully vectorized, statistically equivalent (the reference reseeds every call,
so only the noise distribution matters; SURVEY.md §7 "hard parts"). The
gradient set is the same 8-direction octagon, selected arithmetically from the
hash's low 3 bits, so the spectrum/amplitude match the table path.

`fractal_noise_2d_hash` is the identical math in plain JAX — the twin used to
test the kernel exactly and to serve non-TPU backends.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .simplex import NORM2, SQUISH2, STRETCH2

import numpy as np

_M1 = np.uint32(0x27D4EB2D)
_M2 = np.uint32(0x9E3779B9)
_M3 = np.uint32(0x85EBCA6B)


def _hash_grad(xsv, ysv, seed):
    """Arithmetic gradient selection: murmur-style avalanche of the lattice
    coords -> 3 bits -> one of the 8 octagon gradients (+-5,+-2)/(+-2,+-5).
    Gather-free: everything is VPU int/float ops."""
    h = (
        xsv.astype(jnp.uint32) * _M1
        ^ ysv.astype(jnp.uint32) * _M2
        ^ seed.astype(jnp.uint32)
    )
    h = h ^ (h >> 15)
    h = h * _M3
    h = h ^ (h >> 13)
    swap = (h & 4) != 0
    s1 = jnp.where((h & 1) != 0, -1.0, 1.0)
    s2 = jnp.where((h & 2) != 0, -1.0, 1.0)
    gx = s1 * jnp.where(swap, 2.0, 5.0)
    gy = s2 * jnp.where(swap, 5.0, 2.0)
    return gx, gy


def _simplex2_hash(x, y, seed):
    """OpenSimplex-2D with hashed gradients; same cell geometry as
    ops/simplex.opensimplex2 (which mirrors the reference _noise2)."""

    def contribution(dx, dy, xsv, ysv):
        attn = jnp.maximum(2.0 - dx * dx - dy * dy, 0.0)
        attn2 = attn * attn
        gx, gy = _hash_grad(xsv, ysv, seed)
        return attn2 * attn2 * (gx * dx + gy * dy)

    stretch = (x + y) * STRETCH2
    xs = x + stretch
    ys = y + stretch
    xsb = jnp.floor(xs).astype(jnp.int32)
    ysb = jnp.floor(ys).astype(jnp.int32)
    squish = (xsb + ysb).astype(jnp.float32) * SQUISH2
    dx0 = x - (xsb + squish)
    dy0 = y - (ysb + squish)
    xins = xs - xsb
    yins = ys - ysb
    in_sum = xins + yins

    value = contribution(dx0 - 1 - SQUISH2, dy0 - SQUISH2, xsb + 1, ysb)
    value += contribution(dx0 - SQUISH2, dy0 - 1 - SQUISH2, xsb, ysb + 1)

    lower = in_sum <= 1.0
    xgty = xins > yins

    zins_l = 1.0 - in_sum
    a_l = (zins_l > xins) | (zins_l > yins)
    ext_x_l = jnp.where(a_l, jnp.where(xgty, xsb + 1, xsb - 1), xsb + 1)
    ext_y_l = jnp.where(a_l, jnp.where(xgty, ysb - 1, ysb + 1), ysb + 1)
    ext_dx_l = jnp.where(a_l, jnp.where(xgty, dx0 - 1, dx0 + 1), dx0 - 1 - 2 * SQUISH2)
    ext_dy_l = jnp.where(a_l, jnp.where(xgty, dy0 + 1, dy0 - 1), dy0 - 1 - 2 * SQUISH2)

    zins_u = 2.0 - in_sum
    a_u = (zins_u < xins) | (zins_u < yins)
    ext_x_u = jnp.where(a_u, jnp.where(xgty, xsb + 2, xsb), xsb)
    ext_y_u = jnp.where(a_u, jnp.where(xgty, ysb, ysb + 2), ysb)
    ext_dx_u = jnp.where(a_u, jnp.where(xgty, dx0 - 2 - 2 * SQUISH2, dx0 - 2 * SQUISH2), dx0)
    ext_dy_u = jnp.where(a_u, jnp.where(xgty, dy0 - 2 * SQUISH2, dy0 - 2 - 2 * SQUISH2), dy0)

    ext_x = jnp.where(lower, ext_x_l, ext_x_u)
    ext_y = jnp.where(lower, ext_y_l, ext_y_u)
    ext_dx = jnp.where(lower, ext_dx_l, ext_dx_u)
    ext_dy = jnp.where(lower, ext_dy_l, ext_dy_u)

    c_x = jnp.where(lower, xsb, xsb + 1)
    c_y = jnp.where(lower, ysb, ysb + 1)
    c_dx = jnp.where(lower, dx0, dx0 - 1 - 2 * SQUISH2)
    c_dy = jnp.where(lower, dy0, dy0 - 1 - 2 * SQUISH2)

    value += contribution(c_dx, c_dy, c_x, c_y)
    value += contribution(ext_dx, ext_dy, ext_x, ext_y)
    return value / NORM2


def _fractal_body(h, w, seed_u32, octaves, persistence, frequency):
    # Mosaic requires integer iota; cast after
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    out = jnp.zeros((h, w), jnp.float32)
    amp = 1.0
    f = float(frequency)
    for _ in range(octaves):
        out = out + amp * _simplex2_hash(jj / f, ii / f, seed_u32)
        f /= 2.0
        amp *= persistence
    return out


@partial(jax.jit, static_argnames=("shape", "octaves", "persistence", "frequency"))
def fractal_noise_2d_hash(
    seed: jax.Array,  # int32 scalar
    shape: tuple,
    octaves: int = 6,
    persistence: float = 0.8,
    frequency: float = 64.0,
) -> jax.Array:
    """Plain-JAX twin of the Pallas kernel (exact same values)."""
    h, w = shape
    return _fractal_body(h, w, jnp.asarray(seed, jnp.int32).astype(jnp.uint32),
                         octaves, persistence, frequency)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("shape", "octaves", "persistence", "frequency", "interpret"))
def fractal_noise_2d_pallas(
    seed: jax.Array,  # int32 scalar
    shape: tuple,
    octaves: int = 6,
    persistence: float = 0.8,
    frequency: float = 64.0,
    interpret: bool = False,
) -> jax.Array:
    """Fractal OpenSimplex field [H, W] as one fused Pallas TPU program.

    The (padded-to-tile) field fits in VMEM (96x128 fp32 = 48 KB), so a single
    block computes every octave back-to-back on the VPU with zero intermediate
    HBM traffic. Set interpret=True off-TPU (tests use it)."""
    h, w = shape
    hp = _round_up(max(h, 8), 8)
    wp = _round_up(max(w, 128), 128)

    def kernel(seed_ref, out_ref):
        seed_u32 = seed_ref[0].astype(jnp.uint32)
        out_ref[:] = _fractal_body(hp, wp, seed_u32, octaves, persistence, frequency)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1))
    return out[:h, :w]


def gen_simplex_noise_pallas_nhwc(
    key: jax.Array,
    shape: tuple,  # [B, H, W, C]
    octaves: int = 6,
    persistence: float = 0.8,
    frequency: float = 64.0,
) -> jax.Array:
    """Drop-in for ops.simplex.gen_simplex_noise_nhwc backed by the kernel:
    one (H, W) field per call broadcast over batch and channel (the reference
    broadcast semantics, generate_noise.py:44-51)."""
    b, h, w, c = shape
    seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
    interpret = jax.default_backend() != "tpu"
    field = fractal_noise_2d_pallas(
        seed, (h, w), octaves, persistence, frequency, interpret=interpret
    )
    return jnp.broadcast_to(field[None, :, :, None], shape)
