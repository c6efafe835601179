"""Vectorized 3D simplex noise + the reference's octave API surface.

Capability parity with the reference's ``Simplex_CLASS`` 3D members
(reference: src/utils/generate_noise.py — `rand_3d_octaves` :78-95,
`rand_3d_fixed_T_octaves` :116-133, backed by the ~500-line branch-heavy numba
`_noise3` :362-871). The reference's active training path only uses the 2D
field; the 3D members are part of the public noise API, so they are rebuilt
here TPU-style: the classic Gustavson simplex-3D lattice (skew F=1/3, unskew
G=1/6, corner ranking by masked comparisons, 4 corner contributions) with the
same murmur-hashed arithmetic gradient selection as the Pallas 2D kernel —
branchless, gather-free, statistically equivalent band-limited gradient noise
(the parity contract of SURVEY.md §7).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_F3 = 1.0 / 3.0
_G3 = 1.0 / 6.0

_M1 = np.uint32(0x27D4EB2D)
_M2 = np.uint32(0x9E3779B9)
_M3 = np.uint32(0x85EBCA6B)
_M4 = np.uint32(0x165667B1)


def _hash_grad3(i, j, k, seed):
    """12 cube-edge gradients (+-1,+-1,0)/(+-1,0,+-1)/(0,+-1,+-1), selected
    arithmetically from a murmur-style hash — no table gather."""
    h = (
        i.astype(jnp.uint32) * _M1
        ^ j.astype(jnp.uint32) * _M2
        ^ k.astype(jnp.uint32) * _M4
        ^ seed.astype(jnp.uint32)
    )
    h = h ^ (h >> 15)
    h = h * _M3
    h = h ^ (h >> 13)
    idx = h % jnp.uint32(12)
    axis = idx >> 2  # 0: (x,y), 1: (x,z), 2: (y,z)
    s1 = jnp.where((idx & 1) != 0, -1.0, 1.0)
    s2 = jnp.where((idx & 2) != 0, -1.0, 1.0)
    gx = jnp.where(axis == 0, s1, jnp.where(axis == 1, s1, 0.0))
    gy = jnp.where(axis == 0, s2, jnp.where(axis == 2, s1, 0.0))
    gz = jnp.where(axis == 0, 0.0, s2)
    return gx, gy, gz


def simplex3(x, y, z, seed):
    """Classic simplex noise in 3D, fully vectorized. Returns ~[-1, 1]."""
    s = (x + y + z) * _F3
    i = jnp.floor(x + s).astype(jnp.int32)
    j = jnp.floor(y + s).astype(jnp.int32)
    k = jnp.floor(z + s).astype(jnp.int32)
    t = (i + j + k).astype(jnp.float32) * _G3
    x0 = x - (i - t)
    y0 = y - (j - t)
    z0 = z - (k - t)

    # simplex corner ranking (the 6 branch cases as boolean algebra)
    A = x0 >= y0
    B = y0 >= z0
    C = x0 >= z0
    i1 = jnp.where(A, (B | C), False)
    j1 = jnp.where(A, False, B)
    k1 = jnp.where(A, ~(B | C), ~B)
    i2 = jnp.where(A, True, B & C)
    j2 = jnp.where(A, B, True)
    k2 = jnp.where(A, ~B, ~(B & C))
    i1 = i1.astype(jnp.int32); j1 = j1.astype(jnp.int32); k1 = k1.astype(jnp.int32)
    i2 = i2.astype(jnp.int32); j2 = j2.astype(jnp.int32); k2 = k2.astype(jnp.int32)

    x1 = x0 - i1 + _G3
    y1 = y0 - j1 + _G3
    z1 = z0 - k1 + _G3
    x2 = x0 - i2 + 2.0 * _G3
    y2 = y0 - j2 + 2.0 * _G3
    z2 = z0 - k2 + 2.0 * _G3
    x3 = x0 - 1.0 + 3.0 * _G3
    y3 = y0 - 1.0 + 3.0 * _G3
    z3 = z0 - 1.0 + 3.0 * _G3

    def corner(dx, dy, dz, ci, cj, ck):
        att = jnp.maximum(0.6 - dx * dx - dy * dy - dz * dz, 0.0)
        gx, gy, gz = _hash_grad3(ci, cj, ck, seed)
        att2 = att * att
        return att2 * att2 * (gx * dx + gy * dy + gz * dz)

    n = corner(x0, y0, z0, i, j, k)
    n += corner(x1, y1, z1, i + i1, j + j1, k + k1)
    n += corner(x2, y2, z2, i + i2, j + j2, k + k2)
    n += corner(x3, y3, z3, i + 1, j + 1, k + 1)
    return 32.0 * n


@partial(jax.jit, static_argnames=("shape", "octaves", "persistence", "frequency"))
def fractal_noise_3d(
    seed: jax.Array,
    shape: tuple,  # (D, H, W) — reference (z, y, x) order
    octaves: int = 6,
    persistence: float = 0.8,
    frequency: float = 64.0,
) -> jax.Array:
    """Layered 3D fractal noise (reference rand_3d_octaves semantics:
    noise[z, y, x] = noise3(x/f, y/f, z/f), octaves halving frequency)."""
    d, h, w = shape
    seed = jnp.asarray(seed, jnp.int32).astype(jnp.uint32)
    zz = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    yy = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(jnp.float32)
    out = jnp.zeros(shape, jnp.float32)
    amp = 1.0
    f = float(frequency)
    for _ in range(octaves):
        out = out + amp * simplex3(xx / f, yy / f, zz / f, seed)
        f /= 2.0
        amp *= persistence
    return out


@partial(jax.jit, static_argnames=("shape", "octaves", "persistence", "frequency"))
def fractal_noise_3d_fixed_t(
    seed: jax.Array,
    t: jax.Array,  # scalar time coordinate
    shape: tuple,  # (H, W)
    octaves: int = 6,
    persistence: float = 0.8,
    frequency: float = 64.0,
) -> jax.Array:
    """One (1, H, W) slice of the 3D field at a fixed time plane
    (reference rand_3d_fixed_T_octaves, generate_noise.py:116-133 — used to
    draw a distinct-but-coherent field per diffusion timestep)."""
    h, w = shape
    seed = jnp.asarray(seed, jnp.int32).astype(jnp.uint32)
    t = jnp.asarray(t, jnp.float32)
    yy = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    out = jnp.zeros(shape, jnp.float32)
    amp = 1.0
    f = float(frequency)
    for _ in range(octaves):
        out = out + amp * simplex3(xx / f, yy / f, jnp.broadcast_to(t / f, shape), seed)
        f /= 2.0
        amp *= persistence
    return out[None]


# The AnoDDPM random-parameter pool (reference generate_simplex_noise
# random_param branch, generate_noise.py:26-44): (octaves, persistence, freq)
RANDOM_PARAM_POOL = (
    (2, 0.6, 16), (6, 0.6, 32), (7, 0.7, 32), (10, 0.8, 64), (5, 0.8, 16),
    (4, 0.6, 16), (1, 0.6, 64), (7, 0.8, 128), (6, 0.9, 64), (2, 0.85, 128),
    (2, 0.85, 64), (2, 0.85, 32), (2, 0.85, 16), (2, 0.85, 8), (2, 0.85, 4),
    (2, 0.85, 2), (1, 0.85, 128), (1, 0.85, 64), (1, 0.85, 32), (1, 0.85, 16),
    (1, 0.85, 8), (1, 0.85, 4), (1, 0.85, 2),
)


def gen_simplex_noise_random_param(
    rng: np.random.Generator, shape: tuple, t: float
) -> jax.Array:
    """Host-dispatched random-parameter simplex noise: draw one (octaves,
    persistence, frequency) triple from the AnoDDPM pool and evaluate the
    fixed-T 3D field [1, H, W] (each triple compiles once; 23 variants max)."""
    octv, pers, freq = RANDOM_PARAM_POOL[int(rng.integers(len(RANDOM_PARAM_POOL)))]
    seed = jnp.int32(int(rng.integers(0, 2**31 - 1)))
    return fractal_noise_3d_fixed_t(
        seed, float(t), tuple(shape), octv, pers, float(freq)
    )


class SimplexNoise:
    """API-compatible stand-in for the reference ``Simplex_CLASS``
    (generate_noise.py:55-133): `newSeed()` + rand_2d/3d octave methods,
    everything backed by the jitted on-device evaluators."""

    def __init__(self, seed: int = 0):
        self._seed = int(seed)

    def newSeed(self, seed: int | None = None):
        if seed is None:
            seed = int(np.random.default_rng().integers(0, 2**31 - 1))
        self._seed = int(seed)

    def rand_2d_octaves(self, shape, octaves=1, persistence=0.5, frequency=32):
        from .simplex_pallas import fractal_noise_2d_hash

        return fractal_noise_2d_hash(
            jnp.int32(self._seed), tuple(shape), octaves, persistence, float(frequency)
        )

    def rand_3d_octaves(self, shape, octaves=1, persistence=0.5, frequency=32):
        return fractal_noise_3d(
            jnp.int32(self._seed), tuple(shape), octaves, persistence, float(frequency)
        )

    def rand_3d_fixed_T_octaves(
        self, shape, T, octaves=1, persistence=0.5, frequency=32
    ):
        return fractal_noise_3d_fixed_t(
            jnp.int32(self._seed), T, tuple(shape), octaves, persistence,
            float(frequency),
        )
