"""Fractal OpenSimplex noise, vectorized for TPU.

Capability parity with the reference's noise generator
(reference: src/utils/generate_noise.py — numba ``@njit`` kernels `_noise2`/`_noise2a`,
fractal accumulation `rand_2d_octaves`, LCG permutation init `_init`, and the
`gen_noise` entry that emits ONE (H,W) field broadcast across the batch at half
precision).  The reference JIT-compiles branch-heavy per-pixel code with LLVM; on
TPU the same math is expressed branchlessly — every candidate vertex contribution is
computed for all pixels and masked — so the whole lattice evaluates as a handful of
fused VPU ops plus four small table gathers.

Parity contract (SURVEY.md §7 "hard parts"): *statistical* parity, not bit parity —
the reference reseeds randomly on every call, so the model only ever sees the
distribution.  `perm_from_seed_lcg` reproduces the reference's exact permutation
construction for golden tests; the training path uses `perm_from_key` (a uniform
random permutation from the JAX PRNG, the same distribution) so noise generation
stays on-device inside the jitted train step instead of on the host CPU
(the reference regenerates noise on host every step — a key perf win here).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

STRETCH2 = -0.211324865405187  # (1/sqrt(2+1)-1)/2
SQUISH2 = 0.366025403784439  # (sqrt(2+1)-1)/2
NORM2 = 47.0

# Gradient table for 2D: directions to the vertices of an octagon, as an (8, 2)
# float table indexed by (hash & 0x0E) >> 1.
_GRAD2 = np.array(
    [
        [5, 2], [2, 5],
        [-5, 2], [-2, 5],
        [5, -2], [2, -5],
        [-5, -2], [-2, -5],
    ],
    dtype=np.float32,
)

_LCG_MULT = 6364136223846793005
_LCG_ADD = 1442695040888963407
_I64 = (1 << 64)


def _lcg(seed: int) -> int:
    return ((seed * _LCG_MULT + _LCG_ADD) % _I64 + _I64) % _I64


def _to_signed(v: int) -> int:
    return v - _I64 if v >= (1 << 63) else v


def perm_from_seed_lcg(seed: int = 3) -> np.ndarray:
    """Exact reproduction of the reference's permutation-table construction
    (generate_noise.py:214-232): three LCG warmup steps, then a Fisher-Yates
    style draw using the signed-64-bit LCG state."""
    perm = np.zeros(256, dtype=np.int32)
    source = np.arange(256)
    s = seed % _I64
    for _ in range(3):
        s = _lcg(s)
    for i in range(255, -1, -1):
        s = _lcg(s)
        signed = _to_signed(s)
        r = int((signed + 31) % (i + 1))
        if r < 0:
            r += i + 1
        perm[i] = source[r]
        source[r] = source[i]
    return perm


def perm_from_key(key: jax.Array) -> jax.Array:
    """Uniform random permutation of 0..255 from the JAX PRNG — distributionally
    identical to the LCG table, but generated on device inside jit."""
    return jax.random.permutation(key, 256).astype(jnp.int32)


def opensimplex2(x: jax.Array, y: jax.Array, perm: jax.Array) -> jax.Array:
    """Branchless vectorized OpenSimplex-2D evaluation.

    x, y: float arrays (same shape), perm: int32[256]. Returns noise in ~[-1, 1].
    All four candidate vertex contributions are computed for every point and
    combined with masks (the TPU replacement for the reference's per-pixel
    branchy numba kernel, generate_noise.py:252-349).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    perm = perm.astype(jnp.int32)
    grad2 = jnp.asarray(_GRAD2)

    def extrapolate(xsb, ysb, dx, dy):
        idx = perm[(perm[xsb & 0xFF] + ysb) & 0xFF] & 0x0E
        g = grad2[idx >> 1]
        return g[..., 0] * dx + g[..., 1] * dy

    def contribution(dx, dy, xsv, ysv):
        attn = 2.0 - dx * dx - dy * dy
        attn = jnp.maximum(attn, 0.0)
        attn2 = attn * attn
        return attn2 * attn2 * extrapolate(xsv, ysv, dx, dy)

    stretch = (x + y) * STRETCH2
    xs = x + stretch
    ys = y + stretch
    xsb = jnp.floor(xs).astype(jnp.int32)
    ysb = jnp.floor(ys).astype(jnp.int32)
    squish = (xsb + ysb).astype(jnp.float32) * SQUISH2
    xb = xsb + squish
    yb = ysb + squish
    xins = xs - xsb
    yins = ys - ysb
    in_sum = xins + yins
    dx0 = x - xb
    dy0 = y - yb

    # Contributions (1,0) and (0,1) — unconditional.
    value = contribution(dx0 - 1 - SQUISH2, dy0 - SQUISH2, xsb + 1, ysb)
    value += contribution(dx0 - SQUISH2, dy0 - 1 - SQUISH2, xsb, ysb + 1)

    lower = in_sum <= 1.0  # inside the (0,0) simplex vs the (1,1) simplex
    xgty = xins > yins

    # --- extra vertex selection (four cases per half, chosen with masks) ---
    zins_l = 1.0 - in_sum
    a_l = (zins_l > xins) | (zins_l > yins)
    ext_x_l = jnp.where(a_l, jnp.where(xgty, xsb + 1, xsb - 1), xsb + 1)
    ext_y_l = jnp.where(a_l, jnp.where(xgty, ysb - 1, ysb + 1), ysb + 1)
    ext_dx_l = jnp.where(
        a_l, jnp.where(xgty, dx0 - 1, dx0 + 1), dx0 - 1 - 2 * SQUISH2
    )
    ext_dy_l = jnp.where(
        a_l, jnp.where(xgty, dy0 + 1, dy0 - 1), dy0 - 1 - 2 * SQUISH2
    )

    zins_u = 2.0 - in_sum
    a_u = (zins_u < xins) | (zins_u < yins)
    ext_x_u = jnp.where(a_u, jnp.where(xgty, xsb + 2, xsb), xsb)
    ext_y_u = jnp.where(a_u, jnp.where(xgty, ysb, ysb + 2), ysb)
    ext_dx_u = jnp.where(
        a_u, jnp.where(xgty, dx0 - 2 - 2 * SQUISH2, dx0 - 2 * SQUISH2), dx0
    )
    ext_dy_u = jnp.where(
        a_u, jnp.where(xgty, dy0 - 2 * SQUISH2, dy0 - 2 - 2 * SQUISH2), dy0
    )

    ext_x = jnp.where(lower, ext_x_l, ext_x_u)
    ext_y = jnp.where(lower, ext_y_l, ext_y_u)
    ext_dx = jnp.where(lower, ext_dx_l, ext_dx_u)
    ext_dy = jnp.where(lower, ext_dy_l, ext_dy_u)

    # --- central vertex: (0,0) for the lower simplex, (1,1) for the upper ---
    c_x = jnp.where(lower, xsb, xsb + 1)
    c_y = jnp.where(lower, ysb, ysb + 1)
    c_dx = jnp.where(lower, dx0, dx0 - 1 - 2 * SQUISH2)
    c_dy = jnp.where(lower, dy0, dy0 - 1 - 2 * SQUISH2)

    value += contribution(c_dx, c_dy, c_x, c_y)
    value += contribution(ext_dx, ext_dy, ext_x, ext_y)
    return value / NORM2


def fractal_noise_2d(
    shape: tuple,
    perm: jax.Array,
    octaves: int = 6,
    persistence: float = 0.8,
    frequency: float = 64.0,
) -> jax.Array:
    """Layered fractal noise over an (H, W) pixel lattice
    (reference rand_2d_octaves, generate_noise.py:97-114: output[i, j] =
    noise2(x=j/f, y=i/f), octave frequencies f, f/2, f/4, ...)."""
    h, w = shape
    ii = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)  # row index -> y
    jj = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)  # col index -> x
    out = jnp.zeros((h, w), dtype=jnp.float32)
    amplitude = 1.0
    f = float(frequency)
    for _ in range(octaves):
        out = out + amplitude * opensimplex2(jj / f, ii / f, perm)
        f /= 2.0
        amplitude *= persistence
    return out


@partial(jax.jit, static_argnames=("shape", "octaves", "persistence", "frequency", "dtype"))
def gen_simplex_noise(
    key: jax.Array,
    shape: tuple,
    octaves: int = 6,
    persistence: float = 0.8,
    frequency: float = 64.0,
    dtype=jnp.float32,
) -> jax.Array:
    """The training/eval noise source (reference gen_noise, generate_noise.py:8-15):
    a freshly seeded fractal field over the trailing (H, W) axes, broadcast across
    all leading axes (batch and channel share one field, exactly as the reference
    `.repeat`s a single field over the batch).

    Fully on-device and jittable — call it inside the train step.
    `shape` is [..., H, W] for NCHW-style or use gen_simplex_noise_nhwc for NHWC.
    """
    h, w = shape[-2], shape[-1]
    perm = perm_from_key(key)
    field = fractal_noise_2d((h, w), perm, octaves, persistence, frequency)
    return jnp.broadcast_to(field, shape).astype(dtype)


@partial(jax.jit, static_argnames=("shape", "octaves", "persistence", "frequency", "dtype"))
def gen_simplex_noise_nhwc(
    key: jax.Array,
    shape: tuple,  # [B, H, W, C]
    octaves: int = 6,
    persistence: float = 0.8,
    frequency: float = 64.0,
    dtype=jnp.float32,
) -> jax.Array:
    """NHWC variant (the framework's native layout): one (H, W) field broadcast
    over batch and channels."""
    b, h, w, c = shape
    perm = perm_from_key(key)
    field = fractal_noise_2d((h, w), perm, octaves, persistence, frequency)
    return jnp.broadcast_to(field[None, :, :, None], shape).astype(dtype)


def make_noise_fn(
    noisetype: str | None,
    octaves: int = 6,
    persistence: float = 0.8,
    frequency: float = 64.0,
    layout: str = "nhwc",
    impl: str = "auto",  # 'auto' | 'pallas' | 'table'
):
    """Build a `noise_fn(key, shape)` for the diffusion process: 'simplex' for the
    fractal field (the cDDPM default), None/'gaussian' for white noise.

    impl='auto' uses the hand-written Pallas kernel on TPU
    (ops/simplex_pallas.py) and the table-based JAX path elsewhere."""
    if noisetype == "simplex":
        use_pallas = impl == "pallas" or (
            impl == "auto" and jax.default_backend() == "tpu"
        )
        if use_pallas and layout == "nhwc":
            from .simplex_pallas import gen_simplex_noise_pallas_nhwc

            return lambda k, s: gen_simplex_noise_pallas_nhwc(
                k, tuple(s), octaves, persistence, frequency
            )
        if layout == "nhwc":
            return lambda k, s: gen_simplex_noise_nhwc(
                k, tuple(s), octaves, persistence, frequency
            )
        return lambda k, s: gen_simplex_noise(
            k, tuple(s), octaves, persistence, frequency
        )
    return lambda k, s: jax.random.normal(k, s, dtype=jnp.float32)
