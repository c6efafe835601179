"""Tests for the TPU-vectorized OpenSimplex noise.

Golden oracle: a tiny scalar-Python transcription of the public-domain
OpenSimplex-2D algorithm (Kurt Spencer), evaluated pointwise. The vectorized
branchless JAX version must match it bitwise-ish (float32 tolerance) on the same
permutation table. Statistical tests pin the fractal parameters the reference
training uses (octaves=6, persistence=0.8, frequency=64;
reference: src/utils/generate_noise.py:19-22)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.ops.simplex import (
    NORM2,
    SQUISH2,
    STRETCH2,
    _GRAD2,
    fractal_noise_2d,
    gen_simplex_noise,
    gen_simplex_noise_nhwc,
    opensimplex2,
    perm_from_key,
    perm_from_seed_lcg,
)


def oracle_noise2(x, y, perm):
    """Scalar reference implementation of OpenSimplex 2D (public domain algo)."""

    def grad_dot(xsb, ysb, dx, dy):
        idx = perm[(perm[xsb & 0xFF] + ysb) & 0xFF] & 0x0E
        g = _GRAD2[idx >> 1]
        return g[0] * dx + g[1] * dy

    def contrib(dx, dy, xsv, ysv):
        attn = 2 - dx * dx - dy * dy
        if attn <= 0:
            return 0.0
        return attn**4 * grad_dot(xsv, ysv, dx, dy)

    stretch = (x + y) * STRETCH2
    xs, ys = x + stretch, y + stretch
    xsb, ysb = math.floor(xs), math.floor(ys)
    squish = (xsb + ysb) * SQUISH2
    xins, yins = xs - xsb, ys - ysb
    in_sum = xins + yins
    dx0, dy0 = x - (xsb + squish), y - (ysb + squish)

    v = contrib(dx0 - 1 - SQUISH2, dy0 - SQUISH2, xsb + 1, ysb)
    v += contrib(dx0 - SQUISH2, dy0 - 1 - SQUISH2, xsb, ysb + 1)

    if in_sum <= 1:
        zins = 1 - in_sum
        if zins > xins or zins > yins:
            if xins > yins:
                ext = (xsb + 1, ysb - 1, dx0 - 1, dy0 + 1)
            else:
                ext = (xsb - 1, ysb + 1, dx0 + 1, dy0 - 1)
        else:
            ext = (xsb + 1, ysb + 1, dx0 - 1 - 2 * SQUISH2, dy0 - 1 - 2 * SQUISH2)
        cen = (xsb, ysb, dx0, dy0)
    else:
        zins = 2 - in_sum
        if zins < xins or zins < yins:
            if xins > yins:
                ext = (xsb + 2, ysb, dx0 - 2 - 2 * SQUISH2, dy0 - 2 * SQUISH2)
            else:
                ext = (xsb, ysb + 2, dx0 - 2 * SQUISH2, dy0 - 2 - 2 * SQUISH2)
        else:
            ext = (xsb, ysb, dx0, dy0)
        cen = (xsb + 1, ysb + 1, dx0 - 1 - 2 * SQUISH2, dy0 - 1 - 2 * SQUISH2)

    v += contrib(cen[2], cen[3], cen[0], cen[1])
    v += contrib(ext[2], ext[3], ext[0], ext[1])
    return v / NORM2


def test_lcg_perm_is_a_permutation_and_deterministic():
    p1 = perm_from_seed_lcg(3)
    p2 = perm_from_seed_lcg(3)
    np.testing.assert_array_equal(p1, p2)
    assert sorted(p1.tolist()) == list(range(256))
    p3 = perm_from_seed_lcg(12345)
    assert not np.array_equal(p1, p3)
    assert sorted(p3.tolist()) == list(range(256))


def test_vectorized_matches_scalar_oracle():
    perm = perm_from_seed_lcg(3)
    rng = np.random.default_rng(0)
    # random points spanning several cells, plus points near cell boundaries
    pts = np.concatenate(
        [
            rng.uniform(-10, 10, size=(200, 2)),
            np.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5], [0.999, 0.001]]),
        ]
    )
    expected = np.array([oracle_noise2(x, y, perm) for x, y in pts])
    got = np.asarray(
        opensimplex2(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(perm))
    )
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_fractal_matches_octave_sum_of_oracle():
    perm = perm_from_seed_lcg(7)
    h = w = 8
    octaves, persistence, freq = 3, 0.8, 4.0
    expected = np.zeros((h, w))
    amp, f = 1.0, freq
    for _ in range(octaves):
        for i in range(h):
            for j in range(w):
                expected[i, j] += amp * oracle_noise2(j / f, i / f, perm)
        f /= 2
        amp *= persistence
    got = np.asarray(
        fractal_noise_2d((h, w), jnp.asarray(perm), octaves, persistence, freq)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-5)


def test_gen_noise_broadcast_semantics():
    """One (H,W) field shared across batch and channel (reference
    generate_noise.py:44-51 repeats a single field over the batch)."""
    key = jax.random.PRNGKey(0)
    ns = np.asarray(gen_simplex_noise(key, (4, 2, 16, 16)))
    assert ns.shape == (4, 2, 16, 16)
    for b in range(4):
        for c in range(2):
            np.testing.assert_array_equal(ns[b, c], ns[0, 0])
    nhwc = np.asarray(gen_simplex_noise_nhwc(key, (4, 16, 16, 2)))
    np.testing.assert_array_equal(nhwc[1, :, :, 0], nhwc[0, :, :, 1])
    # same key -> same field in both layouts
    np.testing.assert_allclose(nhwc[0, :, :, 0], ns[0, 0], rtol=1e-6)


def test_noise_statistics_default_params():
    """At the training defaults (octave 6, persistence .8, freq 64) on a 96x96
    slice the field is zero-mean with O(0.2-0.6) std and bounded amplitude."""
    fields = []
    for s in range(8):
        fields.append(np.asarray(gen_simplex_noise(jax.random.PRNGKey(s), (1, 1, 96, 96)))[0, 0])
    allf = np.stack(fields)
    assert abs(allf.mean()) < 0.08
    assert 0.1 < allf.std() < 0.8
    # amplitude bound: sum of octave amplitudes = (1-0.8^6)/(1-0.8) ~ 3.69
    assert np.abs(allf).max() < 3.7
    # different seeds -> different fields
    assert not np.allclose(fields[0], fields[1])


def test_noise_is_smooth_not_white():
    """Fractal simplex noise must be spatially correlated (unlike white noise):
    neighbor correlation should be high."""
    f = np.asarray(gen_simplex_noise(jax.random.PRNGKey(42), (1, 1, 96, 96)))[0, 0]
    corr = np.corrcoef(f[:-1].ravel(), f[1:].ravel())[0, 1]
    assert corr > 0.9


def test_jit_under_vmap_and_grad_safety():
    """The noise generator composes with jit (already) and is usable inside a
    larger jitted step via closure."""

    @jax.jit
    def step(key):
        n = gen_simplex_noise_nhwc(key, (2, 32, 32, 1))
        return (n**2).mean()

    v = float(step(jax.random.PRNGKey(0)))
    assert np.isfinite(v) and v > 0


# --------------------------------------------------------------------------- #
# 3D noise API (reference Simplex_CLASS rand_3d_*, generate_noise.py:78-133)
# --------------------------------------------------------------------------- #
def test_fractal_noise_3d_stats():
    import jax.numpy as jnp
    from conditioned_diffusion_models_uad_tpu.ops.simplex3d import fractal_noise_3d

    f = np.asarray(fractal_noise_3d(jnp.int32(3), (16, 48, 48), octaves=4,
                                    persistence=0.8, frequency=32))
    assert f.shape == (16, 48, 48)
    assert np.isfinite(f).all()
    assert 0.05 < f.std() < 2.0
    # band-limited: neighboring voxels correlate
    assert np.abs(np.diff(f, axis=2)).mean() < f.std()


def test_fractal_noise_3d_fixed_t_slices_differ():
    import jax.numpy as jnp
    from conditioned_diffusion_models_uad_tpu.ops.simplex3d import (
        fractal_noise_3d_fixed_t,
    )

    a = np.asarray(fractal_noise_3d_fixed_t(jnp.int32(3), 10.0, (32, 32)))
    b = np.asarray(fractal_noise_3d_fixed_t(jnp.int32(3), 250.0, (32, 32)))
    assert a.shape == (1, 32, 32)
    assert not np.allclose(a, b)  # different time planes
    c = np.asarray(fractal_noise_3d_fixed_t(jnp.int32(3), 10.0, (32, 32)))
    assert np.allclose(a, c)  # deterministic given (seed, T)


def test_simplex_class_api():
    from conditioned_diffusion_models_uad_tpu.ops.simplex3d import SimplexNoise

    s = SimplexNoise(7)
    f2 = np.asarray(s.rand_2d_octaves((32, 32), octaves=3))
    f3 = np.asarray(s.rand_3d_octaves((4, 16, 16), octaves=2))
    ft = np.asarray(s.rand_3d_fixed_T_octaves((16, 16), 100.0, octaves=2))
    assert f2.shape == (32, 32) and f3.shape == (4, 16, 16) and ft.shape == (1, 16, 16)
    before = f2.copy()
    s.newSeed(8)
    assert not np.allclose(np.asarray(s.rand_2d_octaves((32, 32), octaves=3)), before)


def test_random_param_noise_pool():
    from conditioned_diffusion_models_uad_tpu.ops.simplex3d import (
        gen_simplex_noise_random_param,
    )

    rng = np.random.default_rng(0)
    out = np.asarray(gen_simplex_noise_random_param(rng, (32, 32), t=250.0))
    assert out.shape == (1, 32, 32) and np.isfinite(out).all()
