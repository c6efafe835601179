"""On-device intensity augmentations for slice batches.

Capability parity with the reference's `get_augment` "aug_intensity" policy
(reference: src/datamodules/create_dataset.py:220-251): RandomGamma(p=.5),
RandomBiasField(p=.25), RandomBlur(p=.25), RandomGhosting(p=.5) — the policy the
north-star cDDPM experiment trains with (configs/experiment/cDDPM/
DDPM_cond_spark_2D.yaml: aug_intensity: True).

TPU-first: the reference applies torchio augs per 3D subject on host dataloader
workers; here the same artifact families are applied per 2D slice *batch* inside
the jitted train step (vectorized over the batch with per-sample parameters),
keeping the input pipeline entirely on device. Parameter ranges follow torchio
defaults (gamma log-range (-0.3, 0.3), bias-field order 3 coeffs (-0.5, 0.5),
blur std (0, 2), ghosting 4-10 ghosts / intensity (0.5, 1))."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rand_gamma(key, x):
    """x**gamma with log(gamma) ~ U(-0.3, 0.3); x expected in [0, 1]."""
    log_gamma = jax.random.uniform(key, (x.shape[0], 1, 1, 1), minval=-0.3, maxval=0.3)
    return jnp.clip(x, 0.0, None) ** jnp.exp(log_gamma)


def _rand_bias_field(key, x, order: int = 3):
    """Multiply by exp(P(u, v)) with P a random 2D polynomial of given order."""
    b, h, w, _ = x.shape
    u = jnp.linspace(-1.0, 1.0, h)[None, :, None]
    v = jnp.linspace(-1.0, 1.0, w)[None, None, :]
    n_coeff = sum(1 for i in range(order + 1) for j in range(order + 1 - i))
    coeffs = jax.random.uniform(key, (b, n_coeff), minval=-0.5, maxval=0.5)
    field = jnp.zeros((b, h, w))
    k = 0
    for i in range(order + 1):
        for j in range(order + 1 - i):
            field = field + coeffs[:, k, None, None] * (u**i) * (v**j)
            k += 1
    return x * jnp.exp(field)[..., None]


def _rand_blur(key, x, max_std: float = 2.0, ksize: int = 9):
    """Separable gaussian blur with per-sample std ~ U(0, max_std)."""
    b = x.shape[0]
    std = jax.random.uniform(key, (b,), minval=0.0, maxval=max_std)
    r = ksize // 2
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    s = jnp.maximum(std, 1e-3)[:, None]
    k1d = jnp.exp(-(d[None, :] ** 2) / (2 * s**2))
    # std ~ 0 -> identity kernel
    delta = (d == 0).astype(jnp.float32)[None, :]
    k1d = jnp.where(std[:, None] < 0.05, delta, k1d / k1d.sum(-1, keepdims=True))

    def blur_one(img, k):  # img [H,W,1], k [ksize]
        pad = [(r, r), (0, 0), (0, 0)]
        v = jnp.pad(img, pad, mode="edge")
        v = sum(v[i : i + img.shape[0]] * k[i] for i in range(ksize))
        pad = [(0, 0), (r, r), (0, 0)]
        u = jnp.pad(v, pad, mode="edge")
        u = sum(u[:, i : i + img.shape[1]] * k[i] for i in range(ksize))
        return u

    return jax.vmap(blur_one)(x, k1d)


def _rand_ghosting(key, x, min_ghosts: int = 4, max_ghosts: int = 10):
    """MRI ghosting: attenuate periodic k-space lines along a random phase-encode
    axis, preserving the center of k-space."""
    b, h, w, _ = x.shape
    k_ng, k_int, k_ax = jax.random.split(key, 3)
    num_ghosts = jax.random.randint(k_ng, (b,), min_ghosts, max_ghosts + 1)
    intensity = jax.random.uniform(k_int, (b,), minval=0.5, maxval=1.0)
    axis_is_h = jax.random.bernoulli(k_ax, 0.5, (b,))

    def ghost_one(img, ng, inten, along_h):
        v = img[..., 0]
        spect = jnp.fft.fft2(v)
        idx_h = jnp.arange(h)
        idx_w = jnp.arange(w)
        # jnp.fft.fft2 is UNSHIFTED: the k-space center (DC + low frequencies,
        # which torchio RandomGhosting explicitly restores) lives at index 0
        # with wrap-around — protect by circular frequency distance, NOT h//2
        # (h//2 is the highest frequency in this layout)
        fdist_h = jnp.minimum(idx_h, h - idx_h)
        fdist_w = jnp.minimum(idx_w, w - idx_w)
        sel_h = (idx_h % ng == 0) & (fdist_h > h * 0.05)
        sel_w = (idx_w % ng == 0) & (fdist_w > w * 0.05)
        mod_h = jnp.where(sel_h, 1.0 - inten, 1.0)[:, None]
        mod_w = jnp.where(sel_w, 1.0 - inten, 1.0)[None, :]
        mod = jnp.where(along_h, mod_h * jnp.ones((1, w)), jnp.ones((h, 1)) * mod_w)
        out = jnp.real(jnp.fft.ifft2(spect * mod))
        return out[..., None]

    return jax.vmap(ghost_one)(x, num_ghosts, intensity, axis_is_h)


def _rand_noise(key, x, max_std: float = 0.1):
    """Additive gaussian noise with per-sample std ~ U(0, max_std)
    (torchio RandomNoise default family)."""
    k_std, k_n = jax.random.split(key)
    std = jax.random.uniform(k_std, (x.shape[0], 1, 1, 1), maxval=max_std)
    return x + std * jax.random.normal(k_n, x.shape)


def _rand_motion(key, x, max_transforms: int = 3, max_shift: float = 4.0):
    """MRI motion artifact: the acquired k-space is a mix of a few randomly
    *shifted* copies of the image (each shift = a linear phase ramp in k-space),
    the 2D analog of torchio RandomMotion."""
    b, h, w, _ = x.shape
    k_sh, k_wt = jax.random.split(key)
    shifts = jax.random.uniform(
        k_sh, (b, max_transforms, 2), minval=-max_shift, maxval=max_shift
    )
    weights = jax.random.dirichlet(k_wt, jnp.ones((max_transforms + 1,)), (b,))

    fy = jnp.fft.fftfreq(h)[:, None]
    fx = jnp.fft.fftfreq(w)[None, :]

    def one(img, sh, wt):
        spect = jnp.fft.fft2(img[..., 0])
        acc = wt[0] * spect
        for t in range(max_transforms):
            ramp = jnp.exp(-2j * jnp.pi * (fy * sh[t, 0] + fx * sh[t, 1]))
            acc = acc + wt[t + 1] * spect * ramp
        return jnp.real(jnp.fft.ifft2(acc))[..., None]

    return jax.vmap(one)(x, shifts, weights)


# --------------------------------------------------------------------------- #
# spatial families (warp image + mask with the same displacement)
# --------------------------------------------------------------------------- #
def _warp(img, coords, order: int):
    """img [H,W], coords [2,H,W] absolute sample positions."""
    return jax.scipy.ndimage.map_coordinates(img, list(coords), order=order, mode="nearest")


def _affine_coords(key, h, w, max_deg=10.0, scale_range=0.1, max_shift=5.0):
    k_r, k_s, k_t = jax.random.split(key, 3)
    ang = jax.random.uniform(k_r, (), minval=-max_deg, maxval=max_deg) * jnp.pi / 180
    sc = 1.0 + jax.random.uniform(k_s, (), minval=-scale_range, maxval=scale_range)
    tr = jax.random.uniform(k_t, (2,), minval=-max_shift, maxval=max_shift)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    src_y = (cos * yy - sin * xx) / sc + cy + tr[0]
    src_x = (sin * yy + cos * xx) / sc + cx + tr[1]
    return jnp.stack([src_y, src_x])


def _elastic_coords(key, h, w, grid: int = 4, max_disp: float = 7.5):
    disp = jax.random.uniform(
        key, (2, grid, grid), minval=-max_disp, maxval=max_disp
    )
    disp = jax.image.resize(disp, (2, h, w), method="cubic")
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return jnp.stack([yy + disp[0], xx + disp[1]])


def spatial_augment_batch(
    key: jax.Array,
    vol: jax.Array,  # [B, H, W, 1]
    mask: jax.Array,
    p_flip: float = 0.5,
    p_affine: float = 0.25,
    p_elastic: float = 0.25,
):
    """Geometric families of the reference `get_augment` (torchio RandomFlip /
    RandomAffine / RandomElasticDeformation, create_dataset.py:220-251): the
    image is warped bilinearly, the brain mask with nearest-neighbor, using the
    SAME sampled transform. Returns (vol, mask)."""
    b, h, w, _ = vol.shape
    keys = jax.random.split(key, 6)

    flip = jax.random.bernoulli(keys[0], p_flip, (b, 1, 1, 1))
    vol = jnp.where(flip, vol[:, :, ::-1, :], vol)
    mask = jnp.where(flip, mask[:, :, ::-1, :], mask)

    def warped(gate_key, coord_key, coord_fn, prob, vol, mask):
        apply = jax.random.bernoulli(gate_key, prob, (b,))
        cks = jax.random.split(coord_key, b)

        def one(v, m, ck, ap):
            coords = coord_fn(ck, h, w)
            wv = _warp(v[..., 0], coords, order=1)[..., None]
            wm = _warp(m[..., 0], coords, order=0)[..., None]
            return jnp.where(ap, wv, v), jnp.where(ap, wm, m)

        return jax.vmap(one)(vol, mask, cks, apply)

    vol, mask = warped(keys[1], keys[2], _affine_coords, p_affine, vol, mask)
    vol, mask = warped(keys[3], keys[4], _elastic_coords, p_elastic, vol, mask)
    return vol, mask


@jax.jit
def aug_intensity_batch(key: jax.Array, x: jax.Array) -> jax.Array:
    """Apply the aug_intensity policy to a slice batch [B, H, W, 1] in [0, 1]:
    per-sample Bernoulli gates at the reference probabilities."""
    keys = jax.random.split(key, 8)
    b = x.shape[0]

    def gated(prob, gate_key, fn_key, fn, x):
        apply = jax.random.bernoulli(gate_key, prob, (b, 1, 1, 1))
        return jnp.where(apply, fn(fn_key, x), x)

    x = gated(0.5, keys[0], keys[1], _rand_gamma, x)
    x = gated(0.25, keys[2], keys[3], _rand_bias_field, x)
    x = gated(0.25, keys[4], keys[5], _rand_blur, x)
    x = gated(0.5, keys[6], keys[7], _rand_ghosting, x)
    return x


@jax.jit
def full_augment_batch(key: jax.Array, vol: jax.Array, mask: jax.Array):
    """The complete `get_augment` family set (reference
    create_dataset.py:220-251): spatial (flip/affine/elastic) on image+mask,
    then intensity artifacts (gamma/bias/blur/ghosting/noise/motion) on the
    image. Returns (vol, mask)."""
    k_sp, k_int, k_n, k_gn, k_m, k_gm = jax.random.split(key, 6)
    vol, mask = spatial_augment_batch(k_sp, vol, mask)
    vol = aug_intensity_batch(k_int, vol)
    b = vol.shape[0]
    # reference gate probabilities: RandomNoise(p=0.5), RandomMotion(p=0.1)
    # (create_dataset.py:226-229)
    apply_n = jax.random.bernoulli(k_gn, 0.5, (b, 1, 1, 1))
    vol = jnp.where(apply_n, _rand_noise(k_n, vol), vol)
    apply_m = jax.random.bernoulli(k_gm, 0.1, (b, 1, 1, 1))
    vol = jnp.where(apply_m, _rand_motion(k_m, vol), vol)
    return vol, mask
