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
        sel_h = (idx_h % ng == 0) & (jnp.abs(idx_h - h // 2) > h * 0.05)
        sel_w = (idx_w % ng == 0) & (jnp.abs(idx_w - w // 2) > w * 0.05)
        mod_h = jnp.where(sel_h, 1.0 - inten, 1.0)[:, None]
        mod_w = jnp.where(sel_w, 1.0 - inten, 1.0)[None, :]
        mod = jnp.where(along_h, mod_h * jnp.ones((1, w)), jnp.ones((h, 1)) * mod_w)
        out = jnp.real(jnp.fft.ifft2(spect * mod))
        return out[..., None]

    return jax.vmap(ghost_one)(x, num_ghosts, intensity, axis_is_h)


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
