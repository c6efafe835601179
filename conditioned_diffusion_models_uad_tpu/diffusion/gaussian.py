"""Gaussian diffusion process: forward corruption, training losses, and samplers.

Capability parity with the reference's ``GaussianDiffusion``
(reference: src/models/modules/cond_DDPM.py:289-655) rebuilt as pure JAX functions:

* ``q_sample``            — forward noising q(x_t | x_0)           (ref :548-554)
* ``p_losses``            — training objective (pred_x0/pred_noise, p2 weights,
                            optional brain-mask / patch-box / inpaint semantics)
                                                                   (ref :565-645)
* ``diffusion_call``      — the train/test entry: uniform-random t (train) or a
                            fixed broadcast t (test), [0,1]→[-1,1] normalization
                                                                   (ref :647-655)
* ``p_sample_loop``       — ancestral reverse sampling as a `lax.scan`, with
                            `start_t` truncation + q_sample init   (ref :432-464)
* ``ddim_sample``         — DDIM(η) sampler as a `lax.scan`        (ref :466-515)

The reference's iterative samplers are broken in the fork (undefined
``use_spatial_transformer`` / ``ddim_sample_box`` attributes, SURVEY.md §2.4);
these are rebuilt from the math, not the code.

TPU-first notes:
  * the whole reverse loop is ONE compiled `lax.scan` over the schedule — the UNet
    is traced once; per-step noise comes from a split PRNG key so the scan carries
    only (img, key).
  * patch-box semantics are expressed as boolean masks (built once with
    `box_to_mask`) instead of per-sample Python loops, so they fuse into the
    surrounding elementwise ops.
  * all schedule math runs in float32 even when the model computes in bfloat16.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule, extract

# model_apply(x, t, cond) -> model_out ; x: [B,H,W,C] in [-1,1], t: [B] int32
ModelFn = Callable[[jax.Array, jax.Array, Optional[jax.Array]], jax.Array]
# noise_fn(key, shape) -> noise ; gaussian or simplex
NoiseFn = Callable[[jax.Array, tuple], jax.Array]


def split_keys(key: jax.Array, num: int = 2) -> jax.Array:
    """`jax.random.split` generalized to a stacked per-volume key array.

    key [2] -> [num, 2] (exactly jax.random.split); key [G, 2] -> [num, G, 2]
    where slot [m, v] is bitwise what `jax.random.split(key[v], num)[m]`
    returns alone. The eval layout-invariance contract rests on this: a
    volume grouped into a multi-volume dispatch must consume the SAME key
    stream it would consume dispatched alone (VERDICT r4 #1)."""
    if key.ndim == 1:
        return jax.random.split(key, num)
    return jnp.moveaxis(jax.vmap(lambda k: jax.random.split(k, num))(key), 1, 0)


def noise_for(noise_fn: NoiseFn, key: jax.Array, shape: tuple) -> jax.Array:
    """Per-volume noise over a grouped slice stack.

    key [2] draws one field over the whole leading batch axis (the single-
    volume path, unchanged); key [G, 2] draws each volume's field from its OWN
    key over its own `shape[0]//G` slice block and concatenates — block v is
    bitwise what `noise_fn(key[v], (shape[0]//G,) + shape[1:])` returns alone.
    G is static, so the loop unrolls into G independent field generations
    (for simplex noise each is one (H, W) lattice evaluation, <1 ms of a
    ~0.6 s eval dispatch)."""
    if key.ndim == 1:
        return noise_fn(key, shape)
    g = key.shape[0]
    sub = (shape[0] // g,) + tuple(shape[1:])
    return jnp.concatenate([noise_fn(key[v], sub) for v in range(g)], axis=0)


def normalize_to_neg_one_to_one(img: jax.Array) -> jax.Array:
    return img * 2.0 - 1.0


def unnormalize_to_zero_to_one(img: jax.Array) -> jax.Array:
    return (img + 1.0) * 0.5


@dataclasses.dataclass(frozen=True)
class GaussianDiffusionConfig:
    objective: str = "pred_x0"  # 'pred_noise' | 'pred_x0'
    loss_type: str = "l1"  # 'l1' | 'l2'
    inpaint: bool = False
    clip_denoised: bool = True
    ddim_sampling_eta: float = 1.0

    def __post_init__(self):
        assert self.objective in ("pred_noise", "pred_x0")
        assert self.loss_type in ("l1", "l2")


def q_sample(sched: DiffusionSchedule, x_start, t, noise):
    """Forward diffusion: x_t = sqrt(ᾱ_t)·x_0 + sqrt(1-ᾱ_t)·ε."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def predict_start_from_noise(sched, x_t, t, noise):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * noise
    )


def predict_noise_from_start(sched, x_t, t, x0):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def q_posterior(sched, x_start, x_t, t):
    nd = x_t.ndim
    posterior_mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    posterior_variance = extract(sched.posterior_variance, t, nd)
    posterior_log_variance = extract(sched.posterior_log_variance_clipped, t, nd)
    return posterior_mean, posterior_variance, posterior_log_variance


def model_predictions(
    sched: DiffusionSchedule,
    cfg: GaussianDiffusionConfig,
    model_fn: ModelFn,
    x,
    t,
    cond=None,
    clip_x_start: bool = False,
):
    """Run the model and derive (pred_noise, pred_x_start) under either objective."""
    model_output = model_fn(x, t, cond).astype(jnp.float32)
    maybe_clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)
    if cfg.objective == "pred_noise":
        pred_noise = model_output
        x_start = maybe_clip(predict_start_from_noise(sched, x, t, model_output))
    else:  # pred_x0
        x_start = maybe_clip(model_output)
        pred_noise = predict_noise_from_start(sched, x, t, x_start)
    return pred_noise, x_start


def box_to_mask(box: jax.Array, height: int, width: int) -> jax.Array:
    """Convert per-sample boxes [B,4] (x0,y0,x1,y1) to a boolean mask [B,H,W,1].

    Replaces the reference's per-sample Python slicing loops
    (cond_DDPM.py:598-604,613-617) with a broadcastable mask so the patch logic
    stays inside the jitted program with static shapes.
    """
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)[None]
    x0 = box[:, 0][:, None, None]
    y0 = box[:, 1][:, None, None]
    x1 = box[:, 2][:, None, None]
    y1 = box[:, 3][:, None, None]
    m = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
    return m[..., None]


def p_losses(
    sched: DiffusionSchedule,
    cfg: GaussianDiffusionConfig,
    model_fn: ModelFn,
    x_start: jax.Array,  # [B,H,W,C] in [-1,1]
    t: jax.Array,  # [B] int32
    cond: Optional[jax.Array] = None,
    noise: Optional[jax.Array] = None,
    *,
    key: Optional[jax.Array] = None,
    box_mask: Optional[jax.Array] = None,  # [B,H,W,1] bool: True inside patch
    brain_mask: Optional[jax.Array] = None,  # [B,H,W,C]
    reduce: bool = True,
):
    """Training/eval objective. Returns (scalar loss, reconstruction in [0,1]);
    with ``reduce=False`` the loss is the per-sample [B] vector (used by the
    eval path to reconstruct the reference's per-volume loss scalars,
    ref DDPM_2D.py:267-272, from a padded/flattened slice batch)."""
    if noise is None:
        noise = jax.random.normal(key, x_start.shape, dtype=jnp.float32)
    noise = noise.astype(jnp.float32)

    x = q_sample(sched, x_start, t, noise)

    if box_mask is not None:
        # noise only the box region; keep the clean image elsewhere
        x = jnp.where(box_mask, x, x_start)

    model_out = model_fn(x, t, cond).astype(jnp.float32)

    if cfg.objective == "pred_noise":
        target = jnp.where(box_mask, noise, 0.0) if box_mask is not None else noise
    else:  # pred_x0
        if brain_mask is not None:
            model_out = model_out * brain_mask
        target = x_start

    if cfg.inpaint and box_mask is not None:
        model_out = jnp.where(box_mask, model_out, x_start)

    err = model_out - target
    per_pixel = jnp.abs(err) if cfg.loss_type == "l1" else err**2
    per_sample = per_pixel.reshape(per_pixel.shape[0], -1).mean(axis=1)
    per_sample = per_sample * jnp.take(sched.p2_loss_weight, t, axis=0)
    loss = per_sample.mean() if reduce else per_sample

    if cfg.objective == "pred_noise":
        nd = x_start.ndim
        reco = unnormalize_to_zero_to_one(
            x - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * model_out
        )
    else:
        reco = unnormalize_to_zero_to_one(model_out)
    return loss, reco


def diffusion_call(
    sched: DiffusionSchedule,
    cfg: GaussianDiffusionConfig,
    model_fn: ModelFn,
    img01: jax.Array,  # [B,H,W,C] in [0,1]
    *,
    key: jax.Array,
    t: Optional[int | jax.Array] = None,
    cond: Optional[jax.Array] = None,
    noise: Optional[jax.Array] = None,
    box_mask: Optional[jax.Array] = None,
    brain_mask: Optional[jax.Array] = None,
    reduce: bool = True,
):
    """The reference's `GaussianDiffusion.forward` (cond_DDPM.py:647-655):
    draw uniform random t (training) or broadcast a fixed t (testing),
    map the image to [-1,1], then compute p_losses."""
    b = img01.shape[0]
    t_key, n_key = jax.random.split(key)
    if t is None:
        t_vec = jax.random.randint(t_key, (b,), 0, sched.num_timesteps, dtype=jnp.int32)
    else:
        t_vec = jnp.full((b,), t, dtype=jnp.int32)
    x_start = normalize_to_neg_one_to_one(img01.astype(jnp.float32))
    return p_losses(
        sched, cfg, model_fn, x_start, t_vec, cond=cond, noise=noise,
        key=n_key, box_mask=box_mask, brain_mask=brain_mask, reduce=reduce,
    )


def p_sample_loop(
    sched: DiffusionSchedule,
    cfg: GaussianDiffusionConfig,
    model_fn: ModelFn,
    shape: tuple,
    *,
    key: jax.Array,
    cond: Optional[jax.Array] = None,
    start_t: int = 0,
    x_start: Optional[jax.Array] = None,  # [-1,1]; required when start_t > 0
    noise_fn: Optional[NoiseFn] = None,
):
    """Ancestral sampling x_T → x_0 as one `lax.scan` (T traced UNet steps).

    start_t > 0 truncates the chain: x_{T'} is produced by q_sample'ing `x_start`
    to T' (the "truncated reverse sampling" capability, ref cond_DDPM.py:447-464).
    `noise_fn` selects the per-step noise source (gaussian default, or simplex).
    `key` may be [2] (one key for the whole stack) or [G, 2] per-volume keys
    over a grouped stack (see `noise_for`): every split and draw then runs
    per volume, so grouped sampling is bitwise the single-volume sampling.
    """
    T = sched.num_timesteps if start_t == 0 else start_t
    if noise_fn is None:
        noise_fn = lambda k, s: jax.random.normal(k, s, dtype=jnp.float32)

    init_key, loop_key = split_keys(key)
    if start_t > 0:
        assert x_start is not None, "start_t truncation requires x_start"
        t0 = jnp.full((shape[0],), min(T, sched.num_timesteps - 1), dtype=jnp.int32)
        img = q_sample(sched, x_start, t0, noise_for(noise_fn, init_key, shape))
    else:
        img = noise_for(noise_fn, init_key, shape)

    def step(carry, t):
        img, k = carry
        k, nk = split_keys(k)
        bt = jnp.full((shape[0],), t, dtype=jnp.int32)
        _, x0 = model_predictions(
            sched, cfg, model_fn, img, bt, cond, clip_x_start=cfg.clip_denoised
        )
        mean, _, log_var = q_posterior(sched, x0, img, bt)
        noise = noise_for(noise_fn, nk, shape)
        noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
        img = mean + jnp.exp(0.5 * log_var) * noise
        return (img, k), None

    (img, _), _ = jax.lax.scan(step, (img, loop_key), jnp.arange(T - 1, -1, -1))
    return unnormalize_to_zero_to_one(img)


def interpolate(
    sched: DiffusionSchedule,
    cfg: GaussianDiffusionConfig,
    model_fn: ModelFn,
    x1: jax.Array,  # [B,H,W,C] in [-1,1]
    x2: jax.Array,
    *,
    key: jax.Array,
    t: Optional[int] = None,
    lam: float = 0.5,
    cond: Optional[jax.Array] = None,
    noise_fn: Optional[NoiseFn] = None,
):
    """Latent-space interpolation (reference GaussianDiffusion.interpolate,
    cond_DDPM.py:532-546): noise both images to t, lerp, then run the
    ancestral chain back to x_0 (as one lax.scan). Returns [-1,1] images."""
    if t is None:
        t = sched.num_timesteps - 1
    if noise_fn is None:
        noise_fn = lambda k, s: jax.random.normal(k, s, dtype=jnp.float32)
    b = x1.shape[0]
    k1, k2, k_loop = jax.random.split(key, 3)
    tb = jnp.full((b,), t, dtype=jnp.int32)
    xt1 = q_sample(sched, x1, tb, noise_fn(k1, x1.shape))
    xt2 = q_sample(sched, x2, tb, noise_fn(k2, x2.shape))
    img = (1.0 - lam) * xt1 + lam * xt2

    def step(carry, ti):
        img, k = carry
        k, nk = jax.random.split(k)
        bt = jnp.full((b,), ti, dtype=jnp.int32)
        _, x0 = model_predictions(
            sched, cfg, model_fn, img, bt, cond, clip_x_start=cfg.clip_denoised
        )
        mean, _, log_var = q_posterior(sched, x0, img, bt)
        noise = noise_fn(nk, img.shape)
        noise = jnp.where(ti > 0, noise, jnp.zeros_like(noise))
        return (mean + jnp.exp(0.5 * log_var) * noise, k), None

    (img, _), _ = jax.lax.scan(step, (img, k_loop), jnp.arange(t - 1, -1, -1))
    return img


def ddim_sample(
    sched: DiffusionSchedule,
    cfg: GaussianDiffusionConfig,
    model_fn: ModelFn,
    shape: tuple,
    *,
    key: jax.Array,
    sampling_timesteps: int,
    cond: Optional[jax.Array] = None,
    start_t: int = 0,
    x_start: Optional[jax.Array] = None,
    noise_fn: Optional[NoiseFn] = None,
):
    """DDIM(η) sampler as a `lax.scan` over precomputed (t, t_next) pairs
    (ref cond_DDPM.py:466-515; timestep spacing matches the reference's
    `linspace(0, T, steps+2)[:-1]` construction). `key` may be [2] or [G, 2]
    per-volume keys over a grouped stack (see `noise_for`/`split_keys`)."""
    total_timesteps = sched.num_timesteps if start_t == 0 else start_t
    if noise_fn is None:
        noise_fn = lambda k, s: jax.random.normal(k, s, dtype=jnp.float32)
    eta = cfg.ddim_sampling_eta

    import numpy as np

    times = np.linspace(0.0, total_timesteps, sampling_timesteps + 2)[:-1]
    times = list(reversed(times.astype(int).tolist()))
    pairs = jnp.asarray(list(zip(times[:-1], times[1:])), dtype=jnp.int32)

    init_key, loop_key = split_keys(key)
    if start_t != 0:
        assert x_start is not None
        t0 = jnp.full((shape[0],), min(start_t, sched.num_timesteps - 1), jnp.int32)
        img = q_sample(sched, x_start, t0, noise_for(noise_fn, init_key, shape))
    else:
        img = noise_for(noise_fn, init_key, shape)

    def step(carry, pair):
        img, k = carry
        t, t_next = pair[0], pair[1]
        k, nk = split_keys(k)
        # jnp.take: the tables are host numpy constants (see make_schedule) —
        # plain [tracer] indexing would call numpy's __array__ on the tracer
        alpha = jnp.take(sched.alphas_cumprod_prev, t, axis=0)
        alpha_next = jnp.take(sched.alphas_cumprod_prev, t_next, axis=0)
        bt = jnp.full((shape[0],), t, dtype=jnp.int32)
        pred_noise, x0 = model_predictions(
            sched, cfg, model_fn, img, bt, cond, clip_x_start=cfg.clip_denoised
        )
        sigma = eta * jnp.sqrt(
            (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
        )
        c = jnp.sqrt(jnp.clip((1 - alpha_next) - sigma**2, 0.0, None))
        noise = noise_for(noise_fn, nk, shape)
        noise = jnp.where(t_next > 0, noise, jnp.zeros_like(noise))
        img = x0 * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
        return (img, k), None

    (img, _), _ = jax.lax.scan(step, (img, loop_key), pairs)
    return unnormalize_to_zero_to_one(img)
