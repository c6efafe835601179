"""Diffusion noise schedules and derived coefficient tables.

Capability parity with the reference's schedule construction
(reference: src/models/modules/cond_DDPM.py:271-377): linear and cosine beta
schedules are computed in float64 on host and stored as float32 device tables, and
every derived quantity the diffusion process needs (q_sample coefficients, posterior
mean/variance coefficients, p2 loss weights) is precomputed once.

TPU-first design: the tables live in a single frozen pytree (`DiffusionSchedule`)
that is closed over by jitted step functions, so XLA constant-folds the gathers of
per-timestep coefficients into the fused training/sampling programs.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """Linear schedule, scaled so the total noise budget is invariant to T."""
    scale = 1000.0 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule (Nichol & Dhariwal, improved DDPM)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-timestep coefficient tables, each of shape [T], float32.

    Computed in float64 and cast once (matching the precision strategy of the
    reference's register_buffer pattern, cond_DDPM.py:345-377).
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    p2_loss_weight: jax.Array

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(
    timesteps: int = 1000,
    beta_schedule: str = "cosine",
    p2_loss_weight_gamma: float = 0.0,
    p2_loss_weight_k: float = 1.0,
) -> DiffusionSchedule:
    if beta_schedule == "linear":
        betas = linear_beta_schedule(timesteps)
    elif beta_schedule == "cosine":
        betas = cosine_beta_schedule(timesteps)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule}")

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.pad(alphas_cumprod[:-1], (1, 0), constant_values=1.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    # HOST numpy tables, not device arrays: jitted programs close over these
    # as jaxpr constants, and embedding a DEVICE constant at lowering time
    # forces a D2H fetch — on the tunneled-chip transport a constant fetch can
    # stall minutes behind the queued program stream (observed in the
    # orchestrated eval warm pass). numpy constants embed straight from host
    # memory; XLA still constant-folds them into the compiled program.
    f32 = lambda a: np.asarray(a, dtype=np.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.clip(posterior_variance, 1e-20, None))
        ),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        p2_loss_weight=f32(
            (p2_loss_weight_k + alphas_cumprod / (1 - alphas_cumprod))
            ** -p2_loss_weight_gamma
        ),
    )


def extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-sample coefficients `table[t]` and reshape to broadcast
    against an `ndim`-dimensional batch tensor ([B] -> [B, 1, ..., 1])."""
    out = jnp.take(table, t, axis=0)
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))
