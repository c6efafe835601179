"""Reconstruction losses.

Capability parity with the reference's ``L1_AE`` (reference:
src/models/losses.py:3-23): L1 reconstruction error with a 'sum' (per-batch
summed, normalized by batch) or 'mean' strategy, returned as the dict
``{combined_loss, reg, recon_error}`` the task modules log."""
from __future__ import annotations

import jax.numpy as jnp


def l1_ae_loss(reco, target, strategy: str = "sum", per_sample: bool = False) -> dict:
    """Returns {'combined_loss', 'reg', 'recon_error'} (reg kept at 0 like the
    reference's autoencoder loss without a regularizer term).

    ``per_sample=True`` returns [B] vectors whose batch mean equals the
    reference scalar exactly ('sum' sums per sample before the batch mean,
    ref losses.py:13-15) — used by the SparK eval path so a padded slice
    batch can be cropped back to the true depth before reduction."""
    err = jnp.abs(reco - target)
    if strategy == "sum":
        recon = err.reshape(err.shape[0], -1).sum(axis=1)
    else:
        recon = err.reshape(err.shape[0], -1).mean(axis=1)
    if not per_sample:
        recon = recon.mean()
    zero = jnp.zeros_like(recon)
    return {"combined_loss": recon, "reg": zero, "recon_error": recon}
