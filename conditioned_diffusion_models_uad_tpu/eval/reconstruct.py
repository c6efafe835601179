"""Slice-parallel volume reconstruction: the north-star eval compute path.

The reference evaluates one volume at a time by folding depth into the batch
axis and running the diffusion denoise on all slices at once
(reference src/models/DDPM_2D.py:193-257). Here that depth-as-batch axis is
*sharded across the TPU mesh* — each core denoises a contiguous stack of
slices with replicated weights; the t-ensemble is flattened into the same
batch axis (models/tasks.py::reconstruct) so the whole volume × ensemble
reconstruction is one compiled program.

Depth is padded to a fixed bucket (edge-replicated slices) so volumes of
different depth reuse one compiled executable (SURVEY.md §7 'dynamic shapes').
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..parallel.mesh import batch_sharding, pad_to_multiple, replicated_sharding


class VolumeReconstructor:
    """Compiles task.reconstruct over a mesh-sharded slice axis.

    __call__(variables, vol_hwd, key) -> reco_hwd with vol [H, W, D] in [0,1].
    `num_eval_slices` optionally center-crops the depth axis before
    reconstruction (reference DDPM_2D.py:193-203)."""

    def __init__(
        self,
        task,
        mesh: Optional[Mesh] = None,
        depth_bucket: int = 8,
        num_eval_slices: Optional[int] = None,
        patched: bool = False,
    ):
        self.task = task
        self.mesh = mesh
        self.num_eval_slices = num_eval_slices
        base = mesh.devices.size if mesh is not None else 1
        self.depth_multiple = max(depth_bucket, base) // base * base
        fn = (
            task.reconstruct_patched_with_aux if patched
            else task.reconstruct_with_aux
        )

        if mesh is not None:
            shb = batch_sharding(mesh)
            self._reconstruct = jax.jit(
                fn,
                in_shardings=(
                    replicated_sharding(mesh),
                    shb,
                    replicated_sharding(mesh),
                ),
                # reco + both aux leaves are [D, ...] slice-axis arrays
                out_shardings=(
                    shb,
                    {"loss_per_slice": shb, "latent_per_slice": shb},
                ),
            )
        else:
            self._reconstruct = jax.jit(fn)

    def __call__(self, variables, vol_hwd, key, return_aux: bool = False):
        """vol_hwd may be host numpy or a device-resident jax.Array
        (preprocess_backend='device'); neither incurs a D2H round trip —
        the reconstruction is returned as a device array and fetched only
        where host metrics actually need values.

        With ``return_aux=True`` also returns {'loss', 'latent'} as device
        arrays — the per-volume eval-forward scalars (diffusion loss of the
        last ensemble member, slice-mean conditioning features) reduced over
        the TRUE depth (padding slices excluded, matching the reference's
        unpadded batch, DDPM_2D.py:251-278)."""
        host = isinstance(vol_hwd, np.ndarray)
        xp = np if host else jnp
        vol = xp.asarray(vol_hwd, dtype=xp.float32)
        if self.num_eval_slices is not None and self.num_eval_slices < vol.shape[-1]:
            start = (vol.shape[-1] - self.num_eval_slices) // 2
            vol = vol[..., start : start + self.num_eval_slices]
        d = vol.shape[-1]

        slices = xp.moveaxis(vol, -1, 0)[..., None]  # [D, H, W, 1]
        slices, _ = pad_to_multiple(slices, self.depth_multiple, axis=0)

        reco, aux = self._reconstruct(variables, jnp.asarray(slices), key)
        reco_hwd = jnp.moveaxis(reco[:d, ..., 0], 0, -1)  # [H, W, D]
        if not return_aux:
            return reco_hwd
        latent = aux["latent_per_slice"]
        return reco_hwd, {
            "loss": aux["loss_per_slice"][:d].mean(),
            "latent": latent[:d].mean(axis=0) if latent.shape[-1] else None,
        }
