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

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..parallel.mesh import batch_sharding, pad_to_multiple, replicated_sharding
from .fused import _STATIC_EVAL_ARGS, group_eval_core


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

    def _prep(self, vol_hwd):
        """[H, W, D] volume -> ([D, H, W, 1] slice stack, true depth)."""
        xp = np if isinstance(vol_hwd, np.ndarray) else jnp
        vol = xp.asarray(vol_hwd, dtype=xp.float32)
        if self.num_eval_slices is not None and self.num_eval_slices < vol.shape[-1]:
            start = (vol.shape[-1] - self.num_eval_slices) // 2
            vol = vol[..., start : start + self.num_eval_slices]
        return xp.moveaxis(vol, -1, 0)[..., None], vol.shape[-1]

    @staticmethod
    def _aux_out(aux, sl, d):
        latent = aux["latent_per_slice"][sl][:d]
        return {
            "loss": aux["loss_per_slice"][sl][:d].mean(),
            "latent": latent.mean(axis=0) if latent.shape[-1] else None,
        }

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
        slices, d = self._prep(vol_hwd)
        slices, _ = pad_to_multiple(slices, self.depth_multiple, axis=0)

        reco, aux = self._reconstruct(variables, jnp.asarray(slices), key)
        reco_hwd = jnp.moveaxis(reco[:d, ..., 0], 0, -1)  # [H, W, D]
        if not return_aux:
            return reco_hwd
        return reco_hwd, self._aux_out(aux, slice(None), d)

    def batch_call(self, variables, vols, key):
        """Reconstruct several same-resolution volumes in ONE device dispatch.

        The slice stacks are concatenated on the (sharded) batch axis — a
        group of two 96-slice x3-ensemble volumes runs the UNet at batch 576,
        the measured-best layout (PARITY.md: 1.24 vs 1.27 ms/slice), and
        halves the per-volume dispatch round trips on a tunneled transport.
        Each volume is padded to the group's common bucketed depth so group
        size x depth bucket fully determines the compiled shape.

        Returns a list of (reco_hwd, {'loss','latent'}) in input order —
        the same contract as ``__call__(..., return_aux=True)``. ``key`` is
        the [G, 2] per-volume key stack (orchestrate builds fold_in(key, i)
        per member): each volume draws its own noise fields inside the
        grouped program, bitwise what it would draw dispatched alone, so
        grouping never moves the eval metrics (a single [2] key is also
        accepted and shared — legacy behavior, not layout-invariant).
        """
        preps = [self._prep(v) for v in vols]
        pad = max(
            -(-p.shape[0] // self.depth_multiple) * self.depth_multiple
            for p, _ in preps
        )
        stacks = []
        for p, _ in preps:
            if p.shape[0] < pad:
                xp = np if isinstance(p, np.ndarray) else jnp
                p = xp.pad(p, [(0, pad - p.shape[0])] + [(0, 0)] * (p.ndim - 1),
                           mode="edge")
            stacks.append(jnp.asarray(p))
        reco, aux = self._reconstruct(variables, jnp.concatenate(stacks, axis=0), key)
        out = []
        for g, (_, d) in enumerate(preps):
            sl = slice(g * pad, g * pad + pad)
            reco_hwd = jnp.moveaxis(reco[sl][:d, ..., 0], 0, -1)
            out.append((reco_hwd, self._aux_out(aux, sl, d)))
        return out

    # ------------------------------------------------------------------ #
    # one-dispatch reconstruct + score
    # ------------------------------------------------------------------ #
    def _scored_program(self):
        """Compile-once wrapper chaining the reconstruction onto the vmapped
        per-volume scoring core (eval/fused.py): ONE device program computes
        reco -> residual -> metrics for the whole dispatch group, and its
        packed output is the group's ONE D2H fetch. On a high-RTT tunneled
        transport this collapses the former 1 recon dispatch + G scoring
        dispatches + G fetches per group into 1 + 1.

        On a multi-device mesh the group axis is VOLUME-parallel: the slice
        stack stays batch-sharded through the UNet, then XLA reshards so each
        device scores whole volumes locally (no collectives inside the
        scoring math — sorts/reductions are per-volume). Requires the group
        size to divide by the mesh (orchestrate gates on that)."""
        if getattr(self, "_scored", None) is not None:
            return self._scored
        fn = self._reconstruct
        # group-axis (volume-parallel) sharding constraint for the scoring
        # stage's outputs; inputs are committed by batch_call_scored (jit
        # in_shardings cannot be combined with the static kwargs below)
        shb = batch_sharding(self.mesh) if self.mesh is not None else None

        @partial(
            jax.jit,
            static_argnames=("g", "d") + _STATIC_EVAL_ARGS,
        )
        def scored(
            variables, slices, key, orig, mask, seg, th_rec, th_app,
            *, g, d, **statics,
        ):
            reco, aux = fn(variables, slices, key)
            pad = slices.shape[0] // g
            h, w = reco.shape[1], reco.shape[2]
            reco_g = jnp.moveaxis(
                reco[..., 0].reshape(g, pad, h, w)[:, :d], 1, -1
            )  # [G, H, W, d]
            loss_g = aux["loss_per_slice"].reshape(g, pad)[:, :d].mean(axis=1)
            lat = aux["latent_per_slice"]
            latent_g = lat.reshape(g, pad, lat.shape[-1])[:, :d].mean(axis=1)
            diff_g, packed_g = group_eval_core(
                orig, reco_g, mask, seg, th_rec, th_app, loss_g, latent_g,
                **statics,
            )
            if shb is not None:
                diff_g = jax.lax.with_sharding_constraint(diff_g, shb)
                packed_g = jax.lax.with_sharding_constraint(packed_g, shb)
            return diff_g, packed_g

        self._scored = scored
        return scored

    def latent_len(self, variables, vol_hwd, key) -> int:
        """Conditioning-latent width of the packed buffer (abstract shape
        eval — no device work)."""
        if getattr(self, "_latent_len", None) is None:
            slices, _ = self._prep(vol_hwd)
            slices, _ = pad_to_multiple(slices, self.depth_multiple, axis=0)
            _, aux = jax.eval_shape(self._reconstruct, variables, slices, key)
            self._latent_len = int(aux["latent_per_slice"].shape[-1])
        return self._latent_len

    def batch_call_scored(self, variables, subs, key, flags):
        """Reconstruct AND score a group of same-shape subjects in ONE device
        dispatch. `subs` are eval subject dicts (vol / vol_orig / mask_orig /
        seg_orig); `key` is the [G, 2] per-volume key stack (see batch_call);
        `flags` is EvalSession._fused_flags(...). Returns a list of
        (diff_dev [H,W,D], packed_dev [B]) per subject in input order."""
        preps = [self._prep(s["vol"]) for s in subs]
        pad = max(
            -(-p.shape[0] // self.depth_multiple) * self.depth_multiple
            for p, _ in preps
        )
        d = preps[0][1]
        stacks = []
        for p, _ in preps:
            if p.shape[0] < pad:
                xp = np if isinstance(p, np.ndarray) else jnp
                p = xp.pad(p, [(0, pad - p.shape[0])] + [(0, 0)] * (p.ndim - 1),
                           mode="edge")
            stacks.append(jnp.asarray(p))
        g = len(subs)
        orig = jnp.stack([jnp.asarray(s["vol_orig"], jnp.float32) for s in subs])
        mask = jnp.stack([jnp.asarray(s["mask_orig"], jnp.float32) for s in subs])
        seg = jnp.stack([jnp.asarray(s["seg_orig"], jnp.float32) for s in subs])
        th_rec = jnp.full((g,), flags["th_record"], jnp.float32)
        th_app = jnp.full((g,), flags["th_apply"], jnp.float32)
        slices_in = jnp.concatenate(stacks, axis=0)
        if self.mesh is not None:
            # commit the group axis volume-parallel across the mesh (requires
            # g to divide by the mesh; orchestrate gates on that) — each
            # device scores whole volumes locally, no scoring collectives
            shb = batch_sharding(self.mesh)
            rep = replicated_sharding(self.mesh)
            slices_in = jax.device_put(slices_in, shb)
            orig, mask, seg = (
                jax.device_put(a, shb) for a in (orig, mask, seg)
            )
            th_rec, th_app = (
                jax.device_put(a, rep) for a in (th_rec, th_app)
            )
        return self._scored_program()(
            variables, slices_in, key,
            orig, mask, seg, th_rec, th_app,
            g=g, d=d, **flags["statics"],
        )  # (diff_g [G,H,W,D], packed_g [G,B]) — fetch packed_g ONCE
