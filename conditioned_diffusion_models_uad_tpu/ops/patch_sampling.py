"""Patch/box sampling for the patched-DDPM (pDDPM) variant.

Capability parity with the reference's ``BoxSampler``
(reference: src/utils/patch_sampling.py:15-112):

* ``sample_single_box``  — one random patch box per batch element  (ref :15-39)
* ``grid_boxes``         — the deterministic evaluation grid, optionally with
                           equalized overlap between neighbours    (ref :41-79)
* ``grid_boxes_cut``     — non-overlapping grid that simply cuts the image into
                           ceil(H/p)*ceil(W/p) tiles clipped at the border
                                                                   (ref :82-112)

TPU-first design: boxes are [N, 4] int32 arrays ``(x0, y0, x1, y1)`` that are
turned into broadcastable masks with ``diffusion.box_to_mask`` — the patch
semantics stay inside the jitted program with static shapes instead of Python
slicing loops.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sample_single_box(
    key: jax.Array, batch: int, image_hw: Tuple[int, int], patch_hw: Tuple[int, int]
) -> jax.Array:
    """Uniform-random patch position per batch element. Returns int32 [B, 4]
    (x0, y0, x1, y1) with the box fully inside the image."""
    h, w = image_hw
    ph, pw = patch_hw
    kx, ky = jax.random.split(key)
    x0 = jax.random.randint(kx, (batch,), 0, max(w - pw, 0) + 1, dtype=jnp.int32)
    y0 = jax.random.randint(ky, (batch,), 0, max(h - ph, 0) + 1, dtype=jnp.int32)
    return jnp.stack([x0, y0, x0 + pw, y0 + ph], axis=1)


def grid_boxes(
    image_hw: Tuple[int, int],
    patch_hw: Tuple[int, int],
    equalize_overlap: bool = True,
) -> np.ndarray:
    """Deterministic eval grid covering the image with patch-sized boxes.

    With ``equalize_overlap`` the boxes are evenly spaced so that any overlap is
    spread uniformly instead of accumulating at the far border (the reference's
    corrected grid, patch_sampling.py:55-75). Returns int32 [N, 4] (host-side:
    the grid is static per config, computed once outside jit)."""
    h, w = image_hw
    ph, pw = patch_hw

    def starts(size, p):
        n = max(1, math.ceil(size / p))
        if n == 1 or size <= p:
            return [0]
        if equalize_overlap:
            return [round(i * (size - p) / (n - 1)) for i in range(n)]
        return [min(i * p, size - p) for i in range(n)]

    boxes = [
        (x0, y0, x0 + pw, y0 + ph) for y0 in starts(h, ph) for x0 in starts(w, pw)
    ]
    return np.asarray(boxes, dtype=np.int32)


def grid_boxes_cut(
    image_hw: Tuple[int, int], patch_hw: Tuple[int, int]
) -> np.ndarray:
    """Non-overlapping tiling: boxes at multiples of the patch size, clipped at
    the image border (the last row/column may be smaller — reference
    sample_grid_cut, patch_sampling.py:82-112). Returns int32 [N, 4]."""
    h, w = image_hw
    ph, pw = patch_hw
    boxes = []
    for y0 in range(0, h, ph):
        for x0 in range(0, w, pw):
            boxes.append((x0, y0, min(x0 + pw, w), min(y0 + ph, h)))
    return np.asarray(boxes, dtype=np.int32)


def paste_patches(
    reco_patches: jax.Array,  # [N, B, H, W, C] per-box reconstructions
    originals: jax.Array,  # [B, H, W, C]
    boxes: jax.Array,  # [N, 4]
    aggregate: str = "avg",  # 'avg' | 'cut'
) -> jax.Array:
    """Assemble a full reconstruction from per-box patch reconstructions
    (reference test-time paste loop, DDPM_2D_patched.py:173-216).

    'avg' averages overlapping boxes; 'cut' lets later boxes overwrite earlier
    ones. Regions covered by no box fall back to the original image. Runs as a
    masked reduction over the (static) box axis — jit-friendly."""
    b, h, w, c = originals.shape
    from ..diffusion.gaussian import box_to_mask

    masks = jax.vmap(lambda bx: box_to_mask(bx[None], h, w)[0])(boxes)  # [N,H,W,1]
    masks = masks[:, None].astype(jnp.float32)  # [N,1,H,W,1]
    if aggregate == "avg":
        num = (reco_patches * masks).sum(axis=0)
        den = masks.sum(axis=0)
        covered = den > 0
        return jnp.where(covered, num / jnp.maximum(den, 1.0), originals)
    out = originals
    for i in range(reco_patches.shape[0]):  # static unroll over the grid
        out = jnp.where(masks[i].astype(bool), reco_patches[i], out)
    return out
