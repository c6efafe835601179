"""Task modules (L4): cDDPM, patched DDPM (pDDPM), and SparK masked pretraining.

Capability parity with the reference Lightning task modules
(reference: src/models/DDPM_2D.py, src/models/DDPM_2D_patched.py,
src/models/Spark_2D.py) rebuilt as *functional* task objects: each task owns its
flax modules + static config and exposes pure functions

    init(key)                        -> variables (params [+ batch_stats])
    loss(variables, batch, key)      -> (scalar loss, (mutated_state, aux))
    reconstruct(variables, slices01, key) -> single-shot volume reconstruction

that the trainer jits/pjits. No framework callbacks, no mutable module state —
the PRNG key and batch-stat collections are threaded explicitly.

TPU-first notes:
  * the t-ensemble at eval (reference DDPM_2D.py:225-239 loops t ∈ {250,500,750}
    sequentially) is batched as an extra *leading axis* via `jax.vmap`, so the
    three denoise passes become one big UNet batch on the MXU.
  * simplex noise is generated on device inside the jitted step (the reference
    generates it per step on the host CPU with numba, SURVEY.md §3.1).
  * the patched variant's box semantics run as broadcastable masks; the eval
    grid is a static array of boxes scanned in one compiled pass.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import (
    GaussianDiffusionConfig,
    box_to_mask,
    diffusion_call,
    ddim_sample,
    make_schedule,
    normalize_to_neg_one_to_one,
    p_sample_loop,
)
from ..diffusion.gaussian import noise_for, split_keys
from ..ops.patch_sampling import grid_boxes, grid_boxes_cut, paste_patches, sample_single_box
from ..ops.simplex import make_noise_fn
from .resnet import ResNetConfig, ResNetEncoder
from .spark import SparKConfig, SparKModel, random_mask, spark_spatial_loss
from .unet import UNetConfig, UNetModel

Variables = Any  # flax variable dict {'params': ..., 'batch_stats': ...}


# --------------------------------------------------------------------------- #
# cDDPM task
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class DDPMTaskConfig:
    """The cDDPM experiment knobs (reference src/models/DDPM_2D.py:17-96 +
    configs/experiment/cDDPM/DDPM_cond_spark_2D.yaml)."""

    image_hw: Tuple[int, int] = (96, 96)
    # conditioning
    condition: bool = True
    cond_dim: int = 128
    encoder_backbone: str = "resnet50"
    # diffusion
    timesteps: int = 1000
    beta_schedule: str = "cosine"
    objective: str = "pred_x0"
    loss_type: str = "l1"
    p2_gamma: float = 0.0
    p2_k: float = 1.0
    noisetype: Optional[str] = "simplex"
    simplex_octaves: int = 6
    simplex_persistence: float = 0.8
    simplex_frequency: float = 64.0
    # eval
    test_timesteps: int = 500
    noise_ensemble: bool = True
    step_ensemble: Sequence[int] = (250, 500, 750)
    num_eval_slices: Optional[int] = None
    # reconstruction mode: 'single_shot' (the reference's active eval path,
    # one forward at fixed t) | 'ancestral' | 'ddim' (truncated iterative
    # reverse sampling from t=test_timesteps — the upstream capability the
    # fork broke, rebuilt from the math; cond_DDPM.py:432-530)
    reco_mode: str = "single_shot"
    sampling_steps: int = 50  # DDIM step count when reco_mode == 'ddim'
    # patched (pDDPM) variant — off for the cDDPM
    patched: bool = False
    patch_hw: Tuple[int, int] = (48, 48)
    grid_boxes_eval: str = "equalized"  # 'equalized' | 'cut'
    patch_aggregation: str = "avg"  # 'avg' | 'cut'
    inpaint: bool = False
    # model
    unet_dim: int = 128
    num_res_blocks: int = 3
    channel_mult: Sequence[int] = (1, 2, 2)
    attention_resolutions: Sequence[int] = (3, 6, 12)
    spatial_transformer: bool = False  # cross-attn conditioning (ref :31)
    use_checkpoint: bool = False  # per-ResBlock remat (ref DDPM_2D_patched.py:34)
    dropout_unet: float = 0.0  # ResBlock dropout (ref DDPM_2D.py:44, default 0)
    # fused Pallas middle-block attention (TPU): VMEM-resident scores —
    # removes the [B, H, 576, 576] HBM buffer from the eval forward.
    # Default ON: measured 1.7x faster than the einsum lowering at the
    # flagship op shape (8.7 vs 14.9 ms, qkv [576,576,3,4,64] bf16) and
    # 2.1x at batch 1152; whole-model eval +0.5% (the flagship UNet has
    # exactly one attention site). Non-TPU backends fall back to the
    # einsum path inside AttentionBlock (PARITY.md "Pallas middle-block
    # attention, measured verdict").
    fused_attention: bool = True
    # Norm apply precision for the UNet's GroupNorm AND (since r4) the
    # conditioning encoder's MaskedBatchNorm: 'compute' folds γ/μ/σ(/β) into
    # per-channel a·x+b and applies ONE compute-dtype FMA per element (stats
    # stay f32). Default ON: the GN sites are measured VPU-bound and this is
    # +8.3% whole-model eval throughput (831.7 → 900.6 slice-denoises/s) at
    # 0.09% max relative reconstruction deviation for the UNet fold alone
    # (PARITY.md "Round-3: folded GroupNorm"); with the encoder fold also
    # active the measured end-to-end deviation bound is in PARITY.md
    # "norm_precision end-to-end deviation (r5)". 'float32' restores the
    # reference's exact GroupNorm32 + f32-BatchNorm semantics
    # (f32 normalize+affine) in both modules.
    norm_precision: str = "compute"
    # compose the FiLM scale-shift into the folded-GN coefficients (one FMA
    # per element; active only under norm_precision='compute'). Measured
    # rejection, default OFF — see UNetConfig.film_fold for the numbers.
    film_fold: bool = False
    dtype: str = "bfloat16"
    # optimizer (reference Adam(lr), DDPM_2D.py:305-306)
    lr: float = 1e-4

    def __post_init__(self):
        # an eval timestep past the schedule would silently gather garbage
        # schedule entries (NaN reconstructions) — fail at config time instead
        bad = [t for t in (*self.step_ensemble, self.test_timesteps)
               if t > self.timesteps or t < 1]
        if bad:
            raise ValueError(
                f"eval timesteps {bad} outside [1, timesteps={self.timesteps}] "
                "(step_ensemble / test_timesteps index the noise schedule "
                "1-based as t-1)"
            )

    @property
    def unet_config(self) -> UNetConfig:
        return UNetConfig(
            in_channels=1,
            model_channels=self.unet_dim,
            out_channels=1,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult),
            cond_dim=self.cond_dim if self.condition else None,
            spatial_transformer=self.spatial_transformer,
            use_checkpoint=self.use_checkpoint,
            fused_attention=self.fused_attention,
            norm_precision=self.norm_precision,
            film_fold=self.film_fold,
            dropout=self.dropout_unet,
            dtype=self.dtype,
        )

    @property
    def diffusion_config(self) -> GaussianDiffusionConfig:
        return GaussianDiffusionConfig(
            objective=self.objective,
            loss_type=self.loss_type,
            inpaint=self.inpaint,
        )


class DDPMTask:
    """The conditioned-DDPM anomaly-detection task."""

    def __init__(self, cfg: DDPMTaskConfig):
        self.cfg = cfg
        self.unet = UNetModel(cfg.unet_config)
        self.encoder = (
            ResNetEncoder(
                ResNetConfig(variant=cfg.encoder_backbone, dtype=cfg.dtype,
                             norm_precision=cfg.norm_precision),
                cond_dim=cfg.cond_dim,
            )
            if cfg.condition
            else None
        )
        self.sched = make_schedule(
            cfg.timesteps, cfg.beta_schedule, cfg.p2_gamma, cfg.p2_k
        )
        self.gd_cfg = cfg.diffusion_config
        self.noise_fn = make_noise_fn(
            cfg.noisetype,
            cfg.simplex_octaves,
            cfg.simplex_persistence,
            cfg.simplex_frequency,
            layout="nhwc",
        )

    # -- initialization ---------------------------------------------------- #
    def init(self, key: jax.Array, batch_size: int = 2) -> Variables:
        # the whole init is ONE jitted program: eager flax init dispatches
        # hundreds of tiny ops (one per parameter), which is pathological on a
        # networked TPU client; jit collapses it to a single executable
        h, w = self.cfg.image_hw

        @jax.jit
        def _init(key):
            ku, ke = jax.random.split(key)
            x = jnp.zeros((batch_size, h, w, 1), jnp.float32)
            t = jnp.zeros((batch_size,), jnp.int32)
            variables = {"params": {}, "batch_stats": {}}
            if self.encoder is not None:
                ev = self.encoder.init(ke, x)
                variables["params"]["encoder"] = ev["params"]
                variables["batch_stats"]["encoder"] = ev.get("batch_stats", {})
                cond = jnp.zeros((batch_size, self.cfg.cond_dim), jnp.float32)
            else:
                cond = None
            uv = self.unet.init(ku, x, t, cond)
            variables["params"]["unet"] = uv["params"]
            return variables

        return _init(key)

    # -- pieces ------------------------------------------------------------ #
    def encode(self, variables: Variables, x01, *, train: bool = False):
        """Clean slice -> conditioning vector c (reference DDPM_2D.forward,
        DDPM_2D.py:102-111). Returns (cond, new_encoder_batch_stats)."""
        if self.encoder is None:
            return None, variables.get("batch_stats", {}).get("encoder", {})
        ev = {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        }
        if train:
            cond, mut = self.encoder.apply(
                ev, x01, train=True, mutable=["batch_stats"]
            )
            return cond, mut["batch_stats"]
        cond = self.encoder.apply(ev, x01, train=False)
        return cond, variables["batch_stats"]["encoder"]

    def _model_fn(self, variables: Variables, *, train: bool = False,
                  dropout_key: Optional[jax.Array] = None):
        """UNet closure. `train` + `dropout_key` activate ResBlock dropout
        (reference dropout_unet knob, DDPM_2D.py:44; default 0 = inert)."""
        use_dropout = train and self.cfg.dropout_unet > 0 and dropout_key is not None

        def fn(x, t, cond):
            return self.unet.apply(
                {"params": variables["params"]["unet"]}, x, t, cond,
                deterministic=not use_dropout,
                rngs={"dropout": dropout_key} if use_dropout else None,
            )

        return fn

    # -- training ---------------------------------------------------------- #
    def loss(
        self,
        variables: Variables,
        batch: dict,  # {'vol': [B,H,W,1] in [0,1], 'mask': [B,H,W,1]}
        key: jax.Array,
        *,
        train: bool = True,
    ):
        """One training/validation objective evaluation
        (reference training_step, DDPM_2D.py:114-135). Returns
        (loss, (new_batch_stats, aux)) with aux = {'reco': [B,H,W,1]}."""
        cfg = self.cfg
        x01 = batch["vol"].astype(jnp.float32)
        k_enc, k_noise, k_diff, k_box, k_drop = jax.random.split(key, 5)

        cond, enc_stats = self.encode(variables, x01, train=train)

        noise = self.noise_fn(k_noise, x01.shape)

        box_mask = None
        if cfg.patched:
            boxes = sample_single_box(
                k_box, x01.shape[0], cfg.image_hw, cfg.patch_hw
            )
            box_mask = box_to_mask(boxes, *cfg.image_hw)

        loss, reco = diffusion_call(
            self.sched,
            self.gd_cfg,
            self._model_fn(variables, train=train, dropout_key=k_drop),
            x01,
            key=k_diff,
            cond=cond,
            noise=noise,
            box_mask=box_mask,
        )
        new_stats = dict(variables.get("batch_stats", {}))
        if self.encoder is not None:
            new_stats["encoder"] = enc_stats
        return loss, (new_stats, {"reco": reco})

    # -- evaluation -------------------------------------------------------- #
    def reconstruct(
        self,
        variables: Variables,
        slices01: jax.Array,  # [D, H, W, 1] volume with depth folded into batch
        key: jax.Array,
    ) -> jax.Array:
        """Single-shot reconstruction of a slice stack at fixed t (see
        `reconstruct_with_aux`). Returns [D, H, W, 1] in [0,1]."""
        return self.reconstruct_with_aux(variables, slices01, key)[0]

    def reconstruct_with_aux(
        self,
        variables: Variables,
        slices01: jax.Array,  # [D, H, W, 1] volume with depth folded into batch
        key: jax.Array,
    ):
        """Single-shot reconstruction of a slice stack at fixed t, with the
        optional noise-ensemble averaged over t ∈ step_ensemble
        (reference test_step, DDPM_2D.py:209-248). Returns (reco, aux):
        reco [D, H, W, 1] in [0,1], and aux carrying the eval-forward scalars
        the reference logs per volume —
        * 'loss_per_slice' [D]: the diffusion loss per slice of the LAST
          ensemble member (the reference's ensemble loop overwrites loss_diff
          each t, DDPM_2D.py:225-239, so only t=step_ensemble[-1] survives
          into AnomalyScore{Comb,Reg,Reco}, :251-254,267-280);
        * 'latent_per_slice' [D, cond_dim]: the conditioning features
          (latentSpace, :214-223; zeros column when unconditional, :222-223).

        The ensemble axis is FLATTENED into the batch axis — all |ensemble|
        denoise passes run as ONE UNet call at batch E*D (see below).

        ``key`` may be one key [2] (the stack is one volume) or per-volume
        keys [G, 2] when the stack packs G same-depth volumes (grouped eval
        dispatch, eval/reconstruct.py::batch_call): every noise field is then
        drawn from its volume's OWN key over its own D//G slice block, so a
        volume reconstructs bitwise the same whichever dispatch group it
        rides in (layout-invariant eval metrics, VERDICT r4 #1)."""
        cfg = self.cfg
        d = slices01.shape[0]
        vol_keys = None if key.ndim == 1 else key  # [G, 2] grouped stacks
        cond, _ = self.encode(variables, slices01, train=False)
        model_fn = self._model_fn(variables)
        latent = (
            cond.astype(jnp.float32)
            if cond is not None
            else jnp.zeros((d, 1), jnp.float32)
        )

        if cfg.reco_mode != "single_shot":
            # truncated iterative reverse sampling: noise the volume to
            # t=test_timesteps with the configured noise source, then run the
            # full ancestral chain (or DDIM) back to x_0 as one lax.scan.
            # No single diffusion loss exists on this path — NaN sentinel.
            aux = {
                "loss_per_slice": jnp.full((d,), jnp.nan, jnp.float32),
                "latent_per_slice": latent,
            }
            x_start = normalize_to_neg_one_to_one(slices01.astype(jnp.float32))
            if cfg.reco_mode == "ddim":
                return ddim_sample(
                    self.sched, self.gd_cfg, model_fn, slices01.shape, key=key,
                    sampling_timesteps=cfg.sampling_steps, cond=cond,
                    start_t=cfg.test_timesteps, x_start=x_start,
                    noise_fn=self.noise_fn,
                ), aux
            return p_sample_loop(
                self.sched, self.gd_cfg, model_fn, slices01.shape, key=key,
                cond=cond, start_t=cfg.test_timesteps, x_start=x_start,
                noise_fn=self.noise_fn,
            ), aux

        if cfg.noise_ensemble and len(cfg.step_ensemble) > 0:
            # The ensemble axis is FLATTENED into the batch axis (one UNet call
            # at batch E*D) rather than vmapped over E calls of batch D: XLA
            # lowers the mapped-axis form to a worse conv layout — measured
            # 487 ms vs 373 ms per 96-slice volume on a v5e chip for bitwise-
            # identical output. Noise fields stay per-member (fresh seed each,
            # reference DDPM_2D.py:225-239) and are generated outside the hot
            # call (the Pallas kernel takes its seed through SMEM).
            e = len(cfg.step_ensemble)
            if vol_keys is None:
                keys = jax.random.split(key, e)
                noises = jnp.concatenate(
                    [self.noise_fn(k, slices01.shape) for k in keys]
                )  # [E*D, H, W, 1]
            else:
                # member-major over the grouped stack: member m's [D] block is
                # the concatenation over volumes of that volume's m-th field —
                # bitwise the single-volume draw `split(key_v, E)[m]`
                g = vol_keys.shape[0]
                member_keys = split_keys(vol_keys, e)  # [E, G, 2]
                sub = (d // g,) + tuple(slices01.shape[1:])
                noises = jnp.concatenate([
                    self.noise_fn(member_keys[m, v], sub)
                    for m in range(e) for v in range(g)
                ])  # [E*D, H, W, 1]
            t_vec = jnp.repeat(
                jnp.asarray([t - 1 for t in cfg.step_ensemble], jnp.int32), d
            )
            imgs = jnp.tile(slices01, (e, 1, 1, 1))
            conds = None if cond is None else jnp.tile(cond, (e, 1))
            loss_ps, reco = diffusion_call(
                self.sched, self.gd_cfg, model_fn, imgs,
                key=key if vol_keys is None else vol_keys[0],
                t=t_vec, cond=conds, noise=noises, reduce=False,
            )
            aux = {
                "loss_per_slice": loss_ps.reshape(e, d)[-1],
                "latent_per_slice": latent,
            }
            return reco.reshape(e, d, *reco.shape[1:]).mean(axis=0), aux

        noise = noise_for(self.noise_fn, key, slices01.shape)
        loss_ps, reco = diffusion_call(
            self.sched, self.gd_cfg, model_fn, slices01,
            key=key if vol_keys is None else vol_keys[0],
            t=cfg.test_timesteps - 1, cond=cond, noise=noise,
            reduce=False,
        )
        return reco, {"loss_per_slice": loss_ps, "latent_per_slice": latent}

    def anomaly_scores(self, loss: float) -> dict:
        """Volume anomaly scores derived from the eval diffusion loss when
        `use_postprocessed_score` is off (reference DDPM_2D.py:251-254,267-280:
        Comb = Reg = Reco = loss_diff; Combi = Reco·Reg; CombPrior = Reco + β·0;
        CombiPrior = Reco·0)."""
        return {
            "reco": loss,
            "reg": loss,
            "comb": loss,
            "combi": loss * loss,
            "comb_prior": loss,
            "combi_prior": 0.0,
        }

    def reconstruct_patched(
        self,
        variables: Variables,
        slices01: jax.Array,  # [D, H, W, 1]
        key: jax.Array,
    ) -> jax.Array:
        """pDDPM grid eval (see `reconstruct_patched_with_aux`)."""
        return self.reconstruct_patched_with_aux(variables, slices01, key)[0]

    def reconstruct_patched_with_aux(
        self,
        variables: Variables,
        slices01: jax.Array,  # [D, H, W, 1]
        key: jax.Array,
    ):
        """pDDPM eval: denoise each grid patch with the rest of the image clean,
        then paste the patch reconstructions together (reference
        DDPM_2D_patched.py:173-216). The grid is static; the per-box passes run
        under one `lax.scan` (weights are traced once).

        aux mirrors the reference's patched scalars: 'loss_per_slice' is the
        LAST grid box's diffusion loss (the box loop overwrites loss_diff,
        ref :188,219-221) and 'latent_per_slice' is the zeros dummy
        (ref :171).

        ``key`` follows the same [2] / per-volume [G, 2] contract as
        `reconstruct_with_aux`: grouped stacks draw every box's noise from
        the owning volume's key (bitwise the single-volume draws)."""
        cfg = self.cfg
        if cfg.grid_boxes_eval == "cut":
            boxes_np = grid_boxes_cut(cfg.image_hw, cfg.patch_hw)
        else:
            boxes_np = grid_boxes(cfg.image_hw, cfg.patch_hw, equalize_overlap=True)
        boxes = jnp.asarray(boxes_np)
        cond, _ = self.encode(variables, slices01, train=False)
        model_fn = self._model_fn(variables)
        h, w = cfg.image_hw
        d = slices01.shape[0]
        n = boxes.shape[0]

        # Boxes are processed in chunks flattened into the batch axis: larger
        # UNet batches lay out better on the MXU (measured 1.45 ms/slice at
        # batch 96 vs 1.27 at 288 on a v5e chip). The chunk is the largest
        # divisor of the grid size that keeps the batch ≤ ~512 slices, so no
        # padding compute is wasted; the chunk loop stays a lax.map (weights
        # traced once).
        max_chunk = max(1, 512 // max(d, 1))
        chunk = next((c for c in range(min(n, max_chunk), 0, -1) if n % c == 0), 1)

        def one_chunk(kb):
            ks, bxs = kb  # [chunk, 2] or [chunk, G, 2], [chunk, 4]
            noise = jnp.concatenate(
                [noise_for(self.noise_fn, ks[i], slices01.shape)
                 for i in range(chunk)]
            )  # [chunk*D, H, W, 1]
            masks = jax.vmap(lambda bx: box_to_mask(bx[None], h, w)[0])(bxs)
            box_mask = jnp.repeat(masks, d, axis=0)  # [chunk*D, H, W, 1]
            imgs = jnp.tile(slices01, (chunk, 1, 1, 1))
            conds = None if cond is None else jnp.tile(cond, (chunk, 1))
            loss_ps, reco = diffusion_call(
                self.sched, self.gd_cfg, model_fn, imgs,
                key=ks[0] if ks.ndim == 2 else ks[0, 0],
                t=cfg.test_timesteps - 1, cond=conds, noise=noise,
                box_mask=box_mask, reduce=False,
            )
            return reco.reshape(chunk, d, *reco.shape[1:]), loss_ps.reshape(chunk, d)[-1]

        # [n, 2] (one volume) or [n, G, 2] (per-volume box keys: row b, col v
        # is bitwise `split(key_v, n)[b]`, the draw volume v sees alone)
        box_keys = split_keys(key, n)
        keys = box_keys.reshape(n // chunk, chunk, *box_keys.shape[1:])
        bxs = boxes.reshape(n // chunk, chunk, -1)
        recos, loss_last = jax.lax.map(one_chunk, (keys, bxs))
        recos = recos.reshape(n, d, h, w, 1)
        aux = {
            "loss_per_slice": loss_last[-1],  # last grid box (ref :188,219)
            "latent_per_slice": jnp.zeros((d, 1), jnp.float32),
        }
        return (
            paste_patches(recos, slices01, boxes, aggregate=cfg.patch_aggregation),
            aux,
        )

    # -- iterative samplers (upstream capability, ref cond_DDPM.py:432-530) - #
    def sample(
        self,
        variables: Variables,
        shape: tuple,
        key: jax.Array,
        *,
        cond: Optional[jax.Array] = None,
        x_start01: Optional[jax.Array] = None,
        start_t: int = 0,
        use_ddim: bool = False,
        sampling_timesteps: Optional[int] = None,
    ) -> jax.Array:
        """Full or truncated reverse sampling (ancestral / DDIM) with the
        configured noise source per step."""
        model_fn = self._model_fn(variables)
        x_start = (
            normalize_to_neg_one_to_one(x_start01) if x_start01 is not None else None
        )
        if use_ddim:
            return ddim_sample(
                self.sched, self.gd_cfg, model_fn, shape, key=key,
                sampling_timesteps=sampling_timesteps or 50, cond=cond,
                start_t=start_t, x_start=x_start, noise_fn=self.noise_fn,
            )
        return p_sample_loop(
            self.sched, self.gd_cfg, model_fn, shape, key=key, cond=cond,
            start_t=start_t, x_start=x_start, noise_fn=self.noise_fn,
        )


# --------------------------------------------------------------------------- #
# SparK masked-image-modeling pretraining task
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class SparkTaskConfig:
    """SparK pretraining knobs (reference src/models/Spark_2D.py:12-127 +
    configs/experiment/cDDPM/Spark_2D_pretrain.yaml)."""

    image_hw: Tuple[int, int] = (96, 96)
    backbone: str = "resnet50"
    mask_ratio: float = 0.65
    # ranged / multi-ratio masking (reference mask(), spark/Spark_2D.py:120-141):
    # mask_ratio_hi != mask_ratio enables the range; mask_uniform picks one
    # U(lo,hi) ratio per step, else per-batch-third ratios are permuted
    mask_ratio_hi: Optional[float] = None
    mask_uniform: bool = True
    dec_dim: int = 128
    pix_norm: int = 0
    loss_l2: bool = True
    loss_on_mask: bool = True
    mask_loss_weight: float = 1.0  # δ in full-L1 + δ·masked (ref Spark_2D.py:26-32)
    # eval scoring when loss_on_mask is off: L1_AE recon_error + delta_mask ·
    # masked loss (reference Spark_2D.forward, Spark_2D.py:26-33)
    delta_mask: float = 0.0
    loss_strategy: str = "sum"  # L1_AE 'sum' | 'mean' (ref cfg.lossStrategy)
    use_pos_emb: bool = False
    dtype: str = "bfloat16"
    # BatchNorm apply precision: 'compute' folds γ/μ/σ/β into per-channel
    # a·x+b applied as ONE compute-dtype FMA per element (stats stay exact
    # f32) — the MaskedBatchNorm twin of the UNet's folded GroupNorm.
    # Default 'float32': MEASURED faster at the reference protocol's batch
    # 32 (5.25 vs 8.66 ms/step in-scan; the under-batched SparK step is not
    # normalize-bound there). 'compute' wins +5-7% only at batch >=128
    # (PARITY.md "SparK pretrain roofline").
    norm_precision: str = "float32"
    # optimizer (reference AdamW(lr, wd .05, betas .9/.95), Spark_2D.py:123-124)
    lr: float = 2e-4
    weight_decay: float = 0.05
    b1: float = 0.9
    b2: float = 0.95

    @property
    def spark_config(self) -> SparKConfig:
        return SparKConfig(
            backbone=self.backbone,
            input_size=self.image_hw[0],
            mask_ratio=self.mask_ratio,
            dec_dim=self.dec_dim,
            pix_norm=self.pix_norm,
            loss_l2=self.loss_l2,
            use_pos_emb=self.use_pos_emb,
            dtype=self.dtype,
            norm_precision=self.norm_precision,
        )


class SparkTask:
    """Masked-image-modeling pretraining of the conditioning encoder."""

    def __init__(self, cfg: SparkTaskConfig):
        self.cfg = cfg
        self.model = SparKModel(cfg.spark_config)

    def init(self, key: jax.Array, batch_size: int = 2) -> Variables:
        h, w = self.cfg.image_hw
        scfg = self.cfg.spark_config

        @jax.jit
        def _init(key):
            km, ki = jax.random.split(key)
            x = jnp.zeros((batch_size, h, w, 1), jnp.float32)
            active = random_mask(km, batch_size, scfg.fmap_size, scfg.len_keep)
            return dict(self.model.init(ki, x, active))

        return _init(key)

    def loss(
        self,
        variables: Variables,
        batch: dict,
        key: jax.Array,
        *,
        train: bool = True,
    ):
        """Masked reconstruction loss (reference Spark_2D.training_step,
        Spark_2D.py:26-50): masked-patch loss when loss_on_mask, else full-image
        L1 plus δ × masked-patch loss."""
        cfg = self.cfg
        scfg = cfg.spark_config
        x01 = batch["vol"].astype(jnp.float32)
        k_mask, _ = jax.random.split(key)
        if cfg.mask_ratio_hi is not None and cfg.mask_ratio_hi != cfg.mask_ratio:
            from .spark import random_mask_multi_ratio, random_mask_uniform_ratio

            if cfg.mask_uniform:
                active = random_mask_uniform_ratio(
                    k_mask, x01.shape[0], scfg.fmap_size,
                    cfg.mask_ratio, cfg.mask_ratio_hi,
                )
            else:
                active = random_mask_multi_ratio(
                    k_mask, x01.shape[0], scfg.fmap_size
                )
        else:
            active = random_mask(k_mask, x01.shape[0], scfg.fmap_size, scfg.len_keep)

        if train:
            reco, mut = self.model.apply(
                variables, x01, active, train=True, mutable=["batch_stats"]
            )
            new_stats = mut["batch_stats"]
        else:
            reco = self.model.apply(variables, x01, active, train=False)
            new_stats = variables.get("batch_stats", {})

        masked_loss = spark_spatial_loss(scfg, x01, reco, active)
        if cfg.loss_on_mask:
            loss = masked_loss
        else:
            full_l1 = jnp.abs(reco - x01).mean()
            loss = full_l1 + cfg.mask_loss_weight * masked_loss
        return loss, (new_stats, {"reco": reco, "active": active})

    def reconstruct(
        self, variables: Variables, slices01: jax.Array, key: jax.Array
    ) -> jax.Array:
        """Volume slice-stack reconstruction (see `reconstruct_with_aux`)."""
        return self.reconstruct_with_aux(variables, slices01, key)[0]

    def reconstruct_with_aux(
        self, variables: Variables, slices01: jax.Array, key: jax.Array
    ):
        """Volume slice-stack reconstruction for the eval harness
        (reference Spark_2D.test_step, Spark_2D.py:60-116). Returns
        (reco, aux) where aux['loss_per_slice'] reproduces the reference's
        per-volume eval loss (Spark_2D.forward, :26-33): the masked spatial
        loss when loss_on_mask, else L1_AE recon_error + delta_mask · masked.
        'latent_per_slice' is an empty column — the reference's Spark
        test_step never records latentSpace (:60-116).

        ``key`` follows the [2] / per-volume [G, 2] contract of
        DDPMTask.reconstruct_with_aux: a grouped stack draws each volume's
        eval mask from its own key (bitwise the single-volume draw)."""
        cfg = self.cfg
        scfg = cfg.spark_config
        x01 = slices01.astype(jnp.float32)
        d = x01.shape[0]
        if key.ndim == 1:
            active = random_mask(key, d, scfg.fmap_size, scfg.len_keep)
        else:
            g = key.shape[0]
            active = jnp.concatenate([
                random_mask(key[v], d // g, scfg.fmap_size, scfg.len_keep)
                for v in range(g)
            ])
        reco = self.model.apply(variables, x01, active, train=False)
        masked_ps = spark_spatial_loss(scfg, x01, reco, active, per_sample=True)
        if cfg.loss_on_mask:
            loss_ps = masked_ps
        else:
            from .losses import l1_ae_loss

            l1 = l1_ae_loss(reco, x01, cfg.loss_strategy, per_sample=True)
            loss_ps = l1["recon_error"] + cfg.delta_mask * masked_ps
        aux = {
            "loss_per_slice": loss_ps,
            "latent_per_slice": jnp.zeros((d, 0), jnp.float32),
        }
        return reco, aux

    def anomaly_scores(self, loss: float) -> dict:
        """Spark eval scores (reference Spark_2D.test_step, :100-112):
        Reco = the forward loss; Reg and the Comb* family are 0."""
        return {
            "reco": loss,
            "reg": 0.0,
            "comb": 0.0,
            "combi": 0.0,
            "comb_prior": 0.0,
            "combi_prior": 0.0,
        }


# --------------------------------------------------------------------------- #
# Checkpoint surgery: SparK pretrain -> cDDPM conditioning encoder
# --------------------------------------------------------------------------- #
def import_spark_encoder(ddpm_vars: Variables, spark_vars: Variables) -> Variables:
    """Copy the SparK-pretrained backbone into the cDDPM's conditioning encoder
    (the reference's state-dict key remap `sparse_encoder.sp_cnn.* -> encoder.*`
    dropping the fc head, DDPM_2D.py:79-96).

    Our SparK model stores the trunk under `encoder/...`; the DDPM conditioning
    encoder stores it under `backbone/...` with a fresh `fc` head on top."""
    out = jax.tree_util.tree_map(lambda v: v, ddpm_vars)  # shallow-ish copy
    out["params"] = dict(out["params"])
    enc = dict(out["params"]["encoder"])
    enc["backbone"] = spark_vars["params"]["encoder"]
    out["params"]["encoder"] = enc
    if "batch_stats" in spark_vars and "batch_stats" in out:
        bs = dict(out["batch_stats"])
        enc_bs = dict(bs.get("encoder", {}))
        enc_bs["backbone"] = spark_vars["batch_stats"].get("encoder", {})
        bs["encoder"] = enc_bs
        out["batch_stats"] = bs
    return out


TASKS = {
    "DDPM_2D": DDPMTask,
    "Spark_2D": SparkTask,
}
