"""SparK masked-image-modeling pretraining (sparse-conv MAE) in flax.

Capability parity with the reference's SparK stack
(reference: src/models/modules/spark/Spark_2D.py:21-217, decoder.py:17-112,
encoder.py, models.py; experiment defaults configs/model/Spark_2D.yaml +
configs/experiment/cDDPM/Spark_2D_pretrain.yaml: resnet50 backbone, mask_ratio
0.65, pyramid 4, dec_dim 128, L2 patch loss on masked patches, pix_norm off):

* random patch masking on the stride-32 feature grid (`random_mask`)
* hierarchical masked ("sparse") encoding — dense conv + mask-multiply semantics,
  explicit mask argument (see resnet.py)
* per-level densify: masked-BN -> fill masked sites with a learned mask token
  (+ optional sin-cos pos-emb) -> 1x1/3x3 projection into decoder widths
* LightDecoder: 5 transposed-conv stages summing in pyramid features, 1x1 head
* patch-space loss, mean over *masked* patches only (or dense), optional
  per-patch pixel normalization (pix_norm)

TPU-first: everything is a single jittable NHWC program; masking is computed
with a top-k over uniform scores (static `len_keep`) so shapes stay static.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .resnet import MaskedBatchNorm, ResNetBackbone, ResNetConfig, upsample_mask


@dataclasses.dataclass(frozen=True)
class SparKConfig:
    backbone: str = "resnet50"
    input_size: int = 96
    in_channels: int = 1
    mask_ratio: float = 0.65
    dec_dim: int = 128
    pyramid: int = 4
    pix_norm: int = 0  # 0: off, 1: per-patch norm, 2: mean-shift
    loss_l2: bool = True
    dense_loss: bool = False
    use_pos_emb: bool = False
    axis_name: Optional[str] = None
    dtype: str = "float32"
    # 'float32' = reference-exact BN normalize; 'compute' = folded per-channel
    # a·x+b BN apply in the compute dtype (see resnet.MaskedBatchNorm)
    norm_precision: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def fold_norm(self) -> bool:
        return self.norm_precision == "compute"

    @property
    def downsample_ratio(self) -> int:
        return 32

    @property
    def fmap_size(self) -> int:
        return self.input_size // self.downsample_ratio

    @property
    def len_keep(self) -> int:
        f = self.fmap_size
        return round(f * f * (1 - self.mask_ratio))


def random_mask(key: jax.Array, batch: int, fmap_size: int, len_keep: int):
    """Per-sample random active-site mask on the f x f grid: exactly `len_keep`
    active sites (reference SparK_2D.mask, spark/Spark_2D.py:139-141 keep-top-k
    of a random argsort). Returns bool [B, f, f]."""
    f2 = fmap_size * fmap_size
    scores = jax.random.uniform(key, (batch, f2))
    ranks = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)  # rank of each site
    active = ranks < len_keep
    return active.reshape(batch, fmap_size, fmap_size)


def random_mask_uniform_ratio(
    key: jax.Array, batch: int, fmap_size: int, lo: float, hi: float
):
    """Ranged-ratio variant (reference mask(), spark/Spark_2D.py:125-127):
    one ratio r ~ U(lo, hi) per call; keep round(f^2 (1-r)) sites. The keep
    count is a traced scalar compared against ranks — shapes stay static."""
    f2 = fmap_size * fmap_size
    k_r, k_s = jax.random.split(key)
    r = jax.random.uniform(k_r, (), minval=lo, maxval=hi)
    len_keep = jnp.round(f2 * (1.0 - r)).astype(jnp.int32)
    scores = jax.random.uniform(k_s, (batch, f2))
    ranks = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
    return (ranks < len_keep).reshape(batch, fmap_size, fmap_size)


def random_mask_multi_ratio(
    key: jax.Array, batch: int, fmap_size: int, ratios=(0.55, 0.65, 0.75)
):
    """Per-batch-third ratio variant (reference mask(), spark/Spark_2D.py:
    129-137): the batch is split in thirds, each third Bernoulli-masked at one
    of the (permuted) ratios, with one guaranteed active site per sample."""
    k_p, k_b, k_rc = jax.random.split(key, 3)
    ratios = jnp.asarray(ratios, jnp.float32)
    perm = jax.random.permutation(k_p, 3)
    thirds = jnp.linspace(0, batch, 4).astype(jnp.int32)
    sample_third = jnp.searchsorted(thirds[1:], jnp.arange(batch), side="right")
    r = ratios[perm][jnp.clip(sample_third, 0, 2)][:, None, None]
    active = jax.random.uniform(k_b, (batch, fmap_size, fmap_size)) >= r
    rr, cc = jax.random.randint(k_rc, (2, batch), 0, fmap_size)
    active = active.at[jnp.arange(batch), rr, cc].set(True)
    return active


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """Standard 2D sin-cos positional embedding table [grid*grid, embed_dim]."""
    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid_size, dtype=np.float32)
    gw = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(gw, gh), axis=0).reshape(2, -1)
    emb = np.concatenate(
        [emb_1d(embed_dim // 2, grid[0]), emb_1d(embed_dim // 2, grid[1])], axis=1
    )
    return emb.astype(np.float32)


class UNetBlock2x(nn.Module):
    """conv-BN-ReLU6 x2 (reference decoder.py:17-31; cmid=0 -> mid width = cin)."""

    cout: int
    last_act: bool = True
    dtype: jnp.dtype = jnp.float32
    fold_norm: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cin = x.shape[-1]
        bn = lambda name: MaskedBatchNorm(dtype=self.dtype,
                                          fold_apply=self.fold_norm, name=name)
        h = nn.Conv(cin, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        h = bn("bn1")(h, None, use_running_average=not train)
        h = jnp.minimum(nn.relu(h), 6.0)
        h = nn.Conv(self.cout, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(h)
        h = bn("bn2")(h, None, use_running_average=not train)
        if self.last_act:
            h = jnp.minimum(nn.relu(h), 6.0)
        return h


class DecoderStage(nn.Module):
    """2x transposed-conv upsample + UNetBlock2x (reference decoder.py:34-43)."""

    cout: int
    dtype: jnp.dtype = jnp.float32
    fold_norm: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cin = x.shape[-1]
        h = nn.ConvTranspose(
            cin, (4, 4), strides=(2, 2), padding="SAME", use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32, name="up",
        )(x)
        return UNetBlock2x(self.cout, last_act=False, dtype=self.dtype,
                           fold_norm=self.fold_norm, name="block")(h, train=train)


class LightDecoder(nn.Module):
    """log2(downsample)=5 upsample stages, widths dec_dim/2^i, summing in the
    pyramid features, 1x1 projection to 1 channel (reference decoder.py:46-76)."""

    dec_dim: int = 128
    num_stages: int = 5
    dtype: jnp.dtype = jnp.float32
    fold_norm: bool = False

    @nn.compact
    def __call__(self, to_dec: List[Optional[jax.Array]], *, train: bool = False):
        channels = [self.dec_dim // 2**i for i in range(self.num_stages + 1)]
        x = None
        for i in range(self.num_stages):
            if i < len(to_dec) and to_dec[i] is not None:
                x = to_dec[i] if x is None else x + to_dec[i]
            x = DecoderStage(channels[i + 1], dtype=self.dtype,
                             fold_norm=self.fold_norm, name=f"stage{i}")(
                x, train=train
            )
        return nn.Conv(
            1, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
            name="proj",
        )(x)


def patchify(bhwc: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C]."""
    b, h, w, c = bhwc.shape
    fh, fw = h // patch, w // patch
    x = bhwc.reshape(b, fh, patch, fw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, fh * fw, patch * patch * c)


def unpatchify(bln: jax.Array, patch: int, fmap: int) -> jax.Array:
    b, l, n = bln.shape
    c = n // (patch * patch)
    x = bln.reshape(b, fmap, fmap, patch, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, fmap * patch, fmap * patch, c)


class SparKModel(nn.Module):
    """Masked encode -> densify -> decode. __call__(x, active, train) with
    x: [B, H, W, 1] and active: [B, f, f] bool; returns (reco, per_patch_loss_map)
    where reco is [B, H, W, 1] (reference SparK_2D.forward,
    spark/Spark_2D.py:143-178)."""

    cfg: SparKConfig

    @nn.compact
    def __call__(self, x, active, *, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        rcfg = ResNetConfig(
            variant=cfg.backbone, in_channels=cfg.in_channels,
            axis_name=cfg.axis_name, dtype=cfg.dtype,
            norm_precision=cfg.norm_precision,
        )

        # mask the input pixels, encode hierarchically with masked convs
        mask_full = upsample_mask(active, x.shape[1], x.shape[2])
        x_masked = x.astype(dt) * mask_full.astype(dt)
        feats = ResNetBackbone(rcfg, name="encoder")(x_masked, active, train=train)
        feats = feats[::-1]  # smallest first: [C5, C4, C3, C2]

        fea = rcfg.fea_dim
        d_fea = cfg.dec_dim
        fmap = cfg.fmap_size
        to_dec = []
        cur_active = active
        for i in range(cfg.pyramid):
            bcff = feats[i]
            m = upsample_mask(cur_active, bcff.shape[1], bcff.shape[2])
            h = MaskedBatchNorm(axis_name=cfg.axis_name, dtype=dt,
                                fold_apply=cfg.fold_norm, name=f"densify_bn{i}")(
                bcff, m, use_running_average=not train
            )
            token = self.param(
                f"mask_token{i}",
                nn.initializers.truncated_normal(0.02),
                (1, 1, 1, fea),
                jnp.float32,
            ).astype(h.dtype)
            if cfg.use_pos_emb:
                pe = get_2d_sincos_pos_embed(fea, bcff.shape[1])
                pe = jnp.asarray(pe).reshape(1, bcff.shape[1], bcff.shape[2], fea)
                token = token + pe.astype(h.dtype)
            h = jnp.where(m.astype(bool), h, token)
            kernel = 1 if i == 0 else 3
            h = nn.Conv(
                d_fea, (kernel, kernel), padding="SAME", use_bias=True,
                dtype=dt, param_dtype=jnp.float32, name=f"densify_proj{i}",
            )(h)
            to_dec.append(h)
            # dilate the active grid for the next (2x larger) level
            cur_active = jnp.repeat(jnp.repeat(cur_active, 2, axis=1), 2, axis=2)
            fea //= 2
            d_fea //= 2
            fmap *= 2

        reco = LightDecoder(cfg.dec_dim, dtype=dt, fold_norm=cfg.fold_norm,
                            name="decoder")(to_dec, train=train)
        return reco.astype(jnp.float32)


def spark_spatial_loss(cfg: SparKConfig, inp, rec, active, per_sample: bool = False):
    """Patch-space reconstruction loss (reference spatial_loss,
    spark/Spark_2D.py:180-199): optional per-patch pixel normalization, L2/L1,
    mean over masked patches (or all patches when dense_loss).

    ``per_sample=True`` returns a [B] vector (masked-patch mean per slice) for
    the eval path, where the padded depth axis must be cropped before the
    volume reduction (ref Spark_2D.py:86-100 scores the true slice stack)."""
    p = cfg.downsample_ratio
    inp_p = patchify(inp.astype(jnp.float32), p)
    rec_p = patchify(rec.astype(jnp.float32), p)
    if cfg.pix_norm == 2:
        mean = inp.mean(axis=(1, 2), keepdims=True)
        rec_p = patchify(rec.astype(jnp.float32) + mean, p)
    if cfg.pix_norm == 1:
        mean = inp_p.mean(axis=-1, keepdims=True)
        var = (inp_p.var(axis=-1, keepdims=True) + 1e-6) ** 0.5
        inp_p = (inp_p - mean) / var
    err = (rec_p - inp_p) ** 2 if cfg.loss_l2 else jnp.abs(rec_p - inp_p)
    if cfg.dense_loss:
        return err.mean(axis=(1, 2)) if per_sample else err.mean()
    per_patch = err.mean(axis=2)  # [B, L]
    non_active = 1.0 - active.reshape(active.shape[0], -1).astype(jnp.float32)
    if per_sample:
        return (per_patch * non_active).sum(axis=1) / (non_active.sum(axis=1) + 1e-8)
    return (per_patch * non_active).sum() / (non_active.sum() + 1e-8)
