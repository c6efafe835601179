"""Guided-diffusion style UNet, rebuilt TPU-first in flax/linen.

Capability parity with the reference's ``UNetModel``
(reference: src/models/modules/OpenAI_Unet.py:483-1006) — same architecture family
and the same cDDPM instantiation semantics (reference src/models/DDPM_2D.py:37-60):

* ResBlocks with FiLM scale-shift GroupNorm conditioning   (ref :182-338)
* resblock up/down sampling variants                       (ref :236-243,284-293)
* QKV attention, "new order" (split qkv before heads)      (ref :449-476)
* attention placement by downsample rate `ds`; with the cDDPM defaults
  (att_res (3,6,12), ds ∈ {1,2,4}) no encoder/decoder attention matches and the
  middle block carries the single attention at 24×24       (ref :637,696-726)
* conditioning as a *label-embedding* pathway: when `cond_dim` is set the time
  embedding (model_ch → 4·model_ch) is concatenated with an MLP of the condition
  vector, giving a 2·4·model_ch FiLM embedding             (ref :583-602,849-852)
* zero-initialized output convolutions ("zero_module")     (ref :256-258,793-797)
* GroupNorm(32) computed in float32 even under bf16 compute
  (ref GroupNorm32, LDM/modules/diffusionmodules/util.py:199-216)

TPU-first differences (deliberate, not omissions):
* NHWC layout throughout — XLA's native conv layout on TPU (the MXU consumes
  [N,H,W,C] x [kh,kw,Cin,Cout] directly, no transposes in the hot path).
* bfloat16 activations with float32 parameters/normalization instead of fp16 AMP.
* attention runs as batched einsums over the flattened 24x24 token grid — XLA maps
  these onto the MXU; no conv1d-as-projection indirection.
* no Python-level feature "collector" instrumentation — profiling is done with
  jax.profiler, keeping the traced graph clean.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embeddings [B] -> [B, dim] (cos half then sin half,
    matching the reference layout, LDM util.py:151-172)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class _GNParams(nn.Module):
    """Scale/bias holder matching nn.GroupNorm's param layout so the folded
    GN path below shares checkpoints with the f32 path bit-for-bit."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm(32) with float32 internal math regardless of compute dtype.

    ``f32_apply=False`` (UNetConfig.norm_precision='compute') is the folded
    variant: statistics in ONE f32 pass (E[x²]−E[x]², accumulated f32 from
    the bf16 stream), the γ/μ/σ algebra folded into per-(sample,channel)
    a·x+b coefficients, and the apply as a single compute-dtype FMA per
    element. The GN sites are measured VPU-throughput-bound (PARITY.md
    fused-GN verdict); this halves their per-element op count. Note flax's
    own ``nn.GroupNorm(dtype=bf16)`` does NOT do this — it normalizes in
    f32 and only casts the result (measured bit-identical to the f32 path)."""

    dtype: jnp.dtype = jnp.float32
    f32_apply: bool = True
    num_groups: int = 32

    @nn.compact
    def __call__(self, x, film_scale=None, film_shift=None):
        """film_scale/film_shift [B, 1, 1, C] (folded path only): the
        ResBlock's FiLM scale-shift `h·(1+s)+t` composed INTO the folded
        a·x+b coefficients (a′=a·(1+s), b′=b·(1+s)+t, both on [B, C]-sized
        tensors in f32) so normalize+affine+FiLM is still ONE compute-dtype
        FMA per element — the second half of the fold the r4 verdict flagged
        (VERDICT r4 #4; reference two-pass site OpenAI_Unet.py:325-331)."""
        if not self.f32_apply:
            c = x.shape[-1]
            g = self.num_groups
            # param tree identical to the nn.GroupNorm branch ("GroupNorm_0")
            scale, bias = _GNParams(c, name="GroupNorm_0")()
            b = x.shape[0]
            xg = x.reshape(b, -1, g, c // g)
            xf = xg.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(1, 3))  # [b, g]
            meansq = jnp.mean(jnp.square(xf), axis=(1, 3))
            inv = jax.lax.rsqrt(jnp.maximum(meansq - jnp.square(mean), 0.0) + 1e-5)
            # fold: y = x * a + b_ with a[b,c] = γ[c]·inv[b,g(c)],
            # b_[b,c] = β[c] − μ[b,g(c)]·a[b,c]
            gamma = scale.reshape(g, c // g)[None]  # [1, g, c//g]
            a = gamma * inv[..., None]  # [b, g, c//g]
            b_ = bias.reshape(g, c // g)[None] - mean[..., None] * a
            shape = (b,) + (1,) * (x.ndim - 2) + (c,)
            a = a.reshape(shape)
            b_ = b_.reshape(shape)
            if film_scale is not None:
                s1 = 1.0 + film_scale.astype(jnp.float32)
                a = a * s1
                b_ = b_ * s1 + film_shift.astype(jnp.float32)
            a = a.astype(x.dtype)
            b_ = b_.astype(x.dtype)
            return x * a + b_
        assert film_scale is None, "FiLM fold requires f32_apply=False"
        orig = x.dtype
        h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return h.astype(orig)


def _conv(features, kernel=3, stride=1, zero_init=False, dtype=jnp.float32, name=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding="SAME" if kernel > 1 else "VALID",
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class Upsample(nn.Module):
    out_channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        if self.use_conv:
            x = _conv(self.out_channels, 3, dtype=self.dtype)(x)
        return x


class Downsample(nn.Module):
    out_channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return _conv(self.out_channels, 3, stride=2, dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """Residual block with FiLM (scale-shift) conditioning and optional
    built-in up/downsampling (reference ResBlock, OpenAI_Unet.py:182-338)."""

    out_channels: int
    emb_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32
    norm_f32: bool = True  # f32 normalize+affine (GroupNorm32 semantics)
    # compose FiLM into the folded-GN coefficients — measured-rejected
    # default, matches UNetConfig.film_fold (train -40%; see there)
    film_fold: bool = False

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        in_ch = x.shape[-1]

        h = GroupNorm32(dtype=self.dtype, f32_apply=self.norm_f32)(x)
        h = nn.silu(h)
        if self.up:
            h = jax.image.resize(
                h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]), "nearest"
            )
            x = jax.image.resize(
                x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]), "nearest"
            )
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = _conv(self.out_channels, 3, dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="emb_proj",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            if not self.norm_f32 and self.film_fold:
                # FiLM composed into the folded-GN coefficients: one FMA per
                # element instead of two (see GroupNorm32.__call__)
                h = GroupNorm32(dtype=self.dtype, f32_apply=False)(
                    h, film_scale=scale, film_shift=shift
                )
            else:
                h = GroupNorm32(dtype=self.dtype, f32_apply=self.norm_f32)(h)
                h = h * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = GroupNorm32(dtype=self.dtype, f32_apply=self.norm_f32)(h)
            h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv(self.out_channels, 3, zero_init=True, dtype=self.dtype, name="out_conv")(h)

        if in_ch != self.out_channels:
            x = _conv(self.out_channels, 1, dtype=self.dtype, name="skip")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Self-attention over the flattened spatial grid with the reference's
    "new attention order" scaling (q and k each scaled by ch^-1/4, softmax in
    float32; reference QKVAttention, OpenAI_Unet.py:449-476)."""

    num_heads: int = 1
    num_head_channels: int = -1
    dtype: jnp.dtype = jnp.float32
    # fused Pallas attention (TPU): scores stay in VMEM instead of a
    # [B, H, S, S] HBM tensor — see ops/attention_pallas.py
    fused: bool = False
    norm_f32: bool = True

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        heads = (
            c // self.num_head_channels if self.num_head_channels > 0 else self.num_heads
        )
        ch = c // heads

        h = GroupNorm32(dtype=self.dtype, f32_apply=self.norm_f32)(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(h)
        qkv = qkv.reshape(b, hh * ww, 3, heads, ch)

        if self.fused and jax.default_backend() == "tpu":
            from ..ops.attention_pallas import fused_attention

            out = fused_attention(qkv)
        else:
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scale = 1.0 / math.sqrt(math.sqrt(ch))
            logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
            weights = jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1
            ).astype(v.dtype)
            out = jnp.einsum("bhts,bshc->bthc", weights, v)
        out = out.reshape(b, hh, ww, c)
        out = nn.Dense(
            c,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj_out",
        )(out)
        return x + out


class CrossAttention(nn.Module):
    """Multi-head attention over flattened tokens with an optional external
    context (self-attention when context is None). The cross-attention
    conditioning alternative of the reference
    (reference: src/models/LDM/modules/attention.py:152-202)."""

    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        # x: [B, N, C], context: [B, M, Cc] or None
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_v")(ctx)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(self.dim_head)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(b, n, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, param_dtype=jnp.float32,
                        name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn(context) -> GEGLU FF, all pre-norm residual
    (reference attention.py:204-222)."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        ln = lambda name: nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                                       name=name)
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn1")(ln("norm1")(x).astype(x.dtype))
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype,
                               name="attn2")(ln("norm2")(x).astype(x.dtype), context)
        h = ln("norm3")(x).astype(x.dtype)
        c = x.shape[-1]
        u = nn.Dense(8 * c, dtype=self.dtype, param_dtype=jnp.float32, name="ff_in")(h)
        a, g = jnp.split(u, 2, axis=-1)
        h = a * nn.gelu(g)
        x = x + nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="ff_out")(h)
        return x


class SpatialTransformer(nn.Module):
    """Tokenize the feature map, run transformer blocks conditioned on external
    context, project back; zero-init output so it starts as identity
    (reference attention.py:226-268)."""

    heads: int = 4
    dim_head: int = 32
    depth: int = 1
    dtype: jnp.dtype = jnp.float32
    norm_f32: bool = True

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        res = x
        t = GroupNorm32(dtype=self.dtype, f32_apply=self.norm_f32)(x)
        t = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj_in")(t)
        t = t.reshape(b, h * w, c)
        for i in range(self.depth):
            t = BasicTransformerBlock(self.heads, self.dim_head, self.dtype,
                                      name=f"block{i}")(t, context)
        t = t.reshape(b, h, w, c)
        t = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj_out")(t)
        return res + t


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """cDDPM UNet hyperparameters. Defaults mirror the north-star experiment
    (reference src/models/DDPM_2D.py:37-60 with configs/model/DDPM_2D.yaml)."""

    in_channels: int = 1
    model_channels: int = 128
    out_channels: int = 1
    num_res_blocks: int = 3
    attention_resolutions: Sequence[int] = (3, 6, 12)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 2)
    conv_resample: bool = True
    cond_dim: Optional[int] = 128  # None -> unconditional
    num_heads: int = 1
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    # cross-attention conditioning alternative: attention sites become
    # SpatialTransformers with the condition vector as a 1-token context
    # (reference spatial_transformer flag, OpenAI_Unet.py:653-655,713-715)
    spatial_transformer: bool = False
    transformer_depth: int = 1
    # per-ResBlock gradient checkpointing / rematerialization: the reference's
    # `use_checkpoint` (LDM util.py:102-148, on for the patched variant);
    # TPU-idiomatic via nn.remat -> jax.checkpoint
    use_checkpoint: bool = False
    # fused Pallas attention at every attention site (TPU only; falls back to
    # the einsum path elsewhere): removes the [B, H, S, S] HBM score tensor
    fused_attention: bool = False
    # 'float32': reference GroupNorm32 semantics — f32 normalize+affine
    # under any compute dtype. 'compute': keep the f32 statistics but apply
    # the normalize+affine in the compute dtype (the GN sites are measured
    # VPU-bound; bf16 apply halves their per-element cost).
    norm_precision: str = "float32"
    # compose the ResBlock FiLM scale-shift into the folded-GN a·x+b
    # coefficients (norm_precision='compute' only): normalize+affine+FiLM
    # become ONE FMA per element instead of two (VERDICT r4 #4). MEASURED
    # REJECTION, default OFF: flagship chip A/B (tools/bench_norm_precision.py
    # --film-fold) = eval 901.9 vs 899.1 slice-denoises/s (+0.3%, inside
    # tunnel noise — XLA already fuses the two FMAs into one elementwise
    # loop) but train 0.187 vs 0.111 s/step (-40%): the composition makes
    # grad(scale) flow through BOTH a' and b', adding an extra whole-tensor
    # reduction per scale-shift site in the backward pass.
    film_fold: bool = False
    dtype: str = "float32"  # 'float32' | 'bfloat16' compute dtype

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def norm_f32(self) -> bool:
        return self.norm_precision != "compute"


class UNetModel(nn.Module):
    """The conditioned diffusion UNet.

    __call__(x, t, cond) with x: [B,H,W,C] in [-1,1], t: [B] int, cond: [B,cond_dim]
    (or None for the unconditional model). Returns [B,H,W,out_channels] float32.
    """

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, t, cond=None, *, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        mc = cfg.model_channels

        # --- embedding pathway ---------------------------------------------
        # time: sinusoidal(mc) -> mc*4 ; condition: cond_dim -> mc*4 ; concat.
        emb_dim = mc * 4
        temb = timestep_embedding(t, mc)
        temb = nn.Dense(emb_dim, dtype=dt, param_dtype=jnp.float32, name="time_dense1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(emb_dim, dtype=dt, param_dtype=jnp.float32, name="time_dense2")(temb)

        if cfg.cond_dim is not None:
            assert cond is not None, "conditional UNet requires cond"
            cemb = nn.Dense(emb_dim, dtype=dt, param_dtype=jnp.float32, name="label_dense1")(
                cond.astype(dt)
            )
            cemb = nn.silu(cemb)
            cemb = nn.Dense(emb_dim, dtype=dt, param_dtype=jnp.float32, name="label_dense2")(cemb)
            emb = jnp.concatenate([temb, cemb], axis=-1)  # [B, 2*emb_dim]
        else:
            emb = temb

        x = x.astype(dt)

        # rematerialized ResBlock when gradient checkpointing is on
        # (deterministic is call-arg index 3 counting self, hence static)
        Res = (
            nn.remat(ResBlock, static_argnums=(3,))
            if cfg.use_checkpoint
            else ResBlock
        )

        # stable explicit names: the param tree must not depend on the
        # remat flag (flax auto-names rematted modules differently)
        _res_idx = [0]

        def _res_name():
            _res_idx[0] += 1
            return f"res{_res_idx[0] - 1}"

        context = None
        if cfg.spatial_transformer and cond is not None:
            context = cond.astype(dt)[:, None, :]  # [B, 1, cond_dim] token

        def attn(h):
            if cfg.spatial_transformer:
                heads = (
                    h.shape[-1] // cfg.num_head_channels
                    if cfg.num_head_channels > 0
                    else cfg.num_heads
                )
                return SpatialTransformer(
                    heads=heads,
                    dim_head=h.shape[-1] // heads,
                    depth=cfg.transformer_depth,
                    dtype=dt,
                    norm_f32=cfg.norm_f32,
                )(h, context)
            return AttentionBlock(
                num_heads=cfg.num_heads,
                num_head_channels=cfg.num_head_channels,
                dtype=dt,
                fused=cfg.fused_attention,
                norm_f32=cfg.norm_f32,
            )(h)

        # --- encoder ---------------------------------------------------------
        h = _conv(mc, 3, dtype=dt, name="in_conv")(x)
        skips = [h]
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                h = Res(
                    out_channels=mult * mc,
                    emb_channels=emb.shape[-1],
                    dropout=cfg.dropout,
                    use_scale_shift_norm=cfg.use_scale_shift_norm,
                    norm_f32=cfg.norm_f32,
                    film_fold=cfg.film_fold,
                    dtype=dt,
                    name=_res_name(),
                )(h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = attn(h)
                skips.append(h)
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = Res(
                        out_channels=h.shape[-1],
                        emb_channels=emb.shape[-1],
                        dropout=cfg.dropout,
                        use_scale_shift_norm=cfg.use_scale_shift_norm,
                        norm_f32=cfg.norm_f32,
                        film_fold=cfg.film_fold,
                        down=True,
                        dtype=dt,
                        name=_res_name(),
                    )(h, emb, deterministic)
                else:
                    h = Downsample(h.shape[-1], cfg.conv_resample, dtype=dt)(h)
                skips.append(h)
                ds *= 2

        # --- middle (always one attention; 24x24 for the 96x96 cDDPM) --------
        h = Res(
            out_channels=h.shape[-1],
            emb_channels=emb.shape[-1],
            dropout=cfg.dropout,
            use_scale_shift_norm=cfg.use_scale_shift_norm,
            norm_f32=cfg.norm_f32,
            film_fold=cfg.film_fold,
            dtype=dt,
            name=_res_name(),
        )(h, emb, deterministic)
        h = attn(h)
        h = Res(
            out_channels=h.shape[-1],
            emb_channels=emb.shape[-1],
            dropout=cfg.dropout,
            use_scale_shift_norm=cfg.use_scale_shift_norm,
            norm_f32=cfg.norm_f32,
            film_fold=cfg.film_fold,
            dtype=dt,
            name=_res_name(),
        )(h, emb, deterministic)

        # --- decoder ----------------------------------------------------------
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = Res(
                    out_channels=mult * mc,
                    emb_channels=emb.shape[-1],
                    dropout=cfg.dropout,
                    use_scale_shift_norm=cfg.use_scale_shift_norm,
                    norm_f32=cfg.norm_f32,
                    film_fold=cfg.film_fold,
                    dtype=dt,
                    name=_res_name(),
                )(h, emb, deterministic)
                if ds in cfg.attention_resolutions:
                    h = attn(h)
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = Res(
                            out_channels=h.shape[-1],
                            emb_channels=emb.shape[-1],
                            dropout=cfg.dropout,
                            use_scale_shift_norm=cfg.use_scale_shift_norm,
                            norm_f32=cfg.norm_f32,
                            film_fold=cfg.film_fold,
                            up=True,
                            dtype=dt,
                            name=_res_name(),
                        )(h, emb, deterministic)
                    else:
                        h = Upsample(h.shape[-1], cfg.conv_resample, dtype=dt)(h)
                    ds //= 2

        # --- output head ------------------------------------------------------
        h = GroupNorm32(dtype=dt, f32_apply=cfg.norm_f32)(h)
        h = nn.silu(h)
        h = _conv(cfg.out_channels, 3, zero_init=True, dtype=dt, name="out_conv")(h)
        return h.astype(jnp.float32)


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def unet_flops_per_forward(cfg: UNetConfig, image_hw: tuple) -> float:
    """Analytic FLOP estimate for one UNet forward (conv MACs x2 + attention),
    the TPU replacement for the reference's thop hook (OpenAI_Unet.py:397-414)."""
    h, w = image_hw
    mc = cfg.model_channels
    flops = 0.0

    def conv_flops(hh, ww, cin, cout, k=3):
        return 2.0 * hh * ww * cin * cout * k * k

    ch = mc
    flops += conv_flops(h, w, cfg.in_channels, mc)
    hh, ww, ds = h, w, 1
    chans = [mc]
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            flops += conv_flops(hh, ww, ch, mult * mc) + conv_flops(hh, ww, mult * mc, mult * mc)
            ch = mult * mc
            chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            hh, ww, ds = hh // 2, ww // 2, ds * 2
            flops += 2 * conv_flops(hh, ww, ch, ch)
            chans.append(ch)
    # middle
    flops += 4 * conv_flops(hh, ww, ch, ch)
    toks = hh * ww
    flops += 2 * 2.0 * toks * toks * ch + 2 * 2.0 * toks * ch * (3 * ch)
    # decoder (approximate: same conv structure with skip-concat inputs)
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for _ in range(cfg.num_res_blocks + 1):
            icc = chans.pop()
            flops += conv_flops(hh, ww, ch + icc, mult * mc) + conv_flops(
                hh, ww, mult * mc, mult * mc
            )
            ch = mult * mc
        if level:
            flops += 2 * conv_flops(hh, ww, ch, ch)
            hh, ww = hh * 2, ww * 2
    flops += conv_flops(h, w, ch, cfg.out_channels)
    return flops
