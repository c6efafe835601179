"""ResNet encoder family (conditioning encoder + SparK sparse backbone), in flax.

Capability parity:
* the cDDPM conditioning encoder — a ResNet with `in_chans=1` and a
  `cond_dim`-way head (reference: src/models/modules/DDPM_encoder.py:6-29 using
  timm; and SparK_2D_encoder, spark/Spark_2D.py:268-290).
* the SparK *sparse* backbone — on TPU, SparK's "sparse convolution" is exactly
  dense compute + output masking (the reference already emulates sparsity that
  way: every SparseConv/Pool multiplies its output by the active-site mask and
  SparseBN normalizes over active positions only, writing zeros elsewhere;
  reference spark/encoder.py:19-35). Here the active mask is an *explicit
  argument* threaded through the stack — replacing the reference's module-global
  `_cur_active` side channel (encoder.py:12), which JAX's functional style
  eliminates by construction.
* 4-scale feature-pyramid output for SparK decoding (reference
  spark/resnet.py:13-46 monkeypatch of timm's forward).

TPU-first: NHWC layout, masked-BatchNorm statistics computed as weighted
moments (no gather/scatter), optional `axis_name` for cross-device stat sync
(the SyncBN equivalent, via lax.pmean).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def upsample_mask(active: jax.Array, h: int, w: int) -> jax.Array:
    """Nearest-upsample an active-site grid [B, fh, fw] to [B, h, w, 1] float."""
    b, fh, fw = active.shape
    rh, rw = h // fh, w // fw
    m = jnp.repeat(jnp.repeat(active, rh, axis=1), rw, axis=2)
    return m[..., None].astype(jnp.float32)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over active positions only (SparK SparseBN semantics,
    reference spark/encoder.py:25-35): statistics are weighted moments with the
    mask as weights; output is zeroed at inactive positions. With mask=None it
    is standard BatchNorm. `axis_name` syncs batch statistics across a mesh
    axis (SyncBN / lax.pmean).

    ``fold_apply=True`` is the folded-normalize variant (the MaskedBatchNorm
    twin of GroupNorm32's measured +8-20% fold, PARITY.md "folded GroupNorm"):
    statistics stay exact f32, but γ/μ/σ/β fold into per-channel a·x+b
    coefficients computed on the tiny [C] tensors, applied as ONE
    compute-dtype FMA per element instead of the f32
    subtract/multiply/scale/add chain + converts. Parameter tree and running
    stats are identical to the f32 path — checkpoints interchange."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    fold_apply: bool = False

    @nn.compact
    def __call__(self, x, mask=None, *, use_running_average: bool = True):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                mean = xf.mean(axis=(0, 1, 2))
                var = xf.var(axis=(0, 1, 2))
                if self.axis_name is not None:
                    mean = jax.lax.pmean(mean, self.axis_name)
                    var = jax.lax.pmean(var + mean**2, self.axis_name) - mean**2
            else:
                w = mask.astype(jnp.float32)
                n = w.sum(axis=(0, 1, 2)) + 1e-8
                s1 = (xf * w).sum(axis=(0, 1, 2))
                s2 = (xf * xf * w).sum(axis=(0, 1, 2))
                if self.axis_name is not None:
                    n = jax.lax.psum(n, self.axis_name)
                    s1 = jax.lax.psum(s1, self.axis_name)
                    s2 = jax.lax.psum(s2, self.axis_name)
                mean = s1 / n
                var = jnp.maximum(s2 / n - mean**2, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        if self.fold_apply:
            # fold on the [C] vectors: y = x·a + b with a = γ/√(σ²+ε),
            # b = β − μ·a; stats above stay exact f32
            a = jax.lax.rsqrt(var + self.epsilon) * scale
            b = bias - mean * a
            y = x.astype(self.dtype) * a.astype(self.dtype) + b.astype(self.dtype)
            if mask is not None:
                y = y * mask.astype(self.dtype)
            return y

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        if mask is not None:
            y = y * mask.astype(jnp.float32)
        return y.astype(x.dtype if x.dtype != jnp.float32 else self.dtype)


def _conv(features, kernel, stride=1, dtype=jnp.float32, name=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class BottleneckBlock(nn.Module):
    width: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    fold_norm: bool = False

    @nn.compact
    def __call__(self, x, active=None, *, train: bool = False):
        out_ch = self.width * 4

        def masked(h):
            if active is None:
                return h, None
            m = upsample_mask(active, h.shape[1], h.shape[2])
            return h * m.astype(h.dtype), m

        bn = lambda name: MaskedBatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                                          fold_apply=self.fold_norm, name=name)

        h = _conv(self.width, 1, dtype=self.dtype, name="conv1")(x)
        h, m = masked(h)
        h = nn.relu(bn("bn1")(h, m, use_running_average=not train))
        h = _conv(self.width, 3, self.stride, dtype=self.dtype, name="conv2")(h)
        h, m = masked(h)
        h = nn.relu(bn("bn2")(h, m, use_running_average=not train))
        h = _conv(out_ch, 1, dtype=self.dtype, name="conv3")(h)
        h, m = masked(h)
        h = bn("bn3")(h, m, use_running_average=not train)

        if x.shape[-1] != out_ch or self.stride != 1:
            x = _conv(out_ch, 1, self.stride, dtype=self.dtype, name="down_conv")(x)
            x, mx = masked(x)
            x = bn("down_bn")(x, mx, use_running_average=not train)
        return nn.relu(h + x)


class BasicBlock(nn.Module):
    width: int
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    fold_norm: bool = False

    @nn.compact
    def __call__(self, x, active=None, *, train: bool = False):
        def masked(h):
            if active is None:
                return h, None
            m = upsample_mask(active, h.shape[1], h.shape[2])
            return h * m.astype(h.dtype), m

        bn = lambda name: MaskedBatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                                          fold_apply=self.fold_norm, name=name)

        h = _conv(self.width, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        h, m = masked(h)
        h = nn.relu(bn("bn1")(h, m, use_running_average=not train))
        h = _conv(self.width, 3, dtype=self.dtype, name="conv2")(h)
        h, m = masked(h)
        h = bn("bn2")(h, m, use_running_average=not train)

        if x.shape[-1] != self.width or self.stride != 1:
            x = _conv(self.width, 1, self.stride, dtype=self.dtype, name="down_conv")(x)
            x, mx = masked(x)
            x = bn("down_bn")(x, mx, use_running_average=not train)
        return nn.relu(h + x)


_VARIANTS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 512),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 512),
    "resnet50": (BottleneckBlock, (3, 4, 6, 3), 2048),
    "resnet101": (BottleneckBlock, (3, 4, 23, 3), 2048),
}


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    variant: str = "resnet50"
    in_channels: int = 1
    axis_name: Optional[str] = None
    dtype: str = "float32"
    # 'float32' = reference-exact BN normalize; 'compute' = folded per-channel
    # a·x+b apply in the compute dtype (stats stay f32; see MaskedBatchNorm)
    norm_precision: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def fold_norm(self) -> bool:
        return self.norm_precision == "compute"

    @property
    def fea_dim(self) -> int:
        return _VARIANTS[self.variant][2]

    @property
    def downsample_ratio(self) -> int:
        return 32


class ResNetBackbone(nn.Module):
    """Trunk producing the 4-scale pyramid [C2 /4, C3 /8, C4 /16, C5 /32].

    `active`: optional [B, f, f] bool grid of active sites at stride-32
    resolution — when given, every conv/pool/BN output is masked at its
    resolution (SparK sparse semantics)."""

    cfg: ResNetConfig

    @nn.compact
    def __call__(self, x, active=None, *, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        block_cls, stage_sizes, _ = _VARIANTS[cfg.variant]
        x = x.astype(dt)

        def masked(h):
            if active is None:
                return h
            m = upsample_mask(active, h.shape[1], h.shape[2])
            return h * m.astype(h.dtype)

        # stem: 7x7/2 conv, BN, ReLU, 3x3/2 maxpool
        h = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            dtype=dt, param_dtype=jnp.float32, name="stem_conv",
        )(x)
        h = masked(h)
        m = (
            upsample_mask(active, h.shape[1], h.shape[2]) if active is not None else None
        )
        h = nn.relu(
            MaskedBatchNorm(axis_name=cfg.axis_name, dtype=dt,
                            fold_apply=cfg.fold_norm, name="stem_bn")(
                h, m, use_running_average=not train
            )
        )
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        h = masked(h)

        feats = []
        widths = (64, 128, 256, 512)
        for si, (n_blocks, w) in enumerate(zip(stage_sizes, widths)):
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                h = block_cls(
                    width=w, stride=stride, axis_name=cfg.axis_name, dtype=dt,
                    fold_norm=cfg.fold_norm, name=f"stage{si + 1}_block{bi}",
                )(h, active, train=train)
                h = masked(h)
            feats.append(h)
        return feats  # [C2, C3, C4, C5]


class ResNetEncoder(nn.Module):
    """Conditioning encoder: backbone -> global average pool -> Dense(cond_dim)
    (reference get_encoder / SparK_2D_encoder + build_encoder,
    DDPM_encoder.py:6-29, spark/models.py:89-109)."""

    cfg: ResNetConfig
    cond_dim: int = 128

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = ResNetBackbone(self.cfg, name="backbone")(x, None, train=train)
        h = feats[-1].mean(axis=(1, 2))  # global average pool
        h = nn.Dense(
            self.cond_dim, dtype=self.cfg.compute_dtype, param_dtype=jnp.float32,
            name="fc",
        )(h)
        return h.astype(jnp.float32)
