"""Reference (torch) UNet checkpoint -> flax parameter conversion.

SURVEY.md §7 build order #3 requires the flax UNet to "match parameter shapes
to the reference `OpenAI_Unet.py` so reference checkpoints could in principle
be ported for numeric comparison" — this module is that port. It maps the
reference guided-diffusion state_dict naming (time_embed/label_emb,
input_blocks.N.M, middle_block.{0,1,2}, output_blocks.N.M, out.{0,2};
reference src/models/modules/OpenAI_Unet.py:583-797) onto the param tree of
`models.unet.UNetModel` by replaying both construction orders.

Weight layout translations:
  conv2d   torch [O, I, kh, kw]  -> flax [kh, kw, I, O]
  linear   torch [O, I]          -> flax kernel [I, O]
  GN       torch weight/bias     -> flax scale/bias
  attention qkv torch conv1d [3C, C, 1] with HEAD-MAJOR (q,k,v per head)
  channel layout -> flax Dense [C, 3C] with QKV-MAJOR (heads within each of
  q/k/v) layout — channels are permuted accordingly.

Numeric parity (same inputs -> same outputs to float32 rounding) is validated
in tests/test_convert_torch.py against the actual reference module run as a
read-only test oracle.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..models.unet import UNetConfig


def _conv(sd, key):
    w = np.asarray(sd[f"{key}.weight"], np.float32).transpose(2, 3, 1, 0)
    b = np.asarray(sd[f"{key}.bias"], np.float32)
    return {"kernel": w, "bias": b}


def _dense(sd, key):
    w = np.asarray(sd[f"{key}.weight"], np.float32).T
    b = np.asarray(sd[f"{key}.bias"], np.float32)
    return {"kernel": w, "bias": b}


def _gn(sd, key):
    return {
        "GroupNorm_0": {
            "scale": np.asarray(sd[f"{key}.weight"], np.float32),
            "bias": np.asarray(sd[f"{key}.bias"], np.float32),
        }
    }


def _resblock(sd, prefix, has_skip):
    out = {
        "GroupNorm32_0": _gn(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _dense(sd, f"{prefix}.emb_layers.1"),
        "GroupNorm32_1": _gn(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if has_skip:
        out["skip"] = _conv(sd, f"{prefix}.skip_connection")
    return out


def _qkv_permutation(channels: int, heads: int) -> np.ndarray:
    """Output-channel permutation taking the reference head-major (q,k,v
    per head) qkv layout to our qkv-major (heads within q/k/v) layout."""
    ch = channels // heads
    perm = np.empty(3 * channels, np.int64)
    for q3 in range(3):
        for h in range(heads):
            for c in range(ch):
                ours = q3 * channels + h * ch + c
                ref = h * 3 * ch + q3 * ch + c
                perm[ours] = ref
    return perm


def _attention(sd, prefix, channels, num_head_channels, num_heads):
    heads = channels // num_head_channels if num_head_channels > 0 else num_heads
    perm = _qkv_permutation(channels, heads)
    qkv_w = np.asarray(sd[f"{prefix}.qkv.weight"], np.float32)[:, :, 0]  # [3C, C]
    qkv_b = np.asarray(sd[f"{prefix}.qkv.bias"], np.float32)
    proj_w = np.asarray(sd[f"{prefix}.proj_out.weight"], np.float32)[:, :, 0]
    proj_b = np.asarray(sd[f"{prefix}.proj_out.bias"], np.float32)
    return {
        "GroupNorm32_0": _gn(sd, f"{prefix}.norm"),
        "qkv": {"kernel": qkv_w[perm].T, "bias": qkv_b[perm]},
        "proj_out": {"kernel": proj_w.T, "bias": proj_b},
    }


def convert_reference_unet_state_dict(
    sd: Dict[str, np.ndarray], cfg: UNetConfig
) -> dict:
    """Reference state_dict -> {'params': ...} for models.unet.UNetModel.

    Requires the reference's active cDDPM architecture family:
    use_scale_shift_norm + resblock_updown (conv up/downsampling variants and
    the SpatialTransformer path are not mapped)."""
    if not (cfg.use_scale_shift_norm and cfg.resblock_updown):
        raise NotImplementedError(
            "converter supports the scale_shift_norm + resblock_updown family"
        )
    p: dict = {}
    mc = cfg.model_channels

    p["time_dense1"] = _dense(sd, "time_embed.0")
    p["time_dense2"] = _dense(sd, "time_embed.2")
    if cfg.cond_dim is not None:
        p["label_dense1"] = _dense(sd, "label_emb.0")
        p["label_dense2"] = _dense(sd, "label_emb.2")

    p["in_conv"] = _conv(sd, "input_blocks.0.0")

    res_i = 0
    attn_i = 0

    def take_res(prefix, in_ch, out_ch):
        nonlocal res_i
        p[f"res{res_i}"] = _resblock(sd, prefix, has_skip=in_ch != out_ch)
        res_i += 1

    def take_attn(prefix, ch):
        nonlocal attn_i
        p[f"AttentionBlock_{attn_i}"] = _attention(
            sd, prefix, ch, cfg.num_head_channels, cfg.num_heads
        )
        attn_i += 1

    # --- encoder (mirrors both construction loops) -------------------------
    ib = 1  # input_blocks index (0 was the stem conv)
    ch = mc
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            take_res(f"input_blocks.{ib}.0", ch, mult * mc)
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                take_attn(f"input_blocks.{ib}.1", ch)
            ib += 1
        if level != len(cfg.channel_mult) - 1:
            take_res(f"input_blocks.{ib}.0", ch, ch)  # down-ResBlock
            ib += 1
            ds *= 2

    # --- middle -------------------------------------------------------------
    take_res("middle_block.0", ch, ch)
    take_attn("middle_block.1", ch)
    take_res("middle_block.2", ch, ch)

    # --- decoder ------------------------------------------------------------
    # skip-channel bookkeeping identical to both constructions
    skip_chs = [mc]
    c2 = mc
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            c2 = mult * mc
            skip_chs.append(c2)
        if level != len(cfg.channel_mult) - 1:
            skip_chs.append(c2)

    ob = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            skip = skip_chs.pop()
            take_res(f"output_blocks.{ob}.0", ch + skip, mult * mc)
            ch = mult * mc
            sub = 1
            if ds in cfg.attention_resolutions:
                take_attn(f"output_blocks.{ob}.{sub}", ch)
                sub += 1
            if level and i == cfg.num_res_blocks:
                take_res(f"output_blocks.{ob}.{sub}", ch, ch)  # up-ResBlock
                ds //= 2
            ob += 1

    p["GroupNorm32_0"] = _gn(sd, "out.0")
    p["out_conv"] = _conv(sd, "out.2")
    return {"params": p}


# --------------------------------------------------------------------------- #
# ResNet conditioning encoder (timm/torchvision state_dict naming)
# --------------------------------------------------------------------------- #
def _conv_nobias(sd, key):
    return {
        "kernel": np.asarray(sd[f"{key}.weight"], np.float32).transpose(2, 3, 1, 0)
    }


def _bn(sd, key):
    params = {
        "scale": np.asarray(sd[f"{key}.weight"], np.float32),
        "bias": np.asarray(sd[f"{key}.bias"], np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{key}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{key}.running_var"], np.float32),
    }
    return params, stats


def convert_reference_resnet_state_dict(
    sd: Dict[str, np.ndarray],
    variant: str,
    cond_dim: int | None = None,
    prefix: str = "",
) -> dict:
    """timm/torchvision-style ResNet state_dict -> variables for
    `models.resnet.ResNetEncoder` ({'params', 'batch_stats'}).

    The reference's conditioning encoder is `timm.create_model(backbone,
    in_chans=1, num_classes=cond_dim)` (DDPM_encoder.py:21) or the same net
    inside `SparK_2D_encoder` (spark/models.py:89-109); timm ResNets use the
    torchvision key naming mapped here (conv1/bn1, layer{1..4}.{i}.conv{j}/
    bn{j}/downsample.{0,1}, fc). `cond_dim=None` skips the fc head — the
    reference's own SparK-checkpoint surgery drops fc.* (DDPM_2D.py:90-93).
    `prefix` strips a key prefix first (e.g. 'encoder.' for a full Lightning
    checkpoint, 'sparse_encoder.sp_cnn.' for a SparK pretrain checkpoint)."""
    from ..models.resnet import _VARIANTS

    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    block_cls, stage_sizes, fea_dim = _VARIANTS[variant]
    bottleneck = block_cls.__name__ == "BottleneckBlock"

    bk: dict = {}
    bk_stats: dict = {}
    bk["stem_conv"] = _conv_nobias(sd, "conv1")
    bk["stem_bn"], bk_stats["stem_bn"] = _bn(sd, "bn1")

    n_convs = 3 if bottleneck else 2
    for si, n_blocks in enumerate(stage_sizes):
        for bi in range(n_blocks):
            t = f"layer{si + 1}.{bi}"
            name = f"stage{si + 1}_block{bi}"
            blk: dict = {}
            blk_stats: dict = {}
            for j in range(1, n_convs + 1):
                blk[f"conv{j}"] = _conv_nobias(sd, f"{t}.conv{j}")
                blk[f"bn{j}"], blk_stats[f"bn{j}"] = _bn(sd, f"{t}.bn{j}")
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = _conv_nobias(sd, f"{t}.downsample.0")
                blk["down_bn"], blk_stats["down_bn"] = _bn(sd, f"{t}.downsample.1")
            bk[name] = blk
            bk_stats[name] = blk_stats

    params: dict = {"backbone": bk}
    if cond_dim is not None:
        fc = _dense(sd, "fc")
        if fc["kernel"].shape != (fea_dim, cond_dim):
            raise ValueError(
                f"fc shape {fc['kernel'].shape} != ({fea_dim}, {cond_dim}) "
                f"for {variant}"
            )
        params["fc"] = fc
    return {"params": params, "batch_stats": {"backbone": bk_stats}}


# --------------------------------------------------------------------------- #
# Full reference Lightning checkpoints -> task variables
# --------------------------------------------------------------------------- #
def convert_reference_ddpm_checkpoint(sd: Dict[str, np.ndarray], task) -> dict:
    """Full reference cDDPM Lightning state_dict -> `DDPMTask` variables.

    Reference DDPM_2D module attributes (DDPM_2D.py:32-77): `encoder` (timm
    ResNet, or SparK_2D_encoder whose net lives one level deeper under
    `encoder.encoder.*`) and `diffusion` (GaussianDiffusion holding the UNet
    as `diffusion.model.*` plus recomputed schedule buffers, which are
    skipped — our schedules are rebuilt from the config). Accepts either a
    raw state_dict or one still wrapped in Lightning's {'state_dict': ...}."""
    if "state_dict" in sd and not any("." in k for k in sd):
        sd = sd["state_dict"]
    sd = {k: v for k, v in sd.items()}

    unet_sd = {
        k[len("diffusion.model."):]: v
        for k, v in sd.items()
        if k.startswith("diffusion.model.")
    }
    if not unet_sd:
        raise ValueError("no 'diffusion.model.*' UNet keys in checkpoint")
    variables: dict = dict(convert_reference_unet_state_dict(
        unet_sd, task.cfg.unet_config
    ))
    variables = {"params": {"unet": variables["params"]}, "batch_stats": {}}

    if task.encoder is not None:
        enc_prefix = (
            "encoder.encoder."
            if any(k.startswith("encoder.encoder.") for k in sd)
            else "encoder."
        )
        enc = convert_reference_resnet_state_dict(
            sd,
            task.cfg.encoder_backbone,
            cond_dim=task.cfg.cond_dim,
            prefix=enc_prefix,
        )
        variables["params"]["encoder"] = enc["params"]
        variables["batch_stats"]["encoder"] = enc["batch_stats"]
    return variables


def import_reference_spark_encoder(
    ddpm_variables: dict, sd: Dict[str, np.ndarray], variant: str
) -> dict:
    """Reference SparK pretrain checkpoint ('sparse_encoder.sp_cnn.*') ->
    conditioning-encoder backbone of existing `DDPMTask` variables — the
    reference's cross-model checkpoint surgery (DDPM_2D.py:84-96: remap
    `sparse_encoder.sp_cnn.* -> encoder.*`, drop `fc.*`, keep the fresh
    cond head)."""
    import jax

    if "state_dict" in sd and not any("." in k for k in sd):
        sd = sd["state_dict"]
    enc = convert_reference_resnet_state_dict(
        sd, variant, cond_dim=None, prefix="sparse_encoder.sp_cnn."
    )
    out = jax.tree_util.tree_map(lambda x: x, ddpm_variables)  # shallow copy
    p = dict(out["params"])
    e = dict(p["encoder"])
    e["backbone"] = enc["params"]["backbone"]
    p["encoder"] = e
    out["params"] = p
    bs = dict(out.get("batch_stats", {}))
    ebs = dict(bs.get("encoder", {}))
    ebs["backbone"] = enc["batch_stats"]["backbone"]
    bs["encoder"] = ebs
    out["batch_stats"] = bs
    return out
