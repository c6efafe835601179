"""Numeric cross-validation of the flax UNet against the reference torch UNet.

The reference implementation at /root/reference is used strictly as a
READ-ONLY TEST ORACLE: we instantiate its `UNetModel`, convert its randomly
initialized state_dict with utils/convert_torch.py, and require identical
outputs for identical inputs — the strongest possible architecture-parity
check (SURVEY.md §7 build order #3). Skipped when the reference tree or torch
is unavailable."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "src/models/modules/OpenAI_Unet.py")),
    reason="reference tree not mounted",
)


def _ref_unet(**kw):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.models.modules.OpenAI_Unet import UNetModel as RefUNet

    return RefUNet(**kw)


def _compare(cfg_kwargs, ref_kwargs, cond_dim, hw=32, atol=2e-4):
    import jax
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.models.unet import UNetConfig, UNetModel
    from conditioned_diffusion_models_uad_tpu.utils.convert_torch import (
        convert_reference_unet_state_dict,
    )

    ref = _ref_unet(**ref_kwargs)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = UNetConfig(**cfg_kwargs)
    model = UNetModel(cfg)
    variables = convert_reference_unet_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, hw, hw, 1)).astype(np.float32)
    t = np.array([3, 7], np.int64)
    c = rng.normal(size=(2, cond_dim)).astype(np.float32) if cond_dim else None

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            torch.from_numpy(c) if c is not None else None,
        )
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)

    ours = np.asarray(
        model.apply(variables, jnp.asarray(x), jnp.asarray(t),
                    jnp.asarray(c) if c is not None else None)
    )
    np.testing.assert_allclose(ours, ref_out, atol=atol, rtol=1e-3)


def test_conditional_unet_numeric_parity():
    """Conditional cDDPM family: label-emb conditioning, scale-shift,
    resblock up/down, middle attention (new order)."""
    _compare(
        cfg_kwargs=dict(
            in_channels=1, model_channels=32, out_channels=1, num_res_blocks=1,
            attention_resolutions=(), channel_mult=(1, 2), cond_dim=16,
            num_head_channels=16, use_scale_shift_norm=True,
            resblock_updown=True, dtype="float32",
        ),
        ref_kwargs=dict(
            image_size=32, in_channels=1, model_channels=32, out_channels=1,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
            num_classes=16, num_head_channels=16, use_scale_shift_norm=True,
            resblock_updown=True, use_new_attention_order=True,
        ),
        cond_dim=16,
    )


def test_unconditional_unet_numeric_parity_with_enc_dec_attention():
    """Unconditional family with attention at encoder/decoder resolutions."""
    _compare(
        cfg_kwargs=dict(
            in_channels=1, model_channels=32, out_channels=1, num_res_blocks=2,
            attention_resolutions=(2,), channel_mult=(1, 2), cond_dim=None,
            num_head_channels=16, use_scale_shift_norm=True,
            resblock_updown=True, dtype="float32",
        ),
        ref_kwargs=dict(
            image_size=32, in_channels=1, model_channels=32, out_channels=1,
            num_res_blocks=2, attention_resolutions=(2,), channel_mult=(1, 2),
            num_classes=None, num_head_channels=16, use_scale_shift_norm=True,
            resblock_updown=True, use_new_attention_order=True,
        ),
        cond_dim=None,
    )
