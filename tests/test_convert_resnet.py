"""Numeric cross-validation of the flax ResNet encoder converter, plus the
full reference-checkpoint importers.

The conditioning encoder of the reference is `timm.create_model('resnet*',
in_chans=1, num_classes=cond_dim)` (reference src/models/modules/
DDPM_encoder.py:21). timm is not installed in this image, so the oracle here
is a minimal torch ResNet written to the standard torchvision/timm
architecture (v1.5: stride on the 3x3 conv) producing the exact torchvision
state_dict key naming the converter maps. The UNet half of the full-checkpoint
test uses the ACTUAL reference `OpenAI_Unet.UNetModel` as a read-only oracle,
like tests/test_convert_torch.py."""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
nn = torch.nn


# --------------------------------------------------------------------------- #
# torch oracle: standard torchvision-style ResNet (v1.5), torchvision key names
# --------------------------------------------------------------------------- #
class _TBasic(nn.Module):
    expansion = 1

    def __init__(self, cin, w, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, w, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(w)
        self.conv2 = nn.Conv2d(w, w, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(w)
        self.downsample = None
        if stride != 1 or cin != w:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, w, 1, stride, bias=False), nn.BatchNorm2d(w)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + idt)


class _TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, w, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, w, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(w)
        self.conv2 = nn.Conv2d(w, w, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(w)
        self.conv3 = nn.Conv2d(w, w * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(w * 4)
        self.downsample = None
        if stride != 1 or cin != w * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, w * 4, 1, stride, bias=False),
                nn.BatchNorm2d(w * 4),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return torch.relu(h + idt)


_TORCH_VARIANTS = {
    "resnet18": (_TBasic, (2, 2, 2, 2)),
    "resnet34": (_TBasic, (3, 4, 6, 3)),
    "resnet50": (_TBottleneck, (3, 4, 6, 3)),
}


class _TResNet(nn.Module):
    def __init__(self, variant, in_chans=1, num_classes=16):
        super().__init__()
        block, stages = _TORCH_VARIANTS[variant]
        self.conv1 = nn.Conv2d(in_chans, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for si, (n, w) in enumerate(zip(stages, (64, 128, 256, 512))):
            blocks = []
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(block(cin, w, stride))
                cin = w * block.expansion
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(cin, num_classes)

    def forward(self, x):
        h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            h = getattr(self, f"layer{i}")(h)
        h = h.mean(dim=(2, 3))
        return self.fc(h)


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.6, 1.4, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    model.eval()
    return model


@pytest.mark.parametrize("variant", ["resnet18", "resnet50"])
def test_resnet_encoder_numeric_parity(variant):
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.models.resnet import (
        ResNetConfig,
        ResNetEncoder,
    )
    from conditioned_diffusion_models_uad_tpu.utils.convert_torch import (
        convert_reference_resnet_state_dict,
    )

    ref = _randomize(_TResNet(variant, num_classes=16), seed=0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_reference_resnet_state_dict(sd, variant, cond_dim=16)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    enc = ResNetEncoder(ResNetConfig(variant=variant), cond_dim=16)
    ours = np.asarray(enc.apply(variables, jnp.asarray(x), train=False))
    scale = max(1e-3, float(np.abs(ref_out).max()))
    np.testing.assert_allclose(ours, ref_out, atol=2e-3 * scale, rtol=2e-3)


def test_resnet_converter_rejects_wrong_head():
    from conditioned_diffusion_models_uad_tpu.utils.convert_torch import (
        convert_reference_resnet_state_dict,
    )

    ref = _TResNet("resnet18", num_classes=7)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    with pytest.raises(ValueError):
        convert_reference_resnet_state_dict(sd, "resnet18", cond_dim=16)


# --------------------------------------------------------------------------- #
# full Lightning-checkpoint importers
# --------------------------------------------------------------------------- #
@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "src/models/modules/OpenAI_Unet.py")),
    reason="reference tree not mounted",
)
def test_full_ddpm_checkpoint_import():
    """A reference-shaped cDDPM Lightning state_dict (UNet under
    'diffusion.model.*' from the ACTUAL reference UNet module, encoder under
    'encoder.*', schedule buffers present-and-ignored) imports into DDPMTask
    variables whose reconstruction runs and whose encoder output matches the
    torch oracle."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.models.modules.OpenAI_Unet import UNetModel as RefUNet

    import jax
    import jax.numpy as jnp

    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig
    from conditioned_diffusion_models_uad_tpu.utils.convert_torch import (
        convert_reference_ddpm_checkpoint,
    )

    ref_unet = RefUNet(
        image_size=32, in_channels=1, model_channels=32, out_channels=1,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        num_classes=16, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True, use_new_attention_order=True,
    )
    ref_enc = _randomize(_TResNet("resnet18", num_classes=16), seed=2)

    sd = {}
    for k, v in ref_unet.state_dict().items():
        sd[f"diffusion.model.{k}"] = v.detach().numpy()
    for k, v in ref_enc.state_dict().items():
        sd[f"encoder.{k}"] = v.detach().numpy()
    sd["diffusion.betas"] = np.linspace(1e-4, 2e-2, 20).astype(np.float32)

    task = DDPMTask(DDPMTaskConfig(
        image_hw=(32, 32), cond_dim=16, encoder_backbone="resnet18",
        timesteps=20, unet_dim=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(), step_ensemble=(5, 10), test_timesteps=10,
        dtype="float32",
    ))
    variables = convert_reference_ddpm_checkpoint(sd, task)

    # imported encoder must reproduce the torch oracle
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(4, 32, 32, 1)).astype(np.float32)
    cond, _ = task.encode(variables, jnp.asarray(x))
    with torch.no_grad():
        ref_cond = ref_enc(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(cond), ref_cond, atol=2e-3, rtol=2e-3)

    # and the full reconstruction path runs on the imported variables
    reco = task.reconstruct(variables, jnp.asarray(x), jax.random.PRNGKey(0))
    assert reco.shape == x.shape
    assert np.isfinite(np.asarray(reco)).all()


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "src/models/modules/OpenAI_Unet.py")),
    reason="reference tree not mounted",
)
def test_e2e_only_eval_from_torch_ckpt_file(tmp_path, monkeypatch):
    """`only_eval=true load_checkpoint=<reference .ckpt file>` runs the full
    eval protocol directly from a reference Lightning checkpoint — the
    migration path for users bringing trained reference weights."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.models.modules.OpenAI_Unet import UNetModel as RefUNet

    from conditioned_diffusion_models_uad_tpu.config import compose, materialize
    from conditioned_diffusion_models_uad_tpu.data.synthetic import (
        build_synthetic_root,
    )
    from conditioned_diffusion_models_uad_tpu.orchestrate import train

    data_root = build_synthetic_root(
        str(tmp_path / "data"), shape=(64, 64, 40),
        n_train=1, n_val=1, n_test=1, n_eval=1,
    )

    ref_unet = RefUNet(
        image_size=32, in_channels=1, model_channels=32, out_channels=1,
        num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        num_classes=16, num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True, use_new_attention_order=True,
    )
    ref_enc = _randomize(_TResNet("resnet18", num_classes=16), seed=5)
    state_dict = {f"diffusion.model.{k}": v for k, v in ref_unet.state_dict().items()}
    state_dict.update({f"encoder.{k}": v for k, v in ref_enc.state_dict().items()})
    ckpt_file = tmp_path / "reference_fold0.ckpt"
    torch.save({"state_dict": state_dict, "epoch": 3}, ckpt_file)

    monkeypatch.setenv("DATA_DIR", data_root)
    monkeypatch.setenv("LOG_DIR", str(tmp_path / "logs"))
    cfg = materialize(compose(
        os.path.join(os.path.dirname(__file__), "..", "configs"),
        "cDDPM/DDPM_cond_spark_2D",
        [
            "name=torch_import", "only_eval=true",
            f"load_checkpoint={ckpt_file}",
            "model.unet_dim=32", "model.num_res_blocks=1",
            "model.channel_mult=[1,2]", "model.attention_resolutions=[]",
            "model.cond_dim=16", "model.encoder_backbone=resnet18",
            "model.timesteps=20", "model.step_ensemble=[5,10]",
            "model.test_timesteps=10", "model.dtype=float32",
            "datamodule.image_dim=[64,64,40]", "datamodule.rescale_factor=2.0",
            "datamodule.batch_size=2", "eval.save_output_images=false",
        ],
    ))
    results = train(cfg)
    e = results[0]["test"]["Brats21"]
    assert np.isfinite(e["AUCPerVolMean"])
    assert len(e["AnomalyScoreRecoPerVol"]) == 1


def test_spark_pretrain_checkpoint_import():
    """'sparse_encoder.sp_cnn.*' keys import into an existing task's encoder
    backbone, keeping the fresh cond head (reference surgery DDPM_2D.py:84-96
    drops fc.*)."""
    import jax

    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig
    from conditioned_diffusion_models_uad_tpu.utils.convert_torch import (
        import_reference_spark_encoder,
    )

    ref = _randomize(_TResNet("resnet18", num_classes=5), seed=4)
    sd = {
        f"sparse_encoder.sp_cnn.{k}": v.detach().numpy()
        for k, v in ref.state_dict().items()
    }

    task = DDPMTask(DDPMTaskConfig(
        image_hw=(32, 32), cond_dim=16, encoder_backbone="resnet18",
        timesteps=20, unet_dim=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(), step_ensemble=(5, 10), test_timesteps=10,
        dtype="float32",
    ))
    base = task.init(jax.random.PRNGKey(0))
    out = import_reference_spark_encoder(base, sd, "resnet18")

    got = np.asarray(
        out["params"]["encoder"]["backbone"]["stem_conv"]["kernel"]
    )
    want = sd["sparse_encoder.sp_cnn.conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want)
    # the stale fc head (num_classes=5) was dropped; the fresh 16-d head kept
    np.testing.assert_allclose(
        np.asarray(out["params"]["encoder"]["fc"]["kernel"]),
        np.asarray(base["params"]["encoder"]["fc"]["kernel"]),
    )
    # running stats came along
    np.testing.assert_allclose(
        np.asarray(out["batch_stats"]["encoder"]["backbone"]["stem_bn"]["var"]),
        sd["sparse_encoder.sp_cnn.bn1.running_var"],
    )
