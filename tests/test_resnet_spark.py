"""Tests for the ResNet encoder family + SparK MIM stack
(reference semantics: src/models/modules/spark/* and DDPM_encoder.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conditioned_diffusion_models_uad_tpu.models.resnet import (
    MaskedBatchNorm,
    ResNetBackbone,
    ResNetConfig,
    ResNetEncoder,
    upsample_mask,
)
from conditioned_diffusion_models_uad_tpu.models.spark import (
    LightDecoder,
    SparKConfig,
    SparKModel,
    patchify,
    random_mask,
    spark_spatial_loss,
    unpatchify,
)

R18 = ResNetConfig(variant="resnet18")


def test_backbone_pyramid_shapes():
    """96x96 input -> pyramid at /4,/8,/16,/32 (24,12,6,3), the shapes the SparK
    densify stage expects (reference spark/resnet.py smoke test)."""
    model = ResNetBackbone(R18)
    x = jnp.zeros((2, 96, 96, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert [f.shape[1] for f in feats] == [24, 12, 6, 3]
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512]


def test_resnet50_feature_dims():
    model = ResNetBackbone(ResNetConfig(variant="resnet50"))
    x = jnp.zeros((1, 96, 96, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]


def test_encoder_head_shape():
    """The conditioning encoder emits [B, cond_dim] — the `c` vector of the cDDPM
    (reference NEW_OUTPUT.txt records [50,512]-ish features; head maps to 128)."""
    model = ResNetEncoder(R18, cond_dim=128)
    x = jnp.zeros((3, 96, 96, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (3, 128)


def test_masked_bn_statistics():
    """Masked BN must compute moments over active positions only."""
    bn = MaskedBatchNorm()
    x = jnp.concatenate(
        [jnp.full((1, 2, 2, 1), 1.0), jnp.full((1, 2, 2, 1), 100.0)], axis=1
    )  # [1,4,2,1]: top half 1.0, bottom half 100.0
    mask = jnp.concatenate([jnp.ones((1, 2, 2, 1)), jnp.zeros((1, 2, 2, 1))], axis=1)
    variables = bn.init(jax.random.PRNGKey(0), x, mask, use_running_average=False)
    y, mutated = bn.apply(
        x=x, mask=mask, use_running_average=False,
        variables=variables, mutable=["batch_stats"],
    )
    y = np.asarray(y)
    # active positions all equal 1.0 -> normalized to ~0; inactive zeroed
    np.testing.assert_allclose(y[0, :2], 0.0, atol=1e-2)
    np.testing.assert_allclose(y[0, 2:], 0.0, atol=1e-8)
    # running stats moved toward active-only mean (1.0), not global (50.5)
    new_mean = float(mutated["batch_stats"]["mean"][0])
    assert abs(new_mean - 0.1 * 1.0) < 1e-3  # momentum 0.9: 0.9*0 + 0.1*1.0


def test_masked_bn_fold_apply_parity():
    """fold_apply folds γ/μ/σ/β into per-channel a·x+b (the MaskedBatchNorm
    twin of the UNet's folded GroupNorm). In f32 the fold is the same algebra
    — outputs match tightly, train AND eval mode, masked and unmasked — and
    the running-stat updates are identical (stats never fold)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, (4, 8, 8, 16)).astype(np.float32))
    mask = jnp.asarray((rng.random((4, 8, 8, 1)) > 0.4).astype(np.float32))

    ref = MaskedBatchNorm()
    fold = MaskedBatchNorm(fold_apply=True)
    variables = ref.init(jax.random.PRNGKey(0), x, mask, use_running_average=False)
    # exercise non-trivial affine + running stats
    variables = jax.tree.map(lambda a: a, variables)
    variables["params"] = {
        "scale": jnp.asarray(rng.uniform(0.5, 2.0, 16).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(0, 1, 16).astype(np.float32)),
    }

    for m in (mask, None):
        for ura in (True, False):
            ya, mut_a = ref.apply(variables, x, m, use_running_average=ura,
                                  mutable=["batch_stats"])
            yb, mut_b = fold.apply(variables, x, m, use_running_average=ura,
                                   mutable=["batch_stats"])
            np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                       rtol=2e-5, atol=2e-5)
            jax.tree.map(
                lambda p, q: np.testing.assert_allclose(np.asarray(p),
                                                        np.asarray(q), rtol=1e-6),
                mut_a["batch_stats"], mut_b["batch_stats"],
            )

    # bf16 compute: one FMA per element; stats still f32 -> stays close
    xb = x.astype(jnp.bfloat16)
    yb16 = MaskedBatchNorm(fold_apply=True, dtype=jnp.bfloat16).apply(
        variables, xb, mask, use_running_average=True)
    assert yb16.dtype == jnp.bfloat16
    ya = ref.apply(variables, x, mask, use_running_average=True)
    np.testing.assert_allclose(np.asarray(yb16, np.float32), np.asarray(ya),
                               rtol=0.05, atol=0.1)


def test_spark_norm_precision_compute_matches_f32():
    """SparKConfig.norm_precision='compute' (the NON-default folded variant;
    SparkTaskConfig defaults to 'float32', which measured faster at the
    protocol batch 32) must be a drop-in: identical param/stat tree,
    reconstruction within bf16 noise of the f32-normalize path."""
    base = SparKConfig(backbone="resnet18", input_size=64, dec_dim=64)
    fold = SparKConfig(backbone="resnet18", input_size=64, dec_dim=64,
                       norm_precision="compute")
    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 1)), jnp.float32)
    active = random_mask(jax.random.PRNGKey(2), 2, base.fmap_size, base.len_keep)
    m_a, m_b = SparKModel(base), SparKModel(fold)
    variables = m_a.init(jax.random.PRNGKey(0), x, active)
    assert jax.tree.structure(variables) == jax.tree.structure(
        m_b.init(jax.random.PRNGKey(0), x, active))
    ya = m_a.apply(variables, x, active)
    yb = m_b.apply(variables, x, active)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=2e-4,
                               atol=2e-4)


def test_sparse_masking_zeroes_inactive_regions():
    """With an active grid, backbone features at masked sites must be ~0 (the
    SparK sparse-conv invariant, reference encoder.py:19-35)."""
    cfg = ResNetConfig(variant="resnet18")
    model = ResNetBackbone(cfg)
    x = jnp.ones((1, 96, 96, 1))
    active = jnp.zeros((1, 3, 3), bool).at[0, 0, 0].set(True)
    params = model.init(jax.random.PRNGKey(0), x, active)
    feats = model.apply(params, x, active)
    c5 = np.asarray(feats[-1])  # [1,3,3,512]
    assert np.abs(c5[0, 1:, 1:]).max() < 1e-5  # masked sites are zero
    # note: neighboring sites of (0,0) can leak via conv halo before masking,
    # but strictly-masked interior sites must be exactly zeroed.


def test_upsample_mask():
    a = jnp.array([[[1, 0], [0, 1]]], dtype=bool)
    m = np.asarray(upsample_mask(a, 4, 4))
    assert m.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(m[0, :2, :2, 0], 1.0)
    np.testing.assert_array_equal(m[0, :2, 2:, 0], 0.0)


def test_random_mask_exact_keep_count():
    key = jax.random.PRNGKey(0)
    active = random_mask(key, 8, 3, 3)  # keep 3 of 9
    a = np.asarray(active)
    assert a.shape == (8, 3, 3)
    np.testing.assert_array_equal(a.reshape(8, -1).sum(1), 3)
    # different samples get different masks (overwhelmingly likely)
    assert not np.array_equal(a[0], a[1]) or not np.array_equal(a[1], a[2])


def test_patchify_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    p = patchify(x, 4)
    assert p.shape == (2, 4, 16)
    x2 = unpatchify(p, 4, 2)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x))


def test_light_decoder_shapes():
    dec = LightDecoder(dec_dim=128)
    to_dec = [
        jnp.zeros((1, 3, 3, 128)),
        jnp.zeros((1, 6, 6, 64)),
        jnp.zeros((1, 12, 12, 32)),
        jnp.zeros((1, 24, 24, 16)),
    ]
    params = dec.init(jax.random.PRNGKey(0), to_dec)
    out = dec.apply(params, to_dec)
    assert out.shape == (1, 96, 96, 1)


def test_spark_forward_and_loss():
    cfg = SparKConfig(backbone="resnet18", input_size=96, dec_dim=64)
    model = SparKModel(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 96, 96, 1))
    active = random_mask(jax.random.PRNGKey(3), 2, cfg.fmap_size, cfg.len_keep)
    variables = model.init(jax.random.PRNGKey(0), x, active)
    reco = model.apply(variables, x, active)
    assert reco.shape == (2, 96, 96, 1)
    loss = spark_spatial_loss(cfg, x, reco, active)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_spark_loss_only_on_masked_patches():
    cfg = SparKConfig(backbone="resnet18", input_size=96)
    x = jnp.ones((1, 96, 96, 1))
    active = jnp.zeros((1, 3, 3), bool).at[0, 0, 0].set(True)
    # reconstruction perfect on masked patches, wrong on the active patch
    rec = jnp.ones((1, 96, 96, 1)).at[:, :32, :32].set(5.0)
    loss = spark_spatial_loss(cfg, x, rec, active)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)
    # now corrupt a masked patch -> loss appears
    rec2 = jnp.ones((1, 96, 96, 1)).at[:, 32:64, 32:64].set(2.0)
    loss2 = spark_spatial_loss(cfg, x, rec2, active)
    assert float(loss2) > 0.1


def test_mask_variants():
    """Ranged / multi-ratio masking (reference mask(), spark/Spark_2D.py:120-141)."""
    import jax
    import jax.numpy as jnp
    from conditioned_diffusion_models_uad_tpu.models.spark import (
        random_mask_multi_ratio,
        random_mask_uniform_ratio,
    )

    k = jax.random.PRNGKey(0)
    a = random_mask_uniform_ratio(k, 6, 4, 0.5, 0.8)
    assert a.shape == (6, 4, 4)
    kept = int(a.sum()) / 6
    assert 16 * 0.15 <= kept <= 16 * 0.55  # ratio within (0.5, 0.8) masked

    b = random_mask_multi_ratio(k, 6, 4)
    assert b.shape == (6, 4, 4)
    # guaranteed at least one active site per sample
    assert bool(jnp.all(b.reshape(6, -1).any(axis=1)))


def test_unet_grad_checkpoint_equivalence():
    """use_checkpoint (nn.remat) must not change values or gradients
    (reference use_checkpoint, LDM util.py:102-148)."""
    import jax
    import jax.numpy as jnp
    from conditioned_diffusion_models_uad_tpu.models.unet import UNetConfig, UNetModel

    base = dict(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                attention_resolutions=(), cond_dim=None)
    m1 = UNetModel(UNetConfig(**base))
    m2 = UNetModel(UNetConfig(**base, use_checkpoint=True))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 1))
    t = jnp.zeros((2,), jnp.int32)
    v = m1.init(jax.random.PRNGKey(1), x, t, None)

    def loss(m, v):
        return lambda p: jnp.abs(m.apply({"params": p}, x, t, None)).mean()

    l1, g1 = jax.value_and_grad(loss(m1, v))(v["params"])
    l2, g2 = jax.value_and_grad(loss(m2, v))(v["params"])
    assert abs(float(l1) - float(l2)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        assert jnp.allclose(a, b, atol=1e-5)
