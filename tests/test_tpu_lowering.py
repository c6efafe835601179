"""Cross-platform TPU lowering checks (jax.export, no chip needed).

The CPU test suite exercises numerics; these tests additionally assert the
hot device programs LOWER for the TPU platform — catching accidental host
callbacks, unsupported primitives, or dtype issues (e.g. Mosaic-hostile
patterns) before the code ever reaches the tunneled chip."""
from functools import partial

import jax
import jax.numpy as jnp
import pytest
from jax import export


def _export_tpu(fn, *args):
    return export.export(jax.jit(fn), platforms=["tpu"])(*args)


S = jax.ShapeDtypeStruct


def test_fused_eval_program_lowers_for_tpu():
    from conditioned_diffusion_models_uad_tpu.eval.fused import volume_eval_program

    v = S((64, 64, 32), jnp.float32)
    sc = S((), jnp.float32)
    lat = S((16,), jnp.float32)
    _export_tpu(
        partial(volume_eval_program, residualmode="l1", erode_iterations=2,
                median_kernel=5, eval_seg=True, cc_min_size=8, pack_seg=True,
                with_hausdorff=True),
        v, v, v, v, sc, sc, sc, lat,
    )


def test_hausdorff_lowers_for_tpu():
    from conditioned_diffusion_models_uad_tpu.eval.hausdorff import hausdorff_sq_pair

    b = S((64, 64, 32), jnp.bool_)
    _export_tpu(hausdorff_sq_pair, b, b)


def test_cc_filter_lowers_for_tpu():
    from conditioned_diffusion_models_uad_tpu.eval.cc import (
        filter_3d_connected_components_device,
    )

    _export_tpu(
        partial(filter_3d_connected_components_device, min_size=8),
        S((48, 48, 24), jnp.bool_),
    )


def test_hist_pool_lowers_for_tpu():
    from conditioned_diffusion_models_uad_tpu.eval.metrics import (
        HIST_BINS, _hist_best_dice_impl, _hist_update_impl,
    )

    h = S((HIST_BINS,), jnp.float32)
    n = 64 * 64 * 32
    _export_tpu(_hist_update_impl, h, h, S((n,), jnp.float32), S((n,), jnp.float32))
    _export_tpu(_hist_best_dice_impl, h, h)


def test_tiny_reconstruct_lowers_for_tpu():
    from conditioned_diffusion_models_uad_tpu.models import DDPMTask, DDPMTaskConfig

    task = DDPMTask(DDPMTaskConfig(
        image_hw=(32, 32), cond_dim=16, encoder_backbone="resnet18",
        timesteps=20, unet_dim=32, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions=(), step_ensemble=(5, 10), test_timesteps=10,
        dtype="bfloat16",
    ))
    variables = jax.eval_shape(task.init, jax.random.PRNGKey(0))
    _export_tpu(
        task.reconstruct, variables,
        S((4, 32, 32, 1), jnp.float32), S((2,), jnp.uint32),
    )
