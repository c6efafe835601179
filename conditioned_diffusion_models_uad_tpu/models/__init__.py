"""Models: the UNet/encoder/SparK networks (L5) and the task modules (L4)."""
from .resnet import MaskedBatchNorm, ResNetBackbone, ResNetConfig, ResNetEncoder
from .spark import (
    LightDecoder,
    SparKConfig,
    SparKModel,
    random_mask,
    spark_spatial_loss,
)
from .tasks import (
    TASKS,
    DDPMTask,
    DDPMTaskConfig,
    SparkTask,
    SparkTaskConfig,
    import_spark_encoder,
)
from .unet import UNetConfig, UNetModel, count_params, unet_flops_per_forward

__all__ = [
    "TASKS",
    "DDPMTask",
    "DDPMTaskConfig",
    "LightDecoder",
    "MaskedBatchNorm",
    "ResNetBackbone",
    "ResNetConfig",
    "ResNetEncoder",
    "SparKConfig",
    "SparKModel",
    "SparkTask",
    "SparkTaskConfig",
    "UNetConfig",
    "UNetModel",
    "count_params",
    "import_spark_encoder",
    "random_mask",
    "spark_spatial_loss",
    "unet_flops_per_forward",
]
