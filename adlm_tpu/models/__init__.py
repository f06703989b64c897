from adlm_tpu.models.deeplab import ASPP, DeepLabV2, MSC
from adlm_tpu.models.ppnet import (
    PPNet,
    default_proto_class,
    prune_params,
)
from adlm_tpu.models.unet import UNet
from adlm_tpu.models.backbones import (
    ResNetFeatures,
    VGGFeatures,
    build_classification_backbone,
)

__all__ = [
    "ASPP",
    "DeepLabV2",
    "MSC",
    "PPNet",
    "default_proto_class",
    "prune_params",
    "UNet",
    "ResNetFeatures",
    "VGGFeatures",
    "build_classification_backbone",
]
