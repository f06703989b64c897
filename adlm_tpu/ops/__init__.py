from adlm_tpu.ops.prototype import (
    l2_distances,
    weighted_l2_distances,
    distance_to_similarity,
    prototype_head,
    prototype_head_reference,
)
from adlm_tpu.ops.resize import resize_label_nearest, resize_bilinear
from adlm_tpu.ops.losses import (
    cross_entropy_ignore,
    dice_coeff,
    kld_prototype_loss,
    masked_l1,
    bce_with_logits,
)

__all__ = [
    "l2_distances",
    "weighted_l2_distances",
    "distance_to_similarity",
    "prototype_head",
    "prototype_head_reference",
    "resize_label_nearest",
    "resize_bilinear",
    "cross_entropy_ignore",
    "dice_coeff",
    "kld_prototype_loss",
    "masked_l1",
    "bce_with_logits",
]
