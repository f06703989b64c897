from adlm_tpu.interpret.push import push_prototypes, make_push_batch_fn
from adlm_tpu.interpret.nearest import find_k_nearest_patches
from adlm_tpu.interpret.prune import prune_by_purity
from adlm_tpu.interpret.evaluate import (
    SegEvaluator,
    make_inference_fn,
    make_overlay_fn,
    mean_iou_from_confusion,
    upsampled_nearest,
)
from adlm_tpu.interpret.windowed import (
    WindowedSegEvaluator,
    make_windowed_inference_fn,
)

__all__ = [
    "push_prototypes",
    "make_push_batch_fn",
    "find_k_nearest_patches",
    "prune_by_purity",
    "SegEvaluator",
    "WindowedSegEvaluator",
    "make_inference_fn",
    "make_overlay_fn",
    "make_windowed_inference_fn",
    "mean_iou_from_confusion",
    "upsampled_nearest",
]
