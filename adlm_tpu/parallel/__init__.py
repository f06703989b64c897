from adlm_tpu.parallel.sharding import (
    make_sharded_cls_step,
    make_sharded_train_step,
    make_sharded_inference_fn,
    shard_state,
)

__all__ = [
    "make_sharded_cls_step",
    "make_sharded_train_step",
    "make_sharded_inference_fn",
    "shard_state",
]
