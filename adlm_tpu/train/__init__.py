from adlm_tpu.train.optimizer import label_params, make_optimizer, poly_schedule
from adlm_tpu.train.protoseg import (
    ProtoSegState,
    init_protoseg_state,
    make_eval_step,
    make_train_step,
)
from adlm_tpu.train.unoise import (
    NoiseState,
    UtilityState,
    init_noise_state,
    init_utility_state,
    make_noise_train_step,
    make_utility_train_step,
)

__all__ = [
    "label_params",
    "make_optimizer",
    "poly_schedule",
    "ProtoSegState",
    "init_protoseg_state",
    "make_train_step",
    "make_eval_step",
    "UtilityState",
    "NoiseState",
    "init_utility_state",
    "init_noise_state",
    "make_utility_train_step",
    "make_noise_train_step",
]
