from adlm_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    PPNetConfig,
    TrainConfig,
    UNoiseConfig,
    get_experiment,
    list_experiments,
    register_experiment,
)
from adlm_tpu.core.mesh import MeshSpec, make_mesh
from adlm_tpu.core.checkpoint import CheckpointStore

__all__ = [
    "DataConfig",
    "ExperimentConfig",
    "PPNetConfig",
    "TrainConfig",
    "UNoiseConfig",
    "get_experiment",
    "list_experiments",
    "register_experiment",
    "MeshSpec",
    "make_mesh",
    "CheckpointStore",
]
