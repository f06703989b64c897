"""Device mesh + sharding utilities.

The reference has no distributed story (single-GPU Lightning,
``Trainer.gpus = 1`` in every config — reference
segmentation/configs/cityscapes_kld_imnet.gin:1).  Here multi-chip
scaling is first-class: a 2-D ``(data, model)`` mesh over ICI, batch
sharded on ``data``, with the ``model`` axis available for sharding the
prototype bank / spatial eval tiles.  Multi-host runs reuse the same
program via ``jax.distributed.initialize``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. ``data * model`` must divide the device count."""

    data: int = -1  # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = self.model
        data = self.data if self.data != -1 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != {n_devices} devices")
        return data, model


def make_mesh(spec: MeshSpec = MeshSpec(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = spec.resolve(len(devices))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))

def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (B, H, W, C) images: batch over data, H over model.

    The segmentation analogue of sequence/context parallelism: full-res
    2048x1024 eval inputs split along H; XLA inserts halo exchanges for
    the convolutions.
    """
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def prototype_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (P, C) prototype bank across the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def local_mesh_for_tests(n: int = 8) -> Mesh:
    """An n-device mesh for CPU fake-device tests."""
    return make_mesh(MeshSpec(data=n, model=1))
