"""Prototype pruning by nearest-patch class purity.

Reference flow (reference prune.py:11-63, segmentation/run_pruning.py):
find each prototype's k=6 nearest training patches, count how many are
labelled with the prototype's own class, and prune prototypes with
fewer than ``prune_threshold=3`` own-class neighbours.  The pruned model
is then finetuned via the ``--pruned`` train path.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import jax.numpy as jnp
import numpy as np

from adlm_tpu.models.ppnet import PPNet, prune_params
from adlm_tpu.interpret.nearest import find_k_nearest_patches


def prune_by_purity(
    model: PPNet,
    params: Any,
    constants: Any,
    proto_class: jnp.ndarray,
    dataset: Iterable[Tuple[np.ndarray, np.ndarray]],
    num_classes: int,
    k: int = 6,
    prune_threshold: int = 3,
    log=print,
    batch_size: int = 1,
    raw_normalize=None,
) -> Tuple[Any, jnp.ndarray, np.ndarray]:
    """Returns (pruned_params, pruned_proto_class, prune_info) where
    prune_info rows are [pruned_index, class] (reference prune.py:47-60)."""
    nearest_ids = find_k_nearest_patches(
        model, params, constants, proto_class, dataset, num_classes, k=k,
        batch_size=batch_size, raw_normalize=raw_normalize)

    pc = np.asarray(proto_class)
    P = pc.shape[0]
    to_prune = [j for j in range(P)
                if int(np.sum(nearest_ids[j] == pc[j])) < prune_threshold]
    keep = sorted(set(range(P)) - set(to_prune))
    log(f"prune: k={k} threshold={prune_threshold} — pruning "
        f"{len(to_prune)}/{P} prototypes")
    if not keep:
        raise ValueError("pruning would remove every prototype")

    prune_info = np.asarray([[j, pc[j]] for j in to_prune], dtype=np.int64
                            ).reshape(-1, 2)
    new_params, new_pc = prune_params(params, proto_class, keep)
    return new_params, new_pc, prune_info
