"""Stage-keyed pytree checkpoint store.

The reference pickles whole ``nn.Module`` objects per validation epoch
under stage-keyed names ``{warmup,nopush,push}_{last,best}.pth``
(reference segmentation/module.py:285-297, train.py:192-195) and a
pruned model under ``pruned/pruned.pth``.  We keep the same stage-keyed
contract but store functional pytrees (params / batch stats / optimizer
state) via Orbax, with the experiment config JSON saved alongside so a
checkpoint is self-describing and resumable.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

STAGES = ("warmup", "nopush", "push", "pruned")
KINDS = ("last", "best")


class CheckpointStore:
    def __init__(self, run_dir: str):
        self.run_dir = os.path.abspath(run_dir)
        self.ckpt_dir = os.path.join(self.run_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, stage: str, kind: str) -> str:
        return os.path.join(self.ckpt_dir, f"{stage}_{kind}")

    def save(self, stage: str, kind: str, state: Any, *, force: bool = True) -> str:
        path = self._path(stage, kind)
        self._ckptr.save(path, state, force=force)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, stage: str, kind: str, target: Optional[Any] = None) -> Any:
        path = self._path(stage, kind)
        if target is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            return self._ckptr.restore(path, abstract)
        # Target-free restore is device-agnostic: leaves come back as
        # host numpy arrays, ignoring the sharding metadata recorded at
        # save time.  Without this, a checkpoint written on TPU refuses
        # to load in a CPU process ("Device TPU v5 lite0 was not found")
        # — eval/analysis tooling must be able to read any checkpoint.
        with ocp.PyTreeCheckpointer() as ckptr:
            tree = ckptr.metadata(path).item_metadata.tree
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
            return ckptr.restore(path, restore_args=restore_args)

    def exists(self, stage: str, kind: str) -> bool:
        return os.path.isdir(self._path(stage, kind))

    def save_config(self, config_json: str) -> None:
        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            f.write(config_json)

    def load_config_json(self) -> str:
        with open(os.path.join(self.run_dir, "config.json")) as f:
            return f.read()

    def save_metadata(self, name: str, obj: Any) -> None:
        with open(os.path.join(self.run_dir, f"{name}.json"), "w") as f:
            json.dump(obj, f, indent=2)
