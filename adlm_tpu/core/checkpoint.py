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
import shutil
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

    def _heal(self, path: str) -> None:
        """Recover from a crash mid-``save``.

        ``save`` stages the new checkpoint at ``<path>.next`` and only
        then rotates it into place, so at every instant one finalized
        generation exists: ``path`` itself, the finalized ``.next``
        (crash between finalize and rotation), or the demoted ``.old``
        (crash between the two renames).  Promote whichever survives,
        newest first, then clear leftovers.  Orbax's own in-progress
        ``*.orbax-checkpoint-tmp`` directories are never promoted.
        """
        nxt, old = path + ".next", path + ".old"
        if os.path.isdir(nxt):
            # a finalized .next is a COMPLETED newer save whose
            # rotation was interrupted — it wins over path
            if os.path.isdir(old):
                shutil.rmtree(old)
            if os.path.isdir(path):
                os.rename(path, old)
            os.rename(nxt, path)
        elif not os.path.isdir(path) and os.path.isdir(old):
            os.rename(old, path)
        if os.path.isdir(path) and os.path.isdir(old):
            shutil.rmtree(old)

    def save(self, stage: str, kind: str, state: Any, *, force: bool = True) -> str:
        """Crash-atomic save: at no point is the previous generation
        deleted before the new one is finalized.

        Orbax's ``force=True`` removes an existing directory BEFORE
        writing its replacement, so a preemption mid-save used to lose
        BOTH generations — observed on hardware round 5: an external
        kill during a ``warmup_last`` save left only an
        ``.orbax-checkpoint-tmp`` and resume restarted the stage from
        window 0, discarding 2,100 windows (PERF.md "Watchdog operating
        history").  The new checkpoint is staged at ``<path>.next``
        (its own tmp-then-rename finalize), the old generation is
        demoted to ``<path>.old``, the staged one rotated in, and the
        demoted one removed; ``_heal`` completes any interrupted
        rotation on the next read or write.
        """
        path = self._path(stage, kind)
        self._heal(path)
        nxt, old = path + ".next", path + ".old"
        self._ckptr.save(nxt, state, force=True)
        self._ckptr.wait_until_finished()
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(nxt, path)
        if os.path.isdir(old):
            shutil.rmtree(old)
        return path

    def restore(self, stage: str, kind: str, target: Optional[Any] = None) -> Any:
        path = self._path(stage, kind)
        self._heal(path)
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
        path = self._path(stage, kind)
        self._heal(path)
        return os.path.isdir(path)

    def save_config(self, config_json: str) -> None:
        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            f.write(config_json)

    def load_config_json(self) -> str:
        with open(os.path.join(self.run_dir, "config.json")) as f:
            return f.read()

    def save_metadata(self, name: str, obj: Any) -> None:
        with open(os.path.join(self.run_dir, f"{name}.json"), "w") as f:
            json.dump(obj, f, indent=2)
