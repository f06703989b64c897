"""Mesh-enabled pipeline smoke test on the virtual 8-CPU mesh."""

import json
import os

import numpy as np

from adlm_tpu.core.mesh import MeshSpec, make_mesh
from tests.test_pipeline import _tiny_experiment, _write_fake_dataset


def test_pipeline_with_mesh(tmp_path):
    from adlm_tpu.train.pipeline import run_protoseg_training

    data_root = str(tmp_path / "data")
    run_dir = str(tmp_path / "run")
    _write_fake_dataset(data_root)
    cfg = _tiny_experiment("tiny_mesh")
    # batch must be divisible by the data axis
    import dataclasses
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, warmup_batch_size=4, joint_batch_size=4,
        warmup_steps=2, joint_steps=2, finetune_steps=2, iter_size=1))

    mesh = make_mesh(MeshSpec(data=4, model=2))
    state = run_protoseg_training(cfg, run_dir, data_path=data_root,
                                  val_every=1, val_batches=1, mesh=mesh)
    P = np.asarray(state.params["prototype_vectors"]).shape[0]
    assert 1 <= P <= 6
    from adlm_tpu.core.checkpoint import CheckpointStore
    assert CheckpointStore(run_dir).exists("push", "last")
