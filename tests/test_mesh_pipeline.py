"""Mesh-enabled pipeline smoke test on the virtual 8-CPU mesh."""

import json
import os

import numpy as np

from adlm_tpu.core.mesh import MeshSpec, make_mesh
from tests.test_pipeline import _tiny_experiment, _write_fake_dataset
import pytest


@pytest.mark.slow
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


def test_mesh_process_loader_resume_dress_rehearsal(tmp_path):
    """Composition of the three round-4 subsystems that were only ever
    tested alone (SURVEY §2d): a (data=4, model=2) mesh-sharded train
    run FED BY THE PROCESS-MODE LOADER (spawn workers + shared-memory
    sample ring), interrupted mid-joint and resumed with --resume —
    final parameters must be bit-identical to the uninterrupted
    mesh+process run."""
    import dataclasses

    import jax

    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.train.pipeline import run_protoseg_training

    data_root = str(tmp_path / "data")
    _write_fake_dataset(data_root)
    base = _tiny_experiment("tiny_mesh_proc_resume")
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, dataloader_mode="process",
                                 dataloader_n_jobs=2),
        train=dataclasses.replace(base.train, warmup_batch_size=4,
                                  joint_batch_size=4, warmup_steps=2,
                                  joint_steps=4, finetune_steps=2,
                                  iter_size=1))
    # windows: warmup 2, joint 4, finetune 2
    mesh = make_mesh(MeshSpec(data=4, model=2))

    run_a = str(tmp_path / "straight")
    state_a = run_protoseg_training(cfg, run_dir=run_a,
                                    data_path=data_root, val_every=2,
                                    val_batches=1, mesh=mesh)

    run_b = str(tmp_path / "interrupted")
    run_protoseg_training(cfg, run_dir=run_b, data_path=data_root,
                          val_every=2, val_batches=1, mesh=mesh,
                          halt_after_windows=4)  # 2 of 4 joint windows
    meta = json.load(open(os.path.join(run_b, "resume.json")))
    assert meta["stage"] == "nopush" and meta["windows_done"] == 2
    assert not CheckpointStore(run_b).exists("push", "last")

    state_b = run_protoseg_training(cfg, run_dir=run_b,
                                    data_path=data_root, val_every=2,
                                    val_batches=1, mesh=mesh,
                                    resume=True)
    leaves_a = jax.tree_util.tree_leaves(dict(state_a.params))
    leaves_b = jax.tree_util.tree_leaves(dict(state_b.params))
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state_a.proto_class),
                                  np.asarray(state_b.proto_class))
