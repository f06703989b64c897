"""Tests for config registry, mesh, and checkpoint store."""

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core import (
    CheckpointStore,
    ExperimentConfig,
    MeshSpec,
    get_experiment,
    list_experiments,
    make_mesh,
)


def test_all_reference_experiments_registered():
    # one preset per reference gin file (segmentation/configs/*.gin)
    expected = {
        "cells", "cityscapes_kld_coco", "cityscapes_kld_imnet",
        "cityscapes_no_kld_imnet", "mds_new", "pascal_kld_coco",
        "pascal_kld_imnet", "pascal_no_kld_imnet",
    }
    assert expected <= set(list_experiments())


def test_config_json_roundtrip():
    cfg = get_experiment("cityscapes_kld_imnet")
    again = ExperimentConfig.from_json(cfg.to_json())
    assert again == cfg
    assert again.model.prototype_shape == (190, 64, 1, 1)
    assert again.model.num_prototypes_per_class == 10


def test_mds_preset_matches_reference_gin():
    cfg = get_experiment("mds_new")
    assert cfg.model.num_prototypes == 30
    assert cfg.model.num_classes == 3
    assert cfg.train.loss_weight_kld == 0.0
    assert cfg.train.iter_size == 5
    assert cfg.train.poly_lr_power == 0.9


def test_make_mesh_shapes():
    mesh = make_mesh(MeshSpec(data=4, model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(MeshSpec())  # all devices on data
    assert mesh.shape["data"] == len(jax.devices())


def test_checkpoint_roundtrip(tmp_path):
    store = CheckpointStore(str(tmp_path / "run"))
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7),
    }
    store.save("warmup", "last", state)
    assert store.exists("warmup", "last")
    assert not store.exists("push", "best")
    restored = store.restore("warmup", "last", target=state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    assert int(restored["step"]) == 7

    cfg = get_experiment("mds_new")
    store.save_config(cfg.to_json())
    assert ExperimentConfig.from_json(store.load_config_json()) == cfg


def test_checkpoint_targetfree_restore_is_device_agnostic(tmp_path):
    """Target-free restore must return host numpy, ignoring the saved
    sharding metadata — a checkpoint written on TPU must load in a CPU
    process (eval/analysis tooling reads any checkpoint)."""
    store = CheckpointStore(str(tmp_path / "run"))
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "pc": jnp.asarray([0, 1, 2]),
        "step": jnp.asarray(7),
    }
    store.save("push", "last", state)
    out = store.restore("push", "last")
    flat = jax.tree.leaves(out)
    assert all(isinstance(x, np.ndarray) for x in flat), \
        [type(x) for x in flat]
    np.testing.assert_array_equal(out["params"]["w"],
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(out["pc"], [0, 1, 2])


def test_dtypes_tree_casts():
    """core/dtypes: f32↔bf16 casts touch only the matching leaves and
    tree_cast(f32) is the identity."""
    import jax.numpy as jnp
    import numpy as np

    from adlm_tpu.core.dtypes import tree_bf16, tree_cast, tree_f32

    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "i": jnp.ones((2,), jnp.int32),
            "b": jnp.ones((2,), jnp.bfloat16),
            "n": 3}
    b = tree_bf16(tree)
    assert b["w"].dtype == jnp.bfloat16
    assert b["i"].dtype == jnp.int32 and b["n"] == 3
    f = tree_f32(b)
    assert f["w"].dtype == jnp.float32
    assert f["b"].dtype == jnp.float32  # was bf16 already
    assert f["i"].dtype == jnp.int32

    same = tree_cast(tree, jnp.float32)
    assert same["w"] is tree["w"]
    c = tree_cast(tree, jnp.bfloat16)
    assert c["w"].dtype == jnp.bfloat16 and c["i"].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(c["w"], np.float32),
                                  np.asarray(tree["w"]))


def test_checkpoint_save_is_crash_atomic(tmp_path):
    """A kill at ANY point inside ``save`` must leave a restorable
    previous generation (observed on hardware round 5: orbax
    ``force=True`` pre-deletes, so a mid-save kill lost both the old
    and new ``warmup_last`` and resume restarted the stage from
    window 0 — PERF.md "Watchdog operating history")."""
    import os
    import shutil

    store = CheckpointStore(str(tmp_path / "run"))
    gen1 = {"w": jnp.full((2, 2), 1.0)}
    gen2 = {"w": jnp.full((2, 2), 2.0)}
    store.save("warmup", "last", gen1)
    path = store._path("warmup", "last")

    def _w(state):
        return float(np.asarray(state["w"])[0, 0])

    # crash DURING the orbax write of gen2: only an unfinalized tmp of
    # .next exists alongside the intact gen1 (what the old code left at
    # `path` itself — unreadable)
    shutil.copytree(path, path + ".next.orbax-checkpoint-tmp")
    assert _w(store.restore("warmup", "last", target=gen1)) == 1.0
    shutil.rmtree(path + ".next.orbax-checkpoint-tmp")

    # crash AFTER gen2 finalized at .next but BEFORE the rotation:
    # restore must promote the newer generation
    store.save("warmup", "best", gen2)  # produce a finalized dir to copy
    shutil.copytree(store._path("warmup", "best"), path + ".next")
    assert _w(store.restore("warmup", "last", target=gen1)) == 2.0
    assert not os.path.isdir(path + ".next")

    # crash BETWEEN the two renames: old demoted, .next gone (promoted
    # by the crashed process before dying) — never both missing; here
    # simulate the worst ordering: path missing, only .old present
    os.rename(path, path + ".old")
    assert _w(store.restore("warmup", "last", target=gen1)) == 2.0
    assert store.exists("warmup", "last")

    # a fresh save heals leftovers and lands the new generation
    shutil.copytree(path, path + ".old")
    store.save("warmup", "last", gen1)
    assert _w(store.restore("warmup", "last", target=gen1)) == 1.0
    assert not os.path.isdir(path + ".old")
    assert not os.path.isdir(path + ".next")
