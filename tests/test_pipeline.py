"""End-to-end pipeline smoke tests on fake data (tiny model, CPU mesh)."""

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from adlm_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    PPNetConfig,
    TrainConfig,
    register_experiment,
)


def _tiny_experiment(name="tiny_e2e"):
    return register_experiment(ExperimentConfig(
        name=name,
        model=PPNetConfig(num_prototypes=6, num_classes=3,
                          prototype_channels=8, deeplab_n_features=8,
                          deeplab_n_blocks=(1, 1, 1, 1), img_size=33),
        data=DataConfig(class_table="mds", window_size=(33, 33),
                        scales=(0.9, 1.1)),
        train=TrainConfig(iter_size=2, warmup_steps=4, joint_steps=4,
                          finetune_steps=4, warmup_batch_size=2,
                          joint_batch_size=2, loss_weight_kld=0.25),
    ))


def _write_fake_dataset(root, n=4, hw=(40, 48)):
    rng = np.random.RandomState(0)
    ids = {}
    for split in ("train", "val"):
        img_dir = os.path.join(root, "img_with_margin_0", split)
        ann_dir = os.path.join(root, "annotations", split)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        ids[split] = []
        for i in range(n):
            img_id = f"{split}{i}"
            ids[split].append(img_id)
            np.save(os.path.join(img_dir, img_id + ".npy"),
                    rng.randint(0, 255, size=(*hw, 3)).astype(np.uint8))
            np.save(os.path.join(ann_dir, img_id + ".npy"),
                    rng.randint(0, 3, size=hw).astype(np.uint8))
    with open(os.path.join(root, "all_images.json"), "w") as f:
        json.dump(ids, f)


def test_full_protoseg_pipeline(tmp_path):
    from adlm_tpu.train.pipeline import run_protoseg_training
    from adlm_tpu.core.checkpoint import CheckpointStore

    data_root = str(tmp_path / "data")
    run_dir = str(tmp_path / "run")
    _write_fake_dataset(data_root)
    cfg = _tiny_experiment()

    trace_dir = str(tmp_path / "trace")
    state = run_protoseg_training(cfg, run_dir, data_path=data_root,
                                  val_every=1, val_batches=2,
                                  trace_dir=trace_dir)

    # one jax.profiler trace per phase (--trace-dir contract)
    for stage in ("warmup", "nopush", "push"):
        d = os.path.join(trace_dir, stage)
        assert os.path.isdir(d) and os.listdir(d), stage

    store = CheckpointStore(run_dir)
    for stage in ("warmup", "nopush", "push"):
        assert store.exists(stage, "last"), stage
    # config saved for resume
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    # push artifacts
    assert os.path.exists(os.path.join(run_dir, "prototypes",
                                       "unique_prototypes.json"))
    # metrics CSV exists
    assert os.path.exists(os.path.join(run_dir, "logs",
                                       "train_metrics.csv"))
    # final state may have fewer prototypes (dedup)
    P = np.asarray(state.params["prototype_vectors"]).shape[0]
    assert 1 <= P <= 6
    assert np.asarray(state.proto_class).shape == (P,)


@pytest.mark.slow
def test_prune_and_eval_cli(tmp_path):
    from adlm_tpu.train.pipeline import run_protoseg_training
    from adlm_tpu.cli import main as cli_main

    data_root = str(tmp_path / "data")
    run_dir = str(tmp_path / "run")
    _write_fake_dataset(data_root)
    cfg = _tiny_experiment("tiny_e2e_cli")
    run_protoseg_training(cfg, run_dir, data_path=data_root,
                          val_every=2, val_batches=1)

    # eval-valid CLI writes mean_iou.txt / iou_scores.json + stat plots
    # + qualitative example overlays (reference eval_valid.py:270-343)
    cli_main(["eval-valid", run_dir, "push", "--split", "val",
              "--data-path", data_root, "--max-images", "2", "--stats",
              "--examples", "1"])
    out_dir = os.path.join(run_dir, "evaluation", "push")
    assert os.path.exists(os.path.join(out_dir, "mean_iou.txt"))
    assert os.path.exists(os.path.join(out_dir, "iou_scores.json"))
    assert os.path.exists(os.path.join(out_dir, "top_k_purity.png"))
    assert os.path.exists(os.path.join(out_dir, "example_0_prediction.png"))
    assert os.path.exists(os.path.join(out_dir, "example_0_prototypes.png"))
    miou_whole = float(open(os.path.join(out_dir, "mean_iou.txt")).read())

    # reference-exact upsampled statistics mode
    cli_main(["eval-valid", run_dir, "push", "--split", "val",
              "--data-path", data_root, "--max-images", "1", "--stats",
              "--stats-upsampled", "--examples", "0"])

    # windowed inference reaches the same artifact set; window = full
    # image size → identical mIoU to the whole-image forward
    cli_main(["eval-valid", run_dir, "push", "--split", "val",
              "--data-path", data_root, "--max-images", "2",
              "--windowed", "40,48", "--examples", "0"])
    miou_win = float(open(os.path.join(out_dir, "mean_iou.txt")).read())
    assert abs(miou_win - miou_whole) < 1e-6

    # sharded eval (batch over data, H over model) → same mIoU
    cli_main(["eval-valid", run_dir, "push", "--split", "val",
              "--data-path", data_root, "--max-images", "2", "--stats",
              "--examples", "0", "--batch-size", "2",
              "--mesh-data", "2", "--mesh-model", "2"])
    miou_mesh = float(open(os.path.join(out_dir, "mean_iou.txt")).read())
    assert abs(miou_mesh - miou_whole) < 1e-6

    # prune (threshold 0 keeps everything but exercises the path)
    cli_main(["prune", run_dir, "--data-path", data_root,
              "--k", "2", "--threshold", "0"])
    from adlm_tpu.core.checkpoint import CheckpointStore
    assert CheckpointStore(run_dir).exists("pruned", "last")

    # pruned finetune via pipeline
    from adlm_tpu.train.pipeline import run_protoseg_training as rpt
    rpt(cfg, run_dir, data_path=data_root, pruned=True, val_every=2,
        val_batches=1)

    # eval-test writes prediction PNGs
    cli_main(["eval-test", run_dir, "pruned", "--split", "val",
              "--data-path", data_root, "--max-images", "1"])
    pred_dir = os.path.join(run_dir, "evaluation", "pruned",
                            "test_predictions")
    assert len(os.listdir(pred_dir)) == 1

    # windowed eval-test: window == image size → identical PNG
    import numpy as _np
    from PIL import Image as _Image
    name = os.listdir(pred_dir)[0]
    whole = _np.asarray(_Image.open(os.path.join(pred_dir, name)))
    os.remove(os.path.join(pred_dir, name))
    cli_main(["eval-test", run_dir, "pruned", "--split", "val",
              "--data-path", data_root, "--max-images", "1",
              "--windowed", "40,48"])
    win = _np.asarray(_Image.open(os.path.join(pred_dir, name)))
    _np.testing.assert_array_equal(win, whole)


@pytest.mark.slow
def test_msc_pipeline_end_to_end(tmp_path):
    """PASCAL-style multi-scale (MSC) config through all phases + push."""
    import dataclasses
    from adlm_tpu.train.pipeline import run_protoseg_training
    from adlm_tpu.core.checkpoint import CheckpointStore

    data_root = str(tmp_path / "data")
    run_dir = str(tmp_path / "run")
    _write_fake_dataset(data_root, n=2, hw=(48, 48))
    base = _tiny_experiment("tiny_msc_e2e")
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(base.model, msc_scales=(0.5, 0.75),
                                  img_size=48),
        data=dataclasses.replace(base.data, window_size=(48, 48)),
        train=dataclasses.replace(base.train, warmup_steps=2,
                                  joint_steps=2, finetune_steps=2,
                                  iter_size=1))
    state = run_protoseg_training(cfg, run_dir, data_path=data_root,
                                  val_every=1, val_batches=1)
    assert CheckpointStore(run_dir).exists("push", "last")
    P = np.asarray(state.params["prototype_vectors"]).shape[0]
    assert 1 <= P <= 6


def test_validate_covers_full_val_split_deterministically(tmp_path):
    """Best-checkpoint selection validates the ENTIRE val split in
    dataset order (reference segmentation/module.py:280-297), wrapping
    the final partial batch instead of changing the batch shape."""
    from adlm_tpu.train.pipeline import _validate
    from adlm_tpu.data.dataset import SegmentationDataset

    data_root = str(tmp_path / "data")
    _write_fake_dataset(data_root, n=5, hw=(33, 33))
    cfg = _tiny_experiment("tiny_validate")
    val_ds = SegmentationDataset(cfg.data, "val", data_path=data_root,
                                 is_eval=True)

    seen = []
    valid_counts = []

    def fake_eval(state, images, labels, n_valid=None):
        seen.append(np.asarray(images))
        valid_counts.append(n_valid)
        return {"n_correct": 1.0, "n_patches": 2.0, "loss": 0.5}

    out = _validate(fake_eval, None, val_ds, batch_size=2)
    # ceil(5/2)=3 batches of 2 → 6 items, last wraps to index 0
    assert len(seen) == 3
    assert all(b.shape == (2, 33, 33, 3) for b in seen)
    np.testing.assert_allclose(seen[2][1], seen[0][0])  # wrap-around
    # ...but the wrapped image is MASKED via n_valid (no tail bias)
    assert valid_counts == [2, 2, 1]
    assert out["accuracy"] == 0.5
    assert out["loss"] == 0.5

    seen2 = []

    def fake_eval2(state, images, labels, n_valid=None):
        seen2.append(np.asarray(images))
        return {"n_correct": 0.0, "n_patches": 1.0}

    _validate(fake_eval2, None, val_ds, batch_size=2)
    for a, b in zip(seen, seen2):
        np.testing.assert_allclose(a, b)  # deterministic across calls

    # quick mode caps the batch count (ordered prefix)
    seen3 = []
    _validate(lambda s, i, l, n_valid=None: seen3.append(1) or
              {"n_correct": 0.0, "n_patches": 1.0},
              None, val_ds, batch_size=2, val_batches=1)
    assert len(seen3) == 1


def test_analyze_cli_with_push_artifacts(tmp_path):
    """analyze-local/analyze-global CLI end-to-end: per-class sections
    and linking the top prototypes' push artifacts (reference
    local_analysis.py:215-228) into the analysis dir."""
    import glob
    from adlm_tpu.train.pipeline import run_protoseg_training
    from adlm_tpu.cli import main as cli_main

    data_root = str(tmp_path / "data")
    run_dir = str(tmp_path / "run")
    _write_fake_dataset(data_root)
    cfg = _tiny_experiment("tiny_e2e_analysis")
    run_protoseg_training(cfg, run_dir, data_path=data_root,
                          val_every=2, val_batches=1,
                          save_push_visualizations=True)
    assert glob.glob(os.path.join(run_dir, "prototypes", "*",
                                  "prototype-img_*-original.png"))

    cli_main(["analyze-local", run_dir, "push", "--split", "val",
              "--data-path", data_root, "--index", "0", "--top-k", "2",
              "--per-class-top", "1"])
    out = os.path.join(run_dir, "local_analysis", "val0")
    files = os.listdir(out)
    # overlays + crops for top-2 prototypes
    assert any(f.startswith("top-1_prototype") for f in files), files
    # per-class section
    assert os.path.exists(os.path.join(out, "top-1_class_prototypes",
                                       "log.json"))
    # linked push artifacts for surviving top prototypes
    assert any("original" in f for f in files), files

    cli_main(["analyze-global", run_dir, "push", "--split", "val",
              "--data-path", data_root, "--k", "2"])
    g = os.path.join(run_dir, "global_analysis")
    assert os.path.exists(os.path.join(g, "full_class_id.npy"))


def test_push_time_index_mapping(tmp_path):
    """analyze-local artifact links must survive BOTH index
    compactions: push dedup (unique_prototypes.json) and pruning
    (prune_info.npy) — prototype identity is never contiguous after
    either (CLAUDE.md convention)."""
    import json as _json
    from adlm_tpu.cli import _push_time_indices

    run = str(tmp_path)
    os.makedirs(os.path.join(run, "prototypes"))
    # push started with 6 prototypes, dedup removed originals 2 and 4
    with open(os.path.join(run, "prototypes",
                           "unique_prototypes.json"), "w") as f:
        _json.dump([0, 1, 3, 5], f)

    # push stage: current 0..3 -> originals
    assert _push_time_indices(run, "push", 4) == [0, 1, 3, 5]

    # pruning then removed push-stage indices 1 and 2 (originals 1, 3)
    np.save(os.path.join(run, "prune_info.npy"),
            np.asarray([[1, 0], [2, 1]], np.int64))
    assert _push_time_indices(run, "pruned", 2) == [0, 5]

    # inconsistent count -> refuse to link rather than mislabel
    assert _push_time_indices(run, "pruned", 3) is None
    # pruned stage without prune_info -> refuse
    os.remove(os.path.join(run, "prune_info.npy"))
    assert _push_time_indices(run, "pruned", 2) is None


def test_val_augment_reproduces_reference_noisy_val(tmp_path):
    """--val-augment parity flag: the val stream gets the random
    scale/crop/flip chain (reference dataset.py:119-173 augments every
    split) and is NOT reseeded per validation pass, so successive
    validations see different crops — the reference's noisy
    best-checkpoint selection semantics."""
    from adlm_tpu.train.pipeline import _validate
    from adlm_tpu.data.dataset import SegmentationDataset

    data_root = str(tmp_path / "data")
    # images larger than the window so crops/scales actually vary
    _write_fake_dataset(data_root, n=3, hw=(48, 56))
    cfg = _tiny_experiment("tiny_val_augment")
    aug_ds = SegmentationDataset(cfg.data, "val", data_path=data_root,
                                 is_eval=False)
    aug_ds.rng.seed(123)

    def collect(bucket):
        def fake_eval(state, images, labels, n_valid=None):
            bucket.append(np.asarray(images))
            return {"n_correct": 1.0, "n_patches": 2.0}
        return fake_eval

    a, b = [], []
    _validate(collect(a), None, aug_ds, batch_size=2)
    _validate(collect(b), None, aug_ds, batch_size=2)
    assert any(not np.allclose(x, y) for x, y in zip(a, b)), \
        "augmented val stream should differ across validation passes"

    # default path stays deterministic (is_eval=True reseeds)
    det_ds = SegmentationDataset(cfg.data, "val", data_path=data_root,
                                 is_eval=True)
    c, d = [], []
    _validate(collect(c), None, det_ds, batch_size=2)
    _validate(collect(d), None, det_ds, batch_size=2)
    for x, y in zip(c, d):
        np.testing.assert_allclose(x, y)


def test_superbatch_iterator_deterministic_and_resumable(tmp_path):
    """The loader's index + augmentation streams are pure functions of
    (seed, window counter): identical across thread counts, and
    ``start_window=k`` reproduces EXACTLY the windows a fresh run
    produces from window k (the mid-phase resume contract)."""
    from adlm_tpu.data.dataset import SegmentationDataset
    from adlm_tpu.data.pipeline import superbatch_iterator

    data_root = str(tmp_path / "data")
    _write_fake_dataset(data_root, n=3, hw=(48, 56))
    cfg = _tiny_experiment("tiny_loader_resume")
    ds = SegmentationDataset(cfg.data, "train", data_path=data_root)

    full = list(superbatch_iterator(ds, 2, 2, 5, seed=7, n_jobs=1))
    threaded = list(superbatch_iterator(ds, 2, 2, 5, seed=7, n_jobs=4))
    assert len(full) == 5
    for (ia, la), (ib, lb) in zip(full, threaded):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)

    resumed = list(superbatch_iterator(ds, 2, 2, 5, seed=7, n_jobs=4,
                                       start_window=3))
    assert len(resumed) == 2
    for (ia, la), (ib, lb) in zip(full[3:], resumed):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)

    # process-pool mode (the multi-core feeding path): same stream
    proc = list(superbatch_iterator(ds, 2, 2, 2, seed=7, n_jobs=2,
                                    mode="process"))
    for (ia, la), (ib, lb) in zip(full[:2], proc):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)

    # different seed -> different stream (the seeds actually matter)
    other = list(superbatch_iterator(ds, 2, 2, 1, seed=8, n_jobs=1))
    assert not np.array_equal(full[0][0], other[0][0])


def test_halt_and_resume_bit_identical(tmp_path):
    """Preemption-safe resume: a run halted mid-joint (--halt-after) and
    resumed (--resume) produces BIT-IDENTICAL final parameters to an
    uninterrupted run — optimizer moments, LR-schedule position,
    early-stopping counters and the loader streams all continue exactly
    (the reference restarts phases from step 0 with fresh moments,
    reference segmentation/train.py:58-65, module.py:292-297)."""
    import jax
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.train.pipeline import run_protoseg_training

    data_root = str(tmp_path / "data")
    _write_fake_dataset(data_root)
    cfg = _tiny_experiment("tiny_resume")

    run_a = str(tmp_path / "run_straight")
    state_a = run_protoseg_training(cfg, run_dir=run_a,
                                    data_path=data_root,
                                    val_every=1, val_batches=1)

    # warmup = 2 windows, joint = 2 windows, finetune = 2 windows;
    # halt after 3 -> mid-joint (1 of 2 joint windows done)
    run_b = str(tmp_path / "run_halted")
    run_protoseg_training(cfg, run_dir=run_b, data_path=data_root,
                          val_every=1, val_batches=1,
                          halt_after_windows=3)
    import json as _json
    meta = _json.load(open(os.path.join(run_b, "resume.json")))
    assert meta == {"stage": "nopush", "windows_done": 1,
                    "n_windows": 2, "completed": False,
                    "best_acc": meta["best_acc"],
                    "stale": meta["stale"]}
    # the halted run must NOT have reached the push stage
    assert not CheckpointStore(run_b).exists("push", "last")

    state_b = run_protoseg_training(cfg, run_dir=run_b,
                                    data_path=data_root,
                                    val_every=1, val_batches=1,
                                    resume=True)

    leaves_a = jax.tree_util.tree_leaves(dict(state_a.params))
    leaves_b = jax.tree_util.tree_leaves(dict(state_b.params))
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state_a.proto_class),
                                  np.asarray(state_b.proto_class))

    # resuming a COMPLETE run is a no-op that returns the final state
    state_c = run_protoseg_training(cfg, run_dir=run_b,
                                    data_path=data_root,
                                    val_every=1, val_batches=1,
                                    resume=True)
    for a, b in zip(leaves_b, jax.tree_util.tree_leaves(
            dict(state_c.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_resume_mid_warmup_and_mid_finetune(tmp_path):
    """Resume entry points at BOTH ends of the schedule: a halt inside
    warmup (window 1 of 6) and a halt inside the last-layer finetune
    both continue to bit-identical final params."""
    import dataclasses as _dc
    import jax
    from adlm_tpu.train.pipeline import run_protoseg_training

    data_root = str(tmp_path / "data")
    _write_fake_dataset(data_root)
    base = _tiny_experiment("tiny_resume_edges")
    cfg = _dc.replace(base, train=_dc.replace(
        base.train, warmup_steps=4, joint_steps=2, finetune_steps=4))
    # windows: warmup 2, joint 1, finetune 2

    run_a = str(tmp_path / "straight")
    state_a = run_protoseg_training(cfg, run_dir=run_a,
                                    data_path=data_root,
                                    val_every=1, val_batches=1)

    for halt_at, label in ((1, "mid_warmup"), (4, "mid_finetune")):
        run_b = str(tmp_path / f"halted_{label}")
        run_protoseg_training(cfg, run_dir=run_b, data_path=data_root,
                              val_every=1, val_batches=1,
                              halt_after_windows=halt_at)
        state_b = run_protoseg_training(cfg, run_dir=run_b,
                                        data_path=data_root,
                                        val_every=1, val_batches=1,
                                        resume=True)
        for a, b in zip(jax.tree_util.tree_leaves(dict(state_a.params)),
                        jax.tree_util.tree_leaves(dict(state_b.params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=label)


@pytest.mark.slow
def test_halt_at_phase_boundary_resumes_without_stage_checkpoint(tmp_path):
    """Two fixes in one scenario: (a) --halt-after fires ON a phase's
    final window (previously it leaked at least one unbudgeted window
    into the next phase), and (b) --resume re-enters a stage that has
    no checkpoint yet (here: joint, entered via the completed-warmup
    marker before the joint phase's first save) from its predecessor's
    state instead of crashing on a checkpoint that was never written."""
    import jax
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.train.pipeline import run_protoseg_training

    data_root = str(tmp_path / "data")
    _write_fake_dataset(data_root)
    cfg = _tiny_experiment("tiny_boundary_halt")

    run_a = str(tmp_path / "straight")
    state_a = run_protoseg_training(cfg, run_dir=run_a,
                                    data_path=data_root,
                                    val_every=1, val_batches=1)

    # warmup = 2 windows; halt budget of exactly 2 must stop AT the
    # warmup/joint boundary, not one window into joint
    run_b = str(tmp_path / "halted")
    run_protoseg_training(cfg, run_dir=run_b, data_path=data_root,
                          val_every=1, val_batches=1,
                          halt_after_windows=2)
    meta = json.load(open(os.path.join(run_b, "resume.json")))
    assert meta["stage"] == "warmup"
    assert meta["windows_done"] == 2 and meta["completed"]
    store = CheckpointStore(run_b)
    assert store.exists("warmup", "last")
    assert not store.exists("nopush", "last")  # joint never started

    state_b = run_protoseg_training(cfg, run_dir=run_b,
                                    data_path=data_root,
                                    val_every=1, val_batches=1,
                                    resume=True)
    for a, b in zip(jax.tree_util.tree_leaves(dict(state_a.params)),
                    jax.tree_util.tree_leaves(dict(state_b.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_before_any_checkpoint_restarts_fresh(tmp_path):
    """A run killed before its first checkpoint save (pretrained load /
    initial compile) leaves resume.json pointing at a stage with no
    'last' payload; --resume must fall back to a fresh start — the
    --auto-restart supervisor depends on this not being a hard exit."""
    from adlm_tpu.train.pipeline import run_protoseg_training

    data_root = str(tmp_path / "data")
    _write_fake_dataset(data_root)
    cfg = _tiny_experiment("tiny_checkpointless_resume")

    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "resume.json"), "w") as f:
        json.dump({"stage": "warmup", "windows_done": 0, "n_windows": 2,
                   "completed": False, "best_acc": -1.0, "stale": 0}, f)

    state = run_protoseg_training(cfg, run_dir=run_dir,
                                  data_path=data_root,
                                  val_every=1, val_batches=1,
                                  resume=True)
    from adlm_tpu.core.checkpoint import CheckpointStore
    assert CheckpointStore(run_dir).exists("push", "last")
    assert state is not None


def test_augment_fallback_uses_per_sample_rng(tmp_path, monkeypatch):
    """Without the native C lib the pure-python augment chain must draw
    scale/crop/flip from the PER-SAMPLE rng, not the shared dataset rng
    — otherwise thread scheduling (and any interleaved draws) silently
    break the deterministic-resume contract off the native path."""
    from adlm_tpu import native
    from adlm_tpu.data.dataset import SegmentationDataset

    monkeypatch.setattr(native, "available", lambda: False)

    data_root = str(tmp_path / "data")
    _write_fake_dataset(data_root, n=3, hw=(48, 56))
    cfg = _tiny_experiment("tiny_fallback_rng")
    ds = SegmentationDataset(cfg.data, "train", data_path=data_root)

    im1, lb1 = ds.get_train_item(0, sample_seed=123)
    _ = ds[1]          # perturb the SHARED rng between the two draws
    _ = ds[2]
    im2, lb2 = ds.get_train_item(0, sample_seed=123)
    np.testing.assert_array_equal(im1, im2)
    np.testing.assert_array_equal(lb1, lb2)

    # different per-sample seeds produce different augmentations
    diff = any(not np.array_equal(
        im1, ds.get_train_item(0, sample_seed=123 + k)[0])
        for k in range(1, 6))
    assert diff


def test_shm_ring_slots_and_cleanup():
    """The process-loader's shared-memory ring: slot views are disjoint
    (writing one slot never disturbs another), round-trip values are
    exact, and close(unlink=True) removes the segment."""
    from multiprocessing import shared_memory

    from adlm_tpu.data.pipeline import _ShmRing

    ring = _ShmRing(3, (4, 5, 3), (4, 5))
    rng = np.random.RandomState(0)
    imgs = [rng.rand(4, 5, 3).astype(np.float32) for _ in range(3)]
    labs = [rng.randint(0, 9, size=(4, 5)).astype(np.int32)
            for _ in range(3)]
    for j in range(3):
        iv, lv = ring.views(j)
        np.copyto(iv, imgs[j])
        np.copyto(lv, labs[j])
    for j in range(3):
        iv, lv = ring.views(j)
        np.testing.assert_array_equal(iv, imgs[j])
        np.testing.assert_array_equal(lv, labs[j])
    name = ring.name
    # drop views before close: SharedMemory refuses to close an
    # exported buffer
    del iv, lv
    ring.close(unlink=True)
    with pytest.raises(FileNotFoundError):
        shared_memory.SharedMemory(name=name)


def test_divergence_guard_aborts_without_saving(tmp_path):
    """A non-finite loss must abort the phase with TrainingDiverged and
    must NOT write a checkpoint or resume marker for the poisoned
    window — the stage's `last` payload stays at the most recent finite
    state (round 5: the full-budget joint phase checkpointed NaN
    optimizer moments before this guard existed)."""
    import pytest as _pytest
    from adlm_tpu.train.pipeline import (TrainingDiverged, _phase_loop,
                                         _read_resume)
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.utils.logging import RunLogger

    class _NanStepFn:
        """Finite metrics for 49 windows, NaN at window 49 (the first
        log-cadence check)."""
        def __init__(self):
            self.calls = 0

        def __call__(self, state, images, labels):
            self.calls += 1
            loss = np.nan if self.calls >= 50 else 1.0
            m = {"loss": jnp.asarray(loss),
                 "cross_entropy": jnp.asarray(loss),
                 "kld_loss": jnp.zeros(()), "l1": jnp.zeros(()),
                 "grad_norm": jnp.asarray(np.inf if self.calls >= 50
                                          else 1.0),
                 "n_correct": jnp.asarray(1.0),
                 "n_patches": jnp.asarray(2.0)}
            return state, m

    def loader():
        img = np.zeros((2, 2, 8, 8, 3), np.float32)
        lab = np.zeros((2, 2, 8, 8), np.int64)
        for _ in range(100):
            yield img, lab
    loader_gen = loader()  # generators already expose .close()

    run_dir = str(tmp_path / "run")
    store = CheckpointStore(run_dir)
    logger = RunLogger(run_dir)
    with _pytest.raises(TrainingDiverged):
        _phase_loop(loader_gen, object(), _NanStepFn(), None, None,
                    batch_size=2, val_batches=None, n_windows=100,
                    val_every=1000, early_stopping_patience=None,
                    stage="nopush", store=store, logger=logger)
    # nothing checkpointed, no resume marker for the NaN window
    assert not store.exists("nopush", "last")
    assert not store.exists("nopush", "best")
