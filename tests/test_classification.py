"""Legacy ProtoPNet classification-path tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adlm_tpu.core.config import PPNetConfig
from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.train.classification import (
    ClassificationConfig,
    classification_loss,
    init_classifier_state,
    make_cls_eval_step,
    make_cls_push_batch_fn,
    make_cls_train_step,
    push_classification_prototypes,
)


def tiny_cls_cfg():
    return ClassificationConfig(model=PPNetConfig(
        base_architecture="resnet18", img_size=32, num_prototypes=6,
        prototype_channels=16, num_classes=3,
        add_on_layers_type="regular", patch_classification=False))


def test_classification_loss_matches_torch_reference():
    """Golden test vs the reference's cluster/separation math
    (reference train_and_test.py:37-65)."""
    import torch
    rng = np.random.RandomState(0)
    B, P, C = 4, 6, 3
    logits = rng.randn(B, C).astype(np.float32)
    min_d = rng.rand(B, P).astype(np.float32) * 10
    labels = rng.randint(0, C, size=(B,))
    w = rng.randn(P, C).astype(np.float32)
    cfg = tiny_cls_cfg()
    max_dist = cfg.model.prototype_channels

    loss, m = classification_loss(
        jnp.asarray(logits), jnp.asarray(min_d), jnp.asarray(labels),
        jnp.arange(P) // 2, jnp.asarray(w), cfg)

    ident = torch.zeros(P, C)
    for c in range(C):
        ident[c * 2:(c + 1) * 2, c] = 1
    t_min = torch.tensor(min_d)
    t_lab = torch.tensor(labels)
    correct = ident[:, t_lab].t()
    inv, _ = torch.max((max_dist - t_min) * correct, dim=1)
    cluster = torch.mean(max_dist - inv).item()
    wrong = 1 - correct
    inv_w, _ = torch.max((max_dist - t_min) * wrong, dim=1)
    sep = torch.mean(max_dist - inv_w).item()
    ce = torch.nn.functional.cross_entropy(
        torch.tensor(logits), t_lab.long()).item()
    l1 = (torch.tensor(w).t() * (1 - ident.t())).norm(p=1).item()

    np.testing.assert_allclose(float(m["cross_entropy"]), ce, rtol=1e-5)
    np.testing.assert_allclose(float(m["cluster"]), cluster, rtol=1e-5)
    np.testing.assert_allclose(float(m["separation"]), sep, rtol=1e-5)
    expected = ce + 0.8 * cluster - 0.08 * sep + 1e-4 * l1
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_classifier_phases_and_training():
    cfg = tiny_cls_cfg()
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, size=(4,)))

    state = init_classifier_state(model, cfg, "warm",
                                  jax.random.PRNGKey(0), images)
    step = make_cls_train_step(model, cfg, "warm")
    new_state, metrics = step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))

    # warm: features frozen, add_on/protos/last train
    feat_same = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(np.all(np.asarray(a) == np.asarray(b))),
        state.params["features"], new_state.params["features"]))
    assert feat_same
    assert not np.array_equal(np.asarray(state.params["prototype_vectors"]),
                              np.asarray(new_state.params["prototype_vectors"]))

    # last: only last layer trains
    state_l = init_classifier_state(model, cfg, "last",
                                    jax.random.PRNGKey(0), images,
                                    params=new_state.params,
                                    batch_stats=new_state.batch_stats)
    step_l = make_cls_train_step(model, cfg, "last")
    s2, _ = step_l(state_l, images, labels)
    assert np.array_equal(np.asarray(state_l.params["prototype_vectors"]),
                          np.asarray(s2.params["prototype_vectors"]))
    assert not np.array_equal(np.asarray(state_l.params["last_layer"]),
                              np.asarray(s2.params["last_layer"]))

    ev = make_cls_eval_step(model, cfg)
    m = ev(s2, images, labels)
    assert 0 <= float(m["n_correct"]) <= 4


def test_classification_push():
    cfg = tiny_cls_cfg()
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(2)
    images = rng.rand(4, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=(4,))
    state = init_classifier_state(model, cfg, "warm",
                                  jax.random.PRNGKey(2),
                                  jnp.asarray(images))
    new_params, info = push_classification_prototypes(
        model, state, [(images, labels)])
    assert np.asarray(new_params["prototype_vectors"]).shape == (6, 16)
    # prototypes whose class appears in the batch must have been updated
    present = set(labels.tolist())
    pc = np.asarray(state.proto_class)
    for j in range(6):
        if pc[j] in present:
            assert np.isfinite(info["min_distances"][j])
            assert info["rf_boxes"][j, 0] >= 0


def test_classification_epoch_pipeline(tmp_path):
    from adlm_tpu.train.classification_pipeline import (
        run_classification_training)
    import dataclasses
    cfg = tiny_cls_cfg()
    cfg = dataclasses.replace(cfg, num_warm_epochs=1, push_start=2)
    rng = np.random.RandomState(9)
    images = rng.rand(8, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=(8,))

    def batches():
        for i in range(0, 8, 4):
            yield images[i:i + 4], labels[i:i + 4]

    state = run_classification_training(
        cfg, str(tmp_path), batches, batches, num_epochs=3,
        last_layer_iterations=1, push_every=1)
    from adlm_tpu.core.checkpoint import CheckpointStore
    store = CheckpointStore(str(tmp_path))
    assert store.exists("nopush", "last")
    # push happened at epoch 2
    logs = open(tmp_path / "logs" / "classification.log").read()
    assert "prototype push" in logs


@pytest.mark.slow
def test_cls_cli_train_and_prune(tmp_path, monkeypatch):
    """cls-train / cls-prune CLI over an image-folder layout
    (reference main.py:107-189 + root run_pruning.py:113-158)."""
    from PIL import Image
    from adlm_tpu.cli import main as cli_main

    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        for cname in ("alpha", "beta", "gamma"):
            d = tmp_path / split / cname
            d.mkdir(parents=True)
            for i in range(2):
                Image.fromarray(rng.randint(
                    0, 255, size=(40, 40, 3)).astype(np.uint8)).save(
                    d / f"{i}.png")
    monkeypatch.setenv("RESULTS_DIR", str(tmp_path / "runs"))

    cli_main(["cls-train", "clsrun", "--arch", "resnet18",
              "--img-size", "64", "--prototypes", "6",
              "--proto-channels", "8", "--batch-size", "2",
              "--test-batch-size", "2", "--push-batch-size", "2",
              "--epochs", "2", "--warm-epochs", "1",
              "--push-start", "1", "--push-every", "1",
              "--last-layer-iterations", "1",
              "--train-dir", str(tmp_path / "train"),
              "--test-dir", str(tmp_path / "test")])
    run_dir = tmp_path / "runs" / "clsrun"
    assert (run_dir / "cls_config.json").exists()
    from adlm_tpu.core.checkpoint import CheckpointStore
    store = CheckpointStore(str(run_dir))
    assert store.exists("nopush", "last")
    assert store.exists("push", "best")  # push happened at epoch 1

    cli_main(["cls-prune", str(run_dir),
              "--train-dir", str(tmp_path / "train"),
              "--test-dir", str(tmp_path / "test"),
              "--batch-size", "2", "--k", "2", "--threshold", "0",
              "--last-layer-iterations", "1"])
    assert store.exists("pruned", "last")
    payload = store.restore("pruned", "last")
    assert np.asarray(payload["proto_class"]).shape[0] <= 6


def test_image_folder_with_count_marks_wrapped_tail(tmp_path):
    """batches(with_count=True) reports the real image count on the
    wrap-padded tail batch; eval/k-nearest consumers use it to exclude
    duplicated images (reference-free correctness fix)."""
    from PIL import Image
    from adlm_tpu.data.image_folder import ImageFolderDataset

    rng = np.random.RandomState(3)
    d = tmp_path / "alpha"
    d.mkdir(parents=True)
    for i in range(5):
        Image.fromarray(rng.randint(0, 255, size=(8, 8, 3)).astype(
            np.uint8)).save(d / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path), img_size=8)

    plain = list(ds.batches(2))
    assert all(len(b) == 2 for b in plain)
    counted = list(ds.batches(2, with_count=True))
    assert [b[2] for b in counted] == [2, 2, 1]
    # wrapped slot duplicates image 0
    np.testing.assert_array_equal(counted[-1][0][1], counted[0][0][0])


def test_evaluate_excludes_wrapped_duplicates(tmp_path):
    """_evaluate over with_count batches counts each image exactly once."""
    from adlm_tpu.train.classification_pipeline import _evaluate

    cfg = tiny_cls_cfg()
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(4)
    images = rng.rand(3, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=(3,))
    state = init_classifier_state(model, cfg, "warm",
                                  jax.random.PRNGKey(4),
                                  jnp.asarray(images))
    ev = make_cls_eval_step(model, cfg)

    # batch_size 2 with wrap: [img0, img1], [img2, img0(dup)]
    wrapped = [(images[[0, 1]], labels[[0, 1]], 2),
               (np.stack([images[2], images[0]]),
                np.asarray([labels[2], labels[0]]), 1)]
    acc_masked = _evaluate(ev, state, wrapped)
    # ground truth: one batch of all 3 distinct images
    acc_direct = _evaluate(ev, state, [(images, labels, 3)])
    assert acc_masked == acc_direct


def test_push_ignores_wrap_padded_images():
    """A wrap-padded duplicate must never win the push argmin (its image
    index would point outside the dataset)."""
    cfg = tiny_cls_cfg()
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(5)
    images = rng.rand(4, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=(4,))
    state = init_classifier_state(model, cfg, "warm",
                                  jax.random.PRNGKey(5),
                                  jnp.asarray(images))

    _, info = push_classification_prototypes(
        model, state, [(images, labels, 4)])
    # same data with a wrapped second batch duplicating images 0-1:
    # results must be identical and indices must stay < 4
    batches = [(images, labels, 4),
               (images[[0, 1, 2, 3]], labels, 0)]
    _, info2 = push_classification_prototypes(model, state, batches)
    np.testing.assert_array_equal(info["rf_boxes"], info2["rf_boxes"])
    np.testing.assert_allclose(info["min_distances"],
                               info2["min_distances"])


def test_k_nearest_dedups_wrapped_tail():
    """find_k_nearest over a wrapped iterator equals the unwrapped one."""
    from adlm_tpu.train.classification import (
        find_k_nearest_patches_classification)

    cfg = tiny_cls_cfg()
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(6)
    images = rng.rand(3, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=(3,))
    state = init_classifier_state(model, cfg, "warm",
                                  jax.random.PRNGKey(6),
                                  jnp.asarray(images))

    direct = find_k_nearest_patches_classification(
        model, state, [(images, labels, 3)], k=2)
    wrapped = find_k_nearest_patches_classification(
        model, state,
        [(images[[0, 1]], labels[[0, 1]], 2),
         (np.stack([images[2], images[0]]),
          np.asarray([labels[2], labels[0]]), 1)], k=2)
    np.testing.assert_array_equal(direct, wrapped)


def test_cls_bf16_step_tracks_f32():
    """bf16 classification train step: loss close to f32, state dtypes
    stay f32 across steps (mirrors the ProtoSeg/U-Noise bf16 contract)."""
    cfg = tiny_cls_cfg()
    cfg_b = dataclasses.replace(cfg, compute_dtype="bfloat16")
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, size=(4,)))

    state = init_classifier_state(model, cfg, "joint",
                                  jax.random.PRNGKey(0), images)
    s_f32, m_f32 = make_cls_train_step(model, cfg, "joint")(
        state, images, labels)
    s_b16, m_b16 = make_cls_train_step(model, cfg_b, "joint")(
        state, images, labels)

    assert abs(float(m_f32["loss"]) - float(m_b16["loss"])) \
        < 0.05 * max(1.0, abs(float(m_f32["loss"])))
    for tree in (s_b16.params, s_b16.batch_stats):
        for leaf in jax.tree.leaves(tree):
            assert leaf.dtype != jnp.bfloat16
    # a second step consumes the first's state without dtype drift
    s3, m3 = make_cls_train_step(model, cfg_b, "joint")(
        s_b16, images, labels)
    assert np.isfinite(float(m3["loss"]))
