"""Interpretability tests: push/nearest/prune/eval vs reference semantics."""

import os
import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adlm_tpu.core.config import DataConfig, ExperimentConfig, PPNetConfig, TrainConfig
from adlm_tpu.models.ppnet import PPNet, default_proto_class
from adlm_tpu.interpret.push import (
    make_push_batch_fn,
    patch_class_eligibility,
    push_prototypes,
)
from adlm_tpu.interpret.nearest import find_k_nearest_patches
from adlm_tpu.interpret.prune import prune_by_purity
from adlm_tpu.interpret.evaluate import SegEvaluator, mean_iou_from_confusion
from adlm_tpu.interpret.visualize import (
    grow_high_activation_box,
    high_activation_crop,
)


def _load_reference_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def tiny_cfg(num_classes=3, num_protos=6):
    return PPNetConfig(num_prototypes=num_protos, num_classes=num_classes,
                       prototype_channels=8, deeplab_n_features=8,
                       deeplab_n_blocks=(1, 1, 1, 1), img_size=33)


def _reference_eligibility(label, grid_hw, num_classes):
    """Literal numpy re-implementation of the reference dict build
    (reference segmentation/push.py:214-230)."""
    H, W = label.shape
    h, w = grid_hw
    ph, pw = H / h, W / w
    d = {c: set() for c in range(num_classes)}
    for i in range(H):
        pi = int(i / ph)
        for j in range(W):
            pj = int(j / pw)
            c = int(label[i, j])
            if c > 0:
                d[c - 1].add((pi, pj))
    elig = np.zeros((h, w, num_classes), bool)
    for c, patches in d.items():
        for (pi, pj) in patches:
            elig[pi, pj, c] = True
    return elig


def test_patch_class_eligibility_matches_reference_loop():
    rng = np.random.RandomState(0)
    label = rng.randint(0, 4, size=(33, 47))
    got = np.asarray(patch_class_eligibility(jnp.asarray(label), (5, 7), 3))
    expected = _reference_eligibility(label, (5, 7), 3)
    np.testing.assert_array_equal(got, expected)


def test_patch_class_bits_matches_scatter_formulation():
    """The scatter-free bit-pooled eligibility (OR over statically
    unrolled block takes) must equal the direct scatter-max over
    pixels at awkward non-divisible grid ratios, batched and not."""
    from adlm_tpu.interpret.push import patch_class_bits

    rng = np.random.RandomState(1)
    for shape, grid, C in [((67, 41), (9, 6), 5), ((64, 33), (64, 33), 3),
                           ((129, 257), (17, 33), 19)]:
        label = rng.randint(0, C + 1, size=shape)
        want = _reference_eligibility(label, grid, C)
        bits = np.asarray(patch_class_bits(jnp.asarray(label), grid, C))
        got = ((bits[..., None] >> np.arange(C)) & 1).astype(bool)
        np.testing.assert_array_equal(got, want)
    # batched leading dim
    labels = rng.randint(0, 4, size=(3, 50, 70))
    bits = np.asarray(patch_class_bits(jnp.asarray(labels), (7, 9), 3))
    for b in range(3):
        want = _reference_eligibility(labels[b], (7, 9), 3)
        got = ((bits[b][..., None] >> np.arange(3)) & 1).astype(bool)
        np.testing.assert_array_equal(got, want)


def _make_model_and_data(seed=0, n_imgs=3, num_classes=3, num_protos=6):
    cfg = tiny_cfg(num_classes, num_protos)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(seed)
    H = W = 33
    images = [rng.rand(1, H, W, 3).astype(np.float32) for _ in range(n_imgs)]
    labels = [rng.randint(0, num_classes + 1, size=(1, H, W)).astype(np.int32)
              for _ in range(n_imgs)]
    v = model.init(jax.random.PRNGKey(seed), images[0])
    pc = default_proto_class(num_protos, num_classes)
    return model, v["params"], v.get("constants", {}), pc, images, labels


def _reference_push_simulation(model, params, constants, pc, images, labels,
                               num_classes):
    """Replicates the reference push scan (segmentation/push.py:101-280)
    in numpy, using the model's own forward outputs."""
    P = np.asarray(params["prototype_vectors"]).shape[0]
    gmin = np.full(P, np.inf)
    gfmap = np.zeros((P, np.asarray(params["prototype_vectors"]).shape[1]))
    winners = np.full(P, -1)
    for idx, (img, lab) in enumerate(zip(images, labels)):
        f, d = model.apply({"params": params, "constants": constants},
                           jnp.asarray(img), method=PPNet.push_forward)
        f = np.asarray(f[0])
        d = np.asarray(d[0])
        h, w = d.shape[0], d.shape[1]
        elig = _reference_eligibility(lab[0], (h, w), num_classes)
        for j in range(P):
            c = int(pc[j])
            idxs = np.argwhere(elig[:, :, c])
            if len(idxs) == 0:
                continue
            dists = d[idxs[:, 0], idxs[:, 1], j]
            a = int(np.argmin(dists))
            if dists[a] < gmin[j]:
                gmin[j] = dists[a]
                gfmap[j] = f[idxs[a, 0], idxs[a, 1]]
                winners[j] = idx
    return gmin, gfmap, winners


def test_push_matches_reference_scan():
    model, params, constants, pc, images, labels = _make_model_and_data()
    ref_min, ref_fmap, ref_winners = _reference_push_simulation(
        model, params, constants, pc, images, labels, 3)

    new_params, new_pc, info = push_prototypes(
        model, params, constants, pc, list(zip(images, labels)), 3,
        dedup=False, log=lambda *_: None)

    np.testing.assert_allclose(info["min_distances"], ref_min,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_params["prototype_vectors"]), ref_fmap,
        rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(info["proto_rf_boxes"][:, 0], ref_winners)


def test_push_dedup_prunes_duplicates():
    # two prototypes of the same class converge to the same patch →
    # identical vectors → dedup keeps one (reference push.py:148-155)
    model, params, constants, pc, images, labels = _make_model_and_data(
        seed=3, n_imgs=2)
    new_params, new_pc, info = push_prototypes(
        model, params, constants, pc, list(zip(images, labels)), 3,
        dedup=True, log=lambda *_: None)
    P_new = np.asarray(new_params["prototype_vectors"]).shape[0]
    assert P_new == len(info["unique_index"])
    assert np.asarray(new_params["last_layer"]).shape[0] == P_new
    # every kept vector unique
    vecs = np.asarray(new_params["prototype_vectors"])
    assert len(np.unique(vecs, axis=0)) == P_new


def test_find_k_nearest_and_prune():
    model, params, constants, pc, images, labels = _make_model_and_data(
        seed=4, n_imgs=4)
    ids = find_k_nearest_patches(model, params, constants, pc,
                                 list(zip(images, labels)), 3, k=3)
    assert ids.shape == (6, 3)
    assert ids.min() >= -1 and ids.max() < 3

    new_params, new_pc, prune_info = prune_by_purity(
        model, params, constants, pc, list(zip(images, labels)), 3,
        k=3, prune_threshold=0, log=lambda *_: None)
    # threshold 0 prunes nothing
    assert np.asarray(new_params["prototype_vectors"]).shape[0] == 6
    assert prune_info.shape[1] == 2


def test_find_k_nearest_batched_matches_sequential():
    """batch_size > 1 (one batched forward + ordered host merge) must
    reproduce the sequential scan exactly — including the padded final
    partial batch and heap tie semantics — and handle ragged shapes by
    flushing."""
    model, params, constants, pc, images, labels = _make_model_and_data(
        seed=7, n_imgs=5)
    data = list(zip(images, labels))
    seq_ids, seq_info = find_k_nearest_patches(
        model, params, constants, pc, data, 3, k=3, return_info=True)
    bat_ids, bat_info = find_k_nearest_patches(
        model, params, constants, pc, data, 3, k=3, return_info=True,
        batch_size=2)  # 5 images → 2+2+1(padded)
    np.testing.assert_array_equal(seq_ids, bat_ids)
    for key in ("image_idx", "patch_i", "patch_j"):
        np.testing.assert_array_equal(seq_info[key], bat_info[key])
    # conv outputs differ by ulps across batch sizes (XLA batch tiling),
    # so distances are close, not bit-equal
    np.testing.assert_allclose(seq_info["distances"],
                               bat_info["distances"], rtol=1e-5)

    # ragged shapes force a flush mid-stream and still match
    rng = np.random.RandomState(11)
    small = (rng.rand(1, 17, 17, 3).astype(np.float32),
             rng.randint(0, 4, size=(1, 17, 17)).astype(np.int32))
    ragged = data[:2] + [small] + data[2:]
    seq2 = find_k_nearest_patches(model, params, constants, pc, ragged,
                                  3, k=3)
    bat2 = find_k_nearest_patches(model, params, constants, pc, ragged,
                                  3, k=3, batch_size=3)
    np.testing.assert_array_equal(seq2, bat2)


def test_find_k_nearest_raw_uint8_matches_f32():
    """raw_normalize (uint8 in, (x/255−mean)/std in-jit) must match the
    host-normalized f32 scan — same selection, close distances."""
    model, params, constants, pc, _, labels = _make_model_and_data(
        seed=8, n_imgs=3)
    rng = np.random.RandomState(13)
    mean, std = (0.4, 0.5, 0.45), (0.2, 0.25, 0.3)
    raws = [rng.randint(0, 255, size=(1, 33, 33, 3), dtype=np.uint8)
            for _ in range(3)]
    f32s = [((r.astype(np.float32) / 255.0 - np.asarray(mean, np.float32))
             / np.asarray(std, np.float32)) for r in raws]
    ids_f32, info_f32 = find_k_nearest_patches(
        model, params, constants, pc, list(zip(f32s, labels)), 3, k=3,
        return_info=True, batch_size=2)
    ids_raw, info_raw = find_k_nearest_patches(
        model, params, constants, pc, list(zip(raws, labels)), 3, k=3,
        return_info=True, batch_size=2, raw_normalize=(mean, std))
    np.testing.assert_array_equal(ids_f32, ids_raw)
    for key in ("image_idx", "patch_i", "patch_j"):
        np.testing.assert_array_equal(info_f32[key], info_raw[key])
    np.testing.assert_allclose(info_f32["distances"],
                               info_raw["distances"], rtol=1e-4)


def test_nearest_majority_label_semantics():
    """Patch label = target class if present else pixel majority
    (reference find_nearest.py:199-206)."""
    from adlm_tpu.interpret.nearest import make_nearest_batch_fn
    model, params, constants, pc, images, labels = _make_model_and_data(
        seed=5, n_imgs=1)
    fn = make_nearest_batch_fn(model, 3)
    mind, lab, pi, pj = fn(params, constants, pc, jnp.asarray(images[0]),
                           jnp.asarray(labels[0]))
    assert lab.shape == (6,)
    assert int(lab.min()) >= -1 and int(lab.max()) < 3
    assert pi.shape == (6,) and pj.shape == (6,)


def test_evaluator_miou_matches_manual():
    model, params, constants, pc, images, labels = _make_model_and_data(
        seed=6, n_imgs=2)
    ev = SegEvaluator(model, 3)
    for img, lab in zip(images, labels):
        out = ev.update(params, constants, pc, img, lab)
    res = ev.results()

    # manual accumulation replicating reference counters
    # (eval_valid.py:178-189)
    from adlm_tpu.ops.resize import resize_bilinear
    I = np.zeros(3, np.int64)
    U = np.zeros(3, np.int64)
    correct = total = 0
    for img, lab in zip(images, labels):
        logits, _ = model.apply({"params": params, "constants": constants},
                                jnp.asarray(img), train=False)
        up = np.asarray(resize_bilinear(logits, lab.shape[1:]))
        pred = np.argmax(up, -1)[0]
        ann = lab[0]
        correct += np.sum(((pred + 1) == ann) & (ann != 0))
        total += np.sum(ann != 0)
        for c in range(3):
            pr = pred == c
            gt = ann == c + 1
            I[c] += np.sum(pr & gt)
            U[c] += np.sum((pr | gt) & (ann != 0))
    miou_manual, _ = mean_iou_from_confusion(I, U)
    np.testing.assert_allclose(res["mean_iou"], miou_manual, rtol=1e-5)
    np.testing.assert_allclose(res["pixel_accuracy"],
                               correct * 100.0 / total, rtol=1e-5)


def test_grow_box_matches_reference_helper():
    ref = _load_reference_module("ref_helpers", "/root/reference/helpers.py")
    rng = np.random.RandomState(7)
    act = rng.rand(40, 50)
    for seed_box in [(10, 13, 20, 23), (0, 3, 0, 3), (37, 40, 47, 50)]:
        thr = np.percentile(act, 95)
        ours = grow_high_activation_box(act, seed_box, thr)
        theirs = ref.find_continuous_high_activation_crop(
            act, list(seed_box), thr)
        assert ours == tuple(theirs), (seed_box, ours, theirs)


def test_high_activation_crop_matches_reference_helper():
    ref = _load_reference_module("ref_helpers2", "/root/reference/helpers.py")
    rng = np.random.RandomState(8)
    act = rng.rand(30, 30)
    ours = high_activation_crop(act, 95)
    theirs = ref.find_high_activation_crop(act, 95)
    assert ours == tuple(theirs)


def test_batched_push_matches_sequential():
    """Batched (shardable) push must equal the sequential scan exactly,
    including winner image indices (earliest-image tie-break)."""
    model, params, constants, pc, images, labels = _make_model_and_data(
        seed=7, n_imgs=4)
    seq_params, seq_pc, seq_info = push_prototypes(
        model, params, constants, pc, list(zip(images, labels)), 3,
        dedup=False, log=lambda *_: None)
    bat_params, bat_pc, bat_info = push_prototypes(
        model, params, constants, pc, list(zip(images, labels)), 3,
        dedup=False, batch_size=2, log=lambda *_: None)
    np.testing.assert_allclose(bat_info["min_distances"],
                               seq_info["min_distances"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bat_params["prototype_vectors"]),
        np.asarray(seq_params["prototype_vectors"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(bat_info["proto_rf_boxes"],
                                  seq_info["proto_rf_boxes"])


def test_batched_push_partial_batch_and_padding():
    """batch_size=3 over 4 images exercises the padded trailing flush."""
    model, params, constants, pc, images, labels = _make_model_and_data(
        seed=8, n_imgs=4)
    seq = push_prototypes(model, params, constants, pc,
                          list(zip(images, labels)), 3, dedup=False,
                          log=lambda *_: None)
    bat = push_prototypes(model, params, constants, pc,
                          list(zip(images, labels)), 3, dedup=False,
                          batch_size=3, log=lambda *_: None)
    np.testing.assert_allclose(bat[2]["min_distances"],
                               seq[2]["min_distances"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(bat[2]["proto_rf_boxes"],
                                  seq[2]["proto_rf_boxes"])


def test_push_never_eligible_class_keeps_trained_vector():
    """A class absent from the push set must keep its trained prototype
    vectors (the 1e30 masked-distance sentinel must not count as seen)."""
    model, params, constants, pc, images, labels = _make_model_and_data(
        seed=9, n_imgs=2)
    # wipe class 2 from every label (raw value 3)
    labels = [np.where(lab == 3, 0, lab) for lab in labels]
    for bs in (1, 2):
        new_params, _, info = push_prototypes(
            model, params, constants, pc, list(zip(images, labels)), 3,
            dedup=False, batch_size=bs, log=lambda *_: None)
        old = np.asarray(params["prototype_vectors"])
        new = np.asarray(new_params["prototype_vectors"])
        # prototypes of class 2 (indices 4, 5) untouched
        np.testing.assert_array_equal(new[4:], old[4:])
        assert (info["proto_rf_boxes"][4:, 0] == -1).all()
        # other prototypes did update
        assert not np.array_equal(new[:4], old[:4])


def test_batched_push_visualizations_match_sequential(tmp_path):
    """Batched push + two-pass artifact rendering emits the identical
    bb.npy / PNG set to the batch=1 path (fast scan and artifacts are
    no longer mutually exclusive)."""
    model, params, constants, pc, images, labels = _make_model_and_data(
        seed=9, n_imgs=4)
    data = list(zip(images, labels))
    seq_dir = tmp_path / "seq"
    bat_dir = tmp_path / "bat"
    seq = push_prototypes(model, params, constants, pc, data, 3,
                          dedup=False, run_dir=str(seq_dir),
                          save_visualizations=True, log=lambda *_: None)
    bat = push_prototypes(model, params, constants, pc, data, 3,
                          dedup=False, batch_size=2,
                          run_dir=str(bat_dir), save_visualizations=True,
                          get_item=lambda i: data[i], log=lambda *_: None)
    np.testing.assert_array_equal(bat[2]["proto_bound_boxes"],
                                  seq[2]["proto_bound_boxes"])
    def tree(root):
        return sorted(os.path.relpath(os.path.join(d, f), root)
                      for d, _, fs in os.walk(root) for f in fs)

    seq_files = tree(seq_dir)
    bat_files = tree(bat_dir)
    assert seq_files == bat_files
    assert any(f.endswith(".png") for f in seq_files)
    np.testing.assert_array_equal(np.load(seq_dir / "bb.npy"),
                                  np.load(bat_dir / "bb.npy"))


def test_batched_push_visualizations_require_get_item(tmp_path):
    model, params, constants, pc, images, labels = _make_model_and_data(
        seed=10, n_imgs=2)
    with pytest.raises(ValueError):
        push_prototypes(model, params, constants, pc,
                        list(zip(images, labels)), 3, batch_size=2,
                        run_dir=str(tmp_path), save_visualizations=True,
                        log=lambda *_: None)


def test_batched_push_raw_uint8_matches_f32():
    """Raw-uint8 items + the FULL in-jit (x/255 − mean)/std
    (raw_uint8=True) must match the batched push over host-normalized
    f32 items — the exact host sequence of
    ``SegmentationDataset.get_eval_item`` and the reference's own push
    normalization (segmentation/push.py:187) — to fp ulp level (XLA may
    fuse the division differently, e.g. reciprocal-multiply)."""
    model, _, _, pc, _, labels = _make_model_and_data(seed=11, n_imgs=4)
    rng = np.random.RandomState(11)
    mean = np.asarray((0.485, 0.456, 0.406), np.float32)
    std = np.asarray((0.229, 0.224, 0.225), np.float32)
    raws = [rng.randint(0, 256, size=(1, 33, 33, 3)).astype(np.uint8)
            for _ in range(4)]
    f32s = [(r.astype(np.float32) / 255.0 - mean) / std for r in raws]
    v = model.init(jax.random.PRNGKey(11), f32s[0])
    params, constants = v["params"], v.get("constants", {})

    a = push_prototypes(model, params, constants, pc,
                        list(zip(f32s, labels)), 3, dedup=False,
                        batch_size=2, log=lambda *_: None)
    b = push_prototypes(model, params, constants, pc,
                        list(zip(raws, labels)), 3, dedup=False,
                        batch_size=2, raw_uint8=True,
                        raw_normalize=(tuple(mean), tuple(std)),
                        log=lambda *_: None)
    np.testing.assert_allclose(a[2]["min_distances"],
                               b[2]["min_distances"], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(a[0]["prototype_vectors"]),
        np.asarray(b[0]["prototype_vectors"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(a[2]["proto_rf_boxes"],
                                  b[2]["proto_rf_boxes"])

    with np.testing.assert_raises(ValueError):
        push_prototypes(model, params, constants, pc,
                        list(zip(raws, labels)), 3, raw_uint8=True,
                        log=lambda *_: None)  # needs batch_size > 1
    with np.testing.assert_raises(ValueError):
        push_prototypes(model, params, constants, pc,
                        list(zip(raws, labels)), 3, raw_uint8=True,
                        batch_size=2,
                        log=lambda *_: None)  # needs raw_normalize=
