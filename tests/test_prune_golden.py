"""Pruning golden: k-nearest scan + purity prune vs the reference code.

A literal numpy/torch transcription of the reference's
``find_k_nearest_patches_to_prototypes`` (find_nearest.py:66-236:
per-image per-prototype min over the void-masked distance grid, patch
labelled target-class-if-present else pixel majority, a k-heap on
negative distance) and ``prune_prototypes``'s Counter threshold
(prune.py:36-42), run against the framework's jitted scan
(``find_k_nearest_patches``) and ``prune_by_purity`` on shared weights.
"""

import heapq

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from PIL import Image  # noqa: E402

import jax  # noqa: E402

from adlm_tpu.interpret.nearest import find_k_nearest_patches  # noqa: E402
from adlm_tpu.interpret.prune import prune_by_purity  # noqa: E402
from adlm_tpu.models.ppnet import default_proto_class  # noqa: E402

from test_train_step_golden import (  # noqa: E402
    N_CLASSES,
    N_PROTOS,
    _build_pair,
    _make_cfg,
    _random_labels,
)


def _reference_nearest(tp, proto_class, dataset, k):
    """find_nearest.py:66-236 with full_save=True label semantics,
    transcribed: one candidate per image per prototype, heap on
    negative distance, labels from the full-res patch box."""
    heaps = [[] for _ in range(N_PROTOS)]
    tp.eval()
    with torch.no_grad():
        for images, labels in dataset:
            xt = torch.tensor(np.transpose(images, (0, 3, 1, 2)))
            f = torch.sigmoid(tp.backbone(xt))
            d = tp._ref_l2(f, tp.prototype_vectors, tp.ones)
            dist = d[0].numpy().copy()               # (P, h, w)
            h, w = dist.shape[1], dist.shape[2]
            y = labels[0].astype(np.int64) - 1       # void → −1
            H, W = y.shape
            patch_h, patch_w = H / h, W / w
            # reference resize_label (dataset.py:23-31); PIL size=(w,h)
            gy = np.asarray(Image.fromarray(y.astype(float)).resize(
                (w, h), resample=Image.NEAREST))
            dist = dist + 10e6 * (gy == -1)[None]    # find_nearest.py:132
            for j in range(N_PROTOS):
                target = int(proto_class[j])
                jmin = float(np.amin(dist[j]))
                pi, pj = np.unravel_index(np.argmin(dist[j]),
                                          dist[j].shape)
                h0, h1 = int(pi * patch_h), int((pi + 1) * patch_h)
                w0, w1 = int(pj * patch_w), int((pj + 1) * patch_w)
                box = y[h0:h1, w0:w1]
                if np.any(box == target):            # :199-206
                    lab = target
                else:
                    vals, counts = np.unique(box, return_counts=True)
                    lab = int(vals[np.argmax(counts)])
                item = (-jmin, lab)                  # min-heap keeps the
                if len(heaps[j]) < k:                # k smallest dists
                    heapq.heappush(heaps[j], item)
                else:
                    heapq.heappushpop(heaps[j], item)
    ids = np.full((N_PROTOS, k), -2, np.int64)
    dists = np.full((N_PROTOS, k), np.inf)
    for j in range(N_PROTOS):
        heaps[j].sort()
        for i, (nd, lab) in enumerate(heaps[j][::-1]):  # nearest first
            ids[j, i] = lab
            dists[j, i] = -nd
    return ids, dists


def test_nearest_and_prune_golden_vs_reference():
    cfg = _make_cfg()
    model, params, constants, tp = _build_pair(cfg, seed=23)
    proto_class = default_proto_class(N_PROTOS, N_CLASSES)
    pc_np = np.asarray(proto_class)

    rng = np.random.RandomState(900)
    dataset = []
    for i in range(5):
        img = rng.rand(1, 33, 33, 3).astype(np.float32)
        lab = _random_labels(900 + i, B=1, void_frac=0.4)
        dataset.append((img, lab))

    k = 3
    ids_ref, dists_ref = _reference_nearest(tp, pc_np, dataset, k)

    ids, info = find_k_nearest_patches(model, params, constants,
                                       proto_class, dataset, N_CLASSES,
                                       k=k, return_info=True)
    np.testing.assert_allclose(info["distances"], dists_ref,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(ids, ids_ref)

    # prune threshold semantics (reference prune.py:36-42): prototype j
    # pruned iff fewer than `threshold` of its k nearest carry class j
    for threshold in (1, 2, 3):
        to_prune_ref = [j for j in range(N_PROTOS)
                        if int(np.sum(ids_ref[j] == pc_np[j])) < threshold]
        new_params, new_pc, prune_info = prune_by_purity(
            model, params, constants, proto_class, dataset, N_CLASSES,
            k=k, prune_threshold=threshold, log=lambda *_: None)
        assert sorted(prune_info[:, 0].tolist()) == to_prune_ref
        keep = [j for j in range(N_PROTOS) if j not in to_prune_ref]
        assert np.asarray(new_params["prototype_vectors"]).shape[0] == \
            len(keep)
        np.testing.assert_array_equal(np.asarray(new_pc), pc_np[keep])
        np.testing.assert_allclose(
            np.asarray(new_params["prototype_vectors"]),
            np.asarray(params["prototype_vectors"])[keep])
        # bookkeeping rows are [pruned_idx, class] like prune_info.npy
        np.testing.assert_array_equal(prune_info[:, 1],
                                      pc_np[to_prune_ref])
