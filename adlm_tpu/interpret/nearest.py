"""k-nearest patch scan per prototype (pruning front end).

Reference: ``find_k_nearest_patches_to_prototypes``
(reference find_nearest.py:66-342) — per image, per prototype: the
minimum distance over the void-masked distance grid; the patch is
labelled with the prototype's own class if any full-res pixel in the
patch box has it, otherwise the majority pixel class; a k-heap per
prototype keeps the smallest distances.

Here the per-image (min, argmin, patch label) is one jit call; the
host merges per-image results into running top-k arrays.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.ops.resize import resize_label_nearest

_VOID_PENALTY = 10e6  # reference find_nearest.py:132


def _nearest_one_image(d1: jnp.ndarray, y: jnp.ndarray,
                       proto_class: jnp.ndarray, num_classes: int):
    """Per-image (min_dist, patch_label, patch_i, patch_j), each (P,).

    ``d1`` is the (h, w, P) distance map, ``y`` the (H, W) label already
    shifted by −1 (void = −1, like the reference find_nearest.py:117).
    """
    h, w, P = d1.shape
    grid_y = resize_label_nearest(y, (h, w))        # (h, w)
    # penalize void patches (reference adds 10e6, find_nearest.py:132)
    masked = d1 + _VOID_PENALTY * (grid_y == -1)[:, :, None]
    flat = masked.reshape(h * w, P)
    arg = jnp.argmin(flat, axis=0)
    mind = jnp.take_along_axis(flat, arg[None, :], axis=0)[0]
    pi, pj = arg // w, arg % w

    # label the winning patch from the full-res pixel box; integer
    # math equals the reference's int(i * (H/h)) for all shipped
    # shapes (see tests)
    H, W = y.shape
    h0 = (pi * H) // h
    h1 = ((pi + 1) * H) // h
    w0 = (pj * W) // w
    w1 = ((pj + 1) * W) // w

    max_ph = -(-H // h) + 1
    max_pw = -(-W // w) + 1

    def label_one(h0i, h1i, w0i, w1i, target):
        rows = h0i + jnp.arange(max_ph)
        cols = w0i + jnp.arange(max_pw)
        valid = ((rows < h1i) & (rows < H))[:, None] & \
                ((cols < w1i) & (cols < W))[None, :]
        patch = y[jnp.clip(rows, 0, H - 1)[:, None],
                  jnp.clip(cols, 0, W - 1)[None, :]]
        has_target = jnp.any(valid & (patch == target))
        # majority class among pixels in the box (incl. void −1,
        # reference find_nearest.py:204-206 counts raw values)
        counts = jnp.zeros((num_classes + 1,), jnp.int32).at[
            jnp.clip(patch + 1, 0, num_classes)].add(
            valid.astype(jnp.int32))
        majority = jnp.argmax(counts) - 1
        return jnp.where(has_target, target, majority)

    labels = jax.vmap(label_one)(h0, h1, w0, w1, proto_class)
    return mind, labels, pi, pj


def make_nearest_batch_fn(model: PPNet, num_classes: int) -> Callable:
    """(params, constants, proto_class, image(1,H,W,3), label(1,H,W))
    → (min_dist (P,), patch_label (P,), patch_i (P,), patch_j (P,)).

    ``label`` is raw (void = 0, class c = c+1); internally shifted by −1
    like the reference (find_nearest.py:117).
    """

    @jax.jit
    def fn(params, constants, proto_class, image, label):
        variables = {"params": params, "constants": constants}
        _, d = model.apply(variables, image, method=PPNet.push_forward)
        y = label[0].astype(jnp.int32) - 1          # void → −1
        return _nearest_one_image(d[0], y, proto_class, num_classes)

    return fn


def make_nearest_batched_fn(model: PPNet, num_classes: int,
                            normalize=None) -> Callable:
    """Batched k-nearest scan step: (params, constants, proto_class,
    images (B,H,W,3), labels (B,H,W)) → per-image (min_dist (B,P),
    patch_label (B,P), patch_i (B,P), patch_j (B,P)).

    ONE batched forward (the scan's cost is the forward — the
    reference's loop is strictly per-image, find_nearest.py:104) and a
    vmapped per-image argmin + box labelling; the host merges per-image
    results in dataset order, so heap tie semantics match the
    sequential scan exactly.

    ``normalize=(mean, std)`` moves input normalization INTO the jit so
    images ship as raw uint8 (4× less transfer — the scan is
    transfer-bound through the remote relay, PERF.md), ulp-equivalent
    to the host-normalized path.
    """
    from adlm_tpu.ops.normalize import normalize_in_jit

    @jax.jit
    def fn(params, constants, proto_class, images, labels):
        images = normalize_in_jit(images, normalize)
        variables = {"params": params, "constants": constants}
        _, d = model.apply(variables, images, method=PPNet.push_forward)
        ys = labels.astype(jnp.int32) - 1
        return jax.vmap(
            lambda d1, y: _nearest_one_image(d1, y, proto_class,
                                             num_classes))(d, ys)

    return fn


def find_k_nearest_patches(
    model: PPNet,
    params: Any,
    constants: Any,
    proto_class: jnp.ndarray,
    dataset: Iterable[Tuple[np.ndarray, np.ndarray]],
    num_classes: int,
    k: int = 6,
    return_info: bool = False,
    batch_size: int = 1,
    raw_normalize=None,
):
    """(P, k) class ids of each prototype's k nearest patches.

    With ``return_info=True`` also returns a dict of (P, k) arrays
    {distances, image_idx, patch_i, patch_j} sorted nearest-first,
    enabling a second pass that writes the artifact set without holding
    activation maps for every candidate in RAM (the reference keeps
    whole heatmaps in its heaps — find_nearest.py:209 "TODO this takes
    lots of RAM").

    ``batch_size`` > 1 forwards several images per jit call (the final
    partial batch pads with the first image of the batch and drops the
    padded results); the host merge walks images in dataset order, so
    selection — including heap tie semantics — matches the sequential
    scan (distances can differ by conv batch-tiling ulps).

    ``raw_normalize=(mean, std)`` selects the raw-uint8 transfer path
    (batched only): the dataset yields uint8 images and the full
    (x/255 − mean)/std preprocessing runs inside the jit.
    """
    if raw_normalize is not None and batch_size <= 1:
        raise ValueError("raw_normalize requires batch_size > 1")
    P = int(np.asarray(params["prototype_vectors"]).shape[0])
    top_d = np.full((P, k), np.inf)
    top_l = np.full((P, k), -1, dtype=np.int64)
    top_img = np.full((P, k), -1, dtype=np.int64)
    top_pi = np.full((P, k), -1, dtype=np.int64)
    top_pj = np.full((P, k), -1, dtype=np.int64)

    def merge(img_idx, mind, labels, pi, pj):
        # merge into running top-k (heap semantics: strictly smaller
        # replaces the current maximum)
        worst = top_d.max(axis=1)
        improved = mind < worst
        for j in np.where(improved)[0]:
            slot = int(np.argmax(top_d[j]))
            top_d[j, slot] = mind[j]
            top_l[j, slot] = labels[j]
            top_img[j, slot] = img_idx
            top_pi[j, slot] = pi[j]
            top_pj[j, slot] = pj[j]

    if batch_size > 1:
        fn = make_nearest_batched_fn(model, num_classes,
                                     normalize=raw_normalize)
        buf: list = []
        # one batch in flight: the next batch's async upload + compute
        # overlap the current batch's host merge (PERF.md)
        inflight: list = []

        def drain():
            if not inflight:
                return
            ids_, n_real, outs = inflight.pop()
            mind, labs, pi, pj = (np.asarray(o) for o in outs)
            for b in range(n_real):            # dataset order preserved
                merge(ids_[b], mind[b], labs[b], pi[b], pj[b])

        def flush():
            if not buf:
                return
            n_real = len(buf)
            while len(buf) < batch_size:       # pad to a fixed shape
                buf.append(buf[0])
            images = np.concatenate([b[1] for b in buf])
            labels = np.concatenate([b[2] for b in buf])
            outs = fn(params, constants, proto_class,
                      jnp.asarray(images), jnp.asarray(labels))
            ids_ = [b[0] for b in buf]
            buf.clear()
            drain()
            inflight.append((ids_, n_real, outs))

        for img_idx, (image, label) in enumerate(dataset):
            if buf and np.asarray(image).shape != buf[0][1].shape:
                flush()                        # ragged shapes: new batch
            buf.append((img_idx, np.asarray(image), np.asarray(label)))
            if len(buf) == batch_size:
                flush()
        flush()
        drain()
    else:
        fn = make_nearest_batch_fn(model, num_classes)
        for img_idx, (image, label) in enumerate(dataset):
            mind, labels, pi, pj = fn(params, constants, proto_class,
                                      jnp.asarray(image),
                                      jnp.asarray(label))
            merge(img_idx, np.asarray(mind), np.asarray(labels),
                  np.asarray(pi), np.asarray(pj))

    order = np.argsort(top_d, axis=1)
    ids = np.take_along_axis(top_l, order, axis=1)
    if not return_info:
        return ids
    info = {
        "distances": np.take_along_axis(top_d, order, axis=1),
        "image_idx": np.take_along_axis(top_img, order, axis=1),
        "patch_i": np.take_along_axis(top_pi, order, axis=1),
        "patch_j": np.take_along_axis(top_pj, order, axis=1),
    }
    return ids, info


def save_nearest_artifacts(
    model: PPNet,
    params: Any,
    constants: Any,
    proto_class: jnp.ndarray,
    get_item,  # index -> (image (1,H,W,3), label (1,H,W))
    ids: np.ndarray,
    info: dict,
    out_dir: str,
    raw_image_fn=None,  # index -> (H,W,3) [0,1] image for rendering
    denorm=None,  # normalized (H,W,3) -> [0,1] image (cfg-aware)
) -> None:
    """Second pass: re-forward only winner images and write the artifact
    set per (prototype, rank): original + patch bbox + heatmap overlay +
    high-activation crop + class_id.npy (reference find_nearest.py:236-337).
    """
    import os
    from adlm_tpu.interpret import visualize as vz
    from adlm_tpu.ops.prototype import distance_to_similarity

    P, k = ids.shape
    # group winners by image so each image is forwarded once, and keep
    # ONLY the (h, w) activation slices that won — caching full (h,w,P)
    # maps for every winner image would cost gigabytes at Cityscapes
    # scale (the reference's in-heap heatmaps have the same problem,
    # find_nearest.py:209)
    protos_by_image: dict = {}
    for j in range(P):
        for rank in range(k):
            idx = int(info["image_idx"][j, rank])
            if idx >= 0:
                protos_by_image.setdefault(idx, set()).add(j)
    act_cache = {}   # (image_idx, proto_j) -> (h, w) activation
    img_cache = {}
    for idx, js in sorted(protos_by_image.items()):
        image, label = get_item(idx)
        _, d = model.apply({"params": params, "constants": constants},
                           jnp.asarray(image), method=PPNet.push_forward)
        js_arr = sorted(js)
        acts = np.asarray(distance_to_similarity(
            d[0][:, :, np.asarray(js_arr)],
            model.cfg.prototype_activation, model.cfg.epsilon))
        for pos, j in enumerate(js_arr):
            act_cache[(idx, j)] = acts[:, :, pos]
        if raw_image_fn is not None:
            img_cache[idx] = raw_image_fn(idx)
        else:
            from adlm_tpu.interpret.analysis import _denorm
            img_cache[idx] = (denorm or _denorm)(np.asarray(image[0]))

    for j in range(P):
        d = os.path.join(out_dir, str(j))
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "class_id.npy"), ids[j])
        for rank in range(k):
            idx = int(info["image_idx"][j, rank])
            if idx < 0:
                continue
            img = img_cache[idx]
            act = act_cache[(idx, j)]
            H, W = img.shape[0], img.shape[1]
            h, w = act.shape
            pi, pj = int(info["patch_i"][j, rank]), int(
                info["patch_j"][j, rank])
            box = ((pi * H) // h, ((pi + 1) * H) // h,
                   (pj * W) // w, ((pj + 1) * W) // w)
            label_id = int(ids[j, rank])
            act_up = vz.upsample_cubic(act, (H, W))
            norm = vz.normalize01(act_up)
            prefix = os.path.join(d, f"nearest-{rank + 1}")
            np.save(prefix + "_act.npy", act)
            vz._save(prefix + f"_original_{label_id}.png", img)
            vz._save(prefix + f"_original_with_patch_{label_id}.png",
                     vz._draw_box(img, box, color=(0.0, 1.0, 1.0)))
            overlay = vz._overlay(img, norm)
            vz._save(prefix + f"_original_with_heatmap_{label_id}.png",
                     overlay)
            vz._save(
                prefix + f"_original_with_heatmap_and_patch_{label_id}.png",
                vz._draw_box(overlay, box, color=(0.0, 1.0, 1.0)))
            crop = vz.high_activation_crop(act_up)
            np.save(prefix + f"_high_act_patch_indices_{label_id}.npy",
                    np.asarray(crop))
            vz._save(prefix + f"_high_act_patch_{label_id}.png",
                     img[crop[0]:crop[1], crop[2]:crop[3]])
    np.save(os.path.join(out_dir, "full_class_id.npy"), ids)
