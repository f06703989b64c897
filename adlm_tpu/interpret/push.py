"""Prototype push: device-side masked argmin over the dataset.

The reference's push walks ~3k images sequentially, builds a
pixel→patch class dict with a Python double loop over 1024×2048 pixels,
and scans prototypes per image on the CPU (reference
segmentation/push.py:101-280 — its #3 hot spot).  Here, per image:

* the forward pass, patch-class eligibility (a scatter-max over the
  full-res label grid), the per-prototype masked (min, argmin) over
  patches, and the winning feature-patch gather all run in ONE jit call;
* only (P,)-sized results cross back to the host, which keeps the
  running global minimum exactly like the reference (strict ``<`` —
  earlier images win ties, matching the sequential scan).

Semantics parity notes:

* a patch is eligible for prototype j iff it contains ≥1 full-res pixel
  of j's class (reference push.py:216-230); pixel→patch index uses
  integer math ``(p·h)//H``, verified equal to the reference's
  ``int(p / (H/h))`` for all shipped resolutions.
* after the scan, winning patches overwrite the prototype vectors and
  duplicate prototypes are pruned keeping the first occurrence
  (reference push.py:143-155, np.unique semantics).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core.config import ExperimentConfig
from adlm_tpu.models.ppnet import PPNet, prune_params
from adlm_tpu.ops.normalize import normalize_in_jit

_INF = jnp.float32(1e30)


def patch_class_bits(label: jnp.ndarray, grid_hw: Tuple[int, int],
                     num_classes: int) -> jnp.ndarray:
    """(..., h, w) int32 bitmask: bit c set ⇔ class c has ≥1 pixel in
    patch (i, j).  ``label`` is (..., H, W) raw full-res annotation
    where 0 = void/background and class c occupies value c+1
    (reference push.py:216-223).

    Scatter-free: the obvious ``.at[pixel→patch].max`` scatter costs
    ~180 ms/batch at the flagship shape (16.7M scattered updates —
    TPU scatters serialize); instead pack each pixel's class into an
    int32 bit and OR-pool over the (statically known, variable-size)
    pixel blocks with an unrolled chain of row/column takes — measured
    free next to the push forward.  Requires ``num_classes ≤ 31``.
    """
    if num_classes > 31:
        raise ValueError("bit-packed eligibility supports ≤31 classes; "
                         f"got {num_classes}")
    H, W = label.shape[-2], label.shape[-1]
    h, w = grid_hw
    cls = jnp.clip(label.astype(jnp.int32) - 1, 0, num_classes - 1)
    bits = jnp.where(label > 0, jnp.left_shift(jnp.int32(1), cls), 0)
    # pixel-row → grid-row block boundaries are trace-time constants
    pi = (np.arange(H) * h) // H
    pj = (np.arange(W) * w) // W
    starts_i = np.searchsorted(pi, np.arange(h))
    ends_i = np.searchsorted(pi, np.arange(h), side="right")
    starts_j = np.searchsorted(pj, np.arange(w))
    ends_j = np.searchsorted(pj, np.arange(w), side="right")
    y = jnp.zeros(bits.shape[:-2] + (h, W), jnp.int32)
    for k in range(int((ends_i - starts_i).max())):
        idx = np.minimum(starts_i + k, ends_i - 1)
        y = y | bits[..., idx, :]
    e = jnp.zeros(bits.shape[:-2] + (h, w), jnp.int32)
    for k in range(int((ends_j - starts_j).max())):
        idx = np.minimum(starts_j + k, ends_j - 1)
        e = e | y[..., :, idx]
    return e


def patch_class_eligibility(label: jnp.ndarray, grid_hw: Tuple[int, int],
                            num_classes: int) -> jnp.ndarray:
    """(h, w, C) bool: class c has ≥1 pixel in patch (i, j)
    (unpacked view of ``patch_class_bits``)."""
    bits = patch_class_bits(label, grid_hw, num_classes)
    c = jnp.arange(num_classes, dtype=jnp.int32)
    return jnp.bitwise_and(jnp.right_shift(bits[..., None], c), 1) > 0


def make_push_batch_fn(model: PPNet, num_classes: int) -> Callable:
    """jitted fn: (params, constants, proto_class, image(1,H,W,3),
    label(1,H,W)) → (min_dist (P,), patch_i (P,), patch_j (P,),
    fmap_patch (P,C), distances (1,h,w,P))."""

    @jax.jit
    def fn(params, constants, proto_class, image, label):
        variables = {"params": params, "constants": constants}
        f, d = model.apply(variables, image, method=PPNet.push_forward)
        h, w, P = d.shape[1], d.shape[2], d.shape[3]
        bits = patch_class_bits(label[0], (h, w), num_classes)
        # eligibility by broadcast bit test — no per-pixel table gather
        elig_p = jnp.bitwise_and(
            jnp.right_shift(bits[..., None], proto_class), 1) > 0
        masked = jnp.where(elig_p, d[0], _INF)
        flat = masked.reshape(h * w, P)
        arg = jnp.argmin(flat, axis=0)                      # first-min wins
        mind = jnp.take_along_axis(flat, arg[None, :], axis=0)[0]
        pi, pj = arg // w, arg % w
        fmap = f[0][pi, pj, :]                              # (P, C)
        return mind, pi, pj, fmap, d

    return fn


def make_push_batched_fn(model: PPNet, num_classes: int,
                         normalize: Optional[Tuple] = None) -> Callable:
    """Batched push kernel: (params, constants, proto_class,
    images (B,H,W,3), labels (B,H,W)) → per-prototype batch winner
    (min_dist (P,), img_in_batch (P,), patch_i, patch_j, fmap (P,C)).

    The argmin runs B-major over (B·h·w) patches, so ties resolve to
    the EARLIEST image — batching a sequential scan (and sharding the
    batch over the mesh ``data`` axis: XLA turns the argmin into a
    cross-device min+argmin reduction over ICI) reproduces the
    reference's sequential semantics exactly.

    ``normalize=(mean, std)`` moves the push preprocessing into the jit
    so full-res images ship as uint8 (4× less transfer, 4× smaller
    input buffer — relay wedge margin, CLAUDE.md).  The reference's
    push normalizes each image exactly like eval (its push dataset has
    transform=None, but update_prototypes_on_image applies
    ToTensor+Normalize itself — reference segmentation/push.py:187 via
    find_nearest.py:21-24), so the full (x/255 − mean)/std sequence
    runs here, ulp-equivalent to the host path.
    """

    @jax.jit
    def fn(params, constants, proto_class, images, labels):
        images = normalize_in_jit(images, normalize)
        variables = {"params": params, "constants": constants}
        f, d = model.apply(variables, images, method=PPNet.push_forward)
        B, h, w, P = d.shape

        bits = patch_class_bits(labels, (h, w), num_classes)  # (B,h,w)
        elig_p = jnp.bitwise_and(
            jnp.right_shift(bits[..., None], proto_class), 1) > 0
        masked = jnp.where(elig_p, d, _INF)
        flat = masked.reshape(B * h * w, P)
        arg = jnp.argmin(flat, axis=0)                  # B-major order
        mind = jnp.take_along_axis(flat, arg[None, :], axis=0)[0]
        bi = arg // (h * w)
        pi = (arg % (h * w)) // w
        pj = arg % w
        fmap = f[bi, pi, pj, :]
        return mind, bi, pi, pj, fmap

    return fn


def push_prototypes(
    model: PPNet,
    params: Any,
    constants: Any,
    proto_class: jnp.ndarray,
    dataset: Iterable[Tuple[np.ndarray, np.ndarray]],
    num_classes: int,
    *,
    run_dir: Optional[str] = None,
    save_visualizations: bool = False,
    class_names: Optional[Dict[int, str]] = None,
    dedup: bool = True,
    batch_size: int = 1,
    log: Callable[[str], None] = print,
    denorm: Optional[Callable] = None,
    get_item: Optional[Callable] = None,
    raw_uint8: bool = False,
    raw_normalize: Optional[Tuple] = None,
) -> Tuple[Any, jnp.ndarray, Dict[str, Any]]:
    """Project each prototype onto its nearest training patch.

    Args:
      dataset: iterable of (normalized image (1,H,W,3) float32,
        raw label (1,H,W) int) pairs, in a fixed order.
      denorm: inverts dataset normalization for visualization rendering
        ((H,W,3) normalized -> [0,1] RGB); defaults to ImageNet stats —
        pass ``analysis.make_denorm(cfg.data)`` for non-ImageNet presets.
      get_item: index → (image (1,H,W,3), label (1,H,W)) random access
        into ``dataset``'s order; required for visualizations with
        ``batch_size`` > 1 (the batched scan re-forwards only the ≤P
        winner images in a second pass to render artifacts and grow the
        95th-percentile bound boxes, like
        ``nearest.save_nearest_artifacts``).
      raw_uint8: dataset yields RAW uint8 images; the full
        (x/255 − mean)/std preprocessing happens inside the jit
        (ulp-equivalent — see make_push_batched_fn) with the stats
        given in ``raw_normalize`` (required).  Batched path only;
        visualizations keep the f32 items.

    Returns:
      (new_params, new_proto_class, info) where info carries the
      reference's bookkeeping arrays: ``proto_rf_boxes`` /
      ``proto_bound_boxes`` rows [img_idx, h0, h1, w0, w1, class]
      (reference push.py:63-71) and ``unique_index``.
    """
    P = int(np.asarray(params["prototype_vectors"]).shape[0])
    C = int(np.asarray(params["prototype_vectors"]).shape[1])
    pc_host = np.asarray(proto_class)

    global_min = np.full(P, np.inf)
    global_fmap = np.zeros((P, C), np.float32)
    rf_boxes = np.full((P, 6), -1, dtype=np.int64)
    bound_boxes = np.full((P, 6), -1, dtype=np.int64)

    from adlm_tpu.interpret import visualize as vz
    if denorm is None:
        from adlm_tpu.interpret.analysis import _denorm as denorm

    # distances ≥ _INF mean "no eligible patch" — must never win nor
    # count as seen (1e30 is finite, so a plain < np.inf check would
    # mark never-eligible prototypes as updated with garbage patches)
    _INF_HOST = float(_INF) * 0.5

    if raw_uint8 and (batch_size <= 1 or save_visualizations):
        raise ValueError("raw_uint8 push requires batch_size > 1 and "
                         "save_visualizations=False")
    if raw_uint8 and raw_normalize is None:
        raise ValueError("raw_uint8 push requires raw_normalize="
                         "(mean, std) — the reference's push normalizes "
                         "its inputs (segmentation/push.py:187)")
    if batch_size > 1:
        if save_visualizations and (get_item is None or run_dir is None):
            raise ValueError("batched push visualizations need "
                             "get_item= random access and run_dir=")
        bfn = make_push_batched_fn(
            model, num_classes,
            normalize=raw_normalize if raw_uint8 else None)
        grid_dims: Dict[Tuple[int, ...], Tuple[int, int]] = {}
        pending_imgs: list = []
        pending_labs: list = []
        offset = 0
        # one batch stays in flight: batch n+1's (async) upload +
        # compute overlap batch n's host-side merge — the sequential
        # upload→compute→merge loop is transfer-bound at full
        # resolution (PERF.md)
        inflight: list = []

        def merge(outs, n_real, off, img_shape, lab_shape):
            mind, bi, pi, pj, fmap = outs
            mind = np.asarray(mind)
            bi = np.asarray(bi)
            improved = (mind < global_min) & (mind < _INF_HOST) & \
                (bi < n_real)
            if improved.any():
                pi = np.asarray(pi)
                pj = np.asarray(pj)
                fmap = np.asarray(fmap)
                H, W = lab_shape[1], lab_shape[2]
                key = img_shape
                if key not in grid_dims:
                    _, d_shape = jax.eval_shape(
                        lambda im: model.apply(
                            {"params": params, "constants": constants},
                            im, method=PPNet.push_forward),
                        jax.ShapeDtypeStruct(key, jnp.float32))
                    grid_dims[key] = (d_shape.shape[1], d_shape.shape[2])
                h, w = grid_dims[key]
                patch_h, patch_w = H / h, W / w
                for j in np.where(improved)[0]:
                    global_min[j] = mind[j]
                    global_fmap[j] = fmap[j]
                    h0 = int(pi[j] * patch_h)
                    h1 = int(pi[j] * patch_h + patch_h) + 1
                    w0 = int(pj[j] * patch_w)
                    w1 = int(pj[j] * patch_w + patch_w) + 1
                    rf_boxes[j] = [off + int(bi[j]), h0, h1, w0, w1,
                                   pc_host[j]]
                    bound_boxes[j] = rf_boxes[j]

        def flush():
            nonlocal offset
            if not pending_imgs:
                return
            n_real = len(pending_imgs)
            # pad partial batches with all-void (ineligible) images so
            # every call reuses the one compiled (batch_size, H, W) shape
            while len(pending_imgs) < batch_size:
                pending_imgs.append(np.zeros_like(pending_imgs[0]))
                pending_labs.append(np.zeros_like(pending_labs[0]))
            images = np.concatenate(pending_imgs, axis=0)
            labels = np.concatenate(pending_labs, axis=0)
            outs = bfn(params, constants, proto_class,
                       jnp.asarray(images), jnp.asarray(labels))
            if inflight:
                merge(*inflight.pop())
            inflight.append((outs, n_real, offset, images.shape,
                             labels.shape))
            offset += n_real
            pending_imgs.clear()
            pending_labs.clear()

        for image, label in dataset:
            if pending_imgs and image.shape[1:] != pending_imgs[0].shape[1:]:
                flush()
            pending_imgs.append(image)
            pending_labs.append(label)
            if len(pending_imgs) == batch_size:
                flush()
        flush()
        if inflight:
            merge(*inflight.pop())

        if save_visualizations:
            # second pass: re-forward only the winner images (≤P) to
            # render artifacts + grow the bound boxes — the fast scan
            # and the artifact set are no longer mutually exclusive
            single_fn = make_push_batch_fn(model, num_classes)
            winners: Dict[int, list] = {}
            for j in range(P):
                if global_min[j] < _INF_HOST:
                    winners.setdefault(int(rf_boxes[j, 0]), []).append(j)
            for img_idx in sorted(winners):
                image, label = get_item(img_idx)
                _, _, _, _, dist = single_fn(
                    params, constants, proto_class,
                    jnp.asarray(image), jnp.asarray(label))
                dist_host = np.asarray(dist[0])
                for j in winners[img_idx]:
                    h0, h1, w0, w1 = (int(x) for x in rf_boxes[j, 1:5])
                    bound_boxes[j, 1:5] = vz.save_prototype_artifacts(
                        run_dir=run_dir, proto_idx=j,
                        image=denorm(np.asarray(image[0])),
                        label=np.asarray(label[0]),
                        dist_map=dist_host[:, :, j],
                        rf_box=(h0, h1, w0, w1),
                        target_class=int(pc_host[j]),
                        class_names=class_names,
                        activation=model.cfg.prototype_activation,
                        epsilon=model.cfg.epsilon,
                    )

        return _finalize_push(params, proto_class, global_min, global_fmap,
                              rf_boxes, bound_boxes, dedup, run_dir, log,
                              _INF_HOST)

    batch_fn = make_push_batch_fn(model, num_classes)

    for img_idx, (image, label) in enumerate(dataset):
        image_j = jnp.asarray(image)
        label_j = jnp.asarray(label)
        mind, pi, pj, fmap, dist = batch_fn(params, constants, proto_class,
                                            image_j, label_j)
        mind = np.asarray(mind)
        improved = (mind < global_min) & (mind < _INF_HOST)
        if not improved.any():
            continue
        pi = np.asarray(pi)
        pj = np.asarray(pj)
        fmap = np.asarray(fmap)
        h, w = dist.shape[1], dist.shape[2]
        H, W = label.shape[1], label.shape[2]
        patch_h, patch_w = H / h, W / w

        dist_host = np.asarray(dist[0]) if save_visualizations else None

        for j in np.where(improved)[0]:
            global_min[j] = mind[j]
            global_fmap[j] = fmap[j]
            h0 = int(pi[j] * patch_h)
            h1 = int(pi[j] * patch_h + patch_h) + 1
            w0 = int(pj[j] * patch_w)
            w1 = int(pj[j] * patch_w + patch_w) + 1
            rf_boxes[j] = [img_idx, h0, h1, w0, w1, pc_host[j]]
            bound_boxes[j] = [img_idx, h0, h1, w0, w1, pc_host[j]]
            if save_visualizations and run_dir is not None:
                bound_boxes[j, 1:5] = vz.save_prototype_artifacts(
                    run_dir=run_dir, proto_idx=j,
                    image=denorm(np.asarray(image[0])),
                    label=np.asarray(label[0]),
                    dist_map=dist_host[:, :, j],
                    rf_box=(h0, h1, w0, w1),
                    target_class=int(pc_host[j]),
                    class_names=class_names,
                    activation=model.cfg.prototype_activation,
                    epsilon=model.cfg.epsilon,
                )

    return _finalize_push(params, proto_class, global_min, global_fmap,
                          rf_boxes, bound_boxes, dedup, run_dir, log,
                          _INF_HOST)


def _finalize_push(params, proto_class, global_min, global_fmap,
                   rf_boxes, bound_boxes, dedup, run_dir, log,
                   inf_threshold):
    """Shared push tail: merge winners, dedup, save bookkeeping."""
    P = global_min.shape[0]
    seen = global_min < inf_threshold
    log(f"push: {int(seen.sum())}/{P} prototypes updated")

    new_params = dict(params)
    # prototypes never seen keep their old vector (reference overwrites
    # with the zero-initialized buffer; keeping the trained vector is
    # strictly safer — both are then candidates for dedup/prune)
    old = np.asarray(params["prototype_vectors"])
    merged = np.where(seen[:, None], global_fmap, old).astype(np.float32)
    new_params["prototype_vectors"] = jnp.asarray(merged)
    new_proto_class = proto_class

    unique_index = np.arange(P)
    if dedup:
        _, unique_index = np.unique(merged, axis=0, return_index=True)
        keep = sorted(unique_index.tolist())
        n_dup = P - len(keep)
        log(f"push: removing {n_dup} duplicate prototypes")
        if n_dup:
            new_params, new_proto_class = prune_params(
                new_params, proto_class, keep)

    info = {
        "proto_rf_boxes": rf_boxes,
        "proto_bound_boxes": bound_boxes,
        "unique_index": sorted(int(i) for i in unique_index),
        "min_distances": global_min,
    }

    if run_dir is not None:
        os.makedirs(run_dir, exist_ok=True)
        np.save(os.path.join(run_dir, "bb-receptive_field.npy"), rf_boxes)
        np.save(os.path.join(run_dir, "bb.npy"), bound_boxes)
        with open(os.path.join(run_dir, "unique_prototypes.json"), "w") as f:
            json.dump(info["unique_index"], f)

    return new_params, new_proto_class, info
