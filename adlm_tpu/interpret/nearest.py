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


def make_nearest_batch_fn(model: PPNet, num_classes: int) -> Callable:
    """(params, constants, proto_class, image(1,H,W,3), label(1,H,W))
    → (min_dist (P,), patch_label (P,)).

    ``label`` is raw (void = 0, class c = c+1); internally shifted by −1
    like the reference (find_nearest.py:117).
    """

    @jax.jit
    def fn(params, constants, proto_class, image, label):
        variables = {"params": params, "constants": constants}
        _, d = model.apply(variables, image, method=PPNet.push_forward)
        h, w, P = d.shape[1], d.shape[2], d.shape[3]
        y = label[0].astype(jnp.int32) - 1          # void → −1
        grid_y = resize_label_nearest(y, (h, w))    # (h, w)
        # penalize void patches (reference adds 10e6, find_nearest.py:132)
        masked = d[0] + _VOID_PENALTY * (grid_y == -1)[:, :, None]
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
        return mind, labels

    return fn


def find_k_nearest_patches(
    model: PPNet,
    params: Any,
    constants: Any,
    proto_class: jnp.ndarray,
    dataset: Iterable[Tuple[np.ndarray, np.ndarray]],
    num_classes: int,
    k: int = 6,
) -> np.ndarray:
    """(P, k) class ids of each prototype's k nearest patches."""
    fn = make_nearest_batch_fn(model, num_classes)
    P = int(np.asarray(params["prototype_vectors"]).shape[0])
    top_d = np.full((P, k), np.inf)
    top_l = np.full((P, k), -1, dtype=np.int64)

    for image, label in dataset:
        mind, labels = fn(params, constants, proto_class,
                          jnp.asarray(image), jnp.asarray(label))
        mind = np.asarray(mind)
        labels = np.asarray(labels)
        # merge into running top-k (heap semantics: strictly smaller
        # replaces the current maximum)
        worst = top_d.max(axis=1)
        improved = mind < worst
        for j in np.where(improved)[0]:
            slot = int(np.argmax(top_d[j]))
            top_d[j, slot] = mind[j]
            top_l[j, slot] = labels[j]

    order = np.argsort(top_d, axis=1)
    return np.take_along_axis(top_l, order, axis=1)
