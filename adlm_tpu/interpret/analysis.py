"""Local & global prototype analysis.

* `local_analysis` — for one image: prediction map plus the top-k most
  activated prototypes (by max patch activation), each with its
  activation heatmap, high-activation crop, and a same-class sanity
  check (reference local_analysis.py:207-270, sanity check :119-124).
* `global_analysis` — k nearest patches per prototype over a dataset
  with full artifact saving (reference global_analysis.py:120-138; uses
  the corrected `dataset=` calling convention — the reference passes a
  stale ``dataloader=`` kwarg and crashes, a recorded reference bug).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.ops.prototype import distance_to_similarity
from adlm_tpu.interpret import visualize as vz


def local_analysis(model: PPNet, params: Any, constants: Any,
                   proto_class: jnp.ndarray, image: np.ndarray,
                   top_k: int = 10,
                   save_dir: Optional[str] = None,
                   raw_image: Optional[np.ndarray] = None,
                   denorm: Optional[Callable] = None,
                   per_class_top: int = 0
                   ) -> Dict[str, Any]:
    """Analyze one (1, H, W, 3) normalized image.

    Returns prediction map, top-k prototype indices/classes/activations
    and the own-class-strongest-connection sanity vector.

    ``per_class_top=k`` adds the reference's second section
    (local_analysis.py:272-330): for each of the k most-represented
    predicted classes, that class's own prototypes ranked by
    activation, each with overlay + crop artifacts and a JSON log of
    activation and last-layer connection.
    """
    variables = {"params": params, "constants": constants}
    f, d = model.apply(variables, jnp.asarray(image),
                       method=PPNet.push_forward)
    logits, _ = model.apply(variables, jnp.asarray(image), train=False)
    act = distance_to_similarity(d, model.cfg.prototype_activation,
                                 model.cfg.epsilon)    # (1, h, w, P)
    act_max = np.asarray(jnp.max(act[0], axis=(0, 1)))  # (P,)
    order = np.argsort(-act_max)[:top_k]
    pred = np.asarray(jnp.argmax(logits[0], axis=-1))

    # sanity: every prototype's strongest last-layer weight is its class
    # (reference local_analysis.py:119-124)
    w = np.asarray(params["last_layer"])
    strongest = np.argmax(w, axis=1)
    sanity = strongest == np.asarray(proto_class)

    result = {
        "prediction": pred,
        "top_prototypes": order,
        "top_classes": np.asarray(proto_class)[order],
        "top_activations": act_max[order],
        "own_class_is_strongest": sanity,
    }
    if per_class_top:
        # rank predicted classes by pixel share (the segmentation
        # stand-in for the reference's image-level top-k logits); the
        # ranking is always returned — only artifacts need save_dir
        pc_np = np.asarray(proto_class)
        counts = np.bincount(pred.reshape(-1), minlength=w.shape[1])
        top_cls = [int(c) for c in np.argsort(-counts)[:per_class_top]
                   if counts[c] > 0]
        result["per_class"] = {
            c: np.nonzero(pc_np == c)[0][
                np.argsort(-act_max[pc_np == c])]
            for c in top_cls}

    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        if raw_image is not None:
            img = raw_image
        else:
            img = (denorm or _denorm)(image[0])
        H, W = img.shape[0], img.shape[1]
        up_cache: Dict[int, np.ndarray] = {}

        def a_up_for(j):
            j = int(j)
            if j not in up_cache:
                up_cache[j] = vz.upsample_cubic(
                    np.asarray(act[0, :, :, j]), (H, W))
            return up_cache[j]

        for rank, j in enumerate(order):
            a_up = a_up_for(j)
            overlay = vz._overlay(img, vz.normalize01(a_up))
            vz._save(os.path.join(
                save_dir,
                f"top-{rank + 1}_prototype_{j}_class"
                f"{int(result['top_classes'][rank])}.png"), overlay)
            box = vz.high_activation_crop(a_up)
            vz._save(os.path.join(
                save_dir, f"top-{rank + 1}_prototype_{j}_crop.png"),
                img[box[0]:box[1], box[2]:box[3]])

        if per_class_top:
            import json
            pc_np = np.asarray(proto_class)
            for ci, (c, order_c) in enumerate(result["per_class"].items()):
                cdir = os.path.join(save_dir,
                                    f"top-{ci + 1}_class_prototypes")
                os.makedirs(cdir, exist_ok=True)
                log_entries = []
                for rank, j in enumerate(order_c):
                    a_up = a_up_for(j)
                    vz._save(os.path.join(
                        cdir, f"top-{rank + 1}_activated_prototype_"
                              f"{int(j)}.png"),
                        vz._overlay(img, vz.normalize01(a_up)))
                    box = vz.high_activation_crop(a_up)
                    vz._save(os.path.join(
                        cdir, f"top-{rank + 1}_prototype_{int(j)}"
                              "_crop.png"),
                        img[box[0]:box[1], box[2]:box[3]])
                    log_entries.append({
                        "prototype": int(j),
                        "class_identity": int(pc_np[j]),
                        "activation": float(act_max[j]),
                        "last_layer_connection": float(w[j, c]),
                    })
                with open(os.path.join(cdir, "log.json"), "w") as fjs:
                    json.dump({"class": c,
                               "pixel_count": int(counts[c]),
                               "prototypes": log_entries}, fjs,
                              indent=2)
    return result


def _denorm(img: np.ndarray,
            mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
            cells: bool = False) -> np.ndarray:
    """Invert dataset normalization to a [0,1] RGB image for rendering.

    ``cells=True`` marks raw-float datasets (no /255 at load, see
    DataConfig.cells): the un-normalized values live on an arbitrary
    scale, so they are min-max normalized for display instead of clipped.
    """
    out = img * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    if cells:
        return vz.normalize01(out)
    return np.clip(out, 0, 1)


def make_denorm(data_cfg) -> "Callable[[np.ndarray], np.ndarray]":
    """Denormalizer bound to a DataConfig's mean/std/cells — use this at
    every artifact-rendering site instead of assuming ImageNet stats."""
    return lambda img: _denorm(img, mean=data_cfg.mean, std=data_cfg.std,
                               cells=data_cfg.cells)


def global_analysis(model: PPNet, params: Any, constants: Any,
                    proto_class: jnp.ndarray,
                    dataset: Iterable[Tuple[np.ndarray, np.ndarray]],
                    num_classes: int, k: int = 5,
                    save_dir: Optional[str] = None,
                    full_save: bool = False,
                    get_item=None,
                    denorm: Optional[Callable] = None,
                    batch_size: int = 1) -> np.ndarray:
    """k nearest patch class ids per prototype; optionally saves
    per-prototype class id arrays and, with ``full_save`` (requires
    ``get_item: idx -> (image, label)``), the full nearest-patch
    artifact set (reference global_analysis.py:120-138 /
    find_nearest.py:236-337)."""
    from adlm_tpu.interpret.nearest import (
        find_k_nearest_patches, save_nearest_artifacts)

    ids, info = find_k_nearest_patches(model, params, constants,
                                       proto_class, dataset, num_classes,
                                       k=k, return_info=True,
                                       batch_size=batch_size)
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)
        if full_save and get_item is not None:
            save_nearest_artifacts(model, params, constants, proto_class,
                                   get_item, ids, info, save_dir,
                                   denorm=denorm)
        else:
            np.save(os.path.join(save_dir, "full_class_id.npy"), ids)
            for j in range(ids.shape[0]):
                d = os.path.join(save_dir, str(j))
                os.makedirs(d, exist_ok=True)
                np.save(os.path.join(d, "class_id.npy"), ids[j])
    return ids
