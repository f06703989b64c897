"""Prototype visualization writers (PNG artifacts).

Reproduces the artifact set of the reference push
(reference segmentation/push.py:361-481): per improved prototype, the
original image, activation-heatmap overlays (full + ground-truth-masked),
receptive-field crop, and the highly-activated crop found by greedy
box growth from the patch at the ≥95th-percentile activation level
(reference helpers.py:48-82).

No cv2/matplotlib dependency: cubic upsampling runs through
jax.image.resize and the JET colormap is computed directly.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from PIL import Image


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """x in [0,1] → RGB in [0,1], matching OpenCV's COLORMAP_JET curve
    closely enough for qualitative heatmaps."""
    x = np.clip(x, 0.0, 1.0)
    four = 4.0 * x
    r = np.clip(np.minimum(four - 1.5, -four + 4.5), 0, 1)
    g = np.clip(np.minimum(four - 0.5, -four + 3.5), 0, 1)
    b = np.clip(np.minimum(four + 0.5, -four + 2.5), 0, 1)
    return np.stack([r, g, b], axis=-1)


def upsample_cubic(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bicubic upsample (reference uses cv2.INTER_CUBIC, push.py:319)."""
    return np.asarray(jax.image.resize(x, size, method="cubic"))


def grow_high_activation_box(act: np.ndarray, seed_box, threshold: float,
                             add_margin: int = 5) -> Tuple[int, int, int, int]:
    """Greedy 4-direction growth of ``seed_box`` while the adjacent
    row/column still contains activation ≥ threshold
    (reference helpers.py:48-82). Returns (h0, h1, w0, w1), end-exclusive.
    """
    # NOTE: the reference uses the box's end-exclusive coordinates as
    # inclusive ones (helpers.py:49-56 never subtracts 1) — kept for
    # bit-parity of the produced crops.
    h0, h1, w0, w1 = seed_box
    hot = act >= threshold
    H, W = act.shape
    growing = [True, True, True, True]
    while any(growing):
        if growing[0]:
            if h0 > 0 and hot[h0 - 1, w0:w1 + 1].any():
                h0 -= 1
            else:
                growing[0] = False
        if growing[1]:
            if h1 < H - 1 and hot[h1 + 1, w0:w1 + 1].any():
                h1 += 1
            else:
                growing[1] = False
        if growing[2]:
            if w0 > 0 and hot[h0:h1 + 1, w0 - 1].any():
                w0 -= 1
            else:
                growing[2] = False
        if growing[3]:
            if w1 < W - 1 and hot[h0:h1 + 1, w1 + 1].any():
                w1 += 1
            else:
                growing[3] = False
    h0 = max(h0 - add_margin, 0)
    w0 = max(w0 - add_margin, 0)
    h1 = min(h1 + add_margin, H - 1)
    w1 = min(w1 + add_margin, W - 1)
    return h0, h1 + 1, w0, w1 + 1


def high_activation_crop(act: np.ndarray, percentile: float = 95
                         ) -> Tuple[int, int, int, int]:
    """Tight box around all pixels ≥ the percentile threshold
    (reference helpers.py:24-45)."""
    thr = np.percentile(act, percentile)
    hot = act >= thr
    rows = np.where(hot.any(axis=1))[0]
    cols = np.where(hot.any(axis=0))[0]
    if len(rows) == 0:
        return 0, act.shape[0], 0, act.shape[1]
    return int(rows[0]), int(rows[-1]) + 1, int(cols[0]), int(cols[-1]) + 1


def normalize01(a: np.ndarray) -> np.ndarray:
    """Min-max normalize to [0,1]; constant maps normalize to zeros."""
    lo, hi = a.min(), a.max()
    return (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)


def _to_uint8(img: np.ndarray) -> np.ndarray:
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def _save(path: str, img: np.ndarray) -> None:
    Image.fromarray(_to_uint8(img)).save(path)


def _overlay(img: np.ndarray, act_norm: np.ndarray) -> np.ndarray:
    """0.5·img + 0.3·jet(act) (reference push.py:417)."""
    return np.clip(0.5 * img + 0.3 * jet_colormap(act_norm), 0, 1)


def _draw_box(img: np.ndarray, box, color=(1.0, 0.0, 0.0),
              width: int = 2) -> np.ndarray:
    h0, h1, w0, w1 = box
    out = img.copy()
    h1 = min(h1, out.shape[0]) - 1
    w1 = min(w1, out.shape[1]) - 1
    c = np.asarray(color)
    out[h0:h0 + width, w0:w1 + 1] = c
    out[max(h1 - width + 1, 0):h1 + 1, w0:w1 + 1] = c
    out[h0:h1 + 1, w0:w0 + width] = c
    out[h0:h1 + 1, max(w1 - width + 1, 0):w1 + 1] = c
    return out


def save_prototype_artifacts(run_dir: str, proto_idx: int,
                             image: np.ndarray, label: np.ndarray,
                             dist_map: np.ndarray,
                             rf_box: Tuple[int, int, int, int],
                             target_class: int,
                             class_names: Optional[Dict[int, str]] = None,
                             activation: str = "log",
                             epsilon: float = 1e-4,
                             percentile: float = 95
                             ) -> Tuple[int, int, int, int]:
    """Write the artifact set for one prototype; returns the grown
    high-activation bound box (reference push.py:329-350).

    ``image`` is the un-normalized RGB image in [0,1]; ``dist_map`` the
    (h, w) prototype distance map; ``rf_box`` the winning-patch pixel box.
    """
    cls_name = (class_names or {}).get(target_class, f"class{target_class}")
    out_dir = os.path.join(run_dir, cls_name)
    os.makedirs(out_dir, exist_ok=True)

    if activation == "log":
        act = np.log((dist_map + 1.0) / (dist_map + epsilon))
    else:
        act = dist_map.max() - dist_map
    H, W = image.shape[0], image.shape[1]
    act_up = upsample_cubic(act, (H, W))

    threshold = np.percentile(act_up, percentile)
    y_mask = (label == target_class + 1)
    act_gt = act_up * y_mask

    bound = grow_high_activation_box(act_gt, rf_box, threshold)

    norm = normalize01
    prefix = os.path.join(out_dir, f"prototype-img_{proto_idx}")
    np.save(os.path.join(out_dir, f"prototype-self-act{proto_idx}.npy"), act)
    _save(prefix + "-original.png", image)
    _save(prefix + "-original_with_box.png", _draw_box(image, rf_box))
    _save(prefix + "-original_with_self_act.png", _overlay(image, norm(act_up)))
    _save(prefix + "-original_with_self_act_gt_only.png",
          _overlay(image, norm(act_gt)))
    _save(prefix + "-receptive_field.png",
          image[rf_box[0]:rf_box[1], rf_box[2]:rf_box[3]])
    _save(prefix + ".png", image[bound[0]:bound[1], bound[2]:bound[3]])
    return bound
