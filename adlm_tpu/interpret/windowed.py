"""Sliding-window (blockwise) full-resolution inference.

The reference carries vestigial sliding-window machinery
(window/margin infrastructure, reference dataset.py:114-116 and the
commented window call at segmentation/push.py:179-183) but always runs
whole images.  Here windowed inference is a first-class eval mode — the
memory-bounded alternative to spatial mesh sharding for inputs too
large to fit activations on one chip (SURVEY §5's "context-parallel
stand-in"):

* the image is covered by overlapping windows on a fixed grid (all
  windows the same size → ONE compiled program regardless of image
  size);
* logits are stitched by averaging overlaps (windows are
  cosine-weighted toward their centers to suppress boundary effects of
  the convs' zero padding);
* the output matches whole-image inference in the interior and differs
  only by boundary-context effects near window seams.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.ops.resize import resize_bilinear


def _window_grid(size: int, window: int, stride: int):
    """Start offsets covering [0, size) with the final window clamped."""
    if size <= window:
        return [0]
    starts = list(range(0, size - window + 1, stride))
    if starts[-1] != size - window:
        starts.append(size - window)
    return starts


def make_windowed_inference_fn(model: PPNet, window: Tuple[int, int],
                               overlap: float = 0.25) -> Callable:
    """Returns ``fn(params, constants, image (1,H,W,3)) -> logits
    (1,H,W,K)`` running the model per window and stitching."""
    wh, ww = window
    stride_h = max(int(wh * (1.0 - overlap)), 1)
    stride_w = max(int(ww * (1.0 - overlap)), 1)

    # cosine taper: weight 1 at the center, ~0.05 at the border
    hy = 0.05 + 0.95 * jnp.sin(jnp.pi * (jnp.arange(wh) + 0.5) / wh)
    hx = 0.05 + 0.95 * jnp.sin(jnp.pi * (jnp.arange(ww) + 0.5) / ww)
    taper = (hy[:, None] * hx[None, :])[None, :, :, None]

    @jax.jit
    def window_fn(params, constants, patch):
        logits, _ = model.apply({"params": params, "constants": constants},
                                patch, train=False,
                                return_distances=False)
        up = resize_bilinear(logits, (wh, ww))
        return up * taper, taper

    def fn(params, constants, image):
        _, H, W, _ = image.shape
        acc = np.zeros((1, H, W, model.cfg.num_classes), np.float32)
        norm = np.zeros((1, H, W, 1), np.float32)
        for sh in _window_grid(H, wh, stride_h):
            for sw in _window_grid(W, ww, stride_w):
                patch = image[:, sh:sh + wh, sw:sw + ww, :]
                ph, pw = patch.shape[1], patch.shape[2]
                if (ph, pw) != (wh, ww):  # image smaller than window
                    pad = ((0, 0), (0, wh - ph), (0, ww - pw), (0, 0))
                    patch = jnp.pad(patch, pad)
                logits_w, weight = window_fn(params, constants,
                                             jnp.asarray(patch))
                acc[:, sh:sh + ph, sw:sw + pw] += np.asarray(
                    logits_w)[:, :ph, :pw]
                norm[:, sh:sh + ph, sw:sw + pw] += np.asarray(
                    weight)[:, :ph, :pw]
        return acc / np.maximum(norm, 1e-8)

    return fn
