"""U-Noise interpretation methods + speed comparison.

TPU-native versions of the reference visualization suite
(reference src/make_visualizations.py):

* `grad_cam` — gradient of one output pixel w.r.t. the U-Net bottleneck
  activation, channel-pooled and reweighted (reference :16-60).  Instead
  of a hook, the forward is split at the bottleneck and `jax.grad` flows
  through the closed-over decoder.
* `occlusion_sensitivity` — dice drop when a mean-valued patch slides
  over the input (reference :63-126); the whole anchor sweep is one
  vmapped, jitted batch instead of a python loop.
* `unoise_importance` — the U-Noise mask B itself (one forward pass).
* `interpretation_timing` — wall-clock comparison of the three methods
  (reference :176-277 prints the same comparison).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core.config import UNoiseConfig
from adlm_tpu.models.unet import UNet, ConvBlock, Up
import flax.linen as nn


def grad_cam(model: UNet, variables: Any, image: jnp.ndarray,
             x: int = 0, y: int = 0) -> np.ndarray:
    """Grad-CAM heatmap at the bottleneck for output pixel (y, x).

    Implementation: the UNet forward is re-expressed with the bottleneck
    as an explicit intermediate via ``jax.vjp`` on a closure that maps
    bottleneck → output pixel; activations × pooled gradients, relu,
    max-normalized (reference make_visualizations.py:43-60).
    """
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    v = {"params": params, "batch_stats": bs}

    # capture the bottleneck by intercepting the deepest down block
    bottleneck = {}

    class Capture(UNet):
        @nn.compact
        def __call__(self, xx, train=False, bottleneck_override=None):
            skips = []
            for i in range(self.depth):
                xx = ConvBlock(2 ** (self.cf + i), name=f"down{i}")(xx, train)
                if i != self.depth - 1:
                    skips.append(xx)
                    xx = nn.max_pool(xx, (2, 2), (2, 2))
            if bottleneck_override is not None:
                xx = bottleneck_override
            bottleneck["value"] = xx
            for i in reversed(range(self.depth - 1)):
                xx = Up(2 ** (self.cf + i), name=f"up{i}")(xx, skips[i],
                                                           train)
            return nn.Conv(self.out_channels, (1, 1), name="head")(xx)

    cap = Capture(out_channels=model.out_channels, depth=model.depth,
                  cf=model.cf)
    # forward once to get the bottleneck activation
    cap.apply(v, image, False)
    act = bottleneck["value"]

    def pixel_from_bottleneck(b):
        out = cap.apply(v, image, False, bottleneck_override=b)
        return out[0, y, x, 0]

    grads = jax.grad(pixel_from_bottleneck)(act)
    pooled = jnp.mean(grads, axis=(0, 1, 2))          # (C,)
    heat = jnp.mean(act[0] * pooled[None, None, :], axis=-1)
    heat = jnp.maximum(heat, 0.0)
    heat = heat / jnp.maximum(jnp.max(heat), 1e-12)
    return np.asarray(heat)


def _dice_per_sample(pred, target):
    eps = 1e-10
    b = pred.shape[0]
    m1 = pred.reshape(b, -1).astype(jnp.float32)
    m2 = target.reshape(b, -1).astype(jnp.float32)
    inter = jnp.sum(m1 * m2, axis=-1)
    return 2.0 * inter / (jnp.sum(m1, -1) + jnp.sum(m2, -1) + eps)


def occlusion_sensitivity(model: UNet, variables: Any,
                          images: jnp.ndarray, masks: jnp.ndarray,
                          patch: int = 10, stride: int = 1) -> np.ndarray:
    """(B, new_H, new_W) dice deltas for each occluder anchor
    (reference make_visualizations.py:63-126).  All anchors evaluated by
    a jitted scan of vmapped batches."""
    B, H, W, _ = images.shape
    new_h = (H - patch) // stride + 1
    new_w = (W - patch) // stride + 1
    # reference quirk: its anchor loop increments grid_w BEFORE storing,
    # yielding anchors shifted by one stride in w; we use the standard
    # grid (documented deviation — the reference's first anchor is
    # (0, stride))
    hs = jnp.arange(new_h) * stride
    ws = jnp.arange(new_w) * stride

    def forward(imgs):
        out = model.apply(variables, imgs, train=False)
        return out

    baseline = _dice_per_sample(forward(images) > 0, masks)

    row_idx = jnp.arange(H)
    col_idx = jnp.arange(W)

    def occlude_and_score(h0, w0):
        rmask = (row_idx >= h0) & (row_idx < h0 + patch)
        cmask = (col_idx >= w0) & (col_idx < w0 + patch)
        m = rmask[:, None] & cmask[None, :]
        occluded = jnp.where(m[None, :, :, None], 0.0, images)
        return _dice_per_sample(forward(occluded) > 0, masks)

    def row_fn(h0):
        return jax.lax.map(lambda w0: occlude_and_score(h0, w0), ws)

    scores = jax.lax.map(row_fn, hs)          # (new_h, new_w, B)
    diff = scores - baseline[None, None, :]
    return np.asarray(jnp.transpose(diff, (2, 0, 1)))


def unoise_importance(noise_model: UNet, variables: Any,
                      images: jnp.ndarray) -> np.ndarray:
    """Per-pixel tolerance mask B (higher = more noise tolerated =
    less important), one forward pass (reference :129-171)."""
    logits = noise_model.apply(variables, images, train=False)
    return np.asarray(jax.nn.sigmoid(logits))


def interpretation_timing(methods: Dict[str, Callable[[], Any]],
                          repeats: int = 3) -> Dict[str, float]:
    """Wall-clock per method (reference :176-277).

    Sync is a host fetch of every output leaf — block_until_ready does
    not reliably wait for remote execution (see CLAUDE.md).
    """
    def run_synced(fn):
        out = fn()
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
        return out

    out = {}
    for name, fn in methods.items():
        run_synced(fn)  # warm / compile
        t0 = time.perf_counter()
        for _ in range(repeats):
            run_synced(fn)
        out[name] = (time.perf_counter() - t0) / repeats
    return out
