"""On-device resize ops.

The reference resizes labels per training step with a GPU→CPU→PIL→GPU
round-trip (reference segmentation/module.py:135-145 calling
``resize_label`` from segmentation/dataset.py:23-31).  Here label
resizing is a jitted gather that reproduces PIL's NEAREST pixel mapping
bit-exactly, and logits upsampling uses half-pixel-centered bilinear
(= torch ``align_corners=False``, reference eval_valid.py:171).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_label_nearest(label: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour label resize matching ``PIL.Image.resize(NEAREST)``.

    Mapping: output pixel ``i`` reads input pixel
    ``floor((i + 0.5) * in/out)``.  This equals PIL's choice at every
    non-degenerate position; when the sampling center lands EXACTLY on
    an integer (only possible for rational in/out ratios), PIL's pick
    depends on its internal float rounding and may take the neighbor —
    a one-row/column difference we do not chase.

    Args:
      label: (..., H, W) integer labels.
      size: (out_h, out_w).

    Returns:
      (..., out_h, out_w) labels with the same dtype.
    """
    h, w = label.shape[-2], label.shape[-1]
    oh, ow = size
    ys = jnp.floor((jnp.arange(oh, dtype=jnp.float32) + 0.5) * (h / oh))
    xs = jnp.floor((jnp.arange(ow, dtype=jnp.float32) + 0.5) * (w / ow))
    ys = jnp.clip(ys.astype(jnp.int32), 0, h - 1)
    xs = jnp.clip(xs.astype(jnp.int32), 0, w - 1)
    return label[..., ys, :][..., :, xs]


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int],
                    channel_last: bool = True) -> jnp.ndarray:
    """Half-pixel bilinear resize (torch ``align_corners=False`` semantics).

    Args:
      x: (..., H, W, C) if channel_last else (..., H, W).
      size: (out_h, out_w).
    """
    if channel_last:
        out_shape = (*x.shape[:-3], *size, x.shape[-1])
    else:
        out_shape = (*x.shape[:-2], *size)
    return jax.image.resize(x, out_shape, method="linear")
