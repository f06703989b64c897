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
    # antialias=False: torch F.interpolate(bilinear, align_corners=False)
    # does not antialias, and the MSC pyramid DOWNSCALES inputs — the
    # jax.image.resize default (antialias=True) would diverge there.
    return jax.image.resize(x, out_shape, method="linear", antialias=False)


def resize_bilinear_factor(x: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Bilinear resize by a SCALE FACTOR with torch semantics.

    torch ``F.interpolate(x, scale_factor=s)`` maps output coordinate
    ``o`` to input ``(o + 0.5)/s − 0.5`` using the GIVEN ``s`` — not the
    realized ``out/in`` ratio that ``jax.image.resize`` would use (for
    33px at s=0.5 those differ: 0.5 vs 16/33).  The reference's MSC
    input pyramid (reference segmentation/utils.py:91) relies on this,
    so the pyramid downscale goes through ``scale_and_translate``
    (verified bit-close vs torch in tests/test_train_step_golden.py).

    Args:
      x: (B, H, W, C).
      factor: scale factor; output is (B, int(H·s), int(W·s), C).
    """
    b, h, w, c = x.shape
    oh, ow = int(h * factor), int(w * factor)
    return jax.image.scale_and_translate(
        x, (b, oh, ow, c), (1, 2),
        jnp.array([factor, factor], jnp.float32),
        jnp.zeros((2,), jnp.float32), method="linear", antialias=False)
