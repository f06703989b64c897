"""In-jit input normalization — the single copy of the raw-uint8 path.

``(u8→f32)/255 − mean then /std`` is the same f32 op sequence as the
host path (``SegmentationDataset.get_eval_item``, reference
dataset.py:119-173 Normalize), run on device so full-res inputs ship
as uint8: 4× less host→device traffic and a 4× smaller input device
buffer (the remote relay wedges on ≳400 MB buffers — CLAUDE.md).
Equal to the host path at fp-ulp level (XLA may fuse the division as a
reciprocal-multiply); integer eval metrics observed bit-identical.

Every in-jit consumer (eval, windowed eval, push, serving export) MUST
use this helper — a drifted copy once shipped a push path that forgot
the mean/std step entirely.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def normalize_in_jit(images: jnp.ndarray,
                     normalize: Optional[Tuple] = None) -> jnp.ndarray:
    """uint8 (or f32-in-[0,255]) images → normalized f32.

    ``normalize=(mean, std)`` applies the full host sequence; ``None``
    returns the input unchanged (already-normalized f32 inputs).
    """
    if normalize is None:
        return images
    mean = jnp.asarray(normalize[0], jnp.float32)
    std = jnp.asarray(normalize[1], jnp.float32)
    return (images.astype(jnp.float32) / 255.0 - mean) / std
