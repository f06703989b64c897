"""Shared mixed-precision tree casts.

bf16 training convention (ProtoSeg / U-Noise / classification): params
and images are cast to bfloat16 *inside* the differentiated function so
gradients come back in the stored params' own dtype (float32); stored
state — params, optimizer moments, BN running statistics — always stays
float32.  BN running stats are never down-cast even transiently: flax
computes batch means/vars in float32 and the momentum update promotes
to the running var's dtype, so passing them through f32 keeps the
0.99·old + 0.01·new accumulation at full precision while activations
stay bfloat16 (the stats dtype does not leak into the normalized
output's dtype).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_bf16(tree):
    """float32 leaves → bfloat16 (others untouched)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def tree_f32(tree):
    """bfloat16 leaves → float32 (others untouched)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, tree)


def tree_cast(tree, compute_dtype):
    """float32 leaves → ``compute_dtype`` (no-op for float32)."""
    if jnp.dtype(compute_dtype) == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(compute_dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)
