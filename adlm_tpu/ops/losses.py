"""Loss functions, fully vectorized for TPU.

* `cross_entropy_ignore` — per-patch CE with void masking (reference
  segmentation/module.py:156-165 drops void pixels before CE).
* `kld_prototype_loss` — the prototype-diversity loss.  The reference
  computes this with a Python triple loop over images × classes ×
  prototype pairs (reference segmentation/module.py:167-208, the #1 CPU
  hot spot); here it is a single masked-softmax + einsum program.
* `masked_l1` — L1 on off-class last-layer weights (module.py:213-218).
* `bce_with_logits` / `dice_coeff` — U-Noise utility losses (reference
  src/train_util.py:17, src/utils.py:2-12).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def cross_entropy_ignore(logits: jnp.ndarray,
                         labels: jnp.ndarray,
                         valid: jnp.ndarray | None = None,
                         groups: int | None = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean softmax cross-entropy over valid positions.

    Args:
      logits: (N, C) float.
      labels: (N,) int in [0, C); ignored where ``valid`` is False.
      valid: (N,) bool, or None for all-valid.
      groups: with an int G, positions are split into G equal
        contiguous groups and the loss is the mean over groups of the
        per-group valid-mean — the fused-accumulation equivalent of
        averaging G microbatch losses (each a mean over its own valid
        patches).  None keeps the single global mean.

    Returns:
      (scalar loss, scalar n_correct) — n_correct counts valid argmax hits
      (reference tracks patch accuracy at module.py:210-227).
    """
    logits = logits.astype(jnp.float32)
    n = logits.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, safe_labels[:, None], axis=-1)[:, 0]
    ce = logz - ll
    ce_masked = jnp.where(valid, ce, 0.0)
    if groups is None:
        denom = jnp.maximum(jnp.sum(valid), 1)
        loss = jnp.sum(ce_masked) / denom
    else:
        g_sum = jnp.sum(ce_masked.reshape(groups, -1), axis=1)
        g_n = jnp.sum(valid.reshape(groups, -1), axis=1)
        loss = jnp.mean(g_sum / jnp.maximum(g_n, 1))
    pred = jnp.argmax(logits, axis=-1)
    n_correct = jnp.sum(jnp.where(valid, pred == safe_labels, False))
    return loss, n_correct


def kld_prototype_loss(activations: jnp.ndarray,
                       labels: jnp.ndarray,
                       proto_class: jnp.ndarray,
                       groups: int | None = None) -> jnp.ndarray:
    """Symmetric-KLD prototype-diversity loss, vectorized.

    For each image and each class present in it, the activations of that
    class's prototypes over the class's pixels are treated as
    distributions (log-softmax over pixels); for every same-class
    prototype pair the symmetric KL divergence is computed and the loss
    is ``mean(exp(−KLD))`` over all valid (image, class, pair) triples
    (reference segmentation/module.py:167-208).  A pair is valid when the
    class has ≥2 prototypes and the image has ≥2 pixels of the class
    (module.py:185-189).

    Class identity is an explicit per-prototype array (not contiguous
    blocks) so the same code covers pruned models, whose identity is
    ragged (reference model.py:311-336 slices it arbitrarily).

    Args:
      activations: (B, N, P) patch activations over flattened patches.
      labels: (B, N) int class indices; anything not matching a
        prototype class (e.g. void = -1) contributes to no distribution.
      proto_class: (P,) int class id per prototype.
      groups: with an int G, images are split into G equal contiguous
        groups and the loss is the mean over groups of the per-group
        pair-mean (0 for a group with no valid pairs) — the
        fused-accumulation equivalent of averaging G microbatch KLD
        losses.  None keeps the single batch-wide mean.

    Returns:
      scalar loss (0.0 when no valid pairs exist — the reference would
      crash on ``.item()`` in that case, module.py:232; we don't).
    """
    B, N, P = activations.shape
    acts = activations.astype(jnp.float32).transpose(0, 2, 1)  # (B, P, N)

    # per-prototype pixel mask: pixels of the prototype's own class
    mask = (labels[:, None, :] == proto_class[None, :, None])  # (B, P, N)
    pix_count = jnp.sum(mask, axis=-1)                         # (B, P)

    z = jnp.where(mask, acts, _NEG_INF)
    ls = jax.nn.log_softmax(z, axis=-1)                        # (B, P, N)
    ls_safe = jnp.where(mask, ls, 0.0)
    p = jnp.where(mask, jnp.exp(ls), 0.0)

    # H[b,j]       = Σ_h p_j·ls_j
    # cross[b,j,i] = Σ_h p_j·ls_i
    ent = jnp.sum(p * ls_safe, axis=-1)                        # (B, P)
    cross = jnp.einsum("bjn,bin->bji", p, ls_safe)             # (B, P, P)
    # KL(ls_i ‖ ls_j) with log inputs = Σ p_j (ls_j − ls_i) = H_j − cross[j,i]
    kld1 = ent[:, :, None] - cross                             # [j, i]
    sym = 0.5 * (kld1 + jnp.swapaxes(kld1, -1, -2))            # (B, P, P)

    same_class = proto_class[:, None] == proto_class[None, :]
    upper = jnp.triu(jnp.ones((P, P), dtype=bool), k=1)
    class_n_protos = jnp.sum(same_class, axis=-1)              # (P,)
    # pair (i, j) valid: same class, i<j, class has ≥2 protos (implied
    # by the pair existing) and the image has ≥2 pixels of the class
    valid = (same_class & upper)[None] & (pix_count[:, :, None] >= 2)
    del class_n_protos
    pair_vals = jnp.where(valid, jnp.exp(-sym), 0.0)
    if groups is None:
        count = jnp.sum(valid)
        return jnp.where(count > 0,
                         jnp.sum(pair_vals) / jnp.maximum(count, 1), 0.0)
    g_sum = jnp.sum(pair_vals.reshape(groups, -1), axis=1)
    g_count = jnp.sum(valid.reshape(groups, -1), axis=1)
    g_loss = jnp.where(g_count > 0, g_sum / jnp.maximum(g_count, 1), 0.0)
    return jnp.mean(g_loss)


def masked_l1(last_layer_weight: jnp.ndarray,
              proto_class: jnp.ndarray) -> jnp.ndarray:
    """L1 norm of last-layer weights outside each prototype's own class.

    ``l1_mask = 1 − identityᵀ`` in the reference (module.py:213-218); our
    weight is stored (P, C) so the mask is ``1 − identity``.
    """
    P, C = last_layer_weight.shape
    identity = (proto_class[:, None] == jnp.arange(C)[None, :])
    mask = 1.0 - identity.astype(jnp.float32)
    return jnp.sum(jnp.abs(last_layer_weight.astype(jnp.float32) * mask))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy with logits (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # log(1+exp(-|x|)) + max(x,0) - x*t  — numerically stable form
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def dice_coeff(pred: jnp.ndarray, target: jnp.ndarray,
               eps: float = 1e-10) -> jnp.ndarray:
    """Global (batch-flattened) dice coefficient (reference src/utils.py:2-12)."""
    m1 = pred.astype(jnp.float32).reshape(-1)
    m2 = target.astype(jnp.float32).reshape(-1)
    inter = jnp.sum(m1 * m2)
    return 2.0 * inter / (jnp.sum(m1) + jnp.sum(m2) + eps)
