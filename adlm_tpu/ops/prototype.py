"""Prototype-layer compute: L2 distances, similarities, fused head.

The reference computes prototype distances as an "L2 convolution"
(``‖x‖² − 2x·p + ‖p‖²`` via three ``F.conv2d`` calls — reference
model.py:203-221), then reshapes to per-patch rows, applies
``log((d+1)/(d+ε))`` (model.py:231-237) and a bias-free linear layer
(model.py:266-283).

Prototype kernels are always 1×1 in every shipped config, so on TPU
this whole chain is two small matmuls with an element-wise transform in
between:

    d      = relu(‖x‖² − 2·xᵀP + ‖P‖²)      # (N, P)   — MXU matmul
    act    = log((d+1)/(d+ε))                # (N, P)   — VPU
    logits = act · W                          # (N, C)   — MXU matmul

`prototype_head` fuses all three in a single Pallas kernel so the (N, P)
distance/activation tensors never round-trip HBM during full-resolution
inference (N = B·H·W ≈ 33k patches for a 2048×1024 Cityscapes image).
A pure-XLA composition (`prototype_head_reference`) is the numerical
reference and the CPU/backward path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-4  # reference model.py:50


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def l2_distances(x: jnp.ndarray, prototypes: jnp.ndarray) -> jnp.ndarray:
    """Squared-L2 distance from each row of ``x`` to each prototype.

    Args:
      x: (..., C) feature patches.
      prototypes: (P, C) prototype vectors (1×1 kernels flattened).

    Returns:
      (..., P) distances, clamped at 0 (reference model.py:219 relu).
    """
    x = x.astype(jnp.float32)
    p = prototypes.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    p2 = jnp.sum(p * p, axis=-1)
    xp = jnp.einsum("...c,pc->...p", x, p,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(x2 - 2.0 * xp + p2, 0.0)


def weighted_l2_distances(x: jnp.ndarray, prototypes: jnp.ndarray,
                          weights: jnp.ndarray) -> jnp.ndarray:
    """Per-channel weighted squared-L2 distance
    (reference model.py:177-201 ``_weighted_l2_convolution``):
    ``d[n,p] = Σ_c w[p,c]·(x[n,c] − proto[p,c])²``.

    Args:
      x: (..., C); prototypes: (P, C); weights: (P, C) non-negative.
    """
    x = x.astype(jnp.float32)
    p = prototypes.astype(jnp.float32)
    w = weights.astype(jnp.float32)
    x2w = jnp.einsum("...c,pc->...p", x * x, w,
                     precision=jax.lax.Precision.HIGHEST)
    xpw = jnp.einsum("...c,pc->...p", x, w * p,
                     precision=jax.lax.Precision.HIGHEST)
    p2w = jnp.sum(w * p * p, axis=-1)
    return jnp.maximum(x2w - 2.0 * xpw + p2w, 0.0)


def distance_to_similarity(distances: jnp.ndarray,
                           activation: str = "log",
                           epsilon: float = EPSILON) -> jnp.ndarray:
    """Distance→similarity transform (reference model.py:231-237)."""
    if activation == "log":
        return jnp.log((distances + 1.0) / (distances + epsilon))
    if activation == "linear":
        return -distances
    raise ValueError(f"unknown prototype activation {activation!r}")


def prototype_head_reference(
    x: jnp.ndarray,
    prototypes: jnp.ndarray,
    last_layer_weight: jnp.ndarray,
    activation: str = "log",
    epsilon: float = EPSILON,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-XLA fused head. Returns (logits (..., K), distances (..., P))."""
    d = l2_distances(x, prototypes)
    act = distance_to_similarity(d, activation, epsilon)
    logits = jnp.einsum("...p,pk->...k", act,
                        last_layer_weight.astype(jnp.float32))
    return logits, d


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _head_kernel(x_ref, pt_ref, p2_ref, w_ref, logits_ref, dist_ref,
                 *, epsilon: float, linear_act: bool, emit_dist: bool):
    """One row-tile: distances + similarity + last layer, all in VMEM.

    x_ref:      (TN, C)   feature rows (bf16 or f32)
    pt_ref:     (C, P)    prototypes, transposed
    p2_ref:     (1, P)    prototype squared norms (f32)
    w_ref:      (P, K)    last-layer weight
    logits_ref: (TN, K)
    dist_ref:   (TN, P)   optional distances output
    """
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    x2 = jnp.sum(xf * xf, axis=1, keepdims=True)  # (TN, 1)
    # HIGHEST: full-f32 MXU passes — distance argmin parity in push
    # depends on accurate distances (bf16 default is ~1e-3 rel error).
    # For bf16 inputs the MXU is already at native precision (HIGHEST is
    # rejected by Mosaic for bf16 lhs).
    precision = (None if x.dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    xp = jnp.dot(x, pt_ref[:], preferred_element_type=jnp.float32,
                 precision=precision)  # (TN, P)
    d = jnp.maximum(x2 - 2.0 * xp + p2_ref[:], 0.0)
    if emit_dist:
        dist_ref[:] = d
    if linear_act:
        act = -d
    else:
        act = jnp.log((d + 1.0) / (d + epsilon))
    logits_ref[:] = jnp.dot(act, w_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def prototype_head(x: jnp.ndarray,
                   prototypes: jnp.ndarray,
                   last_layer_weight: jnp.ndarray,
                   activation: str = "log",
                   epsilon: float = EPSILON,
                   return_distances: bool = True):
    """Fused prototype head: logits (+ distances) from feature patches.

    Args:
      x: (..., C) feature rows (any leading shape; flattened internally).
      prototypes: (P, C).
      last_layer_weight: (P, K) — note row-major (transposed vs torch
        ``nn.Linear.weight``).

    Returns:
      (logits (..., K), distances (..., P)); distances is None when
      ``return_distances=False`` (saves the HBM write during eval).
    """
    logits, dist = _head_fwd_impl(x, prototypes, last_layer_weight,
                                  activation, epsilon, return_distances)
    return logits, dist


def _head_fwd_impl(x, prototypes, last_layer_weight, activation, epsilon,
                   return_distances):
    # Platform choice happens at LOWERING time, not trace time: a single
    # traced program (e.g. a jax.export artifact lowered for
    # ("cpu", "tpu")) gets the Pallas kernel on TPU and the pure-XLA
    # composition elsewhere.  Under a single-platform jit the branch is
    # resolved statically — no cond survives in the compiled program.
    def _xla_branch(x, prototypes, last_layer_weight):
        logits, d = prototype_head_reference(
            x, prototypes, last_layer_weight, activation, epsilon)
        return (logits, d) if return_distances else (logits,)

    def _pallas_branch(x, prototypes, last_layer_weight):
        return _head_fwd_pallas(x, prototypes, last_layer_weight,
                                activation, epsilon, return_distances)

    out = jax.lax.platform_dependent(
        x, prototypes, last_layer_weight,
        tpu=_pallas_branch, default=_xla_branch)
    return out[0], (out[1] if return_distances else None)


def _head_fwd_pallas(x, prototypes, last_layer_weight, activation, epsilon,
                     return_distances):
    orig_shape = x.shape
    C = orig_shape[-1]
    P, K = last_layer_weight.shape
    N = 1
    for s in orig_shape[:-1]:
        N *= s
    x2d = x.reshape(N, C)

    TN = 512
    Np = _round_up(max(N, TN), TN)
    Cp = _round_up(C, 128)
    Pp = _round_up(P, 128)
    Kp = _round_up(K, 128)

    xp = jnp.zeros((Np, Cp), x2d.dtype).at[:N, :C].set(x2d)
    pt = jnp.zeros((Cp, Pp), x2d.dtype).at[:C, :P].set(
        prototypes.T.astype(x2d.dtype))
    p2 = jnp.zeros((1, Pp), jnp.float32).at[:, :P].set(
        jnp.sum(prototypes.astype(jnp.float32) ** 2, axis=-1)[None, :])
    w = jnp.zeros((Pp, Kp), jnp.float32).at[:P, :K].set(
        last_layer_weight.astype(jnp.float32))

    grid = (Np // TN,)
    kernel = functools.partial(
        _head_kernel, epsilon=epsilon,
        linear_act=(activation == "linear"), emit_dist=return_distances)

    out_shapes = [jax.ShapeDtypeStruct((Np, Kp), jnp.float32)]
    out_specs = [pl.BlockSpec((TN, Kp), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if return_distances:
        out_shapes.append(jax.ShapeDtypeStruct((Np, Pp), jnp.float32))
        out_specs.append(pl.BlockSpec((TN, Pp), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    else:
        # dummy 1-row output so the kernel signature stays fixed
        out_shapes.append(jax.ShapeDtypeStruct((TN, Pp), jnp.float32))
        out_specs.append(pl.BlockSpec((TN, Pp), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))

    flops = 2 * Np * Cp * Pp + 2 * Np * Pp * Kp
    logits_p, dist_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, Cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=Np * (Cp + Pp + Kp) * 4,
            transcendentals=Np * Pp),
    )(xp, pt, p2, w)

    logits = logits_p[:N, :K].reshape(*orig_shape[:-1], K)
    if return_distances:
        return logits, dist_p[:N, :P].reshape(*orig_shape[:-1], P)
    return (logits,)


def _head_fwd(x, prototypes, last_layer_weight, activation, epsilon,
              return_distances):
    out = _head_fwd_impl(x, prototypes, last_layer_weight, activation,
                         epsilon, return_distances)
    return out, (x, prototypes, last_layer_weight)


def _head_bwd(activation, epsilon, return_distances, res, g):
    """Backward via the XLA composition (training shapes are small)."""
    x, prototypes, w = res
    g_logits, g_dist = g
    xf = x.astype(jnp.float32)
    p = prototypes.astype(jnp.float32)
    d = l2_distances(xf, p)  # (..., P)

    if activation == "log":
        # act = log(d+1) - log(d+eps); dact/dd = 1/(d+1) - 1/(d+eps)
        dact_dd = 1.0 / (d + 1.0) - 1.0 / (d + epsilon)
    else:
        dact_dd = -jnp.ones_like(d)

    act_bar = jnp.einsum("...k,pk->...p", g_logits, w.astype(jnp.float32))
    d_bar = act_bar * dact_dd
    if return_distances and g_dist is not None:
        d_bar = d_bar + g_dist
    # clamp: gradient flows only where d > 0 (relu in the forward)
    d_bar = jnp.where(d > 0.0, d_bar, 0.0)

    # d = x2 - 2 x.p + p2  =>  dx = 2 d_bar (x - p_j summed), dp similar
    sum_dbar = jnp.sum(d_bar, axis=-1, keepdims=True)          # (..., 1)
    gx = 2.0 * (xf * sum_dbar - jnp.einsum("...p,pc->...c", d_bar, p))
    gp = 2.0 * (p * jnp.sum(d_bar, axis=tuple(range(d_bar.ndim - 1)))[:, None]
                - jnp.einsum("...p,...c->pc", d_bar, xf))
    act = distance_to_similarity(d, activation, epsilon)
    gw = jnp.einsum("...p,...k->pk", act, g_logits)
    return gx.astype(x.dtype), gp.astype(prototypes.dtype), gw.astype(w.dtype)


prototype_head.defvjp(_head_fwd, _head_bwd)
