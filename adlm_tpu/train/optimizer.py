"""Phase-wise optimizers with per-group LRs.

Reproduces the reference's three training phases
(reference segmentation/module.py:333-403 + train_and_test.py:144-190):

* **warmup (phase 0)** — add-on layers + ASPP (weights *and* biases) at
  the warm LR with weight decay; prototype vectors at the warm proto LR
  without decay; everything else frozen.
* **joint (phase 1)** — backbone convs at 1× LR, ASPP weights and biases
  at 10× (the reference's "20x" group also gets ``10 * lr``,
  module.py:372), add-ons and prototypes at their own LRs; last layer
  frozen; polynomial LR decay over ``max_steps // iter_size`` updates.
* **last (phase 2)** — only the last layer trains.

Frozen backbone BN never appears in params at all (constants
collection), mirroring the reference where ``get_params`` yields only
Conv2d parameters (reference segmentation/utils.py:42-61).

torch.optim.Adam's ``weight_decay`` adds ``wd·param`` to the gradient
*before* the moment updates (L2, not decoupled) — replicated with
``optax.add_decayed_weights`` ahead of ``scale_by_adam``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import optax

from adlm_tpu.core.config import TrainConfig

# param-group labels
BACKBONE = "backbone"     # reference "1x": conv weights in res layers
ASPP_W = "aspp_w"         # reference "10x"
ASPP_B = "aspp_b"         # reference "20x" (also lr*10, module.py:372)
ADD_ON = "add_on"
PROTOS = "protos"
LAST = "last"
FROZEN = "frozen"


def label_params(params: Any) -> Any:
    """Map each param leaf to its optimizer group by tree path."""

    def label(path, _leaf) -> str:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "prototype_vectors" in keys:
            return PROTOS
        if "last_layer" in keys:
            return LAST
        if "add_on" in keys:
            return ADD_ON
        if "aspp" in keys:
            return ASPP_B if keys[-1] == "bias" else ASPP_W
        if "features" in keys:
            return BACKBONE
        return FROZEN

    return jax.tree_util.tree_map_with_path(label, params)


def poly_schedule(base_lr: float, max_updates: int,
                  power: float) -> optax.Schedule:
    """lr(u) = base · (1 − u/max)^power (deeplab PolynomialLR,
    imported at reference segmentation/module.py:14, used :395-401)."""

    def sched(count):
        frac = 1.0 - jax.numpy.minimum(count, max_updates) / max_updates
        return base_lr * frac ** power

    return sched


def _adam(lr_or_sched, weight_decay: float = 0.0) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    if callable(lr_or_sched):
        parts.append(optax.scale_by_schedule(lambda c: -lr_or_sched(c)))
    else:
        parts.append(optax.scale(-lr_or_sched))
    return optax.chain(*parts)


def make_optimizer(cfg: TrainConfig, phase: int,
                   max_steps: int | None = None) -> optax.GradientTransformation:
    """Optimizer for a training phase (0=warmup, 1=joint, 2=last)."""
    zero = optax.set_to_zero()
    if phase == 0:
        groups: Dict[str, optax.GradientTransformation] = {
            ADD_ON: _adam(cfg.warm_optimizer_lr_add_on_layers,
                          cfg.warm_optimizer_weight_decay),
            ASPP_W: _adam(cfg.warm_optimizer_lr_add_on_layers,
                          cfg.warm_optimizer_weight_decay),
            ASPP_B: _adam(cfg.warm_optimizer_lr_add_on_layers,
                          cfg.warm_optimizer_weight_decay),
            PROTOS: _adam(cfg.warm_optimizer_lr_prototype_vectors),
            BACKBONE: zero, LAST: zero, FROZEN: zero,
        }
    elif phase == 1:
        assert max_steps is not None
        max_updates = max(max_steps // cfg.iter_size, 1)
        ramp = cfg.joint_lr_warmup_updates

        def sched_for(base):
            poly = poly_schedule(base, max_updates, cfg.poly_lr_power)
            if not ramp:
                return poly

            def sched(count):
                # linear 1/ramp → 1 over the first `ramp` updates,
                # then the reference poly decay (see
                # TrainConfig.joint_lr_warmup_updates for why)
                import jax.numpy as jnp
                scale = jnp.minimum((count + 1.0) / ramp, 1.0)
                return scale * poly(count)

            return sched

        wd = cfg.joint_optimizer_weight_decay
        lr_f = cfg.joint_optimizer_lr_features
        groups = {
            BACKBONE: _adam(sched_for(lr_f), wd),
            ASPP_W: _adam(sched_for(10 * lr_f), wd),
            ASPP_B: _adam(sched_for(10 * lr_f), wd),
            ADD_ON: _adam(sched_for(cfg.joint_optimizer_lr_add_on_layers), wd),
            PROTOS: _adam(sched_for(cfg.joint_optimizer_lr_prototype_vectors)),
            LAST: zero, FROZEN: zero,
        }
    elif phase == 2:
        groups = {
            LAST: _adam(cfg.last_layer_optimizer_lr),
            BACKBONE: zero, ASPP_W: zero, ASPP_B: zero,
            ADD_ON: zero, PROTOS: zero, FROZEN: zero,
        }
    else:
        raise ValueError(f"unknown phase {phase}")

    tx = optax.multi_transform(groups, label_params)
    if cfg.grad_clip_norm is not None:
        # clip BEFORE the per-group transforms so one exploding window
        # cannot poison the Adam moments (a single non-finite gradient
        # makes every later update NaN); reference parity is the
        # default None — the reference never clips
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                         tx)
    return tx
