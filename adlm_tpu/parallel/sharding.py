"""Sharded training and inference over a (data, model) mesh.

The reference is single-GPU end to end (Trainer.gpus=1 in every config);
this module is the scaling story the reference never had:

* **training** — batch sharded over the ``data`` axis, parameters and
  optimizer state replicated; XLA inserts the gradient ``psum`` over ICI
  from the sharding annotations alone (the scaling-book recipe: pick a
  mesh, annotate, let the compiler place collectives).
* **full-res inference** — images sharded over ``data`` (batch) and the
  ``model`` axis splits H (spatial / "context" parallelism for
  2048×1024 eval); XLA handles conv halo exchanges.
* prototype banks are small (≤210×64) so they stay replicated by
  default; `prototype_sharding` exists for much larger banks.

Multi-host: initialize ``jax.distributed`` first; the same annotations
then span DCN.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adlm_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    prototype_sharding,
    replicated,
    spatial_sharding,
)
from adlm_tpu.core.config import ExperimentConfig
from adlm_tpu.models.ppnet import PPNet


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a train state across the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.device_put(state, repl)


def make_sharded_train_step(model: PPNet, cfg: ExperimentConfig, phase: int,
                            mesh: Mesh, max_steps: Optional[int] = None,
                            donate: bool = False):
    """Train step with explicit shardings: super-batch
    (iter_size, micro_bs, H, W, C) sharded on micro_bs over ``data``.
    ``donate=True`` updates state in place (input state must not be
    reused), halving peak params+moments HBM."""
    from adlm_tpu.train.protoseg import make_train_step

    inner = make_train_step(model, cfg, phase, max_steps)
    repl = replicated(mesh)
    batch_img = NamedSharding(mesh, P(None, DATA_AXIS))
    batch_lab = NamedSharding(mesh, P(None, DATA_AXIS))

    return jax.jit(
        inner.__wrapped__,  # re-jit the underlying fn with shardings
        in_shardings=(repl, batch_img, batch_lab),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def prototype_parallel_params(params: Any, mesh: Mesh) -> Any:
    """Tensor-parallel placement of the prototype head: the
    ``prototype_vectors`` (P, C) bank and the ``last_layer`` (P, K)
    weight are sharded over the ``model`` axis on their prototype dim;
    everything else is replicated.  The head's two matmuls partition
    cleanly — each shard computes distances/activations for its own
    prototype slice and the logits contraction over P becomes a psum —
    the scaling story for prototype banks too large to replicate.
    Combine with ``make_sharded_inference_fn(...,
    prototype_parallel=True)``."""
    proto = prototype_sharding(mesh)
    repl = replicated(mesh)

    def place(path, x):
        key = getattr(path[0], "key", None) if path else None
        return jax.device_put(
            x, proto if key in ("prototype_vectors", "last_layer")
            else repl)

    return jax.tree_util.tree_map_with_path(place, params)


def make_sharded_inference_fn(model: PPNet, num_classes: int, mesh: Mesh,
                              spatial: bool = True,
                              with_stats: bool = False,
                              prototype_parallel: bool = False,
                              stats_upsampled: bool = False,
                              normalize=None,
                              stats_exact: bool = False):
    """Full-res eval fn: batch over ``data``, H over ``model`` (spatial
    sharding — the segmentation analogue of context parallelism).

    ``prototype_parallel=True`` keeps the params' own (committed)
    shardings instead of forcing replication — pass params through
    `prototype_parallel_params` first to run the prototype head
    tensor-parallel over the ``model`` axis.  (On TPU the fused Pallas
    head gathers the local bank per shard; the pure-XLA lowering
    partitions the head's matmuls fully.)

    ``stats_upsampled``/``normalize`` pass through to
    ``make_inference_fn`` (upsampled-distance statistics; in-jit raw
    uint8 normalization) so every CLI eval mode can run sharded."""
    from adlm_tpu.interpret.evaluate import make_inference_fn

    inner = make_inference_fn(model, num_classes, with_stats,
                              stats_upsampled, normalize=normalize,
                              stats_exact=stats_exact)
    repl = replicated(mesh)
    if spatial:
        img_shard = lab_shard = spatial_sharding(mesh)
    else:
        img_shard = lab_shard = NamedSharding(mesh, P(DATA_AXIS))

    # with_stats adds the two (B, n) sample-coordinate args (replicated)
    extra = (repl, repl) if with_stats else ()
    params_sharding = None if prototype_parallel else repl
    return jax.jit(
        inner.__wrapped__,
        in_shardings=(params_sharding, repl, repl, img_shard, lab_shard)
        + extra,
        out_shardings=None,
    )


def make_sharded_utility_step(cfg, mesh: Mesh, donate: bool = False,
                              raw: bool = False):
    """dp-sharded U-Noise utility train step: batch over ``data``,
    UNet params/optimizer state replicated; gradient AND batch-norm
    batch-statistics reductions become psums over ICI (flax BatchNorm
    computes batch means/vars with global reductions, so sharded-batch
    running stats equal the single-device ones up to fp reassociation).
    """
    from adlm_tpu.train.unoise import make_utility_train_step

    inner = make_utility_train_step(cfg, raw=raw)
    repl = replicated(mesh)
    dp = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        inner.__wrapped__,
        in_shardings=(repl, dp, dp),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_cls_step(model: PPNet, cfg, phase: str, mesh: Mesh,
                          steps_per_epoch: int = 1,
                          donate: bool = False):
    """dp-sharded classification (legacy ProtoPNet) train step: the
    batch-80 CUB budget sharded over ``data``, params/optimizer state
    replicated. The CE / cluster / separation losses are batch means,
    so GSPMD lowers them to psums over ICI; VGG stems have no BN, and
    for *_bn stems the batch-stats reduction is global like the U-Noise
    case (reference train_and_test.py:37-99 is single-GPU)."""
    from adlm_tpu.train.classification import make_cls_train_step

    inner = make_cls_train_step(model, cfg, phase, steps_per_epoch)
    repl = replicated(mesh)
    dp = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        inner.__wrapped__,
        in_shardings=(repl, dp, dp),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_noise_step(cfg, mesh: Mesh, donate: bool = False,
                            raw: bool = False):
    """dp-sharded U-Noise noise-model step (frozen utility replicated;
    the per-step RNG is replicated so every shard draws the same noise
    for its own batch slice)."""
    from adlm_tpu.train.unoise import make_noise_train_step

    inner = make_noise_train_step(cfg, raw=raw)
    repl = replicated(mesh)
    dp = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        inner.__wrapped__,
        in_shardings=(repl, dp, dp, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
