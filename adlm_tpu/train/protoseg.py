"""ProtoSeg training: jitted, sharded, gradient-accumulated train step.

Replaces the reference's manual-optimization Lightning loop
(reference segmentation/module.py:119-261).  Differences by design:

* the whole ``iter_size`` gradient-accumulation window is ONE jit call —
  a ``lax.scan`` over microbatches accumulates mean gradients, then a
  single optimizer update fires (the reference backpropagates
  ``loss/iter_size`` per microbatch and steps every 5th,
  module.py:236-243 — same math, 5× fewer dispatches).
* labels are resized on device with a PIL-exact nearest gather — the
  reference bounces every label GPU→CPU→PIL→GPU per step
  (module.py:135-145).
* the KLD term is the vectorized op (ops/losses.py), fed with
  *distances*, matching the reference which passes the forward's
  distance maps as "patch activations" (module.py:137-142 with
  ``return_activations=False`` → model.py:283 returns distances).
* batch is sharded over the mesh ``data`` axis; gradients reduce over
  ICI automatically under jit.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from adlm_tpu.core.config import ExperimentConfig
from adlm_tpu.models.ppnet import PPNet, default_proto_class
from adlm_tpu.ops.losses import (
    cross_entropy_ignore,
    kld_prototype_loss,
    masked_l1,
)
from adlm_tpu.ops.resize import resize_label_nearest


@flax.struct.dataclass
class ProtoSegState:
    params: Any
    constants: Any
    opt_state: Any
    proto_class: jnp.ndarray
    step: jnp.ndarray


def init_protoseg_state(model: PPNet, cfg: ExperimentConfig, phase: int,
                        max_steps: Optional[int], rng: jax.Array,
                        sample_input: jnp.ndarray,
                        params: Any = None, constants: Any = None,
                        proto_class: Optional[jnp.ndarray] = None
                        ) -> ProtoSegState:
    """Fresh state; pass ``params``/``constants`` to continue from a
    previous phase (the reference reloads ``warmup_last.pth`` between
    phases, train.py:150-154)."""
    if params is None or constants is None:
        variables = model.init(rng, sample_input)
        params = variables["params"]
        constants = variables.get("constants", {})
    tx = _make_tx(cfg, phase, max_steps)
    opt_state = tx.init(params)
    if proto_class is None:
        proto_class = default_proto_class(cfg.model.num_prototypes,
                                          cfg.model.num_classes)
    return ProtoSegState(params=params, constants=constants,
                         opt_state=opt_state, proto_class=proto_class,
                         step=jnp.zeros((), jnp.int32))


def _make_tx(cfg: ExperimentConfig, phase: int, max_steps: Optional[int]):
    from adlm_tpu.train.optimizer import make_optimizer
    return make_optimizer(cfg.train, phase, max_steps)


def _single_output_loss(logits: jnp.ndarray, distances: jnp.ndarray,
                        labels: jnp.ndarray, proto_class: jnp.ndarray,
                        cfg: ExperimentConfig,
                        groups: Optional[int] = None,
                        image_valid: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss terms for one MSC output scale
    (reference segmentation/module.py:142-228).

    ``groups=G`` computes the fused-accumulation loss: the batch is G
    concatenated microbatches and each term is the mean over groups of
    the per-group mean — gradient-identical to accumulating G separate
    microbatch losses (see make_train_step).

    ``image_valid`` is an optional (B,) bool mask: False entries
    (padded/wrapped tail images in a fixed-shape eval batch) contribute
    to no CE pixel, no accuracy count, and no KLD pair — the eval-batch
    analogue of the CLI's ``n_real`` exclusion (cli.py)."""
    t = cfg.train
    B = logits.shape[0]
    h, w = logits.shape[1], logits.shape[2]

    # labels may ship as uint8 (4× less relay traffic; train ids ≤ 31)
    # — cast before ANY arithmetic so the void-1 subtraction below
    # can't wrap (same in-jit cast rule as the eval consumers)
    labels = labels.astype(jnp.int32)
    # nearest-resize full-window labels to the output grid on device
    target = resize_label_nearest(labels, (h, w))           # (B, h, w)
    target_flat = target.reshape(B * h * w)
    logits_flat = logits.reshape(B * h * w, -1)

    if t.ignore_void_class:
        valid = target_flat != 0
        ce_labels = jnp.maximum(target_flat - 1, 0)
        kld_labels = (target.reshape(B, h * w) if t.kld_raw_label_indexing
                      else target.reshape(B, h * w) - 1)
    else:
        valid = jnp.ones_like(target_flat, dtype=bool)
        ce_labels = target_flat
        kld_labels = target.reshape(B, h * w)

    if image_valid is not None:
        # target_flat is image-major contiguous, so a per-image repeat
        # aligns; -1 matches no prototype class, so masked images
        # produce no valid KLD pixel distribution either
        valid = valid & jnp.repeat(image_valid, h * w)
        kld_labels = jnp.where(image_valid[:, None], kld_labels, -1)

    ce, n_correct = cross_entropy_ignore(logits_flat, ce_labels, valid,
                                         groups=groups)

    if t.loss_weight_kld > 0.0:
        acts = distances.reshape(B, h * w, -1)
        kld = kld_prototype_loss(acts, kld_labels, proto_class,
                                 groups=groups)
    else:
        kld = jnp.zeros(())

    metrics = {
        "cross_entropy": ce,
        "kld_loss": kld,
        "n_correct": n_correct.astype(jnp.float32),
        "n_patches": jnp.sum(valid).astype(jnp.float32),
    }
    return ce, metrics


def loss_fn(params: Any, constants: Any, model: PPNet,
            proto_class: jnp.ndarray, cfg: ExperimentConfig,
            batch: Tuple[jnp.ndarray, jnp.ndarray], train: bool,
            groups: Optional[int] = None,
            image_valid: Optional[jnp.ndarray] = None
            ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full training loss over all MSC output scales
    (reference module.py:141-228: per-scale losses averaged)."""
    images, labels = batch
    t = cfg.train
    if images.dtype == jnp.uint8:
        # wire_uint8 train windows: raw pixels on the wire, the same
        # in-jit (x/255 − mean)/std every uint8 eval/push consumer uses
        # (the loader's normalization was inverted host-side in
        # train/pipeline.py::ship — see TrainConfig.wire_uint8)
        from adlm_tpu.ops.normalize import normalize_in_jit
        images = normalize_in_jit(images, (cfg.data.mean, cfg.data.std))
    if t.compute_dtype == "bfloat16":
        # bf16 forward/backward: params cast inside the differentiated
        # function so gradients come back in the params' own dtype (f32)
        fwd_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
        images = images.astype(jnp.bfloat16)
    else:
        fwd_params = params
    variables = {"params": fwd_params, "constants": constants}
    if t.remat and train:
        apply = jax.checkpoint(
            lambda v, x: model.apply(v, x, train=True))
        outputs = apply(variables, images)
    else:
        outputs = model.apply(variables, images, train=train)
    if not isinstance(outputs, list):
        outputs = [outputs]

    n_out = len(outputs)
    total = jnp.zeros(())
    agg: Dict[str, jnp.ndarray] = {}
    for logits, distances in outputs:
        ce, m = _single_output_loss(logits, distances, labels,
                                    proto_class, cfg, groups=groups,
                                    image_valid=image_valid)
        l1 = masked_l1(params["last_layer"], proto_class)
        out_loss = (t.loss_weight_crs_ent * ce
                    + t.loss_weight_kld * m["kld_loss"]
                    + t.loss_weight_l1 * l1)
        total = total + out_loss / n_out
        for k, v in m.items():
            if k in ("n_correct", "n_patches"):
                agg[k] = agg.get(k, 0.0) + v
            else:
                agg[k] = agg.get(k, 0.0) + v / n_out
    agg["loss"] = total
    agg["l1"] = masked_l1(params["last_layer"], proto_class)
    return total, agg


def make_train_step(model: PPNet, cfg: ExperimentConfig, phase: int,
                    max_steps: Optional[int] = None,
                    donate: bool = False):
    """Jitted step over a (iter_size, micro_bs, H, W, 3) super-batch.

    Returns ``step(state, images, labels) -> (state, metrics)``; metrics
    are means over the accumulation window (the reference logs the mean
    of the 5 microbatch losses, module.py:251-259).

    ``donate=True`` updates parameters and optimizer moments in place
    (halves peak HBM) — the input state must not be reused afterwards.
    """
    tx = _make_tx(cfg, phase, max_steps)

    @functools.partial(jax.jit,
                       donate_argnums=(0,) if donate else ())
    def step(state: ProtoSegState, images: jnp.ndarray,
             labels: jnp.ndarray):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        n_micro = images.shape[0]

        if cfg.train.fused_accumulation:
            # one (iter_size·bs)-batch forward/backward; the grouped
            # losses make the scalar exactly (1/G)·Σ_g loss_g, so the
            # gradient equals the accumulated-scan mean
            flat_img = images.reshape(-1, *images.shape[2:])
            flat_lab = labels.reshape(-1, *labels.shape[2:])
            (_, metrics), grads = grad_fn(
                state.params, state.constants, model, state.proto_class,
                cfg, (flat_img, flat_lab), True, n_micro)
            # observability: the global gradient norm is the earliest
            # divergence signal (a NaN/exploding window shows up here
            # a full checkpoint cadence before the loss curve does)
            metrics["grad_norm"] = optax.global_norm(grads)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=new_params,
                                      opt_state=new_opt,
                                      step=state.step + 1)
            return new_state, metrics

        def micro(carry, xs):
            grads_acc, metrics_acc = carry
            img, lab = xs
            (_, metrics), grads = grad_fn(
                state.params, state.constants, model, state.proto_class,
                cfg, (img, lab), True)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            metrics_acc = {k: metrics_acc[k] + metrics[k] for k in metrics_acc}
            return (grads_acc, metrics_acc), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        zero_metrics = {k: jnp.zeros(()) for k in
                        ("cross_entropy", "kld_loss", "n_correct",
                         "n_patches", "loss", "l1")}
        (grads, metrics), _ = jax.lax.scan(
            micro, (zero_grads, zero_metrics), (images, labels))
        grads = jax.tree.map(lambda g: g / n_micro, grads)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v / n_micro for k, v in metrics.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        # counts should stay sums, not means
        metrics["n_correct"] = metrics["n_correct"] * n_micro
        metrics["n_patches"] = metrics["n_patches"] * n_micro
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  step=state.step + 1)
        return new_state, metrics

    return step


def make_eval_step(model: PPNet, cfg: ExperimentConfig):
    """Jitted metric pass over one (B, H, W, 3) batch.

    ``n_valid`` (dynamic scalar, so it costs no recompiles) masks out
    the trailing ``B - n_valid`` images: fixed-shape val batches pad the
    final partial batch by wrapping to the dataset start (a fresh batch
    shape is a multi-minute remote compile, CLAUDE.md), and the wrapped
    images must contribute nothing to the metrics — otherwise
    best-checkpoint selection on small splits is biased toward the
    first images (reference validates exact batches,
    segmentation/module.py:280-297)."""

    @jax.jit
    def _step(state: ProtoSegState, images: jnp.ndarray,
              labels: jnp.ndarray, n_valid: jnp.ndarray):
        image_valid = jnp.arange(images.shape[0]) < n_valid
        _, metrics = loss_fn(state.params, state.constants, model,
                             state.proto_class, cfg, (images, labels),
                             False, image_valid=image_valid)
        return metrics

    def step(state: ProtoSegState, images: jnp.ndarray,
             labels: jnp.ndarray, n_valid: Optional[int] = None):
        if n_valid is None:
            n_valid = images.shape[0]
        return _step(state, images, labels,
                     jnp.asarray(n_valid, jnp.int32))

    def lower(state, images, labels, n_valid=None):
        # precompile path: n_valid is a dynamic scalar input, so one
        # abstract lowering covers every n_valid value
        if n_valid is None:
            n_valid = jax.ShapeDtypeStruct((), jnp.int32)
        return _step.lower(state, images, labels, n_valid)

    step.lower = lower
    return step
