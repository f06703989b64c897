"""ProtoPNet classification training driver.

The reference's ``main.py`` epoch loop (reference main.py:107-189,
which crashes as shipped on a kwarg typo at :103 — recorded bug):
warm epochs → joint epochs with a StepLR, periodic prototype push from
``push_start`` every 10 epochs, each push followed by last-layer
iterations; accuracy-gated checkpointing (reference save.py:4-11).
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core.checkpoint import CheckpointStore
from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.train.classification import (
    ClassificationConfig,
    ClassifierState,
    _unpack_batch,
    init_classifier_state,
    make_cls_eval_step,
    make_cls_push_batch_fn,
    make_cls_train_step,
    push_classification_prototypes,
)
from adlm_tpu.utils.logging import RunLogger

BatchIter = Callable[[], Iterable[Tuple[np.ndarray, np.ndarray]]]


def _epoch(step_fn, state, batches):
    n_correct = n_total = 0
    for batch in batches:
        images, labels = batch[0], batch[1]
        state, m = step_fn(state, jnp.asarray(images), jnp.asarray(labels))
        n_correct += float(m["n_correct"])
        n_total += images.shape[0]
    return state, n_correct / max(n_total, 1)


def _evaluate(eval_fn, state, batches):
    """Test accuracy; wrap-padded tail images (with_count batches) are
    excluded so they don't bias accuracy toward the first images."""
    n_correct = n_total = 0
    for batch in batches:
        images, labels, n_valid = _unpack_batch(batch)
        m = eval_fn(state, jnp.asarray(images), jnp.asarray(labels))
        n_correct += float(np.sum(np.asarray(m["correct"])[:n_valid]))
        n_total += n_valid
    return n_correct / max(n_total, 1)


def _cls_payload(state) -> dict:
    return {"params": dict(state.params),
            "batch_stats": dict(state.batch_stats),
            "proto_class": state.proto_class,
            "step": state.step}


def save_if_better(store: CheckpointStore, stage: str, state, acc: float,
                   best: float, threshold: float, log) -> float:
    """Accuracy-threshold-gated save (reference save.py:4-11)."""
    if acc > threshold and acc > best:
        store.save(stage, "best", _cls_payload(state))
        log(f"{stage}: saved at accuracy {acc:.4f}")
        return acc
    return best


def run_classification_training(
    cfg: ClassificationConfig,
    run_dir: str,
    train_batches: BatchIter,
    test_batches: BatchIter,
    push_batches: Optional[BatchIter] = None,
    num_epochs: Optional[int] = None,
    steps_per_epoch: Optional[int] = None,
    target_accuracy: float = 0.0,
    last_layer_iterations: int = 20,  # reference main.py:180 runs 20
    push_every: int = 10,  # reference: push_epochs = every 10th epoch
    pretrained_path: Optional[str] = None,
    mesh=None,  # (data,) mesh → dp-sharded train steps, psum over ICI
) -> ClassifierState:
    logger = RunLogger(run_dir, "classification")
    store = CheckpointStore(run_dir)
    model = PPNet(cfg=cfg.model)
    push_batches = push_batches or train_batches
    _save_cls_config(run_dir, cfg)

    if steps_per_epoch is None:
        # the reference's StepLR steps once per EPOCH; our schedule
        # counts optimizer updates, so it needs the real batches/epoch
        steps_per_epoch = max(sum(1 for _ in train_batches()), 1)

    sample, _ = next(iter(train_batches()))
    state = init_classifier_state(model, cfg, "warm",
                                  jax.random.PRNGKey(0),
                                  jnp.asarray(sample),
                                  steps_per_epoch=steps_per_epoch)

    if pretrained_path:
        # ImageNet stem init (reference resnet/vgg/densenet_features
        # load model-zoo weights for every pretrained=True stem)
        logger.log(f"Loading pretrained stem from {pretrained_path}")
        from adlm_tpu.utils.torch_import import (
            load_classification_backbone)
        if pretrained_path.endswith(".npz"):
            sd = dict(np.load(pretrained_path))
        else:
            import torch
            sd = torch.load(pretrained_path, map_location="cpu",
                            weights_only=True)
        p_host = jax.tree.map(np.asarray, dict(state.params))
        b_host = jax.tree.map(np.asarray, dict(state.batch_stats))
        report = load_classification_backbone(
            p_host, b_host, sd, cfg.model.base_architecture)
        logger.log(f"Loaded {len(report['loaded'])} tensors "
                   f"({len(report['unexpected_keys'])} unexpected)")
        state = state.replace(
            params=jax.tree.map(jnp.asarray, p_host),
            batch_stats=jax.tree.map(jnp.asarray, b_host))
    if mesh is not None:
        # train batches shard over `data`; eval/push run on the
        # replicated state (their batches aren't guaranteed divisible)
        from adlm_tpu.parallel.sharding import (
            make_sharded_cls_step, shard_state)
        state = shard_state(state, mesh)

        def _mk_step(phase):
            return make_sharded_cls_step(model, cfg, phase, mesh,
                                         steps_per_epoch)
    else:
        def _mk_step(phase):
            return make_cls_train_step(model, cfg, phase, steps_per_epoch)

    warm_step = _mk_step("warm")
    joint_step = _mk_step("joint")
    last_step = _mk_step("last")
    eval_fn = make_cls_eval_step(model, cfg)

    best = 0.0
    epochs = num_epochs if num_epochs is not None else cfg.num_train_epochs
    for epoch in range(epochs):
        if epoch < cfg.num_warm_epochs:
            state, train_acc = _epoch(warm_step, state, train_batches())
            stage = "warm"
        else:
            if epoch == cfg.num_warm_epochs:
                # fresh joint optimizer state at the phase switch
                state = init_classifier_state(
                    model, cfg, "joint", jax.random.PRNGKey(1),
                    jnp.asarray(sample), params=state.params,
                    batch_stats=state.batch_stats,
                    steps_per_epoch=steps_per_epoch)
            state, train_acc = _epoch(joint_step, state, train_batches())
            stage = "joint"
        acc = _evaluate(eval_fn, state, test_batches())
        logger.metrics(epoch, stage, "test", {"accuracy": acc,
                                              "train_accuracy": train_acc})
        best = save_if_better(store, "nopush", state, acc, best,
                              target_accuracy, logger.log)

        if epoch >= cfg.push_start and epoch % push_every == 0:
            logger.log(f"epoch {epoch}: prototype push")
            new_params, info = push_classification_prototypes(
                model, state, push_batches())
            state = state.replace(params=new_params)
            acc = _evaluate(eval_fn, state, test_batches())
            best = save_if_better(store, "push", state, acc, best,
                                  target_accuracy, logger.log)
            # last-layer convex optimization after each push; the
            # reference evaluates and conditionally saves after EVERY
            # iteration (main.py:180-189)
            state_l = init_classifier_state(
                model, cfg, "last", jax.random.PRNGKey(2),
                jnp.asarray(sample), params=state.params,
                batch_stats=state.batch_stats,
                steps_per_epoch=steps_per_epoch)
            for it in range(last_layer_iterations):
                state_l, _ = _epoch(last_step, state_l, train_batches())
                acc = _evaluate(eval_fn, state_l, test_batches())
                logger.metrics(epoch, f"push_last_{it}", "test",
                               {"accuracy": acc})
                best = save_if_better(store, "push", state_l, acc, best,
                                      target_accuracy, logger.log)
            state = state.replace(params=state_l.params,
                                  batch_stats=state_l.batch_stats)
    store.save("nopush", "last", _cls_payload(state))
    logger.close()
    return state


def _save_cls_config(run_dir: str, cfg: ClassificationConfig) -> None:
    import dataclasses
    import json
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "cls_config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_cls_config(run_dir: str) -> ClassificationConfig:
    import json
    from adlm_tpu.core.config import PPNetConfig
    with open(os.path.join(run_dir, "cls_config.json")) as f:
        d = json.load(f)
    model_d = d.pop("model")
    for k in ("deeplab_n_blocks", "atrous_rates", "msc_scales"):
        if k in model_d and isinstance(model_d[k], list):
            model_d[k] = tuple(model_d[k])
    return ClassificationConfig(model=PPNetConfig(**model_d), **d)
