"""ProtoSeg phase orchestration: warmup → joint → push → finetune.

Mirrors the reference driver (reference segmentation/train.py:34-233):

* phase 0 warmup for ``warmup_steps`` (skipped if 0)
* phase 1 joint for ``joint_steps`` with poly LR
* prototype push over the train split (eval transforms, no aug)
* phase 2 last-layer finetune with early stopping on val accuracy
* ``pruned=True`` skips to finetuning a previously pruned model
  (reference train.py:197-233)

Checkpoints are stage-keyed ``{warmup,nopush,push,pruned}_{last,best}``
(reference module.py:285-297) holding {params, constants, proto_class,
step} pytrees plus the experiment config JSON.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core.checkpoint import CheckpointStore
from adlm_tpu.core.config import ExperimentConfig
from adlm_tpu.data.constants import get_class_table
from adlm_tpu.data.dataset import SegmentationDataset
from adlm_tpu.data.pipeline import BatchLoader, superbatch_iterator
from adlm_tpu.models.ppnet import PPNet, default_proto_class
from adlm_tpu.train.protoseg import (
    ProtoSegState,
    init_protoseg_state,
    make_eval_step,
    make_train_step,
)
from adlm_tpu.utils.logging import RunLogger

STAGE_BY_PHASE = {0: "warmup", 1: "nopush", 2: "push"}


def _ckpt_payload(state: ProtoSegState) -> Dict[str, Any]:
    return {"params": dict(state.params),
            "constants": dict(state.constants),
            "proto_class": state.proto_class,
            "step": state.step}


def _run_phase(model: PPNet, cfg: ExperimentConfig, phase: int,
               state: ProtoSegState, train_ds, val_ds,
               store: CheckpointStore, logger: RunLogger,
               max_steps: int, batch_size: int,
               val_every: int, val_batches: Optional[int],
               early_stopping_patience: Optional[int] = None,
               stage_key: Optional[str] = None,
               mesh=None, trace_dir: Optional[str] = None
               ) -> ProtoSegState:
    t = cfg.train
    stage = stage_key or STAGE_BY_PHASE[phase]
    if mesh is not None:
        from adlm_tpu.parallel.sharding import (
            make_sharded_train_step, shard_state)
        step_fn = make_sharded_train_step(model, cfg, phase, mesh,
                                          max_steps, donate=True)
        state = shard_state(state, mesh)
    else:
        step_fn = make_train_step(model, cfg, phase, max_steps,
                                  donate=True)
    eval_fn = make_eval_step(model, cfg)
    n_windows = max(max_steps // t.iter_size, 1)

    loader = BatchLoader(superbatch_iterator(
        train_ds, t.iter_size, batch_size, n_windows, seed=t.random_seed,
        n_jobs=cfg.data.dataloader_n_jobs))

    try:
        state = _phase_loop(loader, state, step_fn, eval_fn, val_ds,
                            batch_size, val_batches, n_windows,
                            val_every, early_stopping_patience, stage,
                            store, logger, trace_dir=trace_dir)
    finally:
        loader.close()
    store.save(stage, "last", _ckpt_payload(state))
    return state


def _phase_loop(loader, state, step_fn, eval_fn, val_ds, batch_size,
                val_batches, n_windows, val_every,
                early_stopping_patience, stage, store, logger,
                trace_dir=None):
    from adlm_tpu.utils.profiling import StepMeter, trace

    best_acc = -1.0
    stale = 0
    meter = None
    for w, (images, labels) in enumerate(loader):
        if meter is None:
            meter = StepMeter(images_per_step=int(np.prod(images.shape[:2])))
        if trace_dir is not None and w == 1:
            # profile ONE steady-state window (w=0 pays the compile);
            # the trace lands under <trace_dir>/<stage>/
            with trace(f"{stage}_window", os.path.join(trace_dir, stage)):
                state, metrics = step_fn(state, jnp.asarray(images),
                                         jnp.asarray(labels))
                jax.block_until_ready(metrics)
            logger.log(f"{stage}: profiler trace written to "
                       f"{trace_dir}/{stage}")
        else:
            state, metrics = step_fn(state, jnp.asarray(images),
                                     jnp.asarray(labels))
        meter.tick()
        if (w + 1) % 50 == 0 or w == 0:
            acc = float(metrics["n_correct"]) / max(
                float(metrics["n_patches"]), 1)
            logger.metrics(w, stage, "train",
                           {"loss": float(metrics["loss"]),
                            "cross_entropy": float(metrics["cross_entropy"]),
                            "kld_loss": float(metrics["kld_loss"]),
                            "l1": float(metrics["l1"]),
                            "accuracy": acc,
                            **meter.rates()})
        if (w + 1) % val_every == 0 or (w + 1) == n_windows:
            val_metrics = _validate(eval_fn, state, val_ds, batch_size,
                                    val_batches)
            logger.metrics(w, stage, "val", val_metrics)
            store.save(stage, "last", _ckpt_payload(state))
            if val_metrics["accuracy"] > best_acc:
                best_acc = val_metrics["accuracy"]
                stale = 0
                store.save(stage, "best", _ckpt_payload(state))
                logger.log(f"{stage}: new best val accuracy {best_acc:.4f}")
            else:
                stale += 1
                if (early_stopping_patience is not None
                        and stale >= early_stopping_patience):
                    logger.log(f"{stage}: early stopping after {stale} "
                               f"stale validations")
                    break
    return state


def _validate(eval_fn, state: ProtoSegState, val_ds, batch_size: int,
              val_batches: Optional[int] = None) -> Dict[str, float]:
    """Validation pass over the ENTIRE val split, in dataset order.

    The reference checkpoints best-by-val-accuracy against the full val
    split every val epoch (reference segmentation/module.py:280-297);
    a shuffled subset would make best-checkpoint selection noisy.
    The final partial batch wraps around to the start so the jitted
    eval fn never sees a new batch shape (a fresh shape is a
    multi-minute remote compile); the handful of double-counted images
    is deterministic.

    Args:
      val_batches: optional cap on the number of (ordered) batches —
        quick mode for smoke tests / mid-phase logging.  None = full.
    """
    totals: Dict[str, float] = {}
    if val_ds.is_eval:
        val_ds.rng.seed(0)  # deterministic crops for over-window images
    # (val-augment mode leaves the stream advancing, like the reference)
    n_batches = -(-len(val_ds) // batch_size)
    if val_batches is not None:
        n_batches = min(val_batches, n_batches)
    for b in range(n_batches):
        items = [val_ds[(b * batch_size + j) % len(val_ds)]
                 for j in range(batch_size)]
        images = np.stack([im for im, _ in items])
        labels = np.stack([lb for _, lb in items])
        m = eval_fn(state, jnp.asarray(images), jnp.asarray(labels))
        for k, v in m.items():
            totals[k] = totals.get(k, 0.0) + float(v)
    out = {k: v / max(n_batches, 1) for k, v in totals.items()
           if k not in ("n_correct", "n_patches")}
    out["accuracy"] = totals.get("n_correct", 0.0) / max(
        totals.get("n_patches", 1.0), 1.0)
    return out


def run_protoseg_training(cfg: ExperimentConfig, run_dir: str,
                          data_path: Optional[str] = None,
                          pruned: bool = False,
                          start_checkpoint: Optional[str] = None,
                          val_every: int = 500,
                          val_batches: Optional[int] = None,
                          steps_scale: float = 1.0,
                          save_push_visualizations: bool = False,
                          push_batch_size: int = 1,
                          pretrained_path: Optional[str] = None,
                          pretrained_naming: str = "torchvision",
                          mesh=None,
                          trace_dir: Optional[str] = None,
                          val_augment: bool = False
                          ) -> ProtoSegState:
    """Full training pipeline. ``steps_scale`` shrinks every phase budget
    (for smoke tests); 1.0 reproduces the reference schedule.
    ``trace_dir`` writes a jax.profiler trace of one steady-state window
    per phase under ``<trace_dir>/<stage>/``.

    ``val_augment`` reproduces the reference's validation semantics
    (reference segmentation/dataset.py:119-173 applies the random
    scale/crop/flip chain to EVERY split; only the is_eval push/eval
    loaders differ), making best-checkpoint selection comparable to the
    reference's noisy-val behaviour.  Default off: deterministic val is
    strictly better for checkpoint selection (PARITY.md deviation)."""
    t = cfg.train
    logger = RunLogger(run_dir)
    store = CheckpointStore(run_dir)
    store.save_config(cfg.to_json())
    import json as _json
    logger.log_hyperparams(_json.loads(cfg.to_json()))
    table = get_class_table(cfg.data.class_table)

    model = PPNet(cfg=cfg.model)
    train_ds = SegmentationDataset(cfg.data, cfg.data.train_key,
                                   data_path=data_path)
    val_ds = SegmentationDataset(cfg.data, "val", data_path=data_path,
                                 is_eval=not val_augment)

    warmup_steps = int(t.warmup_steps * steps_scale)
    joint_steps = int(t.joint_steps * steps_scale)
    finetune_steps = int(t.finetune_steps * steps_scale)

    wh, ww = cfg.data.window_size
    sample = jnp.zeros((1, wh, ww, 3), jnp.float32)
    rng = jax.random.PRNGKey(t.random_seed)

    if pruned:
        # finetune a pruned model (reference train.py:197-233)
        pruned_store = CheckpointStore(run_dir)
        payload = pruned_store.restore("pruned", "last")
        params = payload["params"]
        constants = payload["constants"]
        proto_class = jnp.asarray(payload["proto_class"])
        pruned_cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model,
                num_prototypes=int(np.asarray(params["prototype_vectors"]
                                              ).shape[0])))
        model = PPNet(cfg=pruned_cfg.model)
        state = init_protoseg_state(model, pruned_cfg, 2, finetune_steps,
                                    rng, sample, params=params,
                                    constants=constants,
                                    proto_class=proto_class)
        logger.log("LAST LAYER FINE-TUNING (pruned)")
        state = _run_phase(model, pruned_cfg, 2, state, train_ds, val_ds,
                           store, logger, finetune_steps,
                           t.warmup_batch_size, val_every, val_batches,
                           early_stopping_patience=
                           t.early_stopping_patience_last_layer,
                           stage_key="pruned", mesh=mesh,
                           trace_dir=trace_dir)
        logger.close()
        return state

    # phase 0: warmup
    if start_checkpoint:
        payload = CheckpointStore(os.path.dirname(
            os.path.dirname(start_checkpoint))).restore(
            *os.path.basename(start_checkpoint).rsplit("_", 1))
        params, constants = payload["params"], payload["constants"]
    else:
        params = constants = None

    state = init_protoseg_state(model, cfg, 0, warmup_steps, rng, sample,
                                params=params, constants=constants)

    if pretrained_path and not start_checkpoint:
        # ImageNet/COCO backbone init (reference train.py:70-95);
        # accepts a torch .pth state_dict or an .npz with the same keys
        logger.log(f"Loading pretrained backbone from {pretrained_path} "
                   f"({pretrained_naming} naming)")
        from adlm_tpu.utils.torch_import import load_deeplab_backbone
        if pretrained_path.endswith(".npz"):
            sd = dict(np.load(pretrained_path))
        else:
            import torch
            sd = torch.load(pretrained_path, map_location="cpu",
                            weights_only=True)
        p_host = jax.tree.map(np.asarray, dict(state.params))
        c_host = jax.tree.map(np.asarray, dict(state.constants))
        report = load_deeplab_backbone(p_host, c_host, sd,
                                       naming=pretrained_naming)
        logger.log(f"Loaded {len(report['loaded'])} tensors "
                   f"({len(report['unexpected_keys'])} unexpected)")
        if report["negative_variance_keys"]:
            logger.log(f"WARNING: {len(report['negative_variance_keys'])} "
                       f"BN running_var tensors have negative entries — "
                       f"forward passes will produce NaNs")
        state = state.replace(
            params=jax.tree.map(jnp.asarray, p_host),
            constants=jax.tree.map(jnp.asarray, c_host))

    if (t.bn_calibrate and not pretrained_path and not start_checkpoint):
        # from-scratch init: standardize the frozen BNs on a real batch
        # (models/calibrate.py — without pretrained running stats the
        # 101-layer stack saturates and from-scratch training stalls)
        from adlm_tpu.models.calibrate import calibrate_frozen_bn
        n_cal = min(4, len(train_ds))
        images = jnp.asarray(np.stack(
            [train_ds[i][0] for i in range(n_cal)]))
        logger.log(f"bn-calibrate: standardizing frozen BNs on "
                   f"{n_cal} training windows")
        new_consts = calibrate_frozen_bn(model, state.params,
                                         state.constants, images,
                                         log=logger.log)
        state = state.replace(
            constants=jax.tree.map(jnp.asarray, new_consts))
        logger.log("bn-calibrate: done")

    if warmup_steps > 0:
        logger.log(f"WARM-UP TRAINING START ({warmup_steps} steps)")
        state = _run_phase(model, cfg, 0, state, train_ds, val_ds, store,
                           logger, warmup_steps, t.warmup_batch_size,
                           val_every, val_batches, mesh=mesh,
                           trace_dir=trace_dir)

    # phase 1: joint
    logger.log(f"JOINT TRAINING START ({joint_steps} steps)")
    state = init_protoseg_state(model, cfg, 1, joint_steps, rng, sample,
                                params=state.params,
                                constants=state.constants,
                                proto_class=state.proto_class)
    state = _run_phase(model, cfg, 1, state, train_ds, val_ds, store,
                       logger, joint_steps, t.joint_batch_size,
                       val_every, val_batches, mesh=mesh,
                       trace_dir=trace_dir)

    # push
    logger.log("SAVING PROTOTYPES (push)")
    from adlm_tpu.interpret.analysis import make_denorm
    from adlm_tpu.interpret.push import push_prototypes
    push_ds = SegmentationDataset(cfg.data, cfg.data.train_key,
                                  data_path=data_path, is_eval=True,
                                  push_prototypes=True)
    # uint8 items + the full in-jit (x/255 − mean)/std when
    # ulp-equivalent (4× less relay traffic; see make_push_batched_fn)
    # — batched, non-visualizing pushes only
    raw_push = (push_batch_size > 1 and not save_push_visualizations
                and push_ds.supports_raw_eval())
    new_params, new_pc, _ = push_prototypes(
        model, state.params, state.constants, state.proto_class,
        push_ds.eval_items(raw=raw_push), cfg.model.num_classes,
        run_dir=os.path.join(run_dir, "prototypes"),
        save_visualizations=save_push_visualizations,
        batch_size=push_batch_size, raw_uint8=raw_push,
        raw_normalize=(cfg.data.mean, cfg.data.std),
        get_item=lambda i: (lambda im, lb: (im[None], lb[None]))(
            *push_ds.get_eval_item(i)),
        class_names=table.class_names, log=logger.log,
        denorm=make_denorm(cfg.data))

    pushed_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model,
            num_prototypes=int(np.asarray(
                new_params["prototype_vectors"]).shape[0])))
    model = PPNet(cfg=pushed_cfg.model)
    state = init_protoseg_state(model, pushed_cfg, 2, finetune_steps, rng,
                                sample, params=new_params,
                                constants=state.constants,
                                proto_class=new_pc)
    store.save("push", "last", _ckpt_payload(state))
    store.save("push", "best", _ckpt_payload(state))

    # phase 2: last-layer finetune
    logger.log("LAST LAYER FINE-TUNING")
    state = _run_phase(model, pushed_cfg, 2, state, train_ds, val_ds,
                       store, logger, finetune_steps, t.warmup_batch_size,
                       val_every, val_batches,
                       early_stopping_patience=
                       t.early_stopping_patience_last_layer,
                       stage_key="push", mesh=mesh, trace_dir=trace_dir)
    logger.close()
    return state
