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

# run position markers for resume: each training stage, in execution
# order, plus the push event between joint and last-layer finetune
STAGE_ORDER = {"warmup": 0, "nopush": 1, "push": 2, "pruned": 3}


class TrainingHalted(Exception):
    """Raised for a graceful time-boxed stop (``--halt-after``): the
    current state and resume metadata are already on disk; ``train
    --resume`` continues from the exact window (preemptible quota)."""


class TrainingDiverged(Exception):
    """Raised when a phase's loss goes non-finite (checked at the log
    cadence and before every checkpoint save).  The guard guarantees a
    NaN state is NEVER checkpointed — the stage's ``last``/``best``
    payloads stay at the most recent finite window, so a relaunch (with
    e.g. ``--grad-clip``) resumes from healthy state instead of
    inheriting poisoned optimizer moments.  The full-budget flagship
    run burned 35 minutes of chip time on NaN windows (and checkpointed
    them) before this existed."""


def ship_dtypes(cfg: ExperimentConfig):
    """Host→device wire dtypes for train windows — the single source of
    truth shared by the train loop's ``ship()`` casts and
    deploy/precompile.py's lowered avals (they MUST agree or every
    precompiled train program is a silent cache miss).  uint8 images
    under ``wire_uint8`` (normalization inverted on host, re-applied
    in-jit — see TrainConfig.wire_uint8), else bf16 images when the
    step computes in bf16 (it casts in-jit anyway, so host-side
    rounding is identical); uint8 labels when the ids fit."""
    import ml_dtypes
    if cfg.train.wire_uint8:
        if cfg.data.cells:
            raise ValueError(
                "wire_uint8 requires /255-scaled inputs (cells=False): "
                "the in-jit normalizer (ops/normalize.py) assumes them")
        img = np.dtype(np.uint8)
    elif cfg.train.compute_dtype == "bfloat16":
        img = np.dtype(ml_dtypes.bfloat16)
    else:
        img = np.dtype(np.float32)
    lab = (np.dtype(np.uint8) if cfg.model.num_classes < 255
           else np.dtype(np.int32))
    return img, lab


def wire_uint8_images(images: np.ndarray, mean, std) -> np.ndarray:
    """Invert the loader's ``(x/255 − mean)/std`` back to raw uint8
    pixels for the wire (TrainConfig.wire_uint8).  The augmented values
    are bilinear blends of uint8 sources in [0, 255], so the round trip
    through ``normalize_in_jit`` loses at most 0.5/255 per pixel."""
    px = (images * (np.asarray(std, np.float32) * 255.0)
          + np.asarray(mean, np.float32) * 255.0)
    return np.clip(np.rint(px), 0.0, 255.0).astype(np.uint8)


def _ckpt_payload(state: ProtoSegState) -> Dict[str, Any]:
    """Full train-state payload: params/constants/proto_class/step PLUS
    the optimizer state, flattened to positionally-keyed leaves so the
    checkpoint stays a plain dict-of-arrays (restorable with no target
    on any backend); the optax tree structure is rebuilt from a fresh
    ``tx.init`` at restore time (same config → same treedef).  The
    reference drops the optimizer entirely (``torch.save(obj=ppnet)``,
    reference segmentation/module.py:292-297) — resuming there restarts
    moments and LR schedule from zero."""
    payload = {"params": dict(state.params),
               "constants": dict(state.constants),
               "proto_class": state.proto_class,
               "step": state.step}
    leaves = jax.tree_util.tree_leaves(state.opt_state)
    payload["opt"] = {f"{i:05d}": leaf for i, leaf in enumerate(leaves)}
    return payload


def _restore_opt_state(state: ProtoSegState, payload: Dict[str, Any],
                       log=print) -> ProtoSegState:
    """Rebuild ``opt_state`` from a payload's flattened leaves (see
    _ckpt_payload).  Old-format payloads without ``opt`` fall back to
    the fresh optimizer (logged)."""
    opt = payload.get("opt")
    if not opt:
        if "opt" not in payload:
            log("resume: checkpoint has no optimizer state "
                "(old format) — starting with fresh moments")
        return state.replace(step=jnp.asarray(payload["step"]))
    leaves = [jnp.asarray(opt[k]) for k in sorted(opt)]
    treedef = jax.tree_util.tree_structure(state.opt_state)
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state.replace(opt_state=opt_state,
                         step=jnp.asarray(payload["step"]))


def _resume_path(run_dir: str) -> str:
    return os.path.join(run_dir, "resume.json")


def _write_resume(run_dir: str, stage: str, windows_done: int,
                  n_windows: int, best_acc: float, stale: int) -> None:
    """Atomic resume marker (written alongside every ``last`` save)."""
    import json
    meta = {"stage": stage, "windows_done": int(windows_done),
            "n_windows": int(n_windows),
            "completed": windows_done >= n_windows,
            "best_acc": float(best_acc), "stale": int(stale)}
    tmp = _resume_path(run_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _resume_path(run_dir))


def _read_resume(run_dir: str) -> Dict[str, Any]:
    import json
    with open(_resume_path(run_dir)) as f:
        return json.load(f)


def _run_phase(model: PPNet, cfg: ExperimentConfig, phase: int,
               state: ProtoSegState, train_ds, val_ds,
               store: CheckpointStore, logger: RunLogger,
               max_steps: int, batch_size: int,
               val_every: int, val_batches: Optional[int],
               early_stopping_patience: Optional[int] = None,
               stage_key: Optional[str] = None,
               mesh=None, trace_dir: Optional[str] = None,
               start_window: int = 0, best_acc: float = -1.0,
               stale: int = 0, halt: Optional[Dict[str, int]] = None
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
    _write_resume(store.run_dir, stage, start_window, n_windows,
                  best_acc, stale)
    if start_window >= n_windows:
        return state

    # the loader's index/augmentation streams are pure functions of the
    # seed and the window counter, so start_window > 0 resumes the
    # EXACT stream a fresh run would have produced (data/pipeline.py)
    loader = BatchLoader(superbatch_iterator(
        train_ds, t.iter_size, batch_size, n_windows, seed=t.random_seed,
        n_jobs=cfg.data.dataloader_n_jobs, start_window=start_window,
        mode=cfg.data.dataloader_mode))

    # shipping casts: bf16 images + uint8 labels — 31.5 → 18 MB per
    # flagship window through the ~42 MB/s relay (the REAL window
    # bound, PERF.md) — or uint8 images (10.5 MB) under wire_uint8.
    # Dtypes come from ship_dtypes so the precompile CLI lowers
    # byte-identical avals (same persistent-cache key).
    img_dt, lab_dt = ship_dtypes(cfg)

    def ship(images, labels):
        # host-side casts only; _phase_loop's device_prefetch turns
        # the numpy leaves into (async) device uploads
        if img_dt == np.uint8:
            # raw pixels on the wire; loss_fn re-normalizes in-jit
            images = wire_uint8_images(images, cfg.data.mean,
                                       cfg.data.std)
        elif images.dtype != img_dt:
            images = images.astype(img_dt)
        if lab_dt == np.uint8 and labels.dtype != np.uint8:
            labels = labels.astype(np.uint8)
        return images, labels

    try:
        state = _phase_loop(loader, state, step_fn, eval_fn, val_ds,
                            batch_size, val_batches, n_windows,
                            val_every, early_stopping_patience, stage,
                            store, logger, trace_dir=trace_dir,
                            start_window=start_window,
                            best_acc=best_acc, stale=stale, halt=halt,
                            ship=ship)
    finally:
        loader.close()
    store.save(stage, "last", _ckpt_payload(state))
    _write_resume(store.run_dir, stage, n_windows, n_windows,
                  best_acc, stale)
    return state


def _phase_loop(loader, state, step_fn, eval_fn, val_ds, batch_size,
                val_batches, n_windows, val_every,
                early_stopping_patience, stage, store, logger,
                trace_dir=None, start_window=0, best_acc=-1.0,
                stale=0, halt=None, ship=None):
    from adlm_tpu.data.pipeline import device_prefetch
    from adlm_tpu.utils.profiling import StepMeter, trace

    def casted(src):
        """Host-side wire casts ahead of the async upload; the 2-deep
        device_prefetch then ENQUEUES each copy (~40 ms for an 18 MB
        flagship window vs ~440 ms for the copy itself through the
        ~42 MB/s relay, CLAUDE.md) so window n+1's upload rides under
        window n's compute instead of serializing with it."""
        for images, labels in src:
            yield ship(images, labels) if ship is not None \
                else (images, labels)

    meter = None
    for w, (images, labels) in enumerate(device_prefetch(casted(loader)),
                                         start=start_window):
        if meter is None:
            meter = StepMeter(images_per_step=int(np.prod(images.shape[:2])))
        if trace_dir is not None and w == start_window + 1:
            # profile ONE steady-state window (the first pays the
            # compile); the trace lands under <trace_dir>/<stage>/
            with trace(f"{stage}_window", os.path.join(trace_dir, stage)):
                state, metrics = step_fn(state, images, labels)
                jax.block_until_ready(metrics)
            logger.log(f"{stage}: profiler trace written to "
                       f"{trace_dir}/{stage}")
        else:
            state, metrics = step_fn(state, images, labels)
        meter.tick()
        if (w + 1) % 50 == 0 or w == start_window:
            acc = float(metrics["n_correct"]) / max(
                float(metrics["n_patches"]), 1)
            loss = float(metrics["loss"])
            logger.metrics(w, stage, "train",
                           {"loss": loss,
                            "cross_entropy": float(metrics["cross_entropy"]),
                            "kld_loss": float(metrics["kld_loss"]),
                            "l1": float(metrics["l1"]),
                            "grad_norm": float(metrics.get("grad_norm",
                                                           0.0)),
                            "accuracy": acc,
                            **meter.rates()})
            if not np.isfinite(loss):
                logger.log(f"{stage}: NON-FINITE loss at window {w} "
                           f"(grad_norm="
                           f"{float(metrics.get('grad_norm', 0.0))}) — "
                           f"aborting the phase; last checkpoint is the "
                           f"most recent finite state")
                raise TrainingDiverged(stage)
        if (w + 1) % val_every == 0 or (w + 1) == n_windows:
            # never checkpoint a non-finite state (a poisoned ``last``
            # payload makes every resume NaN from the first window)
            if not np.isfinite(float(metrics["loss"])):
                logger.log(f"{stage}: NON-FINITE loss at validation "
                           f"window {w} — aborting without saving")
                raise TrainingDiverged(stage)
            val_metrics = _validate(eval_fn, state, val_ds, batch_size,
                                    val_batches)
            logger.metrics(w, stage, "val", val_metrics)
            if val_metrics["accuracy"] > best_acc:
                best_acc = val_metrics["accuracy"]
                stale = 0
                store.save(stage, "best", _ckpt_payload(state))
                logger.log(f"{stage}: new best val accuracy {best_acc:.4f}")
            else:
                stale += 1
            store.save(stage, "last", _ckpt_payload(state))
            _write_resume(store.run_dir, stage, w + 1, n_windows,
                          best_acc, stale)
            if (early_stopping_patience is not None
                    and stale >= early_stopping_patience):
                logger.log(f"{stage}: early stopping after {stale} "
                           f"stale validations")
                break
        if halt is not None:
            halt["remaining"] -= 1
            if halt["remaining"] <= 0:
                # halting ON the phase's final window is still a halt:
                # windows_done == n_windows marks the stage completed,
                # so --resume enters the NEXT stage — without this the
                # run would leak at least one unbudgeted window into
                # the next phase (and with 1-window phases never stop)
                store.save(stage, "last", _ckpt_payload(state))
                _write_resume(store.run_dir, stage, w + 1, n_windows,
                              best_acc, stale)
                logger.log(f"{stage}: halting after window {w + 1} "
                           f"(--halt-after); resume with train --resume")
                raise TrainingHalted(stage)
    return state


def _validate(eval_fn, state: ProtoSegState, val_ds, batch_size: int,
              val_batches: Optional[int] = None) -> Dict[str, float]:
    """Validation pass over the ENTIRE val split, in dataset order.

    The reference checkpoints best-by-val-accuracy against the full val
    split every val epoch (reference segmentation/module.py:280-297);
    a shuffled subset would make best-checkpoint selection noisy.
    The final partial batch wraps around to the start so the jitted
    eval fn never sees a new batch shape (a fresh shape is a
    multi-minute remote compile) — but the wrapped tail images are
    MASKED OUT via the eval step's ``n_valid`` input, so every image
    contributes exactly once (no best-checkpoint bias on small splits).

    Args:
      val_batches: optional cap on the number of (ordered) batches —
        quick mode for smoke tests / mid-phase logging.  None = full.
    """
    totals: Dict[str, float] = {}
    total_real = 0
    if val_ds.is_eval:
        val_ds.rng.seed(0)  # deterministic crops for over-window images
    # (val-augment mode leaves the stream advancing, like the reference)
    n_batches = -(-len(val_ds) // batch_size)
    if val_batches is not None:
        n_batches = min(val_batches, n_batches)
    for b in range(n_batches):
        start = b * batch_size
        n_real = min(batch_size, len(val_ds) - start)
        items = [val_ds[(start + j) % len(val_ds)]
                 for j in range(batch_size)]
        images = np.stack([im for im, _ in items])
        labels = np.stack([lb for _, lb in items])
        m = eval_fn(state, jnp.asarray(images), jnp.asarray(labels),
                    n_valid=n_real)
        for k, v in m.items():
            w = 1.0 if k in ("n_correct", "n_patches") else n_real
            totals[k] = totals.get(k, 0.0) + float(v) * w
        total_real += n_real
    out = {k: v / max(total_real, 1) for k, v in totals.items()
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
                          val_augment: bool = False,
                          resume: bool = False,
                          halt_after_windows: Optional[int] = None
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
    strictly better for checkpoint selection (PARITY.md deviation).

    ``resume=True`` continues a killed/halted run from its last
    checkpoint: the stage, window index, optimizer moments, LR
    schedule position, early-stopping counters and the loader's
    index/augmentation streams all pick up exactly where they stopped
    (``resume.json`` + the full-state ``last`` payloads) — a resumed
    run produces bit-identical parameters to an uninterrupted one
    (tests/test_pipeline.py).  The reference cannot do this: it pickles
    the bare module and restarts phases from step 0
    (reference segmentation/train.py:58-65, module.py:292-297).
    ``halt_after_windows`` stops gracefully after N optimizer windows
    (counted across phases) — the preemptible-quota time-box."""
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

    halt = ({"remaining": int(halt_after_windows)}
            if halt_after_windows else None)

    def _restore_stage(stage: str, phase: int, max_steps: int,
                       with_opt: bool):
        """(model, cfg, state) rebuilt from a stage's ``last`` payload;
        the prototype count comes from the payload (push/prune make it
        ragged).  ``with_opt`` restores optimizer moments + step."""
        payload = store.restore(stage, "last")
        params, constants = payload["params"], payload["constants"]
        pc = jnp.asarray(payload["proto_class"])
        rcfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model,
                num_prototypes=int(np.asarray(
                    params["prototype_vectors"]).shape[0])))
        rmodel = PPNet(cfg=rcfg.model)
        st = init_protoseg_state(rmodel, rcfg, phase, max_steps, rng,
                                 sample, params=params,
                                 constants=constants, proto_class=pc)
        if with_opt:
            st = _restore_opt_state(st, payload, log=logger.log)
        return rmodel, rcfg, st

    entry_stage: Optional[str] = None
    entry_window = 0
    entry_best = -1.0
    entry_stale = 0
    if resume:
        if not os.path.exists(_resume_path(run_dir)):
            raise SystemExit(f"--resume: no resume.json under {run_dir} "
                             f"(nothing to resume)")
        meta = _read_resume(run_dir)
        run_complete = False
        if meta["completed"]:
            # crashed between stages: enter the NEXT position; a crash
            # during the push event re-runs it (push is deterministic)
            entry_stage = {"warmup": "nopush", "nopush": "push_event",
                           "push": None, "pruned": None}[meta["stage"]]
            run_complete = entry_stage is None
        else:
            entry_stage = meta["stage"]
            entry_window = int(meta["windows_done"])
            entry_best = float(meta["best_acc"])
            entry_stale = int(meta["stale"])
        if (entry_stage in STAGE_ORDER
                and not store.exists(entry_stage, "last")):
            # died between a stage's entry and its FIRST checkpoint
            # save (the window before the first validation — exactly
            # where multi-minute remote compiles sit): the stage holds
            # no state yet, so fall back to re-entering it from its
            # predecessor's completed state instead of crashing on a
            # checkpoint that was never written
            logger.log(f"resume: stage {entry_stage!r} has no "
                       f"checkpoint yet — re-entering it from its start")
            entry_window, entry_best, entry_stale = 0, -1.0, 0
            if entry_stage == "warmup":
                entry_stage = None  # full fresh-init path below
            elif entry_stage == "nopush":
                entry_stage = ("joint_start"
                               if store.exists("warmup", "last")
                               else None)
            elif entry_stage == "push":
                # push/last is saved by the push event itself before
                # the finetune loop starts, so a missing checkpoint
                # means the push never completed — re-run it
                entry_stage = "push_event"
            elif entry_stage == "pruned":
                raise SystemExit(
                    "--resume: the pruned stage has no checkpoint — "
                    "run the prune command first")
        logger.log(f"resume: stage={entry_stage} window={entry_window} "
                   f"best_acc={entry_best:.4f} stale={entry_stale}")
        if run_complete:
            logger.log("resume: run already complete — nothing to do")
            _, _, state = _restore_stage(meta["stage"], 2,
                                         finetune_steps, with_opt=True)
            logger.close()
            return state

    def _sw(stage):
        return entry_window if entry_stage == stage else 0

    def _ba(stage):
        return entry_best if entry_stage == stage else -1.0

    def _stl(stage):
        return entry_stale if entry_stage == stage else 0

    if pruned or entry_stage == "pruned":
        # finetune a pruned model (reference train.py:197-233); on
        # resume, continue it mid-phase with restored moments
        model, pruned_cfg, state = _restore_stage(
            "pruned", 2, finetune_steps,
            with_opt=(entry_stage == "pruned"))
        logger.log("LAST LAYER FINE-TUNING (pruned)")
        try:
            state = _run_phase(model, pruned_cfg, 2, state, train_ds,
                               val_ds, store, logger, finetune_steps,
                               t.warmup_batch_size, val_every,
                               val_batches,
                               early_stopping_patience=
                               t.early_stopping_patience_last_layer,
                               stage_key="pruned", mesh=mesh,
                               trace_dir=trace_dir,
                               start_window=_sw("pruned"),
                               best_acc=_ba("pruned"),
                               stale=_stl("pruned"), halt=halt)
        except TrainingHalted:
            pass
        logger.close()
        return state

    # run position: 0 = warmup, 1 = joint, 1.5 = push event,
    # 2 = last-layer finetune
    if entry_stage == "warmup":
        model, cfg, state = _restore_stage("warmup", 0, warmup_steps,
                                           with_opt=True)
        pos = 0.0
    elif entry_stage == "joint_start":
        # fallback entry: the joint phase died before its first save —
        # re-enter it at window 0 from the completed warmup state (the
        # joint block below re-inits the phase-1 optimizer/schedule)
        model, cfg, state = _restore_stage("warmup", 0, warmup_steps,
                                           with_opt=False)
        pos = 1.0
    elif entry_stage == "nopush":
        model, cfg, state = _restore_stage("nopush", 1, joint_steps,
                                           with_opt=True)
        pos = 1.0
    elif entry_stage == "push_event":
        model, cfg, state = _restore_stage("nopush", 1, joint_steps,
                                           with_opt=False)
        pos = 1.5
    elif entry_stage == "push":
        model, cfg, state = _restore_stage("push", 2, finetune_steps,
                                           with_opt=True)
        pos = 2.0
    else:
        pos = 0.0
        # phase 0: warmup
        if start_checkpoint:
            payload = CheckpointStore(os.path.dirname(
                os.path.dirname(start_checkpoint))).restore(
                *os.path.basename(start_checkpoint).rsplit("_", 1))
            params, constants = payload["params"], payload["constants"]
        else:
            params = constants = None

        state = init_protoseg_state(model, cfg, 0, warmup_steps, rng,
                                    sample, params=params,
                                    constants=constants)

    if pretrained_path and not start_checkpoint and entry_stage is None:
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

    if (t.bn_calibrate and not pretrained_path and not start_checkpoint
            and entry_stage is None):
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
        # step 1b: the pre-sigmoid tensor has no BN (ASPP head / last
        # add-on conv) and saturates the sigmoid to EXACT 0/1 at random
        # init — zero gradient to every feature parameter (measured:
        # 0/114 leaves).  With presigmoid_ln the LayerNorm standardizes
        # it persistently (a one-shot rescale provably cannot hold:
        # backbone drift re-saturated the rails by joint step 700);
        # without it, fold a data-measured (x−μ)/σ into the producing
        # convs (models/calibrate.py::standardize_presigmoid).
        if not cfg.model.presigmoid_ln:
            from adlm_tpu.models.calibrate import standardize_presigmoid
            new_params = standardize_presigmoid(model, state.params,
                                                state.constants, images,
                                                log=logger.log)
            state = state.replace(
                params=jax.tree.map(jnp.asarray, new_params))
        logger.log("bn-calibrate: done")

    if (t.proto_init_data and not start_checkpoint
            and entry_stage is None):
        # from-scratch init, step 2: prototypes sampled from real
        # feature cells of their own class (models/calibrate.py)
        from adlm_tpu.models.calibrate import init_prototypes_from_data
        n_init = min(8, len(train_ds))
        items = [train_ds.get_train_item(i, sample_seed=t.random_seed + i)
                 for i in range(n_init)]
        imgs = np.stack([im for im, _ in items])
        labs = np.stack([lb for _, lb in items])
        new_pv = init_prototypes_from_data(
            model, state.params, state.constants, state.proto_class,
            imgs, labs, seed=t.random_seed, log=logger.log)
        state = state.replace(params={**dict(state.params),
                                      "prototype_vectors": new_pv})

    try:
        if pos <= 0 and warmup_steps > 0:
            logger.log(f"WARM-UP TRAINING START ({warmup_steps} steps)")
            state = _run_phase(model, cfg, 0, state, train_ds, val_ds,
                               store, logger, warmup_steps,
                               t.warmup_batch_size, val_every,
                               val_batches, mesh=mesh,
                               trace_dir=trace_dir,
                               start_window=_sw("warmup"),
                               best_acc=_ba("warmup"),
                               stale=_stl("warmup"), halt=halt)

        if pos <= 1:
            # phase 1: joint
            logger.log(f"JOINT TRAINING START ({joint_steps} steps)")
            if entry_stage != "nopush":
                state = init_protoseg_state(model, cfg, 1, joint_steps,
                                            rng, sample,
                                            params=state.params,
                                            constants=state.constants,
                                            proto_class=state.proto_class)
            state = _run_phase(model, cfg, 1, state, train_ds, val_ds,
                               store, logger, joint_steps,
                               t.joint_batch_size, val_every,
                               val_batches, mesh=mesh,
                               trace_dir=trace_dir,
                               start_window=_sw("nopush"),
                               best_acc=_ba("nopush"),
                               stale=_stl("nopush"), halt=halt)

        if pos <= 1.5:
            # push
            logger.log("SAVING PROTOTYPES (push)")
            from adlm_tpu.interpret.analysis import make_denorm
            from adlm_tpu.interpret.push import push_prototypes
            push_ds = SegmentationDataset(cfg.data, cfg.data.train_key,
                                          data_path=data_path,
                                          is_eval=True,
                                          push_prototypes=True)
            # uint8 items + the full in-jit (x/255 − mean)/std when
            # ulp-equivalent (4× less relay traffic; see
            # make_push_batched_fn) — batched, non-visualizing only
            raw_push = (push_batch_size > 1
                        and not save_push_visualizations
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
            state = init_protoseg_state(model, pushed_cfg, 2,
                                        finetune_steps, rng, sample,
                                        params=new_params,
                                        constants=state.constants,
                                        proto_class=new_pc)
            store.save("push", "last", _ckpt_payload(state))
            store.save("push", "best", _ckpt_payload(state))
        else:
            pushed_cfg = cfg  # resumed into the finetune: cfg is rebuilt

        # phase 2: last-layer finetune
        logger.log("LAST LAYER FINE-TUNING")
        state = _run_phase(model, pushed_cfg, 2, state, train_ds, val_ds,
                           store, logger, finetune_steps,
                           t.warmup_batch_size, val_every, val_batches,
                           early_stopping_patience=
                           t.early_stopping_patience_last_layer,
                           stage_key="push", mesh=mesh,
                           trace_dir=trace_dir, start_window=_sw("push"),
                           best_acc=_ba("push"), stale=_stl("push"),
                           halt=halt)
    except TrainingHalted:
        logger.log("training halted (--halt-after); continue with "
                   "train --resume")
    except TrainingDiverged as e:
        logger.log(f"training DIVERGED in stage {e.args[0]!r}; the last "
                   f"checkpoint holds the most recent finite state — "
                   f"relaunch with --resume and a stability knob "
                   f"(e.g. --grad-clip)")
        logger.close()
        raise
    logger.close()
    return state
