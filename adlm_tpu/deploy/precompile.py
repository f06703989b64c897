"""Ahead-of-run compile-cache warming.

XLA compiles of the flagship programs take 2–6 minutes each on a
remote TPU (and tens of seconds locally); the persistent compile cache
(`.jax_cache/`) makes repeats instant — but a production run still
pays the full compile serially at first use of every program (warmup
step, joint step, val step, push, full-res eval...).  ``precompile``
builds the SAME jitted programs the pipeline will run — via the same
constructors, so the cache keys match — and compiles them from
abstract ``ShapeDtypeStruct`` inputs (no data, no device transfers
beyond the compile itself).  Run it once before a long run, or on a
scheduler node while the dataset is still staging.

The reference has no analogue (torch is eagerly compiled); this is a
TPU-native operational concern.

Program inventory (mirrors train/pipeline.py + cli.py construction):

* per-phase train step (`make_train_step(model, cfg, phase,
  max_steps, donate=True)`) at the phase's superbatch geometry;
* the train-time validation step (`make_eval_step`);
* whole-image eval (`make_inference_fn`) at ``--full-res`` /
  ``--eval-batch`` — the raw-uint8 + in-jit-normalize variant the CLI
  uses (plain and, with ``--stats``, the stats variant);
* the batched push kernel (`make_push_batched_fn`).

Note: a pruned model has a data-dependent prototype count, so its
programs cannot be warmed ahead of the prune.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from adlm_tpu.core.config import ExperimentConfig


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _abstract_state(model, cfg, phase: int, max_steps: int):
    from adlm_tpu.train.protoseg import init_protoseg_state

    t = cfg.train
    sample = _sds((1, cfg.data.window_size[0], cfg.data.window_size[1], 3),
                  jnp.float32)
    return jax.eval_shape(
        lambda s: init_protoseg_state(model, cfg, phase, max_steps,
                                      jax.random.PRNGKey(t.random_seed),
                                      s),
        sample)


def precompile_protoseg(cfg: ExperimentConfig,
                        phases: List[str],
                        steps_scale: float = 1.0,
                        eval_batch: int = 8,
                        full_res: Tuple[int, int] = (1024, 2048),
                        stats: bool = False,
                        stats_upsampled: bool = False,
                        push_batch: int = 8,
                        log=print) -> Dict[str, float]:
    """Compile the requested programs; returns {name: seconds}.

    ``phases`` ⊆ {warmup, joint, finetune, val, fullres, push}.
    """
    from adlm_tpu.interpret.evaluate import make_inference_fn
    from adlm_tpu.interpret.push import make_push_batched_fn
    from adlm_tpu.models.ppnet import PPNet
    from adlm_tpu.train.protoseg import make_eval_step, make_train_step

    t = cfg.train
    wh, ww = cfg.data.window_size
    model = PPNet(cfg=cfg.model)
    times: Dict[str, float] = {}

    def timed(name, thunk):
        t0 = time.perf_counter()
        thunk()
        times[name] = round(time.perf_counter() - t0, 2)
        log(f"precompile {name}: {times[name]}s")

    phase_steps = {
        "warmup": (0, int(t.warmup_steps * steps_scale),
                   t.warmup_batch_size),
        "joint": (1, int(t.joint_steps * steps_scale),
                  t.joint_batch_size),
        "finetune": (2, int(t.finetune_steps * steps_scale),
                     t.warmup_batch_size),
    }
    # the train loop ships casted inputs (bf16 images / uint8 labels,
    # train/pipeline.py::ship_dtypes) — the lowered avals here must be
    # byte-identical or every warmed program is a silent cache miss
    from adlm_tpu.train.pipeline import ship_dtypes
    img_dt, lab_dt = ship_dtypes(cfg)
    for name in phases:
        if name in phase_steps:
            phase, max_steps, bs = phase_steps[name]
            if max_steps <= 0:
                continue
            state = _abstract_state(model, cfg, phase, max_steps)
            step = make_train_step(model, cfg, phase, max_steps,
                                   donate=True)
            img = _sds((t.iter_size, bs, wh, ww, 3), img_dt)
            lab = _sds((t.iter_size, bs, wh, ww), lab_dt)
            timed(f"train_{name}",
                  lambda s=state, i=img, l=lab, f=step:
                  f.lower(s, i, l).compile())

    if "val" in phases:
        # the pipeline validates with the phase batch size at window
        # resolution (_validate); warm it for the joint batch size
        state = _abstract_state(
            model, cfg, 1, max(int(t.joint_steps * steps_scale), 1))
        eval_step = make_eval_step(model, cfg)
        img = _sds((t.joint_batch_size, wh, ww, 3), jnp.float32)
        lab = _sds((t.joint_batch_size, wh, ww), jnp.int32)
        timed("val_step",
              lambda: eval_step.lower(state, img, lab).compile())

    # raw-uint8 inputs + in-jit normalization — the CLI eval/push paths
    # (supports_raw_eval) ship uint8 and normalize on device
    normalize = (cfg.data.mean, cfg.data.std)
    P = cfg.model.num_prototypes
    params_c = _abstract_params(model, cfg)

    if "fullres" in phases:
        H, W = full_res
        fn = make_inference_fn(model, cfg.model.num_classes,
                               with_stats=stats,
                               stats_upsampled=stats_upsampled,
                               normalize=normalize)
        img = _sds((eval_batch, H, W, 3), jnp.uint8)
        lab = _sds((eval_batch, H, W), jnp.uint8)
        pc = _sds((P,), jnp.int32)
        extra = ()
        if stats:
            extra = (_sds((eval_batch, 100), jnp.float32),
                     _sds((eval_batch, 100), jnp.float32))
        timed("fullres_eval",
              lambda: fn.lower(params_c[0], params_c[1], pc, img, lab,
                               *extra).compile())

    if "push" in phases:
        H, W = full_res
        fn = make_push_batched_fn(model, cfg.model.num_classes,
                                  normalize=normalize)
        img = _sds((push_batch, H, W, 3), jnp.uint8)
        lab = _sds((push_batch, H, W), jnp.uint8)
        pc = _sds((P,), jnp.int32)
        timed("push_batched",
              lambda: fn.lower(params_c[0], params_c[1], pc, img,
                               lab).compile())

    return times


def _abstract_params(model, cfg):
    sample = _sds((1, cfg.data.window_size[0], cfg.data.window_size[1], 3),
                  jnp.float32)
    variables = jax.eval_shape(
        lambda s: model.init(jax.random.PRNGKey(0), s), sample)
    return variables["params"], variables.get("constants", {})


def precompile_unoise(cfg, res: Tuple[int, int] = (256, 256),
                      log=print) -> Dict[str, float]:
    """Warm the U-Noise utility + noise train steps (the raw
    single-channel input mode the CLI pipelines use).

    The classification train step is NOT warmable ahead of data: its
    StepLR schedule bakes ``steps_per_epoch`` (a dataset-size fact)
    into the program, so a precompile with a guessed value would miss
    the cache anyway."""
    from adlm_tpu.train.unoise import (
        init_noise_state,
        init_utility_state,
        make_noise_train_step,
        make_utility_train_step,
    )

    H, W = res
    B = cfg.batch_size
    times: Dict[str, float] = {}
    sample3 = _sds((1, H, W, 3), jnp.float32)
    images = _sds((B, H, W, 1), jnp.float32)
    masks = _sds((B, H, W, 1), jnp.float32)

    util_state = jax.eval_shape(
        lambda s: init_utility_state(cfg, jax.random.PRNGKey(0), s),
        sample3)
    t0 = time.perf_counter()
    make_utility_train_step(cfg, raw=True).lower(
        util_state, images, masks).compile()
    times["unoise_util"] = round(time.perf_counter() - t0, 2)
    log(f"precompile unoise_util: {times['unoise_util']}s")

    noise_state = jax.eval_shape(
        lambda s, u: init_noise_state(cfg, jax.random.PRNGKey(0), s, u),
        sample3, util_state)
    rng = _sds((2,), jnp.uint32)
    t0 = time.perf_counter()
    make_noise_train_step(cfg, raw=True).lower(
        noise_state, images, masks, rng).compile()
    times["unoise_noise"] = round(time.perf_counter() - t0, 2)
    log(f"precompile unoise_noise: {times['unoise_noise']}s")
    return times


def apply_train_overrides(cfg: ExperimentConfig, bf16: bool, fused: bool,
                          s2b: bool,
                          wire_uint8: bool = False) -> ExperimentConfig:
    """The same config overrides cmd_train applies — keep in sync so
    precompiled programs match the run's cache keys."""
    if bf16 or fused or wire_uint8:
        overrides = {}
        if bf16:
            overrides["compute_dtype"] = "bfloat16"
        if fused:
            overrides["fused_accumulation"] = True
        if wire_uint8:
            overrides["wire_uint8"] = True
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **overrides))
    if s2b:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, dilated_space_to_batch=True))
    return cfg
