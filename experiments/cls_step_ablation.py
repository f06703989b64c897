"""Classification train-step ablation: where do the 83 ms go?

The bf16 ProtoPNet joint step at the reference CUB budget (vgg19,
batch 80 x 224^2, 2000x128 prototypes - reference settings.py:5-48)
runs at 83 ms ~= 29% MXU (PERF.md).  This script measures, on the real
TPU with pipelined timing (CLAUDE.md):

  1. XLA cost_analysis FLOPs of the jitted step (ground truth, not an
     estimate),
  2. full step vs forward+loss only (backward+optimizer share),
  3. backbone-only forward vs full forward (prototype-head share),
  4. optional jax.profiler trace for op-level attribution.

Results land in PERF.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _setup(bf16: bool, batch: int):
    from adlm_tpu.models.ppnet import PPNet
    from adlm_tpu.train.classification import (
        ClassificationConfig, init_classifier_state)

    cfg = ClassificationConfig(
        compute_dtype="bfloat16" if bf16 else "float32")
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(0)
    init_x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    state = init_classifier_state(model, cfg, "joint",
                                  jax.random.PRNGKey(0), init_x)
    images = jnp.asarray(rng.rand(batch, 224, 224, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 200, size=(batch,)))
    return cfg, model, state, images, labels


def _pipelined_ms(fn, args, iters, sync):
    out = fn(*args)
    np.asarray(sync(out))  # compile + settle
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        np.asarray(sync(o))
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=80)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args()
    bf16 = not args.f32

    from adlm_tpu.train.classification import (
        classification_loss, make_cls_train_step)

    cfg, model, state, images, labels = _setup(bf16, args.batch)
    step = make_cls_train_step(model, cfg, "joint")

    # 1. ground-truth FLOPs from XLA
    lowered = jax.jit(step.__wrapped__).lower(state, images, labels)
    cost = lowered.compile().cost_analysis()
    tflop = float(cost.get("flops", 0.0)) / 1e12
    print(f"cost_analysis: {tflop:.2f} TFLOP/step")

    # 2. full step
    full_ms = _pipelined_ms(step, (state, images, labels), args.iters,
                            lambda o: o[1]["loss"])
    eff = tflop / (full_ms / 1e3)
    print(f"full step: {full_ms:.1f} ms  -> {eff:.0f} TFLOP/s "
          f"({eff / 197 * 100:.0f}% of bf16 peak)")

    # 3. forward+loss only (same dtype semantics as the step's loss fn)
    from adlm_tpu.core.dtypes import tree_bf16

    def fwd(params, imgs, labs):
        p = tree_bf16(params) if bf16 else params
        x = imgs.astype(jnp.bfloat16) if bf16 else imgs
        out, _ = model.apply(
            {"params": p, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"])
        logits, min_d = out
        loss, _ = classification_loss(
            logits.astype(jnp.float32), min_d.astype(jnp.float32),
            labs, state.proto_class, params["last_layer"], cfg)
        return loss

    fwd_j = jax.jit(fwd)
    fcost = fwd_j.lower(state.params, images, labels).compile(
        ).cost_analysis()
    ftflop = float(fcost.get("flops", 0.0)) / 1e12
    fwd_ms = _pipelined_ms(fwd_j, (state.params, images, labels),
                           args.iters, lambda o: o)
    feff = ftflop / (fwd_ms / 1e3)
    print(f"forward+loss: {fwd_ms:.1f} ms ({ftflop:.2f} TFLOP) "
          f"-> {feff:.0f} TFLOP/s; backward+opt = "
          f"{full_ms - fwd_ms:.1f} ms = {(full_ms - fwd_ms) / fwd_ms:.2f}x "
          f"forward")

    # 4. backbone-only forward (prototype-head share of the forward)
    def backbone(params, imgs):
        p = tree_bf16(params) if bf16 else params
        x = imgs.astype(jnp.bfloat16) if bf16 else imgs
        f = model.apply({"params": p, "batch_stats": state.batch_stats},
                        x, train=True, mutable=["batch_stats"],
                        method=model.conv_features)[0]
        return jnp.sum(f.astype(jnp.float32))

    bb_j = jax.jit(backbone)
    bb_ms = _pipelined_ms(bb_j, (state.params, images), args.iters,
                          lambda o: o)
    print(f"backbone-only forward: {bb_ms:.1f} ms "
          f"(head+loss share of forward = {fwd_ms - bb_ms:.1f} ms)")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            s, m = step(state, images, labels)
            np.asarray(m["loss"])
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
