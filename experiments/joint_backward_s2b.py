"""Joint-window backward experiment: dilated convs vs space-to-batch.

VERDICT r2 #2: the fused bf16 joint window (iter_size 5 × batch 2 ×
513², the reference budget) runs at ~155 ms ≈ 40% MXU while inference
reaches 67%; PERF.md attributes the gap to the d=2/4 dilated-conv
backward at batch-2-ish geometry.  This script measures, on the real
TPU:

  1. the fused joint window with the standard dilated lowering,
  2. the same window with ``dilated_space_to_batch=True`` (layer4/5
     convs lowered to DENSE 3×3 convs over d²× the batch — numerically
     exact, see models/layers.ConvBN and tests/test_models.py),
  3. optional: a jax.profiler trace of each for op-level attribution
     (pass --trace-dir).

Pipelined timing (enqueue, then host-fetch) per CLAUDE.md.  Results are
recorded in PERF.md.
"""

import argparse
import dataclasses
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


def _patch_dense_dilations():
    """Timing probe ONLY (not numerically equivalent): build the
    backbone with layer4/5 dilation 1 so the window runs the same
    FLOPs through DENSE convs — an upper bound on what any dilated-conv
    rewrite could buy."""
    import flax.linen as nn

    import adlm_tpu.models.deeplab as dl
    import adlm_tpu.models.ppnet as pp

    class DenseDeepLabV2(dl.DeepLabV2):
        @nn.compact
        def __call__(self, x):
            x = dl.Stem(name="layer1")(x)
            x = dl.ResLayer(self.n_blocks[0], 64, 256, 1, 1,
                            name="layer2")(x)
            x = dl.ResLayer(self.n_blocks[1], 128, 512, 2, 1,
                            name="layer3")(x)
            x = dl.ResLayer(self.n_blocks[2], 256, 1024, 1, 1,
                            name="layer4")(x)
            x = dl.ResLayer(self.n_blocks[3], 512, 2048, 1, 1,
                            name="layer5")(x)
            return dl.ASPP(self.out_features, self.atrous_rates,
                           name="aspp")(x)

    dl.DeepLabV2 = DenseDeepLabV2
    pp.DeepLabV2 = DenseDeepLabV2


def time_window(s2b: bool, fused: bool = True, iters: int = 6,
                trace_dir: str = None, dense: bool = False,
                fwd_only: bool = False) -> float:
    from adlm_tpu.core.config import get_experiment
    from adlm_tpu.models.ppnet import PPNet
    from adlm_tpu.train.protoseg import init_protoseg_state, make_train_step

    if dense:
        _patch_dense_dilations()
    cfg = get_experiment("cityscapes_kld_imnet")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, dilated_space_to_batch=s2b),
        train=dataclasses.replace(cfg.train, compute_dtype="bfloat16",
                                  fused_accumulation=fused))
    model = PPNet(cfg=cfg.model)

    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((1, 65, 65, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(rng, init_x))
    nprng = np.random.RandomState(42)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            nprng.uniform(0.01, 0.1, size=s.shape).astype(s.dtype)),
        shapes)

    state = init_protoseg_state(
        model, cfg, 1, 1000, jax.random.PRNGKey(0), init_x,
        params=variables["params"],
        constants=variables.get("constants", {}))
    it, bs = cfg.train.iter_size, cfg.train.joint_batch_size
    wh, ww = cfg.data.window_size

    if fwd_only:
        # forward + loss only, same flattened batch-10 geometry as the
        # fused window — isolates the backward+optimizer share
        from adlm_tpu.models.ppnet import default_proto_class
        from adlm_tpu.train.protoseg import loss_fn

        pc = default_proto_class(cfg.model.num_prototypes,
                                 cfg.model.num_classes)
        fn = jax.jit(lambda p, c, im, lb: loss_fn(
            p, c, model, pc, cfg, (im, lb), True, it)[0])
        flat_img = jnp.asarray(
            nprng.rand(it * bs, wh, ww, 3).astype(np.float32))
        flat_lab = jnp.asarray(
            nprng.randint(0, 20, size=(it * bs, wh, ww)), jnp.int32)
        np.asarray(fn(state.params, state.constants, flat_img, flat_lab))
        t0 = time.perf_counter()
        outs = [fn(state.params, state.constants, flat_img, flat_lab)
                for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        return (time.perf_counter() - t0) / iters * 1000.0

    step = make_train_step(model, cfg, 1, 1000)
    images = jnp.asarray(nprng.rand(it, bs, wh, ww, 3).astype(np.float32))
    labels = jnp.asarray(nprng.randint(0, 20, size=(it, bs, wh, ww)),
                         jnp.int32)

    state, m = step(state, images, labels)
    np.asarray(m["loss"])  # compile + sync

    if trace_dir:
        with jax.profiler.trace(os.path.join(
                trace_dir, "s2b" if s2b else "dilated")):
            state, m = step(state, images, labels)
            np.asarray(m["loss"])

    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        state, m = step(state, images, labels)
        outs.append(m)
    for m in outs:
        np.asarray(m["loss"])
    return (time.perf_counter() - t0) / iters * 1000.0


def time_inference(s2b: bool, batch: int = 16, iters: int = 6) -> float:
    """Headline-path eval throughput (bench.py geometry: 2048×1024,
    bf16, pipelined) with/without the s2b lowering."""
    from adlm_tpu.core.config import get_experiment
    from adlm_tpu.interpret.evaluate import make_inference_fn
    from adlm_tpu.models.ppnet import PPNet, default_proto_class

    cfg = get_experiment("cityscapes_kld_imnet")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       dilated_space_to_batch=s2b))
    model = PPNet(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((1, 65, 65, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(rng, init_x))
    nprng = np.random.RandomState(42)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            nprng.uniform(0.01, 0.1, size=s.shape).astype(s.dtype)),
        shapes)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, variables["params"])
    constants = variables.get("constants", {})
    pc = default_proto_class(cfg.model.num_prototypes,
                             cfg.model.num_classes)
    fn = make_inference_fn(model, cfg.model.num_classes, with_stats=False)
    images = jnp.asarray(nprng.rand(batch, 1024, 2048, 3).astype(
        np.float32), jnp.bfloat16)
    labels = jnp.asarray(nprng.randint(0, 20, size=(batch, 1024, 2048)),
                         jnp.int32)
    for _ in range(2):
        out = fn(params, constants, pc, images, labels)
        np.asarray(out["intersection"])
    t0 = time.perf_counter()
    outs = [fn(params, constants, pc, images, labels)
            for _ in range(iters)]
    for out in outs:
        np.asarray(out["intersection"])
    return batch * iters / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--variants", default="dilated,s2b",
                    help="comma list from {dilated, s2b, dense, fwd}")
    ap.add_argument("--mode", default="train",
                    choices=["train", "inference"])
    args = ap.parse_args()
    for v in args.variants.split(","):
        if args.mode == "train":
            ms = time_window(s2b=(v == "s2b"), trace_dir=args.trace_dir,
                             dense=(v == "dense"), fwd_only=(v == "fwd"))
            print(f"fused bf16 joint window [{v}]: {ms:.1f} ms "
                  f"({10 / ms * 1000:.1f} img/s)", flush=True)
        else:
            ips = time_inference(s2b=(v == "s2b"))
            print(f"2048x1024 eval [{v}]: {ips:.1f} img/s/chip",
                  flush=True)


if __name__ == "__main__":
    main()
