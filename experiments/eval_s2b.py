"""Headline-inference experiment: dilated convs vs space-to-batch at
EVAL geometry (2048×1024, batch 16).

PERF.md records the s2b rewrite as neutral at the TRAINING geometry
(65×65 grids, batch 10: 156.6 vs 154.3 ms — reshape overhead eats the
dilation cost), but the headline note says the d=2/4 convs at eval
shapes run "within ~20% of an equivalent dense conv" — so at 256×128
grids × batch 16 there may be real headroom the training ablation
can't see.  This measures the full inference fn (forward → upsample →
argmax → I/U counters, adlm_tpu.interpret.evaluate.make_inference_fn)
with ``dilated_space_to_batch`` on/off on the real TPU, pipelined
timing per CLAUDE.md.

Numerical exactness of the s2b lowering is already tested
(tests/test_models.py); this is timing only.
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

BATCH, H, W = 16, 1024, 2048


def _host_random_variables(model, rng_seed=42):
    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((1, 65, 65, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(rng, init_x))
    nprng = np.random.RandomState(rng_seed)
    return jax.tree.map(
        lambda s: jnp.asarray(
            nprng.uniform(0.01, 0.1, size=s.shape).astype(s.dtype)),
        shapes)


def time_inference(s2b: bool, iters: int = 8) -> float:
    from adlm_tpu.core.config import get_experiment
    from adlm_tpu.interpret.evaluate import make_inference_fn
    from adlm_tpu.models.ppnet import PPNet, default_proto_class

    cfg = get_experiment("cityscapes_kld_imnet")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, dilated_space_to_batch=s2b))
    model = PPNet(cfg=cfg.model)
    variables = _host_random_variables(model)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, variables["params"])
    constants = variables.get("constants", {})
    pc = default_proto_class(cfg.model.num_prototypes,
                             cfg.model.num_classes)

    fn = make_inference_fn(model, cfg.model.num_classes, with_stats=False)
    nprng = np.random.RandomState(0)
    images = jnp.asarray(
        nprng.rand(BATCH, H, W, 3).astype(np.float32), jnp.bfloat16)
    labels = jnp.asarray(nprng.randint(0, 20, size=(BATCH, H, W)),
                         jnp.int32)

    for _ in range(2):
        out = fn(params, constants, pc, images, labels)
        np.asarray(out["intersection"])

    def loop():
        t0 = time.perf_counter()
        outs = [fn(params, constants, pc, images, labels)
                for _ in range(iters)]
        for out in outs:
            np.asarray(out["intersection"])
        return time.perf_counter() - t0

    dt = min(loop() for _ in range(3))
    return BATCH * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    for s2b in (False, True):
        ips = time_inference(s2b, args.iters)
        print(f"s2b={s2b}: {ips:.1f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
