"""Headline benchmark: images/sec/chip at 2048×1024 Cityscapes inference.

Runs the flagship ProtoSeg model (PPNet, DeepLabV2-ResNet101 backbone,
190 prototypes / 19 classes — the cityscapes_kld_imnet configuration)
through the REAL evaluation path: full-resolution forward, fused Pallas
prototype head, on-device bilinear upsample + argmax + per-class I/U
accumulation (adlm_tpu.interpret.evaluate).  Only the confusion counters
leave the device.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: the reference publishes no inference throughput (BASELINE.md).
REFERENCE_IPS below is a documented estimate of the PyTorch reference's
single-GPU eval throughput for the same model/resolution class
(DeepLabV2-ResNet101, fp32, 2048×1024, per-sample python post-processing
in eval_valid.py:166-214): ~2.5 img/s.  The driver-provided target is
≥5× on one v5e chip, i.e. vs_baseline ≥ 5.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: remote TPU compiles take minutes otherwise
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_IPS = 2.5  # documented estimate, see module docstring
BATCH = 8
WARMUP = 2
ITERS = 8
H, W = 1024, 2048


def main() -> None:
    # the remote TPU relay occasionally throws transient INTERNAL
    # errors; retry the whole measurement a few times
    last_err = None
    for attempt in range(3):
        try:
            return _run()
        except Exception as e:  # pragma: no cover
            last_err = e
            print(f"# bench attempt {attempt + 1} failed: {e}",
                  flush=True)
            time.sleep(10)
    raise last_err


def _run() -> None:
    from adlm_tpu.core.config import get_experiment
    from adlm_tpu.models.ppnet import PPNet, default_proto_class
    from adlm_tpu.interpret.evaluate import make_inference_fn

    cfg = get_experiment("cityscapes_kld_imnet")
    model = PPNet(cfg=cfg.model)

    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((1, 65, 65, 3), jnp.float32)
    # materialize params host-side from abstract shapes: values don't
    # affect throughput and this skips a multi-minute remote TPU compile
    # of the init graph
    shapes = jax.eval_shape(lambda: model.init(rng, init_x))
    nprng0 = np.random.RandomState(42)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            nprng0.uniform(0.01, 0.1, size=s.shape).astype(s.dtype)),
        shapes)
    params = variables["params"]
    constants = variables.get("constants", {})
    pc = default_proto_class(cfg.model.num_prototypes, cfg.model.num_classes)

    # bf16 weights/activations for the MXU; the prototype head
    # accumulates in f32 internally
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)

    fn = make_inference_fn(model, cfg.model.num_classes, with_stats=False)

    nprng = np.random.RandomState(0)
    images = jnp.asarray(
        nprng.rand(BATCH, H, W, 3).astype(np.float32), jnp.bfloat16)
    labels = jnp.asarray(nprng.randint(0, 20, size=(BATCH, H, W)),
                         jnp.int32)

    # NOTE: sync via host fetch — block_until_ready does not reliably
    # wait for remote execution through the axon relay.  Steady-state
    # throughput: enqueue all calls (device pipeline stays full), then
    # drain.
    for _ in range(WARMUP):
        out = fn(params, constants, pc, images, labels)
        np.asarray(out["intersection"])

    t0 = time.perf_counter()
    outs = [fn(params, constants, pc, images, labels)
            for _ in range(ITERS)]
    for out in outs:
        np.asarray(out["intersection"])
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    # the inference fn is unsharded — it runs on ONE chip regardless of
    # how many are visible, so the measurement is already per-chip
    ips_per_chip = ips

    print(json.dumps({
        "metric": "cityscapes_2048x1024_inference",
        "value": round(ips_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_per_chip / REFERENCE_IPS, 3),
    }))


if __name__ == "__main__":
    main()
