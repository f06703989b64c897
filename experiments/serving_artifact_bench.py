"""Exported-artifact serving throughput vs the live jit path.

The deployment story (deploy/export.py) claims the AOT StableHLO
artifact IS the inference program with weights baked in; this measures
that claim on the real TPU at the serving shape (batch 1, full-res
1024x2048, uint8 inputs + on-device normalization, bf16 MXU) and
compares with the live `make_inference_fn` path bench.py reports
(PERF.md: 27.6 img/s batch-1).  Pipelined timing per CLAUDE.md.
"""

import os
import sys
import tempfile
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

H, W = 1024, 2048


def main():
    from adlm_tpu.core.config import get_experiment
    from adlm_tpu.deploy.export import (
        export_inference_artifact, load_inference_artifact)
    from adlm_tpu.models.ppnet import PPNet, default_proto_class

    cfg = get_experiment("cityscapes_kld_imnet")
    model = PPNet(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init(rng, jnp.zeros((1, 65, 65, 3))))
    nprng = np.random.RandomState(7)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            nprng.uniform(0.01, 0.1, size=s.shape).astype(s.dtype)),
        shapes)
    pc = default_proto_class(cfg.model.num_prototypes,
                             cfg.model.num_classes)

    out_dir = os.path.join(tempfile.gettempdir(), "serving_bench_export")
    t0 = time.perf_counter()
    export_inference_artifact(
        model, variables["params"], variables.get("constants", {}), pc,
        out_dir, batch=1, size=(H, W),
        normalize=(cfg.data.mean, cfg.data.std), platforms=("tpu",))
    print(f"export (lower+serialize): {time.perf_counter() - t0:.1f}s")
    sz = os.path.getsize(os.path.join(out_dir, "inference_tpu.stablehlo"))
    print(f"artifact size: {sz / 1e6:.1f} MB")

    call, manifest = load_inference_artifact(out_dir, platform="tpu")
    raw = jnp.asarray(nprng.randint(0, 255, size=(1, H, W, 3)), jnp.uint8)

    # two sync targets: the small nearest_proto grid (132 KB — compute-
    # comparable with the live path's counter fetch) and the full pred
    # map (8 MB int32 — what a serving loop returns; through THIS HTTP
    # relay that fetch is the bottleneck, not the TPU program; on-pod
    # serving has no such relay)
    for _ in range(2):
        np.asarray(call(raw)["nearest_proto"])  # compile + settle
    n = 12
    t0 = time.perf_counter()
    outs = [call(raw) for _ in range(n)]
    for o in outs:
        np.asarray(o["nearest_proto"])
    ips = n / (time.perf_counter() - t0)
    print(f"artifact serving (compute, small fetch): {ips:.1f} img/s "
          f"at batch 1")
    t0 = time.perf_counter()
    outs = [call(raw) for _ in range(n)]
    for o in outs:
        np.asarray(o["pred"])
    ips = n / (time.perf_counter() - t0)
    print(f"artifact serving (full 8 MB pred fetched through the "
          f"relay): {ips:.1f} img/s at batch 1")


if __name__ == "__main__":
    main()
