"""Stats-upsampled eval epilogue ablation (VERDICT r4 item 4).

The `--stats-upsampled` eval at batch 16 measured 27.7 img/s vs the
41.5 img/s no-stats floor — a 192 ms/batch epilogue on top of the
385 ms forward.  This times each epilogue piece IN ISOLATION on the
real chip at the flagship stats shape ((16, 129, 257, 190) bf16 maps →
1024×2048 outputs) so the round-5 restructurings can be attributed:

* fused Pallas upsample+argmin kernel (and XLA-scan fallback), default
  vs exact-f32 precision, plus tile-plan variants at batch 16 (the
  shipped th=128/tw=512/c=8 plan was tuned at batch 8);
* agreement_counts at chunk ∈ {2, 8, 16, 64, 190} — chunk 2 is what
  the resize clamp forced on it before the round-5 decoupling (95
  full-map re-read passes ≈ 25 GB of HBM at batch 16);
* purity sampling (1-gather batched taps vs the 4-gather formulation)
  + the (B, 100, 190) argsort.

Timing is pipelined (enqueue ITERS dispatches, then drain a scalar per
dispatch to host) per CLAUDE.md's relay rules; every program returns a
reduced scalar so nothing big crosses the relay.

Usage: python experiments/stats_epilogue_ablation.py [--iters 8]
Writes experiments/stats_epilogue_ablation.json.
"""

import argparse
import functools
import json
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

B, GH, GW, P = 16, 129, 257, 190
H, W = 1024, 2048
C = 19
N_PIX = 100


def _best_dt(loop, repeats=3):
    return min(loop() for _ in range(repeats))


def _time(fn, args, iters):
    """Pipelined: enqueue iters dispatches, drain one scalar each."""
    np.asarray(fn(*args))  # compile + warm
    np.asarray(fn(*args))

    def loop():
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        return time.perf_counter() - t0

    return _best_dt(loop) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--skip-tiles", action="store_true",
                    help="skip the kernel tile-plan sweep (each variant "
                         "pays a multi-minute remote compile once)")
    args = ap.parse_args()

    from adlm_tpu.interpret.evaluate import (_bilinear_gather,
                                             _topk_purity,
                                             _upsampled_argmin_scan,
                                             agreement_counts,
                                             upsampled_nearest)
    from adlm_tpu.ops.upsample_argmin import upsampled_argmin_pallas

    nprng = np.random.RandomState(0)
    dist = jnp.asarray(nprng.rand(B, GH, GW, P).astype(np.float32),
                       jnp.bfloat16)
    nearest = jnp.asarray(nprng.randint(0, P, size=(B, H, W)), jnp.int32)
    pred = jnp.asarray(nprng.randint(0, C, size=(B, H, W)), jnp.int32)
    pc = jnp.asarray(nprng.randint(0, C, size=(P,)), jnp.int32)
    u = jnp.asarray(nprng.rand(B, N_PIX).astype(np.float32))
    v = jnp.asarray(nprng.rand(B, N_PIX).astype(np.float32))

    res = {}

    # -- upsample+argmin kernel (returns a reduced scalar) ------------
    @jax.jit
    def k_default(d):
        return jnp.sum(upsampled_nearest(d, (H, W)))

    @jax.jit
    def k_exact(d):
        return jnp.sum(upsampled_nearest(d, (H, W), exact=True))

    @jax.jit
    def k_scan(d):
        return jnp.sum(_upsampled_argmin_scan(d, (H, W), chunk=2))

    res["kernel_default_ms"] = _time(k_default, (dist,), args.iters)
    res["kernel_exact_ms"] = _time(k_exact, (dist,), args.iters)
    res["xla_scan_chunk2_ms"] = _time(k_scan, (dist,), args.iters)
    print(f"kernel default {res['kernel_default_ms']:.1f} ms | exact "
          f"{res['kernel_exact_ms']:.1f} | scan(c2) "
          f"{res['xla_scan_chunk2_ms']:.1f}", flush=True)

    if not args.skip_tiles:
        for th, tw, c in [(128, 512, 8), (256, 512, 8), (128, 1024, 8),
                          (128, 512, 16), (64, 512, 8), (128, 256, 8)]:
            f = jax.jit(lambda d, th=th, tw=tw, c=c: jnp.sum(
                upsampled_argmin_pallas(d, (H, W), th=th, tw=tw, c=c)))
            try:
                ms = _time(f, (dist,), args.iters)
            except Exception as e:  # VMEM overflow etc.
                ms = None
                print(f"tile th={th} tw={tw} c={c}: {type(e).__name__}",
                      flush=True)
            res[f"kernel_th{th}_tw{tw}_c{c}_ms"] = ms
            if ms:
                print(f"tile th={th} tw={tw} c={c}: {ms:.1f} ms",
                      flush=True)

    # -- agreement counts ---------------------------------------------
    for chunk in (2, 8, 16, 64, P):
        f = jax.jit(functools.partial(agreement_counts, chunk=chunk))
        res[f"agree_chunk{chunk}_ms"] = _time(f, (nearest, pred, pc),
                                              args.iters)
        print(f"agreement chunk={chunk}: "
              f"{res[f'agree_chunk{chunk}_ms']:.1f} ms", flush=True)

    # -- purity sampling + sort ----------------------------------------
    @jax.jit
    def purity(d, uu, vv, pp, pcc):
        rows = jnp.minimum((uu * H).astype(jnp.int32), H - 1)
        cols = jnp.minimum((vv * W).astype(jnp.int32), W - 1)
        sample_d = _bilinear_gather(d, rows, cols, H, W)
        bidx = jnp.arange(B)[:, None]
        sample_pred = pp[bidx, rows, cols]
        return jnp.sum(_topk_purity(sample_d, sample_pred, pcc))

    res["purity_ms"] = _time(purity, (dist, u, v, pred, pc), args.iters)
    print(f"purity (batched-tap gather + sort): {res['purity_ms']:.1f} ms",
          flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "stats_epilogue_ablation.json")
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
