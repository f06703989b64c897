"""Diagnose the full-budget joint-phase NaN divergence (round 5).

The reference-budget from-scratch run (flagship_synth_full) diverged to
NaN within the first ~100 joint windows, while the 10%-budget demo
(round 4) survived the identical LRs — the only differences are the 10×
longer warmup (a much better-converged head at joint entry) and the 10×
longer poly schedule.  Warmup_last is verified finite; nopush_last is
NaN throughout the optimizer moments.

This replays the joint phase from the run's own warmup_last checkpoint
with an INSTRUMENTED step: the exact same loss/grads/optimizer update,
plus per-term metrics, the global gradient norm, and per-group max |g|,
fetched every window.  It stops at the first non-finite quantity and
prints the trajectory around it — separating
  (a) a NaN gradient EVENT (loss finite, some grad inf/NaN → clip or
      guard the offending op) from
  (b) loss divergence (loss grows then overflows → lower LR / clip) from
  (c) a phase-transition bug (window 0 already non-finite).

Usage: python experiments/joint_divergence_probe.py \
           --run-dir /tmp/flagship_e2e/runs/flagship_synth \
           --data-path /tmp/flagship_e2e/data [--windows 150]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--windows", type=int, default=150)
    ap.add_argument("--grad-clip", type=float, default=None,
                    help="probe a clipped run instead (same instrumented "
                         "step + optax.clip_by_global_norm)")
    ap.add_argument("--lr-warmup", type=int, default=None,
                    help="probe with joint_lr_warmup_updates=N — the "
                         "candidate fix for the first-update sigmoid "
                         "saturation (fresh Adam's ±lr jolt)")
    args = ap.parse_args()

    import dataclasses
    import optax
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.core.config import ExperimentConfig
    from adlm_tpu.data.dataset import SegmentationDataset
    from adlm_tpu.data.pipeline import superbatch_iterator
    from adlm_tpu.models.ppnet import PPNet
    from adlm_tpu.train.optimizer import label_params, make_optimizer
    from adlm_tpu.train.pipeline import ship_dtypes, wire_uint8_images
    from adlm_tpu.train.protoseg import (init_protoseg_state, loss_fn,
                                         _make_tx)

    store = CheckpointStore(args.run_dir)
    cfg = ExperimentConfig.from_json(store.load_config_json())
    if args.lr_warmup is not None:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, joint_lr_warmup_updates=args.lr_warmup))
    t = cfg.train

    payload = store.restore("warmup", "last")
    params, constants = payload["params"], payload["constants"]
    pc = jnp.asarray(payload["proto_class"])
    model = PPNet(cfg=cfg.model)
    rng = jax.random.PRNGKey(t.random_seed)
    wh, ww = cfg.data.window_size
    sample = jnp.zeros((1, wh, ww, 3), jnp.float32)
    state = init_protoseg_state(model, cfg, 1, t.joint_steps, rng,
                                sample, params=params,
                                constants=constants, proto_class=pc)

    tx = _make_tx(cfg, 1, t.joint_steps)
    if args.grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(args.grad_clip), tx)
        state = state.replace(opt_state=tx.init(state.params))

    groups = label_params(state.params)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(st, images, labels):
        n_micro = images.shape[0]
        flat_img = images.reshape(-1, *images.shape[2:])
        flat_lab = labels.reshape(-1, *labels.shape[2:])
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st.params, st.constants, model, st.proto_class, cfg,
            (flat_img, flat_lab), True, n_micro)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        # diagnostics: global grad norm + per-group max |g| + param max
        metrics["grad_norm"] = optax.global_norm(grads)
        flat, _ = jax.tree_util.tree_flatten_with_path(grads)
        gflat = dict(jax.tree_util.tree_leaves_with_path(grads))
        lab_flat = jax.tree_util.tree_leaves_with_path(groups)
        per_group = {}
        for (path, g) in gflat.items():
            lbl = dict(lab_flat)[path]
            m = jnp.max(jnp.abs(g))
            per_group[lbl] = jnp.maximum(per_group.get(lbl, 0.0), m)
        for lbl, m in per_group.items():
            metrics[f"gmax_{lbl}"] = m
        metrics["param_max"] = optax.global_norm(new_params)
        return st.replace(params=new_params, opt_state=new_opt,
                          step=st.step + 1), metrics

    train_ds = SegmentationDataset(cfg.data, cfg.data.train_key,
                                   data_path=args.data_path)
    img_dt, lab_dt = ship_dtypes(cfg)
    it = superbatch_iterator(train_ds, t.iter_size, t.joint_batch_size,
                             args.windows, seed=t.random_seed,
                             n_jobs=cfg.data.dataloader_n_jobs,
                             start_window=0,
                             mode=cfg.data.dataloader_mode)
    print(f"probing {args.windows} joint windows "
          f"(grad_clip={args.grad_clip}, "
          f"lr_warmup={cfg.train.joint_lr_warmup_updates})", flush=True)
    for w, (images, labels) in enumerate(it):
        if img_dt == np.uint8:
            images = wire_uint8_images(images, cfg.data.mean, cfg.data.std)
        elif images.dtype != img_dt:
            images = images.astype(img_dt)
        if lab_dt == np.uint8 and labels.dtype != np.uint8:
            labels = labels.astype(np.uint8)
        state, m = step(state, jnp.asarray(images), jnp.asarray(labels))
        m = {k: float(v) for k, v in m.items()}
        line = (f"w{w:04d} loss={m['loss']:.4f} ce={m['cross_entropy']:.4f} "
                f"kld={m['kld_loss']:.4f} gnorm={m['grad_norm']:.3e} "
                f"pnorm={m['param_max']:.3e} "
                + " ".join(f"{k[5:]}={v:.2e}" for k, v in sorted(m.items())
                           if k.startswith("gmax_")))
        print(line, flush=True)
        if not all(np.isfinite(v) for v in m.values()):
            print(f"FIRST NON-FINITE at window {w}", flush=True)
            bad = [k for k, v in m.items() if not np.isfinite(v)]
            print("non-finite keys:", bad, flush=True)
            break


if __name__ == "__main__":
    main()
