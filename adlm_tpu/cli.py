"""Command-line entry points.

Mirrors the reference's entry points (reference SURVEY layer map):

    python -m adlm_tpu.cli train <experiment> <run_name> [--pruned]
    python -m adlm_tpu.cli eval-valid <run_dir> <stage>
    python -m adlm_tpu.cli eval-test <run_dir> <stage>
    python -m adlm_tpu.cli prune <run_dir>
    python -m adlm_tpu.cli unoise-train-util / unoise-train-noise
    python -m adlm_tpu.cli preprocess-cityscapes / -pascal / -pancreas /
        prepare-unoise / gen-image-list

Environment: DATA_PATH (dataset root), RESULTS_DIR (run outputs) — same
contract as the reference's env.sh / settings.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

# exit code for TrainingDiverged: tells the --auto-restart watchdog the
# failure is deterministic (resume with identical args replays it), so
# it must stop instead of burning its restart budget
DIVERGED_EXIT = 86


def _enable_compile_cache():
    import jax
    cache = os.environ.get("JAX_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _results_dir(run_name: str) -> str:
    base = os.environ.get("RESULTS_DIR", "./runs")
    return os.path.join(base, run_name)


def _strip_valued_flags(argv, names):
    """argv minus the given ``--flag value`` / ``--flag=value`` pairs."""
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in names:
            skip = True
            continue
        if any(a.startswith(n + "=") for n in names):
            continue
        out.append(a)
    return out


def _watchdog_relaunch_cmd(base_argv, run_dir, attempt):
    """Child command for --auto-restart attempt N.  Only resume once
    there is something to resume: a child that died before its first
    _run_phase (pretrained load / bn-calibrate / initial compile)
    never wrote resume.json, and --resume on a fresh run_dir is a hard
    SystemExit — without the existence check the whole restart budget
    burns on relaunches that fail in seconds."""
    child = [sys.executable, "-m", "adlm_tpu.cli"] + list(base_argv)
    has_resume = os.path.exists(os.path.join(run_dir, "resume.json"))
    if attempt > 0 and has_resume and "--resume" not in child:
        child.append("--resume")
    return child


def cmd_train(args):
    if getattr(args, "auto_restart", None) is not None:
        # supervisor mode: run the training as a child process under a
        # heartbeat watchdog; on a relay wedge (indefinite hang, no
        # error — the documented TPU-relay failure mode) or a crash,
        # kill it, wait for the device to answer a probe again, and
        # relaunch with --resume (bit-identical continuation,
        # train/pipeline.py).  utils/watchdog.py has the full story.
        from adlm_tpu.utils.watchdog import run_with_watchdog
        run_dir = _results_dir(args.run_name)
        base = _strip_valued_flags(
            list(args._argv), ("--auto-restart", "--watchdog-timeout"))

        def make_cmd(attempt):
            return _watchdog_relaunch_cmd(base, run_dir, attempt)

        raise SystemExit(run_with_watchdog(
            make_cmd,
            [os.path.join(run_dir, "logs", "train.log"),
             os.path.join(run_dir, "logs", "train_metrics.csv")],
            timeout_s=args.watchdog_timeout,
            max_restarts=args.auto_restart))
    _enable_compile_cache()
    from adlm_tpu.core.config import get_experiment
    from adlm_tpu.train.pipeline import run_protoseg_training

    from adlm_tpu.deploy.precompile import apply_train_overrides

    cfg = get_experiment(args.experiment)
    cfg = apply_train_overrides(cfg, args.bf16, args.fused, args.s2b,
                                wire_uint8=args.wire_uint8)
    if args.bn_calibrate:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, bn_calibrate=True))
    if args.proto_init_data:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, proto_init_data=True))
    if args.presigmoid_ln:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, presigmoid_ln=True))
    if args.grad_clip is not None:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, grad_clip_norm=args.grad_clip))
    if args.joint_lr_warmup is not None:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, joint_lr_warmup_updates=args.joint_lr_warmup))
    if args.dataloader_mode or args.dataloader_jobs:
        # loader execution knobs only — the sample stream itself is a
        # pure function of the seed (per-(seed,counter) RNG), so these
        # never change training results
        dkw = {}
        if args.dataloader_mode:
            dkw["dataloader_mode"] = args.dataloader_mode
        if args.dataloader_jobs:
            dkw["dataloader_n_jobs"] = args.dataloader_jobs
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data, **dkw))
    run_dir = _results_dir(args.run_name)
    os.makedirs(run_dir, exist_ok=True)

    mesh = None
    if args.distributed:
        import jax
        jax.distributed.initialize()
    if args.mesh_data or args.mesh_model > 1:
        from adlm_tpu.core.mesh import MeshSpec, make_mesh
        mesh = make_mesh(MeshSpec(data=args.mesh_data or -1,
                                  model=args.mesh_model))
    from adlm_tpu.train.pipeline import TrainingDiverged
    try:
        run_protoseg_training(
            cfg, run_dir, data_path=args.data_path, pruned=args.pruned,
            start_checkpoint=args.start_checkpoint,
            val_every=args.val_every, val_batches=args.val_batches,
            steps_scale=args.steps_scale,
            save_push_visualizations=args.save_push_visualizations,
            push_batch_size=args.push_batch_size,
            pretrained_path=args.pretrained,
            pretrained_naming="deeplab" if cfg.load_coco
            else "torchvision",
            mesh=mesh, trace_dir=args.trace_dir,
            val_augment=args.val_augment, resume=args.resume,
            halt_after_windows=args.halt_after)
    except TrainingDiverged:
        # distinct exit code: divergence is DETERMINISTIC on resume
        # with identical args, so the watchdog must not burn its
        # restart budget replaying it (utils/watchdog.py checks this)
        raise SystemExit(DIVERGED_EXIT)


def _eval_mesh(args):
    """(data, model) mesh for sharded whole-image eval, or None.

    ``--mesh-data N`` shards the eval batch over ``data``;
    ``--mesh-model M`` > 1 additionally shards image H over ``model``
    (spatial sharding — the full-res context-parallel eval mode,
    SURVEY §5)."""
    md = getattr(args, "mesh_data", 0)
    mm = getattr(args, "mesh_model", 1)
    if not md and mm <= 1:
        return None
    if md and args.batch_size % md:
        raise SystemExit("--batch-size must be divisible by --mesh-data")
    import jax
    from adlm_tpu.core.mesh import MeshSpec, make_mesh
    md = md or 1
    return make_mesh(MeshSpec(data=md, model=mm),
                     devices=jax.devices()[:md * mm])


def cmd_eval_valid(args):
    _enable_compile_cache()
    import jax.numpy as jnp
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.core.config import ExperimentConfig
    from adlm_tpu.data.constants import get_class_table
    from adlm_tpu.data.dataset import SegmentationDataset
    from adlm_tpu.interpret.evaluate import SegEvaluator
    from adlm_tpu.interpret.stats import (
        ProtoStatsAccumulator,
        prototype_pair_distances,
        save_eval_plots,
    )
    from adlm_tpu.models.ppnet import PPNet

    store = CheckpointStore(args.run_dir)
    cfg = ExperimentConfig.from_json(store.load_config_json())
    payload = store.restore(args.stage, args.kind)
    params = payload["params"]
    proto_class = jnp.asarray(payload["proto_class"])
    n_proto = int(np.asarray(params["prototype_vectors"]).shape[0])
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, num_prototypes=n_proto))
    model = PPNet(cfg=cfg.model)
    table = get_class_table(cfg.data.class_table)

    ds = SegmentationDataset(cfg.data, args.split,
                             data_path=args.data_path, is_eval=True)
    mesh = _eval_mesh(args)
    if args.windowed:
        from adlm_tpu.interpret.windowed import WindowedSegEvaluator
        wh, ww = (int(x) for x in args.windowed.split(","))
        if args.stats_upsampled:
            raise SystemExit(
                "--stats-upsampled is whole-image only; use --stats "
                "with --windowed for the memory-bounded grid statistics")
        if mesh is not None:
            raise SystemExit("--mesh-* shards whole-image eval; "
                             "windowed mode is the single-device "
                             "memory-bounded alternative")
        # raw uint8 + per-window in-jit normalization (4× less relay
        # traffic — see dataset.supports_raw_eval)
        raw = ds.supports_raw_eval()
        ev = WindowedSegEvaluator(model, cfg.model.num_classes, (wh, ww),
                                  with_stats=args.stats,
                                  normalize=(cfg.data.mean, cfg.data.std)
                                  if raw else None,
                                  keep_stat_maps=False)
    else:
        # raw uint8 items + in-jit normalization when equivalent to the
        # host path: 4× less relay traffic and a 4× smaller input
        # buffer (batch-16 full-res f32 inputs cross the ≳400 MB relay
        # wedge threshold — see dataset.supports_raw_eval)
        raw = ds.supports_raw_eval()
        ev = SegEvaluator(model, cfg.model.num_classes,
                          with_stats=args.stats,
                          stats_upsampled=args.stats_upsampled,
                          normalize=(cfg.data.mean, cfg.data.std)
                          if raw else None, mesh=mesh,
                          stats_exact=getattr(args, "stats_exact",
                                              False))
    acc = ProtoStatsAccumulator(n_proto, cfg.model.num_classes,
                                np.asarray(proto_class)) if args.stats \
        else None
    if args.batch_size > 1:
        items = ds.eval_batches(args.batch_size, with_counts=True,
                                raw=raw)
    else:
        items = ((img, lab, 1) for img, lab in ds.eval_items(raw=raw))
    # overlap the next batch's (async) host→device upload with the
    # current batch's compute — the sequential loop is transfer-bound
    # at full resolution (PERF.md).  The fused windowed path consumes
    # device arrays directly (one upload + one dispatch per batch);
    # only the small-image windowed fallback pays a bounce-back.
    from adlm_tpu.data.pipeline import device_prefetch
    items = device_prefetch(items)

    n_images = 0
    for img, lab, n_real in items:
        # one jitted forward per batch: metrics AND (with --stats) the
        # interpretability statistics (reference eval_valid.py:158-214)
        out = ev.update(params, payload["constants"], proto_class, img, lab)
        if acc is not None:
            # padded tail images (all-void, zero image) are excluded —
            # nearest-prototype counts have no void mask to drop them.
            # Both the whole-image and windowed evaluators emit the
            # tiny (B, P) agree_counts/topk_purity vectors (windowed:
            # summed/averaged over windows) — the stat maps never
            # leave the device.
            acc.update_counts(
                np.asarray(out["agree_counts"])[:n_real],
                np.asarray(out["topk_purity"])[:n_real],
                n_images=n_real)
        n_images += n_real
        if args.max_images and n_images >= args.max_images:
            break
    res = ev.results()
    if args.stats:
        # record which statistic variant produced the prototype stats
        # (grid / upsampled bf16-taps / upsampled exact-f32 taps) so
        # comparisons against reference numbers are unambiguous
        res["stats_mode"] = (
            "grid" if (args.windowed or not args.stats_upsampled) else
            "upsampled-exact-f32" if getattr(args, "stats_exact", False)
            else "upsampled")
    out_dir = os.path.join(args.run_dir, "evaluation", args.stage)
    save_eval_plots(
        out_dir, res["iou_per_class"], res["mean_iou"],
        res["pixel_accuracy"],
        stats=acc.results() if acc else None,
        pair_stats=prototype_pair_distances(
            jnp.asarray(params["prototype_vectors"]), proto_class),
        class_names=table.class_names)

    if args.examples:
        # qualitative prediction / nearest-prototype overlays on random
        # val images (reference eval_valid.py:270-343)
        from adlm_tpu.interpret.evaluate import make_overlay_fn
        from adlm_tpu.interpret.stats import save_example_overlays
        ov_fn = make_overlay_fn(model)
        rng = np.random.RandomState(0)
        idxs = rng.choice(len(ds), size=min(args.examples, len(ds)),
                          replace=False)
        ppc = int(np.bincount(np.asarray(proto_class)).max())
        run_name = os.path.basename(os.path.normpath(args.run_dir))
        for ei, idx in enumerate(idxs):
            img_n, _ = ds.get_eval_item(int(idx))
            raw, lab = ds.get_overlay_item(int(idx))
            pred, nearest = ov_fn(params, payload["constants"],
                                  jnp.asarray(img_n[None]))
            save_example_overlays(
                out_dir, ei, raw, np.asarray(pred[0]),
                np.asarray(nearest[0]), (lab == 0).astype(np.float32),
                protos_per_class=ppc,
                title=f"{run_name} ({args.stage})")
    print(json.dumps(res, indent=2, default=float))


def cmd_eval_test(args):
    """Save per-image greyscale prediction PNGs mapped back to source
    dataset ids (reference segmentation/eval_test.py:53-115)."""
    _enable_compile_cache()
    import jax.numpy as jnp
    from PIL import Image
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.core.config import ExperimentConfig
    from adlm_tpu.data.constants import get_class_table
    from adlm_tpu.data.dataset import SegmentationDataset
    from adlm_tpu.interpret.evaluate import make_inference_fn
    from adlm_tpu.models.ppnet import PPNet

    store = CheckpointStore(args.run_dir)
    cfg = ExperimentConfig.from_json(store.load_config_json())
    payload = store.restore(args.stage, args.kind)
    params = payload["params"]
    proto_class = jnp.asarray(payload["proto_class"])
    n_proto = int(np.asarray(params["prototype_vectors"]).shape[0])
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, num_prototypes=n_proto))
    model = PPNet(cfg=cfg.model)
    table = get_class_table(cfg.data.class_table)

    # prediction → source-dataset-id map (Cityscapes submission format,
    # reference eval_test.py:52-60)
    lut = table.submission_lut(cfg.model.num_classes)

    ds = SegmentationDataset(cfg.data, args.split,
                             data_path=args.data_path, is_eval=True)
    if args.windowed:
        from adlm_tpu.interpret.windowed import WindowedSegEvaluator
        wh, ww = (int(x) for x in args.windowed.split(","))
        raw = ds.supports_raw_eval()
        wev = WindowedSegEvaluator(model, cfg.model.num_classes,
                                   (wh, ww),
                                   normalize=(cfg.data.mean, cfg.data.std)
                                   if raw else None)
        fn = lambda p, c, pc, img, lab: wev.update(p, c, pc, img, lab)
    else:
        raw = ds.supports_raw_eval()
        fn = make_inference_fn(model, cfg.model.num_classes,
                               normalize=(cfg.data.mean, cfg.data.std)
                               if raw else None)
    out_dir = os.path.join(args.run_dir, "evaluation", args.stage,
                           "test_predictions")
    os.makedirs(out_dir, exist_ok=True)
    test_items = ds.eval_items(raw=raw)
    from adlm_tpu.data.pipeline import device_prefetch
    test_items = device_prefetch(test_items)
    for i, (img, lab) in enumerate(test_items):
        out = fn(params, payload["constants"], proto_class,
                 jnp.asarray(img), jnp.asarray(lab))
        pred = np.asarray(out["pred"][0]).astype(np.uint8)
        Image.fromarray(lut[pred]).save(
            os.path.join(out_dir, ds.img_ids[i] + ".png"))
        if args.max_images and i + 1 >= args.max_images:
            break
    print(f"wrote predictions to {out_dir}")


def cmd_export(args):
    """AOT-export the inference program (weights baked in) to a
    StableHLO artifact + manifest for deployment/serving — see
    adlm_tpu/deploy/export.py.  The reference has no deployment path
    (its eval scripts rebuild the model per run)."""
    _enable_compile_cache()
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.core.config import ExperimentConfig
    from adlm_tpu.data.constants import get_class_table
    from adlm_tpu.deploy.export import export_inference_artifact
    from adlm_tpu.models.ppnet import PPNet

    store = CheckpointStore(args.run_dir)
    cfg = ExperimentConfig.from_json(store.load_config_json())
    payload = store.restore(args.stage, args.kind)
    params = payload["params"]
    n_proto = int(np.asarray(params["prototype_vectors"]).shape[0])
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, num_prototypes=n_proto))
    model = PPNet(cfg=cfg.model)
    table = get_class_table(cfg.data.class_table)

    h, w = (int(x) for x in args.size.split(","))
    # uint8 inputs + in-jit normalization unless the preset keeps raw
    # ranges (cells) or the caller wants pre-normalized f32 inputs
    normalize = None
    if not args.f32_inputs and not cfg.data.cells:
        normalize = (cfg.data.mean, cfg.data.std)
    out_dir = args.out or os.path.join(
        args.run_dir, "export", f"{args.stage}_{args.batch}x{h}x{w}")
    manifest = export_inference_artifact(
        model, params, payload["constants"], payload["proto_class"],
        out_dir, args.batch, (h, w), normalize=normalize,
        platforms=tuple(args.platforms.split(",")),
        compute_dtype=jnp.float32 if args.f32_compute else jnp.bfloat16,
        class_names=list(table.class_names))
    print(f"exported {manifest['input']['shape']} "
          f"{manifest['input']['dtype']} inference for platforms "
          f"{manifest['platforms']} to {out_dir}")


def cmd_precompile(args):
    """Warm the persistent compile cache for an experiment's programs
    (deploy/precompile.py) — remote-TPU compiles are 2–6 min each, and
    a production run otherwise pays them serially at first use."""
    _enable_compile_cache()
    from adlm_tpu.core.config import get_experiment
    from adlm_tpu.deploy.precompile import (
        apply_train_overrides, precompile_protoseg)

    cfg = get_experiment(args.experiment)
    cfg = apply_train_overrides(cfg, args.bf16, args.fused, args.s2b,
                                wire_uint8=args.wire_uint8)
    if args.presigmoid_ln:
        # the LN changes the param tree, hence every compiled program
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, presigmoid_ln=True))
    full_res = tuple(int(x) for x in args.full_res.split(","))
    times = precompile_protoseg(
        cfg, phases=args.phases.split(","),
        steps_scale=args.steps_scale, eval_batch=args.eval_batch,
        full_res=full_res, stats=args.stats,
        stats_upsampled=args.stats_upsampled,
        push_batch=args.push_batch)
    if args.unoise:
        from adlm_tpu.deploy.precompile import precompile_unoise
        ucfg = cfg.unoise
        if args.bf16:
            ucfg = dataclasses.replace(ucfg, compute_dtype="bfloat16")
        res = tuple(int(x) for x in args.unoise_res.split(","))
        times.update(precompile_unoise(ucfg, res=res))
    total = round(sum(times.values()), 1)
    print(f"precompiled {len(times)} programs in {total}s "
          f"(cache: {os.environ.get('JAX_CACHE_DIR', '.jax_cache')})")


def cmd_serve(args):
    """Serve an exported artifact over HTTP (micro-batched + pipelined
    dispatch — adlm_tpu/deploy/server.py)."""
    _enable_compile_cache()
    from adlm_tpu.deploy.server import InferenceServer

    server = InferenceServer(args.artifact_dir, port=args.port,
                             host=args.host, platform=args.platform,
                             window_ms=args.window_ms)
    shape = server.manifest["input"]["shape"]
    print(f"serving {server.manifest['input']['dtype']} {shape} "
          f"→ {server.known_outputs} on "
          f"http://{args.host}:{server.port} "
          f"(batch {shape[0]}, window {args.window_ms} ms)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()


def cmd_unoise_export(args):
    """AOT-export a trained U-Noise model (utility segmenter or noise
    importance map) for serving — see deploy/export.py."""
    _enable_compile_cache()
    import json

    import jax.numpy as jnp

    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.core.config import UNoiseConfig
    from adlm_tpu.deploy.export import export_unoise_artifact

    store = CheckpointStore(args.run_dir)
    payload = store.restore(args.model, args.kind)
    meta_name = ("utility_config" if args.model == "utility"
                 else "noise_config")
    meta_path = os.path.join(args.run_dir, f"{meta_name}.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        depth, cf = meta["depth"], meta["channel_factor"]
    else:
        depth, cf = args.depth, args.channel_factor
    cfg = UNoiseConfig(depth=depth, channel_factor=cf,
                       util_depth=depth, util_channel_factor=cf)

    h, w = (int(x) for x in args.size.split(","))
    out_dir = args.out or os.path.join(
        args.run_dir, "export", f"{args.model}_{args.batch}x{h}x{w}")
    manifest = export_unoise_artifact(
        cfg, payload["params"], payload["batch_stats"], args.model,
        out_dir, args.batch, (h, w),
        platforms=tuple(args.platforms.split(",")),
        compute_dtype=jnp.float32 if args.f32_compute else jnp.bfloat16)
    print(f"exported {manifest['model']} {manifest['input']['shape']} "
          f"for platforms {manifest['platforms']} to {out_dir}")


def cmd_cls_export(args):
    """AOT-export a trained ProtoPNet classifier (logits + per-prototype
    activation vector) for serving — see deploy/export.py."""
    _enable_compile_cache()
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.data.image_folder import IMAGENET_MEAN, IMAGENET_STD
    from adlm_tpu.deploy.export import export_cls_artifact
    from adlm_tpu.models.ppnet import PPNet
    from adlm_tpu.train.classification_pipeline import load_cls_config

    store = CheckpointStore(args.run_dir)
    cfg = load_cls_config(args.run_dir)
    payload = store.restore(args.stage, args.kind)
    n_proto = int(np.asarray(payload["params"]
                             ["prototype_vectors"]).shape[0])
    mcfg = dataclasses.replace(cfg.model, num_prototypes=n_proto)
    model = PPNet(cfg=mcfg)

    normalize = None if args.f32_inputs else (IMAGENET_MEAN, IMAGENET_STD)
    size = mcfg.img_size
    out_dir = args.out or os.path.join(
        args.run_dir, "export", f"{args.stage}_{args.batch}x{size}x{size}")
    manifest = export_cls_artifact(
        model, payload["params"], payload.get("batch_stats", {}),
        payload["proto_class"], out_dir, args.batch, (size, size),
        normalize=normalize, platforms=tuple(args.platforms.split(",")),
        compute_dtype=jnp.float32 if args.f32_compute else jnp.bfloat16)
    print(f"exported {manifest['model']} {manifest['input']['shape']} "
          f"for platforms {manifest['platforms']} to {out_dir}")


def cmd_prune(args):
    _enable_compile_cache()
    import jax.numpy as jnp
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.core.config import ExperimentConfig
    from adlm_tpu.data.dataset import SegmentationDataset
    from adlm_tpu.interpret.prune import prune_by_purity
    from adlm_tpu.models.ppnet import PPNet

    store = CheckpointStore(args.run_dir)
    cfg = ExperimentConfig.from_json(store.load_config_json())
    payload = store.restore("push", args.kind)
    params = payload["params"]
    proto_class = jnp.asarray(payload["proto_class"])
    n_proto = int(np.asarray(params["prototype_vectors"]).shape[0])
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, num_prototypes=n_proto))
    model = PPNet(cfg=cfg.model)

    ds = SegmentationDataset(cfg.data, cfg.data.train_key,
                             data_path=args.data_path, is_eval=True,
                             push_prototypes=True)
    # batched scan: ship raw uint8 + normalize in-jit (4× less
    # transfer; the scan is transfer-bound through the relay, PERF.md)
    raw = args.batch_size > 1 and ds.supports_raw_eval()
    new_params, new_pc, prune_info = prune_by_purity(
        model, params, payload["constants"], proto_class,
        ds.eval_items(raw=raw), cfg.model.num_classes, k=args.k,
        prune_threshold=args.threshold, batch_size=args.batch_size,
        raw_normalize=(cfg.data.mean, cfg.data.std) if raw else None)
    store.save("pruned", "last", {
        "params": dict(new_params), "constants": dict(payload["constants"]),
        "proto_class": new_pc, "step": payload["step"]})
    np.save(os.path.join(args.run_dir, "prune_info.npy"), prune_info)
    print(f"pruned {prune_info.shape[0]} prototypes; finetune with "
          f"`train ... --pruned`")


def _load_torch_ppnet_checkpoint(path):
    """torch.load a reference PPNet checkpoint file — a whole-module
    pickle (their save format), a plain state_dict, or a
    ``{"state_dict": ...}`` wrapper.  Returns (numpy state_dict,
    proto_class-or-None: argmax of the module's
    ``prototype_class_identity`` when available)."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except (ModuleNotFoundError, AttributeError) as e:
        raise SystemExit(
            f"could not unpickle {path} ({e}); the reference "
            "saves whole-module pickles which need its classes "
            "importable — in the reference environment run "
            "`torch.save(torch.load(f).state_dict(), out)` and import "
            "that state_dict instead")
    proto_class = None
    if hasattr(obj, "state_dict") and callable(obj.state_dict):
        if getattr(obj, "prototype_class_identity", None) is not None:
            proto_class = np.argmax(
                np.asarray(obj.prototype_class_identity.cpu()), axis=1)
        sd = obj.state_dict()
    elif isinstance(obj, dict):
        sd = obj.get("state_dict", obj)
    else:
        raise SystemExit(f"unsupported checkpoint object {type(obj)!r}")
    sd = {k: np.asarray(v.detach().cpu().numpy())
          if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    return sd, proto_class


def _resolve_proto_class(proto_class, proto_class_file, n_proto,
                         num_classes):
    """The explicit (P,) class-id array for an imported checkpoint:
    --proto-class file > module attribute > contiguous default (only
    valid when P divides evenly — pruned checkpoints are ragged)."""
    from adlm_tpu.models.ppnet import default_proto_class

    if proto_class_file:
        proto_class = np.load(proto_class_file)
    if proto_class is None:
        if n_proto % num_classes:
            raise SystemExit(
                f"{n_proto} prototypes do not divide into "
                f"{num_classes} classes — this looks like a "
                "pruned checkpoint; pass --proto-class <file.npy> with "
                "the (P,) class-id array (in the reference: "
                "`ppnet.prototype_class_identity.argmax(1)`)")
        proto_class = np.asarray(default_proto_class(
            n_proto, num_classes))
    if proto_class.shape != (n_proto,):
        raise SystemExit(f"proto_class shape {proto_class.shape} != "
                         f"({n_proto},)")
    return proto_class


def _nan_template(model, init_x, **init_kwargs):
    from adlm_tpu.utils.torch_import import nan_template
    return nan_template(model, init_x, **init_kwargs)


def _assert_fully_imported(report, *trees):
    from adlm_tpu.utils.torch_import import assert_fully_imported
    assert_fully_imported(report, *trees, error=SystemExit)


def cmd_import_protoseg(args):
    """Import a trained reference ProtoSeg checkpoint into a run dir.

    The reference saves whole-module pickles per stage
    (``torch.save(ppnet)``, reference segmentation/train.py:60-65); this
    accepts that file, a plain state_dict, or a ``{"state_dict": ...}``
    wrapper, and writes a run directory our eval-valid / eval-test /
    prune / ``train --start-checkpoint`` commands consume directly.
    """
    import jax.numpy as jnp

    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.core.config import get_experiment
    from adlm_tpu.models.ppnet import PPNet
    from adlm_tpu.utils.torch_import import load_protoseg_model

    sd, proto_class = _load_torch_ppnet_checkpoint(args.checkpoint)

    cfg = get_experiment(args.experiment)
    n_proto = int(sd["prototype_vectors"].shape[0])
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, num_prototypes=n_proto))
    proto_class = _resolve_proto_class(proto_class, args.proto_class,
                                       n_proto, cfg.model.num_classes)

    model = PPNet(cfg=cfg.model)
    template = _nan_template(model, jnp.zeros((1, 65, 65, 3),
                                              jnp.float32))
    params, constants = template["params"], template.get("constants", {})
    report = load_protoseg_model(params, constants, sd)
    _assert_fully_imported(report, params, constants)

    run_dir = _results_dir(args.run_name)
    store = CheckpointStore(run_dir)
    store.save_config(cfg.to_json())
    payload = {"params": params, "constants": constants,
               "proto_class": np.asarray(proto_class, np.int32),
               "step": np.zeros((), np.int32)}
    store.save(args.stage, "last", payload)
    store.save(args.stage, "best", payload)
    print(f"imported {len(report['loaded'])} tensors "
          f"({n_proto} prototypes) into {run_dir} stage "
          f"{args.stage!r}; run eval-valid/eval-test/prune on it, or "
          f"continue training with --start-checkpoint")


def cmd_export_torch(args):
    """Export a trained run's ProtoSeg model as a reference-named torch
    state_dict (the reverse of import-protoseg) so it can be consumed
    by reference tooling or compared tensor-by-tensor."""
    import torch

    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.utils.torch_import import export_protoseg_state_dict

    store = CheckpointStore(args.run_dir)
    payload = store.restore(args.stage, args.kind)
    sd = export_protoseg_state_dict(payload["params"],
                                    payload["constants"])
    out = args.out or os.path.join(
        args.run_dir, "export_torch", f"{args.stage}_{args.kind}.pth")
    if os.path.dirname(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, out)
    pc_out = os.path.splitext(out)[0] + "_proto_class.npy"
    np.save(pc_out, np.asarray(payload["proto_class"], np.int32))
    print(f"exported {len(sd)} tensors to {out} "
          f"(+ prototype class ids in {pc_out})")


def cmd_import_protopnet(args):
    """Import a trained reference CLASSIFICATION ProtoPNet checkpoint
    (``torch.save(obj=model, ...)``, reference save.py:11) into a run
    dir that cls-prune / analyze-* and last-layer finetuning consume."""
    import jax.numpy as jnp

    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.core.config import PPNetConfig
    from adlm_tpu.models.ppnet import PPNet
    from adlm_tpu.train.classification import ClassificationConfig
    from adlm_tpu.train.classification_pipeline import _save_cls_config
    from adlm_tpu.utils.torch_import import load_protopnet_cls

    sd, proto_class = _load_torch_ppnet_checkpoint(args.checkpoint)

    n_proto, proto_ch = sd["prototype_vectors"].shape[:2]
    num_classes = int(sd["last_layer.weight"].shape[0])
    cfg = ClassificationConfig(model=PPNetConfig(
        base_architecture=args.arch, img_size=args.img_size,
        num_prototypes=int(n_proto), prototype_channels=int(proto_ch),
        num_classes=num_classes, add_on_layers_type=args.add_on,
        patch_classification=False))
    proto_class = _resolve_proto_class(proto_class, args.proto_class,
                                       int(n_proto), num_classes)

    model = PPNet(cfg=cfg.model)
    template = _nan_template(
        model, jnp.zeros((1, args.img_size, args.img_size, 3),
                         jnp.float32), train=True)
    params = template["params"]
    batch_stats = template.get("batch_stats", {})
    report = load_protopnet_cls(params, batch_stats, sd,
                                cfg.model.base_architecture)
    _assert_fully_imported(report, params, batch_stats)

    run_dir = _results_dir(args.run_name)
    store = CheckpointStore(run_dir)
    _save_cls_config(run_dir, cfg)
    payload = {"params": params, "batch_stats": batch_stats,
               "proto_class": np.asarray(proto_class, np.int32),
               "step": np.zeros((), np.int32)}
    store.save(args.stage, "last", payload)
    store.save(args.stage, "best", payload)
    print(f"imported {len(report['loaded'])} tensors ({n_proto} "
          f"prototypes / {num_classes} classes, {args.arch}) into "
          f"{run_dir} stage {args.stage!r}")


def cmd_cls_train(args):
    """ProtoPNet image-classification training (reference main.py:107-189
    over ImageFolder datasets from settings.py:14-17 env vars)."""
    _enable_compile_cache()
    from adlm_tpu.core.config import PPNetConfig
    from adlm_tpu.data.image_folder import ImageFolderDataset
    from adlm_tpu.train.classification import ClassificationConfig
    from adlm_tpu.train.classification_pipeline import (
        run_classification_training)

    train_dir = args.train_dir or os.environ.get("TRAIN_DIR")
    test_dir = args.test_dir or os.environ.get("TEST_DIR")
    push_dir = args.push_dir or os.environ.get("TRAIN_PUSH_DIR") \
        or train_dir
    if not train_dir or not test_dir:
        raise SystemExit("--train-dir/--test-dir (or TRAIN_DIR/TEST_DIR "
                         "env) required")
    train_ds = ImageFolderDataset(train_dir, args.img_size)
    test_ds = ImageFolderDataset(test_dir, args.img_size)
    # push images stay un-normalized for visualization; the push fn
    # normalizes on the fly in the reference (main.py:86-105) — our push
    # forward expects normalized inputs, so keep normalize=True here
    push_ds = ImageFolderDataset(push_dir, args.img_size)

    num_classes = args.num_classes or len(train_ds.classes)
    cfg = ClassificationConfig(
        model=PPNetConfig(
            base_architecture=args.arch, img_size=args.img_size,
            num_prototypes=args.prototypes,
            prototype_channels=args.proto_channels,
            num_classes=num_classes, add_on_layers_type="regular",
            patch_classification=False),
        num_warm_epochs=args.warm_epochs,
        num_train_epochs=args.epochs,
        push_start=args.push_start,
        compute_dtype="bfloat16" if args.bf16 else "float32")

    mesh = None
    if args.mesh_data:
        if args.batch_size % args.mesh_data:
            raise SystemExit("--batch-size must be divisible by "
                             "--mesh-data")
        import jax
        from adlm_tpu.core.mesh import MeshSpec, make_mesh
        mesh = make_mesh(MeshSpec(data=args.mesh_data),
                         devices=jax.devices()[:args.mesh_data])

    run_dir = _results_dir(args.run_name)
    run_classification_training(
        cfg, run_dir,
        train_batches=lambda: train_ds.batches(args.batch_size,
                                               shuffle=True, seed=0),
        test_batches=lambda: test_ds.batches(args.test_batch_size,
                                             with_count=True),
        push_batches=lambda: push_ds.batches(args.push_batch_size,
                                             with_count=True),
        target_accuracy=args.target_accuracy,
        last_layer_iterations=args.last_layer_iterations,
        push_every=args.push_every,
        pretrained_path=args.pretrained,
        mesh=mesh)


def cmd_cls_prune(args):
    """Classification pruning + optional last-layer finetune
    (reference run_pruning.py root:113-158)."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.data.image_folder import ImageFolderDataset
    from adlm_tpu.models.ppnet import PPNet
    from adlm_tpu.train.classification import (
        ClassifierState,
        init_classifier_state,
        make_cls_eval_step,
        make_cls_train_step,
        prune_classification_prototypes,
    )
    from adlm_tpu.train.classification_pipeline import (
        _cls_payload,
        _epoch,
        _evaluate,
        load_cls_config,
    )

    run_dir = args.run_dir
    cfg = load_cls_config(run_dir)
    store = CheckpointStore(run_dir)
    stage, kind = ("push", "best") if store.exists("push", "best") \
        else ("nopush", "last")
    payload = store.restore(stage, kind)
    model = PPNet(cfg=cfg.model)
    state = ClassifierState(
        params=payload["params"], batch_stats=payload["batch_stats"],
        opt_state=None, proto_class=jnp.asarray(payload["proto_class"]),
        step=jnp.asarray(payload["step"]))

    train_dir = args.train_dir or os.environ.get("TRAIN_DIR")
    push_dir = args.push_dir or os.environ.get("TRAIN_PUSH_DIR") \
        or train_dir
    push_ds = ImageFolderDataset(push_dir, cfg.model.img_size)
    new_params, new_pc, prune_info = prune_classification_prototypes(
        model, state, push_ds.batches(args.batch_size, with_count=True),
        k=args.k, prune_threshold=args.threshold)
    np.save(os.path.join(run_dir, "cls_prune_info.npy"), prune_info)

    import dataclasses as dc
    pruned_cfg = dc.replace(cfg, model=dc.replace(
        cfg.model,
        num_prototypes=int(np.asarray(
            new_params["prototype_vectors"]).shape[0])))
    model = PPNet(cfg=pruned_cfg.model)

    if args.last_layer_iterations > 0 and train_dir:
        test_dir = args.test_dir or os.environ.get("TEST_DIR")
        train_ds = ImageFolderDataset(train_dir, cfg.model.img_size)
        test_ds = ImageFolderDataset(test_dir or train_dir,
                                     cfg.model.img_size)
        sample, _ = next(train_ds.batches(args.batch_size))
        steps_per_epoch = -(-len(train_ds) // args.batch_size)
        state_l = init_classifier_state(
            model, pruned_cfg, "last", jax.random.PRNGKey(0),
            jnp.asarray(sample), params=new_params,
            batch_stats=payload["batch_stats"],
            steps_per_epoch=steps_per_epoch)
        state_l = state_l.replace(proto_class=new_pc)
        last_step = make_cls_train_step(model, pruned_cfg, "last",
                                        steps_per_epoch)
        eval_fn = make_cls_eval_step(model, pruned_cfg)
        for it in range(args.last_layer_iterations):
            state_l, _ = _epoch(last_step, state_l,
                                train_ds.batches(args.batch_size,
                                                 shuffle=True, seed=it))
            acc = _evaluate(eval_fn, state_l,
                            test_ds.batches(args.batch_size,
                                            with_count=True))
            print(f"pruned last-layer iter {it}: accuracy {acc:.4f}")
        final = state_l
    else:
        final = ClassifierState(
            params=new_params, batch_stats=payload["batch_stats"],
            opt_state=None, proto_class=new_pc,
            step=jnp.asarray(payload["step"]))
    store.save("pruned", "last", _cls_payload(final))
    print(f"pruned {prune_info.shape[0]} prototypes → "
          f"{int(np.asarray(new_pc).shape[0])} remain; saved "
          f"pruned_last")


def cmd_unoise_train_util(args):
    _enable_compile_cache()
    from adlm_tpu.train.unoise_pipeline import train_utility
    train_utility(args)


def cmd_unoise_train_noise(args):
    _enable_compile_cache()
    from adlm_tpu.train.unoise_pipeline import train_noise
    train_noise(args)


def _noise_arch(results: str, run: str, cli_depth: int, cli_cf: int
                ) -> dict:
    """Noise-UNet architecture: the run's saved noise_config.json wins
    over CLI flags (runs of different sizes must rebuild correctly)."""
    path = os.path.join(results, run, "noise_config.json")
    if os.path.exists(path):
        with open(path) as f:
            cfgd = json.load(f)
        return {"depth": cfgd["depth"], "cf": cfgd["channel_factor"]}
    return {"depth": cli_depth, "cf": cli_cf}


def cmd_unoise_visualize(args):
    """Interpretation artifacts for trained U-Noise models: importance
    masks, grad-CAM, occlusion sensitivity, timing comparison
    (reference src/make_visualizations.py)."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.models.unet import UNet
    from adlm_tpu.interpret.unoise_vis import (
        grad_cam, interpretation_timing, occlusion_sensitivity,
        unoise_importance)
    from adlm_tpu.interpret.visualize import jet_colormap, upsample_cubic
    from adlm_tpu.data.unoise_data import split_datasets

    results = os.environ.get("RESULTS_DIR", "./runs")
    util_payload = CheckpointStore(
        os.path.join(results, args.utility_run)).restore("utility", "best")
    noise_payload = CheckpointStore(
        os.path.join(results, args.noise_run)).restore("noise", "best")
    util_cfg = json.load(open(os.path.join(
        results, args.utility_run, "utility_config.json")))
    util_model = UNet(out_channels=1, depth=util_cfg["depth"],
                      cf=util_cfg["channel_factor"])
    noise_model = UNet(out_channels=1, **_noise_arch(
        results, args.noise_run, args.depth, args.channel_factor))
    util_v = {"params": util_payload["params"],
              "batch_stats": util_payload["batch_stats"]}
    noise_v = {"params": noise_payload["params"],
               "batch_stats": noise_payload["batch_stats"]}

    imgs = np.load(args.imgs)
    masks = np.load(args.masks)
    boxes = (np.load(args.boxes, allow_pickle=True)
             if args.boxes and os.path.exists(args.boxes) else None)
    # MUST match the training split (which filters by boxes first) —
    # otherwise the "test" slices overlap the models' training data
    _, _, test_ds = split_datasets(imgs, masks, boxes)
    image, mask = test_ds[args.index]
    image_j = jnp.asarray(image[None])
    mask_j = jnp.asarray(mask[None])

    out_dir = os.path.join(results, args.noise_run, "visualizations")
    os.makedirs(out_dir, exist_ok=True)
    H, W = image.shape[0], image.shape[1]

    # approximate inverse of the U-Noise ImageNet normalization on
    # tiled grayscale (mean≈0.45, std≈0.225 averaged across channels)
    denorm_img = np.clip(image * 0.225 + 0.45, 0, 1)

    def save_heat(heat, name):
        hn = (heat - heat.min()) / max(heat.max() - heat.min(), 1e-12)
        if hn.shape != (H, W):
            hn = upsample_cubic(hn, (H, W))
        rgb = np.clip(0.5 * denorm_img + 0.5 * jet_colormap(hn), 0, 1)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(out_dir, name))

    imp = unoise_importance(noise_model, noise_v, image_j)[0, :, :, 0]
    save_heat(1.0 - imp, "unoise_importance.png")
    # threshold ablation: keep pixels whose noise tolerance B is below
    # each threshold (reference make_visualizations.py:193-198)
    B = np.asarray(imp)
    for threshold in np.linspace(0.0, 1.0, 11):
        masked = denorm_img * (B <= threshold)[..., None]
        Image.fromarray((masked * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"threshold_{threshold:.1f}.png"))
    heat = grad_cam(util_model, util_v, image_j, x=W // 2, y=H // 2)
    save_heat(heat, "grad_cam.png")
    occ = occlusion_sensitivity(util_model, util_v, image_j, mask_j,
                                patch=args.occlusion_patch,
                                stride=args.occlusion_stride)[0]
    save_heat(-occ, "occlusion_sensitivity.png")

    timing = interpretation_timing({
        "unoise": lambda: unoise_importance(noise_model, noise_v, image_j),
        "grad_cam": lambda: grad_cam(util_model, util_v, image_j,
                                     x=W // 2, y=H // 2),
        "occlusion": lambda: occlusion_sensitivity(
            util_model, util_v, image_j, mask_j,
            patch=args.occlusion_patch, stride=args.occlusion_stride),
    })
    print(json.dumps({"seconds_per_interpretation": timing}, indent=2))
    with open(os.path.join(out_dir, "timing.json"), "w") as f:
        json.dump(timing, f)


def cmd_unoise_figures(args):
    """Coverage-vs-dice curves (reference src/make_figures.py).

    Default: the reference's evaluate() semantics exactly — fixed
    threshold grid + median-mask dice@50% (make_figures.py:135-173).
    ``--from-pickle`` renders a reference-format results.pickle
    (e.g. the reference's own published data/results.pickle) without
    touching any checkpoints; ``--save-pickle`` writes our results in
    that format for the reference's plotting script.
    """
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.models.unet import UNet
    from adlm_tpu.interpret.figures import (
        device_threshold_sweep, dice_at_median_importance,
        load_results_pickle, plot_curves, save_results_pickle)
    from adlm_tpu.interpret.unoise_vis import unoise_importance
    from adlm_tpu.data.unoise_data import batches, split_datasets

    results = os.environ.get("RESULTS_DIR", "./runs")

    if args.from_pickle:
        curves, params_per_model, at_half = load_results_pickle(
            args.from_pickle)
        out = os.path.join(results, "unoise_coverage_dice.png")
        os.makedirs(results, exist_ok=True)
        plot_curves(curves, out, params_per_model, dice_at_half=at_half)
        print(json.dumps({
            name: {"num_params": params_per_model[name],
                   "dice_at_half_coverage": at_half[name]}
            for name in curves}, indent=2))
        return
    util_payload = CheckpointStore(
        os.path.join(results, args.utility_run)).restore("utility", "best")
    util_cfg = json.load(open(os.path.join(
        results, args.utility_run, "utility_config.json")))
    util_model = UNet(out_channels=1, depth=util_cfg["depth"],
                      cf=util_cfg["channel_factor"])
    util_v = {"params": util_payload["params"],
              "batch_stats": util_payload["batch_stats"]}

    imgs = np.load(args.imgs)
    masks = np.load(args.masks)
    boxes = (np.load(args.boxes, allow_pickle=True)
             if args.boxes and os.path.exists(args.boxes) else None)
    # MUST match the training split (box filter first) — see visualize
    _, _, test_ds = split_datasets(imgs, masks, boxes)
    test_imgs, test_masks = next(iter(batches(test_ds, args.n_images)))
    test_imgs = jnp.asarray(test_imgs)
    test_masks = jnp.asarray(test_masks)

    predict = jax.jit(
        lambda x: util_model.apply(util_v, x, train=False))

    curves = {}
    params_per_model = {}
    at_half = {}
    pickle_payload = {}
    for run in args.noise_runs.split(","):
        payload = CheckpointStore(os.path.join(results, run)).restore(
            "noise", "best")
        leaves = [np.asarray(x) for x in
                  __import__("jax").tree_util.tree_leaves(payload["params"])]
        params_per_model[run] = int(sum(x.size for x in leaves))
        # per-run architecture: sizes differ across --noise-runs
        noise_model = UNet(out_channels=1, **_noise_arch(
            results, run, args.depth, args.channel_factor))
        noise_v = {"params": payload["params"],
                   "batch_stats": payload["batch_stats"]}
        imp = unoise_importance(noise_model, noise_v, test_imgs)
        # whole grid fused into one jit per batch (the host-loop
        # variant pays ~30 ms relay dispatch × T per batch)
        dice, cov, thresholds = device_threshold_sweep(
            util_model, util_v, imp, test_imgs, test_masks,
            batch_size=args.sweep_batch_size)
        at_half[run] = dice_at_median_importance(
            predict, imp, test_imgs, test_masks,
            batch_size=args.sweep_batch_size)
        curves[run] = list(zip(cov, dice))
        pickle_payload[run] = {
            "thresholds": np.asarray(thresholds),
            "num_params": params_per_model[run],
            "dice": dice, "coverage": cov,
            "dice_at_half_coverage": at_half[run]}
    out = os.path.join(results, "unoise_coverage_dice.png")
    plot_curves(curves, out, params_per_model, dice_at_half=at_half)
    if args.save_pickle:
        save_results_pickle(args.save_pickle, pickle_payload)
    print(json.dumps({
        run: {"curve": curves[run],
              "num_params": params_per_model[run],
              "dice_at_half_coverage": at_half[run]}
        for run in curves}, indent=2))


def _push_time_indices(run_dir, stage, n_current):
    """Map current checkpoint prototype indices to the push-time
    indices used in artifact filenames.

    Push dedup compacts indices and records the kept ORIGINAL indices
    in prototypes/unique_prototypes.json; pruning compacts again
    (removed push-stage indices recorded in prune_info.npy).  Returns
    None when the mapping can't be reconstructed (never link wrong
    artifacts — prototype identity is explicit, see CLAUDE.md).
    """
    uniq_path = os.path.join(run_dir, "prototypes",
                             "unique_prototypes.json")
    orig = None
    if os.path.exists(uniq_path):
        with open(uniq_path) as f:
            orig = json.load(f)          # push-stage current -> original
    if stage == "pruned":
        pi_path = os.path.join(run_dir, "prune_info.npy")
        if not os.path.exists(pi_path):
            return None
        pruned = {int(r[0]) for r in np.load(pi_path).reshape(-1, 2)}
        n_push = len(orig) if orig is not None else n_current + len(pruned)
        idx = [j for j in range(n_push) if j not in pruned]
        if len(idx) != n_current:
            return None
    else:
        idx = list(range(n_current))
    if orig is not None:
        if idx and max(idx) >= len(orig):
            return None
        idx = [int(orig[j]) for j in idx]
    return idx


def cmd_analyze_local(args):
    _enable_compile_cache()
    import jax.numpy as jnp
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.core.config import ExperimentConfig
    from adlm_tpu.data.dataset import SegmentationDataset
    from adlm_tpu.interpret.analysis import local_analysis, make_denorm
    from adlm_tpu.models.ppnet import PPNet

    store = CheckpointStore(args.run_dir)
    cfg = ExperimentConfig.from_json(store.load_config_json())
    payload = store.restore(args.stage, args.kind)
    n_proto = int(np.asarray(
        payload["params"]["prototype_vectors"]).shape[0])
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, num_prototypes=n_proto))
    model = PPNet(cfg=cfg.model)
    ds = SegmentationDataset(cfg.data, args.split,
                             data_path=args.data_path, is_eval=True)
    img, _ = ds.get_eval_item(args.index)
    res = local_analysis(
        model, payload["params"], payload["constants"],
        jnp.asarray(payload["proto_class"]), img[None],
        top_k=args.top_k,
        save_dir=os.path.join(args.run_dir, "local_analysis",
                              ds.img_ids[args.index]),
        denorm=make_denorm(cfg.data),
        per_class_top=args.per_class_top)
    # link each top prototype's push artifacts into the analysis dir
    # (the reference renders the prototype's own source image + bbox,
    # local_analysis.py:215-228; ours were written at push time).
    # Artifact filenames carry PUSH-TIME indices; dedup and pruning
    # both compact indices afterwards, so map through the recorded
    # unique_prototypes.json / prune_info.npy (see _push_time_indices).
    proto_dir = os.path.join(args.run_dir, "prototypes")
    out_dir = os.path.join(args.run_dir, "local_analysis",
                           ds.img_ids[args.index])
    orig_idx = _push_time_indices(args.run_dir, args.stage, n_proto)
    if os.path.isdir(proto_dir) and orig_idx is not None:
        import glob as _glob
        import shutil as _shutil
        for rank, j in enumerate(res["top_prototypes"]):
            for src in _glob.glob(os.path.join(
                    proto_dir, "*",
                    f"prototype-img_{orig_idx[int(j)]}-*.png")):
                _shutil.copy(src, os.path.join(
                    out_dir, f"top-{rank + 1}_" + os.path.basename(src)))
    print(json.dumps({
        "top_prototypes": res["top_prototypes"].tolist(),
        "top_classes": res["top_classes"].tolist(),
        "own_class_is_strongest": bool(res["own_class_is_strongest"].all()),
    }, indent=2))


def cmd_analyze_global(args):
    _enable_compile_cache()
    import jax.numpy as jnp
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.core.config import ExperimentConfig
    from adlm_tpu.data.dataset import SegmentationDataset
    from adlm_tpu.interpret.analysis import global_analysis, make_denorm
    from adlm_tpu.models.ppnet import PPNet

    store = CheckpointStore(args.run_dir)
    cfg = ExperimentConfig.from_json(store.load_config_json())
    payload = store.restore(args.stage, args.kind)
    n_proto = int(np.asarray(
        payload["params"]["prototype_vectors"]).shape[0])
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, num_prototypes=n_proto))
    model = PPNet(cfg=cfg.model)
    ds = SegmentationDataset(cfg.data, args.split,
                             data_path=args.data_path, is_eval=True,
                             push_prototypes=True)
    items = ds.eval_items()
    if args.max_images:
        import itertools
        items = itertools.islice(items, args.max_images)
    ids = global_analysis(
        model, payload["params"], payload["constants"],
        jnp.asarray(payload["proto_class"]), items,
        cfg.model.num_classes, k=args.k,
        save_dir=os.path.join(args.run_dir, "global_analysis"),
        full_save=args.full_save,
        get_item=lambda i: (lambda im, lb: (im[None], lb[None]))(
            *ds.get_eval_item(i)),
        denorm=make_denorm(cfg.data),
        batch_size=args.batch_size)
    print(f"nearest patch class ids saved; shape {ids.shape}")


def cmd_bench(args):
    # bench.py lives at the repo root, not inside the package — load it
    # by path so the command works from any CWD
    import importlib.util
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.main()


def main(argv=None):
    p = argparse.ArgumentParser(prog="adlm_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    tp = sub.add_parser("train")
    tp.add_argument("experiment")
    tp.add_argument("run_name")
    tp.add_argument("--pruned", action="store_true")
    tp.add_argument("--resume", action="store_true",
                    help="continue a killed/halted run from its last "
                         "checkpoint: stage, window index, optimizer "
                         "moments, LR position, early-stopping counters "
                         "and the loader streams all pick up exactly "
                         "where they stopped (bit-identical to an "
                         "uninterrupted run)")
    tp.add_argument("--halt-after", type=int, default=None,
                    help="gracefully stop after N optimizer windows "
                         "(counted across phases), saving a resumable "
                         "checkpoint — the preemptible-quota time-box")
    tp.add_argument("--auto-restart", type=int, default=None,
                    metavar="N",
                    help="supervise the run under a heartbeat watchdog: "
                         "a wedged device (no log progress for "
                         "--watchdog-timeout) or a crash kills the "
                         "child, waits for the device probe to answer, "
                         "and relaunches with --resume — up to N "
                         "restarts (utils/watchdog.py)")
    tp.add_argument("--watchdog-timeout", type=float, default=900.0,
                    help="seconds without a run-log heartbeat before "
                         "the supervisor declares a stall (default "
                         "900 — above the 2-6 min remote compiles)")
    tp.add_argument("--joint-lr-warmup", type=int, default=None,
                    metavar="UPDATES",
                    help="linear LR ramp over the first N optimizer "
                         "updates of the joint phase (then the poly "
                         "decay).  From-scratch joint entry NEEDS it: "
                         "fresh Adam's ±lr first-step jolt saturated "
                         "the prototype sigmoids in one update from a "
                         "converged warmup state (experiments/"
                         "joint_divergence_probe.py).  Default off = "
                         "reference parity")
    tp.add_argument("--grad-clip", type=float, default=None,
                    metavar="NORM",
                    help="global-norm gradient clip ahead of every "
                         "phase optimizer (optax.clip_by_global_norm). "
                         "Default off = reference parity (it never "
                         "clips); long from-scratch schedules need it — "
                         "the full-budget joint phase diverged to NaN "
                         "without it (experiments/"
                         "joint_divergence_probe.py)")
    tp.add_argument("--start-checkpoint", default=None)
    tp.add_argument("--pretrained", default=None,
                    help="path to a torch .pth state_dict or .npz with "
                         "torchvision (ImageNet) or deeplab (COCO) keys")
    tp.add_argument("--data-path", default=None)
    tp.add_argument("--val-every", type=int, default=500)
    tp.add_argument("--val-batches", type=int, default=None,
                    help="cap validation to the first N ordered batches "
                         "(default: the FULL val split, matching the "
                         "reference's best-checkpoint selection)")
    tp.add_argument("--steps-scale", type=float, default=1.0)
    tp.add_argument("--bf16", action="store_true",
                    help="bf16 compute for the train forward/backward")
    tp.add_argument("--fused", action="store_true",
                    help="fused gradient accumulation: one batched "
                         "fwd/bwd per window, gradient-identical to "
                         "the scan (see PERF.md)")
    tp.add_argument("--s2b", action="store_true",
                    help="lower the d=2/4 dilated convs via "
                         "space-to-batch (numerically exact; TPU "
                         "tiling experiment — see PERF.md)")
    tp.add_argument("--wire-uint8", action="store_true",
                    help="ship train windows as raw uint8 pixels and "
                         "normalize in-jit: ≤0.5/255-per-pixel "
                         "requantization, 2× less image wire traffic "
                         "vs bf16 (the flagship window is "
                         "transfer-bound — PERF.md)")
    tp.add_argument("--dataloader-mode", default=None,
                    choices=["thread", "process"],
                    help="override the experiment's loader pool: "
                         "thread (single-chip default) or process "
                         "(spawn workers + shared-memory sample ring "
                         "— the multi-core mesh-feeding path, PERF.md)")
    tp.add_argument("--dataloader-jobs", type=int, default=0,
                    help="override the experiment's loader worker "
                         "count (0 = keep the preset's)")
    tp.add_argument("--bn-calibrate", action="store_true",
                    help="from-scratch init: standardize the frozen "
                         "backbone BNs on a real batch before training "
                         "(models/calibrate.py; the reference requires "
                         "pretrained running stats and cannot train "
                         "from scratch)")
    tp.add_argument("--proto-init-data", action="store_true",
                    help="from-scratch init: sample each prototype "
                         "from a real feature cell of its own class "
                         "(pairs with --bn-calibrate; without it the "
                         "random prototypes' 1/d² activation gradients "
                         "vanish and CE stays at uniform)")
    tp.add_argument("--presigmoid-ln", action="store_true",
                    help="from-scratch trainability: per-pixel "
                         "LayerNorm before the add-on sigmoid.  A "
                         "random-init backbone drifts the pre-sigmoid "
                         "scale unboundedly and the sigmoid saturates "
                         "to exact 0/1 (zero feature gradients, "
                         "measured); LayerNorm holds the "
                         "standardization for the whole run.  Off by "
                         "default (reference architecture parity)")
    tp.add_argument("--save-push-visualizations", action="store_true")
    tp.add_argument("--push-batch-size", type=int, default=1,
                    help="batch the push scan (mesh-shardable; artifact "
                         "output identical via a two-pass re-forward)")
    tp.add_argument("--mesh-data", type=int, default=0,
                    help="data-parallel mesh axis size (0 = single device)")
    tp.add_argument("--mesh-model", type=int, default=1,
                    help="model/spatial mesh axis size")
    tp.add_argument("--distributed", action="store_true",
                    help="multi-host: call jax.distributed.initialize()")
    tp.add_argument("--trace-dir", default=None,
                    help="write a jax.profiler trace of one "
                         "steady-state window per phase under "
                         "<dir>/<stage>/ (view with TensorBoard)")
    tp.add_argument("--val-augment", action="store_true",
                    help="reference quirk parity: apply the random "
                         "scale/crop/flip chain to validation data too "
                         "(reference dataset.py:119-173), making "
                         "best-checkpoint selection comparable to the "
                         "reference's noisy-val behaviour")
    tp.set_defaults(fn=cmd_train)

    for name, fn in (("eval-valid", cmd_eval_valid),
                     ("eval-test", cmd_eval_test)):
        ep = sub.add_parser(name)
        ep.add_argument("run_dir")
        ep.add_argument("stage", choices=["warmup", "nopush", "push",
                                          "pruned"])
        ep.add_argument("--kind", default="last", choices=["last", "best"])
        ep.add_argument("--split", default="val")
        ep.add_argument("--data-path", default=None)
        ep.add_argument("--max-images", type=int, default=0)
        ep.add_argument("--batch-size", type=int, default=1,
                        help="full-res eval batch (uniform-shape "
                             "datasets)")
        if name == "eval-valid":
            ep.add_argument("--stats", action="store_true",
                            help="also compute prototype "
                                 "interpretability stats + plots "
                                 "(same single forward per batch)")
            ep.add_argument("--stats-upsampled", action="store_true",
                            help="reference-exact statistics on "
                                 "bilinearly upsampled distance maps "
                                 "(eval_valid.py:172-214); slower")
            ep.add_argument("--stats-exact", action="store_true",
                            help="with --stats-upsampled on a bf16 "
                                 "eval: force exact f32 bilinear taps "
                                 "for the full-res nearest-prototype "
                                 "argmin (the bf16 tap path flips "
                                 "~0.5%% of near-tie argmins — "
                                 "PERF.md); ~70 ms/batch extra")
            ep.add_argument("--examples", type=int, default=5,
                            help="number of qualitative prediction/"
                                 "prototype overlay examples (0 = off)")
            ep.add_argument("--mesh-data", type=int, default=0,
                            help="shard the eval batch over a "
                                 "data-parallel mesh axis (0 = single "
                                 "device; batch must divide evenly)")
            ep.add_argument("--mesh-model", type=int, default=1,
                            help="spatial mesh axis: image H sharded "
                                 "over `model` devices (the full-res "
                                 "context-parallel mode)")
        ep.add_argument("--windowed", default=None, metavar="WH,WW",
                        help="sliding-window inference with the given "
                             "window size instead of whole-image "
                             "forwards (memory-bounded mode)")
        ep.set_defaults(fn=fn)

    xp = sub.add_parser("export")
    xp.add_argument("run_dir")
    xp.add_argument("stage", choices=["warmup", "nopush", "push",
                                      "pruned"])
    xp.add_argument("--kind", default="last", choices=["last", "best"])
    xp.add_argument("--batch", type=int, default=1)
    xp.add_argument("--size", default="1024,2048", metavar="H,W",
                    help="input resolution baked into the artifact")
    xp.add_argument("--out", default=None,
                    help="artifact directory (default: "
                         "<run_dir>/export/<stage>_<B>x<H>x<W>)")
    xp.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering targets")
    xp.add_argument("--f32-inputs", action="store_true",
                    help="expect pre-normalized float32 inputs instead "
                         "of raw uint8 + on-device normalization")
    xp.add_argument("--f32-compute", action="store_true",
                    help="keep float32 weights/activations (default "
                         "bfloat16)")
    xp.set_defaults(fn=cmd_export)

    pcp = sub.add_parser(
        "precompile",
        help="warm the persistent compile cache for an experiment's "
             "train/eval/push programs before a long run "
             "(deploy/precompile.py)")
    pcp.add_argument("experiment")
    pcp.add_argument("--phases",
                     default="warmup,joint,finetune,val,fullres,push",
                     help="comma subset of "
                          "warmup,joint,finetune,val,fullres,push")
    pcp.add_argument("--steps-scale", type=float, default=1.0,
                     help="must match the run's --steps-scale (phase "
                          "budgets bake the LR schedule into the "
                          "program)")
    pcp.add_argument("--bf16", action="store_true")
    pcp.add_argument("--fused", action="store_true")
    pcp.add_argument("--s2b", action="store_true")
    pcp.add_argument("--wire-uint8", action="store_true",
                     help="must match the run's --wire-uint8 (the "
                          "image wire dtype changes every train "
                          "program's cache key)")
    pcp.add_argument("--presigmoid-ln", action="store_true",
                     help="must match the run's --presigmoid-ln (the "
                          "LN changes the param tree, hence every "
                          "program)")
    pcp.add_argument("--eval-batch", type=int, default=8)
    pcp.add_argument("--push-batch", type=int, default=8)
    pcp.add_argument("--full-res", default="1024,2048", metavar="H,W",
                     help="whole-image eval/push resolution to warm")
    pcp.add_argument("--stats", action="store_true",
                     help="warm the --stats eval variant")
    pcp.add_argument("--stats-upsampled", action="store_true")
    pcp.add_argument("--unoise", action="store_true",
                     help="also warm the U-Noise utility/noise steps "
                          "(cfg.unoise knobs)")
    pcp.add_argument("--unoise-res", default="256,256", metavar="H,W")
    pcp.set_defaults(fn=cmd_precompile)

    sv = sub.add_parser(
        "serve",
        help="HTTP inference server over an exported artifact "
             "(micro-batched, pipelined; see deploy/server.py)")
    sv.add_argument("artifact_dir",
                    help="directory written by export / unoise-export "
                         "/ cls-export")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--platform", default=None,
                    help="artifact platform (default: current backend)")
    sv.add_argument("--window-ms", type=float, default=5.0,
                    help="micro-batch coalescing window")
    sv.set_defaults(fn=cmd_serve)

    ux = sub.add_parser(
        "unoise-export",
        help="AOT-export a trained U-Noise model (utility segmenter "
             "or noise importance map) for serving")
    ux.add_argument("run_dir")
    ux.add_argument("--model", default="utility",
                    choices=["utility", "noise"])
    ux.add_argument("--kind", default="best", choices=["last", "best"])
    ux.add_argument("--batch", type=int, default=8)
    ux.add_argument("--size", default="256,256", metavar="H,W")
    ux.add_argument("--platforms", default="cpu,tpu")
    ux.add_argument("--depth", type=int, default=5,
                    help="fallback when the run has no config metadata")
    ux.add_argument("--channel-factor", type=int, default=6)
    ux.add_argument("--f32-compute", action="store_true")
    ux.add_argument("--out", default=None)
    ux.set_defaults(fn=cmd_unoise_export)

    cx = sub.add_parser(
        "cls-export",
        help="AOT-export a trained ProtoPNet classifier for serving "
             "(logits + prototype activations, weights baked in)")
    cx.add_argument("run_dir")
    cx.add_argument("stage", choices=["nopush", "push", "pruned"])
    cx.add_argument("--kind", default="best", choices=["last", "best"])
    cx.add_argument("--batch", type=int, default=1)
    cx.add_argument("--platforms", default="cpu,tpu")
    cx.add_argument("--f32-inputs", action="store_true",
                    help="expect pre-normalized float32 inputs instead "
                         "of raw uint8 + on-device normalization")
    cx.add_argument("--f32-compute", action="store_true")
    cx.add_argument("--out", default=None)
    cx.set_defaults(fn=cmd_cls_export)

    ip = sub.add_parser(
        "import-protoseg",
        help="import a trained reference ProtoSeg checkpoint "
             "(torch.save'd ppnet module or state_dict) into a run dir")
    ip.add_argument("experiment")
    ip.add_argument("run_name")
    ip.add_argument("checkpoint")
    ip.add_argument("--stage", default="push",
                    choices=["warmup", "nopush", "push", "pruned"],
                    help="stage to file the checkpoint under (the "
                         "reference names its files by the same stages)")
    ip.add_argument("--proto-class", default=None,
                    help="(P,) class-id .npy for pruned checkpoints "
                         "whose identity is not in the pickle")
    ip.set_defaults(fn=cmd_import_protoseg)

    et = sub.add_parser(
        "export-torch",
        help="export a run's ProtoSeg model as a reference-named torch "
             "state_dict (reverse of import-protoseg)")
    et.add_argument("run_dir")
    et.add_argument("stage")
    et.add_argument("--kind", default="best", choices=["last", "best"])
    et.add_argument("--out", default=None)
    et.set_defaults(fn=cmd_export_torch)

    icp = sub.add_parser(
        "import-protopnet",
        help="import a trained reference classification ProtoPNet "
             "checkpoint into a run dir")
    icp.add_argument("run_name")
    icp.add_argument("checkpoint")
    icp.add_argument("--arch", default="vgg19",
                     help="feature stem architecture (reference "
                          "settings.py base_architecture)")
    icp.add_argument("--img-size", type=int, default=224)
    icp.add_argument("--add-on", default="regular",
                     choices=["regular", "bottleneck", "deeplab_simple"])
    icp.add_argument("--stage", default="push",
                     choices=["nopush", "push", "pruned"])
    icp.add_argument("--proto-class", default=None,
                     help="(P,) class-id .npy for pruned checkpoints")
    icp.set_defaults(fn=cmd_import_protopnet)

    pp = sub.add_parser("prune")
    pp.add_argument("run_dir")
    pp.add_argument("--kind", default="last")
    pp.add_argument("--data-path", default=None)
    pp.add_argument("--k", type=int, default=6)
    pp.add_argument("--threshold", type=int, default=3)
    pp.add_argument("--batch-size", type=int, default=1,
                    help="images per jit call for the k-nearest scan "
                         "(results identical to the sequential scan)")
    pp.set_defaults(fn=cmd_prune)

    cp = sub.add_parser("cls-train")
    cp.add_argument("run_name")
    cp.add_argument("--arch", default="vgg19",
                    help="resnet18/34/50/101/152, vggNN[_bn], "
                         "densenet121/161/169/201")
    cp.add_argument("--train-dir", default=None)
    cp.add_argument("--test-dir", default=None)
    cp.add_argument("--push-dir", default=None)
    cp.add_argument("--img-size", type=int, default=224)
    cp.add_argument("--num-classes", type=int, default=0,
                    help="default: inferred from train-dir subfolders")
    cp.add_argument("--prototypes", type=int, default=2000)
    cp.add_argument("--proto-channels", type=int, default=128)
    cp.add_argument("--batch-size", type=int, default=80)
    cp.add_argument("--test-batch-size", type=int, default=100)
    cp.add_argument("--push-batch-size", type=int, default=75)
    cp.add_argument("--epochs", type=int, default=1000)
    cp.add_argument("--warm-epochs", type=int, default=5)
    cp.add_argument("--push-start", type=int, default=10)
    cp.add_argument("--push-every", type=int, default=10)
    cp.add_argument("--last-layer-iterations", type=int, default=20)
    cp.add_argument("--target-accuracy", type=float, default=0.0)
    cp.add_argument("--pretrained", default=None,
                    help="torchvision .pth state_dict (or .npz) with "
                         "ImageNet stem weights")
    cp.add_argument("--bf16", action="store_true",
                    help="bf16 train forward/backward on the MXU "
                         "(push/eval stay f32)")
    cp.add_argument("--mesh-data", type=int, default=0,
                    help="data-parallel mesh axis size for the train "
                         "steps (0 = single device)")
    cp.set_defaults(fn=cmd_cls_train)

    cq = sub.add_parser("cls-prune")
    cq.add_argument("run_dir")
    cq.add_argument("--train-dir", default=None)
    cq.add_argument("--test-dir", default=None)
    cq.add_argument("--push-dir", default=None)
    cq.add_argument("--batch-size", type=int, default=75)
    cq.add_argument("--k", type=int, default=6)
    cq.add_argument("--threshold", type=int, default=3)
    cq.add_argument("--last-layer-iterations", type=int, default=0)
    cq.set_defaults(fn=cmd_cls_prune)

    up = sub.add_parser("unoise-train-util")
    up.add_argument("--imgs", default="data/images.npy")
    up.add_argument("--masks", default="data/masks.npy")
    up.add_argument("--boxes", default="data/bounding_boxes.npy")
    up.add_argument("--run-name", default="unoise_util")
    up.add_argument("--depth", type=int, default=5)
    up.add_argument("--channel-factor", type=int, default=6)
    up.add_argument("--learning-rate", type=float, default=3e-3)
    up.add_argument("--batch-size", type=int, default=8)
    up.add_argument("--epochs", type=int, default=100)
    up.add_argument("--bf16", action="store_true",
                    help="bf16 UNet forward/backward (MXU)")
    up.add_argument("--mesh-data", type=int, default=0,
                    help="data-parallel mesh axis size (0 = single "
                         "device); batch must be divisible by it")
    up.set_defaults(fn=cmd_unoise_train_util)

    np_ = sub.add_parser("unoise-train-noise")
    np_.add_argument("--imgs", default="data/images.npy")
    np_.add_argument("--masks", default="data/masks.npy")
    np_.add_argument("--boxes", default="data/bounding_boxes.npy")
    np_.add_argument("--run-name", default="unoise_noise")
    np_.add_argument("--utility-run", default="unoise_util")
    np_.add_argument("--depth", type=int, default=5)
    np_.add_argument("--channel-factor", type=int, default=6)
    np_.add_argument("--learning-rate", type=float, default=3e-3)
    np_.add_argument("--batch-size", type=int, default=8)
    np_.add_argument("--epochs", type=int, default=100)
    np_.add_argument("--pretrained", default=None,
                     help="utility run name to initialize the noise "
                          "UNet from (architectures must match)")
    np_.add_argument("--pretrained-torch-ckpt", default=None,
                     help="reference pytorch-lightning UtilityModel "
                          "checkpoint (.ckpt) to initialize the noise "
                          "UNet from (architectures must match)")
    np_.add_argument("--utility-torch-ckpt", default=None,
                     help="load the FROZEN utility model from a "
                          "reference pytorch-lightning checkpoint "
                          "instead of --utility-run (architecture "
                          "inferred from the state_dict)")
    np_.add_argument("--min-scale", type=float, default=1.0)
    np_.add_argument("--max-scale", type=float, default=5.0)
    np_.add_argument("--noise-coeff", type=float, default=0.001)
    np_.add_argument("--bf16", action="store_true",
                     help="bf16 UNet forward/backward (MXU)")
    np_.add_argument("--mesh-data", type=int, default=0,
                     help="data-parallel mesh axis size (0 = single "
                          "device); batch must be divisible by it")
    np_.set_defaults(fn=cmd_unoise_train_noise)

    for name, module_fn in (
            ("preprocess-cityscapes", "preprocess_cityscapes"),
            ("preprocess-pascal", "preprocess_pascal"),
            ("preprocess-pancreas", "preprocess_pancreas"),
            ("prepare-unoise", "prepare_unoise_data")):
        sp = sub.add_parser(name)
        sp.add_argument("source_path")
        sp.add_argument("target_path")
        def _mk(fn_name):
            def run(args):
                import adlm_tpu.data.preprocess as pre
                getattr(pre, fn_name)(args.source_path, args.target_path)
            return run
        sp.set_defaults(fn=_mk(module_fn))

    itn = sub.add_parser(
        "img-to-numpy",
        help="PNG->npy pass over existing img_with_margin dirs "
             "(reference segmentation/img_to_numpy.py)")
    itn.add_argument("data_path")
    itn.add_argument("--margin", type=int, default=0)

    def _img_to_numpy(args):
        from adlm_tpu.data.preprocess import convert_images_to_numpy
        n = convert_images_to_numpy(args.data_path, margin=args.margin)
        print(f"converted {n} images")
    itn.set_defaults(fn=_img_to_numpy)

    vp = sub.add_parser("unoise-visualize")
    vp.add_argument("--imgs", default="data/images.npy")
    vp.add_argument("--masks", default="data/masks.npy")
    vp.add_argument("--boxes", default="data/bounding_boxes.npy")
    vp.add_argument("--utility-run", default="unoise_util")
    vp.add_argument("--noise-run", default="unoise_noise")
    vp.add_argument("--depth", type=int, default=5)
    vp.add_argument("--channel-factor", type=int, default=6)
    vp.add_argument("--index", type=int, default=0)
    vp.add_argument("--occlusion-patch", type=int, default=10)
    vp.add_argument("--occlusion-stride", type=int, default=4)
    vp.set_defaults(fn=cmd_unoise_visualize)

    fp = sub.add_parser("unoise-figures")
    fp.add_argument("--imgs", default="data/images.npy")
    fp.add_argument("--masks", default="data/masks.npy")
    fp.add_argument("--boxes", default="data/bounding_boxes.npy")
    fp.add_argument("--utility-run", default="unoise_util")
    fp.add_argument("--noise-runs", default="unoise_noise",
                    help="comma-separated noise run names")
    fp.add_argument("--depth", type=int, default=5)
    fp.add_argument("--channel-factor", type=int, default=6)
    fp.add_argument("--n-images", type=int, default=8)
    fp.add_argument("--sweep-batch-size", type=int, default=32,
                    help="per-batch dice averaging granularity "
                         "(reference make_figures.py:128)")
    fp.add_argument("--from-pickle", default=None,
                    help="render a reference-format results.pickle "
                         "instead of evaluating checkpoints")
    fp.add_argument("--save-pickle", default=None,
                    help="also write results in the reference's "
                         "results.pickle format")
    fp.set_defaults(fn=cmd_unoise_figures)

    for name, fn in (("analyze-local", cmd_analyze_local),
                     ("analyze-global", cmd_analyze_global)):
        ap = sub.add_parser(name)
        ap.add_argument("run_dir")
        ap.add_argument("stage", choices=["warmup", "nopush", "push",
                                          "pruned"])
        ap.add_argument("--kind", default="last")
        ap.add_argument("--split", default="val")
        ap.add_argument("--data-path", default=None)
        if name == "analyze-local":
            ap.add_argument("--index", type=int, default=0)
            ap.add_argument("--top-k", type=int, default=10)
            ap.add_argument("--per-class-top", type=int, default=3,
                            help="also save each of the k most-"
                                 "represented classes' own prototypes "
                                 "ranked by activation (reference "
                                 "local_analysis.py:272-330); 0 = off")
        else:
            ap.add_argument("--k", type=int, default=5)
            ap.add_argument("--max-images", type=int, default=0)
            ap.add_argument("--full-save", action="store_true",
                            help="save nearest-patch image artifacts")
            ap.add_argument("--batch-size", type=int, default=1,
                            help="images per jit call for the "
                                 "k-nearest scan")
        ap.set_defaults(fn=fn)

    gp = sub.add_parser("gen-image-list")
    gp.add_argument("target_path")
    gp.set_defaults(fn=lambda a: __import__(
        "adlm_tpu.data.preprocess", fromlist=["generate_image_list"]
    ).generate_image_list(a.target_path))

    bp = sub.add_parser("bench")
    bp.set_defaults(fn=cmd_bench)

    raw = list(sys.argv[1:] if argv is None else argv)
    args = p.parse_args(raw)
    args._argv = raw  # the supervisor (--auto-restart) re-execs these
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
