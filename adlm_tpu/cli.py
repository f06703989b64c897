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


def _enable_compile_cache():
    import jax
    cache = os.environ.get("JAX_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _results_dir(run_name: str) -> str:
    base = os.environ.get("RESULTS_DIR", "./runs")
    return os.path.join(base, run_name)


def cmd_train(args):
    _enable_compile_cache()
    from adlm_tpu.core.config import get_experiment
    from adlm_tpu.train.pipeline import run_protoseg_training

    cfg = get_experiment(args.experiment)
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
    run_protoseg_training(
        cfg, run_dir, data_path=args.data_path, pruned=args.pruned,
        start_checkpoint=args.start_checkpoint,
        val_every=args.val_every, steps_scale=args.steps_scale,
        save_push_visualizations=args.save_push_visualizations,
        pretrained_path=args.pretrained,
        pretrained_naming="deeplab" if cfg.load_coco else "torchvision",
        mesh=mesh)


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
    ev = SegEvaluator(model, cfg.model.num_classes)
    acc = ProtoStatsAccumulator(n_proto, cfg.model.num_classes,
                                np.asarray(proto_class)) if args.stats \
        else None
    if args.batch_size > 1 and not args.stats:
        items = ds.eval_batches(args.batch_size)
    else:
        items = ds.eval_items()

    if acc is not None:
        import jax
        # jitted grid-level stats forward (reference eval_valid.py:191-214);
        # an eager apply would run op-by-op through the remote relay
        stats_fwd = jax.jit(lambda p, c, img: model.apply(
            {"params": p, "constants": c}, img, train=False))

    n_images = 0
    for img, lab in items:
        out = ev.update(params, payload["constants"], proto_class, img, lab)
        if acc is not None:
            logits, dist = stats_fwd(params, payload["constants"],
                                     jnp.asarray(img))
            pred_grid = np.asarray(jnp.argmax(logits[0], -1))
            nearest = np.asarray(jnp.argmin(dist[0], -1))
            acc.update(pred_grid, nearest, np.asarray(dist[0]))
        n_images += img.shape[0]
        if args.max_images and n_images >= args.max_images:
            break
    res = ev.results()
    out_dir = os.path.join(args.run_dir, "evaluation", args.stage)
    save_eval_plots(
        out_dir, res["iou_per_class"], res["mean_iou"],
        res["pixel_accuracy"],
        stats=acc.results() if acc else None,
        pair_stats=prototype_pair_distances(
            jnp.asarray(params["prototype_vectors"]), proto_class),
        class_names=table.class_names)
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
    fn = make_inference_fn(model, cfg.model.num_classes)
    out_dir = os.path.join(args.run_dir, "evaluation", args.stage,
                           "test_predictions")
    os.makedirs(out_dir, exist_ok=True)
    for i, (img, lab) in enumerate(ds.eval_items()):
        out = fn(params, payload["constants"], proto_class,
                 jnp.asarray(img), jnp.asarray(lab))
        pred = np.asarray(out["pred"][0]).astype(np.uint8)
        Image.fromarray(lut[pred]).save(
            os.path.join(out_dir, ds.img_ids[i] + ".png"))
        if args.max_images and i + 1 >= args.max_images:
            break
    print(f"wrote predictions to {out_dir}")


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
    new_params, new_pc, prune_info = prune_by_purity(
        model, params, payload["constants"], proto_class,
        ds.eval_items(), cfg.model.num_classes, k=args.k,
        prune_threshold=args.threshold)
    store.save("pruned", "last", {
        "params": dict(new_params), "constants": dict(payload["constants"]),
        "proto_class": new_pc, "step": payload["step"]})
    np.save(os.path.join(args.run_dir, "prune_info.npy"), prune_info)
    print(f"pruned {prune_info.shape[0]} prototypes; finetune with "
          f"`train ... --pruned`")


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

    def save_heat(heat, name):
        hn = (heat - heat.min()) / max(heat.max() - heat.min(), 1e-12)
        if hn.shape != (H, W):
            hn = upsample_cubic(hn, (H, W))
        rgb = np.clip(0.5 * (image * 0.225 + 0.45) +
                      0.5 * jet_colormap(hn), 0, 1)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(out_dir, name))

    imp = unoise_importance(noise_model, noise_v, image_j)[0, :, :, 0]
    save_heat(1.0 - imp, "unoise_importance.png")
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
    """Coverage-vs-dice curves (reference src/make_figures.py)."""
    _enable_compile_cache()
    import jax.numpy as jnp
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.models.unet import UNet
    from adlm_tpu.interpret.figures import coverage_dice_curve, plot_curves
    from adlm_tpu.interpret.unoise_vis import unoise_importance
    from adlm_tpu.data.unoise_data import batches, split_datasets

    results = os.environ.get("RESULTS_DIR", "./runs")
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

    curves = {}
    params_per_model = {}
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
        curves[run] = coverage_dice_curve(util_model, util_v, imp,
                                          test_imgs, test_masks)
    out = os.path.join(results, "unoise_coverage_dice.png")
    plot_curves(curves, out, params_per_model)
    print(json.dumps({run: curve for run, curve in curves.items()},
                     indent=2))


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
        denorm=make_denorm(cfg.data))
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
        denorm=make_denorm(cfg.data))
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
    tp.add_argument("--start-checkpoint", default=None)
    tp.add_argument("--pretrained", default=None,
                    help="path to a torch .pth state_dict or .npz with "
                         "torchvision (ImageNet) or deeplab (COCO) keys")
    tp.add_argument("--data-path", default=None)
    tp.add_argument("--val-every", type=int, default=500)
    tp.add_argument("--steps-scale", type=float, default=1.0)
    tp.add_argument("--save-push-visualizations", action="store_true")
    tp.add_argument("--mesh-data", type=int, default=0,
                    help="data-parallel mesh axis size (0 = single device)")
    tp.add_argument("--mesh-model", type=int, default=1,
                    help="model/spatial mesh axis size")
    tp.add_argument("--distributed", action="store_true",
                    help="multi-host: call jax.distributed.initialize()")
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
        ep.add_argument("--stats", action="store_true",
                        help="also compute prototype interpretability "
                             "stats + plots (eval-valid only)")
        ep.add_argument("--batch-size", type=int, default=1,
                        help="full-res eval batch (uniform-shape "
                             "datasets; ignored with --stats)")
        ep.set_defaults(fn=fn)

    pp = sub.add_parser("prune")
    pp.add_argument("run_dir")
    pp.add_argument("--kind", default="last")
    pp.add_argument("--data-path", default=None)
    pp.add_argument("--k", type=int, default=6)
    pp.add_argument("--threshold", type=int, default=3)
    pp.set_defaults(fn=cmd_prune)

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
    np_.add_argument("--min-scale", type=float, default=1.0)
    np_.add_argument("--max-scale", type=float, default=5.0)
    np_.add_argument("--noise-coeff", type=float, default=0.001)
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
        else:
            ap.add_argument("--k", type=int, default=5)
            ap.add_argument("--max-images", type=int, default=0)
            ap.add_argument("--full-save", action="store_true",
                            help="save nearest-patch image artifacts")
        ap.set_defaults(fn=fn)

    gp = sub.add_parser("gen-image-list")
    gp.add_argument("target_path")
    gp.set_defaults(fn=lambda a: __import__(
        "adlm_tpu.data.preprocess", fromlist=["generate_image_list"]
    ).generate_image_list(a.target_path))

    bp = sub.add_parser("bench")
    bp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
