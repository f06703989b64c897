"""Tests for analysis, stats, U-Noise interpretability, and figures."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adlm_tpu.core.config import PPNetConfig, UNoiseConfig
from adlm_tpu.models.ppnet import PPNet, default_proto_class
from adlm_tpu.models.unet import UNet
from adlm_tpu.interpret.analysis import global_analysis, local_analysis
from adlm_tpu.interpret.stats import (
    ProtoStatsAccumulator,
    prototype_pair_distances,
    save_eval_plots,
)
from adlm_tpu.interpret.unoise_vis import (
    grad_cam,
    interpretation_timing,
    occlusion_sensitivity,
    unoise_importance,
)
from adlm_tpu.interpret.figures import coverage_dice_curve, plot_curves


def _tiny_model(seed=0):
    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=33)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(seed)
    image = rng.rand(1, 33, 33, 3).astype(np.float32)
    v = model.init(jax.random.PRNGKey(seed), jnp.asarray(image))
    return model, v["params"], v.get("constants", {}), image


def test_local_analysis(tmp_path):
    model, params, constants, image = _tiny_model()
    pc = default_proto_class(6, 3)
    res = local_analysis(model, params, constants, pc, image, top_k=4,
                         save_dir=str(tmp_path))
    assert res["top_prototypes"].shape == (4,)
    assert res["prediction"].shape == (5, 5)
    # fresh init: last layer = +1 own class / −0.5 others → sanity holds
    assert res["own_class_is_strongest"].all()
    assert len(os.listdir(tmp_path)) == 8  # overlay + crop per proto


def test_global_analysis(tmp_path):
    model, params, constants, image = _tiny_model(1)
    pc = default_proto_class(6, 3)
    rng = np.random.RandomState(1)
    data = [(rng.rand(1, 33, 33, 3).astype(np.float32),
             rng.randint(0, 4, size=(1, 33, 33))) for _ in range(3)]
    ids = global_analysis(model, params, constants, pc, data, 3, k=2,
                          save_dir=str(tmp_path))
    assert ids.shape == (6, 2)
    assert os.path.exists(tmp_path / "full_class_id.npy")
    assert os.path.exists(tmp_path / "0" / "class_id.npy")


def test_global_analysis_full_save(tmp_path):
    model, params, constants, image = _tiny_model(2)
    pc = default_proto_class(6, 3)
    rng = np.random.RandomState(2)
    data = [(rng.rand(1, 33, 33, 3).astype(np.float32),
             rng.randint(0, 4, size=(1, 33, 33))) for _ in range(3)]
    ids = global_analysis(model, params, constants, pc, data, 3, k=2,
                          save_dir=str(tmp_path), full_save=True,
                          get_item=lambda i: data[i])
    assert ids.shape == (6, 2)
    d0 = tmp_path / "0"
    files = sorted(os.listdir(d0))
    # per rank: act.npy + 5 pngs/npys + class_id.npy
    assert "class_id.npy" in files
    assert any(f.startswith("nearest-1_original_with_heatmap_and_patch")
               for f in files)
    assert any(f.startswith("nearest-2_high_act_patch_") and
               f.endswith(".png") for f in files)


def test_proto_stats_and_plots(tmp_path):
    pc = np.arange(6) // 2
    acc = ProtoStatsAccumulator(6, 3, pc)
    rng = np.random.RandomState(2)
    for _ in range(2):
        pred = rng.randint(0, 3, size=(9, 9))
        nearest = rng.randint(0, 6, size=(9, 9))
        dist = rng.rand(9, 9, 6).astype(np.float32)
        acc.update(pred, nearest, dist)
    res = acc.results()
    assert res["nearest_proto_counts"].shape == (3, 6)
    assert res["mean_top_k_purity"].shape == (6,)
    # purity at K=P must be ~ (pixels of class / P) fraction bounded 0..100
    assert 0 <= res["mean_top_k_purity"].max() <= 100

    pair = prototype_pair_distances(jnp.asarray(
        rng.rand(6, 8).astype(np.float32)), jnp.asarray(pc))
    assert len(pair["same_class_distances"]) == 3  # one pair per class

    save_eval_plots(str(tmp_path), {0: 50.0, 1: 70.0}, 60.0, 80.0,
                    stats=res, pair_stats=pair)
    assert os.path.exists(tmp_path / "mean_iou.txt")
    assert os.path.exists(tmp_path / "iou_scores.png")
    assert os.path.exists(tmp_path / "top_k_purity.png")
    assert os.path.exists(tmp_path / "proto_distance_hist.png")


def test_grad_cam_and_occlusion():
    model = UNet(out_channels=1, depth=2, cf=3)
    rng = np.random.RandomState(3)
    image = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(1, 16, 16, 1) > 0.5).astype(np.float32))
    v = model.init(jax.random.PRNGKey(3), image, train=True)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}

    heat = grad_cam(model, v, image, x=4, y=4)
    assert heat.shape == (8, 8)  # bottleneck grid
    assert 0 <= heat.min() and heat.max() <= 1.0

    diff = occlusion_sensitivity(model, v, image, masks, patch=8, stride=4)
    assert diff.shape == (1, 3, 3)
    assert np.isfinite(diff).all()

    imp = unoise_importance(model, v, image)
    assert imp.shape == (1, 16, 16, 1)
    assert (0 < imp).all() and (imp < 1).all()

    timing = interpretation_timing({
        "unoise": lambda: model.apply(v, image, train=False)}, repeats=1)
    assert timing["unoise"] > 0


def test_coverage_dice_curve(tmp_path):
    model = UNet(out_channels=1, depth=2, cf=3)
    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(2, 16, 16, 1) > 0.5).astype(np.float32))
    v = model.init(jax.random.PRNGKey(4), images, train=True)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    imp = unoise_importance(model, v, images)
    curve = coverage_dice_curve(model, v, imp, images, masks,
                                coverages=(0.25, 0.5, 1.0))
    assert len(curve) == 3
    assert all(0 <= d <= 1 for _, d in curve)
    plot_curves({"small": curve}, str(tmp_path / "curves.png"),
                params_per_model={"small": 28529})
    assert os.path.exists(tmp_path / "curves.png")
    assert os.path.exists(tmp_path / "curves_params.png")


def test_local_analysis_per_class_sections(tmp_path):
    """per_class_top saves the reference's second section
    (local_analysis.py:272-330): per top class, its own prototypes
    ranked by activation with overlay/crop artifacts + a JSON log."""
    import json
    model, params, constants, image = _tiny_model()
    pc = default_proto_class(6, 3)
    res = local_analysis(model, params, constants, pc, image, top_k=2,
                         save_dir=str(tmp_path), per_class_top=2)
    assert "per_class" in res and len(res["per_class"]) >= 1
    d = tmp_path / "top-1_class_prototypes"
    assert d.is_dir()
    with open(d / "log.json") as f:
        log = json.load(f)
    # 2 prototypes per class in the default identity (6 protos / 3 cls)
    assert len(log["prototypes"]) == 2
    e = log["prototypes"][0]
    assert e["class_identity"] == log["class"]
    assert np.isfinite(e["activation"])
    assert np.isfinite(e["last_layer_connection"])
    # activation-sorted within the class
    acts = [p["activation"] for p in log["prototypes"]]
    assert acts == sorted(acts, reverse=True)
    # overlay + crop per prototype + log.json
    assert len(os.listdir(d)) == 5
