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


def test_threshold_sweep_matches_reference_math():
    """threshold_sweep + dice_at_median_importance vs a literal torch
    transcription of the reference's evaluate() (make_figures.py:135-173)
    on a shared stub utility model — covers the per-batch dice/coverage
    aggregation and torch.median's lower-middle-element semantics on an
    even pixel count."""
    import torch
    from adlm_tpu.interpret.figures import (threshold_sweep,
                                            dice_at_median_importance)

    rng = np.random.RandomState(11)
    N, H, W = 7, 8, 8                       # N·H·W even → median tie
    images = rng.rand(N, H, W, 3).astype(np.float32)
    masks = (rng.rand(N, H, W, 1) > 0.5).astype(np.float32)
    B = rng.rand(N, H, W, 1).astype(np.float32)
    thresholds = np.linspace(0.0, 1.0, 11)
    batch = 3                               # uneven final batch

    def predict(x):                          # stub utility model
        x = np.asarray(x)
        return x.mean(axis=-1, keepdims=True) - 0.45

    def torch_dice(pred, target, eps=1e-10):  # reference src/utils.py:2-12
        m1 = pred.reshape(-1).float()
        m2 = target.reshape(-1).float()
        inter = (m1 * m2).sum()
        return float(2.0 * inter / (m1.sum() + m2.sum() + eps))

    # --- literal reference evaluate() ---
    dice_ref = [[] for _ in thresholds]
    cov_ref = [[] for _ in thresholds]
    for s in range(0, N, batch):
        ib = torch.tensor(images[s:s + batch])
        mb = torch.tensor(masks[s:s + batch])
        bb = torch.tensor(B[s:s + batch])
        for i, t in enumerate(thresholds):
            thresh_images = ib * (bb <= t)
            pred = torch.tensor(predict(thresh_images.numpy()))
            dice_ref[i].append(torch_dice(pred > 0.0, mb))
            cov_ref[i].append(float((bb <= t).sum() / bb.numel()))
    dice_ref = [float(np.mean(d)) for d in dice_ref]
    cov_ref = [float(np.mean(c)) for c in cov_ref]
    median_b = torch.median(torch.tensor(B).flatten())
    at_half_ref = []
    for s in range(0, N, batch):
        ib = torch.tensor(images[s:s + batch])
        mb = torch.tensor(masks[s:s + batch])
        bb = torch.tensor(B[s:s + batch])
        pred = torch.tensor(predict((ib * (bb <= median_b)).numpy()))
        at_half_ref.append(torch_dice(pred > 0.0, mb))
    at_half_ref = float(np.mean(at_half_ref))

    # --- ours ---
    dice, cov, th = threshold_sweep(predict, B, images, masks,
                                    thresholds=thresholds,
                                    batch_size=batch)
    at_half = dice_at_median_importance(predict, B, images, masks,
                                        batch_size=batch)
    np.testing.assert_allclose(dice, dice_ref, rtol=1e-6)
    np.testing.assert_allclose(cov, cov_ref, rtol=1e-6)
    np.testing.assert_allclose(th, thresholds)
    np.testing.assert_allclose(at_half, at_half_ref, rtol=1e-6)


def test_reference_results_pickle_ingest(tmp_path):
    """load_results_pickle on the reference's own published
    data/results.pickle reproduces its README table (README.md:170-187)
    and renders both figures; save_results_pickle round-trips."""
    from adlm_tpu.interpret.figures import (load_results_pickle,
                                            save_results_pickle)

    src = "/root/reference/data/results.pickle"
    if not os.path.exists(src):
        import pytest
        pytest.skip("reference results.pickle unavailable")
    curves, params, at_half = load_results_pickle(src)

    # the README's params / dice@50% table
    expected = {
        "U-Noise Small": (28529, 0.3223),
        "U-Noise Medium": (130577, 0.3111),
        "U-Noise Large": (537425, 0.2809),
        "U-Noise Small (Pretrained)": (28529, 0.3411),
        "U-Noise Medium (Pretrained)": (130577, 0.3369),
        "U-Noise Large (Pretrained)": (537425, 0.3718),
    }
    assert set(curves) == set(expected)
    for name, (p, d50) in expected.items():
        assert params[name] == p
        np.testing.assert_allclose(at_half[name], d50, atol=5e-5)
        assert len(curves[name]) == 21
        assert all(0 <= c <= 1 and 0 <= d <= 1 for c, d in curves[name])

    out = str(tmp_path / "ref.png")
    plot_curves(curves, out, params, dice_at_half=at_half)
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "ref_params.png"))

    rt = str(tmp_path / "roundtrip.pickle")
    save_results_pickle(rt, {
        name: {"thresholds": np.linspace(0, 1, 21),
               "num_params": params[name],
               "dice": [d for _, d in curves[name]],
               "coverage": [c for c, _ in curves[name]],
               "dice_at_half_coverage": at_half[name]}
        for name in curves})
    c2, p2, a2 = load_results_pickle(rt)
    assert p2 == params and a2 == at_half and c2 == curves


def test_unoise_figures_cli(tmp_path, monkeypatch):
    """unoise-figures end-to-end on checkpoint dirs: reference-semantics
    sweep + median-mask dice@50%, pickle export round-trips through
    --from-pickle rendering."""
    import argparse
    from adlm_tpu.cli import cmd_unoise_figures
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.interpret.figures import load_results_pickle

    results = str(tmp_path / "runs")
    monkeypatch.setenv("RESULTS_DIR", results)

    rng = np.random.RandomState(6)
    imgs_p = str(tmp_path / "images.npy")
    masks_p = str(tmp_path / "masks.npy")
    np.save(imgs_p, rng.rand(20, 16, 16).astype(np.float32))
    np.save(masks_p, (rng.rand(20, 16, 16) > 0.6).astype(np.float32))

    model = UNet(out_channels=1, depth=2, cf=3)
    for run, stage in (("util1", "utility"), ("noise1", "noise")):
        v = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 16, 16, 3)),
                       train=True)
        store = CheckpointStore(os.path.join(results, run))
        store.save(stage, "best", {"params": dict(v["params"]),
                                   "batch_stats": dict(v["batch_stats"]),
                                   "step": 0})
        store.save_metadata(f"{stage}_config",
                            {"depth": 2, "channel_factor": 3})

    pkl = str(tmp_path / "ours.pickle")
    cmd_unoise_figures(argparse.Namespace(
        imgs=imgs_p, masks=masks_p, boxes=None, utility_run="util1",
        noise_runs="noise1", depth=2, channel_factor=3, n_images=4,
        sweep_batch_size=2, from_pickle=None, save_pickle=pkl))
    assert os.path.exists(os.path.join(results,
                                       "unoise_coverage_dice.png"))
    curves, params, at_half = load_results_pickle(pkl)
    assert set(curves) == {"noise1"}
    assert len(curves["noise1"]) == 21
    assert 0.0 <= at_half["noise1"] <= 1.0
    # threshold 1.0 keeps everything visible -> coverage 1
    np.testing.assert_allclose(curves["noise1"][-1][0], 1.0)

    # render the exported pickle through --from-pickle
    os.remove(os.path.join(results, "unoise_coverage_dice.png"))
    cmd_unoise_figures(argparse.Namespace(from_pickle=pkl))
    assert os.path.exists(os.path.join(results,
                                       "unoise_coverage_dice.png"))


def test_device_sweep_matches_host_sweep():
    """device_threshold_sweep (one jit per batch, lax.map over the
    grid) must match threshold_sweep with a jitted predict on a real
    UNet — identical per-threshold op sequence, no T× dispatch."""
    from adlm_tpu.interpret.figures import (threshold_sweep,
                                            device_threshold_sweep)

    model = UNet(out_channels=1, depth=2, cf=3)
    rng = np.random.RandomState(8)
    images = rng.rand(5, 16, 16, 3).astype(np.float32)
    masks = (rng.rand(5, 16, 16, 1) > 0.5).astype(np.float32)
    B = rng.rand(5, 16, 16, 1).astype(np.float32)
    v = model.init(jax.random.PRNGKey(8), jnp.asarray(images[:1]),
                   train=True)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    predict = jax.jit(lambda x: model.apply(v, x, train=False))
    th = np.linspace(0.0, 1.0, 7)

    d_host, c_host, _ = threshold_sweep(predict, B, images, masks,
                                        thresholds=th, batch_size=2)
    d_dev, c_dev, t_dev = device_threshold_sweep(
        model, v, B, images, masks, thresholds=th, batch_size=2)
    np.testing.assert_allclose(d_dev, d_host, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(c_dev, c_host, rtol=1e-6)
    np.testing.assert_allclose(t_dev, th)
