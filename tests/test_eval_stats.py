"""Eval statistics: single-forward stats, upsampled-distance parity
mode, windowed evaluator, and example overlays.

Reference semantics: segmentation/eval_valid.py:158-343 (metrics,
nearest-prototype counts, top-K purity on random pixels, qualitative
overlays).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core.config import PPNetConfig
from adlm_tpu.interpret.evaluate import (
    SegEvaluator,
    _bilinear_gather,
    make_inference_fn,
    make_overlay_fn,
    upsampled_nearest,
)
from adlm_tpu.interpret.stats import (
    ProtoStatsAccumulator,
    save_example_overlays,
)
from adlm_tpu.interpret.windowed import WindowedSegEvaluator
from adlm_tpu.models.ppnet import PPNet, default_proto_class
from adlm_tpu.ops.resize import resize_bilinear


def _tiny(seed=0, img=33):
    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=img)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(seed)
    image = rng.rand(1, img, img, 3).astype(np.float32)
    v = model.init(jax.random.PRNGKey(seed), jnp.asarray(image))
    return model, v["params"], v.get("constants", {}), image, rng


def test_upsampled_nearest_matches_full_resize():
    rng = np.random.RandomState(0)
    dist = jnp.asarray(rng.rand(2, 5, 7, 11).astype(np.float32))
    size = (19, 23)
    want = jnp.argmin(resize_bilinear(dist, size), axis=-1)
    # chunk smaller than P to exercise the scan + padding path
    got = upsampled_nearest(dist, size, chunk=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_upsampled_nearest_tie_break_first_index():
    # two identical distance maps → argmin must pick the lower index,
    # including across chunk boundaries (chunk=1)
    d = jnp.asarray(np.ones((1, 3, 3, 4), np.float32))
    got = upsampled_nearest(d, (6, 6), chunk=1)
    assert (np.asarray(got) == 0).all()


def test_bilinear_gather_matches_resize():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 5, 6, 3).astype(np.float32))
    H, W = 17, 13
    full = np.asarray(resize_bilinear(x, (H, W)))
    rows = jnp.asarray([0, 1, 8, 16, 5])   # include borders
    cols = jnp.asarray([0, 12, 3, 6, 11])
    got = np.asarray(_bilinear_gather(x, rows, cols, H, W))
    want = full[:, np.asarray(rows), np.asarray(cols), :]
    np.testing.assert_allclose(got, want, atol=1e-5)


def _reference_stats(pred, nearest, dist, pc, rows, cols, P):
    """numpy re-simulation of eval_valid.py:191-214 for one image."""
    C = pc.max() + 1
    counts = np.zeros((C, P), np.int64)
    nearest_cls = pc[nearest]
    for c in range(C):
        is_cp = (pred == c) & (nearest_cls == c)
        for p in range(P):
            if pc[p] == c:
                counts[c, p] += np.sum(is_cp & (nearest == p))
    sample_d = dist[rows, cols, :]
    sample_pred = pred[rows, cols]
    order = np.argsort(sample_d, axis=1)
    is_cls = pc[order] == sample_pred[:, None]
    top_k = np.zeros(P)
    for k in range(P):
        top_k[k] = np.sum(is_cls[:, :k + 1]) / (k + 1) * 100.0 / len(rows)
    return counts, top_k


def test_single_forward_stats_match_reference_math():
    model, params, constants, image, rng = _tiny()
    pc = default_proto_class(6, 3)
    labels = rng.randint(0, 4, size=(1, 33, 33))
    fn = make_inference_fn(model, 3, with_stats=True)
    n = 16
    u = jnp.asarray(rng.random_sample(n).astype(np.float32))
    v = jnp.asarray(rng.random_sample(n).astype(np.float32))
    out = fn(params, constants, pc, jnp.asarray(image),
             jnp.asarray(labels), u, v)

    # grid-resolution maps
    logits, dist = model.apply({"params": params, "constants": constants},
                               jnp.asarray(image), train=False,
                               return_distances=True)
    pred = np.asarray(jnp.argmax(logits[0], -1))
    nearest = np.asarray(jnp.argmin(dist[0], -1))
    np.testing.assert_array_equal(np.asarray(out["stat_pred"][0]), pred)
    np.testing.assert_array_equal(np.asarray(out["nearest_proto"][0]),
                                  nearest)

    h = dist.shape[1]
    rows = np.minimum((np.asarray(u) * h).astype(np.int64), h - 1)
    cols = np.minimum((np.asarray(v) * h).astype(np.int64), h - 1)
    counts, top_k = _reference_stats(pred, nearest, np.asarray(dist[0]),
                                     np.asarray(pc), rows, cols, 6)
    # scale: device fn uses ×100/n with n = len(rows)
    np.testing.assert_allclose(np.asarray(out["topk_purity"][0]), top_k,
                               rtol=1e-5)

    acc = ProtoStatsAccumulator(6, 3, np.asarray(pc))
    acc.update(np.asarray(out["stat_pred"]),
               np.asarray(out["nearest_proto"]),
               topk_purity=np.asarray(out["topk_purity"]))
    res = acc.results()
    np.testing.assert_array_equal(res["nearest_proto_counts"], counts)
    np.testing.assert_allclose(res["mean_top_k_purity"], top_k, rtol=1e-5)

    # the device-side (B, P) agreement counts + update_counts fast path
    # must reproduce the map-derived accumulation exactly
    acc2 = ProtoStatsAccumulator(6, 3, np.asarray(pc))
    acc2.update_counts(np.asarray(out["agree_counts"]),
                       np.asarray(out["topk_purity"]))
    res2 = acc2.results()
    np.testing.assert_array_equal(res2["nearest_proto_counts"], counts)
    np.testing.assert_allclose(res2["mean_top_k_purity"], top_k,
                               rtol=1e-5)
    assert acc2.n_images == 1


def test_upsampled_stats_match_direct_computation():
    model, params, constants, image, rng = _tiny(2)
    pc = default_proto_class(6, 3)
    H = W = 50  # label size differs from input to force real upsampling
    labels = rng.randint(0, 4, size=(1, H, W))
    fn = make_inference_fn(model, 3, with_stats=True,
                           stats_upsampled=True, proto_chunk=4)
    n = 12
    u = jnp.asarray(rng.random_sample(n).astype(np.float32))
    v = jnp.asarray(rng.random_sample(n).astype(np.float32))
    out = fn(params, constants, pc, jnp.asarray(image),
             jnp.asarray(labels), u, v)

    logits, dist = model.apply({"params": params, "constants": constants},
                               jnp.asarray(image), train=False,
                               return_distances=True)
    # the reference's direct route: upsample everything, then argmin
    dist_up = np.asarray(resize_bilinear(dist, (H, W)))[0]
    pred_up = np.asarray(
        jnp.argmax(resize_bilinear(logits, (H, W))[0], -1))
    nearest_up = np.argmin(dist_up, axis=-1)
    np.testing.assert_array_equal(np.asarray(out["stat_pred"][0]),
                                  pred_up)
    np.testing.assert_array_equal(np.asarray(out["nearest_proto"][0]),
                                  nearest_up)

    rows = np.minimum((np.asarray(u) * H).astype(np.int64), H - 1)
    cols = np.minimum((np.asarray(v) * W).astype(np.int64), W - 1)
    counts_up, top_k = _reference_stats(pred_up, nearest_up, dist_up,
                                        np.asarray(pc), rows, cols, 6)
    np.testing.assert_allclose(np.asarray(out["topk_purity"][0]), top_k,
                               rtol=1e-4, atol=1e-4)

    # chunked upsampled agreement counts == map-derived reference counts
    acc = ProtoStatsAccumulator(6, 3, np.asarray(pc))
    acc.update_counts(np.asarray(out["agree_counts"]),
                      np.asarray(out["topk_purity"]))
    np.testing.assert_array_equal(acc.results()["nearest_proto_counts"],
                                  counts_up)


def test_seg_evaluator_stats_and_metrics_consistent():
    model, params, constants, image, rng = _tiny(3)
    pc = default_proto_class(6, 3)
    labels = rng.randint(0, 4, size=(1, 33, 33))
    plain = SegEvaluator(model, 3)
    withst = SegEvaluator(model, 3, with_stats=True)
    plain.update(params, constants, pc, image, labels)
    out = withst.update(params, constants, pc, image, labels)
    assert "topk_purity" in out
    assert plain.results() == withst.results()


def test_accumulator_legacy_host_path_matches_device_path():
    rng = np.random.RandomState(4)
    P, C = 6, 3
    pc = np.arange(P) // 2
    pred = rng.randint(0, C, size=(9, 9))
    nearest = rng.randint(0, P, size=(9, 9))
    dist = rng.rand(9, 9, P).astype(np.float32)

    legacy = ProtoStatsAccumulator(P, C, pc, n_random_pixels=20, seed=7)
    legacy.update(pred, nearest, dist)

    # replay the same sample pixels through the device-path math
    rng2 = np.random.RandomState(7)
    rows = rng2.randint(9, size=20)
    cols = rng2.randint(9, size=20)
    from adlm_tpu.interpret.evaluate import _topk_purity
    topk = np.asarray(_topk_purity(
        jnp.asarray(dist[None, rows, cols, :]),
        jnp.asarray(pred[None, rows, cols]), jnp.asarray(pc)))
    device = ProtoStatsAccumulator(P, C, pc, n_random_pixels=20)
    device.update(pred[None], nearest[None], topk_purity=topk)

    a, b = legacy.results(), device.results()
    np.testing.assert_array_equal(a["nearest_proto_counts"],
                                  b["nearest_proto_counts"])
    np.testing.assert_allclose(a["mean_top_k_purity"],
                               b["mean_top_k_purity"], rtol=1e-5)


def test_windowed_evaluator_matches_whole_image_interior():
    model, params, constants, image, rng = _tiny(5)
    pc = default_proto_class(6, 3)
    labels = rng.randint(0, 4, size=(1, 33, 33))
    whole = SegEvaluator(model, 3)
    whole.update(params, constants, pc, image, labels)
    win = WindowedSegEvaluator(model, 3, window=(33, 33))
    win.update(params, constants, pc, image, labels)
    # window == image size → identical results
    assert win.results() == whole.results()


def test_windowed_evaluator_smaller_window_runs():
    model, params, constants, image, rng = _tiny(6)
    pc = default_proto_class(6, 3)
    labels = rng.randint(0, 4, size=(1, 33, 33))
    win = WindowedSegEvaluator(model, 3, window=(17, 17))
    win.update(params, constants, pc, image, labels)
    res = win.results()
    assert 0.0 <= res["pixel_accuracy"] <= 100.0
    assert int(win.total) == int(np.sum(labels > 0))


def test_overlay_fn_and_save(tmp_path):
    model, params, constants, image, rng = _tiny(7)
    fn = make_overlay_fn(model, proto_chunk=4)
    pred, nearest = fn(params, constants, jnp.asarray(image))
    assert pred.shape == (1, 33, 33)
    assert nearest.shape == (1, 33, 33)
    assert int(jnp.max(nearest)) < 6

    raw = (image[0] * 255).astype(np.uint8)
    void = (rng.rand(33, 33) > 0.8).astype(np.float32)
    save_example_overlays(str(tmp_path), 0, raw, np.asarray(pred[0]),
                          np.asarray(nearest[0]), void,
                          protos_per_class=2, title="t (push)")
    assert os.path.exists(tmp_path / "example_0_prediction.png")
    assert os.path.exists(tmp_path / "example_0_prototypes.png")


def test_per_image_sample_pixels_match_per_image_calls():
    """(B, n) per-image sample coordinates (reference parity: fresh
    pixels per image, eval_valid.py:203-204): a batched stats call
    equals two single-image calls with the respective coordinate rows."""
    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=33)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(8)
    images = rng.rand(2, 33, 33, 3).astype(np.float32)
    labels = rng.randint(0, 4, size=(2, 33, 33))
    v0 = model.init(jax.random.PRNGKey(8), jnp.asarray(images))
    params, constants = v0["params"], v0.get("constants", {})
    pc = default_proto_class(6, 3)
    fn = make_inference_fn(model, 3, with_stats=True)

    n = 10
    u = jnp.asarray(rng.random_sample((2, n)).astype(np.float32))
    v = jnp.asarray(rng.random_sample((2, n)).astype(np.float32))
    batched = fn(params, constants, pc, jnp.asarray(images),
                 jnp.asarray(labels), u, v)
    for i in range(2):
        single = fn(params, constants, pc, jnp.asarray(images[i:i + 1]),
                    jnp.asarray(labels[i:i + 1]), u[i], v[i])
        np.testing.assert_allclose(
            np.asarray(batched["topk_purity"][i]),
            np.asarray(single["topk_purity"][0]), rtol=1e-5, atol=1e-5)
    # the two rows are genuinely different draws
    assert not np.allclose(np.asarray(batched["topk_purity"][0]),
                           np.asarray(batched["topk_purity"][1]))


def test_device_normalize_bit_equals_host_path():
    """Raw-uint8 eval items + in-jit normalization: same f32 op
    sequence as host normalization (ulp-equivalent; the integer eval
    metrics come out bit-identical here and on the TPU) — the
    4×-smaller-transfer eval path."""
    import dataclasses
    from adlm_tpu.core.config import DataConfig
    from adlm_tpu.data.dataset import SegmentationDataset

    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=33)
    model = PPNet(cfg=cfg)
    v = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 40, 48, 3)))
    params, constants = v["params"], v.get("constants", {})
    pc = default_proto_class(6, 3)
    dcfg = DataConfig(class_table="mds")
    assert DataConfig().eval_resize is None  # flagship supports raw

    rng = np.random.RandomState(9)
    raw = rng.randint(0, 256, size=(2, 40, 48, 3)).astype(np.uint8)
    labels = rng.randint(0, 4, size=(2, 40, 48))
    mean = np.asarray(dcfg.mean, np.float32)
    std = np.asarray(dcfg.std, np.float32)
    host = (raw.astype(np.float32) / 255.0 - mean) / std

    fn_host = make_inference_fn(model, 3)
    fn_raw = make_inference_fn(model, 3, normalize=(dcfg.mean, dcfg.std))
    a = fn_host(params, constants, pc, jnp.asarray(host),
                jnp.asarray(labels))
    b = fn_raw(params, constants, pc, jnp.asarray(raw),
               jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(a["pred"]),
                                  np.asarray(b["pred"]))
    np.testing.assert_array_equal(np.asarray(a["intersection"]),
                                  np.asarray(b["intersection"]))
    np.testing.assert_array_equal(np.asarray(a["union"]),
                                  np.asarray(b["union"]))

    # dataset raw mode pairs with the host mode item-for-item
    import json, os, tempfile
    with tempfile.TemporaryDirectory() as root:
        os.makedirs(f"{root}/img_with_margin_0/val")
        os.makedirs(f"{root}/annotations/val")
        np.save(f"{root}/img_with_margin_0/val/a.npy", raw[0])
        np.save(f"{root}/annotations/val/a.npy",
                labels[0].astype(np.uint8))
        json.dump({"val": ["a"]}, open(f"{root}/all_images.json", "w"))
        ds = SegmentationDataset(dcfg, "val", data_path=root,
                                 is_eval=True)
        assert ds.supports_raw_eval()
        img_h, _ = ds.get_eval_item(0)
        img_r, _ = ds.get_eval_item_raw(0)
        assert img_r.dtype == np.uint8
        np.testing.assert_array_equal(
            img_h, (img_r.astype(np.float32) / 255.0 - mean) / std)
        rcfg = dataclasses.replace(dcfg, eval_resize=(33, 33))
        ds2 = SegmentationDataset(rcfg, "val", data_path=root,
                                  is_eval=True)
        assert not ds2.supports_raw_eval()  # resize-after-norm path


def test_upsampled_nearest_bf16_path_matches_resize():
    """bf16 maps take the chunked-resize branch (MXU fast path on
    TPU); it must equal argmin(resize(...)) on the bf16 values."""
    rng = np.random.RandomState(7)
    dist = jnp.asarray(rng.rand(2, 5, 7, 11).astype(np.float32),
                       jnp.bfloat16)
    size = (19, 23)
    want = jnp.argmin(resize_bilinear(dist, size), axis=-1)
    got = upsampled_nearest(dist, size, chunk=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_agreement_counts_excluded_marker():
    """stat_pred == −1 pixels (the windowed pad-cell marker) never
    count, and padded prototype slots never alias."""
    from adlm_tpu.interpret.evaluate import agreement_counts

    nearest = jnp.asarray([[[0, 1], [2, 2]]], jnp.int32)
    pred = jnp.asarray([[[0, -1], [1, 1]]], jnp.int32)
    pc = jnp.asarray([0, 0, 1], jnp.int32)
    got = np.asarray(agreement_counts(nearest, pred, pc, chunk=2))
    # px(0,0): nearest 0, pred 0 == pc[0] → counts; px(0,1): excluded;
    # px(1,0)/(1,1): nearest 2, pred 1 == pc[2] → 2 counts
    np.testing.assert_array_equal(got, [[1, 0, 2]])


def test_upsampled_nearest_integer_fast_path_matches_resize():
    """The phase-decomposed integer-scale path (the whole-image eval
    case, output stride 8) must equal argmin(resize(...)) exactly —
    it is the same 4-tap bilinear math computed without the resize
    matmuls."""
    rng = np.random.RandomState(2)
    for shape, size in [((2, 5, 7, 11), (40, 56)),    # 8×8 (real case)
                        ((2, 4, 6, 5), (12, 24)),      # mixed 3×4
                        ((1, 3, 3, 4), (3, 3))]:       # identity 1×1
        dist = jnp.asarray(rng.rand(*shape).astype(np.float32))
        want = jnp.argmin(resize_bilinear(dist, size), axis=-1)
        got = upsampled_nearest(dist, size)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_stats_exact_restores_f32_tap_parity():
    """stats_exact: a bf16 eval's upsampled nearest-prototype statistic
    must equal the exact f32 4-tap blend of its own (bf16-valued)
    distance maps — the bf16-tap path is allowed to flip near-tie
    argmins, the exact path is not."""
    from adlm_tpu.interpret.evaluate import _upsampled_argmin_scan

    # unit level: prototype 1 is prototype 0 nudged DOWN by less than
    # one bf16 ulp at this magnitude.  Where bf16 quantization crosses
    # a rounding boundary, f32 taps see 1 as the strict winner; where
    # bf16 blends round the pair back together, the first-index
    # tie-break hands the win to 0 — the ~0.5% near-tie flip class
    # stats_exact exists to remove.
    rng = np.random.RandomState(3)
    base = rng.rand(1, 6, 8, 1).astype(np.float32)
    d = np.concatenate([base, base - 2e-4, rng.rand(1, 6, 8, 6)
                        .astype(np.float32) + 1.0], axis=-1)
    d16 = jnp.asarray(d, jnp.bfloat16)
    exact = np.asarray(_upsampled_argmin_scan(
        d16.astype(jnp.float32), (17, 23), chunk=3))
    got = np.asarray(upsampled_nearest(d16.astype(jnp.float32),
                                       (17, 23), chunk=3))
    np.testing.assert_array_equal(got, exact)
    assert (exact == 1).any()  # f32 taps detect the sub-ulp winner
    fast = np.asarray(upsampled_nearest(d16, (17, 23), chunk=3))
    assert (fast != exact).any()  # bf16 taps flip some of those wins

    # integration: an eval whose forward emits BF16 distance maps (the
    # TPU fused head does; the XLA head on CPU stays f32, so stub the
    # forward) must reproduce the exact f32 scan end to end through
    # make_inference_fn when stats_exact is set — and the flag must be
    # the thing that changes the outcome on the engineered ties
    class _Bf16DistModel:
        def __init__(self, dist, num_classes):
            self._dist = jnp.asarray(dist, jnp.bfloat16)
            self._k = num_classes

        def apply(self, variables, images, train, return_distances):
            B, h, w = self._dist.shape[:3]
            logits = jnp.zeros((B, h, w, self._k), jnp.float32)
            return logits, self._dist

    H, W = 17, 23
    stub = _Bf16DistModel(d, 3)
    labels = np.ones((1, H, W), np.int64)
    pc = default_proto_class(8, 3)
    images = jnp.zeros((1, 12, 16, 3), jnp.float32)
    u = jnp.asarray(np.full((1, 5), 0.3), jnp.float32)
    v = jnp.asarray(np.full((1, 5), 0.6), jnp.float32)
    chunk = max(1, min(16, (64 * 1024 * 1024) // (1 * H * W)))
    want = np.asarray(_upsampled_argmin_scan(
        d16.astype(jnp.float32), (H, W), chunk))

    fn_exact = make_inference_fn(stub, 3, with_stats=True,
                                 stats_upsampled=True, stats_exact=True)
    out = fn_exact({}, {}, pc, images, jnp.asarray(labels), u, v)
    np.testing.assert_array_equal(np.asarray(out["nearest_proto"]), want)

    fn_fast = make_inference_fn(stub, 3, with_stats=True,
                                stats_upsampled=True)
    out_f = fn_fast({}, {}, pc, images, jnp.asarray(labels), u, v)
    # the bf16-tap path cannot separate the engineered sub-ulp pair:
    # index 1 wins somewhere (first-index tie-break does not save it
    # because bilinear taps reorder the pair pixel by pixel)
    assert (np.asarray(out_f["nearest_proto"]) != want).any()


def test_agreement_counts_chunk_invariant():
    """agreement_counts is pure accounting — every chunk width must
    produce identical (B, P) counts (the round-5 epilogue split gives
    it a wide chunk independent of the resize clamp)."""
    from adlm_tpu.interpret.evaluate import agreement_counts

    rng = np.random.RandomState(5)
    P, C = 19, 5
    nearest = jnp.asarray(rng.randint(0, P, size=(2, 31, 47)), jnp.int32)
    pred = jnp.asarray(rng.randint(-1, C, size=(2, 31, 47)), jnp.int32)
    pc = jnp.asarray(rng.randint(0, C, size=(P,)), jnp.int32)
    want = np.asarray(agreement_counts(nearest, pred, pc, chunk=1))
    for chunk in (2, 7, 16, P, 64):
        np.testing.assert_array_equal(
            np.asarray(agreement_counts(nearest, pred, pc, chunk=chunk)),
            want)
