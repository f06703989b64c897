"""Sliding-window inference tests."""

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core.config import PPNetConfig
from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.interpret.windowed import _window_grid, make_windowed_inference_fn
from adlm_tpu.ops.resize import resize_bilinear


def test_window_grid_covers_everything():
    for size, window, stride in [(100, 33, 25), (33, 33, 25), (20, 33, 25),
                                 (1024, 513, 385)]:
        starts = _window_grid(size, window, stride)
        covered = np.zeros(size, bool)
        for s in starts:
            covered[s:s + window] = True
        assert covered.all(), (size, window, stride)
        assert starts[0] == 0
        if size > window:
            assert starts[-1] == size - window


def test_windowed_matches_whole_image_in_interior():
    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=65)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 96, 128, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), image[:, :65, :65])
    params, constants = v["params"], v.get("constants", {})

    # whole-image logits upsampled to pixel grid
    logits, _ = model.apply({"params": params, "constants": constants},
                            image, train=False, return_distances=False)
    whole = np.asarray(resize_bilinear(logits, (96, 128)))

    fn = make_windowed_inference_fn(model, (65, 65), overlap=0.5)
    stitched = fn(params, constants, image)
    assert stitched.shape == whole.shape

    # interior argmax agreement should be high (boundary-context effects
    # only near seams)
    pa = np.argmax(whole[0, 16:-16, 16:-16], -1)
    pb = np.argmax(stitched[0, 16:-16, 16:-16], -1)
    agreement = np.mean(pa == pb)
    assert agreement > 0.85, agreement


def test_windowed_handles_image_smaller_than_window():
    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=65)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(1)
    image = jnp.asarray(rng.rand(1, 40, 50, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 65, 65, 3)))
    fn = make_windowed_inference_fn(model, (65, 65))
    out = fn(v["params"], v.get("constants", {}), image)
    assert out.shape == (1, 40, 50, 3)
    assert np.isfinite(out).all()


def test_windowed_stats_accumulates_like_whole_image():
    """--stats with --windowed: the evaluator emits grid-resolution
    stat maps per window plus a window-mean purity per image, and the
    accumulator counts each IMAGE once.  With a window covering the
    whole image (1 window), results must equal the whole-image stats
    path driven by the same maps."""
    from adlm_tpu.interpret.stats import ProtoStatsAccumulator
    from adlm_tpu.interpret.windowed import WindowedSegEvaluator
    from adlm_tpu.models.ppnet import default_proto_class

    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=65)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(2)
    images = rng.rand(2, 96, 128, 3).astype(np.float32)
    labels = rng.randint(0, 4, size=(2, 96, 128))
    v = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 65, 65, 3)))
    params, constants = v["params"], v.get("constants", {})
    pc = default_proto_class(6, 3)

    ev = WindowedSegEvaluator(model, 3, (65, 65), with_stats=True,
                              n_random_pixels=20)
    out = ev.update(params, constants, pc, images, labels)
    n_wins = out["stat_windows"]
    assert n_wins == 6  # 2×3 windows over 96×128 at 0.25 overlap
    assert out["stat_pred"].shape[0] == 2 * n_wins
    assert out["topk_purity"].shape == (2, 6)

    acc = ProtoStatsAccumulator(6, 3, np.asarray(pc))
    acc.update(out["stat_pred"], out["nearest_proto"],
               topk_purity=out["topk_purity"], n_images=2)
    res = acc.results()
    assert acc.n_images == 2
    assert res["nearest_proto_counts"].sum() > 0
    assert np.all(res["mean_top_k_purity"] >= 0)
    assert np.all(res["mean_top_k_purity"] <= 100.0 + 1e-6)
    # purity at K=P is exactly protos_per_class/P · 100 when every
    # class has equal prototype share — sanity anchor vs the formula
    np.testing.assert_allclose(res["mean_top_k_purity"][-1],
                               100.0 * 2 / 6, atol=1e-4)

    # the device-side per-window agreement counts must equal the
    # map-derived bincount accumulation exactly
    acc2 = ProtoStatsAccumulator(6, 3, np.asarray(pc))
    acc2.update_counts(out["agree_counts"], out["topk_purity"],
                       n_images=2)
    np.testing.assert_array_equal(
        acc2.results()["nearest_proto_counts"],
        res["nearest_proto_counts"])


def test_windowed_device_stitch_matches_host_stitch():
    """The on-device canvas accumulation (donated dynamic-update-slice
    stitching + one-jit metrics) must reproduce the host numpy
    stitching exactly: counters, pred map, and the per-window stats."""
    from adlm_tpu.interpret.windowed import WindowedSegEvaluator
    from adlm_tpu.models.ppnet import default_proto_class

    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=65)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(9)
    images = rng.rand(2, 96, 128, 3).astype(np.float32)
    labels = rng.randint(0, 4, size=(2, 96, 128))
    v = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 65, 65, 3)))
    params, constants = v["params"], v.get("constants", {})
    pc = default_proto_class(6, 3)

    host = WindowedSegEvaluator(model, 3, (65, 65), with_stats=True,
                                n_random_pixels=8, device_stitch=False,
                                fused=False)
    dev = WindowedSegEvaluator(model, 3, (65, 65), with_stats=True,
                               n_random_pixels=8, device_stitch=True,
                               fused=False)
    oh = host.update(params, constants, pc, images, labels)
    od = dev.update(params, constants, pc, images, labels)
    np.testing.assert_array_equal(oh["intersection"], od["intersection"])
    np.testing.assert_array_equal(oh["union"], od["union"])
    np.testing.assert_array_equal(oh["pred"], np.asarray(od["pred"]))
    np.testing.assert_array_equal(oh["agree_counts"],
                                  np.asarray(od["agree_counts"]))
    assert host.results() == dev.results()

    # the fused single-dispatch path (one jit for the whole window
    # grid, windows sliced on device) must match the host reference
    # too — counters, pred, stats maps, purity, agreement
    fus = WindowedSegEvaluator(model, 3, (65, 65), with_stats=True,
                               n_random_pixels=8, fused=True,
                               window_batch=3)
    of = fus.update(params, constants, pc, images, labels)
    np.testing.assert_array_equal(oh["intersection"], of["intersection"])
    np.testing.assert_array_equal(oh["union"], of["union"])
    np.testing.assert_array_equal(oh["pred"], np.asarray(of["pred"]))
    np.testing.assert_array_equal(oh["agree_counts"],
                                  np.asarray(of["agree_counts"]))
    np.testing.assert_array_equal(oh["stat_pred"], of["stat_pred"])
    np.testing.assert_array_equal(oh["nearest_proto"],
                                  of["nearest_proto"])
    np.testing.assert_allclose(oh["topk_purity"], of["topk_purity"],
                               rtol=1e-5)
    assert of["stat_windows"] == oh["stat_windows"]
    assert host.results() == fus.results()

    # auto mode picks the device path for small canvases and must
    # also handle the label-resize branch (labels bigger than image)
    auto = WindowedSegEvaluator(model, 3, (65, 65), device_stitch=None)
    href = WindowedSegEvaluator(model, 3, (65, 65), device_stitch=False)
    lab_big = rng.randint(0, 4, size=(1, 120, 160))
    img = rng.rand(1, 96, 128, 3).astype(np.float32)
    oa = auto.update(params, constants, pc, img, lab_big)
    ob = href.update(params, constants, pc, img, lab_big)
    np.testing.assert_array_equal(np.asarray(oa["pred"]), ob["pred"])
    assert auto.results() == href.results()


def test_windowed_stats_single_window_equals_whole_image():
    """With ONE window covering the whole image, the windowed stats
    maps must equal make_inference_fn(with_stats=True)'s grid maps on
    the same weights (same forward, same argmin/argmax)."""
    from adlm_tpu.interpret.evaluate import make_inference_fn
    from adlm_tpu.interpret.windowed import WindowedSegEvaluator
    from adlm_tpu.models.ppnet import default_proto_class

    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=65)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(5)
    images = rng.rand(1, 64, 64, 3).astype(np.float32)
    labels = rng.randint(0, 4, size=(1, 64, 64))
    v = model.init(jax.random.PRNGKey(5), jnp.asarray(images))
    params, constants = v["params"], v.get("constants", {})
    pc = default_proto_class(6, 3)

    ev = WindowedSegEvaluator(model, 3, (64, 64), with_stats=True,
                              n_random_pixels=16)
    out = ev.update(params, constants, pc, images, labels)
    assert out["stat_windows"] == 1

    fn = make_inference_fn(model, 3, with_stats=True)
    u = jnp.zeros((1, 16), jnp.float32)
    v_ = jnp.zeros((1, 16), jnp.float32)
    ref = fn(params, constants, pc, jnp.asarray(images),
             jnp.asarray(labels), u, v_)
    np.testing.assert_array_equal(out["stat_pred"],
                                  np.asarray(ref["stat_pred"]))
    np.testing.assert_array_equal(out["nearest_proto"],
                                  np.asarray(ref["nearest_proto"]))


def test_windowed_raw_uint8_matches_f32_and_whole_image():
    """normalize=(mean, std): uint8 images + per-window in-jit
    normalization must equal the host-normalized f32 windowed run
    (same counters AND stitched argmax), and — with one window covering
    the whole image — the whole-image raw SegEvaluator too, restoring
    the whole-vs-windowed mIoU equality the e2e CLI test asserts."""
    from adlm_tpu.interpret.evaluate import SegEvaluator
    from adlm_tpu.interpret.windowed import WindowedSegEvaluator
    from adlm_tpu.models.ppnet import default_proto_class

    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=65)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(7)
    raw = rng.randint(0, 256, size=(1, 96, 128, 3)).astype(np.uint8)
    labels = rng.randint(0, 4, size=(1, 96, 128))
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    f32 = ((raw.astype(np.float32) / 255.0)
           - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    v = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 65, 65, 3)))
    params, constants = v["params"], v.get("constants", {})
    pc = default_proto_class(6, 3)

    # multi-window (2x3 grid incl. edge-clamped windows), f32 vs raw
    a = WindowedSegEvaluator(model, 3, (65, 65), with_stats=True,
                             n_random_pixels=16)
    b = WindowedSegEvaluator(model, 3, (65, 65), with_stats=True,
                             n_random_pixels=16, normalize=(mean, std))
    oa = a.update(params, constants, pc, f32, labels)
    ob = b.update(params, constants, pc, raw, labels)
    np.testing.assert_array_equal(oa["pred"], ob["pred"])
    np.testing.assert_array_equal(oa["stat_pred"], ob["stat_pred"])
    np.testing.assert_array_equal(oa["nearest_proto"],
                                  ob["nearest_proto"])
    np.testing.assert_array_equal(a.intersection, b.intersection)
    np.testing.assert_array_equal(a.union, b.union)

    # single full-image window vs the whole-image raw evaluator
    w = WindowedSegEvaluator(model, 3, (96, 128),
                             normalize=(mean, std))
    ow = w.update(params, constants, pc, raw, labels)
    whole = SegEvaluator(model, 3, normalize=(mean, std))
    os_ = whole.update(params, constants, pc, jnp.asarray(raw),
                       jnp.asarray(labels))
    np.testing.assert_array_equal(ow["pred"], np.asarray(os_["pred"]))
    np.testing.assert_array_equal(w.intersection,
                                  np.asarray(whole.intersection))


def test_windowed_stats_exclude_pad_cells():
    """Edge-clamped windows (image smaller than the window) zero-pad
    the input; the stats grid cells that cover ONLY padding must be
    excluded: ``stat_pred = -1`` there (never matches a prototype
    class, so the accumulator skips them — the whole-image path never
    produces pad cells), while valid cells equal the whole-image stats
    program run on the same zero-padded input."""
    from adlm_tpu.interpret.evaluate import make_inference_fn
    from adlm_tpu.interpret.stats import ProtoStatsAccumulator
    from adlm_tpu.interpret.windowed import WindowedSegEvaluator
    from adlm_tpu.models.ppnet import default_proto_class

    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=65)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(9)
    images = rng.rand(1, 40, 50, 3).astype(np.float32)
    labels = rng.randint(0, 4, size=(1, 40, 50))
    v = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 65, 65, 3)))
    params, constants = v["params"], v.get("constants", {})
    pc = default_proto_class(6, 3)

    ev = WindowedSegEvaluator(model, 3, (65, 65), with_stats=True,
                              n_random_pixels=16)
    out = ev.update(params, constants, pc, images, labels)
    assert out["stat_windows"] == 1
    sp = out["stat_pred"][0]
    gh, gw = sp.shape
    vgh = max(1, int(np.ceil(40 * gh / 65)))
    vgw = max(1, int(np.ceil(50 * gw / 65)))
    assert vgh < gh and vgw < gw  # the case under test exists
    assert (sp[vgh:, :] == -1).all()
    assert (sp[:, vgw:] == -1).all()
    assert (sp[:vgh, :vgw] >= 0).all()

    # valid cells match the whole-image stats program on the padded img
    padded = np.zeros((1, 65, 65, 3), np.float32)
    padded[:, :40, :50] = images
    fn = make_inference_fn(model, 3, with_stats=True)
    uv = jnp.zeros((1, 16), jnp.float32)
    ref = fn(params, constants, pc, jnp.asarray(padded),
             jnp.asarray(np.zeros((1, 65, 65), np.int64)), uv, uv)
    np.testing.assert_array_equal(
        sp[:vgh, :vgw], np.asarray(ref["stat_pred"])[0, :vgh, :vgw])
    np.testing.assert_array_equal(
        out["nearest_proto"][0, :vgh, :vgw],
        np.asarray(ref["nearest_proto"])[0, :vgh, :vgw])

    # the accumulator ignores -1 cells: counts equal a run over the
    # manually cropped valid region
    a = ProtoStatsAccumulator(6, 3, np.asarray(pc))
    a.update(out["stat_pred"], out["nearest_proto"],
             topk_purity=out["topk_purity"], n_images=1)
    b = ProtoStatsAccumulator(6, 3, np.asarray(pc))
    b.update(out["stat_pred"][:, :vgh, :vgw],
             out["nearest_proto"][:, :vgh, :vgw],
             topk_purity=out["topk_purity"], n_images=1)
    np.testing.assert_array_equal(a.results()["nearest_proto_counts"],
                                  b.results()["nearest_proto_counts"])


def test_windowed_defer_sync_counters_identical():
    """defer_sync queues the packed device counters and drains them in
    one fetch; the accumulated results must be IDENTICAL to the
    synchronous fused path (only the fetch timing moves), including the
    drained stats aggregates."""
    from adlm_tpu.interpret.windowed import WindowedSegEvaluator
    from adlm_tpu.models.ppnet import default_proto_class

    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=65)
    model = PPNet(cfg=cfg)
    rng = np.random.RandomState(11)
    images = [rng.rand(1, 96, 128, 3).astype(np.float32)
              for _ in range(3)]
    labels = [rng.randint(0, 4, size=(1, 96, 128)) for _ in range(3)]
    v = model.init(jax.random.PRNGKey(11), jnp.zeros((1, 65, 65, 3)))
    params, constants = v["params"], v.get("constants", {})
    pc = default_proto_class(6, 3)

    sync = WindowedSegEvaluator(model, 3, (65, 65), with_stats=True,
                                n_random_pixels=8, fused=True,
                                window_batch=3)
    defer = WindowedSegEvaluator(model, 3, (65, 65), with_stats=True,
                                 n_random_pixels=8, fused=True,
                                 window_batch=3, defer_sync=True)
    sync_stats = []
    for img, lab in zip(images, labels):
        o = sync.update(params, constants, pc, img, lab)
        sync_stats.append((o["topk_purity"], o["agree_counts"],
                           o["stat_windows"]))
    for img, lab in zip(images, labels):
        defer.update(params, constants, pc, img, lab)
    assert len(defer._pending) == 3
    defer_stats = defer.drain()
    assert not defer._pending
    assert sync.results() == defer.results()
    for (ts, as_, ns), (td, ad, nd) in zip(sync_stats, defer_stats):
        np.testing.assert_allclose(ts, td, rtol=1e-5)
        np.testing.assert_array_equal(as_, ad)
        assert ns == nd

    # results() drains implicitly when updates are still queued
    defer2 = WindowedSegEvaluator(model, 3, (65, 65), fused=True,
                                  window_batch=3, defer_sync=True)
    sync2 = WindowedSegEvaluator(model, 3, (65, 65), fused=True,
                                 window_batch=3)
    defer2.update(params, constants, pc, images[0], labels[0])
    sync2.update(params, constants, pc, images[0], labels[0])
    assert defer2.results() == sync2.results()
