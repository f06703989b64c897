"""End-to-end evaluation golden: reference eval loop in torch vs ours.

Runs the reference's complete eval-valid math
(reference segmentation/eval_valid.py:158-221: eval forward → per-sample
bilinear upsample of logits to annotation size → argmax → pixel
accuracy and per-class I/U with void-ignored union → mIoU) in torch on
the tiny PPNet whose weights are exported FROM the Flax model
(test_train_step_golden fixtures), and asserts our single-jit
inference fn (adlm_tpu.interpret.evaluate.make_inference_fn) produces
the same confusion counters and mIoU.

Together with the composed train-step golden this closes the loop:
identical weights → identical training losses/gradients AND identical
evaluation metrics, so mIoU parity no longer rests on synthetic-task
evidence alone.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from adlm_tpu.interpret.evaluate import make_inference_fn  # noqa: E402
from adlm_tpu.models.ppnet import default_proto_class  # noqa: E402

from test_train_step_golden import (  # noqa: E402
    N_CLASSES,
    N_PROTOS,
    _build_pair,
    _make_cfg,
)

# fp backend differences (XLA vs torch CPU) can flip an argmax where two
# class logits are within ~1e-6 — allow a handful of pixels out of the
# ~6k evaluated
TIE_BUDGET = 4


def _torch_reference_eval(tp, images, labels):
    """Literal re-implementation of eval_valid.py:158-221 counters."""
    B, H, W = labels.shape
    with torch.no_grad():
        outs = tp(torch.tensor(np.transpose(images, (0, 3, 1, 2))))
    logits, _ = outs[0]                      # (B, h, w, K) eval output
    logits = logits.permute(0, 3, 1, 2)
    cls_i = np.zeros(N_CLASSES, np.int64)
    cls_u = np.zeros(N_CLASSES, np.int64)
    correct = 0
    total = 0
    for b in range(B):
        lg = F.interpolate(logits[b:b + 1], size=(H, W), mode="bilinear",
                           align_corners=False)[0]
        pred = torch.argmax(lg, dim=0).numpy()
        ann = labels[b]
        correct += int(np.sum(((pred + 1) == ann) & (ann != 0)))
        total += int(np.sum(ann != 0))
        for c in range(N_CLASSES):
            pr = pred == c
            gt = ann == c + 1
            cls_i[c] += int(np.sum(pr & gt))
            # union ignores pixels where ground truth is void
            cls_u[c] += int(np.sum((pr | gt) & (ann != 0)))
    iou = {c: cls_i[c] * 100.0 / cls_u[c]
           for c in range(N_CLASSES) if cls_u[c] > 0}
    return cls_i, cls_u, correct, total, float(np.mean(list(iou.values())))


def test_eval_golden_counters_and_miou():
    cfg = _make_cfg()
    model, params, constants, tp = _build_pair(cfg, seed=3)
    tp.eval()

    rng = np.random.RandomState(7)
    B, H, W = 2, 49, 65                      # non-square, odd sizes
    images = rng.rand(B, H, W, 3).astype(np.float32)
    labels = rng.randint(0, N_CLASSES + 1, size=(B, H, W))
    labels[0, :5] = 0                        # a void-heavy stripe

    cls_i, cls_u, correct, total, miou_t = _torch_reference_eval(
        tp, images, labels)

    fn = make_inference_fn(model, N_CLASSES)
    out = fn(params, constants,
             default_proto_class(N_PROTOS, N_CLASSES),
             jnp.asarray(images), jnp.asarray(labels, jnp.int32))

    inter = np.asarray(out["intersection"])
    union = np.asarray(out["union"])
    assert int(out["total"]) == total        # void mask is exact
    assert abs(int(out["correct"]) - correct) <= TIE_BUDGET
    assert np.abs(inter - cls_i).sum() <= TIE_BUDGET, (inter, cls_i)
    assert np.abs(union - cls_u).sum() <= TIE_BUDGET, (union, cls_u)

    iou = {c: inter[c] * 100.0 / union[c]
           for c in range(N_CLASSES) if union[c] > 0}
    miou = float(np.mean(list(iou.values())))
    assert miou_t == pytest.approx(miou, abs=0.2)


def test_eval_golden_distance_maps():
    """The upsampled nearest-prototype map (the reference's
    eval_valid.py:171-174 statistic input) matches torch's
    F.interpolate + argmin on the same distances."""
    cfg = _make_cfg()
    model, params, constants, tp = _build_pair(cfg, seed=5)
    tp.eval()
    rng = np.random.RandomState(11)
    B, H, W = 1, 41, 57
    images = rng.rand(B, H, W, 3).astype(np.float32)

    with torch.no_grad():
        _, dist_t = tp(torch.tensor(np.transpose(images, (0, 3, 1, 2))))[0]
    up = F.interpolate(dist_t, size=(H, W), mode="bilinear",
                       align_corners=False)
    nearest_t = torch.argmin(up, dim=1).numpy()

    labels = np.ones((B, H, W), np.int32)
    fn = make_inference_fn(model, N_CLASSES, with_stats=True,
                           stats_upsampled=True)
    u = rng.rand(16).astype(np.float32)
    v = rng.rand(16).astype(np.float32)
    out = fn(params, constants,
             default_proto_class(N_PROTOS, N_CLASSES),
             jnp.asarray(images), jnp.asarray(labels),
             jnp.asarray(u), jnp.asarray(v))
    nearest = np.asarray(out["nearest_proto"])
    # identical up to fp argmin ties
    frac_equal = np.mean(nearest == nearest_t)
    assert frac_equal > 0.999, frac_equal


def test_eval_golden_msc_multiscale():
    """PASCAL-style eval: MSC runs the backbone at 1.0 + (0.5, 0.75),
    bilinearly upsamples the pyramid, takes the pixel-wise max of the
    FEATURE maps, and only then applies the prototype head (reference
    segmentation/utils.py:77-101 eval branch + model.py:164-175)."""
    cfg = _make_cfg(msc_scales=(0.5, 0.75))
    model, params, constants, tp = _build_pair(cfg, seed=9)
    tp.eval()
    rng = np.random.RandomState(13)
    B, H, W = 1, 65, 65
    images = rng.rand(B, H, W, 3).astype(np.float32)
    labels = rng.randint(0, N_CLASSES + 1, size=(B, H, W))

    with torch.no_grad():
        x = torch.tensor(np.transpose(images, (0, 3, 1, 2)))
        feats = tp.backbone(x)
        h, w = feats.shape[2], feats.shape[3]
        pyramid = [tp.backbone(F.interpolate(
            x, scale_factor=s, mode="bilinear", align_corners=False))
            for s in (0.5, 0.75)]
        interp = [F.interpolate(p, size=(h, w), mode="bilinear",
                                align_corners=False) for p in pyramid]
        feats = torch.max(torch.stack([feats] + interp), dim=0)[0]
        f = torch.sigmoid(feats)
        d = tp._ref_l2(f, tp.prototype_vectors, tp.ones)
        P = d.shape[1]
        sim = torch.log((d.permute(0, 2, 3, 1).reshape(-1, P) + 1.0)
                        / (d.permute(0, 2, 3, 1).reshape(-1, P) + 1e-4))
        logits = tp.last_layer(sim).reshape(1, h, w, N_CLASSES)
        logits = logits.permute(0, 3, 1, 2)
        up = F.interpolate(logits, size=(H, W), mode="bilinear",
                           align_corners=False)
        pred_t = torch.argmax(up, dim=1).numpy()

    fn = make_inference_fn(model, N_CLASSES)
    out = fn(params, constants,
             default_proto_class(N_PROTOS, N_CLASSES),
             jnp.asarray(images), jnp.asarray(labels, jnp.int32))
    pred = np.asarray(out["pred"])
    frac_equal = np.mean(pred == pred_t)
    assert frac_equal > 0.999, frac_equal
