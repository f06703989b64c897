"""Sliding-window (blockwise) full-resolution inference.

The reference carries vestigial sliding-window machinery
(window/margin infrastructure, reference dataset.py:114-116 and the
commented window call at segmentation/push.py:179-183) but always runs
whole images.  Here windowed inference is a first-class eval mode — the
memory-bounded alternative to spatial mesh sharding for inputs too
large to fit activations on one chip (SURVEY §5's "context-parallel
stand-in"):

* the image is covered by overlapping windows on a fixed grid (all
  windows the same size → ONE compiled program regardless of image
  size);
* logits are stitched by averaging overlaps (windows are
  cosine-weighted toward their centers to suppress boundary effects of
  the convs' zero padding);
* the output matches whole-image inference in the interior and differs
  only by boundary-context effects near window seams.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.ops.resize import resize_bilinear


def _window_grid(size: int, window: int, stride: int):
    """Start offsets covering [0, size) with the final window clamped."""
    if size <= window:
        return [0]
    starts = list(range(0, size - window + 1, stride))
    if starts[-1] != size - window:
        starts.append(size - window)
    return starts


def _norm_in_jit(patch, normalize):
    """(u8→f32)/255 − mean then /std — the same f32 op sequence as the
    host path (``SegmentationDataset.get_eval_item``), run on device so
    full-res windows ship as uint8 (4× less relay traffic — see
    ``dataset.supports_raw_eval``)."""
    mean, std = normalize
    x = patch.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(mean, jnp.float32)) \
        / jnp.asarray(std, jnp.float32)


def make_windowed_inference_fn(model: PPNet, window: Tuple[int, int],
                               overlap: float = 0.25,
                               normalize: Optional[Tuple] = None
                               ) -> Callable:
    """Returns ``fn(params, constants, image (1,H,W,3)) -> logits
    (1,H,W,K)`` running the model per window and stitching.

    ``normalize=(mean, std)`` moves input normalization INTO the
    per-window jit: the image arrives uint8 and each window is
    normalized on device.  Windows clamped at image edges are padded
    host-side and re-zeroed AFTER normalization via a validity mask, so
    the model sees exactly the zero padding the host-normalized f32
    path would have produced."""
    wh, ww = window
    stride_h = max(int(wh * (1.0 - overlap)), 1)
    stride_w = max(int(ww * (1.0 - overlap)), 1)

    # cosine taper: weight 1 at the center, ~0.05 at the border
    hy = 0.05 + 0.95 * jnp.sin(jnp.pi * (jnp.arange(wh) + 0.5) / wh)
    hx = 0.05 + 0.95 * jnp.sin(jnp.pi * (jnp.arange(ww) + 0.5) / ww)
    taper = (hy[:, None] * hx[None, :])[None, :, :, None]

    @jax.jit
    def window_fn(params, constants, patch, mask):
        if normalize is not None:
            patch = _norm_in_jit(patch, normalize) * mask
        logits, _ = model.apply({"params": params, "constants": constants},
                                patch, train=False,
                                return_distances=False)
        up = resize_bilinear(logits, (wh, ww))
        return up * taper, taper

    full_mask = jnp.ones((1, wh, ww, 1), jnp.float32)

    def fn(params, constants, image):
        B, H, W, _ = image.shape
        acc = np.zeros((B, H, W, model.cfg.num_classes), np.float32)
        norm = np.zeros((B, H, W, 1), np.float32)
        for sh in _window_grid(H, wh, stride_h):
            for sw in _window_grid(W, ww, stride_w):
                patch = image[:, sh:sh + wh, sw:sw + ww, :]
                ph, pw = patch.shape[1], patch.shape[2]
                mask = full_mask
                if (ph, pw) != (wh, ww):  # image smaller than window
                    pad = ((0, 0), (0, wh - ph), (0, ww - pw), (0, 0))
                    patch = jnp.pad(patch, pad)
                    m = np.zeros((1, wh, ww, 1), np.float32)
                    m[:, :ph, :pw] = 1.0
                    mask = jnp.asarray(m)
                logits_w, weight = window_fn(params, constants,
                                             jnp.asarray(patch), mask)
                acc[:, sh:sh + ph, sw:sw + pw] += np.asarray(
                    logits_w)[:, :ph, :pw]
                norm[:, sh:sh + ph, sw:sw + pw] += np.asarray(
                    weight)[:, :ph, :pw]
        return acc / np.maximum(norm, 1e-8)

    return fn


def make_windowed_stats_fn(model: PPNet,
                           normalize: Optional[Tuple] = None) -> Callable:
    """jitted per-window interpretability stats at grid resolution
    (the memory-bounded sibling of ``make_inference_fn(with_stats=True)``,
    reference eval_valid.py:191-214): per-window stat prediction,
    nearest-prototype map, and top-K purity at ``(B, n)`` random sample
    pixels passed as [0,1) floats.  ``normalize`` as in
    ``make_windowed_inference_fn`` (uint8 windows, on-device
    normalization, post-normalization zero re-pad via ``mask`` so
    edge-clamped windows see exactly the f32 path's zero padding)."""

    from adlm_tpu.interpret.evaluate import _topk_purity

    @jax.jit
    def fn(params, constants, proto_class, patch, mask, u, v):
        if normalize is not None:
            patch = _norm_in_jit(patch, normalize) * mask
        logits, dist = model.apply({"params": params,
                                    "constants": constants},
                                   patch, train=False,
                                   return_distances=True)
        stat_pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nearest = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        B, gh, gw = stat_pred.shape
        rows = jnp.minimum((u * gh).astype(jnp.int32), gh - 1)
        cols = jnp.minimum((v * gw).astype(jnp.int32), gw - 1)
        bidx = jnp.arange(B)[:, None]
        sample_d = dist[bidx, rows, cols]                    # (B, n, P)
        sample_pred = stat_pred[bidx, rows, cols]            # (B, n)
        topk = _topk_purity(sample_d, sample_pred, proto_class)
        return stat_pred, nearest, topk

    return fn


class WindowedSegEvaluator:
    """``SegEvaluator``-compatible eval driver over windowed inference
    (CLI: ``eval-valid --windowed WH,WW``).

    Metric semantics are identical to ``evaluate.make_inference_fn``
    (reference eval_valid.py:178-189); logits are resized to the label
    size before argmax when the input was resized for eval.

    With ``with_stats`` each window also yields grid-resolution
    nearest/purity statistics (reference eval_valid.py:191-214) from a
    second jitted per-window program whose buffers stay window-sized —
    the memory-bounded alternative to whole-image ``--stats``.
    Deviations from the whole-image mode, by construction: cells in
    window-overlap bands contribute once per covering window to the
    nearest-prototype counts, and purity pixels are drawn per window
    (``n_random_pixels`` each) rather than per image.

    ``normalize=(mean, std)`` selects the raw-uint8 transfer path:
    images arrive uint8 and every window is normalized on device (see
    ``make_windowed_inference_fn``).
    """

    def __init__(self, model: PPNet, num_classes: int,
                 window: Tuple[int, int], overlap: float = 0.25,
                 with_stats: bool = False, n_random_pixels: int = 100,
                 seed: int = 0, normalize: Optional[Tuple] = None):
        self.num_classes = num_classes
        self.fn = make_windowed_inference_fn(model, window, overlap,
                                             normalize=normalize)
        self.with_stats = with_stats
        self._stats_mask = jnp.ones((1,) + tuple(window) + (1,),
                                    jnp.float32)
        if with_stats:
            self.stats_fn = make_windowed_stats_fn(model,
                                                   normalize=normalize)
            self.window = window
            self.overlap = overlap
            self.n_random = n_random_pixels
            self.rng = np.random.RandomState(seed)
        self.reset()

    def reset(self):
        self.intersection = np.zeros(self.num_classes, np.int64)
        self.union = np.zeros(self.num_classes, np.int64)
        self.correct = 0
        self.total = 0

    def _stats_windows(self, params, constants, proto_class, images):
        """Run the stats program over the window grid; returns stacked
        per-window maps + the window-mean purity per image."""
        B, H, W, _ = images.shape
        wh, ww = self.window
        stride_h = max(int(wh * (1.0 - self.overlap)), 1)
        stride_w = max(int(ww * (1.0 - self.overlap)), 1)
        preds, nearests, topks = [], [], []
        for sh in _window_grid(H, wh, stride_h):
            for sw in _window_grid(W, ww, stride_w):
                patch = images[:, sh:sh + wh, sw:sw + ww, :]
                ph, pw = patch.shape[1], patch.shape[2]
                mask = self._stats_mask
                if (ph, pw) != (wh, ww):
                    patch = np.pad(patch, ((0, 0), (0, wh - ph),
                                           (0, ww - pw), (0, 0)))
                    m = np.zeros((1, wh, ww, 1), np.float32)
                    m[:, :ph, :pw] = 1.0
                    mask = jnp.asarray(m)
                u = jnp.asarray(self.rng.random_sample(
                    (B, self.n_random)), jnp.float32)
                v = jnp.asarray(self.rng.random_sample(
                    (B, self.n_random)), jnp.float32)
                sp, nr, tk = self.stats_fn(params, constants, proto_class,
                                           jnp.asarray(patch), mask, u, v)
                preds.append(np.asarray(sp))
                nearests.append(np.asarray(nr))
                topks.append(np.asarray(tk))
        return (np.concatenate(preds), np.concatenate(nearests),
                np.mean(topks, axis=0), len(preds))

    def update(self, params, constants, proto_class, images, labels
               ) -> dict:
        labels = np.asarray(labels)
        images = np.asarray(images)
        logits = self.fn(params, constants, images)
        H, W = labels.shape[1], labels.shape[2]
        if logits.shape[1:3] != (H, W):
            logits = np.asarray(resize_bilinear(jnp.asarray(logits),
                                                (H, W)))
        pred = np.argmax(logits, axis=-1)
        valid = labels > 0
        gt = np.clip(labels.astype(np.int64) - 1, 0, self.num_classes - 1)
        agree = valid & (pred == gt)
        self.correct += int(np.sum(agree))
        self.total += int(np.sum(valid))
        C = self.num_classes
        inter = np.bincount(gt[agree], minlength=C)
        # a valid pixel joins union[pred] and union[gt]; subtract the
        # double count where they coincide
        union = (np.bincount(pred[valid], minlength=C)
                 + np.bincount(gt[valid], minlength=C) - inter)
        self.intersection += inter
        self.union += union
        out = {"pred": pred, "intersection": inter, "union": union}
        if self.with_stats:
            sp, nr, topk, n_wins = self._stats_windows(
                params, constants, proto_class, images)
            B = images.shape[0]
            gh, gw = sp.shape[1], sp.shape[2]
            # image-major stacking so CLI tail-padding slices
            # ([:n_real·n_wins]) drop exactly the padded images
            out["stat_pred"] = (sp.reshape(n_wins, B, gh, gw)
                                .transpose(1, 0, 2, 3)
                                .reshape(n_wins * B, gh, gw))
            out["nearest_proto"] = (nr.reshape(n_wins, B, gh, gw)
                                    .transpose(1, 0, 2, 3)
                                    .reshape(n_wins * B, gh, gw))
            out["topk_purity"] = topk                        # (B, P)
            out["stat_windows"] = n_wins
        return out

    def results(self) -> dict:
        from adlm_tpu.interpret.evaluate import mean_iou_from_confusion
        miou, ious = mean_iou_from_confusion(self.intersection, self.union)
        acc = self.correct * 100.0 / max(self.total, 1)
        return {"mean_iou": miou, "iou_per_class": ious,
                "pixel_accuracy": acc}
