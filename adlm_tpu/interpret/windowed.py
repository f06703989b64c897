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
  only by boundary-context effects near window seams;
* with ``--stats`` the SAME per-window program also emits the
  grid-resolution interpretability statistics (one forward per window,
  not two).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.ops.normalize import normalize_in_jit
from adlm_tpu.ops.resize import resize_bilinear


def _window_grid(size: int, window: int, stride: int):
    """Start offsets covering [0, size) with the final window clamped."""
    if size <= window:
        return [0]
    starts = list(range(0, size - window + 1, stride))
    if starts[-1] != size - window:
        starts.append(size - window)
    return starts


def _strides(window: Tuple[int, int], overlap: float) -> Tuple[int, int]:
    wh, ww = window
    return (max(int(wh * (1.0 - overlap)), 1),
            max(int(ww * (1.0 - overlap)), 1))


def _stitched_metrics(canvas: jnp.ndarray, norm: jnp.ndarray,
                      labels: jnp.ndarray, num_classes: int) -> dict:
    """Canvas→metrics epilogue shared by the fused whole-grid program
    and the per-window evaluator's finish jit (ONE definition so the
    two paths cannot drift): normalize the taper-weighted canvas,
    resize to label resolution if needed, argmax, then the void-masked
    per-class I/U and pixel-accuracy counters (same formulas as
    interpret/evaluate.py; reference eval_valid.py:140-165)."""
    logits = canvas / jnp.maximum(norm, 1e-8)
    H, W = labels.shape[1], labels.shape[2]
    if logits.shape[1:3] != (H, W):
        logits = resize_bilinear(logits, (H, W))
    pred = jnp.argmax(logits, axis=-1)
    lab = labels.astype(jnp.int32)
    valid = lab > 0
    gt = jnp.clip(lab - 1, 0, num_classes - 1)
    pred1 = jax.nn.one_hot(pred, num_classes, dtype=jnp.int32)
    gt1 = jax.nn.one_hot(gt, num_classes, dtype=jnp.int32) * \
        valid[..., None].astype(jnp.int32)
    return {"pred": pred,
            "intersection": jnp.sum(pred1 * gt1, axis=(0, 1, 2)),
            "union": jnp.sum(((pred1 + gt1) > 0) & valid[..., None],
                             axis=(0, 1, 2)),
            "correct": jnp.sum(valid & (pred == gt)),
            "total": jnp.sum(valid)}


def _make_window_program(model: PPNet, window: Tuple[int, int],
                         with_stats: bool,
                         normalize: Optional[Tuple]) -> Callable:
    """ONE jitted program per window: stitched-logits contribution and
    (with ``with_stats``) the grid-resolution statistics from the same
    forward — the stats never pay a second backbone pass.

    Signature: ``fn(params, constants, proto_class, patch, mask,
    valid_gh, valid_gw, u, v)`` →
    ``(up·taper, taper[, stat_pred, nearest, topk])``.

    ``normalize=(mean, std)`` moves input normalization INTO the jit:
    windows arrive uint8 and are normalized on device, then re-zeroed
    via ``mask`` so edge-clamped windows see exactly the zero padding
    the host-normalized f32 path would have produced.

    ``valid_gh``/``valid_gw`` are the real (unpadded) extents of the
    stats grid for edge-clamped windows: pad-only grid cells get
    ``stat_pred = -1`` (excluded from nearest-prototype counts — the
    whole-image path never produces them) and the ``(u, v)`` purity
    sample pixels are scaled into the valid region only.
    """
    wh, ww = window

    # cosine taper: weight 1 at the center, ~0.05 at the border
    hy = 0.05 + 0.95 * jnp.sin(jnp.pi * (jnp.arange(wh) + 0.5) / wh)
    hx = 0.05 + 0.95 * jnp.sin(jnp.pi * (jnp.arange(ww) + 0.5) / ww)
    taper = (hy[:, None] * hx[None, :])[None, :, :, None]

    from adlm_tpu.interpret.evaluate import _topk_purity, agreement_counts

    @jax.jit
    def fn(params, constants, proto_class, patch, mask,
           valid_gh, valid_gw, u, v):
        if normalize is not None:
            patch = normalize_in_jit(patch, normalize) * mask
        logits, dist = model.apply(
            {"params": params, "constants": constants}, patch,
            train=False, return_distances=with_stats)
        up = resize_bilinear(logits, (wh, ww))
        outs = (up * taper, taper)
        if not with_stats:
            return outs

        stat_pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nearest = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        B, gh, gw = stat_pred.shape
        grid_ok = (jnp.arange(gh)[:, None] < valid_gh) & \
            (jnp.arange(gw)[None, :] < valid_gw)
        stat_pred = jnp.where(grid_ok[None], stat_pred, -1)
        rows = jnp.minimum((u * valid_gh).astype(jnp.int32), valid_gh - 1)
        cols = jnp.minimum((v * valid_gw).astype(jnp.int32), valid_gw - 1)
        bidx = jnp.arange(B)[:, None]
        sample_d = dist[bidx, rows, cols]                    # (B, n, P)
        sample_pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)[
            bidx, rows, cols]                                # (B, n)
        topk = _topk_purity(sample_d, sample_pred, proto_class)
        # per-window (B, P) device-side agreement counts (pad cells
        # carry stat_pred = −1 and never match) — the host accumulates
        # these tiny vectors via update_counts
        agree = agreement_counts(nearest, stat_pred, proto_class,
                                 chunk=int(proto_class.shape[0]))
        return outs + (stat_pred, nearest, topk, agree)

    return fn


def _make_fused_window_program(model: PPNet, window: Tuple[int, int],
                               num_classes: int, with_stats: bool,
                               normalize: Optional[Tuple],
                               window_batch: int) -> Callable:
    """The WHOLE windowed evaluation of a batch in ONE jit call.

    The per-window driver (``_make_window_program`` + host loop) pays
    one host→device patch upload (~3 MB) and two dispatches per window
    — through the remote relay that is ~75 ms + 60 ms for ~3 ms of
    window compute, which is why windowed eval measured 0.91 img/s
    (PERF.md round 3).  This program instead:

    * takes the full image ONCE (uint8 when ``normalize`` is set) and
      slices windows on device (``dynamic_slice`` at traced offsets);
    * runs the model over ``window_batch`` windows at a time as one
      batched forward (MXU-friendly), inside a ``lax.scan`` over window
      chunks — activations stay window-sized, preserving the mode's
      memory-bounded purpose;
    * accumulates the cosine-tapered logits into an on-device canvas
      and finishes with pred + void-masked I/U counters, so ONE
      dispatch and one image upload cover the entire grid.

    Offsets are traced values: one compiled program serves every image
    size with the same (B, H, W, n_chunks) geometry.  Windows must lie
    fully inside the image (the caller falls back to the per-window
    path for images smaller than the window).  Zero-``valid`` entries
    (padding to a full final chunk) contribute nothing: their taper
    weight is zeroed and their ``stat_pred`` is −1.

    Returns ``fn(params, constants, proto_class, image, labels,
    offsets (n_chunks, wb, 2) i32, valid (n_chunks, wb) f32,
    u, v (n_chunks, wb, B, n)) → dict`` with the same keys as the
    per-window driver's accumulated outputs (stats maps stacked
    (n_chunks·wb, B, gh, gw)).
    """
    wh, ww = window
    wb = window_batch
    hy = 0.05 + 0.95 * jnp.sin(jnp.pi * (jnp.arange(wh) + 0.5) / wh)
    hx = 0.05 + 0.95 * jnp.sin(jnp.pi * (jnp.arange(ww) + 0.5) / ww)
    taper = (hy[:, None] * hx[None, :])[None, :, :, None]  # (1,wh,ww,1)

    from adlm_tpu.interpret.evaluate import _topk_purity, agreement_counts

    @jax.jit
    def fn(params, constants, proto_class, image, labels, offsets,
           valid, u, v):
        image = normalize_in_jit(image, normalize)
        B, H, W = image.shape[0], image.shape[1], image.shape[2]
        K = model.cfg.num_classes
        canvas0 = jnp.zeros((B, H, W, K), jnp.float32)
        norm0 = jnp.zeros((B, H, W, 1), jnp.float32)
        variables = {"params": params, "constants": constants}

        def chunk_body(carry, xs):
            canvas, norm = carry
            offs, val, uu, vv = xs  # (wb,2) (wb,) (wb,B,n) (wb,B,n)

            def get_patch(o):
                return jax.lax.dynamic_slice(
                    image, (0, o[0], o[1], 0), (B, wh, ww, 3))

            patches = jax.vmap(get_patch)(offs)       # (wb,B,wh,ww,3)
            flat = patches.reshape(wb * B, wh, ww, 3)
            logits, dist = model.apply(variables, flat, train=False,
                                       return_distances=with_stats)
            up = resize_bilinear(logits, (wh, ww))    # (wb·B,wh,ww,K)
            up = (up.reshape(wb, B, wh, ww, K) * taper[None]
                  * val[:, None, None, None, None])

            def acc_one(i, cn):
                cv, nm = cn
                o = offs[i]
                ch = jax.lax.dynamic_slice(cv, (0, o[0], o[1], 0),
                                           (B, wh, ww, K))
                cv = jax.lax.dynamic_update_slice(cv, ch + up[i],
                                                  (0, o[0], o[1], 0))
                nh = jax.lax.dynamic_slice(nm, (0, o[0], o[1], 0),
                                           (B, wh, ww, 1))
                nm = jax.lax.dynamic_update_slice(
                    nm, nh + jnp.broadcast_to(taper * val[i],
                                              (B, wh, ww, 1)),
                    (0, o[0], o[1], 0))
                return cv, nm

            canvas, norm = jax.lax.fori_loop(0, wb, acc_one,
                                             (canvas, norm))
            ys = ()
            if with_stats:
                gh, gw = logits.shape[1], logits.shape[2]
                sp = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                nr = jnp.argmin(dist, axis=-1).astype(jnp.int32)
                sp = sp.reshape(wb, B, gh, gw)
                nr = nr.reshape(wb, B, gh, gw)
                # padded windows: stat_pred −1 matches nothing
                sp = jnp.where(val[:, None, None, None] > 0, sp, -1)
                rows = jnp.minimum((uu * gh).astype(jnp.int32), gh - 1)
                cols = jnp.minimum((vv * gw).astype(jnp.int32), gw - 1)
                widx = jnp.arange(wb)[:, None, None]
                bidx = jnp.arange(B)[None, :, None]
                d5 = dist.reshape(wb, B, gh, gw, -1)
                sample_d = d5[widx, bidx, rows, cols]     # (wb,B,n,P)
                sample_p = sp[widx, bidx, rows, cols]     # (wb,B,n)
                topk = jax.vmap(_topk_purity,
                                in_axes=(0, 0, None))(sample_d, sample_p,
                                                      proto_class)
                agree = jax.vmap(agreement_counts,
                                 in_axes=(0, 0, None))(nr, sp, proto_class)
                ys = (sp, nr, topk, agree)
            return (canvas, norm), ys

        (canvas, norm), ys = jax.lax.scan(chunk_body, (canvas0, norm0),
                                          (offsets, valid, u, v))

        out = _stitched_metrics(canvas, norm, labels, num_classes)
        # all counters as ONE (2C+2,) vector so a deferred-sync caller
        # can drain an entire pipelined batch of grid dispatches with a
        # single host fetch (each fetch is a ~30 ms relay round trip)
        out["counters"] = jnp.concatenate([
            out["intersection"].astype(jnp.int32),
            out["union"].astype(jnp.int32),
            out["correct"].reshape(1).astype(jnp.int32),
            out["total"].reshape(1).astype(jnp.int32)])
        if with_stats:
            sp, nr, topk, agree = ys
            out["stat_pred"] = sp.reshape(-1, *sp.shape[2:])
            out["nearest_proto"] = nr.reshape(-1, *nr.shape[2:])
            out["topk_purity"] = topk.reshape(-1, *topk.shape[2:])
            out["agree_counts"] = agree.reshape(-1, *agree.shape[2:])
        return out

    return fn


def make_windowed_inference_fn(model: PPNet, window: Tuple[int, int],
                               overlap: float = 0.25,
                               normalize: Optional[Tuple] = None
                               ) -> Callable:
    """Returns ``fn(params, constants, image (1,H,W,3)) -> logits
    (1,H,W,K)`` running the model per window and stitching.

    ``normalize=(mean, std)`` moves input normalization INTO the
    per-window jit: the image arrives uint8 and each window is
    normalized on device (see ``_make_window_program``)."""
    wh, ww = window
    stride_h, stride_w = _strides(window, overlap)
    window_fn = _make_window_program(model, window, False, normalize)
    full_mask = jnp.ones((1, wh, ww, 1), jnp.float32)
    zero = jnp.zeros((1, 1), jnp.float32)
    one = jnp.asarray(1, jnp.int32)

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
                logits_w, weight = window_fn(
                    params, constants, zero[0], jnp.asarray(patch), mask,
                    one, one, zero, zero)
                acc[:, sh:sh + ph, sw:sw + pw] += np.asarray(
                    logits_w)[:, :ph, :pw]
                norm[:, sh:sh + ph, sw:sw + pw] += np.asarray(
                    weight)[:, :ph, :pw]
        return acc / np.maximum(norm, 1e-8)

    return fn


class WindowedSegEvaluator:
    """``SegEvaluator``-compatible eval driver over windowed inference
    (CLI: ``eval-valid --windowed WH,WW``).

    Metric semantics are identical to ``evaluate.make_inference_fn``
    (reference eval_valid.py:178-189); logits are resized to the label
    size before argmax when the input was resized for eval.

    With ``with_stats`` the SAME per-window forward also yields the
    grid-resolution nearest/purity statistics (reference
    eval_valid.py:191-214) — buffers stay window-sized and the stats
    cost no extra backbone pass.  Deviations from the whole-image mode,
    by construction: cells in window-overlap bands contribute once per
    covering window to the nearest-prototype counts, and purity pixels
    are drawn per window (``n_random_pixels`` each) rather than per
    image.  Pad-only grid cells of edge-clamped windows are excluded
    (``stat_pred = -1`` never matches a prototype class) and purity
    pixels are confined to the valid region.

    ``normalize=(mean, std)`` selects the raw-uint8 transfer path:
    images arrive uint8 and every window is normalized on device (see
    ``_make_window_program``).

    ``device_stitch`` keeps the stitched-logits canvas ON DEVICE:
    window contributions accumulate into a donated (B, H, W, K) buffer
    via dynamic-update-slice (window offsets are traced scalars — one
    compiled program for every window position) and a final jit
    computes pred + confusion counters, so per-window logits blocks
    (~20 MB each at 512² windows) never cross to the host.  Default
    (None) auto-enables when the canvas fits comfortably on device
    (≤ ~200 MB, the remote-relay buffer-margin rule — CLAUDE.md) and
    the image is at least window-sized; the host-stitching path is the
    fallback and the numerical reference.
    """

    def __init__(self, model: PPNet, num_classes: int,
                 window: Tuple[int, int], overlap: float = 0.25,
                 with_stats: bool = False, n_random_pixels: int = 100,
                 seed: int = 0, normalize: Optional[Tuple] = None,
                 device_stitch: Optional[bool] = None,
                 keep_stat_maps: bool = True,
                 fused: Optional[bool] = None, window_batch: int = 8,
                 defer_sync: bool = False):
        self.num_classes = num_classes
        self.window = window
        self.overlap = overlap
        self.with_stats = with_stats
        # defer_sync: don't fetch the per-update counters to the host
        # inside update() — queue the (tiny) device arrays and drain
        # them in results()/drain().  This lets a caller enqueue several
        # fused grid dispatches back-to-back so the ~30 ms relay
        # dispatch latency and the device compute overlap (the same
        # pipelined-dispatch discipline every other eval path uses —
        # CLAUDE.md).  Counter VALUES are bit-identical either way;
        # only the fetch time moves.  Stats maps require the immediate
        # path (update's return value carries host arrays there).
        self.defer_sync = defer_sync
        self._pending = []
        # the (B, P) agree_counts / topk_purity vectors are all the CLI
        # accumulator needs; keep_stat_maps=False skips fetching and
        # stacking the per-window grid maps (they stay device-side)
        self.keep_stat_maps = keep_stat_maps
        self.fn = _make_window_program(model, window, with_stats,
                                       normalize)
        # fused single-dispatch mode (auto when the image is at least
        # window-sized and the canvas fits the device-buffer margin):
        # one image upload + one jit per batch instead of 2 dispatches
        # + a ~3 MB upload per window — see _make_fused_window_program
        self.fused = fused
        self.window_batch = max(1, window_batch)
        self.fused_fn = _make_fused_window_program(
            model, window, num_classes, with_stats, normalize,
            self.window_batch)
        self.model = model
        self.n_random = n_random_pixels
        self.rng = np.random.RandomState(seed)
        self._full_mask = jnp.ones((1,) + tuple(window) + (1,),
                                   jnp.float32)
        self._zero_uv = jnp.zeros((1, 1), jnp.float32)
        self.device_stitch = device_stitch
        self._make_stitch_fns()
        self.reset()

    def _make_stitch_fns(self):
        wh, ww = self.window
        K = self.model.cfg.num_classes
        NC = self.num_classes

        def acc(canvas, norm, contrib, taper, sh, sw):
            B = canvas.shape[0]
            ch = jax.lax.dynamic_slice(canvas, (0, sh, sw, 0),
                                       (B, wh, ww, K))
            nh = jax.lax.dynamic_slice(norm, (0, sh, sw, 0),
                                       (B, wh, ww, 1))
            canvas = jax.lax.dynamic_update_slice(canvas, ch + contrib,
                                                  (0, sh, sw, 0))
            norm = jax.lax.dynamic_update_slice(
                norm, nh + jnp.broadcast_to(taper, (B, wh, ww, 1)),
                (0, sh, sw, 0))
            return canvas, norm

        self._acc_fn = jax.jit(acc, donate_argnums=(0, 1))

        def finish(canvas, norm, labels):
            return _stitched_metrics(canvas, norm, labels, NC)

        self._finish_fn = jax.jit(finish)

    def reset(self):
        self.intersection = np.zeros(self.num_classes, np.int64)
        self.union = np.zeros(self.num_classes, np.int64)
        self.correct = 0
        self.total = 0
        self._pending = []

    def drain(self):
        """Fold queued defer_sync updates into the host counters (the
        single host sync point of the pipelined path).  Returns the
        drained per-update stats aggregates ``[(topk (B,P), agree
        (B,P), n_windows), ...]`` when stats were on, else []."""
        if not self._pending:
            return []
        # one stack dispatch + one fetch for the whole queue (vs a
        # ~30 ms relay round trip per counter per update)
        packed = np.asarray(jnp.stack(
            [p["counters"] for p in self._pending]), np.int64)
        C = self.num_classes
        self.intersection += packed[:, :C].sum(axis=0)
        self.union += packed[:, C:2 * C].sum(axis=0)
        self.correct += int(packed[:, 2 * C].sum())
        self.total += int(packed[:, 2 * C + 1].sum())
        stats = []
        for pend in self._pending:
            if "topk_purity" in pend:
                N = pend["stat_windows"]
                stats.append((np.asarray(pend["topk_purity"])[:N]
                              .mean(axis=0),
                              np.asarray(pend["agree_counts"])[:N]
                              .sum(axis=0), N))
        self._pending = []
        return stats

    def _grid_extent(self, ph: int, pw: int, gh: int, gw: int
                     ) -> Tuple[int, int]:
        """Valid stats-grid extent of a window whose real content is
        (ph, pw) inside the padded (wh, ww) frame."""
        wh, ww = self.window
        return (max(1, math.ceil(ph * gh / wh)),
                max(1, math.ceil(pw * gw / ww)))

    def _update_fused(self, params, constants, proto_class, images,
                      labels, stride_h: int, stride_w: int) -> dict:
        """Single-dispatch path: the whole window grid in one jit (see
        _make_fused_window_program).  ``images`` may already live on
        device (the CLI's device_prefetch) — it is not bounced."""
        wh, ww = self.window
        B, H, W = images.shape[0], images.shape[1], images.shape[2]
        offs = [(sh, sw) for sh in _window_grid(H, wh, stride_h)
                for sw in _window_grid(W, ww, stride_w)]
        N = len(offs)
        wb = self.window_batch
        n_chunks = -(-N // wb)
        pad = n_chunks * wb - N
        offs_a = np.asarray(offs + [(0, 0)] * pad,
                            np.int32).reshape(n_chunks, wb, 2)
        valid = np.zeros((n_chunks * wb,), np.float32)
        valid[:N] = 1.0
        valid = valid.reshape(n_chunks, wb)
        if self.with_stats:
            # identical draw ORDER to the per-window driver (u then v
            # per window) so both paths sample the same purity pixels
            u = np.zeros((n_chunks * wb, B, self.n_random), np.float32)
            v = np.zeros_like(u)
            for k in range(N):
                u[k] = self.rng.random_sample((B, self.n_random))
                v[k] = self.rng.random_sample((B, self.n_random))
            u = u.reshape(n_chunks, wb, B, self.n_random)
            v = v.reshape(n_chunks, wb, B, self.n_random)
        else:
            u = v = np.zeros((n_chunks, wb, 1, 1), np.float32)

        out = self.fused_fn(params, constants, jnp.asarray(proto_class),
                            jnp.asarray(images), jnp.asarray(labels),
                            jnp.asarray(offs_a), jnp.asarray(valid),
                            jnp.asarray(u), jnp.asarray(v))
        if self.defer_sync:
            # queue the packed (2C+2,) device counter vector; drain()
            # / results() fetches the whole queue in ONE host round
            # trip so back-to-back grid dispatches pipeline through
            # the relay.  pred stays a device array.
            pend = {"counters": out["counters"]}
            if self.with_stats:
                pend["topk_purity"] = out["topk_purity"]
                pend["agree_counts"] = out["agree_counts"]
                pend["stat_windows"] = N
            self._pending.append(pend)
            return {"pred": out["pred"],
                    "intersection": out["intersection"],
                    "union": out["union"]}
        inter = np.asarray(out["intersection"], np.int64)
        union = np.asarray(out["union"], np.int64)
        self.intersection += inter
        self.union += union
        self.correct += int(out["correct"])
        self.total += int(out["total"])
        out_d = {"pred": out["pred"], "intersection": inter,
                 "union": union}
        if self.with_stats:
            if self.keep_stat_maps:
                sp = np.asarray(out["stat_pred"])[:N]   # (N, B, gh, gw)
                nr = np.asarray(out["nearest_proto"])[:N]
                gh, gw = sp.shape[2], sp.shape[3]
                out_d["stat_pred"] = (sp.transpose(1, 0, 2, 3)
                                      .reshape(N * B, gh, gw))
                out_d["nearest_proto"] = (nr.transpose(1, 0, 2, 3)
                                          .reshape(N * B, gh, gw))
            out_d["topk_purity"] = np.asarray(
                out["topk_purity"])[:N].mean(axis=0)     # (B, P)
            out_d["agree_counts"] = np.asarray(
                out["agree_counts"])[:N].sum(axis=0)     # (B, P)
            out_d["stat_windows"] = N
        return out_d

    def update(self, params, constants, proto_class, images, labels
               ) -> dict:
        wh, ww = self.window
        stride_h, stride_w = _strides(self.window, self.overlap)
        B, H, W = images.shape[0], images.shape[1], images.shape[2]
        K = self.model.cfg.num_classes
        whole = H >= wh and W >= ww
        use_fused = self.fused
        if use_fused is None:
            use_fused = (whole and
                         B * H * W * K * 4 <= 200 * 1024 * 1024)
        if use_fused and whole:
            return self._update_fused(params, constants, proto_class,
                                      images, labels, stride_h, stride_w)
        labels = np.asarray(labels)
        images = np.asarray(images)
        use_dev = self.device_stitch
        if use_dev is None:
            # auto: canvas within the device-buffer margin and no
            # padded (smaller-than-window) images
            use_dev = (whole and
                       B * H * W * K * 4 <= 200 * 1024 * 1024)
        if use_dev:
            canvas = jnp.zeros((B, H, W, K), jnp.float32)
            dnorm = jnp.zeros((B, H, W, 1), jnp.float32)
        else:
            acc = np.zeros((B, H, W, K), np.float32)
            norm = np.zeros((B, H, W, 1), np.float32)
        preds, nearests, topks, agrees = [], [], [], []

        # ONE pass over the window grid: stitched logits AND (with
        # stats) the per-window statistics from the same forward
        for sh in _window_grid(H, wh, stride_h):
            for sw in _window_grid(W, ww, stride_w):
                patch = images[:, sh:sh + wh, sw:sw + ww, :]
                ph, pw = patch.shape[1], patch.shape[2]
                mask = self._full_mask
                if (ph, pw) != (wh, ww):
                    patch = np.pad(patch, ((0, 0), (0, wh - ph),
                                           (0, ww - pw), (0, 0)))
                    m = np.zeros((1, wh, ww, 1), np.float32)
                    m[:, :ph, :pw] = 1.0
                    mask = jnp.asarray(m)
                if self.with_stats:
                    u = jnp.asarray(self.rng.random_sample(
                        (B, self.n_random)), jnp.float32)
                    v = jnp.asarray(self.rng.random_sample(
                        (B, self.n_random)), jnp.float32)
                else:
                    u = v = self._zero_uv
                # grid extent needs the grid dims; infer lazily from the
                # first call's stat_pred shape (static per window size)
                out = self.fn(params, constants, jnp.asarray(proto_class),
                              jnp.asarray(patch), mask,
                              *self._valid_extents(ph, pw, params,
                                                   constants, proto_class),
                              u, v)
                logits_w, weight = out[0], out[1]
                if use_dev:
                    # accumulate on device: donated canvas, traced
                    # offsets — no per-window logits fetch
                    canvas, dnorm = self._acc_fn(
                        canvas, dnorm, logits_w, weight,
                        jnp.asarray(sh, jnp.int32),
                        jnp.asarray(sw, jnp.int32))
                else:
                    acc[:, sh:sh + ph, sw:sw + pw] += np.asarray(
                        logits_w)[:, :ph, :pw]
                    norm[:, sh:sh + ph, sw:sw + pw] += np.asarray(
                        weight)[:, :ph, :pw]
                if self.with_stats:
                    if self.keep_stat_maps:
                        preds.append(np.asarray(out[2]))
                        nearests.append(np.asarray(out[3]))
                    topks.append(np.asarray(out[4]))
                    agrees.append(np.asarray(out[5]))

        if use_dev:
            # final metrics in ONE jit; only counters cross to the
            # host (pred stays a device array — callers that need the
            # map, e.g. eval-test PNG writing, np.asarray it)
            fout = self._finish_fn(canvas, dnorm, jnp.asarray(labels))
            inter = np.asarray(fout["intersection"], np.int64)
            union = np.asarray(fout["union"], np.int64)
            self.correct += int(fout["correct"])
            self.total += int(fout["total"])
            self.intersection += inter
            self.union += union
            out_d = {"pred": fout["pred"], "intersection": inter,
                     "union": union}
        else:
            logits = acc / np.maximum(norm, 1e-8)
            if logits.shape[1:3] != labels.shape[1:3]:
                logits = np.asarray(resize_bilinear(
                    jnp.asarray(logits),
                    (labels.shape[1], labels.shape[2])))
            pred = np.argmax(logits, axis=-1)
            valid = labels > 0
            gt = np.clip(labels.astype(np.int64) - 1,
                         0, self.num_classes - 1)
            agree = valid & (pred == gt)
            self.correct += int(np.sum(agree))
            self.total += int(np.sum(valid))
            C = self.num_classes
            inter = np.bincount(gt[agree], minlength=C)
            # a valid pixel joins union[pred] and union[gt]; subtract
            # the double count where they coincide
            union = (np.bincount(pred[valid], minlength=C)
                     + np.bincount(gt[valid], minlength=C) - inter)
            self.intersection += inter
            self.union += union
            out_d = {"pred": pred, "intersection": inter, "union": union}
        if self.with_stats:
            n_wins = len(topks)
            if self.keep_stat_maps:
                sp = np.concatenate(preds)
                nr = np.concatenate(nearests)
                gh, gw = sp.shape[1], sp.shape[2]
                # image-major stacking so tail-padding slices
                # ([:n_real·n_wins]) drop exactly the padded images
                out_d["stat_pred"] = (sp.reshape(n_wins, B, gh, gw)
                                      .transpose(1, 0, 2, 3)
                                      .reshape(n_wins * B, gh, gw))
                out_d["nearest_proto"] = (nr.reshape(n_wins, B, gh, gw)
                                          .transpose(1, 0, 2, 3)
                                          .reshape(n_wins * B, gh, gw))
            out_d["topk_purity"] = np.mean(topks, axis=0)    # (B, P)
            # summed over windows; equals bincounting the stacked maps
            out_d["agree_counts"] = np.sum(agrees, axis=0)   # (B, P)
            out_d["stat_windows"] = n_wins
        return out_d

    def _valid_extents(self, ph: int, pw: int, params, constants,
                       proto_class):
        """(valid_gh, valid_gw) as traced scalars; the stats grid dims
        come from the model's output stride (computed once)."""
        if not hasattr(self, "_grid_hw"):
            wh, ww = self.window
            shapes = jax.eval_shape(
                lambda p, c: self.model.apply(
                    {"params": p, "constants": c},
                    jnp.zeros((1, wh, ww, 3), jnp.float32), train=False,
                    return_distances=True)[1],
                params, constants)
            self._grid_hw = (shapes.shape[1], shapes.shape[2])
        gh, gw = self._grid_hw
        vgh, vgw = self._grid_extent(ph, pw, gh, gw)
        return (jnp.asarray(vgh, jnp.int32), jnp.asarray(vgw, jnp.int32))

    def results(self) -> dict:
        if self._pending:
            self.drain()
        from adlm_tpu.interpret.evaluate import mean_iou_from_confusion
        miou, ious = mean_iou_from_confusion(self.intersection, self.union)
        acc = self.correct * 100.0 / max(self.total, 1)
        return {"mean_iou": miou, "iou_per_class": ious,
                "pixel_accuracy": acc}
