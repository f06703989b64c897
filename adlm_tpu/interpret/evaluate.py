"""Segmentation evaluation: mIoU / pixel accuracy + prototype stats.

Reference: ``segmentation/eval_valid.py`` — batched full-image forward,
bilinear upsample of logits (and distances) to label size, pixel
accuracy and per-class intersection/union ignoring void
(eval_valid.py:158-219), plus interpretability statistics
(nearest-prototype counts :191-198, top-K same-class purity :200-214)
and example prediction/nearest-prototype overlays (:270-343).

TPU-first: the forward, upsample, argmax, confusion accumulation, and
all prototype statistics run in ONE jit call; only a few small count
vectors (plus, in stats mode, two int maps) return to the host per
batch.  This is the headline-benchmark path: full-resolution 2048×1024
inference never round-trips logits.

Two stats resolutions are supported:

* grid (default): nearest-prototype / purity computed at the model's
  output grid — the same statistic family, ~64× cheaper at 2048×1024.
* upsampled (``stats_upsampled=True``): bit-parity with the reference,
  which bilinearly upsamples the (B,h,w,P) distance maps to label size
  before the argmin / random-pixel sampling (eval_valid.py:172-214).
  The full-res argmin runs as a chunked scan over prototypes so the
  (H·W·P) tensor never materializes.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.ops.resize import resize_bilinear
from adlm_tpu.ops.normalize import normalize_in_jit


def _upsampled_nearest_integer(dist: jnp.ndarray, sy: int, sx: int
                               ) -> jnp.ndarray:
    """Integer-scale fast path for ``upsampled_nearest``.

    A bilinear upsample by integer factors (sy, sx) with half-pixel
    centers touches exactly 4 grid neighbours per output pixel, with
    weights that depend only on the output pixel's PHASE
    (dy, dx) = (o mod sy, o mod sx).  So instead of materializing the
    upsampled maps (``jax.image.resize`` lowers to dense per-axis
    matmuls — measured 2.1 s/batch in f32 at the flagship shape because
    f32 matmuls fall off the MXU fast path), compute one fused 4-tap
    blend + argmin per phase on grid-sized buffers and interleave the
    sy·sx phase results.  Numerically this IS torch's own 4-tap
    bilinear formula, in f32 — no precision trade.  Edge clamping is
    exact: out-of-range neighbours replicate the edge row/column, which
    collapses the blend to the clamped value like the coordinate clip
    does.
    """
    import math

    B, h, w, P = dist.shape
    dist = dist.astype(jnp.float32)  # blend in f32 even for bf16 maps

    def shifted(ddy, ddx):
        t = dist
        if ddy == -1:
            t = jnp.concatenate([t[:, :1], t[:, :-1]], axis=1)
        elif ddy == 1:
            t = jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1)
        if ddx == -1:
            t = jnp.concatenate([t[:, :, :1], t[:, :, :-1]], axis=2)
        elif ddx == 1:
            t = jnp.concatenate([t[:, :, 1:], t[:, :, -1:]], axis=2)
        return t

    phases = []
    for dy in range(sy):
        fy = (dy + 0.5) / sy - 0.5
        ylo = math.floor(fy)
        wy = fy - ylo
        for dx in range(sx):
            fx = (dx + 0.5) / sx - 0.5
            xlo = math.floor(fx)
            wx = fx - xlo
            blend = (shifted(ylo, xlo) * ((1 - wy) * (1 - wx))
                     + shifted(ylo, xlo + 1) * ((1 - wy) * wx)
                     + shifted(ylo + 1, xlo) * (wy * (1 - wx))
                     + shifted(ylo + 1, xlo + 1) * (wy * wx))
            phases.append(jnp.argmin(blend, axis=-1).astype(jnp.int32))
    out = jnp.stack(phases).reshape(sy, sx, B, h, w)
    # out[b, sy·i+dy, sx·j+dx] = phases[dy, dx, b, i, j]
    return out.transpose(2, 3, 0, 4, 1).reshape(B, h * sy, w * sx)


def upsampled_nearest(dist: jnp.ndarray, size: Tuple[int, int],
                      chunk: int = 16, exact: bool = False) -> jnp.ndarray:
    """argmin over prototypes of the bilinearly-upsampled distance maps.

    Equals ``argmin(resize(dist, size), -1)`` (reference
    eval_valid.py:172-174).  Integer upsample factors take the
    phase-decomposed 4-tap path (``_upsampled_nearest_integer``).
    General ratios — which include every real backbone shape: the
    dilated-ResNet grid is 2ⁿ+1 (2048×1024 → 257×129, 513² → 65²), so
    the scale is never an integer — scan prototype chunks with a
    running (min, argmin), picking the chunk body by dtype (both
    measured on the v5e at the flagship shape, batch 8):

    * bf16 maps: ``jax.image.resize`` — its two dense matmuls per
      chunk ride the MXU fast path in bf16 (71 ms total);
    * f32 maps (the reference-parity eval mode): an exact 4-tap
      gather blend with the same half-pixel formula as
      ``_bilinear_gather``, vectorized over all output pixels
      (140 ms) — f32 resize matmuls fall off the MXU (2.1 s).

    Peak memory stays O(H·W·chunk).  First-occurrence tie-break
    (numpy/torch argmin semantics): strict ``<`` against the running
    best.

    ``exact=True`` forces the exact-f32-blend semantics for bf16 maps
    WITHOUT materializing a full (B, h, w, P) f32 copy of them (403 MB
    at the flagship batch-16 shape — past the remote relay's ~300 MB
    device-buffer wedge threshold, CLAUDE.md): the Pallas kernel
    already casts each VMEM block to f32 and only its matmul precision
    changes; the scan path casts per prototype chunk inside the 4-tap
    blend.  Both are bit-equal to running the f32 path on a pre-cast
    map (casting is per-element and the blends read each element once).

    Args:
      dist: (B, h, w, P) distances at the output grid.
      size: (H, W) target resolution.

    Returns:
      (B, H, W) int32 prototype indices.
    """
    B, h, w, P = dist.shape
    H, W = size
    # The integer fast path blends whole (B, h, w, P) f32 buffers; only
    # take it when those fit the same 64Mi-element (≈256 MB f32) budget
    # the chunked scan enforces — the remote relay wedges on ≳300 MB
    # device buffers (CLAUDE.md), and the chunked path below is exact
    # for integer scales too, just slower.
    if (H % h == 0 and W % w == 0 and (H // h) * (W // w) <= 256
            and B * h * w * P <= 64 * 1024 * 1024):
        return _upsampled_nearest_integer(dist, H // h, W // w)

    # TPU: fused Pallas kernel — the upsampled (B, H, W, chunk) tensor
    # never exists in HBM (ops/upsample_argmin.py); everywhere else the
    # chunked scan below is the implementation.  The kernel holds a
    # (C·hp, wp) prototype-chunk block + x-pass scratch in VMEM, so it
    # applies while one chunk lane fits (every real shape here does:
    # flagship 129×257 grids are ~0.5 MB/lane); ADLM_NO_PALLAS_UPSAMPLE=1
    # is the escape hatch back to the scan.
    #
    # The dispatch is STATIC (trace-time backend check), deliberately
    # not lax.platform_dependent: that lowers to a lax.cond whose
    # branch temporaries are STACK-allocated in scoped VMEM — measured
    # on v5e, the identical pallas_call that fits standalone blew the
    # 16 MB scoped-vmem limit by 3.2 MB inside the cond branch at the
    # flagship batch-8 shape (and the dead scan branch still paid
    # compile time).
    import os as _os
    if (not _os.environ.get("ADLM_NO_PALLAS_UPSAMPLE")
            and h * w * 8 * dist.dtype.itemsize <= 4 * 1024 * 1024
            and jax.default_backend() == "tpu"):
        from adlm_tpu.ops.upsample_argmin import upsampled_argmin_pallas
        return upsampled_argmin_pallas(dist, size, exact=exact)
    return _upsampled_argmin_scan(dist, size, chunk, exact)


def _upsampled_argmin_scan(dist: jnp.ndarray, size: Tuple[int, int],
                           chunk: int, exact: bool = False) -> jnp.ndarray:
    """XLA chunked-scan implementation of ``upsampled_nearest`` (the
    portable path; also the numerical reference for the Pallas kernel,
    tests/test_upsample_argmin.py)."""
    B, h, w, P = dist.shape
    H, W = size
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    if pad:
        # large FINITE sentinel: inf would turn into NaN inside the
        # bilinear weighting (0·inf) and poison the chunk's min
        dist = jnp.pad(dist, ((0, 0), (0, 0), (0, 0), (0, pad)),
                       constant_values=1e30)

    if dist.dtype == jnp.bfloat16 and not exact:
        def chunk_up(sl):
            return resize_bilinear(sl, size)
    else:
        # half-pixel source coordinates (torch align_corners=False);
        # the taps and weights are trace-time constants
        sy = jnp.clip((jnp.arange(H, dtype=jnp.float32) + 0.5) * (h / H)
                      - 0.5, 0.0, h - 1.0)
        sx = jnp.clip((jnp.arange(W, dtype=jnp.float32) + 0.5) * (w / W)
                      - 0.5, 0.0, w - 1.0)
        y0 = jnp.floor(sy).astype(jnp.int32)
        x0 = jnp.floor(sx).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wy = (sy - y0)[:, None, None]                      # (H,1,1)
        wx = (sx - x0)[:, None]                            # (W,1)

        def chunk_up(sl):
            sl = sl.astype(jnp.float32)
            # x-pass: small (B,h,W,chunk) buffer; the y-pass fuses
            # into the min/argmin
            fx = sl[:, :, x0, :] * (1.0 - wx) + sl[:, :, x1, :] * wx
            return fx[:, y0] * (1.0 - wy) + fx[:, y1] * wy

    def body(i, carry):
        best, best_i = carry
        sl = jax.lax.dynamic_slice_in_dim(dist, i * chunk, chunk, axis=3)
        up = chunk_up(sl)
        cmin = jnp.min(up, axis=-1)
        cidx = jnp.argmin(up, axis=-1).astype(jnp.int32) + i * chunk
        take = cmin < best
        return (jnp.where(take, cmin, best),
                jnp.where(take, cidx, best_i))

    # carry dtype = the chunk body's output dtype (f32 in the 4-tap
    # branch even for bf16 maps under ``exact``)
    cdt = (jnp.bfloat16 if dist.dtype == jnp.bfloat16 and not exact
           else jnp.float32)
    best0 = jnp.full((B, *size), jnp.asarray(2e30, cdt), cdt)
    idx0 = jnp.zeros((B, *size), jnp.int32)
    _, best_i = jax.lax.fori_loop(0, n_chunks, body, (best0, idx0))
    return best_i


def agreement_counts(nearest: jnp.ndarray, stat_pred: jnp.ndarray,
                     proto_class: jnp.ndarray, chunk: int = 16
                     ) -> jnp.ndarray:
    """Per-image nearest-prototype agreement counts, on device.

    ``cnt[b, p] = #pixels of image b with nearest == p and
    stat_pred == proto_class[p]`` — exactly the statistic the
    reference accumulates per class/prototype (eval_valid.py:191-198;
    ``counts[c, p] = cnt[p]·[proto_class[p] == c]`` on the host).

    Computed as a broadcast-compare + reduction over prototype chunks:
    no per-pixel table gather (pathologically slow on TPU at 2048×1024
    — measured ~140 ms/batch for ``proto_class[nearest]``) and no
    scatter (bincount).  Fetching the (B, P) int32 result replaces the
    two full-resolution int32 map fetches the host bincount needed
    (128 MB/batch at the flagship shape).

    Args:
      nearest: (B, h, w) int32 nearest-prototype indices.
      stat_pred: (B, h, w) int32 predicted classes (−1 = excluded).
      proto_class: (P,) int32 prototype class ids.

    Returns:
      (B, P) int32 counts.
    """
    P = proto_class.shape[0]
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    # padded prototypes get class −2: matches neither stat_pred ≥ 0
    # nor the windowed-exclusion marker −1
    pc = jnp.pad(proto_class.astype(jnp.int32), (0, pad),
                 constant_values=-2)
    B = nearest.shape[0]
    n4 = nearest[..., None]
    s4 = stat_pred[..., None]

    def body(i, acc):
        ids = i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        pcc = jax.lax.dynamic_slice_in_dim(pc, i * chunk, chunk)
        agree = (n4 == ids) & (s4 == pcc)                # (B,h,w,chunk)
        part = jnp.sum(agree, axis=(1, 2), dtype=jnp.int32)
        return jax.lax.dynamic_update_slice_in_dim(acc, part, i * chunk,
                                                   axis=1)

    acc0 = jnp.zeros((B, n_chunks * chunk), jnp.int32)
    return jax.lax.fori_loop(0, n_chunks, body, acc0)[:, :P]


def _bilinear_gather(x: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
                     out_h: int, out_w: int) -> jnp.ndarray:
    """Sample the bilinear upsample of ``x`` to (out_h, out_w) at output
    pixels (rows, cols) without materializing the upsample.

    Half-pixel-centered mapping (torch ``align_corners=False`` /
    ``resize_bilinear`` semantics): src = (o + 0.5)·in/out − 0.5,
    clamped to the valid range (edge pixels replicate).

    Args:
      x: (B, h, w, P).
      rows, cols: (n,) shared or (B, n) per-image int32 output
        coordinates (the reference draws fresh pixels per image,
        eval_valid.py:203-204).

    Returns:
      (B, n, P) sampled values.
    """
    B, h, w = x.shape[0], x.shape[1], x.shape[2]
    rows = jnp.broadcast_to(jnp.atleast_2d(rows), (B, rows.shape[-1]))
    cols = jnp.broadcast_to(jnp.atleast_2d(cols), (B, cols.shape[-1]))
    sy = jnp.clip((rows.astype(jnp.float32) + 0.5) * (h / out_h) - 0.5,
                  0.0, h - 1.0)
    sx = jnp.clip((cols.astype(jnp.float32) + 0.5) * (w / out_w) - 0.5,
                  0.0, w - 1.0)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    bidx = jnp.arange(B)[:, None]
    # ONE batched gather for all 4 taps (TPU gathers pay a per-op
    # fixed cost that dwarfs the extra index rows at n ~ 100)
    n = rows.shape[-1]
    ys = jnp.concatenate([y0, y0, y1, y1], axis=-1)      # (B, 4n)
    xs = jnp.concatenate([x0, x1, x0, x1], axis=-1)
    v = x[bidx, ys, xs].reshape(B, 4, n, x.shape[-1])
    v00, v01, v10, v11 = v[:, 0], v[:, 1], v[:, 2], v[:, 3]
    # same add order as the 4-gather formulation (bit-identical)
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
            v10 * wy * (1 - wx) + v11 * wy * wx)


def _topk_purity(sample_d: jnp.ndarray, sample_pred: jnp.ndarray,
                 proto_class: jnp.ndarray) -> jnp.ndarray:
    """Per-image top-K same-class purity contribution.

    Reference eval_valid.py:200-214: for each of n random pixels, sort
    prototypes by distance; purity at K = fraction of the K nearest
    whose class equals the pixel's predicted class; contribution is
    summed over pixels × 100 / n.

    Args:
      sample_d: (B, n, P) distances at sampled pixels.
      sample_pred: (B, n) predicted classes at those pixels.
      proto_class: (P,) prototype class ids.

    Returns:
      (B, P) purity-percent vectors (one entry per K−1).
    """
    n, P = sample_d.shape[1], sample_d.shape[2]
    order = jnp.argsort(sample_d, axis=-1)
    is_cls = (proto_class[order] == sample_pred[..., None]).astype(
        jnp.float32)
    cum = jnp.cumsum(is_cls, axis=-1)
    purity = cum / jnp.arange(1, P + 1, dtype=jnp.float32)
    return purity.sum(axis=1) * 100.0 / n


def make_inference_fn(model: PPNet, num_classes: int,
                      with_stats: bool = False,
                      stats_upsampled: bool = False,
                      proto_chunk: int = 16,
                      normalize: Optional[Tuple[Tuple[float, ...],
                                                Tuple[float, ...]]] = None,
                      stats_exact: bool = False) -> Callable:
    """jitted eval step.

    Without stats: ``fn(params, constants, proto_class, images, labels)``
    → dict with per-class intersection/union, correct/total pixel
    counts, and the full-res prediction.

    With stats, the signature gains ``(u, v)`` — two (B, n) (or shared
    (n,)) float arrays in [0, 1) locating the reference's random sample
    pixels, drawn per image like the reference (eval_valid.py:201-204);
    they are scaled to the stats grid inside
    the jit (whose size depends on ``stats_upsampled``).  The output
    gains ``stat_pred``/``nearest_proto`` maps at the stats
    resolution, a per-image ``agree_counts`` (B, P) int32 vector (see
    ``agreement_counts`` — feed it to
    ``ProtoStatsAccumulator.update_counts``; the maps need not leave
    the device), and a ``topk_purity`` (B, P) vector.

    ``labels`` are raw annotations: 0 = void, class c at value c+1
    (reference eval_valid.py:178-189).

    ``normalize=(mean, std)`` moves input normalization INTO the jit:
    images arrive as raw uint8 and are scaled ``(x/255 − mean)/std`` on
    device — the same f32 op sequence as the host path (ulp-equivalent;
    integer eval metrics observed bit-identical on CPU and TPU) at 4×
    less host→device traffic and a 4× smaller input device buffer (the
    remote relay wedges on ≳400 MB buffers; batch-16 full-res f32
    inputs cross that, uint8 stays at 100 MB).

    ``stats_exact`` (upsampled stats only): force the exact f32 4-tap
    blend for the full-res nearest-prototype argmin even when the
    forward produced bf16 distance maps.  A bf16 eval otherwise takes
    the bf16-tap path (Pallas kernel / bf16 resize), which flips
    ~0.5%% of near-tie argmins vs the f32 blend at the flagship shape
    (PERF.md) — usually an acceptable trade, but ``nearest_proto`` is
    the reference-parity statistic (eval_valid.py:172-174), so this
    switch buys back tap exactness without giving up the bf16 forward.
    Since round 5 the exactness threads through as a per-block
    precision switch (``upsampled_nearest(..., exact=True)``) — the
    full-map f32 copy (403 MB at flagship batch 16, past the relay's
    buffer wedge threshold) is never materialized.
    """

    def fn(params, constants, proto_class, images, labels, *uv):
        images = normalize_in_jit(images, normalize)
        variables = {"params": params, "constants": constants}
        grid_logits, dist = model.apply(variables, images, train=False,
                                        return_distances=with_stats)
        H, W = labels.shape[1], labels.shape[2]
        logits = resize_bilinear(grid_logits, (H, W))
        pred = jnp.argmax(logits, axis=-1)                     # (B,H,W)

        valid = labels > 0
        gt = jnp.clip(labels.astype(jnp.int32) - 1, 0, num_classes - 1)

        correct = jnp.sum(valid & (pred == gt))
        total = jnp.sum(valid)

        # per-class I and U with void-ignored union
        # (reference eval_valid.py:182-189).  NOTE: one-hot + reduction
        # is deliberate — a bincount confusion matrix (scatter) benches
        # 1.6× slower end-to-end on TPU than these VPU-friendly
        # reductions, despite the extra HBM traffic.
        pred1 = jax.nn.one_hot(pred, num_classes, dtype=jnp.int32)
        gt1 = jax.nn.one_hot(gt, num_classes, dtype=jnp.int32) * \
            valid[..., None].astype(jnp.int32)
        inter = jnp.sum(pred1 * gt1, axis=(0, 1, 2))
        union = jnp.sum(((pred1 + gt1) > 0) &
                        valid[..., None], axis=(0, 1, 2))

        out = {"intersection": inter, "union": union,
               "correct": correct, "total": total, "pred": pred}

        if with_stats:
            B = images.shape[0]
            # per-image sample pixels (reference eval_valid.py:203-204
            # draws fresh pixels per image); shared (n,) broadcasts
            u = jnp.broadcast_to(jnp.atleast_2d(uv[0]),
                                 (B, uv[0].shape[-1]))
            v = jnp.broadcast_to(jnp.atleast_2d(uv[1]),
                                 (B, uv[1].shape[-1]))
            bidx = jnp.arange(B)[:, None]
            stat_chunk = int(proto_class.shape[0])
            if stats_upsampled:
                # reference parity: statistics on bilinearly upsampled
                # distances at label resolution (eval_valid.py:172-214)
                sh, sw = H, W
                stat_pred = pred
                # clamp the chunked-scan width so the (B, H, W, chunk)
                # resize buffer stays ≤ ~256 MB f32 (the remote-relay
                # device-buffer limit; chunk is static at trace time).
                # agreement_counts keeps its OWN chunk (below): its
                # per-chunk intermediate is a fused compare, not a
                # resize buffer, and a narrow chunk multiplies full-map
                # HBM re-reads (95 passes over two 134 MB maps at
                # batch 16 ≈ 25 GB ≈ 31 ms before this was split).
                chunk = max(1, min(proto_chunk,
                                   (64 * 1024 * 1024) // (B * H * W)))
                # agreement chunk: 16 prototypes per pass keeps the
                # fused compare's virtual (B, H, W, 16) bool block well
                # inside fusion reach while cutting the map re-reads
                # 8× vs riding the resize clamp (which hits 2 at
                # batch 16)
                stat_chunk = 16
                # stats_exact: exact=True threads f32-blend semantics
                # into the kernel/scan per BLOCK — the full f32 copy of
                # bf16 maps (403 MB at flagship batch 16) never exists
                nearest = upsampled_nearest(dist, (H, W), chunk,
                                            exact=stats_exact)
                rows = jnp.minimum((u * sh).astype(jnp.int32), sh - 1)
                cols = jnp.minimum((v * sw).astype(jnp.int32), sw - 1)
                # gather-then-blend promotes bf16 taps to f32 at the
                # weight multiply — already the exact blend of the
                # stored values (selection commutes with casting)
                sample_d = _bilinear_gather(dist, rows, cols, sh, sw)
            else:
                # cheap default: everything at the model's output grid
                sh, sw = dist.shape[1], dist.shape[2]
                stat_pred = jnp.argmax(grid_logits, axis=-1)
                nearest = jnp.argmin(dist, axis=-1).astype(jnp.int32)
                rows = jnp.minimum((u * sh).astype(jnp.int32), sh - 1)
                cols = jnp.minimum((v * sw).astype(jnp.int32), sw - 1)
                sample_d = dist[bidx, rows, cols]             # (B,n,P)
            sample_pred = stat_pred[bidx, rows, cols]         # (B,n)
            out["stat_pred"] = stat_pred
            out["nearest_proto"] = nearest
            # (B, P) on-device agreement counts: the host accumulator
            # consumes these tiny vectors instead of bincounting two
            # fetched full-res maps (and the old per-pixel
            # ``proto_class[nearest]`` table gather is gone — TPU
            # gathers at 16.7M indices measured ~140 ms/batch)
            out["agree_counts"] = agreement_counts(
                nearest, stat_pred, proto_class, chunk=stat_chunk)
            out["topk_purity"] = _topk_purity(
                sample_d, sample_pred, proto_class)
        return out

    return jax.jit(fn)


def make_overlay_fn(model: PPNet, proto_chunk: int = 16) -> Callable:
    """jitted forward for the qualitative example overlays (reference
    eval_valid.py:270-343): full-image forward, logits AND distances
    bilinearly upsampled to the input resolution, returning the
    prediction map and the nearest-prototype map."""

    @jax.jit
    def fn(params, constants, images):
        variables = {"params": params, "constants": constants}
        logits, dist = model.apply(variables, images, train=False,
                                   return_distances=True)
        H, W = images.shape[1], images.shape[2]
        pred = jnp.argmax(resize_bilinear(logits, (H, W)), axis=-1)
        nearest = upsampled_nearest(dist, (H, W), proto_chunk)
        return pred, nearest

    return fn


def mean_iou_from_confusion(intersection: np.ndarray, union: np.ndarray
                            ) -> Tuple[float, Dict[int, float]]:
    """mIoU over classes with nonzero union (reference eval_valid.py:218-219),
    as percentages."""
    ious = {int(c): float(intersection[c]) * 100.0 / float(union[c])
            for c in range(len(union)) if union[c] > 0}
    miou = float(np.mean(list(ious.values()))) if ious else 0.0
    return miou, ious


class SegEvaluator:
    """Accumulates metrics over batches; mirrors eval_valid outputs.

    With ``with_stats`` the single jitted forward also returns the
    interpretability-stat maps (feed them to ``ProtoStatsAccumulator``)
    — no second forward per batch.  Random sample-pixel locations are
    drawn host-side PER IMAGE (matching reference eval_valid.py:203-204)
    from a seeded RNG and passed into the jit as (B, n) [0,1) floats
    (scaled to the stats grid inside, so the same fn serves both grid
    and upsampled resolutions).
    """

    def __init__(self, model: PPNet, num_classes: int,
                 with_stats: bool = False, stats_upsampled: bool = False,
                 n_random_pixels: int = 100, seed: int = 0,
                 normalize=None, mesh=None, spatial: bool = True,
                 stats_exact: bool = False):
        self.num_classes = num_classes
        if mesh is not None:
            # batch sharded over `data`, optionally H over `model`
            # (spatial) — same numerics, collectives over ICI
            from adlm_tpu.parallel.sharding import make_sharded_inference_fn
            self.fn = make_sharded_inference_fn(
                model, num_classes, mesh,
                spatial=spatial and mesh.shape.get("model", 1) > 1,
                with_stats=with_stats, stats_upsampled=stats_upsampled,
                normalize=normalize, stats_exact=stats_exact)
        else:
            self.fn = make_inference_fn(model, num_classes, with_stats,
                                        stats_upsampled,
                                        normalize=normalize,
                                        stats_exact=stats_exact)
        self.with_stats = with_stats
        self.n_random = n_random_pixels
        self.rng = np.random.RandomState(seed)
        self.reset()

    def reset(self):
        self.intersection = np.zeros(self.num_classes, np.int64)
        self.union = np.zeros(self.num_classes, np.int64)
        self.correct = 0
        self.total = 0

    def update(self, params, constants, proto_class, images, labels
               ) -> Dict[str, Any]:
        args = ()
        if self.with_stats:
            B = images.shape[0]  # no host bounce for device arrays
            args = (jnp.asarray(self.rng.random_sample((B, self.n_random)),
                                jnp.float32),
                    jnp.asarray(self.rng.random_sample((B, self.n_random)),
                                jnp.float32))
        out = self.fn(params, constants, proto_class,
                      jnp.asarray(images), jnp.asarray(labels), *args)
        self.intersection += np.asarray(out["intersection"], np.int64)
        self.union += np.asarray(out["union"], np.int64)
        self.correct += int(out["correct"])
        self.total += int(out["total"])
        return out

    def results(self) -> Dict[str, Any]:
        miou, ious = mean_iou_from_confusion(self.intersection, self.union)
        acc = self.correct * 100.0 / max(self.total, 1)
        return {"mean_iou": miou, "iou_per_class": ious,
                "pixel_accuracy": acc}
