"""U-Noise result figures: coverage-vs-dice curves.

Reference src/make_figures.py:29-217.  Two curve semantics live here:

* ``threshold_sweep`` + ``dice_at_median_importance`` — the reference's
  ``evaluate`` exactly (make_figures.py:135-173): a fixed threshold
  grid ``B <= t`` with per-batch-averaged dice/coverage, and the
  published dice@50% number = dice with only the below-median-B half
  of all val pixels visible (the README table, README.md:170-187).
* ``coverage_dice_curve`` — a per-image exact-coverage variant (each
  image keeps its own lowest-B quantile), useful when comparing runs
  whose B distributions differ in scale.

``load_results_pickle``/``save_results_pickle`` read/write the
reference's ``data/results.pickle`` interchange format
(make_figures.py:186-209), so its published results render here and
our results render there.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.models.unet import UNet
from adlm_tpu.ops.losses import dice_coeff


def coverage_dice_curve(util_model: UNet, util_vars: Any,
                        importance: np.ndarray,
                        images: jnp.ndarray, masks: jnp.ndarray,
                        coverages: Sequence[float] = tuple(
                            np.linspace(0.05, 1.0, 20))
                        ) -> List[Tuple[float, float]]:
    """Dice when only the `coverage` most-important pixels stay visible.

    ``importance``: (B, H, W, 1) — LOW B = important (tolerates little
    noise), so visibility keeps the lowest-B fraction.
    """
    imp = jnp.asarray(importance)
    curve = []
    for q in coverages:
        thresh = jnp.quantile(imp.reshape(imp.shape[0], -1), q, axis=1)
        visible = imp <= thresh[:, None, None, None]
        masked_imgs = images * visible
        pred = util_model.apply(util_vars, masked_imgs, train=False)
        d = float(dice_coeff(pred > 0.0, masks))
        curve.append((float(q), d))
    return curve


def _iter_batches(batch_size: int, *arrays):
    n = arrays[0].shape[0]
    for s in range(0, n, batch_size):
        yield tuple(a[s:s + batch_size] for a in arrays)


def threshold_sweep(predict, importance: np.ndarray,
                    images: np.ndarray, masks: np.ndarray,
                    thresholds: Optional[Sequence[float]] = None,
                    batch_size: int = 32
                    ) -> Tuple[List[float], List[float], List[float]]:
    """The reference's ``evaluate`` sweep (make_figures.py:135-158).

    For each fixed threshold ``t`` in a 21-point grid: mask the input
    to ``images · (B <= t)``, run the utility ``predict``, record the
    batch dice and the visible-pixel fraction; average both PER BATCH
    over the loader batches (the reference's mean-of-batch-dice
    aggregation, batch 32 — make_figures.py:128,156-158).

    Returns (dice, coverage, thresholds) lists of equal length.
    """
    if thresholds is None:
        thresholds = np.linspace(0.0, 1.0, 21)
    imp = np.asarray(importance)
    images = np.asarray(images)
    masks = np.asarray(masks)
    dice = [[] for _ in thresholds]
    cov = [[] for _ in thresholds]
    for imgs_b, masks_b, b_b in _iter_batches(batch_size, images,
                                              masks, imp):
        masks_j = jnp.asarray(masks_b)
        for i, t in enumerate(thresholds):
            visible = b_b <= t
            pred = predict(jnp.asarray(imgs_b * visible))
            dice[i].append(float(dice_coeff(pred > 0.0, masks_j)))
            cov[i].append(float(np.mean(visible)))
    return ([float(np.mean(d)) for d in dice],
            [float(np.mean(c)) for c in cov],
            [float(t) for t in thresholds])


def make_device_sweep_fn(util_model: UNet, util_vars: Any,
                         thresholds: Sequence[float]) -> callable:
    """ONE jitted program per batch for the whole threshold sweep:
    ``lax.map`` over the threshold grid reuses the batch buffers and
    returns (dice (T,), coverage (T,)) — vs the host loop's T separate
    dispatches per batch (the remote relay costs ~30 ms per call,
    CLAUDE.md), and without materializing a T× input blow-up the way a
    vmap would.  Numerics are identical to ``threshold_sweep`` with a
    jitted ``predict`` (same op sequence per threshold).
    """
    th = jnp.asarray(np.asarray(thresholds, np.float32))

    @jax.jit
    def fn(images_b, masks_b, b_b):
        def one(t):
            visible = (b_b <= t)
            pred = util_model.apply(util_vars, images_b * visible,
                                    train=False)
            return (dice_coeff(pred > 0.0, masks_b),
                    jnp.mean(visible.astype(jnp.float32)))
        return jax.lax.map(one, th)

    return fn


def device_threshold_sweep(util_model: UNet, util_vars: Any,
                           importance: np.ndarray,
                           images: np.ndarray, masks: np.ndarray,
                           thresholds: Optional[Sequence[float]] = None,
                           batch_size: int = 32
                           ) -> Tuple[List[float], List[float],
                                      List[float]]:
    """``threshold_sweep`` with the whole grid fused into one jit per
    batch (see ``make_device_sweep_fn``); same reference semantics
    (per-batch-averaged dice/coverage, make_figures.py:135-158).  An
    uneven final batch compiles a second shape — expected, same as
    every eval tail."""
    if thresholds is None:
        thresholds = np.linspace(0.0, 1.0, 21)
    fn = make_device_sweep_fn(util_model, util_vars, thresholds)
    dice_b, cov_b = [], []
    for imgs_b, masks_b, b_b in _iter_batches(
            batch_size, np.asarray(images), np.asarray(masks),
            np.asarray(importance)):
        d, c = fn(jnp.asarray(imgs_b), jnp.asarray(masks_b),
                  jnp.asarray(b_b))
        dice_b.append(np.asarray(d))
        cov_b.append(np.asarray(c))
    return (list(np.mean(dice_b, axis=0).astype(float)),
            list(np.mean(cov_b, axis=0).astype(float)),
            [float(t) for t in thresholds])


def dice_at_median_importance(predict, importance: np.ndarray,
                              images: np.ndarray, masks: np.ndarray,
                              batch_size: int = 32) -> float:
    """The published dice@50%-coverage number
    (``dice_at_half_coverage``, reference make_figures.py:160-173):
    dice with only the below-median-B half of ALL val pixels visible,
    averaged per batch.  ``torch.median`` returns the LOWER middle
    element for even counts (numpy averages the two middles), so the
    median is taken as ``sorted[(n-1)//2]``.
    """
    flat = np.sort(np.asarray(importance).ravel())
    median = flat[(flat.size - 1) // 2]
    imp = np.asarray(importance)
    ds = []
    for imgs_b, masks_b, b_b in _iter_batches(
            batch_size, np.asarray(images), np.asarray(masks), imp):
        pred = predict(jnp.asarray(imgs_b * (b_b <= median)))
        ds.append(float(dice_coeff(pred > 0.0, jnp.asarray(masks_b))))
    return float(np.mean(ds))


def load_results_pickle(path: str) -> Tuple[Dict[str, List[Tuple[float, float]]],
                                            Dict[str, int],
                                            Dict[str, float]]:
    """Read the reference's ``data/results.pickle`` interchange format
    (make_figures.py:186-209): name → {thresholds, num_params, dice,
    coverage, dice_at_half_coverage}.

    Returns (curves name→[(coverage, dice)], params name→int,
    dice@50% name→float).
    """
    import pickle
    with open(path, "rb") as f:
        data = pickle.load(f)
    curves, params, at_half = {}, {}, {}
    for name, d in data.items():
        curves[name] = [(float(c), float(x))
                        for c, x in zip(d["coverage"], d["dice"])]
        params[name] = int(d["num_params"])
        at_half[name] = float(d["dice_at_half_coverage"])
    return curves, params, at_half


def save_results_pickle(path: str, results: Dict[str, Dict]) -> None:
    """Write our results in the reference's pickle format so its own
    ``make_figures.py`` can plot them.  ``results``: name →
    {thresholds, num_params, dice, coverage, dice_at_half_coverage}.
    """
    import pickle
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(results, f)


def plot_curves(curves: Dict[str, List[Tuple[float, float]]],
                out_path: str,
                params_per_model: Optional[Dict[str, int]] = None,
                dice_at_half: Optional[Dict[str, float]] = None) -> None:
    """Coverage-vs-dice figure + params-vs-dice@50% scatter.

    ``dice_at_half`` supplies measured median-mask dice@50% values
    (``dice_at_median_importance`` / the pickle's
    ``dice_at_half_coverage``); when absent the scatter falls back to
    the curve point nearest 50% coverage.
    """
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return
    plt.figure(figsize=(8, 5))
    for name, curve in curves.items():
        xs = [c * 100 for c, _ in curve]
        ys = [d for _, d in curve]
        label = name
        if params_per_model and name in params_per_model:
            label += f" ({params_per_model[name]:,} params)"
        plt.plot(xs, ys, marker="o", label=label)
    plt.xlabel("% of image visible")
    plt.ylabel("dice")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    plt.savefig(out_path)
    plt.close()

    if params_per_model:
        # params vs dice@50% (reference make_figures.py:205-217)
        plt.figure(figsize=(6, 4))
        for name, curve in curves.items():
            if name not in params_per_model:
                continue
            if dice_at_half and name in dice_at_half:
                at50 = dice_at_half[name]
            else:
                at50 = min(curve, key=lambda c: abs(c[0] - 0.5))[1]
            plt.scatter(params_per_model[name], at50, label=name)
        plt.xscale("log")
        plt.xlabel("params")
        plt.ylabel("dice @ 50% coverage")
        plt.legend()
        plt.tight_layout()
        plt.savefig(out_path.replace(".png", "_params.png"))
        plt.close()
