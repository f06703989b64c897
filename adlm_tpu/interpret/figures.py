"""U-Noise result figures: coverage-vs-dice curves.

Reference src/make_figures.py:29-217: for each trained noise model,
threshold the importance mask B at descending levels, keep the top-q
fraction of pixels visible, measure utility dice, and plot dice vs
pixel coverage; plus a params-vs-dice@50% comparison across model sizes.
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


def plot_curves(curves: Dict[str, List[Tuple[float, float]]],
                out_path: str,
                params_per_model: Optional[Dict[str, int]] = None) -> None:
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
            at50 = min(curve, key=lambda c: abs(c[0] - 0.5))[1]
            plt.scatter(params_per_model[name], at50, label=name)
        plt.xscale("log")
        plt.xlabel("params")
        plt.ylabel("dice @ 50% coverage")
        plt.legend()
        plt.tight_layout()
        plt.savefig(out_path.replace(".png", "_params.png"))
        plt.close()
