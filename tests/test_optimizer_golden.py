"""Optimizer golden: our optax chain vs torch.optim.Adam.

The reference trains every group with torch Adam (L2-style
weight_decay folded into the gradient, reference
segmentation/module.py:345-393) under a deeplab PolynomialLR schedule
in the joint phase (module.py:395-401).  These tests drive both
implementations with identical parameters and gradients for several
steps and assert the trajectories match.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from adlm_tpu.train.optimizer import _adam, poly_schedule  # noqa: E402


def _run_pair(lr, weight_decay, n_steps=7, seed=0, sched=None):
    rng = np.random.RandomState(seed)
    w0 = rng.randn(5, 3).astype(np.float32)
    grads = [rng.randn(5, 3).astype(np.float32) for _ in range(n_steps)]

    # torch side
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    if sched is not None:
        opt = torch.optim.Adam([wt], lr=1.0, eps=1e-8,
                               weight_decay=weight_decay)
    else:
        opt = torch.optim.Adam([wt], lr=lr, eps=1e-8,
                               weight_decay=weight_decay)
    for i, g in enumerate(grads):
        if sched is not None:
            for group in opt.param_groups:
                group["lr"] = float(sched(i))
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()

    # ours
    tx = _adam(sched if sched is not None else lr, weight_decay)
    wj = jnp.asarray(w0)
    state = tx.init(wj)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, wj)
        wj = optax.apply_updates(wj, updates)
    return wt.detach().numpy(), np.asarray(wj)


def test_adam_matches_torch():
    a, b = _run_pair(lr=2.5e-4, weight_decay=0.0)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_adam_l2_weight_decay_matches_torch():
    """torch folds weight_decay*param into the gradient BEFORE the
    moment updates (L2, not AdamW) — add_decayed_weights placement."""
    a, b = _run_pair(lr=1e-3, weight_decay=1e-4)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_adam_poly_schedule_matches_torch():
    """Joint-phase trajectory under the deeplab PolynomialLR formula
    lr·(1 − step/max)^power applied per optimizer update."""
    sched = poly_schedule(2.5e-5, 50, 0.9)
    a, b = _run_pair(lr=None, weight_decay=5e-4, sched=sched)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
