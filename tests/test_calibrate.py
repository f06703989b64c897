"""models/calibrate.py: data-calibrated frozen-BN init.

The reference cannot train from scratch — its frozen BNs assume
pretrained running stats (reference segmentation/module.py:127, its
train.py always loads COCO/ImageNet weights at train.py:70-95).
Calibration must standardize every FrozenBatchNorm's output on the
calibration batch and de-saturate the sigmoid add-on features.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adlm_tpu.core.config import ExperimentConfig, get_experiment
from adlm_tpu.models.calibrate import (
    _is_fbn,
    _walk_captures,
    calibrate_frozen_bn,
)
from adlm_tpu.models.ppnet import PPNet


@pytest.fixture(scope="module")
def setup():
    cfg = get_experiment("smoke")
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.rand(2, 65, 65, 3) * 4 - 2).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 65, 65, 3), jnp.float32))
    return cfg, model, variables["params"], variables["constants"], x


def _bn_moments(model, params, constants, x):
    _, inter = model.apply(
        {"params": params, "constants": constants}, x,
        method=PPNet.push_forward, capture_intermediates=_is_fbn)
    out = {}
    for path, outs in _walk_captures(
            jax.tree.map(np.asarray, inter["intermediates"])):
        y = np.concatenate([o.reshape(-1, o.shape[-1]) for o in outs])
        out[path] = (y.mean(0), y.var(0))
    return out


def test_calibration_standardizes_bn_outputs(setup):
    cfg, model, params, constants, x = setup
    new_consts = calibrate_frozen_bn(model, params, constants, x)
    moments = _bn_moments(model, params, new_consts, x)
    assert moments, "no FrozenBatchNorms captured"
    for path, (mean, var) in moments.items():
        # dead (zero-variance) channels cannot be standardized; check
        # the live ones
        live = var > 1e-3
        assert np.all(np.abs(mean[live]) < 0.15), path
        assert np.all(np.abs(var[live] - 1.0) < 0.5), path


def test_calibration_reduces_feature_saturation(setup):
    cfg, model, params, constants, x = setup

    def saturation(consts):
        f, _ = model.apply({"params": params, "constants": consts}, x,
                           method=PPNet.push_forward)
        f = np.asarray(f)
        return float(np.mean((f < 0.01) | (f > 0.99)))

    new_consts = calibrate_frozen_bn(model, params, constants, x)
    assert saturation(new_consts) < 0.2
    # tree structure unchanged (checkpoint compatibility)
    assert (jax.tree_util.tree_structure(new_consts)
            == jax.tree_util.tree_structure(
                jax.tree.map(np.asarray, constants)))


def test_calibration_is_deterministic(setup):
    cfg, model, params, constants, x = setup
    a = calibrate_frozen_bn(model, params, constants, x)
    b = calibrate_frozen_bn(model, params, constants, x)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(la, lb)


def test_from_json_tolerates_missing_new_fields():
    """Configs saved before a field existed must load with the
    dataclass default (bn_calibrate was added after round-2 runs)."""
    import json
    cfg = get_experiment("smoke")
    raw = json.loads(cfg.to_json())
    del raw["train"]["bn_calibrate"]
    back = ExperimentConfig.from_json(json.dumps(raw))
    assert back.train.bn_calibrate is False
    assert back.train.warmup_steps == cfg.train.warmup_steps
