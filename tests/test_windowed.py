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
