"""Weight-import tests: key mapping vs reference, roundtrip into model."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core.config import PPNetConfig
from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.utils.torch_import import (
    load_deeplab_backbone,
    torchvision_key_to_deeplab,
)


def test_key_mapping_matches_reference():
    spec = importlib.util.spec_from_file_location(
        "ref_dlf", "/root/reference/deeplab_features.py")
    # the reference module imports gin + the missing submodule at top
    # level; extract just the mapping function by executing its source
    # up to the function definition instead
    src = open("/root/reference/deeplab_features.py").read()
    ns = {"Optional": __import__("typing").Optional}
    fn_src = src[src.index("def torchvision_resnet_weight_key"):
                 src.index("@gin.configurable")]
    exec(fn_src, ns)
    ref_fn = ns["torchvision_resnet_weight_key_to_deeplab2"]

    keys = [
        "conv1.weight", "bn1.weight", "bn1.bias", "bn1.running_mean",
        "layer1.0.conv1.weight", "layer1.0.bn2.running_var",
        "layer2.3.conv3.weight", "layer3.22.downsample.0.weight",
        "layer4.2.downsample.1.bias", "fc.weight",
    ]
    for k in keys:
        assert torchvision_key_to_deeplab(k) == ref_fn(k), k
    # num_batches_tracked has no home in our trees
    assert torchvision_key_to_deeplab(
        "layer1.0.bn1.num_batches_tracked") is None


def _fake_torchvision_resnet101_state_dict(rng):
    """Shape-correct torchvision resnet101 state dict (no download)."""
    sd = {}
    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
    for leaf in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{leaf}"] = rng.randn(64).astype(np.float32)
    specs = [(3, 64, 256, 64), (4, 128, 512, 256),
             (23, 256, 1024, 512), (3, 512, 2048, 1024)]
    for li, (n, mid, out, first_in) in enumerate(specs):
        for b in range(n):
            pre = f"layer{li + 1}.{b}"
            in_ch = first_in if b == 0 else out
            sd[f"{pre}.conv1.weight"] = rng.randn(
                mid, in_ch, 1, 1).astype(np.float32)
            sd[f"{pre}.conv2.weight"] = rng.randn(
                mid, mid, 3, 3).astype(np.float32)
            sd[f"{pre}.conv3.weight"] = rng.randn(
                out, mid, 1, 1).astype(np.float32)
            for i, ch in (("1", mid), ("2", mid), ("3", out)):
                for leaf in ("weight", "bias", "running_mean",
                             "running_var"):
                    sd[f"{pre}.bn{i}.{leaf}"] = rng.randn(ch).astype(
                        np.float32)
            if b == 0:
                sd[f"{pre}.downsample.0.weight"] = rng.randn(
                    out, in_ch, 1, 1).astype(np.float32)
                for leaf in ("weight", "bias", "running_mean",
                             "running_var"):
                    sd[f"{pre}.downsample.1.{leaf}"] = rng.randn(
                        out).astype(np.float32)
    sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    return sd


def test_full_resnet101_import_roundtrip():
    cfg = PPNetConfig()  # full deeplabv2_resnet101
    model = PPNet(cfg=cfg)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 33, 33, 3))))
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    params = jax.tree.map(np.asarray, dict(variables["params"]))
    constants = jax.tree.map(np.asarray, dict(variables["constants"]))

    rng = np.random.RandomState(0)
    sd = _fake_torchvision_resnet101_state_dict(rng)
    report = load_deeplab_backbone(params, constants, sd,
                                   naming="torchvision")

    # reference contract (train.py:92-93): the remap DROPS fc.* before
    # loading, so unexpected_keys is empty; missing keys are only the
    # ASPP, which the torchvision dict doesn't carry
    assert report["unexpected_keys"] == []

    # spot-check: OIHW→HWIO transpose landed where expected
    base = params["features"]["base"]
    got = base["layer1"]["conv1"]["conv"]["kernel"]
    np.testing.assert_array_equal(
        got, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    got = base["layer4"]["block23"]["conv3x3"]["conv"]["kernel"]
    np.testing.assert_array_equal(
        got, np.transpose(sd["layer3.22.conv2.weight"], (2, 3, 1, 0)))
    # BN landed in constants
    cbase = constants["features"]["base"]
    np.testing.assert_array_equal(
        cbase["layer2"]["block1"]["shortcut"]["bn"]["mean"],
        sd["layer1.0.downsample.1.running_mean"])
    # ASPP untouched (zeros)
    assert float(np.abs(params["features"]["base"]["aspp"]["c0"]["kernel"]
                        ).max()) == 0.0
    # every non-fc source key loaded
    assert len(report["loaded"]) == len(sd) - 2 - sum(
        1 for k in sd if k.endswith("num_batches_tracked"))
