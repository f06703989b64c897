"""Numerical golden test: torch DeepLabV2 vs our Flax rebuild.

The reference imports DeepLabV2 from a *missing* git submodule
(reference deeplab_features.py:5, .gitmodules:1-3); our backbone was
rebuilt from import-site evidence.  This test closes the numerical
parity risk: it reconstructs the torch DeepLabV2 from the same evidence
(caffe-style bottlenecks with the stride on the 1x1 reduce conv,
ceil-mode stem pool, frozen BN, ASPP rates 6/12/18/24 summed — see
reference deeplab_features.py:52-60 for the constructor signature and
reference segmentation/module.py:335-343 for the ``aspp.c0..c3``
structure), runs ONE random state_dict through both implementations via
``utils/torch_import.py`` (deeplab naming) and asserts the forwards
agree, in both train mode (frozen BN) and eval mode, at 33x33 and
513x513.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from adlm_tpu.models.deeplab import DeepLabV2  # noqa: E402
from adlm_tpu.utils.torch_import import load_deeplab_backbone  # noqa: E402


# ---------------------------------------------------------------------------
# Torch reconstruction of the vendored deeplab_pytorch DeepLabV2.
# Key names intentionally match the submodule's (layer1.conv1.{conv,bn},
# layer{2..5}.block{n}.{reduce,conv3x3,increase,shortcut}.{conv,bn},
# aspp.c{0..3}) so the state_dict flows through torch_import unchanged.
# ---------------------------------------------------------------------------


class _ConvBnReLU(nn.Sequential):
    def __init__(self, in_ch, out_ch, k, s, p, d, relu=True):
        super().__init__()
        self.add_module("conv", nn.Conv2d(in_ch, out_ch, k, s, p,
                                          dilation=d, bias=False))
        self.add_module("bn", nn.BatchNorm2d(out_ch, eps=1e-5))
        if relu:
            self.add_module("relu", nn.ReLU())


class _Bottleneck(nn.Module):
    """Caffe-style bottleneck: stride lives on the 1x1 reduce conv."""

    def __init__(self, in_ch, mid, out, stride, dilation, downsample):
        super().__init__()
        self.reduce = _ConvBnReLU(in_ch, mid, 1, stride, 0, 1, True)
        self.conv3x3 = _ConvBnReLU(mid, mid, 3, 1, dilation, dilation, True)
        self.increase = _ConvBnReLU(mid, out, 1, 1, 0, 1, False)
        self.shortcut = (_ConvBnReLU(in_ch, out, 1, stride, 0, 1, False)
                         if downsample else None)

    def forward(self, x):
        h = self.increase(self.conv3x3(self.reduce(x)))
        s = self.shortcut(x) if self.shortcut is not None else x
        return torch.relu(h + s)


class _ResLayer(nn.Sequential):
    def __init__(self, n_blocks, in_ch, mid, out, stride, dilation):
        super().__init__()
        for i in range(n_blocks):
            self.add_module(
                f"block{i + 1}",
                _Bottleneck(in_ch if i == 0 else out, mid, out,
                            stride if i == 0 else 1, dilation, i == 0))


class _Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = _ConvBnReLU(3, 64, 7, 2, 3, 1, True)
        self.pool = nn.MaxPool2d(3, 2, 1, ceil_mode=True)

    def forward(self, x):
        return self.pool(self.conv1(x))


class _ASPP(nn.Module):
    def __init__(self, in_ch, out_ch, rates):
        super().__init__()
        for i, r in enumerate(rates):
            self.add_module(f"c{i}", nn.Conv2d(in_ch, out_ch, 3, 1,
                                               padding=r, dilation=r,
                                               bias=True))

    def forward(self, x):
        return sum(stage(x) for stage in self.children())


class TorchDeepLabV2(nn.Module):
    def __init__(self, n_classes, n_blocks, atrous_rates):
        super().__init__()
        self.layer1 = _Stem()
        self.layer2 = _ResLayer(n_blocks[0], 64, 64, 256, 1, 1)
        self.layer3 = _ResLayer(n_blocks[1], 256, 128, 512, 2, 1)
        self.layer4 = _ResLayer(n_blocks[2], 512, 256, 1024, 1, 2)
        self.layer5 = _ResLayer(n_blocks[3], 1024, 512, 2048, 1, 4)
        self.aspp = _ASPP(2048, n_classes, atrous_rates)

    def forward(self, x):
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = self.layer5(x)
        return self.aspp(x)

    def freeze_bn(self):
        """The reference's per-step BN freeze (module.py:127,278)."""
        for m in self.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.eval()


def _randomize(model: nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.normal_(0, 0.05, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0, 0.05, generator=g)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _forward_pair(n_blocks, size, n_features=16, seed=0, atol=1e-4,
                  rtol=1e-4):
    rates = (6, 12, 18, 24)
    tm = TorchDeepLabV2(n_features, n_blocks, rates)
    _randomize(tm, seed)

    fm = DeepLabV2(out_features=n_features, n_blocks=n_blocks,
                   atrous_rates=rates)
    x = np.random.RandomState(seed).rand(1, size, size, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])
    constants = jax.tree.map(np.asarray, variables["constants"])

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    report = load_deeplab_backbone(params, constants, sd, naming="deeplab",
                                   backbone_path=())
    # everything except BN bookkeeping must land
    unexpected = [k for k in report["unexpected_keys"]
                  if not k.endswith("num_batches_tracked")]
    assert unexpected == [], unexpected
    assert not report["negative_variance_keys"]

    got = np.asarray(jax.jit(fm.apply)(
        {"params": params, "constants": constants}, jnp.asarray(x)))

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        tm.eval()
        want_eval = tm(xt).numpy()
        # reference train mode: module.train() then freeze_bn each step
        tm.train()
        tm.freeze_bn()
        want_train = tm(xt).numpy()

    np.testing.assert_allclose(want_train, want_eval, rtol=0, atol=0)
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want_eval,
                               rtol=rtol, atol=atol)
    return got.shape


def test_backbone_golden_33_full_depth():
    """Full ResNet-101 block structure (3,4,23,3) at 33x33.

    Random N(0, 0.05) weights compound through 33 residual blocks to
    activations of ~1e5, so the honest tolerance is relative: observed
    max relative error 2e-4 (f32 accumulation-order noise)."""
    shape = _forward_pair((3, 4, 23, 3), 33, rtol=1e-3, atol=1e-3)
    assert shape == (1, 5, 5, 16)  # output stride 8, ceil geometry


def test_backbone_golden_513():
    """Full eval resolution 513x513 (reduced depth keeps CPU runtime
    sane; geometry — ceil pool, dilation padding, OS8 — is exercised
    at full size, block-structure fidelity by the 33x33 full-depth test)."""
    shape = _forward_pair((1, 1, 1, 1), 513, seed=1)
    assert shape == (1, 65, 65, 16)  # 513 -> 257 -> 129 -> 65


def test_backbone_golden_rectangular():
    """Non-square input (Cityscapes aspect): 65x129."""
    rates = (6, 12, 18, 24)
    tm = TorchDeepLabV2(8, (1, 1, 1, 1), rates)
    _randomize(tm, 7)
    fm = DeepLabV2(out_features=8, n_blocks=(1, 1, 1, 1), atrous_rates=rates)
    x = np.random.RandomState(7).rand(1, 65, 129, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])
    constants = jax.tree.map(np.asarray, variables["constants"])
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    load_deeplab_backbone(params, constants, sd, naming="deeplab",
                          backbone_path=())
    got = np.asarray(fm.apply({"params": params, "constants": constants},
                              jnp.asarray(x)))
    with torch.no_grad():
        tm.eval()
        want = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               rtol=1e-4, atol=1e-4)


def test_backbone_golden_via_torchvision_naming():
    """The ImageNet init path: a torchvision-style ResNet state_dict
    remapped by torch_import must produce the same backbone numerics as
    loading the equivalent deeplab-named dict (reference
    deeplab_features.py:8-49, train.py:81-93)."""
    n_blocks = (2, 2, 2, 2)
    rates = (6, 12, 18, 24)
    tm = TorchDeepLabV2(8, n_blocks, rates)
    _randomize(tm, 3)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    # rewrite deeplab keys into torchvision naming (inverse of the
    # reference's remap)
    def to_tv(key):
        seg = key.split(".")
        if seg[0] == "aspp":
            return None
        if seg[0] == "layer1":  # stem
            return f"{seg[2]}1.{seg[-1]}"
        layer = int(seg[0][5:]) - 1
        block = int(seg[1][5:]) - 1
        name = seg[2]
        if name == "shortcut":
            idx = {"conv": 0, "bn": 1}[seg[3]]
            return f"layer{layer}.{block}.downsample.{idx}.{seg[-1]}"
        num = {"reduce": 1, "conv3x3": 2, "increase": 3}[name]
        return f"layer{layer}.{block}.{seg[3]}{num}.{seg[-1]}"

    tv_sd = {}
    for k, v in sd.items():
        tk = to_tv(k)
        if tk is not None:
            tv_sd[tk] = v

    fm = DeepLabV2(out_features=8, n_blocks=n_blocks, atrous_rates=rates)
    x = np.random.RandomState(3).rand(1, 65, 65, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])
    constants = jax.tree.map(np.asarray, variables["constants"])
    report = load_deeplab_backbone(params, constants, tv_sd,
                                   naming="torchvision", backbone_path=())
    assert report["unexpected_keys"] == []

    # ASPP stays at init (the reference's "8 missing keys" contract);
    # copy it over manually so the full forward can be compared
    for i in range(4):
        params["aspp"][f"c{i}"]["kernel"] = np.transpose(
            sd[f"aspp.c{i}.weight"], (2, 3, 1, 0))
        params["aspp"][f"c{i}"]["bias"] = sd[f"aspp.c{i}.bias"]

    got = np.asarray(fm.apply({"params": params, "constants": constants},
                              jnp.asarray(x)))
    with torch.no_grad():
        tm.eval()
        want = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               rtol=1e-4, atol=1e-4)


def test_backbone_golden_129_full_depth():
    """Full ResNet-101 depth (3,4,23,3) at a mid resolution (129²) —
    closes the depth×resolution interaction gap the 33² full-depth and
    513² reduced-depth tests split between them (reference
    deeplab_features.py:52-60: the flagship always runs this block
    structure).

    Random N(0, 0.05) weights compound through 33 residual blocks to
    activations of ~1e5; the handful of output elements formed by
    near-cancellation of such values legitimately carry a few percent
    of relative f32 accumulation-order noise, so the assertion is
    fraction-based: ≥99.9% of elements within rtol 1e-3, stragglers
    within 5%."""
    rates = (6, 12, 18, 24)
    tm = TorchDeepLabV2(16, (3, 4, 23, 3), rates)
    _randomize(tm, 2)
    fm = DeepLabV2(out_features=16, n_blocks=(3, 4, 23, 3),
                   atrous_rates=rates)
    x = np.random.RandomState(2).rand(1, 129, 129, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(np.asarray, variables["params"])
    constants = jax.tree.map(np.asarray, variables["constants"])
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    load_deeplab_backbone(params, constants, sd, naming="deeplab",
                          backbone_path=())
    got = np.asarray(fm.apply({"params": params, "constants": constants},
                              jnp.asarray(x)))
    assert got.shape == (1, 17, 17, 16)  # 129 -> 65 -> 33 -> 17, OS8
    with torch.no_grad():
        tm.eval()
        want = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got_t = np.transpose(got, (0, 3, 1, 2)).astype(np.float64)
    want = want.astype(np.float64)
    rel = np.abs(got_t - want) / np.maximum(np.abs(want), 1e-6)
    assert float(np.mean(rel > 1e-3)) <= 1e-3, float(np.mean(rel > 1e-3))
    assert float(rel.max()) <= 0.05, float(rel.max())
