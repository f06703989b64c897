"""Model tests: geometry parity with the reference, param counts, prune."""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adlm_tpu.core.config import PPNetConfig, get_experiment
from adlm_tpu.models import (
    DeepLabV2,
    MSC,
    PPNet,
    UNet,
    default_proto_class,
    prune_params,
)


def _load_reference_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


SMALL_DL = dict(n_blocks=(1, 1, 1, 1))  # tiny backbone for CPU tests


def test_deeplab_output_stride_geometry():
    """513→65 and the 1024×2048→129×257 grid (reference push.py:276)."""
    model = DeepLabV2(out_features=8, **SMALL_DL)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 513, 513, 3)))
    out = model.apply(v, jnp.zeros((1, 513, 513, 3)))
    assert out.shape == (1, 65, 65, 8)
    # full-res eval geometry (cheap check at quarter res: 256x512 → 33x65)
    out = model.apply(v, jnp.zeros((1, 256, 512, 3)))
    assert out.shape == (1, 33, 65, 8)


def test_deeplab_param_naming_matches_reference_convention():
    model = DeepLabV2(out_features=8, **SMALL_DL)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3)))
    params = v["params"]
    assert "layer1" in params and "conv1" in params["layer1"]
    assert "block1" in params["layer2"]
    for part in ("reduce", "conv3x3", "increase", "shortcut"):
        assert part in params["layer2"]["block1"], part
    assert set(params["aspp"].keys()) == {"c0", "c1", "c2", "c3"}
    # frozen BN lives in constants, not params
    consts = v["constants"]
    assert "bn" in consts["layer1"]["conv1"]
    flat = jax.tree_util.tree_leaves(params)
    assert all(not isinstance(x, dict) for x in flat)


def test_full_deeplabv2_resnet101_param_count():
    """ResNet-101 body + ASPP(64): conv params only (BN is frozen
    constants). ResNet-101 convs = 42.39M; ASPP 4×(3·3·2048·64+64)."""
    model = DeepLabV2(out_features=64)
    v = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 33, 3))))
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(
        v["params"]))
    aspp = 4 * (3 * 3 * 2048 * 64 + 64)
    assert n_params == 42394816 + aspp


def test_msc_training_returns_pyramid():
    base = DeepLabV2(out_features=4, **SMALL_DL)
    msc = MSC(base=base, scales=(0.5, 0.75))
    x = jnp.zeros((1, 64, 64, 3))
    v = msc.init(jax.random.PRNGKey(0), x, train=True)
    outs = msc.apply(v, x, train=True)
    assert isinstance(outs, list) and len(outs) == 4  # base, 2 scales, max
    assert outs[0].shape == outs[3].shape
    out_eval = msc.apply(v, x, train=False)
    assert out_eval.shape == outs[0].shape  # max only


def _tiny_ppnet_cfg(**kw):
    kw.setdefault("num_prototypes", 6)
    kw.setdefault("num_classes", 3)
    kw.setdefault("prototype_channels", 8)
    kw.setdefault("deeplab_n_features", 8)
    return PPNetConfig(**kw)


def test_ppnet_patch_classification_shapes():
    cfg = _tiny_ppnet_cfg()
    model = PPNet(cfg=cfg)
    # monkey-patch small backbone: use tiny deeplab by overriding blocks
    x = jnp.zeros((2, 65, 65, 3))
    import adlm_tpu.models.ppnet as ppnet_mod
    orig = ppnet_mod.build_backbone
    ppnet_mod.build_backbone = lambda c: MSC(
        base=DeepLabV2(out_features=c.deeplab_n_features, **SMALL_DL),
        scales=tuple(c.msc_scales))
    try:
        v = model.init(jax.random.PRNGKey(0), x)
        logits, dist = model.apply(v, x)
        assert logits.shape == (2, 9, 9, 3)
        assert dist.shape == (2, 9, 9, 6)
        # push_forward
        f, d = model.apply(v, x, method=PPNet.push_forward)
        assert f.shape == (2, 9, 9, 8)
        assert d.shape == (2, 9, 9, 6)
    finally:
        ppnet_mod.build_backbone = orig


def test_ppnet_last_layer_init_incorrect_connection():
    cfg = _tiny_ppnet_cfg()
    import adlm_tpu.models.ppnet as ppnet_mod
    orig = ppnet_mod.build_backbone
    ppnet_mod.build_backbone = lambda c: MSC(
        base=DeepLabV2(out_features=c.deeplab_n_features, **SMALL_DL),
        scales=())
    try:
        model = PPNet(cfg=cfg)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 33, 3)))
        w = np.asarray(v["params"]["last_layer"])
    finally:
        ppnet_mod.build_backbone = orig
    assert w.shape == (6, 3)
    for p in range(6):
        for c in range(3):
            expected = 1.0 if p // 2 == c else -0.5
            assert w[p, c] == expected
    protos = np.asarray(v["params"]["prototype_vectors"])
    assert (protos >= 0).all() and (protos <= 1).all()  # torch.rand init


def test_prune_params():
    params = {
        "prototype_vectors": jnp.arange(12.0).reshape(6, 2),
        "last_layer": jnp.arange(18.0).reshape(6, 3),
        "features": {"w": jnp.zeros((1,))},
    }
    pc = default_proto_class(6, 3)
    new, new_pc = prune_params(params, pc, [0, 2, 3, 5])
    assert new["prototype_vectors"].shape == (4, 2)
    assert new["last_layer"].shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(new_pc), [0, 1, 1, 2])
    np.testing.assert_array_equal(
        np.asarray(new["prototype_vectors"][0]), [0.0, 1.0])


def test_unet_param_count_matches_reference_torch():
    """Param parity with the reference UNet (reference src/unet.py:49),
    loaded directly from /root/reference for the golden value."""
    torch = pytest.importorskip("torch")
    ref = _load_reference_module("ref_unet", "/root/reference/src/unet.py")
    for depth, cf in [(3, 4), (5, 6)]:
        t_model = ref.UNet(in_channels=3, out_channels=1, depth=depth, cf=cf)
        t_count = sum(p.numel() for p in t_model.parameters())
        model = UNet(out_channels=1, depth=depth, cf=cf)
        v = jax.eval_shape(lambda m=model, d=depth: m.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2 ** (d - 1) * 4,
                                              2 ** (d - 1) * 4, 3)),
            train=True))
        n = sum(int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(v["params"]))
        assert n == t_count, (depth, cf, n, t_count)


def test_unet_forward_shapes_and_batchstats():
    model = UNet(out_channels=1, depth=3, cf=3)
    x = jnp.zeros((2, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" in v
    y, updates = model.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 32, 32, 1)
    y_eval = model.apply(v, x, train=False)
    assert y_eval.shape == (2, 32, 32, 1)


def test_torch_batchnorm_no_nan_on_cancellation():
    """A channel with large mean and tiny spread drives the one-pass
    E[x²]−E[x]² variance slightly negative under f32 cancellation; the
    zero clip must keep rsqrt(var+eps) — and the running stats — finite
    (flax _compute_stats applies the same clip)."""
    from adlm_tpu.models.unet import TorchBatchNorm

    bn = TorchBatchNorm()
    rng = np.random.RandomState(2)
    # mean 1e2, spread 1e-3: the unclipped one-pass variance of this
    # exact data is −0.0146 < −epsilon, i.e. rsqrt would be NaN
    x = jnp.asarray(1e2 + 1e-3 * rng.randn(4, 16, 16, 2),
                    jnp.float32)
    v = bn.init(jax.random.PRNGKey(0), x, train=True)
    y, upd = bn.apply(v, x, train=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(
        np.asarray(upd["batch_stats"]["var"])).all()
    assert (np.asarray(upd["batch_stats"]["var"]) >= 0).all()
    # eval mode off the (clipped) running stats stays finite too
    v2 = {"params": v["params"], "batch_stats": upd["batch_stats"]}
    y2 = bn.apply(v2, x, train=False)
    assert np.isfinite(np.asarray(y2)).all()


def test_receptive_field_matches_reference_math():
    ref = _load_reference_module("ref_rf", "/root/reference/receptive_field.py")
    from adlm_tpu.models.backbones import ResNetFeatures
    from adlm_tpu.utils.receptive_field import proto_layer_rf_info

    stem = ResNetFeatures(arch="resnet18")
    ks, ss, ps = stem.conv_info()
    ours = proto_layer_rf_info(224, ks, ss, ps, 1)
    theirs = ref.compute_proto_layer_rf_info_v2(224, ks, ss, ps, 1)
    assert ours == theirs


def test_s2b_dilated_conv_exact():
    """Space-to-batch lowering of the d=2/4 convs (layers.ConvBN s2b)
    is numerically exact vs the dilated lowering — same params, same
    forward, same gradients — including non-divisible H/W."""
    import jax
    import jax.numpy as jnp
    from adlm_tpu.models.deeplab import DeepLabV2

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 33, 41, 3).astype(np.float32))
    ref = DeepLabV2(out_features=8, n_blocks=(1, 1, 1, 1),
                    s2b_dilated=False)
    s2b = DeepLabV2(out_features=8, n_blocks=(1, 1, 1, 1),
                    s2b_dilated=True)
    v = ref.init(jax.random.PRNGKey(0), x)
    # identical parameter tree — checkpoints/imports are interchangeable
    v2 = s2b.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))

    a = ref.apply(v, x)
    b = s2b.apply(v, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    def loss(variables, model):
        return jnp.sum(model.apply(variables, x) ** 2)

    ga = jax.grad(lambda p: loss({"params": p,
                                  "constants": v["constants"]}, ref))(
        v["params"])
    gb = jax.grad(lambda p: loss({"params": p,
                                  "constants": v["constants"]}, s2b))(
        v["params"])
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), rtol=1e-4, atol=1e-4), ga, gb)
