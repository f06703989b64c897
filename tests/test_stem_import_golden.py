"""Golden tests: torchvision-style ImageNet stem import vs the
reference's ACTUAL torch feature modules.

The reference loads model-zoo weights into each classification stem
(reference resnet_features.py:227-296, vgg_features.py:104-271,
densenet_features.py:178-311).  Here we instantiate the reference's own
torch modules (they import only torch), push their random state_dicts
through ``load_classification_backbone``, and assert the Flax stems
produce the same features.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from adlm_tpu.models.backbones import (  # noqa: E402
    build_classification_backbone,
)
from adlm_tpu.utils.torch_import import (  # noqa: E402
    load_classification_backbone,
)

sys.path.insert(0, "/root/reference")


def _ref_stem(arch):
    if arch.startswith("resnet"):
        import resnet_features as m
    elif arch.startswith("vgg"):
        import vgg_features as m
    elif arch.startswith("densenet"):
        import densenet_features as m
    return getattr(m, f"{arch}_features")(pretrained=False)


def _import_and_compare(arch, size=64, atol=2e-4):
    torch.manual_seed(0)
    tmodel = _ref_stem(arch).eval()
    sd = tmodel.state_dict()

    model = build_classification_backbone(arch)
    rng = np.random.RandomState(0)
    x = rng.rand(1, size, size, 3).astype(np.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = jax.tree.map(np.asarray, dict(v["params"]))
    bstats = jax.tree.map(np.asarray, dict(v.get("batch_stats", {})))

    report = load_classification_backbone(params, bstats, sd, arch,
                                          backbone_path=())
    assert report["unexpected_keys"] == [], report["unexpected_keys"]
    n_tensors = sum(1 for k in sd
                    if not k.endswith("num_batches_tracked"))
    assert len(report["loaded"]) == n_tensors

    out = model.apply({"params": jax.tree.map(jnp.asarray, params),
                       "batch_stats": jax.tree.map(jnp.asarray, bstats)},
                      jnp.asarray(x), train=False)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert out.shape == tout.shape, (out.shape, tout.shape)
    np.testing.assert_allclose(np.asarray(out), tout, atol=atol)


def test_resnet18_import_golden():
    _import_and_compare("resnet18")


def test_resnet50_import_golden():
    _import_and_compare("resnet50")


def test_vgg11_import_golden():
    _import_and_compare("vgg11")


def test_vgg13_bn_import_golden():
    _import_and_compare("vgg13_bn")


@pytest.mark.slow
def test_densenet121_import_golden():
    _import_and_compare("densenet121", atol=5e-4)
