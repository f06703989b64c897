"""Composed train-step golden: reference ``_step`` in torch vs our jitted step.

Assembles the reference's COMPLETE training-step math
(reference segmentation/module.py:119-243: MSC forward → per-scale
nearest label resize → void-dropped CE → KLD prototype-pair loop →
masked L1 → weighted sum averaged over scales) in torch on a tiny PPNet
whose weights are exported FROM the Flax model, and asserts total loss
and gradients match.  The prototype L2 convolution on the torch side is
the reference's actual ``_l2_convolution`` exec'd from source
(see test_reference_golden).

Runs with ``kld_raw_label_indexing=True`` — bit-parity with the
reference's raw-label class indexing (module.py:170-178).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from PIL import Image  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from adlm_tpu.core.config import (  # noqa: E402
    DataConfig,
    ExperimentConfig,
    PPNetConfig,
    TrainConfig,
)
from adlm_tpu.models.ppnet import PPNet, default_proto_class  # noqa: E402
from adlm_tpu.train.protoseg import loss_fn  # noqa: E402

from test_backbone_golden import TorchDeepLabV2  # noqa: E402
from test_reference_golden import _extract_ppnet_methods  # noqa: E402


# ---------------------------------------------------------------------------
# Tiny experiment config shared by both sides
# ---------------------------------------------------------------------------

N_CLASSES = 3
N_PROTOS = 6
PROTO_CH = 8
N_FEAT = 8
N_BLOCKS = (1, 1, 1, 1)
EPS = 1e-4


def _make_cfg(msc_scales=(), w_kld=0.25):
    return ExperimentConfig(
        name="golden",
        model=PPNetConfig(
            num_prototypes=N_PROTOS, num_classes=N_CLASSES,
            prototype_channels=PROTO_CH, deeplab_n_features=N_FEAT,
            deeplab_n_blocks=N_BLOCKS, img_size=33,
            add_on_layers_type="deeplab_simple", msc_scales=msc_scales,
            epsilon=EPS),
        data=DataConfig(class_table="mds"),
        train=TrainConfig(loss_weight_crs_ent=1.0, loss_weight_kld=w_kld,
                          loss_weight_l1=1e-4, ignore_void_class=True,
                          kld_raw_label_indexing=True),
    )


# ---------------------------------------------------------------------------
# Flax params → torch tensors
# ---------------------------------------------------------------------------


def _flax_backbone_to_torch_sd(params, constants):
    """Walk the Flax DeepLabV2 trees and emit a deeplab-named torch
    state_dict (inverse of utils/torch_import.py)."""
    sd = {}

    def walk(tree, prefix, is_const):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + [k], is_const)
            else:
                path = list(prefix)
                leaf = k
                arr = np.asarray(v)
                if is_const:
                    name = {"gamma": "weight", "beta": "bias",
                            "mean": "running_mean", "var": "running_var"}[leaf]
                    sd[".".join(path) + "." + name] = torch.tensor(arr)
                elif leaf == "kernel":
                    sd[".".join(path) + ".weight"] = torch.tensor(
                        np.transpose(arr, (3, 2, 0, 1)))
                else:
                    sd[".".join(path) + "." + leaf] = torch.tensor(arr)

    walk(params, [], False)
    walk(constants, [], True)
    return sd


class TorchPPNet(nn.Module):
    """Reference PPNet assembly (model.py:40-283) on a tiny DeepLabV2:
    deeplab_simple add-on (sigmoid), reference ``_l2_convolution``
    (exec'd from source), log similarity, bias-free last layer."""

    def __init__(self, msc_scales=()):
        super().__init__()
        self.backbone = TorchDeepLabV2(N_FEAT, N_BLOCKS, (6, 12, 18, 24))
        self.msc_scales = msc_scales
        self.prototype_vectors = nn.Parameter(
            torch.rand(N_PROTOS, PROTO_CH, 1, 1))
        self.register_buffer("ones", torch.ones(N_PROTOS, PROTO_CH, 1, 1))
        self.last_layer = nn.Linear(N_PROTOS, N_CLASSES, bias=False)
        self._ref_l2, _ = _extract_ppnet_methods()

    def _msc(self, x):
        """Reference MSC (segmentation/utils.py:77-101), training mode."""
        logits = self.backbone(x)
        if not self.msc_scales:
            return [logits]
        H, W = logits.shape[2], logits.shape[3]
        pyramid = [self.backbone(F.interpolate(
            x, scale_factor=s, mode="bilinear", align_corners=False))
            for s in self.msc_scales]
        interp = [F.interpolate(p, size=(H, W), mode="bilinear",
                                align_corners=False) for p in pyramid]
        logits_max = torch.max(torch.stack([logits] + interp), dim=0)[0]
        return [logits] + pyramid + [logits_max]

    def forward(self, x):
        """Returns [(output (B,h,w,K), distances (B,P,h,w)), ...]
        (reference model.py:239-283, return_activations=False)."""
        outs = []
        for f in self._msc(x):
            f = torch.sigmoid(f)  # deeplab_simple add-on (model.py:99-101)
            d = self._ref_l2(f, self.prototype_vectors, self.ones)
            B, P, h, w = d.shape
            dist_flat = d.permute(0, 2, 3, 1).reshape(-1, P)
            sim = torch.log((dist_flat + 1.0) / (dist_flat + EPS))
            logits = self.last_layer(sim).reshape(B, h, w, N_CLASSES)
            outs.append((logits, d))
        return outs


def _reference_step_loss(ppnet: TorchPPNet, images, labels, proto_class,
                         w_ce=1.0, w_kld=0.25, w_l1=1e-4):
    """The reference ``_step`` loss math verbatim-in-torch
    (segmentation/module.py:119-243, ignore_void_class=True)."""
    ppnet.train()
    ppnet.backbone.freeze_bn()  # module.py:127
    n_protos = len(proto_class)  # may be < N_PROTOS after pruning
    identity = torch.zeros(n_protos, N_CLASSES)
    identity[torch.arange(n_protos), torch.tensor(proto_class)] = 1.0

    outputs = ppnet(images)
    mcs_loss = 0.0
    for output, patch_activations in outputs:
        # per-sample PIL nearest label resize (module.py:142-146,
        # dataset.py:23-31; PIL size is (width, height))
        target = torch.stack([
            torch.LongTensor(np.asarray(Image.fromarray(
                lab.astype(float)).resize(
                (output.shape[2], output.shape[1]),
                resample=Image.NEAREST)))
            for lab in labels])

        out_flat = output.reshape(-1, output.shape[-1])
        target_img = target.reshape(target.shape[0], -1)
        tgt = target.flatten()

        pa = patch_activations.permute(0, 2, 3, 1)
        pa_img = pa.reshape(pa.shape[0], -1, pa.shape[-1])

        not_void = (tgt != 0).nonzero().squeeze()
        tgt = tgt[not_void] - 1
        out_flat = out_flat[not_void]
        ce = F.cross_entropy(out_flat, tgt.long())

        # KLD triple loop (module.py:167-208) — raw label indexing
        kld_terms = []
        for img_i in range(len(target_img)):
            for cls_i in torch.unique(target_img[img_i]).numpy():
                if cls_i < 0 or cls_i >= N_CLASSES:
                    continue
                cls_protos = torch.nonzero(
                    identity[:, cls_i]).flatten().numpy()
                if len(cls_protos) == 0:
                    continue
                cls_mask = (target_img[img_i] == cls_i)
                log_acts = [torch.masked_select(pa_img[img_i, :, i], cls_mask)
                            for i in cls_protos]
                log_acts = [F.log_softmax(a, dim=0) for a in log_acts]
                for i in range(len(cls_protos)):
                    if len(cls_protos) < 2 or len(log_acts[0]) < 2:
                        continue
                    for j in range(i + 1, len(cls_protos)):
                        kld1 = F.kl_div(log_acts[i], log_acts[j],
                                        log_target=True, reduction="sum")
                        kld2 = F.kl_div(log_acts[j], log_acts[i],
                                        log_target=True, reduction="sum")
                        kld_terms.append((kld1 + kld2) / 2.0)
        if kld_terms:
            kld_loss = torch.mean(torch.exp(-torch.stack(kld_terms)))
        else:
            kld_loss = torch.zeros(())

        l1_mask = 1 - torch.t(identity)
        l1 = (ppnet.last_layer.weight * l1_mask).norm(p=1)

        loss = w_ce * ce + w_kld * kld_loss + w_l1 * l1
        mcs_loss = mcs_loss + loss / len(outputs)
    return mcs_loss


def _build_pair(cfg, seed=0):
    """Init the Flax PPNet, export its weights into the torch PPNet."""
    model = PPNet(cfg=cfg.model)
    x = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x)
    params = jax.tree.map(np.asarray, variables["params"])
    constants = jax.tree.map(np.asarray, variables["constants"])

    tp = TorchPPNet(msc_scales=cfg.model.msc_scales)
    sd = _flax_backbone_to_torch_sd(params["features"]["base"],
                                    constants["features"]["base"])
    missing, unexpected = tp.backbone.load_state_dict(sd, strict=False)
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    assert unexpected == [], unexpected
    with torch.no_grad():
        tp.prototype_vectors.copy_(torch.tensor(
            params["prototype_vectors"][:, :, None, None]))
        tp.last_layer.weight.copy_(torch.tensor(params["last_layer"].T))
    return model, params, constants, tp


def _compare_step(cfg, labels, seed=0, rtol=2e-4, atol=1e-5):
    rng = np.random.RandomState(seed)
    B = labels.shape[0]
    images = rng.rand(B, 33, 33, 3).astype(np.float32)
    model, params, constants, tp = _build_pair(cfg, seed)
    proto_class = default_proto_class(N_PROTOS, N_CLASSES)

    # --- torch: loss + backward ---
    xt = torch.tensor(np.transpose(images, (0, 3, 1, 2)))
    loss_t = _reference_step_loss(tp, xt, labels, np.asarray(proto_class),
                                  w_kld=cfg.train.loss_weight_kld)
    loss_t.backward()

    # --- flax: loss + grad (train step body, protoseg.loss_fn) ---
    def f(p):
        total, _ = loss_fn(p, constants, model, proto_class, cfg,
                           (jnp.asarray(images), jnp.asarray(labels)), True)
        return total

    loss_j, grads = jax.value_and_grad(f)(params)

    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=rtol)
    # gradient comparison on the head and a backbone tensor
    np.testing.assert_allclose(
        np.asarray(grads["prototype_vectors"]),
        tp.prototype_vectors.grad.numpy()[:, :, 0, 0], rtol=1e-3, atol=atol)
    np.testing.assert_allclose(
        np.asarray(grads["last_layer"]),
        tp.last_layer.weight.grad.numpy().T, rtol=1e-3, atol=atol)
    np.testing.assert_allclose(
        np.asarray(grads["features"]["base"]["aspp"]["c0"]["kernel"]),
        np.transpose(tp.backbone.aspp.c0.weight.grad.numpy(), (2, 3, 1, 0)),
        rtol=1e-3, atol=atol)
    np.testing.assert_allclose(
        np.asarray(
            grads["features"]["base"]["layer2"]["block1"]["conv3x3"]
            ["conv"]["kernel"]),
        np.transpose(
            tp.backbone.layer2.block1.conv3x3.conv.weight.grad.numpy(),
            (2, 3, 1, 0)), rtol=1e-3, atol=atol)
    return float(loss_j)


def _random_labels(seed, void_frac=0.3, B=2, H=33, W=33):
    rng = np.random.RandomState(seed)
    lab = rng.randint(1, N_CLASSES + 1, size=(B, H, W))
    lab[rng.rand(B, H, W) < void_frac] = 0
    return lab.astype(np.int64)


def test_composed_step_batch0():
    _compare_step(_make_cfg(), _random_labels(0))


def test_composed_step_batch1():
    _compare_step(_make_cfg(), _random_labels(1), seed=1)


def test_composed_step_void_heavy():
    """Void-dominated batch (95% void) — exercises the CE void drop and
    the KLD <2-pixel skip rule."""
    _compare_step(_make_cfg(), _random_labels(2, void_frac=0.95), seed=2)


@pytest.mark.slow
def test_composed_step_msc_multiscale():
    """PASCAL-style MSC (0.5, 0.75): per-scale losses averaged over the
    4 outputs [base, 0.5, 0.75, max] (module.py:141-228)."""
    _compare_step(_make_cfg(msc_scales=(0.5, 0.75)), _random_labels(3),
                  seed=3)


def test_composed_step_no_kld():
    """loss_weight_kld=0 presets: our step skips the KLD computation
    entirely (the reference still pays its cost — recorded bug)."""
    _compare_step(_make_cfg(w_kld=0.0), _random_labels(4), seed=4)
