"""Classification feature backbones for the legacy ProtoPNet path.

The reference registers ResNet/DenseNet/VGG feature stems
(reference model.py:19-36, resnet_features.py / densenet_features.py /
vgg_features.py), each exposing ``conv_info()`` for the receptive-field
calculator.  Implemented here: ResNet-18/34/50/101/152,
VGG-11/13/16/19 (±BN), and DenseNet-121/161/169/201 — the full
reference registry (plus deeplabv2_resnet101 in models/deeplab.py).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(h)
        if self.project:
            x = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        use_bias=False, name="proj_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name="proj_bn")(x)
        return nn.relu(h + x)


class BottleneckBlock(nn.Module):
    mid: int
    stride: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = self.mid * 4
        h = nn.Conv(self.mid, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(h)
        h = nn.relu(h)
        # torchvision v1.5 convention: stride on the 3x3
        h = nn.Conv(self.mid, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out, (1, 1), use_bias=False, name="conv3")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn3")(h)
        if self.project:
            x = nn.Conv(out, (1, 1), (self.stride, self.stride),
                        use_bias=False, name="proj_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name="proj_bn")(x)
        return nn.relu(h + x)


_RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


class ResNetFeatures(nn.Module):
    """torchvision-style feature stem (no avgpool/fc) — reference
    resnet_features.py:227-296."""

    arch: str

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kind, blocks = _RESNET_SPECS[self.arch]
        x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for li, (n, w) in enumerate(zip(blocks, widths)):
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                project = bi == 0 and (li > 0 or kind == "bottleneck")
                if kind == "basic":
                    x = BasicBlock(w, stride, project,
                                   name=f"layer{li + 1}_block{bi}")(x, train)
                else:
                    x = BottleneckBlock(w, stride, project,
                                        name=f"layer{li + 1}_block{bi}")(x, train)
        return x

    def conv_info(self) -> Tuple[List[int], List[int], List[int]]:
        """(kernel_sizes, strides, paddings) for the RF calculator
        (reference resnet_features.py:207-225)."""
        kind, blocks = _RESNET_SPECS[self.arch]
        ks, ss, ps = [7, 3], [2, 2], [3, 1]
        for li, n in enumerate(blocks):
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                if kind == "basic":
                    ks += [3, 3]; ss += [stride, 1]; ps += [1, 1]
                else:
                    ks += [1, 3, 1]; ss += [1, stride, 1]; ps += [0, 1, 0]
        return ks, ss, ps


_VGG_SPECS = {
    "vgg11": (1, 1, 2, 2, 2),
    "vgg13": (2, 2, 2, 2, 2),
    "vgg16": (2, 2, 3, 3, 3),
    "vgg19": (2, 2, 4, 4, 4),
}


class VGGFeatures(nn.Module):
    """VGG feature stem ±BN (reference vgg_features.py:104-271)."""

    arch: str  # e.g. 'vgg16' or 'vgg16_bn'

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        name = self.arch.replace("_bn", "")
        use_bn = self.arch.endswith("_bn")
        widths = (64, 128, 256, 512, 512)
        for si, (n, w) in enumerate(zip(_VGG_SPECS[name], widths)):
            for ci in range(n):
                x = nn.Conv(w, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"stage{si}_conv{ci}")(x)
                if use_bn:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, name=f"stage{si}_bn{ci}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), (2, 2))
        return x

    def conv_info(self) -> Tuple[List[int], List[int], List[int]]:
        name = self.arch.replace("_bn", "")
        ks, ss, ps = [], [], []
        for n in _VGG_SPECS[name]:
            for _ in range(n):
                ks.append(3); ss.append(1); ps.append(1)
            ks.append(2); ss.append(2); ps.append(0)
        return ks, ss, ps


# growth rate, block config, init features
_DENSENET_SPECS = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
}


class DenseNetFeatures(nn.Module):
    """DenseNet feature stem (reference densenet_features.py:178-311):
    stem conv7/2 + pool, dense blocks (BN-ReLU-1×1(4k)-BN-ReLU-3×3(k),
    concat), transitions (BN-ReLU-1×1(half)-avgpool2), final BN+ReLU."""

    arch: str

    def _bn_relu_conv(self, x, features, kernel, name, train,
                      stride=1):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name=f"{name}_bn")(x)
        x = nn.relu(x)
        pad = (kernel - 1) // 2
        return nn.Conv(features, (kernel, kernel), (stride, stride),
                       padding=((pad, pad), (pad, pad)), use_bias=False,
                       name=f"{name}_conv")(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        growth, blocks, init_feats = _DENSENET_SPECS[self.arch]
        x = nn.Conv(init_feats, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        n_feats = init_feats
        for bi, n_layers in enumerate(blocks):
            for li in range(n_layers):
                h = self._bn_relu_conv(x, 4 * growth, 1,
                                       f"block{bi}_layer{li}_a", train)
                h = self._bn_relu_conv(h, growth, 3,
                                       f"block{bi}_layer{li}_b", train)
                x = jnp.concatenate([x, h], axis=-1)
                n_feats += growth
            if bi != len(blocks) - 1:
                n_feats = n_feats // 2
                x = self._bn_relu_conv(x, n_feats, 1,
                                       f"transition{bi}", train)
                x = nn.avg_pool(x, (2, 2), (2, 2))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn_final")(x)
        return nn.relu(x)

    def conv_info(self) -> Tuple[List[int], List[int], List[int]]:
        _, blocks, _ = _DENSENET_SPECS[self.arch]
        ks, ss, ps = [7, 3], [2, 2], [3, 1]
        for bi, n_layers in enumerate(blocks):
            for _ in range(n_layers):
                ks += [1, 3]; ss += [1, 1]; ps += [0, 1]
            if bi != len(blocks) - 1:
                ks += [1, 2]; ss += [1, 2]; ps += [0, 0]
        return ks, ss, ps


def build_classification_backbone(arch: str) -> nn.Module:
    if arch in _RESNET_SPECS:
        return ResNetFeatures(arch=arch)
    if arch.replace("_bn", "") in _VGG_SPECS:
        return VGGFeatures(arch=arch)
    if arch in _DENSENET_SPECS:
        return DenseNetFeatures(arch=arch)
    raise NotImplementedError(
        f"backbone {arch!r} not implemented (have resnets, vggs, "
        f"densenets, deeplabv2_resnet101)")


def backbone_out_channels(arch: str) -> int:
    if arch in _RESNET_SPECS:
        return 512 if _RESNET_SPECS[arch][0] == "basic" else 2048
    if arch.replace("_bn", "") in _VGG_SPECS:
        return 512
    if arch in _DENSENET_SPECS:
        growth, blocks, init_feats = _DENSENET_SPECS[arch]
        n = init_feats
        for bi, n_layers in enumerate(blocks):
            n += growth * n_layers
            if bi != len(blocks) - 1:
                n = n // 2
        return n
    raise NotImplementedError(arch)
