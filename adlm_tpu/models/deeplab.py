"""DeepLabV2: dilated ResNet-101 (output stride 8) + ASPP, NHWC.

Rebuilds the backbone the reference imports from its *missing*
``deeplab_pytorch`` submodule (reference deeplab_features.py:5,
.gitmodules:1-3) — structure recovered from the import sites:

* ``DeepLabV2(n_classes=64, n_blocks=[3,4,23,3], atrous_rates=[6,12,18,24])``
  (reference deeplab_features.py:52-60)
* param naming ``layer1.conv1.{conv,bn}``,
  ``layer{2..5}.block{n}.{reduce,conv3x3,increase,shortcut}.{conv,bn}``,
  ``aspp.c0..c3`` (reference deeplab_features.py:8-49, module.py:335-343)
* stem: 7×7/2 conv + BN + relu + 3×3/2 ceil-mode max pool; layers 2-5
  with strides (1,2,1,1) and dilations (1,1,2,4) → output stride 8
  (1024×2048 input → 129×257 grid, matching reference push.py:276 comment)
* ASPP: four parallel 3×3 convs with the atrous rates, summed
* frozen BN throughout (see layers.FrozenBatchNorm)

Geometry verified against the reference in tests/test_models.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from adlm_tpu.models.layers import ConvBN, FrozenBatchNorm, max_pool_ceil
from adlm_tpu.ops.resize import resize_bilinear, resize_bilinear_factor


class Bottleneck(nn.Module):
    """Caffe-style bottleneck: stride on the 1×1 reduce conv
    (deeplab-pytorch convention; weight shapes identical to torchvision)."""

    mid: int
    out: int
    stride: int
    dilation: int
    shortcut: bool  # projection shortcut on the first block of a layer
    s2b: bool = False  # space-to-batch dilated conv (see layers.ConvBN)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = ConvBN(self.mid, 1, self.stride, 1, relu=True, name="reduce")(x)
        h = ConvBN(self.mid, 3, 1, self.dilation, relu=True, name="conv3x3",
                   s2b=self.s2b)(h)
        h = ConvBN(self.out, 1, 1, 1, relu=False, name="increase")(h)
        if self.shortcut:
            s = ConvBN(self.out, 1, self.stride, 1, relu=False,
                       name="shortcut")(x)
        else:
            s = x
        return nn.relu(h + s)


class ResLayer(nn.Module):
    n_blocks: int
    mid: int
    out: int
    stride: int
    dilation: int
    s2b: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.n_blocks):
            x = Bottleneck(
                mid=self.mid, out=self.out,
                stride=self.stride if i == 0 else 1,
                dilation=self.dilation,
                shortcut=(i == 0),
                s2b=self.s2b,
                name=f"block{i + 1}",
            )(x)
        return x


class Stem(nn.Module):
    """7×7/2 conv+BN+relu then 3×3/2 ceil-mode max pool (deeplab 'layer1')."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ConvBN(64, 7, 2, 1, relu=True, name="conv1")(x)
        return max_pool_ceil(x, 3, 2, 1)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling: parallel dilated 3×3 convs, summed.

    Conv weights are the reference's "10x" LR group, biases the "20x"
    group (reference segmentation/utils.py:51-61).
    """

    out_features: int
    rates: Sequence[int] = (6, 12, 18, 24)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        outs = []
        for i, r in enumerate(self.rates):
            outs.append(nn.Conv(
                self.out_features, (3, 3), padding=((r, r), (r, r)),
                kernel_dilation=(r, r), use_bias=True, name=f"c{i}")(x))
        return sum(outs)


class DeepLabV2(nn.Module):
    """Backbone producing an (H/8, W/8, out_features) feature map."""

    out_features: int = 64
    n_blocks: Tuple[int, ...] = (3, 4, 23, 3)
    atrous_rates: Tuple[int, ...] = (6, 12, 18, 24)
    # space-to-batch lowering for the d=2/4 layer4/5 convs — exact same
    # math and parameter tree, better MXU tiling for the backward (see
    # layers.ConvBN and PERF.md)
    s2b_dilated: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Stem(name="layer1")(x)
        x = ResLayer(self.n_blocks[0], 64, 256, 1, 1, name="layer2")(x)
        x = ResLayer(self.n_blocks[1], 128, 512, 2, 1, name="layer3")(x)
        x = ResLayer(self.n_blocks[2], 256, 1024, 1, 2,
                     s2b=self.s2b_dilated, name="layer4")(x)
        x = ResLayer(self.n_blocks[3], 512, 2048, 1, 4,
                     s2b=self.s2b_dilated, name="layer5")(x)
        return ASPP(self.out_features, self.atrous_rates, name="aspp")(x)


class MSC(nn.Module):
    """Multi-scale wrapper (reference segmentation/utils.py:64-101).

    Runs the base net at 1.0 plus ``scales``, bilinearly upsamples the
    scaled outputs to the base grid and takes the pixel-wise max.
    Training returns ``[base] + pyramid + [max]``; eval returns max only.
    With no extra scales (all deeplab configs except PASCAL/cells) it is
    a passthrough.
    """

    base: nn.Module
    scales: Tuple[float, ...] = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        logits = self.base(x)
        if not self.scales:
            return logits
        h, w = logits.shape[-3], logits.shape[-2]
        pyramid = []
        for s in self.scales:
            # torch scale_factor coordinate semantics (see
            # resize_bilinear_factor) — reference utils.py:91
            xs = resize_bilinear_factor(x, s)
            pyramid.append(self.base(xs))
        interp = [resize_bilinear(p, (h, w)) for p in pyramid]
        logits_max = jnp.max(jnp.stack([logits] + interp), axis=0)
        if train:
            return [logits] + pyramid + [logits_max]
        return logits_max
