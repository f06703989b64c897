"""Shared NN building blocks (NHWC, flax.linen).

Notable TPU-first choices:

* **FrozenBatchNorm** — the reference calls ``freeze_bn()`` on the
  backbone every step (reference segmentation/module.py:127,278) and its
  optimizer groups never include BN affine params (reference
  segmentation/utils.py:42-61 yields only Conv2d params), so backbone BN
  is *fully* frozen: running stats and affine.  We therefore store BN as
  constants in a separate ``constants`` variable collection — they never
  appear in the params pytree, can't be trained by accident, and XLA
  folds the affine transform into the adjacent conv at compile time.
* **ceil-mode max pooling** — the DeepLab stem pool uses
  ``nn.MaxPool2d(3, 2, 1, ceil_mode=True)``; we emulate ceil mode with
  explicit asymmetric -inf padding so output sizes match the reference
  exactly (1024×2048 → 129×257 feature grid).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics *and* frozen affine params.

    Variables live in the ``constants`` collection: gamma, beta, mean,
    var.  Initialized to identity (gamma=1, beta=0, mean=0, var=1);
    pretrained imports overwrite them.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.variable("constants", "gamma",
                              lambda: jnp.ones((c,), jnp.float32)).value
        beta = self.variable("constants", "beta",
                             lambda: jnp.zeros((c,), jnp.float32)).value
        mean = self.variable("constants", "mean",
                             lambda: jnp.zeros((c,), jnp.float32)).value
        var = self.variable("constants", "var",
                            lambda: jnp.ones((c,), jnp.float32)).value
        scale = gamma * jax.lax.rsqrt(var + self.eps)
        bias = beta - mean * scale
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def max_pool_ceil(x: jnp.ndarray, window: int, stride: int,
                  padding: int) -> jnp.ndarray:
    """2-D max pool with torch ``ceil_mode=True`` semantics (NHWC)."""
    h, w = x.shape[-3], x.shape[-2]

    def pads(size: int) -> Tuple[int, int]:
        out = -(-(size + 2 * padding - window) // stride) + 1  # ceil
        # torch clips windows that start entirely in the padding
        if (out - 1) * stride >= size + padding:
            out -= 1
        total = (out - 1) * stride + window - size
        return padding, max(total - padding, 0)

    ph, pw = pads(h), pads(w)
    return nn.max_pool(x, (window, window), (stride, stride),
                       padding=(ph, pw))


def max_pool(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """Plain floor-mode max pool (UNet downsampling)."""
    return nn.max_pool(x, (window, window), (stride, stride))


class ConvBN(nn.Module):
    """conv → frozen BN → optional relu (DeepLab body unit).

    ``s2b=True`` computes a dilated (stride-1) conv by space-to-batch:
    the d² phase subgrids become batch entries, the conv runs DENSE
    3×3, and the result is batch-to-space'd back — numerically exact
    (each output pixel reads exactly the taps the dilated conv reads;
    zero padding coincides) with an identical parameter tree.  On TPU
    this lets XLA tile the d=2/4 layer4/5 convs (and especially their
    backward) as ordinary convs at d²× the batch instead of lowering a
    dilated kernel — see PERF.md."""

    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    s2b: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dilation
        if self.s2b and d > 1 and self.stride == 1:
            k = self.kernel
            conv = nn.Conv(self.features, (k, k), strides=(1, 1),
                           padding=(((k - 1) // 2, (k - 1) // 2),) * 2,
                           use_bias=False, name="conv")
            B, H, W, C = x.shape
            Hp, Wp = -(-H // d) * d, -(-W // d) * d
            h = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
            h = (h.reshape(B, Hp // d, d, Wp // d, d, C)
                 .transpose(0, 2, 4, 1, 3, 5)
                 .reshape(B * d * d, Hp // d, Wp // d, C))
            h = conv(h)
            Co = self.features
            h = (h.reshape(B, d, d, Hp // d, Wp // d, Co)
                 .transpose(0, 3, 1, 4, 2, 5)
                 .reshape(B, Hp, Wp, Co))
            x = h[:, :H, :W]
        else:
            pad = d * (self.kernel - 1) // 2
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((pad, pad), (pad, pad)),
                        kernel_dilation=(d, d),
                        use_bias=False, name="conv")(x)
        x = FrozenBatchNorm(name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x
