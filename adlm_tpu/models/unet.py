"""Parametric U-Net (NHWC, flax.linen).

Mirrors the reference architecture exactly (reference src/unet.py:37-81):
depth ``d`` conv-bn-relu×2 down blocks with 2×2 max-pool, up path of
nearest-×2 upsample + conv-bn-relu then skip-concat + double conv, and a
1×1 head.  BN here is *trainable* (unlike the frozen DeepLab backbone) —
running stats live in the ``batch_stats`` collection, with torch's
running-variance semantics (see TorchBatchNorm) so training
trajectories are golden-comparable to the reference and torch
checkpoints import exactly (utils/torch_import.load_unoise_unet).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch ``nn.BatchNorm2d`` semantics.

    Differs from ``flax.linen.BatchNorm`` in one way that matters for
    parity with the reference: the running variance accumulates the
    UNBIASED batch variance (``·n/(n−1)``) while normalization uses the
    biased one (torch batchnorm docs); flax accumulates the biased
    estimate.  ``momentum`` follows the torch convention — the weight
    of the NEW batch statistic (torch default 0.1).

    Statistics are computed in float32 regardless of input dtype (the
    bf16 path would otherwise accumulate bf16 rounding into the running
    stats); the normalized output is cast back to the input dtype.
    Under GSPMD a ``data``-sharded batch still yields global batch
    statistics — the means lower to psums over ICI.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            # fast one-pass variance, clipped at zero: E[x²]−E[x]² can
            # go slightly negative under f32 cancellation for
            # large-mean/small-spread channels, which would turn
            # rsqrt(var+eps) into NaN and poison the running stats.
            # Same fix as flax.linen's _compute_stats; the one-pass
            # reduction structure also keeps dp-sharded batch stats
            # bit-tight vs single device (tests/test_parallel.py).
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axes) - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size // feat
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                dt = ra_mean.value.dtype
                ra_mean.value = ((1.0 - m) * ra_mean.value.astype(jnp.float32)
                                 + m * mean).astype(dt)
                ra_var.value = ((1.0 - m) * ra_var.value.astype(jnp.float32)
                                + m * unbiased).astype(dt)
        else:
            mean = ra_mean.value.astype(jnp.float32)
            var = ra_var.value.astype(jnp.float32)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"conv{i}")(x)
            x = TorchBatchNorm(name=f"bn{i}")(x, train)
            x = nn.relu(x)
        return x


class Up(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        # torch nn.Upsample(scale_factor=2) default mode is 'nearest'
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    name="up_conv")(x)
        x = TorchBatchNorm(name="up_bn")(x, train)
        x = nn.relu(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return ConvBlock(self.features, name="conv")(x, train)


class UNet(nn.Module):
    """Args mirror the reference: depth and channel factor ``cf``
    (first block outputs ``2**cf`` channels)."""

    out_channels: int = 1
    depth: int = 5
    cf: int = 6

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        skips = []
        for i in range(self.depth):
            x = ConvBlock(2 ** (self.cf + i), name=f"down{i}")(x, train)
            if i != self.depth - 1:
                skips.append(x)
                x = nn.max_pool(x, (2, 2), (2, 2))
        for i in reversed(range(self.depth - 1)):
            x = Up(2 ** (self.cf + i), name=f"up{i}")(x, skips[i], train)
        return nn.Conv(self.out_channels, (1, 1), name="head")(x)
