"""Parametric U-Net (NHWC, flax.linen).

Mirrors the reference architecture exactly (reference src/unet.py:37-81):
depth ``d`` conv-bn-relu×2 down blocks with 2×2 max-pool, up path of
nearest-×2 upsample + conv-bn-relu then skip-concat + double conv, and a
1×1 head.  BN here is *trainable* (unlike the frozen DeepLab backbone) —
running stats live in the ``batch_stats`` collection.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
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
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="up_bn")(x)
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
