"""PPNet — prototype classification head over a feature backbone.

TPU-native redesign of the reference ``PPNet`` (reference model.py:40-418):

* prototype kernels are 1×1 in every shipped config, so prototypes are a
  (P, C) matrix and the whole distance→similarity→last-layer chain runs
  through the fused Pallas head (`adlm_tpu.ops.prototype`).
* layout is NHWC; "per-patch classification" needs no permute/reshape
  dance (reference model.py:266-283) — the head maps (B,H,W,C)→(B,H,W,K)
  directly.
* pruning does not mutate the module in place (reference
  model.py:311-336 does parameter surgery); `prune_params` materializes
  a new, smaller parameter pytree and the model is rebuilt with the new
  prototype count — jit sees a clean static shape.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from adlm_tpu.core.config import PPNetConfig
from adlm_tpu.models.deeplab import MSC, DeepLabV2
from adlm_tpu.ops.prototype import distance_to_similarity, prototype_head

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
# (reference model.py:373-380)
_kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _last_layer_init(num_prototypes: int, num_classes: int,
                     incorrect_strength: float = -0.5):
    """+1 on own-class connections, `incorrect_strength` elsewhere
    (reference model.py:359-371). Weight layout is (P, K)."""
    k = num_prototypes // num_classes

    def init(key, shape, dtype=jnp.float32):
        assert shape == (num_prototypes, num_classes)
        proto_class = jnp.arange(num_prototypes) // k
        onehot = (proto_class[:, None] == jnp.arange(num_classes)[None, :])
        return jnp.where(onehot, 1.0, incorrect_strength).astype(dtype)

    return init


class AddOnLayers(nn.Module):
    """Add-on 1×1 conv stack between backbone and prototype layer
    (reference model.py:97-136).

    ``presigmoid_ln`` inserts a per-pixel LayerNorm immediately before
    the final sigmoid — the from-scratch trainability knob (see
    PPNetConfig.presigmoid_ln; default off preserves exact reference
    architecture/checkpoint parity)."""

    kind: str
    in_channels: int
    proto_channels: int
    bottleneck_stride: Optional[int] = None
    presigmoid_ln: bool = False

    def _sigmoid(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.presigmoid_ln:
            x = nn.LayerNorm(name="presigmoid_ln")(x)
        return nn.sigmoid(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "deeplab_simple":
            return self._sigmoid(x)

        idx = 0
        if self.kind == "bottleneck_pool":
            x = nn.Conv(self.in_channels, (3, 3),
                        strides=(self.bottleneck_stride,) * 2,
                        padding=((1, 1), (1, 1)), kernel_init=_kaiming_out,
                        name=f"conv{idx}")(x)
            x = nn.relu(x)
            idx += 1

        if self.kind.startswith("bottleneck"):
            cur_in = self.in_channels
            first = True
            while cur_in > self.proto_channels or (first and idx == 0):
                first = False
                cur_out = max(self.proto_channels, cur_in // 2)
                x = nn.Conv(cur_out, (1, 1), kernel_init=_kaiming_out,
                            name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
                x = nn.Conv(cur_out, (1, 1), kernel_init=_kaiming_out,
                            name=f"conv{idx}")(x)
                idx += 1
                if cur_out > self.proto_channels:
                    x = nn.relu(x)
                else:
                    assert cur_out == self.proto_channels
                    x = self._sigmoid(x)
                cur_in = cur_in // 2
            return x

        # 'regular' (reference model.py:130-136)
        x = nn.Conv(self.proto_channels, (1, 1), kernel_init=_kaiming_out,
                    name="conv0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.proto_channels, (1, 1), kernel_init=_kaiming_out,
                    name="conv1")(x)
        return self._sigmoid(x)


def build_backbone(cfg: PPNetConfig) -> nn.Module:
    """Backbone registry (reference model.py:19-36)."""
    if cfg.base_architecture == "deeplabv2_resnet101":
        base = DeepLabV2(out_features=cfg.deeplab_n_features,
                         n_blocks=tuple(cfg.deeplab_n_blocks),
                         atrous_rates=tuple(cfg.atrous_rates),
                         s2b_dilated=cfg.dilated_space_to_batch)
        return MSC(base=base, scales=tuple(cfg.msc_scales))
    from adlm_tpu.models.backbones import build_classification_backbone
    return build_classification_backbone(cfg.base_architecture)


class PPNet(nn.Module):
    cfg: PPNetConfig

    def setup(self):
        c = self.cfg
        self.features = build_backbone(c)
        if c.base_architecture == "deeplabv2_resnet101":
            add_on_in = c.deeplab_n_features
        else:
            from adlm_tpu.models.backbones import backbone_out_channels
            add_on_in = backbone_out_channels(c.base_architecture)
        self.add_on_layers = AddOnLayers(
            kind=c.add_on_layers_type,
            in_channels=add_on_in,
            proto_channels=c.prototype_channels,
            bottleneck_stride=c.bottleneck_stride,
            presigmoid_ln=c.presigmoid_ln,
            name="add_on",
        )
        # torch.rand init (reference model.py:54)
        self.prototype_vectors = self.param(
            "prototype_vectors",
            lambda key, shape: jax.random.uniform(key, shape),
            (c.num_prototypes, c.prototype_channels))
        self.last_layer_weight = self.param(
            "last_layer",
            _last_layer_init(c.num_prototypes, c.num_classes),
            (c.num_prototypes, c.num_classes))

    # -- feature path ------------------------------------------------------
    def conv_features(self, x: jnp.ndarray, train: bool = False):
        """Backbone + add-on (reference model.py:164-175). Returns a
        list when MSC multi-scale training is active."""
        f = self.features(x, train=train)
        if isinstance(f, list):
            return [self.add_on_layers(fi) for fi in f]
        return self.add_on_layers(f)

    # -- heads ---------------------------------------------------------------
    def head(self, conv_features: jnp.ndarray, return_distances: bool = True
             ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Per-patch logits (+ distances) from conv features
        (reference model.py:259-283 patch_classification branch)."""
        return prototype_head(
            conv_features, self.prototype_vectors, self.last_layer_weight,
            self.cfg.prototype_activation, self.cfg.epsilon,
            return_distances)

    def global_head(self, conv_features: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Legacy ProtoPNet image classification: global min-pool over
        patch distances (reference model.py:285-299)."""
        _, d = prototype_head(
            conv_features, self.prototype_vectors, self.last_layer_weight,
            self.cfg.prototype_activation, self.cfg.epsilon, True)
        min_d = jnp.min(d, axis=(-3, -2))  # (B, P)
        act = distance_to_similarity(min_d, self.cfg.prototype_activation,
                                     self.cfg.epsilon)
        logits = act @ self.last_layer_weight.astype(jnp.float32)
        return logits, min_d

    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_distances: bool = True
                 ) -> Union[Tuple, List[Tuple]]:
        f = self.conv_features(x, train=train)
        if isinstance(f, list):
            return [self.head(fi, return_distances) for fi in f]
        if self.cfg.patch_classification:
            return self.head(f, return_distances)
        return self.global_head(f)

    def push_forward(self, x: jnp.ndarray):
        """(conv_features, distances) for the push phase
        (reference model.py:301-309)."""
        f = self.conv_features(x, train=False)
        if isinstance(f, list):
            raise ValueError("push uses single-scale features")
        _, d = self.head(f, return_distances=True)
        return f, d


def default_proto_class(num_prototypes: int, num_classes: int) -> jnp.ndarray:
    """(P,) class id per prototype: contiguous equal blocks
    (reference model.py:66-73)."""
    k = num_prototypes // num_classes
    return jnp.arange(num_prototypes) // k


def prune_params(params: Any, proto_class: jnp.ndarray,
                 keep_idx: Sequence[int]) -> Tuple[Any, jnp.ndarray]:
    """New (params, proto_class) with only ``keep_idx`` prototypes.

    Functional analogue of the reference's in-place surgery
    (reference model.py:311-336): slices prototype_vectors rows and
    last-layer rows (our weight is stored (P, K)).  The caller rebuilds
    the model with the new prototype count — jit then sees a clean
    static shape instead of mutated parameters.
    """
    keep = jnp.asarray(list(keep_idx), dtype=jnp.int32)
    new = dict(params)
    new["prototype_vectors"] = jnp.asarray(params["prototype_vectors"])[keep]
    new["last_layer"] = jnp.asarray(params["last_layer"])[keep]
    return new, jnp.asarray(proto_class)[keep]
