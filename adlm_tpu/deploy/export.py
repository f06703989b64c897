"""AOT inference export for deployment and serving.

The reference has no deployment story — its eval scripts rebuild the
torch model from source and reload the checkpoint on every run
(reference segmentation/eval_valid.py:64-101).  Here the complete
inference program — on-device uint8 normalization, backbone forward,
prototype head, bilinear logit upsample, argmax, nearest-prototype
interpretability map — is exported ONCE via ``jax.export`` to a
self-contained StableHLO artifact with the weights baked in as
constants.  A serving process deserializes and calls it without the
model code, flax, or the checkpoint directory.

One artifact is serialized PER platform (``platforms=("cpu", "tpu")``
by default): each is a single-platform lowering, so the TPU artifact
keeps the fused Pallas prototype head while the CPU artifact gets the
pure-XLA composition (multi-platform modules must lower every branch
for every platform, and Pallas has no compiled CPU lowering — the
per-platform split sidesteps that while `load_inference_artifact`
hides it behind one call).

Mixed precision: ``compute_dtype=bfloat16`` (default) casts weights AND
activations — images are cast right after the on-device normalization
so the convs actually hit the MXU in bf16 (an f32 image against bf16
kernels would silently promote the whole network back to f32).  BN
running statistics are never down-cast: eval-mode BN consumes them as
normalization constants and their dtype does not leak into the
activations' dtype (see core/dtypes.py).

Artifact layout (``<out_dir>/``):

* ``inference_<platform>.stablehlo`` — serialized
  ``jax.export.Exported``, one per platform;
* ``manifest.json`` — input shape/dtype, output names, normalization
  constants, prototype→class identity, class count, platforms.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core.dtypes import tree_cast
from adlm_tpu.ops.normalize import normalize_in_jit
from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.ops.resize import resize_bilinear

_MANIFEST = "manifest.json"


def _artifact_name(platform: str) -> str:
    return f"inference_{platform}.stablehlo"


def _normalize_in_jit(images, normalize, compute_dtype):
    """uint8 (or f32) → normalized images in ``compute_dtype``."""
    return normalize_in_jit(images, normalize).astype(compute_dtype)


def _write_artifact(fn: Callable, in_struct, out_dir: str,
                    platforms: Tuple[str, ...],
                    manifest: Dict[str, Any]) -> Dict[str, Any]:
    """Serialize ``fn`` once per platform + write the manifest."""
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    for platform in platforms:
        exp = jexport.export(jax.jit(fn), platforms=[platform])(in_struct)
        with open(os.path.join(out_dir, _artifact_name(platform)),
                  "wb") as f:
            f.write(exp.serialize())
    manifest = {**manifest, "platforms": list(platforms),
                "jax_version": jax.__version__}
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _input_manifest(shape, in_dtype) -> Dict[str, Any]:
    return {"shape": list(shape), "dtype": str(np.dtype(
        in_dtype.dtype if hasattr(in_dtype, "dtype") else in_dtype))}


def export_inference_artifact(
    model: PPNet, params: Any, constants: Any, proto_class: Any,
    out_dir: str, batch: int, size: Tuple[int, int],
    normalize: Optional[Tuple] = None,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
    compute_dtype: Any = jnp.bfloat16,
    class_names: Optional[list] = None,
) -> Dict[str, Any]:
    """Lower + serialize the ProtoSeg inference program for
    ``(batch, *size, 3)`` inputs (uint8 when ``normalize`` is given,
    else pre-normalized f32) and write artifact + manifest to
    ``out_dir``.  images → {pred (B,H,W) int32, grid_logits (B,gh,gw,K)
    f32, nearest_proto (B,gh,gw) int32}.  Returns the manifest.
    """
    H, W = size
    in_dtype = jnp.uint8 if normalize is not None else jnp.float32
    cast = tree_cast(params, compute_dtype)

    def fn(images):
        x = _normalize_in_jit(images, normalize, compute_dtype)
        grid_logits, dist = model.apply(
            {"params": cast, "constants": constants}, x,
            train=False, return_distances=True)
        logits = resize_bilinear(grid_logits, (H, W))
        return {
            "pred": jnp.argmax(logits, axis=-1).astype(jnp.int32),
            "grid_logits": grid_logits.astype(jnp.float32),
            "nearest_proto": jnp.argmin(dist, axis=-1).astype(jnp.int32),
        }

    return _write_artifact(
        fn, jax.ShapeDtypeStruct((batch, H, W, 3), in_dtype), out_dir,
        platforms, {
            "input": _input_manifest((batch, H, W, 3), in_dtype),
            "outputs": ["pred", "grid_logits", "nearest_proto"],
            "normalize": ([list(normalize[0]), list(normalize[1])]
                          if normalize is not None else None),
            "proto_class": np.asarray(proto_class).astype(int).tolist(),
            "num_classes": int(model.cfg.num_classes),
            "class_names": class_names,
            "compute_dtype": str(jnp.dtype(compute_dtype)),
        })


def export_unoise_artifact(
    cfg: Any, params: Any, batch_stats: Any, kind: str,
    out_dir: str, batch: int, size: Tuple[int, int],
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
    compute_dtype: Any = jnp.bfloat16,
) -> Dict[str, Any]:
    """AOT-export a U-Noise model for serving.

    ``kind='utility'``: raw (B,H,W,1) slice → segmentation
    ``{mask_prob, mask}`` (σ(logits), logits>0 — the reference's
    val-dice threshold, src/train_util.py:36).
    ``kind='noise'``: slice → ``{importance}`` = the per-pixel noise
    tolerance ``B = σ(noise_unet(x))`` — the interpretation the system
    exists to produce (reference src/train_noise.py:54-64).
    Inputs are raw unnormalized slices; the tile-to-3-channels +
    ImageNet normalization is baked into the artifact.
    """
    from adlm_tpu.models.unet import UNet
    from adlm_tpu.train.unoise import _prep_images

    depth = cfg.util_depth if kind == "utility" else cfg.depth
    cf = (cfg.util_channel_factor if kind == "utility"
          else cfg.channel_factor)
    model = UNet(out_channels=1, depth=depth, cf=cf)
    cast = tree_cast(params, compute_dtype)

    def fn(images):
        x = _prep_images(images, True, compute_dtype == jnp.bfloat16)
        logits = model.apply({"params": cast, "batch_stats": batch_stats},
                             x, train=False)
        prob = jax.nn.sigmoid(logits.astype(jnp.float32))
        if kind == "utility":
            return {"mask_prob": prob,
                    "mask": (logits > 0).astype(jnp.int32)}
        return {"importance": prob}

    H, W = size
    return _write_artifact(
        fn, jax.ShapeDtypeStruct((batch, H, W, 1), jnp.float32), out_dir,
        platforms, {
            "model": f"unoise_{kind}",
            "input": {"shape": [batch, H, W, 1], "dtype": "float32",
                      "note": "raw unnormalized slice values"},
            "outputs": (["mask_prob", "mask"] if kind == "utility"
                        else ["importance"]),
            "unet": {"depth": depth, "channel_factor": cf},
            "compute_dtype": str(jnp.dtype(compute_dtype)),
        })


def export_cls_artifact(
    model: PPNet, params: Any, batch_stats: Any, proto_class: Any,
    out_dir: str, batch: int, size: Tuple[int, int],
    normalize: Optional[Tuple] = None,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
    compute_dtype: Any = jnp.bfloat16,
    class_names: Optional[list] = None,
) -> Dict[str, Any]:
    """AOT-export a legacy-ProtoPNet classifier for serving.

    images → ``{logits (B,K) f32, pred (B,) int32,
    proto_activation (B,P) f32, min_distances (B,P) f32}`` —
    ``proto_activation`` is the reference's ``prototype_activations``
    interpretability vector (local_analysis.py computes it per query;
    here it ships with every prediction) and ``proto_class`` in the
    manifest maps each prototype to its class.
    """
    from adlm_tpu.ops.prototype import distance_to_similarity

    cast = tree_cast(params, compute_dtype)

    def fn(images):
        x = _normalize_in_jit(images, normalize, compute_dtype)
        logits, min_d = model.apply(
            {"params": cast, "batch_stats": batch_stats}, x, train=False)
        min_d = min_d.astype(jnp.float32)
        act = distance_to_similarity(min_d, model.cfg.prototype_activation,
                                     model.cfg.epsilon)
        return {
            "logits": logits.astype(jnp.float32),
            "pred": jnp.argmax(logits, axis=-1).astype(jnp.int32),
            "proto_activation": act,
            "min_distances": min_d,
        }

    H, W = size
    in_dtype = jnp.uint8 if normalize is not None else jnp.float32
    return _write_artifact(
        fn, jax.ShapeDtypeStruct((batch, H, W, 3), in_dtype), out_dir,
        platforms, {
            "model": "protopnet_classifier",
            "input": _input_manifest((batch, H, W, 3), in_dtype),
            "outputs": ["logits", "pred", "proto_activation",
                        "min_distances"],
            "normalize": ([list(normalize[0]), list(normalize[1])]
                          if normalize is not None else None),
            "proto_class": np.asarray(proto_class).astype(int).tolist(),
            "num_classes": int(model.cfg.num_classes),
            "class_names": class_names,
            "compute_dtype": str(jnp.dtype(compute_dtype)),
        })


def load_inference_artifact(out_dir: str, platform: Optional[str] = None
                            ) -> Tuple[Callable, Dict[str, Any]]:
    """Deserialize an exported artifact.  Returns ``(call, manifest)``
    where ``call(images)`` runs the baked-in weights on the current
    platform — no model code or checkpoint needed.  ``platform``
    defaults to the current backend's (the axon relay presents as
    ``tpu``)."""
    from jax import export as jexport

    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    if platform is None:
        platform = jax.default_backend()
        if platform not in manifest["platforms"]:
            raise ValueError(
                f"current backend {platform!r} has no artifact in "
                f"{out_dir} (exported: {manifest['platforms']})")
    with open(os.path.join(out_dir, _artifact_name(platform)), "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    return exp.call, manifest
