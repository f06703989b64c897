"""Import pretrained torch weights into the DeepLabV2 backbone.

The reference initializes its backbone either from torchvision's
ImageNet ResNet-101 via a key remap (reference deeplab_features.py:8-49,
train.py:81-93) or from a COCO deeplab caffemodel checkpoint
(train.py:71-79).  Here both arrive through one converter:

* torchvision naming (``layer1.0.conv1.weight`` …) is remapped to the
  deeplab naming first (same mapping as the reference:
  ``layer{n+1}.block{b+1}.{reduce,conv3x3,increase,shortcut}``);
* deeplab-named tensors map directly onto our param/constants trees —
  conv kernels transpose OIHW→HWIO, BN tensors land in the frozen
  ``constants`` collection (gamma/beta/mean/var).

The reference asserts exactly 8 missing keys (the ASPP, whose shape
differs) and 0 unexpected keys for the ImageNet path (train.py:92-93);
`load_deeplab_backbone` reproduces that contract.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def nan_template(model, *init_args, **init_kwargs):
    """Variable trees from ``jax.eval_shape`` of ``model.init`` — no
    device computation (a remote-TPU init compile costs minutes for
    nothing); the NaN fill lets ``assert_fully_imported`` prove the
    checkpoint wrote EVERY leaf."""
    import jax

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *init_args,
                           **init_kwargs))
    return jax.tree.map(lambda s: np.full(s.shape, np.nan, s.dtype),
                        shapes)


def assert_fully_imported(report: Mapping[str, Any], *trees,
                          context: str = "checkpoint",
                          error=ValueError) -> None:
    """Audit a loader report + NaN-templated trees after an import.

    Raises ``error`` when the checkpoint had unmapped keys, corrupt
    (negative) BN running variances, or left any template leaf
    NaN-holed (a truncated state_dict must not leave random weights).
    """
    import jax

    if report["unexpected_keys"]:
        raise error(f"unmapped keys in {context}: "
                    f"{report['unexpected_keys'][:8]}")
    if report.get("negative_variance_keys"):
        raise error(f"corrupt BN running_var in {context}: "
                    f"{report['negative_variance_keys'][:8]}")
    holes = [
        "/".join(str(getattr(p, "key", p)) for p in path)
        for tree in trees
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        if np.isnan(np.asarray(leaf)).any()]
    if holes:
        raise error(f"{context} left {len(holes)} uninitialized "
                    f"leaves: {holes[:8]}")


def torchvision_key_to_deeplab(key: str) -> Optional[str]:
    """torchvision ResNet key → deeplab-pytorch key (reference
    deeplab_features.py:8-49). Returns None for keys with no home
    (fc, num_batches_tracked)."""
    if key.endswith("num_batches_tracked"):
        return None
    seg = key.split(".")
    if seg[0].startswith("layer"):
        dl_layer = int(seg[0][5:]) + 1
        block = f"block{int(seg[1]) + 1}"
        if seg[2] == "downsample":
            module = {0: "conv", 1: "bn"}[int(seg[3])]
            return f"layer{dl_layer}.{block}.shortcut.{module}.{seg[-1]}"
        kind, num = seg[2][:-1], int(seg[2][-1])
        name = {1: "reduce", 2: "conv3x3", 3: "increase"}[num]
        return f"layer{dl_layer}.{block}.{name}.{kind}.{seg[-1]}"
    if seg[0] in ("conv1", "bn1"):
        return f"layer1.conv1.{seg[0][:-1]}.{seg[-1]}"
    return None


def _set_nested(tree: Dict[str, Any], path: Tuple[str, ...],
                value: np.ndarray) -> bool:
    node = tree
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    if path[-1] not in node:
        return False
    expected = np.asarray(node[path[-1]])
    if expected.shape != value.shape:
        return False
    node[path[-1]] = value.astype(expected.dtype)
    return True


def _deeplab_key_to_paths(key: str):
    """deeplab key → (collection, path) in our trees.

    conv weights → params[...]["conv"]["kernel"] (HWIO);
    BN {weight,bias,running_mean,running_var} → constants[...]["bn"]
    {gamma,beta,mean,var}; ASPP ``aspp.cN.{weight,bias}`` →
    params["aspp"]["cN"]{kernel,bias}.
    """
    seg = key.split(".")
    if seg[0] == "aspp":
        leaf = {"weight": "kernel", "bias": "bias"}[seg[-1]]
        return [("params", ("aspp", seg[1], leaf))]
    *mods, kind, leaf = seg
    if kind == "conv":
        if leaf != "weight":
            return []
        return [("params", (*mods, "conv", "kernel"))]
    if kind == "bn":
        name = {"weight": "gamma", "bias": "beta",
                "running_mean": "mean", "running_var": "var"}.get(leaf)
        if name is None:
            return []
        return [("constants", (*mods, "bn", name))]
    return []


def load_deeplab_backbone(params: Dict[str, Any],
                          constants: Dict[str, Any],
                          state_dict: Mapping[str, np.ndarray],
                          naming: str = "torchvision",
                          backbone_path: Tuple[str, ...] = ("features",
                                                            "base"),
                          ) -> Dict[str, Any]:
    """Copy a torch state_dict into (params, constants) in place-ish.

    Args:
      params/constants: the PPNet variable trees (plain dicts; modified
        copies are returned in the report for convenience — the trees
        are mutated).
      state_dict: torch tensors or numpy arrays, torchvision or deeplab
        naming.
      naming: 'torchvision' (ImageNet init path) or 'deeplab' (COCO
        checkpoint path).

    Returns:
      report dict: loaded / missing_keys (our leaves never touched
      within the backbone scope is not tracked — mirrors torch's
      contract of reporting source keys) / unexpected_keys.
    """
    def sub(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    p_root = sub(params, backbone_path)
    c_root = sub(constants, backbone_path)

    loaded, unexpected = [], []
    for key, value in state_dict.items():
        v = np.asarray(getattr(value, "numpy", lambda: value)()
                       if hasattr(value, "numpy") else value)
        dl_key = (torchvision_key_to_deeplab(key)
                  if naming == "torchvision" else key)
        if dl_key is None:
            continue
        ok = False
        for collection, path in _deeplab_key_to_paths(dl_key):
            if collection == "params" and path[-1] == "kernel":
                v_t = np.transpose(v, (2, 3, 1, 0)) if v.ndim == 4 else v
            else:
                v_t = v
            tree = p_root if collection == "params" else c_root
            if _set_nested(tree, path, v_t):
                ok = True
        if ok:
            loaded.append(key)
        else:
            unexpected.append(key)

    # corrupt-checkpoint guard: a negative BN running_var would turn
    # the whole forward into NaNs via rsqrt (silently — found during
    # runtime verification with a synthetic checkpoint)
    bad_var = [k for k, v in state_dict.items()
               if k.endswith("running_var")
               and np.any(np.asarray(getattr(v, "numpy", lambda: v)()
                                     if hasattr(v, "numpy") else v) < 0)]
    return {"loaded": loaded, "unexpected_keys": unexpected,
            "negative_variance_keys": bad_var}


# ---------------------------------------------------------------------------
# Classification stems (torchvision-style ImageNet weights)
#
# The reference loads model-zoo ImageNet weights for every classification
# feature stem (reference resnet_features.py:227-296,
# densenet_features.py:178-311, vgg_features.py:104-271).  These mappers
# translate torchvision state_dict keys onto the trees of
# models/backbones.py (trainable BN → params{scale,bias} +
# batch_stats{mean,var}, unlike the frozen deeplab backbone).
# ---------------------------------------------------------------------------


def _bn_paths(prefix: Tuple[str, ...], leaf: str):
    name = {"weight": "scale", "bias": "bias"}.get(leaf)
    if name is not None:
        return [("params", (*prefix, name))]
    name = {"running_mean": "mean", "running_var": "var"}.get(leaf)
    if name is not None:
        return [("batch_stats", (*prefix, name))]
    return []


def _tv_resnet_paths(key: str):
    seg = key.split(".")
    if key.endswith("num_batches_tracked") or seg[0] == "fc":
        return []
    if seg[0] == "conv1":
        return [("params", ("conv1", "kernel"))]
    if seg[0] == "bn1":
        return _bn_paths(("bn1",), seg[-1])
    if seg[0].startswith("layer"):
        block = f"layer{int(seg[0][5:])}_block{int(seg[1])}"
        if seg[2] == "downsample":
            if seg[3] == "0":
                return [("params", (block, "proj_conv", "kernel"))]
            return _bn_paths((block, "proj_bn"), seg[-1])
        if seg[2].startswith("conv"):
            return [("params", (block, seg[2], "kernel"))]
        if seg[2].startswith("bn"):
            return _bn_paths((block, seg[2]), seg[-1])
    return []


def _vgg_index_maps(arch: str):
    """Sequential-index → (stage, conv) maps for torchvision VGG
    ``features.N.*`` keys (convs interleave with ReLU/BN/MaxPool)."""
    from adlm_tpu.models.backbones import _VGG_SPECS
    use_bn = arch.endswith("_bn")
    conv_map, bn_map = {}, {}
    idx = 0
    for si, n in enumerate(_VGG_SPECS[arch.replace("_bn", "")]):
        for ci in range(n):
            conv_map[idx] = (si, ci)
            idx += 1
            if use_bn:
                bn_map[idx] = (si, ci)
                idx += 1
            idx += 1  # ReLU
        idx += 1      # MaxPool
    return conv_map, bn_map


def _tv_vgg_paths(key: str, arch: str):
    seg = key.split(".")
    if seg[0] != "features" or key.endswith("num_batches_tracked"):
        return []
    conv_map, bn_map = _vgg_index_maps(arch)
    idx = int(seg[1])
    if idx in conv_map:
        si, ci = conv_map[idx]
        leaf = {"weight": "kernel", "bias": "bias"}[seg[-1]]
        return [("params", (f"stage{si}_conv{ci}", leaf))]
    if idx in bn_map:
        si, ci = bn_map[idx]
        return _bn_paths((f"stage{si}_bn{ci}",), seg[-1])
    return []


def _tv_densenet_paths(key: str):
    seg = key.split(".")
    if seg[0] == "classifier" or key.endswith("num_batches_tracked"):
        return []
    if seg[0] == "features":
        seg = seg[1:]
    if seg[0] == "conv0":
        return [("params", ("conv0", "kernel"))]
    if seg[0] == "norm0":
        return _bn_paths(("bn0",), seg[-1])
    if seg[0] == "norm5":
        return _bn_paths(("bn_final",), seg[-1])
    if seg[0].startswith("denseblock"):
        bi = int(seg[0][len("denseblock"):]) - 1
        li = int(seg[1][len("denselayer"):]) - 1
        half = {"1": "a", "2": "b"}[seg[2][-1]]
        base = f"block{bi}_layer{li}_{half}"
        if seg[2].startswith("conv"):
            return [("params", (f"{base}_conv", "kernel"))]
        return _bn_paths((f"{base}_bn",), seg[-1])
    if seg[0].startswith("transition"):
        ti = int(seg[0][len("transition"):]) - 1
        if seg[1] == "conv":
            return [("params", (f"transition{ti}_conv", "kernel"))]
        return _bn_paths((f"transition{ti}_bn",), seg[-1])
    return []


def load_classification_backbone(params: Dict[str, Any],
                                 batch_stats: Dict[str, Any],
                                 state_dict: Mapping[str, np.ndarray],
                                 arch: str,
                                 backbone_path: Tuple[str, ...] = (
                                     "features",),
                                 ) -> Dict[str, Any]:
    """Copy torchvision-style ImageNet stem weights into a
    classification PPNet's (params, batch_stats) trees in place.

    Args:
      arch: 'resnet18/34/50/101/152', 'vggNN[_bn]', 'densenetNNN'.

    Returns:
      report dict {loaded, unexpected_keys, negative_variance_keys}
      (same contract as :func:`load_deeplab_backbone`).
    """
    if arch.startswith("resnet"):
        mapper = _tv_resnet_paths
    elif arch.startswith("vgg"):
        def mapper(key):
            return _tv_vgg_paths(key, arch)
    elif arch.startswith("densenet"):
        mapper = _tv_densenet_paths
    else:
        raise NotImplementedError(f"no importer for arch {arch!r}")

    def sub(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    p_root = sub(params, backbone_path)
    b_root = sub(batch_stats, backbone_path)

    loaded, unexpected = [], []
    for key, value in state_dict.items():
        v = np.asarray(getattr(value, "numpy", lambda: value)()
                       if hasattr(value, "numpy") else value)
        paths = mapper(key)
        if not paths:
            if not (key.endswith("num_batches_tracked")
                    or key.split(".")[0] in ("fc", "classifier")):
                unexpected.append(key)
            continue
        ok = False
        for collection, path in paths:
            v_t = (np.transpose(v, (2, 3, 1, 0))
                   if path[-1] == "kernel" and v.ndim == 4 else v)
            tree = p_root if collection == "params" else b_root
            if _set_nested(tree, path, v_t):
                ok = True
        (loaded if ok else unexpected).append(key)

    bad_var = [k for k, v in state_dict.items()
               if k.endswith("running_var")
               and np.any(np.asarray(getattr(v, "numpy", lambda: v)()
                                     if hasattr(v, "numpy") else v) < 0)]
    return {"loaded": loaded, "unexpected_keys": unexpected,
            "negative_variance_keys": bad_var}


# ---------------------------------------------------------------------------
# U-Noise UNet (reference src/unet.py:37-81)
#
# The reference distributes U-Noise models as pytorch-lightning
# checkpoints whose state_dicts prefix the UNet with ``model.``
# (UtilityModel, train_util.py:12-16) or ``noise_model.`` (NoiseModel,
# train_noise.py:37-44).  load_unoise_unet maps a (prefix-stripped)
# torch UNet state_dict onto our flax trees; our TorchBatchNorm keeps
# torch's running-variance semantics so the import is exact.
# ---------------------------------------------------------------------------

_UNET_SEQ_IDX = {"0": ("conv", "conv0"), "1": ("bn", "bn0"),
                 "3": ("conv", "conv1"), "4": ("bn", "bn1")}
_UNET_UP_IDX = {"1": ("conv", "up_conv"), "2": ("bn", "up_bn")}


def _unet_leaf(kind: str, mod_path: Tuple[str, ...], name: str, leaf: str):
    if kind == "conv":
        ln = {"weight": "kernel", "bias": "bias"}.get(leaf)
        return [("params", (*mod_path, name, ln))] if ln else []
    hit = {"weight": ("params", "scale"), "bias": ("params", "bias"),
           "running_mean": ("batch_stats", "mean"),
           "running_var": ("batch_stats", "var")}.get(leaf)
    if hit is None:
        return []
    coll, ln = hit
    return [(coll, (*mod_path, name, ln))]


def _unet_key_to_paths(key: str, depth: int):
    """torch UNet state_dict key → [(collection, path)] in our trees.

    ``downs.{i}`` → ``down{i}``; ``ups.{j}`` → ``up{depth-2-j}`` (the
    reference builds ``ups`` with ``reversed(range(depth-1))``, so its
    ``ups[0]`` is the DEEPEST level — reference src/unet.py:62-67);
    ``conv1x1`` → ``head``.
    """
    seg = key.split(".")
    if seg[-1] == "num_batches_tracked":
        return []
    if seg[0] == "downs":
        hit = _UNET_SEQ_IDX.get(seg[2])
        if hit is None:
            return []
        return _unet_leaf(hit[0], (f"down{seg[1]}",), hit[1], seg[3])
    if seg[0] == "ups":
        up = f"up{depth - 2 - int(seg[1])}"
        if seg[2] == "up":
            hit = _UNET_UP_IDX.get(seg[3])
            if hit is None:
                return []
            return _unet_leaf(hit[0], (up,), hit[1], seg[4])
        if seg[2] == "conv":
            hit = _UNET_SEQ_IDX.get(seg[3])
            if hit is None:
                return []
            return _unet_leaf(hit[0], (up, "conv"), hit[1], seg[4])
        return []
    if seg[0] == "conv1x1":
        ln = {"weight": "kernel", "bias": "bias"}.get(seg[1])
        return [("params", ("head", ln))] if ln else []
    return []


def load_unoise_unet(params: Dict[str, Any], batch_stats: Dict[str, Any],
                     state_dict: Mapping[str, np.ndarray],
                     prefix: str = "") -> Dict[str, Any]:
    """Copy a torch UNet state_dict into UNet (params, batch_stats).

    Args:
      params/batch_stats: our UNet variable trees (mutated in place).
      state_dict: torch tensors or numpy arrays; keys may carry a
        lightning ``prefix`` (``"model."`` for a UtilityModel
        checkpoint, ``"noise_model."`` for a NoiseModel one) — other
        keys are skipped silently only if they belong to a DIFFERENT
        known lightning submodule, else reported unexpected.
      prefix: stripped from every key before mapping.

    Returns report dict {loaded, unexpected_keys, negative_variance_keys}.
    """
    stripped = {}
    for key, value in state_dict.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        stripped[key] = value
    down_ids = [int(k.split(".")[1]) for k in stripped
                if k.startswith("downs.")]
    if not down_ids:
        raise ValueError(
            f"no UNet keys found (prefix {prefix!r}); state_dict has "
            f"{sorted(state_dict)[:4]}...")
    depth = max(down_ids) + 1

    loaded, unexpected = [], []
    for key, value in stripped.items():
        v = np.asarray(getattr(value, "numpy", lambda: value)()
                       if hasattr(value, "numpy") else value)
        paths = _unet_key_to_paths(key, depth)
        if not paths:
            if not key.endswith("num_batches_tracked"):
                unexpected.append(key)
            continue
        ok = False
        for collection, path in paths:
            v_t = (np.transpose(v, (2, 3, 1, 0))
                   if path[-1] == "kernel" and v.ndim == 4 else v)
            tree = params if collection == "params" else batch_stats
            if _set_nested(tree, path, v_t):
                ok = True
        (loaded if ok else unexpected).append(key)

    bad_var = [k for k, v in stripped.items()
               if k.endswith("running_var")
               and np.any(np.asarray(getattr(v, "numpy", lambda: v)()
                                     if hasattr(v, "numpy") else v) < 0)]
    return {"loaded": loaded, "unexpected_keys": unexpected,
            "negative_variance_keys": bad_var}


def load_unoise_checkpoint(path: str, kind: str = "utility"):
    """Load a reference pytorch-lightning U-Noise checkpoint file.

    Returns the prefix-stripped torch state_dict (numpy values) for
    ``load_unoise_unet``.  ``kind``: 'utility' (UtilityModel, prefix
    ``model.``) or 'noise' (NoiseModel, prefix ``noise_model.``); a raw
    UNet state_dict (no prefix) is also accepted.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    prefix = {"utility": "model.", "noise": "noise_model."}[kind]
    if not any(k.startswith(prefix) for k in sd):
        prefix = ""  # raw UNet state_dict
    return {k[len(prefix):]: np.asarray(v.detach().cpu().numpy())
            for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# Full ProtoSeg PPNet checkpoints (mid-project migration)
#
# The reference saves whole-module pickles per stage
# (``torch.save(ppnet)``, reference segmentation/train.py:60-65 and
# push/prune flows); the module's state_dict contains the deeplab-named
# backbone under ``features.base.``, the add-on Sequential, the
# prototype vectors, the constant ``ones`` helper, and the bias-free
# last layer (reference model.py:54-143).  load_protoseg_model maps all
# of it onto our (params, constants) trees so a reference run trained
# in torch can continue (eval / push / prune / finetune) here.
# ---------------------------------------------------------------------------


def load_protoseg_model(params: Dict[str, Any], constants: Dict[str, Any],
                        state_dict: Mapping[str, np.ndarray]
                        ) -> Dict[str, Any]:
    """Copy a full reference segmentation PPNet state_dict into our
    PPNet (params, constants) trees (mutated in place).

    Mapping: ``features.base.*`` → the deeplab backbone importer
    (deeplab naming); ``add_on_layers.{2i}`` convs (even Sequential
    indices — odd ones are activations, reference model.py:97-136) →
    ``add_on/conv{i}``; ``prototype_vectors`` (P,C,1,1) →
    ``prototype_vectors`` (P,C); ``last_layer.weight`` (K,P) →
    ``last_layer`` (P,K); ``ones`` (the constant L2-conv helper,
    model.py:140) is skipped.

    The target trees must already have the checkpoint's prototype
    count (build the model with ``num_prototypes`` taken from the
    checkpoint — pruned reference checkpoints are smaller).
    """
    base_sd, rest = {}, {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue  # BN bookkeeping, no home in our trees
        if k.startswith("features.base."):
            base_sd[k[len("features.base."):]] = v
        else:
            rest[k] = v

    report = load_deeplab_backbone(params, constants, base_sd,
                                   naming="deeplab")
    loaded = [f"features.base.{k}" for k in report["loaded"]]
    unexpected = [f"features.base.{k}" for k in report["unexpected_keys"]]
    bad_var = [f"features.base.{k}"
               for k in report["negative_variance_keys"]]

    _load_ppnet_head(params, rest, loaded, unexpected)

    return {"loaded": loaded, "unexpected_keys": unexpected,
            "negative_variance_keys": bad_var}


def _load_ppnet_head(params, rest, loaded, unexpected) -> None:
    """The parts of a PPNet state_dict shared by the segmentation and
    classification models: add-on Sequential (convs at even indices,
    reference model.py:97-136), prototype vectors, and the bias-free
    last layer.  ``ones`` (the constant L2-conv helper, model.py:140)
    is skipped."""
    for k, v in rest.items():
        v = np.asarray(getattr(v, "numpy", lambda: v)()
                       if hasattr(v, "numpy") else v)
        seg = k.split(".")
        ok = False
        if k == "ones":
            continue
        if k == "prototype_vectors":
            ok = _set_nested(params, ("prototype_vectors",),
                             v.reshape(v.shape[0], v.shape[1]))
        elif k == "last_layer.weight":
            ok = _set_nested(params, ("last_layer",), v.T)
        elif seg[0] == "add_on_layers" and seg[-1] in ("weight", "bias"):
            idx = int(seg[1])
            if idx % 2 == 0:
                leaf = "kernel" if seg[-1] == "weight" else "bias"
                vv = np.transpose(v, (2, 3, 1, 0)) if v.ndim == 4 else v
                ok = _set_nested(params, ("add_on", f"conv{idx // 2}",
                                          leaf), vv)
        (loaded if ok else unexpected).append(k)


def load_protopnet_cls(params: Dict[str, Any], batch_stats: Dict[str, Any],
                       state_dict: Mapping[str, np.ndarray], arch: str
                       ) -> Dict[str, Any]:
    """Copy a full reference CLASSIFICATION PPNet state_dict into our
    cls PPNet (params, batch_stats) trees (mutated in place).

    The reference saves its classification models as whole-module
    pickles too (``torch.save(obj=model, ...)``, reference save.py:11);
    their state_dicts carry the feature stem under ``features.`` with
    torchvision-compatible naming (the reference's own
    resnet/vgg/densenet_features modules keep torchvision keys — the
    same fact the stem-import golden tests rely on), plus the shared
    PPNet head surface (model.py:54-143).
    """
    stem_sd, rest = {}, {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.startswith("features."):
            stem_sd[k[len("features."):]] = v
        else:
            rest[k] = v

    report = load_classification_backbone(params, batch_stats, stem_sd,
                                          arch)
    loaded = [f"features.{k}" for k in report["loaded"]]
    unexpected = [f"features.{k}" for k in report["unexpected_keys"]]
    bad_var = [f"features.{k}" for k in report["negative_variance_keys"]]

    _load_ppnet_head(params, rest, loaded, unexpected)

    return {"loaded": loaded, "unexpected_keys": unexpected,
            "negative_variance_keys": bad_var}


# ---------------------------------------------------------------------------
# Reverse export: our trained ProtoSeg state → reference-named torch
# state_dict, so runs trained here can be handed back to reference
# tooling (or compared tensor-by-tensor).  Exact inverse of
# load_protoseg_model; round-trip tested.
# ---------------------------------------------------------------------------


def _flatten_str_tree(tree: Any, prefix: Tuple[str, ...] = ()):
    if isinstance(tree, Mapping):
        for k in tree:
            yield from _flatten_str_tree(tree[k], prefix + (str(k),))
    else:
        yield prefix, np.asarray(tree)


def export_protoseg_state_dict(params: Dict[str, Any],
                               constants: Dict[str, Any]
                               ) -> Dict[str, np.ndarray]:
    """Our PPNet (params, constants) → a torch state_dict with the
    reference's exact key names and layouts (reference model.py:54-143;
    conv kernels HWIO→OIHW, BN constants → bn.{weight,bias,running_*},
    prototypes back to (P,C,1,1), last layer transposed, ``ones``
    regenerated).  ``prototype_class_identity`` is NOT part of a torch
    state_dict (plain attribute in the reference) — callers save the
    class-id array separately.
    """
    out: Dict[str, np.ndarray] = {}
    bn_leaf = {"gamma": "weight", "beta": "bias",
               "mean": "running_mean", "var": "running_var"}

    for path, v in _flatten_str_tree(params):
        if path == ("prototype_vectors",):
            out["prototype_vectors"] = v[:, :, None, None]
            out["ones"] = np.ones_like(v)[:, :, None, None]
        elif path == ("last_layer",):
            out["last_layer.weight"] = np.ascontiguousarray(v.T)
        elif path[0] == "add_on":
            # add_on/conv{i}/{kernel,bias} → add_on_layers.{2i}.*
            i = int(path[1][len("conv"):])
            leaf = "weight" if path[-1] == "kernel" else "bias"
            vv = np.transpose(v, (3, 2, 0, 1)) if v.ndim == 4 else v
            out[f"add_on_layers.{2 * i}.{leaf}"] = vv
        elif path[-1] == "kernel":
            # backbone convs (incl. aspp.cN): join path, HWIO→OIHW
            key = ".".join(path[:-1]) + ".weight"
            out[key] = np.transpose(v, (3, 2, 0, 1))
        else:
            out[".".join(path[:-1]) + "." + path[-1]] = v

    for path, v in _flatten_str_tree(constants):
        if path[-2] == "bn":
            key = ".".join(path[:-1]) + "." + bn_leaf[path[-1]]
            out[key] = v
        else:  # pragma: no cover - no other constants exist today
            out[".".join(path)] = v
    return out
