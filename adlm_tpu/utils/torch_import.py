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
