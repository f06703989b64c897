"""Data-calibrated frozen-BN initialization (from-scratch training).

The reference's training contract assumes a pretrained backbone: its
frozen BatchNorms (`freeze_bn`, reference segmentation/module.py:127)
carry ImageNet/COCO running statistics, which keep every layer's
activations O(1).  Training from scratch was impossible there — with
running stats at their (mean 0, var 1) init, frozen BN normalizes
nothing, activation variance compounds through the 101-layer residual
stack, and the sigmoid add-on layers saturate (measured: 99.5% of
add-on outputs at the rails, spatial std 0.04 — gradients through the
features are effectively zero and CE stays pinned at uniform).

`calibrate_frozen_bn` fixes the init the way a pretrained checkpoint
would: it measures each frozen BN's *output* statistics on real data
and composes a correction into the frozen affine so every BN output is
standardized on the calibration batch (BN-recalibration as used in
quantization / domain-adaptation literature).  Because updating layer
k changes layer k+1's input distribution, BNs are calibrated
sequentially in execution order — one cheap forward per BN.  A frozen
BN is a single per-channel affine, so folding the correction into
(gamma, beta) with (mean 0, var 1) is exactly equivalent to storing
the measured input statistics — and unlike the raw statistics (which
can exceed float32 range at depth before the early layers are tamed)
the composed affine stays representable throughout.

Remote-TPU shaping (the axon relay adds ~30 ms per transfer): the
jitted forward reduces every BN's per-channel moment sums in-jit and
returns them packed into ONE flat vector (a single fetch per update —
raw captures would be the model's whole ~GB activation footprint, and
even per-BN (C,) fetches cost 2·n_BN round-trips per update), and the
constants live on device with only the 4 updated leaves re-uploaded
per step.

This runs ONCE at init; the constants then stay frozen for the whole
run, exactly like the reference's pretrained-stats semantics.  CLI:
``train --bn-calibrate`` (config ``TrainConfig.bn_calibrate``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.models.layers import FrozenBatchNorm
from adlm_tpu.models.ppnet import PPNet

# finite guards: a pre-calibration forward can overflow float32 at
# depth; clamped moments still shrink the affine in the right
# direction and later updates converge on exact values
_VAR_MAX = 1e30
_MEAN_MAX = 1e30


def _is_fbn(module, _method: str) -> bool:
    return isinstance(module, FrozenBatchNorm)


def _walk_captures(inter: Dict[str, Any], path=()):
    """Yield (module_path, tuple_of_outputs) for every captured
    FrozenBatchNorm call."""
    for k, v in inter.items():
        if not isinstance(v, dict):
            continue
        if "__call__" in v:
            yield path + (k,), v["__call__"]
        else:
            yield from _walk_captures(v, path + (k,))


# execution rank of the bottleneck submodules (reduce → conv3x3 →
# increase; the shortcut is parallel) — used only to ORDER updates so
# sweeps converge fast; correctness doesn't depend on it
_NAME_RANK = {"conv1": 0, "reduce": 0, "shortcut": 0, "conv3x3": 1,
              "increase": 2}


def _topo_key(path):
    """Natural sort (block2 < block10) + submodule execution rank —
    the capture tree is key-sorted, which misorders numbered blocks
    and bottleneck internals."""
    import re
    key = []
    for part in path:
        toks = tuple(int(tok) if tok.isdigit() else tok
                     for tok in re.split(r"(\d+)", part) if tok)
        # rank leads the part tuple so it dominates the name (reduce
        # before conv3x3); unranked parts (-1) only ever compare
        # against other unranked parts at the same tree depth
        key.append((_NAME_RANK.get(part, -1),) + toks)
    return key


def _moments_from_sums(s: np.ndarray, ss: np.ndarray, n: int
                       ) -> Tuple[np.ndarray, np.ndarray]:
    s = np.asarray(s, np.float64)
    ss = np.asarray(ss, np.float64)
    mean = np.clip(np.nan_to_num(s / n), -_MEAN_MAX, _MEAN_MAX)
    var = np.nan_to_num(ss / n - mean ** 2, nan=_VAR_MAX, posinf=_VAR_MAX)
    return mean, np.clip(var, 0.0, _VAR_MAX)


def calibrate_frozen_bn(model: PPNet, params: Any, constants: Any,
                        images: jnp.ndarray, max_sweeps: int = 8,
                        eps: float = 1e-5, log=None) -> Dict[str, Any]:
    """Return a new ``constants`` tree in which every FrozenBatchNorm
    standardizes its input as measured on ``images`` (B, H, W, 3 —
    normalized like training inputs).

    BNs are calibrated **one at a time** (Gauss–Seidel): one forward
    per BN update, composing the standardizing correction into that
    BN's frozen affine ((mean, var) reset to (0, 1); (gamma, beta)
    absorb ``scale/√(var_y+eps)`` / ``(bias−mean_y)/√(var_y+eps)``),
    sweeping until every BN is standardized.  A simultaneous
    fixed-point iteration is NOT stable at this depth (standardization
    shifts kill ReLU channels downstream, collapsing their variance
    and exploding the next round's corrections; observed
    experimentally), while one-at-a-time updates converge regardless
    of update order; in topological order one sweep suffices (the
    second sweep is the convergence proof).  The jitted forward
    compiles once (constants are traced arguments).
    """
    import copy

    host = copy.deepcopy(jax.tree.map(
        lambda x: np.asarray(x, np.float64), constants))

    def raw_intermediates(consts, p, imgs):
        _, inter = model.apply(
            {"params": p, "constants": consts}, imgs,
            method=PPNet.push_forward, capture_intermediates=_is_fbn)
        return inter["intermediates"]

    # layout discovery WITHOUT execution: shapes of every capture
    shapes = jax.eval_shape(raw_intermediates, jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, jnp.float32), host),
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                     params),
        jax.ShapeDtypeStruct(images.shape, images.dtype))
    layout: List[Tuple[tuple, int, int]] = []  # (path, C, n_pixels)
    for path, outs in _walk_captures(shapes):
        c = outs[0].shape[-1]
        n = sum(int(np.prod(o.shape[:-1])) for o in outs)
        layout.append((path, c, n))
    layout.sort(key=lambda rec: _topo_key(rec[0]))
    order = [path for path, _, _ in layout]
    offsets = np.cumsum([0] + [2 * c for _, c, _ in layout])

    @jax.jit
    def forward(consts, p, imgs):
        # params/images/constants are jit ARGUMENTS, not closure
        # constants — closed-over arrays get baked into the program and
        # XLA constant-folds the whole prefix at compile time
        inter = raw_intermediates(consts, p, imgs)
        caps = dict(_walk_captures(inter))
        chunks = []
        for path, c, _ in layout:
            s = ss = None
            for y in caps[path]:
                flat = y.astype(jnp.float32).reshape(-1, y.shape[-1])
                s = flat.sum(0) if s is None else s + flat.sum(0)
                ss = ((flat ** 2).sum(0) if ss is None
                      else ss + (flat ** 2).sum(0))
            chunks.extend([s, ss])
        # ONE packed vector → one host fetch per update
        return jnp.concatenate(chunks)

    # constants live on device; only the 4 updated leaves re-upload
    dev = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), host)

    def dev_replace(path, node):
        d = dev
        for p in path[:-1]:
            d = d[p]
        d[path[-1]] = {k: jnp.asarray(v, jnp.float32)
                       for k, v in node.items()}

    def update_one(i):
        packed = np.asarray(forward(dev, params, images))
        path, c, n = layout[i]
        s = packed[offsets[i]:offsets[i] + c]
        ss = packed[offsets[i] + c:offsets[i] + 2 * c]
        node = host
        for p in path:
            node = node[p]
        # the affine currently applied: y = x*scale + bias
        scale = node["gamma"] / np.sqrt(node["var"] + eps)
        bias = node["beta"] - node["mean"] * scale
        mean_y, var_y = _moments_from_sums(s, ss, n)
        sd = np.sqrt(var_y + eps)
        # store as (mean 0, var 1) + the composed learned affine
        node["mean"] = np.zeros_like(mean_y)
        node["var"] = np.ones_like(var_y)
        node["gamma"] = (scale / sd) * np.sqrt(1.0 + eps)
        node["beta"] = (bias - mean_y) / sd
        dev_replace(path, node)
        return float(np.max(np.abs(mean_y))), \
            float(np.max(np.abs(var_y - 1.0)))

    for sweep in range(max_sweeps):
        worst_m = worst_v = 0.0
        for i in range(len(order)):
            dm, dv = update_one(i)
            worst_m = max(worst_m, dm)
            worst_v = max(worst_v, dv)
            if log is not None and (i + 1) % 25 == 0:
                log(f"bn-calibrate sweep {sweep + 1}: "
                    f"{i + 1}/{len(order)}")
        if log is not None:
            log(f"bn-calibrate sweep {sweep + 1}: max |mean| "
                f"{worst_m:.3f}, max |var-1| {worst_v:.3f} pre-update")
        if worst_m < 0.05 and worst_v < 0.1:
            break
    return jax.tree.map(lambda x: np.asarray(x, np.float32), host)

def standardize_presigmoid(model: PPNet, params: Any, constants: Any,
                           images: jnp.ndarray, eps: float = 1e-3,
                           log=print) -> Any:
    """From-scratch init, step 1b: standardize the PRE-SIGMOID tensor.

    ``calibrate_frozen_bn`` standardizes every BN output, but the last
    op before the add-on sigmoid has NO BatchNorm: for the deeplab
    configs the pre-sigmoid tensor is the raw ASPP head output (four
    summed 3×3 convs, reference libs/models/deeplabv2.py — rebuilt in
    models/deeplab.py), and for the ProtoPNet kinds it is the add-on
    stack's final 1×1 conv.  At random init that tensor's per-channel
    std is ~10–30 (measured at flagship scale, round 4), so the sigmoid
    saturates to EXACT 0.0/1.0 in float32 — its derivative is exactly
    zero and **no gradient reaches any feature parameter** (0/114
    leaves; CE provably pinned at ln(K) forever).  A pretrained
    checkpoint never hits this, which is why the reference — which
    cannot train from scratch at all — has no equivalent.

    The fix is LSUV-style data-driven init (Mishkin & Matas, 2016):
    measure per-channel (μ, σ) of the pre-sigmoid tensor on a real
    batch and fold ``(x − μ)/σ`` into the producing convs' kernels and
    biases — zero runtime cost, no architecture change, and
    sigmoid(N(0,1)) keeps healthy gradients everywhere.  The producers
    form the tensor ADDITIVELY (ASPP branch sum / a single conv), so
    scaling every kernel+bias by 1/σ and shifting one bias by −μ/σ is
    exact.

    Returns a new params tree (host numpy leaves for the touched convs).
    """
    import copy

    kind = model.cfg.add_on_layers_type
    host = copy.deepcopy(jax.tree.map(np.asarray, params))

    if kind == "deeplab_simple":
        # pre-sigmoid = backbone output (AddOnLayers is just sigmoid);
        # producers = the ASPP branch convs, summed
        aspp = host["features"]["base"]["aspp"]
        producers = [aspp[k] for k in sorted(aspp.keys())]

        @jax.jit
        def pre_fn(p, c, imgs):
            return model.apply(
                {"params": p, "constants": c}, imgs,
                method=lambda m, x: m.features(x, train=False))
    else:
        # pre-sigmoid = the add-on stack's LAST conv output
        convs = sorted((k for k in host["add_on"] if k.startswith("conv")),
                       key=lambda k: int(k[4:]))
        producers = [host["add_on"][convs[-1]]]
        last = convs[-1]

        @jax.jit
        def pre_fn(p, c, imgs):
            import flax.linen as nn
            _, inter = model.apply(
                {"params": p, "constants": c}, imgs,
                method=PPNet.push_forward,
                capture_intermediates=lambda m, _: isinstance(m, nn.Conv))
            return inter["intermediates"]["add_on"][last]["__call__"][0]

    pre = np.asarray(pre_fn(params, constants, images), np.float64)
    flat = pre.reshape(-1, pre.shape[-1])
    mean, sd = flat.mean(0), np.maximum(flat.std(0), eps)
    log(f"presigmoid-calibrate: pre |mean| max {np.abs(mean).max():.2f}, "
        f"std max {sd.max():.2f} over {pre.shape[-1]} channels")
    for i, node in enumerate(producers):
        node["kernel"] = (node["kernel"] / sd).astype(np.float32)
        node["bias"] = (node["bias"] / sd).astype(np.float32)
        if i == 0:
            node["bias"] = (node["bias"] - mean / sd).astype(np.float32)

    post = np.asarray(pre_fn(jax.tree.map(jnp.asarray, host), constants,
                             images), np.float64).reshape(-1, pre.shape[-1])
    log(f"presigmoid-calibrate: post |mean| max "
        f"{np.abs(post.mean(0)).max():.4f}, |std-1| max "
        f"{np.abs(post.std(0) - 1).max():.4f}")
    return host


def init_prototypes_from_data(model: PPNet, params: Any, constants: Any,
                              proto_class, images, labels,
                              seed: int = 0, log=print):
    """Data-driven prototype init: set each prototype to a REAL feature
    vector of a grid cell of its own class.

    From a random init, prototype vectors sit far from every feature
    (flagship scale: measured distances 13–31 over 64 channels), and
    the log activation's gradient vanishes as 1/d² — from-scratch
    training stalls with CE pinned at uniform even after bn-calibrate
    standardizes the activations (round-4 flagship e2e measurement).
    Sampling prototypes from data puts matching-patch distances near 0,
    so the head starts as a working nearest-prototype classifier and
    the distance gradients are healthy from step one.  This is the
    segmentation analogue of ProtoPNet-style patch init; the reference
    cannot do it (or train from scratch at all) — its prototypes are
    N(0, 1) noise until the first push.

    Args:
      model/params/constants: the (bn-calibrated) init state.
      proto_class: (P,) int prototype class ids.
      images: (B, H, W, 3) normalized training windows (host or device).
      labels: (B, H, W) raw train-id labels (0 = void, class c at c+1).
      seed: cell-sampling seed.

    Returns:
      (P, C) jnp array of new prototype vectors; prototypes of classes
      absent from the batch keep their current vectors (logged).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adlm_tpu.models.ppnet import PPNet
    from adlm_tpu.ops.resize import resize_label_nearest

    @jax.jit
    def feats(p, c, imgs):
        f, _ = model.apply({"params": p, "constants": c}, imgs,
                           method=PPNet.push_forward)
        return f

    f = np.asarray(feats(params, constants, jnp.asarray(images)))
    B, gh, gw, C = f.shape
    grid_lab = np.asarray(resize_label_nearest(
        jnp.asarray(np.asarray(labels).astype(np.int32)), (gh, gw)))
    flat_f = f.reshape(B * gh * gw, C)
    flat_lab = grid_lab.reshape(-1)

    rng = np.random.RandomState(seed)
    pc = np.asarray(proto_class)
    new_pv = np.array(np.asarray(params["prototype_vectors"]),
                      np.float32, copy=True)
    missing = []
    for cls in np.unique(pc):
        cells = np.nonzero(flat_lab == cls + 1)[0]  # train id = class+1
        idxs = np.nonzero(pc == cls)[0]
        if cells.size == 0:
            missing.append(int(cls))
            continue
        take = rng.choice(cells, size=len(idxs),
                          replace=cells.size < len(idxs))
        new_pv[idxs] = flat_f[take]
    if missing:
        log(f"proto-init: classes {missing} absent from the init batch "
            f"— their prototypes keep the random init")
    log(f"proto-init: {len(pc) - sum(np.isin(pc, missing))} prototypes "
        f"set from data cells")
    return jnp.asarray(new_pv)
