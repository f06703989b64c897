"""Legacy ProtoPNet image-classification path.

The reference keeps the original ProtoPNet classification flow alongside
the segmentation fork (reference main.py, train_and_test.py:37-99,
push.py root, run_pruning.py root; defaults from settings.py:5-48).
Here: jitted train/eval steps with the class-specific cluster /
separation / masked-L1 losses over global-min-pooled distances, the
warm/joint/last phase structure, Adam param groups with a StepLR on the
joint phase, and an RF-aware batch push.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from adlm_tpu.core.config import PPNetConfig
from adlm_tpu.models.ppnet import PPNet, default_proto_class
from adlm_tpu.ops.losses import masked_l1


@dataclasses.dataclass(frozen=True)
class ClassificationConfig:
    """Defaults from reference settings.py:5-48 (CUB-200)."""

    model: PPNetConfig = dataclasses.field(default_factory=lambda: PPNetConfig(
        base_architecture="vgg19", img_size=224, num_prototypes=2000,
        prototype_channels=128, num_classes=200,
        add_on_layers_type="regular", patch_classification=False))
    joint_lr_features: float = 1e-4
    joint_lr_add_on: float = 3e-3
    joint_lr_protos: float = 3e-3
    joint_lr_step_size: int = 5       # epochs; StepLR gamma 0.1 (main.py)
    warm_lr_add_on: float = 3e-3
    warm_lr_protos: float = 3e-3
    last_layer_lr: float = 1e-4
    coef_crs_ent: float = 1.0
    coef_clst: float = 0.8
    coef_sep: float = -0.08
    coef_l1: float = 1e-4
    num_warm_epochs: int = 5
    num_train_epochs: int = 1000
    push_start: int = 10
    # bf16 weights/activations on the MXU (the reference trains f32;
    # loss math and stored state stay f32)
    compute_dtype: str = "float32"


@flax.struct.dataclass
class ClassifierState:
    params: Any
    batch_stats: Any
    opt_state: Any
    proto_class: jnp.ndarray
    step: jnp.ndarray


def classification_loss(logits: jnp.ndarray, min_distances: jnp.ndarray,
                        labels: jnp.ndarray, proto_class: jnp.ndarray,
                        last_layer_weight: jnp.ndarray,
                        cfg: ClassificationConfig,
                        class_specific: bool = True
                        ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CE + cluster + separation + masked L1 over min-pooled distances
    (reference train_and_test.py:37-99)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels).mean()
    max_dist = float(cfg.model.prototype_channels)  # P_ch * 1 * 1

    correct = (proto_class[None, :] == labels[:, None]).astype(jnp.float32)
    inv_correct = jnp.max((max_dist - min_distances) * correct, axis=1)
    cluster = jnp.mean(max_dist - inv_correct)

    wrong = 1.0 - correct
    inv_wrong = jnp.max((max_dist - min_distances) * wrong, axis=1)
    separation = jnp.mean(max_dist - inv_wrong)
    avg_separation = jnp.mean(
        jnp.sum(min_distances * wrong, axis=1) /
        jnp.maximum(jnp.sum(wrong, axis=1), 1.0))

    l1 = masked_l1(last_layer_weight, proto_class)

    if class_specific:
        loss = (cfg.coef_crs_ent * ce + cfg.coef_clst * cluster
                + cfg.coef_sep * separation + cfg.coef_l1 * l1)
    else:
        min_min = jnp.min(min_distances, axis=1)
        cluster = jnp.mean(min_min)
        loss = cfg.coef_crs_ent * ce + cfg.coef_clst * cluster + \
            cfg.coef_l1 * l1

    n_correct = jnp.sum(jnp.argmax(logits, -1) == labels)
    return loss, {"cross_entropy": ce, "cluster": cluster,
                  "separation": separation,
                  "avg_separation": avg_separation, "l1": l1,
                  "n_correct": n_correct.astype(jnp.float32)}


def _unpack_batch(batch) -> Tuple[np.ndarray, np.ndarray, int]:
    """Normalize ``(images, labels)`` / ``(images, labels, n_valid)``
    batches (image_folder.batches with_count) to a triple."""
    if len(batch) == 3:
        return batch
    images, labels = batch
    return images, labels, images.shape[0]


def _label_cls_params(params: Any) -> Any:
    def label(path, _leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "prototype_vectors" in keys:
            return "protos"
        if "last_layer" in keys:
            return "last"
        if "add_on" in keys:
            return "add_on"
        return "features"

    return jax.tree_util.tree_map_with_path(label, params)


def make_cls_optimizer(cfg: ClassificationConfig, phase: str,
                       steps_per_epoch: int = 1
                       ) -> optax.GradientTransformation:
    """warm/joint/last optimizers (reference main.py:110-129):
    warm = add-ons + prototypes only (last layer stays at its
    class-connection init); joint = features + add-ons + prototypes
    with wd 1e-3 and a per-EPOCH StepLR(5, 0.1); last = last layer only.

    ``steps_per_epoch`` converts the reference's per-epoch scheduler
    stepping to our per-update counting — pass the real batches/epoch.
    """
    from adlm_tpu.train.optimizer import _adam
    zero = optax.set_to_zero()

    def adam(lr, wd=0.0, sched=False):
        if not sched:
            return _adam(lr, wd)
        decay = optax.exponential_decay(
            init_value=lr, decay_rate=0.1,
            transition_steps=cfg.joint_lr_step_size * steps_per_epoch,
            staircase=True)
        return _adam(decay, wd)

    if phase == "warm":
        groups = {"add_on": adam(cfg.warm_lr_add_on, 1e-3),
                  "protos": adam(cfg.warm_lr_protos),
                  "last": zero,
                  "features": zero}
    elif phase == "joint":
        groups = {"features": adam(cfg.joint_lr_features, 1e-3, True),
                  "add_on": adam(cfg.joint_lr_add_on, 1e-3, True),
                  "protos": adam(cfg.joint_lr_protos, sched=True),
                  "last": zero}
    elif phase == "last":
        groups = {"last": adam(cfg.last_layer_lr),
                  "features": zero, "add_on": zero, "protos": zero}
    else:
        raise ValueError(phase)
    return optax.multi_transform(groups, _label_cls_params)


def init_classifier_state(model: PPNet, cfg: ClassificationConfig,
                          phase: str, rng: jax.Array,
                          sample: jnp.ndarray,
                          params: Any = None, batch_stats: Any = None,
                          steps_per_epoch: int = 1) -> ClassifierState:
    if params is None:
        variables = model.init(rng, sample, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
    tx = make_cls_optimizer(cfg, phase, steps_per_epoch)
    return ClassifierState(params=params, batch_stats=batch_stats or {},
                           opt_state=tx.init(params),
                           proto_class=default_proto_class(
                               cfg.model.num_prototypes,
                               cfg.model.num_classes),
                           step=jnp.zeros((), jnp.int32))


def make_cls_train_step(model: PPNet, cfg: ClassificationConfig,
                        phase: str, steps_per_epoch: int = 1) -> Callable:
    from adlm_tpu.core.dtypes import tree_bf16, tree_f32

    tx = make_cls_optimizer(cfg, phase, steps_per_epoch)
    bf16 = cfg.compute_dtype == "bfloat16"

    @jax.jit
    def step(state: ClassifierState, images: jnp.ndarray,
             labels: jnp.ndarray):
        def lfn(params):
            # bf16: cast params/images inside the differentiated fn so
            # gradients come back in the params' own dtype (f32); BN
            # running stats stay f32 end to end (see core/dtypes.py —
            # down-casting them would quantize the momentum update)
            fwd_params = tree_bf16(params) if bf16 else params
            x = images.astype(jnp.bfloat16) if bf16 else images
            out, upd = model.apply(
                {"params": fwd_params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"])
            logits, min_d = out
            loss, metrics = classification_loss(
                logits.astype(jnp.float32), min_d.astype(jnp.float32),
                labels, state.proto_class,
                params["last_layer"], cfg)
            new_bs = upd.get("batch_stats", {})
            return loss, (metrics, tree_f32(new_bs) if bf16 else new_bs)

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            lfn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        return state.replace(params=new_params, batch_stats=new_bs,
                             opt_state=new_opt,
                             step=state.step + 1), metrics

    return step


def make_cls_eval_step(model: PPNet, cfg: ClassificationConfig) -> Callable:
    @jax.jit
    def step(state: ClassifierState, images: jnp.ndarray,
             labels: jnp.ndarray):
        logits, min_d = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        _, metrics = classification_loss(
            logits, min_d, labels, state.proto_class,
            state.params["last_layer"], cfg)
        # per-sample correctness so callers can drop wrap-padded tail
        # images from accuracy (image_folder.batches with_count=True)
        metrics["correct"] = jnp.argmax(logits, -1) == labels
        return metrics

    return step


def make_cls_push_batch_fn(model: PPNet) -> Callable:
    """Per-batch global-min patch per prototype, restricted to images of
    the prototype's class (reference push.py root:172-248)."""

    @jax.jit
    def fn(state: ClassifierState, images: jnp.ndarray,
           labels: jnp.ndarray, n_valid: jnp.ndarray):
        f = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, method=PPNet.conv_features)
        from adlm_tpu.ops.prototype import l2_distances
        d = l2_distances(f, state.params["prototype_vectors"])  # (B,h,w,P)
        B, h, w, P = d.shape
        # only images whose label matches the prototype's class, and only
        # real (non-wrap-padded) images — a padded duplicate winning the
        # argmin would record an out-of-dataset image index
        eligible = (labels[:, None] == state.proto_class[None, :]) \
            & (jnp.arange(B) < n_valid)[:, None]
        masked = jnp.where(eligible[:, None, None, :], d, jnp.inf)
        flat = masked.transpose(3, 0, 1, 2).reshape(P, B * h * w)
        arg = jnp.argmin(flat, axis=1)
        mind = jnp.take_along_axis(flat, arg[:, None], axis=1)[:, 0]
        bi = arg // (h * w)
        pi = (arg % (h * w)) // w
        pj = arg % w
        fmap = f[bi, pi, pj, :]
        return mind, bi, pi, pj, fmap

    return fn


def push_classification_prototypes(
    model: PPNet, state: ClassifierState,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    rf_info: Optional[list] = None,
) -> Tuple[Any, Dict[str, np.ndarray]]:
    """Dataset-wide argmin projection for the classification path; RF
    boxes computed with the receptive-field calculator when available
    (reference push.py root:14-313)."""
    from adlm_tpu.utils.receptive_field import rf_box_at

    fn = make_cls_push_batch_fn(model)
    P, C = np.asarray(state.params["prototype_vectors"]).shape
    gmin = np.full(P, np.inf)
    gfmap = np.asarray(state.params["prototype_vectors"]).copy()
    boxes = np.full((P, 5), -1, dtype=np.int64)
    offset = 0
    for batch in batches:
        images, labels, n_valid = _unpack_batch(batch)
        out = fn(state, jnp.asarray(images), jnp.asarray(labels),
                 jnp.asarray(n_valid))
        # one transfer per batch — per-element fetches cost a full relay
        # round-trip each on remote TPU backends
        mind, bi, pi, pj, fmap = jax.device_get(out)
        improved = mind < gmin
        for j in np.where(improved)[0]:
            gmin[j] = mind[j]
            gfmap[j] = fmap[j]
            img_idx = offset + int(bi[j])
            if rf_info is not None:
                hw = images.shape[1:3]
                box = rf_box_at(hw, (int(pi[j]), int(pj[j])), rf_info)
                boxes[j] = [img_idx, *box]
            else:
                boxes[j] = [img_idx, int(pi[j]), int(pi[j]) + 1,
                            int(pj[j]), int(pj[j]) + 1]
        offset += images.shape[0]
    new_params = dict(state.params)
    new_params["prototype_vectors"] = jnp.asarray(gfmap.astype(np.float32))
    return new_params, {"min_distances": gmin, "rf_boxes": boxes}


def find_k_nearest_patches_classification(
    model: PPNet, state: ClassifierState,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    k: int = 6,
) -> np.ndarray:
    """(P, k) image-class labels of each prototype's k nearest patches
    over the push set — the classification front end of pruning
    (reference find_nearest.py:66-236 driven by root
    run_pruning.py:113-158).  A classification image carries one class,
    so the patch label is the image label.
    """

    @jax.jit
    def fn(state: ClassifierState, images: jnp.ndarray) -> jnp.ndarray:
        f = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, method=PPNet.conv_features)
        from adlm_tpu.ops.prototype import l2_distances
        d = l2_distances(f, state.params["prototype_vectors"])
        return jnp.min(d, axis=(1, 2))                        # (B, P)

    P = int(np.asarray(state.params["prototype_vectors"]).shape[0])
    top_d = np.full((P, k), np.inf)
    top_l = np.full((P, k), -1, dtype=np.int64)
    for batch in batches:
        images, labels, n_valid = _unpack_batch(batch)
        # drop wrap-padded duplicates — they'd double-vote identical
        # min-distances into a prototype's k nearest slots
        md = np.asarray(fn(state, jnp.asarray(images)))[:n_valid]
        labels = np.asarray(labels)[:n_valid]
        cat_d = np.concatenate([top_d, md.T], axis=1)         # (P, k+B)
        cat_l = np.concatenate(
            [top_l, np.broadcast_to(np.asarray(labels, np.int64),
                                    (P, len(labels)))], axis=1)
        order = np.argsort(cat_d, axis=1, kind="stable")[:, :k]
        top_d = np.take_along_axis(cat_d, order, axis=1)
        top_l = np.take_along_axis(cat_l, order, axis=1)
    return top_l


def prune_classification_prototypes(
    model: PPNet, state: ClassifierState,
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    k: int = 6, prune_threshold: int = 3, log=print,
) -> Tuple[Any, jnp.ndarray, np.ndarray]:
    """Prune prototypes with < ``prune_threshold`` of their ``k``
    nearest patches in their own class (reference prune.py:11-60).

    Returns (pruned_params, pruned_proto_class, prune_info[n,2]).
    """
    from adlm_tpu.models.ppnet import prune_params

    nearest = find_k_nearest_patches_classification(model, state,
                                                    batches, k=k)
    pc = np.asarray(state.proto_class)
    P = pc.shape[0]
    to_prune = [j for j in range(P)
                if int(np.sum(nearest[j] == pc[j])) < prune_threshold]
    keep = sorted(set(range(P)) - set(to_prune))
    log(f"cls-prune: k={k} threshold={prune_threshold} — pruning "
        f"{len(to_prune)}/{P} prototypes")
    if not keep:
        raise ValueError("pruning would remove every prototype")
    prune_info = np.asarray([[j, pc[j]] for j in to_prune],
                            dtype=np.int64).reshape(-1, 2)
    new_params, new_pc = prune_params(state.params, state.proto_class,
                                      keep)
    return new_params, new_pc, prune_info
