"""Typed experiment configuration system.

The reference drives everything through gin files
(``/root/reference/segmentation/configs/*.gin`` — 8 experiments binding
~35 params each across train / construct_PPNet / PPNet / dataset /
module).  We replace gin with plain frozen dataclasses plus a named
registry: every reference experiment exists as a preset here, presets
are JSON round-trippable (saved next to checkpoints for resume), and
every knob is an explicit field instead of a string binding.

The class table that the reference configured by *manually swapping*
``constants1.py`` over ``constants.py`` (reference README.md:67) is a
config field (``DataConfig.class_table``) instead.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {k: _asdict(v) for k, v in dataclasses.asdict(obj).items()}
    return obj


@dataclass(frozen=True)
class PPNetConfig:
    """Prototype-network head + backbone selection.

    Mirrors the knobs of the reference's ``construct_PPNet`` and
    ``PPNet.__init__`` (reference model.py:39-147, 389-418).
    """

    base_architecture: str = "deeplabv2_resnet101"
    img_size: int = 513
    # (num_prototypes, channels, 1, 1) in the reference; we keep (P, C)
    # since prototype kernels are always 1x1 (configs/*.gin).
    num_prototypes: int = 190
    prototype_channels: int = 64
    num_classes: int = 19
    prototype_activation: str = "log"  # 'log' | 'linear'
    add_on_layers_type: str = "deeplab_simple"  # | 'bottleneck' | 'bottleneck_pool' | 'regular'
    bottleneck_stride: Optional[int] = None
    patch_classification: bool = True
    epsilon: float = 1e-4
    # DeepLab specifics (reference deeplab_features.py:52-60)
    deeplab_n_features: int = 64
    deeplab_n_blocks: Tuple[int, ...] = (3, 4, 23, 3)
    atrous_rates: Tuple[int, ...] = (6, 12, 18, 24)
    # MSC scales beyond 1.0 (reference segmentation/utils.py:64-101).
    # Empty = single-scale (all shipped deeplab configs).
    msc_scales: Tuple[float, ...] = ()
    pretrained: bool = False
    # lower the d=2/4 dilated convs via space-to-batch (numerically
    # exact, identical param tree — a TPU tiling experiment knob; see
    # models/layers.ConvBN and PERF.md)
    dilated_space_to_batch: bool = False
    # from-scratch trainability: per-pixel LayerNorm immediately before
    # the add-on sigmoid.  The pre-sigmoid tensor has no normalizer in
    # the reference architecture (raw ASPP sum / last add-on conv) —
    # fine with a pretrained near-stationary backbone, but training the
    # backbone from random init drifts its scale unboundedly and the
    # sigmoid saturates to EXACT 0/1 in f32 (measured: 100% of outputs
    # at the rails by joint step 700, gradient to every feature
    # parameter exactly zero, run frozen forever — a one-shot rescale
    # at init provably cannot hold).  LayerNorm has no running stats
    # (train == eval), so the standardization holds for the whole run
    # by construction.  Default off: reference checkpoint-import parity.
    presigmoid_ln: bool = False

    @property
    def prototype_shape(self) -> Tuple[int, int, int, int]:
        return (self.num_prototypes, self.prototype_channels, 1, 1)

    @property
    def num_prototypes_per_class(self) -> int:
        assert self.num_prototypes % self.num_classes == 0
        return self.num_prototypes // self.num_classes


@dataclass(frozen=True)
class DataConfig:
    """Dataset + augmentation knobs (reference segmentation/dataset.py:34-50)."""

    class_table: str = "cityscapes"  # 'cityscapes' | 'pascal' | 'mds' (pancreas)
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    image_margin_size: int = 0
    window_size: Tuple[int, int] = (513, 513)
    scales: Tuple[float, ...] = (0.5, 1.5)  # random-scale jitter range
    cells: bool = False  # raw-float images, no /255 (cells.gin)
    dataloader_n_jobs: int = 8
    # "thread" (GIL-bound near one core) or "process" (spawn workers,
    # scales with host cores — the multi-chip feeding mode; identical
    # sample stream either way since augmentation is seeded per sample)
    dataloader_mode: str = "thread"
    train_key: str = "train"
    # eval-time input resize (labels stay full-res; logits are
    # upsampled to label size).  The reference resizes PASCAL eval
    # inputs to 513x513 (eval_valid.py:144-152).
    eval_resize: Optional[Tuple[int, int]] = None


@dataclass(frozen=True)
class TrainConfig:
    """Phase schedule + losses + per-group LRs.

    Mirrors ``PatchClassificationModule`` constructor knobs
    (reference segmentation/module.py:41-83) and the ``train()`` phase
    budget (reference segmentation/train.py:34-48).
    """

    random_seed: int = 20220227
    warmup_steps: int = 15000
    joint_steps: int = 150000
    finetune_steps: int = 10000
    warmup_batch_size: int = 2
    joint_batch_size: int = 2
    early_stopping_patience_last_layer: int = 100

    loss_weight_crs_ent: float = 1.0
    loss_weight_l1: float = 1e-4
    loss_weight_kld: float = 0.25

    joint_optimizer_lr_features: float = 2.5e-5
    joint_optimizer_lr_add_on_layers: float = 2.5e-4
    joint_optimizer_lr_prototype_vectors: float = 2.5e-4
    joint_optimizer_weight_decay: float = 5e-4
    warm_optimizer_lr_add_on_layers: float = 2.5e-4
    warm_optimizer_lr_prototype_vectors: float = 2.5e-4
    warm_optimizer_weight_decay: float = 5e-4
    last_layer_optimizer_lr: float = 1e-5

    ignore_void_class: bool = True
    poly_lr_power: float = 0.9
    iter_size: int = 5  # gradient accumulation microbatches

    # Optional global-norm gradient clip applied before every phase
    # optimizer (optax.clip_by_global_norm).  None reproduces the
    # reference exactly (it never clips).  Long from-scratch schedules
    # need it: the full-budget joint phase diverged to NaN from a
    # well-converged 15k-step warmup state while the 10% demo budget
    # survived identical LRs (round-5 divergence probe,
    # experiments/joint_divergence_probe.py).
    grad_clip_norm: Optional[float] = None

    # Linear LR ramp over the first N OPTIMIZER UPDATES of the joint
    # phase (then the reference poly decay).  0 = reference parity (no
    # ramp).  Why it exists: fresh Adam's first updates move EVERY
    # weight by ±lr regardless of gradient scale (m/√v = sign(g) at
    # step 1), and from a well-converged 15k-step warmup state that
    # jolt (ASPP group = 10·lr) saturated the prototype sigmoids in ONE
    # update — CE pinned at ln(num_classes) with dead gradients, NaN 58
    # windows later (measured: experiments/joint_divergence_probe.py).
    # The reference never sees this because its backbone is pretrained;
    # from-scratch joint entry needs the ramp.
    joint_lr_warmup_updates: int = 0

    # Reference bug shim: the reference's KLD loop indexes
    # prototype-class-identity columns with the RAW label value, which is
    # off by one from the CE targets when ignore_void_class=True
    # (reference segmentation/module.py:170-178 vs :156-159).  We default
    # to the *consistent* alignment; set True to bit-match the reference.
    kld_raw_label_indexing: bool = False

    # dtype policy for the training forward/backward pass: 'float32'
    # reproduces the reference numerics; 'bfloat16' casts params +
    # activations to bf16 for the MXU (grads and optimizer state stay
    # f32).
    compute_dtype: str = "float32"

    # rematerialize the forward during backprop (jax.checkpoint) —
    # trades FLOPs for activation memory, enabling larger windows/batches
    remat: bool = False

    # data-calibrated frozen-BN init (models/calibrate.py): standardize
    # every frozen BN on a real batch before training.  Enables
    # from-scratch training, which the reference cannot do at all (its
    # frozen BNs assume ImageNet/COCO running stats; at the (0, 1) init
    # the 101-layer stack saturates the sigmoid add-ons).  No-op in
    # spirit when a pretrained checkpoint is loaded — skip it then.
    bn_calibrate: bool = False

    # from-scratch init, step 2: set each prototype to a real feature
    # vector of its own class sampled from a training batch
    # (models/calibrate.py::init_prototypes_from_data).  Without it the
    # random prototypes sit 13–31 away from every feature and the log
    # activation's 1/d² gradient pins CE at uniform (measured at
    # flagship scale); with it the head starts as a working
    # nearest-prototype classifier.
    proto_init_data: bool = False

    # fuse the iter_size gradient-accumulation scan into ONE
    # (iter_size·batch)-sized forward/backward with group-normalized
    # losses — gradient-identical to the scan (mean over microbatches of
    # per-microbatch-mean losses) but tiles the MXU far better at the
    # reference's tiny batch 2 (see PERF.md).  Costs iter_size× the
    # activation memory; combine with remat if needed.
    fused_accumulation: bool = False

    # ship train windows as RAW uint8 pixels and normalize in-jit
    # (ops/normalize.py — the same path full-res eval uses): the
    # augmented pixel values are bilinear blends of uint8 sources, so
    # re-quantizing costs ≤0.5/255 per pixel (≲0.9% of one std — far
    # below the augmentation noise floor) while cutting the image wire
    # bytes 2× vs bf16 / 4× vs f32.  The flagship joint window is
    # HOST→DEVICE-TRANSFER-bound (PERF.md: 18 MB / 0.48 s per window vs
    # 155 ms compute through the ~42 MB/s relay) — uint8 halves that
    # bound.  NOT bit-parity with the reference's f32 input math; keep
    # off for golden-trajectory comparisons.  Requires /255-scaled
    # datasets (cells=False).
    wire_uint8: bool = False


@dataclass(frozen=True)
class UNoiseConfig:
    """U-Noise trainer knobs (reference src/train_noise.py:140-168)."""

    depth: int = 5
    channel_factor: int = 6
    util_depth: int = 5
    util_channel_factor: int = 6
    learning_rate: float = 3e-3
    batch_size: int = 8
    min_scale: float = 1.0
    max_scale: float = 5.0
    noise_coeff: float = 0.001
    epochs: int = 100
    # 'bfloat16' runs the UNet forward/backward on the MXU in bf16
    # (params, optimizer state, and BN running stats stay f32)
    compute_dtype: str = "float32"


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "cityscapes_kld_imnet"
    model: PPNetConfig = field(default_factory=PPNetConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    unoise: UNoiseConfig = field(default_factory=UNoiseConfig)
    load_coco: bool = False

    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "ExperimentConfig":
        raw = json.loads(s)

        def tupleize(cls, d):
            kw = {}
            for f in dataclasses.fields(cls):
                if f.name not in d:
                    continue  # field added since the JSON was saved:
                    # fall back to the dataclass default (forward
                    # compatibility for old run configs)
                v = d[f.name]
                if isinstance(v, list):
                    v = tuple(v)
                kw[f.name] = v
            return cls(**kw)

        return ExperimentConfig(
            name=raw["name"],
            model=tupleize(PPNetConfig, raw["model"]),
            data=tupleize(DataConfig, raw["data"]),
            train=tupleize(TrainConfig, raw["train"]),
            unoise=tupleize(UNoiseConfig, raw["unoise"]),
            load_coco=raw.get("load_coco", False),
        )


_REGISTRY: Dict[str, ExperimentConfig] = {}


def register_experiment(cfg: ExperimentConfig) -> ExperimentConfig:
    _REGISTRY[cfg.name] = cfg
    return cfg


def get_experiment(name: str) -> ExperimentConfig:
    if name not in _REGISTRY:
        raise KeyError(f"unknown experiment {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_experiments():
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# Presets: one per reference gin file (reference segmentation/configs/*.gin).
# ---------------------------------------------------------------------------

_CITYSCAPES_MODEL = PPNetConfig(
    num_prototypes=190, num_classes=19, add_on_layers_type="deeplab_simple"
)
_CITYSCAPES_DATA = DataConfig(class_table="cityscapes", window_size=(513, 513))

# Reference-parity presets with an active KLD loss set
# kld_raw_label_indexing=True: the reference's KLD loop indexes
# prototype-class columns with the RAW label (off by one from the CE
# targets when void is dropped) — reproducing its published runs
# requires the same alignment.  Flip to False for the corrected
# semantics (see TrainConfig.kld_raw_label_indexing).
register_experiment(ExperimentConfig(
    name="cityscapes_kld_imnet",
    model=_CITYSCAPES_MODEL,
    data=_CITYSCAPES_DATA,
    train=TrainConfig(loss_weight_kld=0.25, kld_raw_label_indexing=True),
))

register_experiment(ExperimentConfig(
    name="cityscapes_no_kld_imnet",
    model=_CITYSCAPES_MODEL,
    data=_CITYSCAPES_DATA,
    train=TrainConfig(loss_weight_kld=0.0),
))

register_experiment(ExperimentConfig(
    name="cityscapes_kld_coco",
    model=_CITYSCAPES_MODEL,
    data=_CITYSCAPES_DATA,
    train=TrainConfig(loss_weight_kld=0.25, kld_raw_label_indexing=True),
    load_coco=True,
))

_PASCAL_MODEL = PPNetConfig(
    num_prototypes=210, num_classes=21, img_size=321,
    add_on_layers_type="deeplab_simple", msc_scales=(0.5, 0.75),
)
_PASCAL_DATA = DataConfig(class_table="pascal", window_size=(321, 321),
                          eval_resize=(513, 513))

register_experiment(ExperimentConfig(
    name="pascal_kld_imnet",
    model=_PASCAL_MODEL,
    data=_PASCAL_DATA,
    train=TrainConfig(loss_weight_kld=0.25, kld_raw_label_indexing=True),
))

register_experiment(ExperimentConfig(
    name="pascal_no_kld_imnet",
    model=_PASCAL_MODEL,
    data=_PASCAL_DATA,
    train=TrainConfig(loss_weight_kld=0.0),
))

register_experiment(ExperimentConfig(
    name="pascal_kld_coco",
    model=_PASCAL_MODEL,
    data=_PASCAL_DATA,
    train=TrainConfig(loss_weight_kld=0.25, kld_raw_label_indexing=True),
    load_coco=True,
))

register_experiment(ExperimentConfig(
    name="mds_new",
    model=PPNetConfig(num_prototypes=30, num_classes=3,
                      add_on_layers_type="deeplab_simple"),
    data=DataConfig(class_table="mds", window_size=(513, 513)),
    train=TrainConfig(loss_weight_kld=0.0),
))

# Synthetic-flagship presets (not reference configs): the flagship
# Cityscapes model trained FROM SCRATCH on the color-keyed synthetic
# dataset (experiments/flagship_synthetic_e2e.py) — the environment has
# no real datasets or pretrained weights, so these are the end-to-end
# integration runs on real TPU hardware.  From-scratch training needs
# presigmoid_ln + 10× feature LR + data-driven prototype init (PERF.md
# "from-scratch anatomy"); the reference cannot train from scratch at
# all.  Registered here (not in the script) so `train --auto-restart`
# watchdog children — fresh `python -m adlm_tpu.cli` processes — can
# resolve the experiment name.
_SYNTH_MODEL = dataclasses.replace(_CITYSCAPES_MODEL, presigmoid_ln=True)
_SYNTH_TRAIN = dict(loss_weight_kld=0.25, kld_raw_label_indexing=True,
                    joint_optimizer_lr_features=2.5e-4,
                    proto_init_data=True)

register_experiment(ExperimentConfig(
    name="flagship_synth_demo",
    model=_SYNTH_MODEL,
    data=_CITYSCAPES_DATA,
    # 10% of the reference budget (the round-4 49-minute run)
    train=TrainConfig(warmup_steps=1500, joint_steps=15000,
                      finetune_steps=1000, **_SYNTH_TRAIN),
))

register_experiment(ExperimentConfig(
    name="flagship_synth_full",
    model=_SYNTH_MODEL,
    data=_CITYSCAPES_DATA,
    # the FULL reference budget (reference
    # segmentation/configs/cityscapes_kld_imnet.gin:20-24): warmup 15k
    # + joint 150k + finetune 10k steps at batch 2 × iter_size 5
    train=TrainConfig(**_SYNTH_TRAIN),
))

# Small smoke-test experiment: exercises the full pipeline (all phases,
# push, prune, eval) in minutes on tiny shapes — not a reference config.
register_experiment(ExperimentConfig(
    name="smoke",
    model=PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=65,
                      add_on_layers_type="deeplab_simple"),
    data=DataConfig(class_table="mds", window_size=(65, 65),
                    scales=(0.9, 1.1)),
    train=TrainConfig(warmup_steps=8, joint_steps=8, finetune_steps=8,
                      iter_size=2, warmup_batch_size=2,
                      joint_batch_size=2, loss_weight_kld=0.25),
))

register_experiment(ExperimentConfig(
    name="cells",
    model=PPNetConfig(num_prototypes=50, num_classes=5, img_size=321,
                      add_on_layers_type="deeplab_simple", msc_scales=(0.5, 0.75)),
    data=DataConfig(class_table="cells", window_size=(321, 321), cells=True,
                    mean=(106.51, 106.51, 106.51), std=(7.25, 7.25, 7.25)),
    train=TrainConfig(loss_weight_kld=0.25, kld_raw_label_indexing=True, ignore_void_class=False),
))
