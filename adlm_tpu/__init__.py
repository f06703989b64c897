"""adlm_tpu — TPU-native inherently-interpretable segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`tijaz17skane/ADLM-Inherently-Interpretable-Segmentation`:

* **ProtoSeg** — prototype-based semantic segmentation (per-patch
  ProtoPNet head on a DeepLabV2-ResNet101 backbone) with the full
  warmup → joint → push → finetune → prune pipeline.
* **U-Noise** — learnable noise masks for interpretable U-Net
  segmentation on Medical-Decathlon Pancreas slices.

Everything on the compute path is jit-compiled for TPU: the prototype
L2-distance layer is a Pallas MXU kernel, the push projection is a
device-side masked argmin reduction, the KLD prototype-diversity loss is
fully vectorized, and training steps run under `jax.jit` over a
`jax.sharding.Mesh` for multi-chip scaling.
"""

__version__ = "0.1.0"
