"""U-Noise training: utility U-Net + noise-mask model.

Reference semantics (src/train_util.py:11-59, src/train_noise.py:12-137):

* **Utility model** — U-Net trained with BCE-with-logits on Pancreas
  slices, Adam(3e-3), val metric = dice of ``logits > 0``.
* **Noise model** — a second (usually smaller) U-Net predicts a mask
  ``B = σ(noise_unet(x))``; reparameterized noise
  ``ε·(B·(max−min)+min)``, ``ε ~ N(0,1)`` is added to the *input* of the
  frozen utility model; loss ``BCE(util(x+noise), y) − λ·mean(log B)``.
  The utility model runs in eval mode (frozen batch stats).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from adlm_tpu.core.config import UNoiseConfig
from adlm_tpu.models.unet import UNet
from adlm_tpu.ops.losses import bce_with_logits, dice_coeff


@flax.struct.dataclass
class UtilityState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class FrozenUtility(NamedTuple):
    """Just the pieces the noise trainer needs from a utility model."""

    params: Any
    batch_stats: Any


@flax.struct.dataclass
class NoiseState:
    params: Any            # noise U-Net params
    batch_stats: Any       # noise U-Net batch stats
    util_params: Any       # frozen utility model
    util_batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def init_utility_state(cfg: UNoiseConfig, rng: jax.Array,
                       sample: jnp.ndarray) -> UtilityState:
    model = UNet(out_channels=1, depth=cfg.util_depth,
                 cf=cfg.util_channel_factor)
    variables = model.init(rng, sample, train=True)
    tx = optax.adam(cfg.learning_rate, eps=1e-8)
    return UtilityState(params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        opt_state=tx.init(variables["params"]),
                        step=jnp.zeros((), jnp.int32))


def init_noise_state(cfg: UNoiseConfig, rng: jax.Array,
                     sample: jnp.ndarray, util: UtilityState,
                     pretrained_params: Any = None,
                     pretrained_batch_stats: Any = None) -> NoiseState:
    """A pretrained noise init carries BOTH params and running stats —
    the reference loads the full UNet state_dict (train_noise.py:115-119)."""
    model = UNet(out_channels=1, depth=cfg.depth, cf=cfg.channel_factor)
    variables = model.init(rng, sample, train=True)
    params = pretrained_params if pretrained_params is not None \
        else variables["params"]
    batch_stats = pretrained_batch_stats \
        if pretrained_batch_stats is not None else variables["batch_stats"]
    tx = optax.adam(cfg.learning_rate, eps=1e-8)
    return NoiseState(params=params, batch_stats=batch_stats,
                      util_params=util.params,
                      util_batch_stats=util.batch_stats,
                      opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def _prep_images(images: jnp.ndarray, raw: bool, bf16: bool) -> jnp.ndarray:
    """In-jit input prep.  ``raw``: (B,H,W,1) unnormalized slices from
    ``UNoiseDataset(raw=True)`` are tiled to 3 channels and ImageNet-
    normalized ON DEVICE — same numbers as the host path (the channels
    are identical copies), 3× less host work and host→device transfer."""
    if raw:
        from adlm_tpu.data.unoise_data import IMAGENET_MEAN, IMAGENET_STD
        images = (jnp.repeat(images, 3, axis=-1)
                  - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return images.astype(jnp.bfloat16) if bf16 else images


# shared mixed-precision casts (see core/dtypes.py for the BN
# running-stats precision contract)
from adlm_tpu.core.dtypes import tree_bf16 as _bf16, tree_f32 as _f32  # noqa: E402


def make_utility_train_step(cfg: UNoiseConfig, raw: bool = False):
    model = UNet(out_channels=1, depth=cfg.util_depth,
                 cf=cfg.util_channel_factor)
    tx = optax.adam(cfg.learning_rate, eps=1e-8)
    bf16 = cfg.compute_dtype == "bfloat16"

    @jax.jit
    def step(state: UtilityState, images: jnp.ndarray, masks: jnp.ndarray):
        def lfn(params):
            # bf16: cast inside the differentiated fn so grads come back
            # in the params' own dtype (f32); running stats re-cast to
            # f32 so the state pytree keeps stable dtypes across steps
            fwd_params = _bf16(params) if bf16 else params
            x = _prep_images(images, raw, bf16)
            # BN running stats stay f32: flax computes batch stats in
            # f32 and the stats dtype does not leak into y's dtype, so
            # down-casting would only quantize the momentum update
            logits, upd = model.apply(
                {"params": fwd_params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"])
            new_bs = _f32(upd["batch_stats"]) if bf16 else \
                upd["batch_stats"]
            return bce_with_logits(logits, masks), new_bs

        (loss, new_bs), grads = jax.value_and_grad(lfn, has_aux=True)(
            state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, batch_stats=new_bs,
                             opt_state=new_opt, step=state.step + 1), loss

    return step


def make_utility_eval_step(cfg: UNoiseConfig, raw: bool = False):
    model = UNet(out_channels=1, depth=cfg.util_depth,
                 cf=cfg.util_channel_factor)

    @jax.jit
    def step(state: UtilityState, images: jnp.ndarray, masks: jnp.ndarray):
        images = _prep_images(images, raw, False)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        loss = bce_with_logits(logits, masks)
        dice = dice_coeff(logits > 0.0, masks)
        return {"val_loss": loss, "val_dice": dice}

    return step


def noise_forward(cfg: UNoiseConfig, params: Any, batch_stats: Any,
                  images: jnp.ndarray, rng: jax.Array, train: bool
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Any]:
    """(noise, B, new_batch_stats) — reference src/train_noise.py:54-64."""
    model = UNet(out_channels=1, depth=cfg.depth, cf=cfg.channel_factor)
    if train:
        logits, upd = model.apply({"params": params,
                                   "batch_stats": batch_stats},
                                  images, train=True,
                                  mutable=["batch_stats"])
        new_bs = upd["batch_stats"]
    else:
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             images, train=False)
        new_bs = batch_stats
    B = jax.nn.sigmoid(logits)
    eps = jax.random.normal(rng, B.shape, B.dtype)
    noise = eps * (B * (cfg.max_scale - cfg.min_scale) + cfg.min_scale)
    return noise, B, new_bs


def make_noise_train_step(cfg: UNoiseConfig, raw: bool = False):
    util_model = UNet(out_channels=1, depth=cfg.util_depth,
                      cf=cfg.util_channel_factor)
    tx = optax.adam(cfg.learning_rate, eps=1e-8)
    bf16 = cfg.compute_dtype == "bfloat16"

    @jax.jit
    def step(state: NoiseState, images: jnp.ndarray, masks: jnp.ndarray,
             rng: jax.Array):
        def lfn(params):
            fwd_params = _bf16(params) if bf16 else params
            x = _prep_images(images, raw, bf16)
            noise, B, new_bs = noise_forward(
                cfg, fwd_params, state.batch_stats, x, rng, True)
            if bf16:
                new_bs = _f32(new_bs)
            # frozen utility model in eval mode (train_noise.py:74-75):
            # weights bf16, but eval-mode BN consumes the running stats
            # directly — keep them f32 (full-precision normalization
            # constants; y stays bf16 either way)
            pred = util_model.apply(
                {"params": _bf16(state.util_params)
                 if bf16 else state.util_params,
                 "batch_stats": state.util_batch_stats},
                x + noise, train=False)
            # the log-B regularizer in f32: log of a bf16 sigmoid tail
            # underflows
            loss = bce_with_logits(pred, masks) \
                - cfg.noise_coeff * jnp.mean(
                    jnp.log(B.astype(jnp.float32)))
            return loss, (new_bs, jnp.mean(B.astype(jnp.float32)))

        (loss, (new_bs, mean_b)), grads = jax.value_and_grad(
            lfn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params, batch_stats=new_bs,
                                  opt_state=new_opt, step=state.step + 1)
        return new_state, {"train_loss": loss, "mean_B": mean_b}

    return step


def make_noise_eval_step(cfg: UNoiseConfig, raw: bool = False):
    util_model = UNet(out_channels=1, depth=cfg.util_depth,
                      cf=cfg.util_channel_factor)

    @jax.jit
    def step(state: NoiseState, images: jnp.ndarray, masks: jnp.ndarray,
             rng: jax.Array):
        images = _prep_images(images, raw, False)
        noise, B, _ = noise_forward(cfg, state.params, state.batch_stats,
                                    images, rng, False)
        pred = util_model.apply(
            {"params": state.util_params,
             "batch_stats": state.util_batch_stats},
            images + noise, train=False)
        loss = bce_with_logits(pred, masks) \
            - cfg.noise_coeff * jnp.mean(jnp.log(B))
        dice = dice_coeff(pred > 0.0, masks)
        return {"val_loss": loss, "val_dice": dice}

    return step
