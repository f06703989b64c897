"""U-Noise training drivers (utility + noise model).

Mirrors reference src/train_util.py:45-59 and src/train_noise.py:105-137:
load slice arrays, ordered 80/10/10 split, train with per-epoch
validation; utility checkpoints best-by-val-dice, noise model
best-by-val-loss.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core.checkpoint import CheckpointStore
from adlm_tpu.core.config import UNoiseConfig
from adlm_tpu.data.unoise_data import batches, split_datasets
from adlm_tpu.train.unoise import (
    init_noise_state,
    init_utility_state,
    make_noise_eval_step,
    make_noise_train_step,
    make_utility_eval_step,
    make_utility_train_step,
)
from adlm_tpu.utils.logging import RunLogger


def _load_arrays(args):
    imgs = np.load(args.imgs)
    masks = np.load(args.masks)
    boxes = (np.load(args.boxes, allow_pickle=True)
             if os.path.exists(args.boxes) else None)
    # raw single-channel mode: tile-to-3 + ImageNet normalization
    # happen in-jit (3x less host work and transfer; see
    # UNoiseDataset.raw / unoise._prep_images)
    return split_datasets(imgs, masks, boxes, raw=True)


def _torch_unet_payload(path: str, kind: str, sample: jnp.ndarray):
    """{params, batch_stats, depth, cf} from a reference
    pytorch-lightning U-Noise checkpoint (its published models ship
    this way — reference train_util.py:12-16, train_noise.py:37-44).
    The architecture is inferred from the state_dict itself."""
    import math

    from adlm_tpu.models.unet import UNet
    from adlm_tpu.utils.torch_import import (assert_fully_imported,
                                             load_unoise_checkpoint,
                                             load_unoise_unet,
                                             nan_template)
    sd = load_unoise_checkpoint(path, kind)
    depth = max(int(k.split(".")[1]) for k in sd
                if k.startswith("downs.")) + 1
    cf = int(round(math.log2(sd["downs.0.0.weight"].shape[0])))
    model = UNet(out_channels=1, depth=depth, cf=cf)
    template = nan_template(model, sample, train=True)
    params, bs = template["params"], template["batch_stats"]
    report = load_unoise_unet(params, bs, sd)
    assert_fully_imported(report, params, bs, context=path)
    return {"params": params, "batch_stats": bs,
            "depth": depth, "channel_factor": cf}


def _cfg_from_args(args) -> UNoiseConfig:
    return UNoiseConfig(
        depth=args.depth, channel_factor=args.channel_factor,
        util_depth=getattr(args, "util_depth", 5),
        util_channel_factor=getattr(args, "util_channel_factor", 6),
        learning_rate=args.learning_rate, batch_size=args.batch_size,
        epochs=args.epochs,
        min_scale=getattr(args, "min_scale", 1.0),
        max_scale=getattr(args, "max_scale", 5.0),
        noise_coeff=getattr(args, "noise_coeff", 0.001),
        compute_dtype="bfloat16" if getattr(args, "bf16", False)
        else "float32")


def train_utility(args) -> Any:
    import dataclasses
    cfg = dataclasses.replace(_cfg_from_args(args), util_depth=args.depth,
                              util_channel_factor=args.channel_factor)
    run_dir = os.path.join(os.environ.get("RESULTS_DIR", "./runs"),
                           args.run_name)
    logger = RunLogger(run_dir, "unoise_util")
    store = CheckpointStore(run_dir)
    train_ds, val_ds, _ = _load_arrays(args)

    sample, _ = train_ds[0]
    init_x = jnp.tile(jnp.asarray(sample[None]), (1, 1, 1, 3))
    state = init_utility_state(cfg, jax.random.PRNGKey(0), init_x)
    mesh_data = getattr(args, "mesh_data", 0)
    if mesh_data:
        from adlm_tpu.core.mesh import MeshSpec, make_mesh
        from adlm_tpu.parallel.sharding import (
            make_sharded_utility_step, shard_state)
        mesh = make_mesh(MeshSpec(data=mesh_data),
                         devices=jax.devices()[:mesh_data])
        state = shard_state(state, mesh)
        step = make_sharded_utility_step(cfg, mesh, raw=True)
    else:
        step = make_utility_train_step(cfg, raw=True)
    evaluate = make_utility_eval_step(cfg, raw=True)

    # record the utility architecture so the noise trainer can rebuild
    # the frozen model correctly
    store.save_metadata("utility_config",
                        {"depth": cfg.util_depth,
                         "channel_factor": cfg.util_channel_factor})

    best_dice = -1.0
    for epoch in range(cfg.epochs):
        from adlm_tpu.data.pipeline import BatchLoader
        loader = BatchLoader(batches(train_ds, cfg.batch_size,
                                     shuffle=True, seed=epoch, n_jobs=4,
                                     drop_last=bool(mesh_data)))
        try:
            for imgs, masks in loader:
                state, loss = step(state, jnp.asarray(imgs),
                                   jnp.asarray(masks))
        finally:
            loader.close()
        dices, losses = [], []
        for imgs, masks in batches(val_ds, cfg.batch_size):
            m = evaluate(state, jnp.asarray(imgs), jnp.asarray(masks))
            dices.append(float(m["val_dice"]))
            losses.append(float(m["val_loss"]))
        dice = float(np.mean(dices)) if dices else 0.0
        logger.metrics(epoch, "utility", "val",
                       {"val_dice": dice,
                        "val_loss": float(np.mean(losses)) if losses else 0})
        payload = {"params": dict(state.params),
                   "batch_stats": dict(state.batch_stats),
                   "step": state.step}
        store.save("utility", "last", payload)
        if dice > best_dice:
            best_dice = dice
            store.save("utility", "best", payload)
            logger.log(f"epoch {epoch}: new best val dice {dice:.4f}")
    logger.close()
    return state


def train_noise(args) -> Any:
    import dataclasses
    import json
    cfg = _cfg_from_args(args)
    run_dir = os.path.join(os.environ.get("RESULTS_DIR", "./runs"),
                           args.run_name)
    util_dir = os.path.join(os.environ.get("RESULTS_DIR", "./runs"),
                            args.utility_run)
    logger = RunLogger(run_dir, "unoise_noise")
    store = CheckpointStore(run_dir)

    train_ds, val_ds, _ = _load_arrays(args)
    sample, _ = train_ds[0]
    # raw datasets yield (H, W, 1); model init needs the post-prep
    # 3-channel shape
    init_x = jnp.tile(jnp.asarray(sample[None]), (1, 1, 1, 3))

    utility_ckpt = getattr(args, "utility_torch_ckpt", None)
    if utility_ckpt:
        # frozen utility straight from a reference lightning checkpoint
        util_payload = _torch_unet_payload(utility_ckpt, "utility",
                                           init_x)
        cfg = dataclasses.replace(
            cfg, util_depth=util_payload["depth"],
            util_channel_factor=util_payload["channel_factor"])
        logger.log(f"Loaded frozen utility model from torch checkpoint "
                   f"{utility_ckpt!r} (depth {util_payload['depth']}, "
                   f"cf {util_payload['channel_factor']})")
    else:
        util_payload = CheckpointStore(util_dir).restore("utility", "best")
        # rebuild the frozen utility model with the architecture it was
        # trained with (recorded by train_utility)
        util_cfg_path = os.path.join(util_dir, "utility_config.json")
        if os.path.exists(util_cfg_path):
            with open(util_cfg_path) as f:
                uc = json.load(f)
            cfg = dataclasses.replace(cfg, util_depth=uc["depth"],
                                      util_channel_factor=uc["channel_factor"])

    # optional: initialize the noise UNet from a pretrained utility
    # model (the reference's "pretrained" variants, train_noise.py:115-119
    # — its best dice@50% results use this)
    pre_params = pre_bs = None
    pretrained_run = getattr(args, "pretrained", None)
    pretrained_ckpt = getattr(args, "pretrained_torch_ckpt", None)
    if pretrained_ckpt:
        pre_payload = _torch_unet_payload(pretrained_ckpt, "utility",
                                          init_x)
        if (pre_payload["depth"] != cfg.depth
                or pre_payload["channel_factor"] != cfg.channel_factor):
            raise SystemExit(
                f"--pretrained-torch-ckpt architecture (depth "
                f"{pre_payload['depth']}, cf "
                f"{pre_payload['channel_factor']}) does not match the "
                f"noise model (depth {cfg.depth}, cf "
                f"{cfg.channel_factor})")
        pre_params = pre_payload["params"]
        pre_bs = pre_payload["batch_stats"]
        logger.log(f"Initializing noise model from torch checkpoint "
                   f"{pretrained_ckpt!r}")
    elif pretrained_run:
        pre_payload = CheckpointStore(os.path.join(
            os.environ.get("RESULTS_DIR", "./runs"),
            pretrained_run)).restore("utility", "best")
        pre_params = pre_payload["params"]
        pre_bs = pre_payload["batch_stats"]
        logger.log(f"Initializing noise model from pretrained run "
                   f"{pretrained_run!r}")

    from adlm_tpu.train.unoise import FrozenUtility
    state = init_noise_state(
        cfg, jax.random.PRNGKey(0), init_x,
        util=FrozenUtility(params=util_payload["params"],
                           batch_stats=util_payload["batch_stats"]),
        pretrained_params=pre_params, pretrained_batch_stats=pre_bs)
    mesh_data = getattr(args, "mesh_data", 0)
    if mesh_data:
        from adlm_tpu.core.mesh import MeshSpec, make_mesh
        from adlm_tpu.parallel.sharding import (
            make_sharded_noise_step, shard_state)
        mesh = make_mesh(MeshSpec(data=mesh_data),
                         devices=jax.devices()[:mesh_data])
        state = shard_state(state, mesh)
        step = make_sharded_noise_step(cfg, mesh, raw=True)
    else:
        step = make_noise_train_step(cfg, raw=True)
    evaluate = make_noise_eval_step(cfg, raw=True)

    # record the noise architecture so visualization/figures commands
    # can rebuild each run's UNet without trusting CLI flags
    store.save_metadata("noise_config",
                        {"depth": cfg.depth,
                         "channel_factor": cfg.channel_factor})

    best_loss = np.inf
    rng = jax.random.PRNGKey(1)
    for epoch in range(cfg.epochs):
        from adlm_tpu.data.pipeline import BatchLoader
        loader = BatchLoader(batches(train_ds, cfg.batch_size,
                                     shuffle=True, seed=epoch, n_jobs=4,
                                     drop_last=bool(mesh_data)))
        try:
            for imgs, masks in loader:
                rng, sub = jax.random.split(rng)
                state, m = step(state, jnp.asarray(imgs),
                                jnp.asarray(masks), sub)
        finally:
            loader.close()
        losses, dices = [], []
        for imgs, masks in batches(val_ds, cfg.batch_size):
            rng, sub = jax.random.split(rng)
            m = evaluate(state, jnp.asarray(imgs), jnp.asarray(masks), sub)
            losses.append(float(m["val_loss"]))
            dices.append(float(m["val_dice"]))
        vl = float(np.mean(losses)) if losses else np.inf
        logger.metrics(epoch, "noise", "val",
                       {"val_loss": vl,
                        "val_dice": float(np.mean(dices)) if dices else 0})
        payload = {"params": dict(state.params),
                   "batch_stats": dict(state.batch_stats),
                   "step": state.step}
        store.save("noise", "last", payload)
        if vl < best_loss:
            best_loss = vl
            store.save("noise", "best", payload)
            logger.log(f"epoch {epoch}: new best val loss {vl:.4f}")
    logger.close()
    return state
