"""U-Noise golden tests against the reference's OWN torch code.

The reference UNet (reference src/unet.py:37-81) is imported from
/root/reference and driven directly; weights are shared via
``utils.torch_import.load_unoise_unet`` (the same importer that loads
the reference's published lightning checkpoints).  Covered:

* forward parity on shared weights, eval AND train mode — including
  the running statistics populated by torch train steps (exact thanks
  to TorchBatchNorm's unbiased running-var update);
* the composed utility training step — loss, parameter updates through
  torch.optim.Adam, and post-step running stats
  (reference src/train_util.py:25-29);
* the noise-model loss with an injected ε — BCE(util(x+noise), y)
  − λ·mean(log B) and its gradients (reference src/train_noise.py:54-81).
"""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from adlm_tpu.core.config import UNoiseConfig  # noqa: E402
from adlm_tpu.models.unet import UNet  # noqa: E402
from adlm_tpu.ops.losses import bce_with_logits  # noqa: E402
from adlm_tpu.utils.torch_import import load_unoise_unet  # noqa: E402


def _load_reference_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


REF_UNET = _load_reference_module("ref_unet_golden",
                                  "/root/reference/src/unet.py")
DEPTH, CF = 3, 3


def _paired_models(seed=0):
    """A torch reference UNet and our flax UNet with identical weights
    (running stats pre-populated by torch train-mode forwards so the
    eval path exercises real statistics, not the 0/1 init)."""
    torch.manual_seed(seed)
    t_model = REF_UNET.UNet(in_channels=3, out_channels=1,
                            depth=DEPTH, cf=CF)
    rng = np.random.RandomState(seed + 1)
    with torch.no_grad():
        t_model.train()
        for _ in range(3):
            t_model(torch.tensor(
                rng.rand(2, 3, 16, 16).astype(np.float32)))
    model = UNet(out_channels=1, depth=DEPTH, cf=CF)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3)), train=True)
    params = jax.tree.map(np.asarray, variables["params"])
    batch_stats = jax.tree.map(np.asarray, variables["batch_stats"])
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    report = load_unoise_unet(params, batch_stats, sd)
    assert not report["unexpected_keys"], report["unexpected_keys"]
    n_mapped = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    assert len(report["loaded"]) == n_mapped
    return t_model, model, params, batch_stats


def test_unet_forward_golden_eval_mode():
    t_model, model, params, batch_stats = _paired_models()
    rng = np.random.RandomState(7)
    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    t_model.eval()
    with torch.no_grad():
        want = t_model(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    got = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(got)[..., 0], want.numpy()[:, 0], rtol=1e-4, atol=1e-4)


def test_unet_forward_golden_train_mode_and_running_stats():
    """Train-mode forward (batch statistics) plus the running-stat
    update — the unbiased-variance accumulation must match torch."""
    t_model, model, params, batch_stats = _paired_models(seed=3)
    rng = np.random.RandomState(11)
    x = rng.rand(4, 16, 16, 3).astype(np.float32)
    t_model.train()
    with torch.no_grad():
        want = t_model(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    got, upd = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(got)[..., 0], want.numpy()[:, 0], rtol=1e-4, atol=1e-4)

    # post-forward running stats: re-import from torch and compare trees
    params2 = jax.tree.map(np.copy, params)
    bs_want = jax.tree.map(np.copy, batch_stats)
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    load_unoise_unet(params2, bs_want, sd)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        upd["batch_stats"], bs_want)


def test_utility_train_step_golden():
    """One composed utility train step: BCE loss value, gradients, and
    running stats vs the reference's UtilityModel training_step
    (train_util.py:22-29).  Gradients are compared directly rather than
    through an Adam step: the FIRST Adam update is ≈ ±lr·sign(g), so
    fp-noise sign flips on near-zero gradients would dominate a
    post-step parameter comparison (Adam-vs-torch trajectory equality
    on shared gradients is covered by test_optimizer_golden)."""
    from adlm_tpu.train.unoise import (UtilityState, init_utility_state,
                                       make_utility_train_step)

    t_model, model, params, batch_stats = _paired_models(seed=5)
    cfg = UNoiseConfig(util_depth=DEPTH, util_channel_factor=CF,
                       depth=DEPTH, channel_factor=CF, learning_rate=3e-3)
    rng = np.random.RandomState(13)
    x = rng.rand(4, 16, 16, 3).astype(np.float32)
    y = (rng.rand(4, 16, 16, 1) > 0.5).astype(np.float32)

    state = init_utility_state(cfg, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]))
    state = UtilityState(params=jax.tree.map(jnp.asarray, params),
                         batch_stats=jax.tree.map(jnp.asarray, batch_stats),
                         opt_state=state.opt_state, step=state.step)
    step = make_utility_train_step(cfg)
    new_state, loss = step(state, jnp.asarray(x), jnp.asarray(y))

    def loss_fn(p):
        logits, _ = model.apply(
            {"params": p,
             "batch_stats": jax.tree.map(jnp.asarray, batch_stats)},
            jnp.asarray(x), train=True, mutable=["batch_stats"])
        return bce_with_logits(logits, jnp.asarray(y))

    grads = jax.grad(loss_fn)(jax.tree.map(jnp.asarray, params))

    # torch side: same batch through BCEWithLogits, backward
    t_model.train()
    pred = t_model(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    t_loss = torch.nn.BCEWithLogitsLoss()(
        pred, torch.tensor(np.transpose(y, (0, 3, 1, 2))))
    t_loss.backward()

    assert abs(float(loss) - float(t_loss.detach())) < 1e-5

    from adlm_tpu.utils.torch_import import _set_nested, _unet_key_to_paths
    g_want = jax.tree.map(
        lambda a: np.full(np.shape(a), np.nan, np.float32), params)
    for key, p in t_model.named_parameters():
        for coll, path in _unet_key_to_paths(key, DEPTH):
            if coll != "params":
                continue
            g = p.grad.detach().numpy()
            g = np.transpose(g, (2, 3, 1, 0)) if g.ndim == 4 else g
            assert _set_nested(g_want, path, g), key
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), b, rtol=2e-3, atol=1e-6),
        grads, g_want)

    # post-step running stats: import torch's and compare trees
    params_want = jax.tree.map(np.copy, params)
    bs_want = jax.tree.map(np.copy, batch_stats)
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    load_unoise_unet(params_want, bs_want, sd)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), b, rtol=1e-4, atol=1e-5),
        new_state.batch_stats, bs_want)


def test_noise_loss_golden_with_injected_epsilon():
    """The noise-model objective with a FIXED ε (reference
    train_noise.py:54-81): BCE(util(x + ε·(B·(max−min)+min)), y)
    − λ·mean(log B), utility frozen in eval mode.  Gradients w.r.t. the
    noise UNet compared leaf-wise."""
    t_util, model, u_params, u_bs = _paired_models(seed=21)
    t_noise, _, n_params, n_bs = _paired_models(seed=22)
    cfg = UNoiseConfig(util_depth=DEPTH, util_channel_factor=CF,
                       depth=DEPTH, channel_factor=CF,
                       noise_coeff=0.001, min_scale=1.0, max_scale=5.0)
    rng = np.random.RandomState(23)
    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    y = (rng.rand(2, 16, 16, 1) > 0.5).astype(np.float32)
    eps = rng.randn(2, 16, 16, 1).astype(np.float32)

    def loss_fn(p):
        # noise UNet in train mode (lightning keeps submodules in train
        # during training_step), utility frozen in eval mode
        logits, _ = model.apply(
            {"params": p, "batch_stats": jax.tree.map(jnp.asarray, n_bs)},
            jnp.asarray(x), train=True, mutable=["batch_stats"])
        B = jax.nn.sigmoid(logits)
        noise = jnp.asarray(eps) * (
            B * (cfg.max_scale - cfg.min_scale) + cfg.min_scale)
        pred = model.apply(
            {"params": jax.tree.map(jnp.asarray, u_params),
             "batch_stats": jax.tree.map(jnp.asarray, u_bs)},
            jnp.asarray(x) + noise, train=False)
        return bce_with_logits(pred, jnp.asarray(y)) \
            - cfg.noise_coeff * jnp.mean(jnp.log(B))

    p0 = jax.tree.map(jnp.asarray, n_params)
    loss, grads = jax.value_and_grad(loss_fn)(p0)

    t_util.eval()
    t_noise.train()
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    B_t = torch.sigmoid(t_noise(xt))
    noise_t = torch.tensor(np.transpose(eps, (0, 3, 1, 2))) * (
        B_t * (cfg.max_scale - cfg.min_scale) + cfg.min_scale)
    pred_t = t_util(xt + noise_t)
    t_loss = torch.nn.BCEWithLogitsLoss()(
        pred_t, torch.tensor(np.transpose(y, (0, 3, 1, 2)))) \
        - cfg.noise_coeff * torch.mean(B_t.log())
    t_loss.backward()

    assert abs(float(loss) - float(t_loss.detach())) < 1e-5

    # leaf-wise gradient comparison via the importer's key map
    from adlm_tpu.utils.torch_import import _set_nested, _unet_key_to_paths
    g_want = jax.tree.map(
        lambda a: np.full(np.shape(a), np.nan, np.float32), n_params)
    for key, p in t_noise.named_parameters():
        for coll, path in _unet_key_to_paths(key, DEPTH):
            if coll != "params":
                continue
            g = p.grad.detach().numpy()
            g = np.transpose(g, (2, 3, 1, 0)) if g.ndim == 4 else g
            assert _set_nested(g_want, path, g), key
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), b, rtol=2e-3, atol=1e-6),
        grads, g_want)


def test_train_noise_from_torch_lightning_checkpoint(tmp_path, monkeypatch):
    """End-to-end: `unoise-train-noise --utility-torch-ckpt` consumes a
    reference pytorch-lightning UtilityModel checkpoint (the format the
    reference publishes its models in, train_noise.py:112-119) — the
    frozen utility arrives bit-exact and the run completes."""
    import argparse

    from adlm_tpu.train import unoise_pipeline

    torch.manual_seed(9)
    t_model = REF_UNET.UNet(in_channels=3, out_channels=1, depth=2, cf=2)
    ckpt = {"state_dict": {f"model.{k}": v
                           for k, v in t_model.state_dict().items()},
            "hyper_parameters": {"depth": 2, "channel_factor": 2}}
    ckpt_path = tmp_path / "utility.ckpt"
    torch.save(ckpt, str(ckpt_path))

    rng = np.random.RandomState(31)
    imgs_path = tmp_path / "images.npy"
    masks_path = tmp_path / "masks.npy"
    np.save(imgs_path, rng.rand(10, 16, 16).astype(np.float32))
    np.save(masks_path, (rng.rand(10, 16, 16) > 0.5).astype(np.float32))
    monkeypatch.setenv("RESULTS_DIR", str(tmp_path / "runs"))

    args = argparse.Namespace(
        imgs=str(imgs_path), masks=str(masks_path),
        boxes=str(tmp_path / "missing_boxes.npy"),
        run_name="noise_from_torch", utility_run="unused",
        depth=2, channel_factor=2, learning_rate=3e-3, batch_size=4,
        epochs=1, pretrained=None, pretrained_torch_ckpt=None,
        utility_torch_ckpt=str(ckpt_path),
        min_scale=1.0, max_scale=5.0, noise_coeff=0.001)
    state = unoise_pipeline.train_noise(args)

    # the frozen utility inside the noise state equals the torch weights
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params_want = jax.tree.map(np.copy, jax.tree.map(
        np.asarray, state.util_params))
    bs_want = jax.tree.map(np.copy, jax.tree.map(
        np.asarray, state.util_batch_stats))
    load_unoise_unet(params_want, bs_want, sd)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.util_params, params_want)

    # architecture mismatch on --pretrained-torch-ckpt is a hard error
    args.pretrained_torch_ckpt = str(ckpt_path)
    args.depth = 3
    with pytest.raises(SystemExit):
        unoise_pipeline.train_noise(args)


def test_torch_ckpt_truncated_fails_loudly(tmp_path):
    """A checkpoint missing keys must NOT leave silently-random weights
    in the imported UNet (review finding: the template is NaN-filled
    and every unwritten leaf is reported)."""
    from adlm_tpu.train.unoise_pipeline import _torch_unet_payload

    torch.manual_seed(12)
    t_model = REF_UNET.UNet(in_channels=3, out_channels=1, depth=2, cf=2)
    sd = {f"model.{k}": v for k, v in t_model.state_dict().items()
          if "conv1x1" not in k}  # drop the head
    ckpt_path = tmp_path / "truncated.ckpt"
    torch.save({"state_dict": sd}, str(ckpt_path))
    with pytest.raises(ValueError, match="uninitialized"):
        _torch_unet_payload(str(ckpt_path), "utility",
                            jnp.zeros((1, 16, 16, 3)))
