"""Training-engine tests: phase freezing, grad accumulation, convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adlm_tpu.core.config import (
    ExperimentConfig,
    PPNetConfig,
    DataConfig,
    TrainConfig,
    UNoiseConfig,
)
from adlm_tpu.models.ppnet import PPNet
from adlm_tpu.train.optimizer import (
    ADD_ON,
    ASPP_B,
    ASPP_W,
    BACKBONE,
    LAST,
    PROTOS,
    label_params,
    poly_schedule,
)
from adlm_tpu.train.protoseg import (
    init_protoseg_state,
    make_eval_step,
    make_train_step,
)
from adlm_tpu.train.unoise import (
    init_noise_state,
    init_utility_state,
    make_noise_eval_step,
    make_noise_train_step,
    make_utility_eval_step,
    make_utility_train_step,
)


def tiny_experiment(**train_kw) -> ExperimentConfig:
    return ExperimentConfig(
        name="tiny",
        model=PPNetConfig(num_prototypes=6, num_classes=3,
                          prototype_channels=8, deeplab_n_features=8,
                          deeplab_n_blocks=(1, 1, 1, 1), img_size=33),
        data=DataConfig(window_size=(33, 33)),
        train=TrainConfig(iter_size=2, **train_kw),
    )


def make_batch(rng, cfg, n_micro=2, bs=2):
    h, w = cfg.data.window_size
    images = rng.rand(n_micro, bs, h, w, 3).astype(np.float32)
    labels = rng.randint(0, cfg.model.num_classes + 1,
                         size=(n_micro, bs, h, w)).astype(np.int32)
    return jnp.asarray(images), jnp.asarray(labels)


def _changed(a, b):
    return jax.tree_util.tree_map(
        lambda x, y: bool(np.any(np.asarray(x) != np.asarray(y))), a, b)


def test_label_params_groups():
    cfg = tiny_experiment()
    model = PPNet(cfg=cfg.model)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 33, 3)))
    labels = label_params(v["params"])
    assert labels["prototype_vectors"] == PROTOS
    assert labels["last_layer"] == LAST
    aspp = labels["features"]["base"]["aspp"]["c0"]
    assert aspp["kernel"] == ASPP_W
    assert aspp["bias"] == ASPP_B
    body = labels["features"]["base"]["layer2"]["block1"]["reduce"]["conv"]
    assert body["kernel"] == BACKBONE


def test_poly_schedule():
    s = poly_schedule(1.0, 100, 0.9)
    np.testing.assert_allclose(float(s(0)), 1.0)
    np.testing.assert_allclose(float(s(50)), 0.5 ** 0.9, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-9)


PHASE_EXPECTATIONS = [
    # phase, trains backbone, trains aspp, trains protos, trains last
    (0, False, True, True, False),
    (1, True, True, True, False),
    (2, False, False, False, True),
]


@pytest.mark.parametrize("phase,bb,aspp,protos,last", PHASE_EXPECTATIONS)
def test_phase_freezing(phase, bb, aspp, protos, last):
    cfg = tiny_experiment(loss_weight_kld=0.25)
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(0)
    images, labels = make_batch(rng, cfg)
    state = init_protoseg_state(model, cfg, phase, 100,
                                jax.random.PRNGKey(0), images[0])
    step = make_train_step(model, cfg, phase, 100)
    new_state, metrics = step(state, images, labels)

    ch = _changed(state.params, new_state.params)
    assert ch["prototype_vectors"] == protos
    assert ch["last_layer"] == last
    aspp_changed = any(jax.tree_util.tree_leaves(
        ch["features"]["base"]["aspp"]))
    assert aspp_changed == aspp
    body_changed = any(jax.tree_util.tree_leaves(
        ch["features"]["base"]["layer2"]))
    assert body_changed == bb
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["n_patches"]) > 0


def test_train_loss_decreases_warmup():
    cfg = tiny_experiment(loss_weight_kld=0.0)
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(1)
    images, labels = make_batch(rng, cfg)
    state = init_protoseg_state(model, cfg, 0, 100,
                                jax.random.PRNGKey(1), images[0])
    step = make_train_step(model, cfg, 0, 100)
    losses = []
    for _ in range(8):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_bf16_training_mode():
    cfg = tiny_experiment(loss_weight_kld=0.25, compute_dtype="bfloat16")
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(11)
    images, labels = make_batch(rng, cfg)
    state = init_protoseg_state(model, cfg, 0, 100,
                                jax.random.PRNGKey(11), images[0])
    step = make_train_step(model, cfg, 0, 100)
    new_state, metrics = step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    # params stay f32 (master weights)
    assert new_state.params["prototype_vectors"].dtype == jnp.float32
    changed = np.any(np.asarray(new_state.params["prototype_vectors"]) !=
                     np.asarray(state.params["prototype_vectors"]))
    assert changed


def test_eval_step_runs_and_counts():
    cfg = tiny_experiment(loss_weight_kld=0.25)
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(2)
    images, labels = make_batch(rng, cfg, n_micro=1)
    state = init_protoseg_state(model, cfg, 0, 10,
                                jax.random.PRNGKey(2), images[0])
    ev = make_eval_step(model, cfg)
    metrics = ev(state, images[0], labels[0])
    assert 0 <= float(metrics["n_correct"]) <= float(metrics["n_patches"])


def test_eval_step_n_valid_masks_tail_images():
    """``n_valid=k`` must make the trailing images contribute NOTHING:
    metrics equal a batch whose tail labels are all void (and the KLD
    term sees no pixels from them) — the wrap-around val-batch fix."""
    cfg = tiny_experiment(loss_weight_kld=0.25)
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(5)
    images, labels = make_batch(rng, cfg, n_micro=4)
    B = images.shape[0] * images.shape[1]
    flat_img = np.asarray(images).reshape(B, *images.shape[2:])
    flat_lab = np.asarray(labels).reshape(B, *labels.shape[2:])
    state = init_protoseg_state(model, cfg, 0, 10,
                                jax.random.PRNGKey(5), flat_img[:1])
    ev = make_eval_step(model, cfg)

    masked = ev(state, jnp.asarray(flat_img), jnp.asarray(flat_lab),
                n_valid=2)
    voided = flat_lab.copy()
    voided[2:] = 0  # void class: contributes to no CE pixel / KLD pair
    ref = ev(state, jnp.asarray(flat_img), jnp.asarray(voided))
    assert float(masked["n_patches"]) == float(ref["n_patches"])
    np.testing.assert_allclose(float(masked["cross_entropy"]),
                               float(ref["cross_entropy"]), rtol=1e-6)
    np.testing.assert_allclose(float(masked["kld_loss"]),
                               float(ref["kld_loss"]), rtol=1e-6)
    assert float(masked["n_correct"]) == float(ref["n_correct"])
    # and the mask actually bites vs the unmasked batch
    full = ev(state, jnp.asarray(flat_img), jnp.asarray(flat_lab))
    assert float(full["n_patches"]) > float(masked["n_patches"])


@pytest.mark.slow
def test_grad_accumulation_equals_mean_of_grads():
    """One step over [b1, b2] must equal a step with mean(g1, g2)."""
    import optax
    from adlm_tpu.train.protoseg import loss_fn

    cfg = tiny_experiment(loss_weight_kld=0.0)
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(3)
    images, labels = make_batch(rng, cfg, n_micro=2)
    state = init_protoseg_state(model, cfg, 0, 100,
                                jax.random.PRNGKey(3), images[0])

    step = make_train_step(model, cfg, 0, 100)
    new_state, _ = step(state, images, labels)

    grad_fn = jax.grad(loss_fn, has_aux=True)
    g1, _ = grad_fn(state.params, state.constants, model, state.proto_class,
                    cfg, (images[0], labels[0]), True)
    g2, _ = grad_fn(state.params, state.constants, model, state.proto_class,
                    cfg, (images[1], labels[1]), True)
    mean_g = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
    from adlm_tpu.train.optimizer import make_optimizer
    tx = make_optimizer(cfg.train, 0, 100)
    updates, _ = tx.update(mean_g, state.opt_state, state.params)
    manual = optax.apply_updates(state.params, updates)
    np.testing.assert_allclose(
        np.asarray(new_state.params["prototype_vectors"]),
        np.asarray(manual["prototype_vectors"]), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# U-Noise
# ---------------------------------------------------------------------------

def _unoise_cfg():
    return UNoiseConfig(depth=2, channel_factor=3, util_depth=2,
                        util_channel_factor=3, learning_rate=3e-3)


def test_utility_training_learns_identity_mask():
    cfg = _unoise_cfg()
    rng = np.random.RandomState(4)
    images = rng.rand(4, 16, 16, 3).astype(np.float32)
    masks = (images[..., :1] > 0.5).astype(np.float32)
    images_j, masks_j = jnp.asarray(images), jnp.asarray(masks)

    state = init_utility_state(cfg, jax.random.PRNGKey(4), images_j)
    step = make_utility_train_step(cfg)
    first = None
    for i in range(30):
        state, loss = step(state, images_j, masks_j)
        if first is None:
            first = float(loss)
    assert float(loss) < first

    ev = make_utility_eval_step(cfg)
    metrics = ev(state, images_j, masks_j)
    assert float(metrics["val_dice"]) > 0.5


def test_noise_training_freezes_utility():
    cfg = _unoise_cfg()
    rng = np.random.RandomState(5)
    images = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(2, 16, 16, 1) > 0.5).astype(np.float32))

    util = init_utility_state(cfg, jax.random.PRNGKey(5), images)
    noise = init_noise_state(cfg, jax.random.PRNGKey(6), images, util)
    step = make_noise_train_step(cfg)
    new_noise, metrics = step(noise, images, masks, jax.random.PRNGKey(7))

    # utility params untouched, noise params updated
    same_util = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(np.all(np.asarray(a) == np.asarray(b))),
        noise.util_params, new_noise.util_params))
    assert same_util
    changed = any(jax.tree_util.tree_leaves(_changed(
        noise.params, new_noise.params)))
    assert changed
    assert 0.0 < float(metrics["mean_B"]) < 1.0

    ev = make_noise_eval_step(cfg)
    m = ev(new_noise, images, masks, jax.random.PRNGKey(8))
    assert np.isfinite(float(m["val_loss"]))


def test_remat_training_mode_matches_standard():
    cfg = tiny_experiment(loss_weight_kld=0.25)
    cfg_r = tiny_experiment(loss_weight_kld=0.25, remat=True)
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(12)
    images, labels = make_batch(rng, cfg)
    state = init_protoseg_state(model, cfg, 0, 100,
                                jax.random.PRNGKey(12), images[0])
    s1, m1 = make_train_step(model, cfg, 0, 100)(state, images, labels)
    s2, m2 = make_train_step(model, cfg_r, 0, 100)(state, images, labels)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params["prototype_vectors"]),
        np.asarray(s2.params["prototype_vectors"]), rtol=1e-5, atol=1e-6)


def test_msc_multiscale_train_step():
    """PASCAL-style MSC training: 4 outputs (base, 2 scales, max), loss
    averaged across them (reference module.py:141-228)."""
    cfg = ExperimentConfig(
        name="tiny_msc",
        model=PPNetConfig(num_prototypes=6, num_classes=3,
                          prototype_channels=8, deeplab_n_features=8,
                          deeplab_n_blocks=(1, 1, 1, 1), img_size=64,
                          msc_scales=(0.5, 0.75)),
        data=DataConfig(window_size=(64, 64)),
        train=TrainConfig(iter_size=1, loss_weight_kld=0.25),
    )
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(13)
    images = jnp.asarray(rng.rand(1, 2, 64, 64, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, size=(1, 2, 64, 64)))
    state = init_protoseg_state(model, cfg, 1, 10,
                                jax.random.PRNGKey(13), images[0])
    step = make_train_step(model, cfg, 1, 10)
    new_state, metrics = step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["n_patches"]) > 0
    # eval path (max-merged single output) works too
    ev = make_eval_step(model, cfg)
    m = ev(new_state, images[0], labels[0])
    assert np.isfinite(float(m["loss"]))
    # push_forward returns single-scale (max-merged) features
    v = {"params": new_state.params, "constants": new_state.constants}
    f, d = model.apply(v, images[0], method=PPNet.push_forward)
    assert f.ndim == 4 and d.ndim == 4


def test_kld_raw_label_indexing_quirk():
    """The reference-compat flag indexes prototype classes with RAW
    (unshifted) label values (reference module.py:170-178 vs :156-159);
    the loss must differ from the consistent default on the same batch."""
    from adlm_tpu.train.protoseg import loss_fn
    cfg_fix = tiny_experiment(loss_weight_kld=0.25)
    cfg_raw = tiny_experiment(loss_weight_kld=0.25,
                              kld_raw_label_indexing=True)
    model = PPNet(cfg=cfg_fix.model)
    rng = np.random.RandomState(20)
    images, labels = make_batch(rng, cfg_fix, n_micro=1)
    state = init_protoseg_state(model, cfg_fix, 0, 10,
                                jax.random.PRNGKey(20), images[0])
    _, m_fix = loss_fn(state.params, state.constants, model,
                       state.proto_class, cfg_fix,
                       (images[0], labels[0]), False)
    _, m_raw = loss_fn(state.params, state.constants, model,
                       state.proto_class, cfg_raw,
                       (images[0], labels[0]), False)
    assert np.isfinite(float(m_fix["kld_loss"]))
    assert np.isfinite(float(m_raw["kld_loss"]))
    assert float(m_fix["kld_loss"]) != float(m_raw["kld_loss"])


def test_fused_accumulation_matches_scan():
    """fused_accumulation=True (one batched fwd/bwd with group-
    normalized losses) must match the accumulation scan: same loss,
    metrics, and updated parameters.  Uses uneven void so microbatches
    have different valid-patch counts (the case where a naive flat mean
    would diverge), with KLD on."""
    cfg = tiny_experiment(loss_weight_kld=0.25)
    cfg_f = tiny_experiment(loss_weight_kld=0.25, fused_accumulation=True)
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(21)
    images, labels = make_batch(rng, cfg, n_micro=3)
    # microbatch 0 mostly void, microbatch 2 void-free
    labels = np.array(labels)
    labels[0][rng.rand(*labels[0].shape) < 0.8] = 0
    labels[2][labels[2] == 0] = 1
    labels = jnp.asarray(labels)

    state = init_protoseg_state(model, cfg, 1, 100,
                                jax.random.PRNGKey(21), images[0])
    s1, m1 = make_train_step(model, cfg, 1, 100)(state, images, labels)
    s2, m2 = make_train_step(model, cfg_f, 1, 100)(state, images, labels)

    for k in ("loss", "cross_entropy", "kld_loss", "n_correct",
              "n_patches"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=2e-5, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6),
        s1.params, s2.params)


def test_fused_accumulation_bf16_runs():
    cfg = tiny_experiment(loss_weight_kld=0.25,
                          fused_accumulation=True,
                          compute_dtype="bfloat16")
    model = PPNet(cfg=cfg.model)
    rng = np.random.RandomState(22)
    images, labels = make_batch(rng, cfg)
    state = init_protoseg_state(model, cfg, 1, 100,
                                jax.random.PRNGKey(22), images[0])
    new_state, metrics = make_train_step(model, cfg, 1, 100)(
        state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_unoise_bf16_training_mode():
    """bf16 compute for both U-Noise trainers: state dtypes stay f32,
    losses finite, parameters move."""
    import dataclasses
    from adlm_tpu.core.config import UNoiseConfig
    from adlm_tpu.train.unoise import (
        init_noise_state, init_utility_state, make_noise_train_step,
        make_utility_train_step)

    cfg = UNoiseConfig(depth=2, channel_factor=3, util_depth=2,
                       util_channel_factor=3, compute_dtype="bfloat16")
    rng = np.random.RandomState(30)
    images = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(4, 32, 32, 1) > 0.5).astype(np.float32))

    ustate = init_utility_state(cfg, jax.random.PRNGKey(30), images)
    ustep = make_utility_train_step(cfg)
    new_u, loss = ustep(ustate, images, masks)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(new_u.params) + jax.tree.leaves(
            new_u.batch_stats):
        assert leaf.dtype == jnp.float32, leaf.dtype

    nstate = init_noise_state(cfg, jax.random.PRNGKey(31), images, new_u)
    nstep = make_noise_train_step(cfg)
    new_n, m = nstep(nstate, images, masks, jax.random.PRNGKey(32))
    assert np.isfinite(float(m["train_loss"]))
    assert 0.0 < float(m["mean_B"]) < 1.0
    for leaf in jax.tree.leaves(new_n.params) + jax.tree.leaves(
            new_n.batch_stats):
        assert leaf.dtype == jnp.float32, leaf.dtype


def test_unoise_raw_input_parity():
    """Raw single-channel inputs with in-jit tile+normalize equal the
    legacy host-normalized 3-channel path: dataset outputs commute
    exactly, and utility/noise steps produce identical losses, params,
    and batch stats (the channels are identical copies)."""
    from adlm_tpu.data.unoise_data import (IMAGENET_MEAN, IMAGENET_STD,
                                           UNoiseDataset)

    rng = np.random.RandomState(9)
    slices = rng.rand(4, 16, 16).astype(np.float32)
    masks_np = (rng.rand(4, 16, 16) > 0.5).astype(np.float32)

    # dataset-level: normalize(tile(raw)) == legacy bit-for-bit under
    # the same augmentation draws
    legacy = UNoiseDataset(slices, masks_np, augment=True)
    raw = UNoiseDataset(slices, masks_np, augment=True, raw=True)
    for i in range(4):
        a_img, a_mask = legacy.load(i, np.random.RandomState(100 + i))
        r_img, r_mask = raw.load(i, np.random.RandomState(100 + i))
        assert r_img.shape == (16, 16, 1)
        want = (np.repeat(r_img, 3, -1) - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_array_equal(a_img, want.astype(np.float32))
        np.testing.assert_array_equal(a_mask, r_mask)

    # step-level: run the same batch through both paths
    cfg = _unoise_cfg()
    imgs_raw = jnp.asarray(slices[..., None])
    imgs_3ch = jnp.asarray(
        (np.repeat(slices[..., None], 3, -1)
         - IMAGENET_MEAN) / IMAGENET_STD)
    masks = jnp.asarray(masks_np[..., None])

    # the in-jit prep itself equals the host arithmetic
    from adlm_tpu.train.unoise import _prep_images
    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda x: _prep_images(x, True, False))(
            imgs_raw)),
        np.asarray(imgs_3ch), rtol=1e-6, atol=1e-7)

    state0 = init_utility_state(cfg, jax.random.PRNGKey(4), imgs_3ch)
    s_legacy, l_legacy = make_utility_train_step(cfg)(
        state0, imgs_3ch, masks)
    s_raw, l_raw = make_utility_train_step(cfg, raw=True)(
        state0, imgs_raw, masks)
    np.testing.assert_allclose(float(l_legacy), float(l_raw), rtol=1e-6)
    # NOTE: post-Adam params are NOT compared — XLA fuses the prep into
    # the first conv, reassociating f32 math; ulp-level gradient noise
    # flips the sign of near-zero gradients and the FIRST Adam update
    # is ±lr·sign(g).  Forward-side batch statistics are tight:
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s_legacy.batch_stats, s_raw.batch_stats)

    noise0 = init_noise_state(cfg, jax.random.PRNGKey(6), imgs_3ch,
                              state0)
    _, m_legacy = make_noise_train_step(cfg)(
        noise0, imgs_3ch, masks, jax.random.PRNGKey(7))
    _, m_raw = make_noise_train_step(cfg, raw=True)(
        noise0, imgs_raw, masks, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m_legacy["train_loss"]),
                               float(m_raw["train_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_legacy["mean_B"]),
                               float(m_raw["mean_B"]), rtol=1e-6)


def test_presigmoid_ln_keeps_feature_gradients_alive():
    """From-scratch trainability: with the pre-sigmoid input in the
    f32 saturation regime a drifting random-init backbone produces
    (measured at flagship scale: 100% of add-on outputs at exact 0/1,
    zero gradient to all 114 feature leaves), ``presigmoid_ln`` must
    keep gradients flowing through the add-on.  Default off: the param
    tree is exactly the reference architecture's."""
    import dataclasses

    from adlm_tpu.models.ppnet import AddOnLayers

    rng = np.random.RandomState(0)
    # the measured regime: per-channel |mean| up to ~123, std ~100 —
    # every pixel deep in a rail (|x| >= 100 -> exact 0/1 in f32)
    mag = rng.uniform(100.0, 500.0, size=(1, 5, 5, 8))
    sign = rng.choice([-1.0, 1.0], size=mag.shape)
    x = jnp.asarray((mag * sign).astype(np.float32))

    def grad_through(presigmoid_ln):
        mod = AddOnLayers(kind="deeplab_simple", in_channels=8,
                          proto_channels=8, presigmoid_ln=presigmoid_ln)
        variables = mod.init(jax.random.PRNGKey(0), x)

        def L(inp):
            return jnp.sum(jnp.sin(mod.apply(variables, inp)))

        return float(jnp.max(jnp.abs(jax.grad(L)(x)))), variables

    g_plain, v_plain = grad_through(False)
    g_ln, v_ln = grad_through(True)
    assert g_plain < 1e-10            # the measured pathology
    assert g_ln > 1e-4                # LN keeps the path alive
    assert "params" not in v_plain    # reference parity: no params
    assert "presigmoid_ln" in v_ln["params"]

    # the LN params join the ADD_ON optimizer group (trained in
    # warmup + joint, like the reference's add-ons)
    from adlm_tpu.train.optimizer import ADD_ON, label_params
    labels = label_params({"add_on": v_ln["params"]})
    assert all(l == ADD_ON
               for l in jax.tree_util.tree_leaves(labels))

    # and a full PPNet builds/runs with the flag on
    cfg = tiny_experiment()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, presigmoid_ln=True))
    model = PPNet(cfg=cfg.model)
    images, _ = make_batch(rng, cfg, n_micro=1)
    img = jnp.asarray(np.asarray(images).reshape(-1, *images.shape[2:]))
    state = init_protoseg_state(model, cfg, 1, 10,
                                jax.random.PRNGKey(0), img[:1])
    assert "presigmoid_ln" in str(
        jax.tree_util.tree_structure(dict(state.params)))
    logits, dist = model.apply(
        {"params": state.params, "constants": state.constants},
        img, train=False, return_distances=True)
    assert np.isfinite(np.asarray(logits)).all()


def test_ship_dtypes_single_source_of_truth():
    """train/pipeline.py::ship_dtypes is the one place the host→device
    wire dtypes live; deploy/precompile.py lowers train programs from
    it, so the warmed programs are byte-identical cache keys to what
    the train loop actually ships (a silent mismatch means every
    production run re-pays the multi-minute remote compile)."""
    import dataclasses as _dc
    import ml_dtypes
    from adlm_tpu.train.pipeline import ship_dtypes

    cfg = tiny_experiment()
    img, lab = ship_dtypes(cfg)
    assert img == np.dtype(np.float32)
    assert lab == np.dtype(np.uint8)

    bf16 = _dc.replace(cfg, train=_dc.replace(
        cfg.train, compute_dtype="bfloat16"))
    img, lab = ship_dtypes(bf16)
    assert img == np.dtype(ml_dtypes.bfloat16)
    assert lab == np.dtype(np.uint8)

    wide = _dc.replace(cfg, model=_dc.replace(cfg.model,
                                              num_classes=300))
    _, lab = ship_dtypes(wide)
    assert lab == np.dtype(np.int32)


def test_wire_uint8_roundtrip_and_step_parity():
    """wire_uint8 (TrainConfig): ship() inverts the loader's
    normalization to raw uint8 and loss_fn re-normalizes in-jit.  The
    round trip must stay within the 0.5/255 quantization bound, the
    wire dtype must flow through ship_dtypes (precompile cache keys),
    and a train step fed the uint8 window must match the f32-wire step
    to quantization noise."""
    import dataclasses as _dc

    from adlm_tpu.train.pipeline import ship_dtypes, wire_uint8_images

    cfg = tiny_experiment()
    cfg = _dc.replace(cfg, train=_dc.replace(cfg.train, wire_uint8=True))
    img_dt, _ = ship_dtypes(cfg)
    assert img_dt == np.dtype(np.uint8)

    # cells datasets (no /255) are rejected: the in-jit normalizer
    # assumes /255 scaling
    cells = _dc.replace(cfg, data=_dc.replace(cfg.data, cells=True))
    with pytest.raises(ValueError):
        ship_dtypes(cells)

    rng = np.random.RandomState(0)
    mean = np.asarray(cfg.data.mean, np.float32)
    std = np.asarray(cfg.data.std, np.float32)
    h, w = cfg.data.window_size
    # loader output: normalized blends of uint8 sources
    px = rng.uniform(0.0, 255.0, size=(2, 2, h, w, 3)).astype(np.float32)
    x = (px / 255.0 - mean) / std
    u8 = wire_uint8_images(x, cfg.data.mean, cfg.data.std)
    renorm = (u8.astype(np.float32) / 255.0 - mean) / std
    bound = (0.5 + 1e-2) / 255.0 / float(np.min(std))
    assert np.max(np.abs(renorm - x)) <= bound

    # step parity: uint8 wire vs f32 wire on the same window
    labels = rng.randint(0, cfg.model.num_classes + 1,
                         size=(2, 2, h, w)).astype(np.uint8)
    model = PPNet(cfg=cfg.model)
    state0 = init_protoseg_state(model, cfg, 1, 10, jax.random.PRNGKey(0),
                                 jnp.zeros((1, h, w, 3)))
    step = make_train_step(model, cfg, 1, 10)
    s_u8, m_u8 = step(state0, jnp.asarray(u8), jnp.asarray(labels))
    s_f32, m_f32 = step(state0, jnp.asarray(x), jnp.asarray(labels))
    assert np.isfinite(float(m_u8["loss"]))
    np.testing.assert_allclose(float(m_u8["loss"]), float(m_f32["loss"]),
                               atol=2e-2)
    # parameters after one optimizer step stay in the same neighbourhood
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float32)
                                         - np.asarray(b, np.float32)))),
        s_u8.params, s_f32.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-3


def test_joint_lr_warmup_ramps_first_updates():
    """joint_lr_warmup_updates=W scales the joint LR linearly
    (count+1)/W over the first W optimizer updates, then hands over to
    the unchanged reference poly decay.  Verified through the REAL
    optimizer: with constant gradients Adam's step magnitude equals the
    effective LR (sign-step), so successive update norms expose the
    schedule directly."""
    import dataclasses as _dc
    from adlm_tpu.train.optimizer import make_optimizer

    tcfg = _dc.replace(tiny_experiment().train, joint_lr_warmup_updates=4,
                       joint_optimizer_lr_prototype_vectors=1e-2,
                       iter_size=1)
    tx = make_optimizer(tcfg, 1, max_steps=100)   # 100 updates
    tx0 = make_optimizer(_dc.replace(tcfg, joint_lr_warmup_updates=0),
                         1, max_steps=100)

    params = {"prototype_vectors": jnp.ones((3, 4))}
    grads = {"prototype_vectors": jnp.full((3, 4), 0.37)}
    st, st0 = tx.init(params), tx0.init(params)
    base = 1e-2

    for u in range(6):
        upd, st = tx.update(grads, st, params)
        upd0, st0 = tx0.update(grads, st0, params)
        got = float(jnp.max(jnp.abs(upd["prototype_vectors"])))
        ref = float(jnp.max(jnp.abs(upd0["prototype_vectors"])))
        ramp = min((u + 1.0) / 4.0, 1.0)
        # the ramped update is exactly ramp × the unramped one (same
        # Adam moments — the scale sits after scale_by_adam)
        np.testing.assert_allclose(got, ramp * ref, rtol=1e-6)
    # and by update 6 the two schedules coincide (poly decay only)
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    assert ref < base  # poly decay engaged (count 5 of 100)
