"""Multi-window training-trajectory golden: full stack vs torch.

The step golden (test_train_step_golden) proves one loss+gradient
matches, and the optimizer golden (test_optimizer_golden) proves the
isolated Adam chains match — this test composes them the way the
reference actually trains (reference segmentation/module.py:119-261 +
train.py:135-170):

* torch side: the reference's manual-optimization accumulation loop —
  ``optimizer.zero_grad()`` at window start, ``backward(loss/iter_size)``
  per microbatch, ``optimizer.step()`` + ``lr_scheduler.step()`` at the
  window boundary (module.py:236-243) — on ``torch.optim.Adam`` built
  from the reference's exact param-group specs
  (module.py:333-393 ``configure_optimizers`` + utils.py:42-61
  ``get_params``) under the deeplab ``PolynomialLR`` schedule
  (module.py:395-401; the deeplab_pytorch submodule is absent from the
  reference checkout, so the scheduler formula is reconstructed below).
* flax side: ``make_train_step`` driven with the same microbatches.

Parameters are asserted close after EVERY window, across a
warmup→joint phase transition (the reference reloads the net and builds
a fresh optimizer per phase, train.py:150-160), covering schedule
off-by-ones and accumulation-boundary bugs no single-step test can see.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from adlm_tpu.models.ppnet import default_proto_class  # noqa: E402
from adlm_tpu.train.protoseg import (  # noqa: E402
    init_protoseg_state,
    make_train_step,
)

from test_train_step_golden import (  # noqa: E402
    N_CLASSES,
    N_PROTOS,
    PROTO_CH,
    _build_pair,
    _flax_backbone_to_torch_sd,
    _make_cfg,
    _random_labels,
    _reference_step_loss,
)

ITER_SIZE = 2
BATCH = 2


class _PolyLR:
    """deeplab_pytorch ``PolynomialLR`` with step_size=1 (imported at
    reference segmentation/module.py:14, configured :395-401): after the
    k-th ``step()`` every group runs at ``base·(1 − k/iter_max)^power``;
    update 0 runs at the base LR; decay clamps at iter_max."""

    def __init__(self, optimizer, iter_max, power):
        self.opt = optimizer
        self.iter_max = iter_max
        self.power = power
        self.base_lrs = [g["lr"] for g in optimizer.param_groups]
        self.k = 0

    def step(self):
        self.k += 1
        frac = 1.0 - min(self.k, self.iter_max) / self.iter_max
        for g, base in zip(self.opt.param_groups, self.base_lrs):
            g["lr"] = base * frac ** self.power


def _get_params(backbone, key):
    """Reference ``get_params`` (segmentation/utils.py:42-61) on the
    torch DeepLabV2 reconstruction: 1x = Conv2d params in layer*
    modules, 10x = ASPP conv weights, 20x = ASPP conv biases."""
    out = []
    for name, m in backbone.named_modules():
        if not isinstance(m, torch.nn.Conv2d):
            continue
        if key == "1x" and "layer" in name:
            out.extend(p for p in m.parameters())
        elif key == "10x" and "aspp" in name:
            out.append(m.weight)
        elif key == "20x" and "aspp" in name:
            out.append(m.bias)
    return out


def _make_torch_optimizer(tp, cfg, phase, max_steps=None):
    """The reference's ``configure_optimizers``
    (segmentation/module.py:333-403) for the tiny TorchPPNet."""
    t = cfg.train
    if phase == 0:
        aspp = [p for c in (tp.backbone.aspp.c0, tp.backbone.aspp.c1,
                            tp.backbone.aspp.c2, tp.backbone.aspp.c3)
                for p in (c.weight, c.bias)]
        specs = [
            {"params": aspp,  # add_on_layers is param-free (sigmoid)
             "lr": t.warm_optimizer_lr_add_on_layers,
             "weight_decay": t.warm_optimizer_weight_decay},
            {"params": [tp.prototype_vectors],
             "lr": t.warm_optimizer_lr_prototype_vectors},
        ]
        sched = None
    elif phase == 1:
        lr_f = t.joint_optimizer_lr_features
        wd = t.joint_optimizer_weight_decay
        specs = [
            {"params": _get_params(tp.backbone, "1x"), "lr": lr_f,
             "weight_decay": wd},
            {"params": _get_params(tp.backbone, "10x"), "lr": 10 * lr_f,
             "weight_decay": wd},
            # the reference's "20x" group also gets 10·lr (module.py:372)
            {"params": _get_params(tp.backbone, "20x"), "lr": 10 * lr_f,
             "weight_decay": wd},
            {"params": [tp.prototype_vectors],
             "lr": t.joint_optimizer_lr_prototype_vectors},
        ]
        opt = torch.optim.Adam(specs)
        sched = _PolyLR(opt, iter_max=max(max_steps // t.iter_size, 1),
                        power=t.poly_lr_power)
        return opt, sched
    else:
        specs = [{"params": tp.last_layer.parameters(),
                  "lr": t.last_layer_optimizer_lr}]
        sched = None
    return torch.optim.Adam(specs), sched


def _torch_window(tp, opt, sched, cfg, proto_class, batches):
    """One accumulation window of the reference's manual loop
    (module.py:119-243): zero at window start, backward(loss/iter_size)
    per microbatch, one step, then the scheduler."""
    opt.zero_grad()
    losses = []
    for images, labels in batches:
        xt = torch.tensor(np.transpose(images, (0, 3, 1, 2)))
        loss = _reference_step_loss(tp, xt, labels, np.asarray(proto_class),
                                    w_kld=cfg.train.loss_weight_kld)
        (loss / cfg.train.iter_size).backward()
        losses.append(float(loss.detach()))
    opt.step()
    if sched is not None:
        sched.step()
    return float(np.mean(losses))


def _flat_tensors(params, constants, tp):
    """name → (jax_tensor, torch_tensor) in torch layout, float64."""
    out = {}
    sd_flax = _flax_backbone_to_torch_sd(
        jax.tree.map(np.asarray, params)["features"]["base"],
        jax.tree.map(np.asarray, constants)["features"]["base"])
    sd_torch = tp.backbone.state_dict()
    for k, v in sd_flax.items():
        out[f"backbone.{k}"] = (
            v.numpy().astype(np.float64),
            sd_torch[k].detach().numpy().astype(np.float64))
    out["prototype_vectors"] = (
        np.asarray(params["prototype_vectors"], np.float64),
        tp.prototype_vectors.detach().numpy()[:, :, 0, 0].astype(
            np.float64))
    out["last_layer"] = (
        np.asarray(params["last_layer"], np.float64),
        tp.last_layer.weight.detach().numpy().T.astype(np.float64))
    return out


class _DeltaChecker:
    """Per-window parameter-DELTA comparison.

    Element-wise parameter equality is the wrong assertion for an Adam
    trajectory: an element whose true gradient sits at numerical-noise
    level legitimately takes its first update in opposite directions in
    the two frameworks (update ≈ ±lr·sign(g)), and the diverged moments
    then keep those elements ~lr apart forever.  What a composition bug
    actually does is change the WINDOW UPDATE as a whole:

    * schedule off-by-one → this window's Δ scaled by ≥30% (poly decay
      steps are that large at small iter_max),
    * wrong freeze set → a tensor moves on one side only,
    * accumulation-boundary bug (stepping per microbatch) → Δ doubles.

    So after every window we compare each tensor's update Δ = p_now −
    p_prev between frameworks in relative L2 (noise sign-flips on k of
    n elements contribute ~√(k/n) ≪ tolerance), demand frozen tensors
    stay exactly frozen, and bound the absolute element drift at a few
    LRs."""

    def __init__(self, params, constants, tp):
        self.prev = {k: (a.copy(), b.copy()) for k, (a, b) in
                     _flat_tensors(params, constants, tp).items()}
        self.lr_cap = 0.0  # running max of phase LRs (drift persists)

    def check(self, params, constants, tp, tag, max_lr, rel_tol=0.10):
        self.lr_cap = max(self.lr_cap, max_lr)
        max_lr = self.lr_cap
        cur = _flat_tensors(params, constants, tp)
        for k, (a, b) in cur.items():
            pa, pb = self.prev[k]
            dj, dt = a - pa, b - pb
            nt = float(np.linalg.norm(dt))
            nj = float(np.linalg.norm(dj))
            if nt < 1e-12:
                assert nj < 1e-9, (
                    f"{tag}: {k} frozen in torch but moved {nj:.2e} in jax")
            else:
                rel = float(np.linalg.norm(dj - dt)) / nt
                assert rel <= rel_tol, (
                    f"{tag}: {k} window update diverged {rel * 100:.1f}% "
                    f"(‖Δt‖={nt:.2e}, ‖Δj‖={nj:.2e})")
            drift = float(np.max(np.abs(a - b)))
            assert drift <= 4.0 * max_lr, (
                f"{tag}: {k} absolute drift {drift:.2e} > 4·lr")
        self.prev = {k: (a.copy(), b.copy()) for k, (a, b) in cur.items()}


def _window_batches(seed):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(ITER_SIZE):
        images = rng.rand(BATCH, 33, 33, 3).astype(np.float32)
        labels = _random_labels(seed * 31 + i, B=BATCH)
        out.append((images, labels))
    return out


def test_trajectory_warmup_to_joint():
    """2 warmup windows → phase transition → 3 joint windows; params
    compared after every window (5 optimizer updates total, poly LR
    active across the full joint budget)."""
    # LRs large enough that a schedule off-by-one is visible above the
    # comparison tolerance
    cfg = _make_cfg()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, iter_size=ITER_SIZE,
        joint_optimizer_lr_features=1e-3,
        joint_optimizer_lr_prototype_vectors=2.5e-3,
        warm_optimizer_lr_add_on_layers=2.5e-3,
        warm_optimizer_lr_prototype_vectors=2.5e-3))

    model, params, constants, tp = _build_pair(cfg, seed=11)
    proto_class = default_proto_class(N_PROTOS, N_CLASSES)

    # ---- warmup phase ----
    n_warm, n_joint = 2, 3
    state = init_protoseg_state(
        model, cfg, phase=0, max_steps=None, rng=jax.random.PRNGKey(0),
        sample_input=jnp.zeros((1, 33, 33, 3)), params=params,
        constants=constants, proto_class=proto_class)
    step = make_train_step(model, cfg, phase=0)
    opt, sched = _make_torch_optimizer(tp, cfg, phase=0)
    checker = _DeltaChecker(state.params, state.constants, tp)

    for w in range(n_warm):
        batches = _window_batches(100 + w)
        loss_t = _torch_window(tp, opt, sched, cfg, proto_class, batches)
        imgs = jnp.asarray(np.stack([b[0] for b in batches]))
        labs = jnp.asarray(np.stack([b[1] for b in batches]))
        state, metrics = step(state, imgs, labs)
        np.testing.assert_allclose(float(metrics["loss"]), loss_t,
                                   rtol=1e-3)
        checker.check(state.params, state.constants, tp,
                      f"warmup window {w}", max_lr=2.5e-3)

    # ---- phase transition: params carry over, optimizers rebuilt
    # (reference train.py:150-160 reloads warmup_last.pth into a fresh
    # phase-1 module) ----
    max_steps = n_joint * cfg.train.iter_size
    state = init_protoseg_state(
        model, cfg, phase=1, max_steps=max_steps,
        rng=jax.random.PRNGKey(0), sample_input=jnp.zeros((1, 33, 33, 3)),
        params=state.params, constants=state.constants,
        proto_class=proto_class)
    step = make_train_step(model, cfg, phase=1, max_steps=max_steps)
    opt, sched = _make_torch_optimizer(tp, cfg, phase=1,
                                       max_steps=max_steps)

    for w in range(n_joint):
        batches = _window_batches(200 + w)
        loss_t = _torch_window(tp, opt, sched, cfg, proto_class, batches)
        imgs = jnp.asarray(np.stack([b[0] for b in batches]))
        labs = jnp.asarray(np.stack([b[1] for b in batches]))
        state, metrics = step(state, imgs, labs)
        np.testing.assert_allclose(float(metrics["loss"]), loss_t,
                                   rtol=1e-3)
        checker.check(state.params, state.constants, tp,
                      f"joint window {w}", max_lr=1e-2)

    # ---- second phase transition: last-layer finetune (phase 2,
    # reference train.py:173-190) — only last_layer may move ----
    state = init_protoseg_state(
        model, cfg, phase=2, max_steps=None,
        rng=jax.random.PRNGKey(0), sample_input=jnp.zeros((1, 33, 33, 3)),
        params=state.params, constants=state.constants,
        proto_class=proto_class)
    step = make_train_step(model, cfg, phase=2)
    opt, sched = _make_torch_optimizer(tp, cfg, phase=2)

    for w in range(2):
        batches = _window_batches(400 + w)
        loss_t = _torch_window(tp, opt, sched, cfg, proto_class, batches)
        imgs = jnp.asarray(np.stack([b[0] for b in batches]))
        labs = jnp.asarray(np.stack([b[1] for b in batches]))
        state, metrics = step(state, imgs, labs)
        np.testing.assert_allclose(float(metrics["loss"]), loss_t,
                                   rtol=1e-3)
        checker.check(state.params, state.constants, tp,
                      f"last window {w}",
                      max_lr=cfg.train.last_layer_optimizer_lr)


def test_trajectory_joint_fused_accumulation():
    """The fused-accumulation path (one flattened batch with grouped
    loss means) must track the same torch trajectory as the scan path —
    the bench-default config trains this way."""
    cfg = _make_cfg()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, iter_size=ITER_SIZE, fused_accumulation=True,
        joint_optimizer_lr_features=1e-3,
        joint_optimizer_lr_prototype_vectors=2.5e-3))

    model, params, constants, tp = _build_pair(cfg, seed=13)
    proto_class = default_proto_class(N_PROTOS, N_CLASSES)

    n_joint = 3
    max_steps = n_joint * cfg.train.iter_size
    state = init_protoseg_state(
        model, cfg, phase=1, max_steps=max_steps,
        rng=jax.random.PRNGKey(0), sample_input=jnp.zeros((1, 33, 33, 3)),
        params=params, constants=constants, proto_class=proto_class)
    step = make_train_step(model, cfg, phase=1, max_steps=max_steps)
    opt, sched = _make_torch_optimizer(tp, cfg, phase=1,
                                       max_steps=max_steps)
    checker = _DeltaChecker(state.params, state.constants, tp)

    for w in range(n_joint):
        batches = _window_batches(300 + w)
        loss_t = _torch_window(tp, opt, sched, cfg, proto_class, batches)
        imgs = jnp.asarray(np.stack([b[0] for b in batches]))
        labs = jnp.asarray(np.stack([b[1] for b in batches]))
        state, metrics = step(state, imgs, labs)
        np.testing.assert_allclose(float(metrics["loss"]), loss_t,
                                   rtol=1e-3)
        checker.check(state.params, state.constants, tp,
                      f"fused joint window {w}", max_lr=1e-2)


def _torch_reference_push(tp, proto_class, dataset):
    """The reference push scan, literally (segmentation/push.py:101,
    161-280): sequential over images, per-pixel patch-index dict,
    per-prototype argmin over eligible patches, strict-< global update.
    Independent of the framework's device-side masked-argmin path."""
    gmin = np.full(N_PROTOS, np.inf, np.float64)
    gfmap = np.zeros((N_PROTOS, PROTO_CH), np.float32)
    gimg = np.full(N_PROTOS, -1, np.int64)
    tp.eval()
    with torch.no_grad():
        for img_idx, (images, labels) in enumerate(dataset):
            xt = torch.tensor(np.transpose(images, (0, 3, 1, 2)))
            f = torch.sigmoid(tp.backbone(xt))       # conv_features
            d = tp._ref_l2(f, tp.prototype_vectors, tp.ones)
            fmap = f[0].numpy()                      # (C, h, w)
            dist = d[0].permute(1, 2, 0).numpy()     # (h, w, P)
            h, w = dist.shape[0], dist.shape[1]
            lab = labels[0]
            H, W = lab.shape
            patch_h, patch_w = H / h, W / w
            cls_to_patches = {c: set() for c in range(N_CLASSES)}
            for pi in range(H):                      # push.py:216-230
                for pj in range(W):
                    c = int(lab[pi, pj])
                    if c > 0:
                        cls_to_patches[c - 1].add(
                            (int(pi / patch_h), int(pj / patch_w)))
            for j in range(N_PROTOS):                # push.py:249-280
                patches = list(cls_to_patches[int(proto_class[j])])
                if not patches:
                    continue
                dists = np.asarray([dist[a, b, j] for a, b in patches])
                k = int(np.argmin(dists))
                if dists[k] < gmin[j]:
                    a, b = patches[k]
                    gmin[j] = dists[k]
                    gfmap[j] = fmap[:, a, b]
                    gimg[j] = img_idx
    return gmin, gfmap, gimg


def test_trajectory_joint_push_finetune():
    """The push phase composed INTO the trajectory (the reference's
    joint → push_prototypes → last-layer flow, train.py:150-233): after
    shared joint windows both frameworks project prototypes onto the
    same 4-image push set — winner images, distances, and the written
    prototype vectors must agree — then the last-layer finetune
    continues from the pushed weights with per-window delta checks.
    Covers what the per-phase tests can't: training on REPLACED
    prototype vectors with freshly reset optimizers."""
    from adlm_tpu.interpret.push import push_prototypes

    cfg = _make_cfg()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, iter_size=ITER_SIZE,
        joint_optimizer_lr_features=1e-3,
        joint_optimizer_lr_prototype_vectors=2.5e-3))

    model, params, constants, tp = _build_pair(cfg, seed=17)
    proto_class = default_proto_class(N_PROTOS, N_CLASSES)

    # ---- short joint phase so the pushed net is off-init ----
    n_joint = 2
    max_steps = n_joint * cfg.train.iter_size
    state = init_protoseg_state(
        model, cfg, phase=1, max_steps=max_steps,
        rng=jax.random.PRNGKey(1), sample_input=jnp.zeros((1, 33, 33, 3)),
        params=params, constants=constants, proto_class=proto_class)
    step = make_train_step(model, cfg, phase=1, max_steps=max_steps)
    opt, sched = _make_torch_optimizer(tp, cfg, phase=1,
                                       max_steps=max_steps)
    checker = _DeltaChecker(state.params, state.constants, tp)
    for w in range(n_joint):
        batches = _window_batches(500 + w)
        loss_t = _torch_window(tp, opt, sched, cfg, proto_class, batches)
        imgs = jnp.asarray(np.stack([b[0] for b in batches]))
        labs = jnp.asarray(np.stack([b[1] for b in batches]))
        state, metrics = step(state, imgs, labs)
        np.testing.assert_allclose(float(metrics["loss"]), loss_t,
                                   rtol=1e-3)
        checker.check(state.params, state.constants, tp,
                      f"pre-push joint window {w}", max_lr=1e-2)

    # ---- push on a shared 4-image set (batched path, batch 2) ----
    rng = np.random.RandomState(600)
    push_set = [(rng.rand(1, 33, 33, 3).astype(np.float32),
                 _random_labels(600 + i, B=1)) for i in range(4)]
    gmin_t, gfmap_t, gimg_t = _torch_reference_push(
        tp, np.asarray(proto_class), push_set)
    assert (gimg_t >= 0).all()  # every prototype's class occurs

    new_params, new_pc, info = push_prototypes(
        model, state.params, state.constants, proto_class, push_set,
        N_CLASSES, dedup=False, batch_size=2, log=lambda *_: None)
    np.testing.assert_array_equal(info["proto_rf_boxes"][:, 0], gimg_t)
    np.testing.assert_allclose(info["min_distances"], gmin_t,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_params["prototype_vectors"]), gfmap_t,
        rtol=1e-4, atol=1e-6)

    # ---- last-layer finetune FROM the pushed weights ----
    with torch.no_grad():
        tp.prototype_vectors.copy_(
            torch.tensor(gfmap_t[:, :, None, None]))
    state = init_protoseg_state(
        model, cfg, phase=2, max_steps=None,
        rng=jax.random.PRNGKey(1), sample_input=jnp.zeros((1, 33, 33, 3)),
        params=new_params, constants=state.constants,
        proto_class=new_pc)
    step = make_train_step(model, cfg, phase=2)
    opt, sched = _make_torch_optimizer(tp, cfg, phase=2)
    prior_cap = checker.lr_cap
    # fresh baselines (push REPLACED the prototype vectors), but drift
    # accumulated in the joint phase persists — keep its LR cap
    checker = _DeltaChecker(state.params, state.constants, tp)
    checker.lr_cap = prior_cap
    for w in range(2):
        batches = _window_batches(700 + w)
        loss_t = _torch_window(tp, opt, sched, cfg, new_pc, batches)
        imgs = jnp.asarray(np.stack([b[0] for b in batches]))
        labs = jnp.asarray(np.stack([b[1] for b in batches]))
        state, metrics = step(state, imgs, labs)
        np.testing.assert_allclose(float(metrics["loss"]), loss_t,
                                   rtol=1e-3)
        checker.check(state.params, state.constants, tp,
                      f"post-push last window {w}",
                      max_lr=cfg.train.last_layer_optimizer_lr)

    # ---- prune → pruned finetune (reference run_pruning +
    # train --pruned, train.py:197-233).  The prune DECISION is golden
    # in test_prune_golden; here a fixed keep set exercises the shape
    # surgery (model.py:311-336) composed with continued training on
    # ragged prototype identities in both frameworks. ----
    from adlm_tpu.models.ppnet import PPNet, prune_params

    keep = [0, 2, 3, 5]
    p2, pc2 = prune_params(state.params, new_pc, keep)
    with torch.no_grad():
        tp.prototype_vectors = torch.nn.Parameter(
            tp.prototype_vectors[keep].clone())
        tp.ones = tp.ones[keep].clone()
        new_last = torch.nn.Linear(len(keep), N_CLASSES, bias=False)
        new_last.weight.copy_(tp.last_layer.weight[:, keep])
        tp.last_layer = new_last
    cfg2 = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, num_prototypes=len(keep)))
    model2 = PPNet(cfg=cfg2.model)
    state = init_protoseg_state(
        model2, cfg2, phase=2, max_steps=None,
        rng=jax.random.PRNGKey(2), sample_input=jnp.zeros((1, 33, 33, 3)),
        params=p2, constants=state.constants, proto_class=pc2)
    step = make_train_step(model2, cfg2, phase=2)
    opt, sched = _make_torch_optimizer(tp, cfg, phase=2)
    prior_cap = checker.lr_cap
    checker = _DeltaChecker(state.params, state.constants, tp)
    checker.lr_cap = prior_cap
    for w in range(2):
        batches = _window_batches(800 + w)
        loss_t = _torch_window(tp, opt, sched, cfg, np.asarray(pc2),
                               batches)
        imgs = jnp.asarray(np.stack([b[0] for b in batches]))
        labs = jnp.asarray(np.stack([b[1] for b in batches]))
        state, metrics = step(state, imgs, labs)
        np.testing.assert_allclose(float(metrics["loss"]), loss_t,
                                   rtol=1e-3)
        checker.check(state.params, state.constants, tp,
                      f"pruned finetune window {w}",
                      max_lr=cfg.train.last_layer_optimizer_lr)
