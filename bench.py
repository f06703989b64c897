"""Headline benchmark: images/sec/chip at 2048×1024 Cityscapes inference.

Runs the flagship ProtoSeg model (PPNet, DeepLabV2-ResNet101 backbone,
190 prototypes / 19 classes — the cityscapes_kld_imnet configuration)
through the REAL evaluation path: full-resolution forward, fused Pallas
prototype head, on-device bilinear upsample + argmax + per-class I/U
accumulation (adlm_tpu.interpret.evaluate).  Only the confusion counters
leave the device.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip",
   "vs_baseline": N, "extra": {...}}
where "extra" carries secondary training-step timings (denominators
documented below).  Every metric reports the best of 3 independent
timing loops (`_best_dt`): the relay occasionally injects multi-second
stalls, and a one-shot mean is not robust against them.

Baseline derivation (REFERENCE_IPS = 2.5, reference publishes no
inference throughput — BASELINE.md):

* model cost: 3.17 TFLOP / 2048×1024 image, measured via XLA
  ``compiled.cost_analysis()`` on the full inference fn (this repo,
  cityscapes_kld_imnet shapes);
* reference GPU (README trains on an RTX 3090): 35.6 TFLOP/s fp32 peak,
  40–60% attainable for cuDNN conv stacks → 4.5–6.7 img/s
  compute-bound ceiling for the forward alone;
* the reference eval loop post-processes PER SAMPLE in numpy
  (eval_valid.py:166-214: per-class I/U + prototype stats over the
  2M-pixel maps) — measured at 0.69 s/img on this machine's CPU
  (≈0.25 s/img for the I/U part alone), serialized with the forward;
* combined: 1/(1/5.5 + 0.25) ≈ 2.3 img/s without stats — REFERENCE_IPS
  = 2.5 is the favourable round-up.  For scale: the reference-equivalent
  torch DeepLabV2 forward measured on this host's CPU (8 threads) is
  0.0385 img/s (1.62 s at 256×512, pixel-scaled).

"extra" metric denominators:

* ``joint_train_window_ms``: one jitted joint-phase training step over
  the reference budget super-batch (iter_size=5 × batch 2 × 513², bf16
  activations) — i.e. 10 training images per window;
* ``joint_train_free_b16_ms``: the training CEILING row — one batch-16
  513² fwd/bwd per optimizer step (iter_size 1), NOT the reference's
  batch-2 × iter_size-5 contract; shows what training throughput the
  framework reaches when batch geometry is free (PERF.md:
  "shape-bound, not backward-bound");
* ``unoise_util_step_ms``: one utility-UNet (depth 5, cf 6) training
  step, batch 8 × 256² Pancreas-slice shape;
* ``push_2048x1024_ips``: batched prototype push (push_forward +
  eligibility-masked B-major argmin over all 190 prototypes) at full
  2048×1024 resolution, batch 8 bf16 — the reference's push scans the
  whole train split this way (its push.py:101-280);
* ``stats_upsampled_eval_ips``: the slowest eval mode — full eval
  forward PLUS nearest-prototype argmin over bilinearly UPSAMPLED
  distances at label resolution (chunked scan) and 100 per-image
  random-pixel purity samples, batch 8 bf16 (reference
  eval_valid.py:158-214);
* ``inference_b1_ips``: the serving-latency shape — full-res inference
  at batch 1, pipelined steady state;
* ``cls_train_step_ms``: classification ProtoPNet joint step at the
  reference CUB-200 budget (vgg19, 2000×128 prototypes, 200 classes,
  batch 80 × 224² — reference settings.py:5-48).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: remote TPU compiles take minutes otherwise
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_IPS = 2.5  # derived estimate, see module docstring
# batch 16 measures 41.4 img/s vs 33.8 at batch 8 (67% vs 54% MXU) and
# 37.6 at batch 24 (non-power-of-2 batches pad MXU tiles) — see PERF.md
BATCH = 16
WARMUP = 2
ITERS = 8
H, W = 1024, 2048


ATTEMPT_TIMEOUT_S = 1800  # covers a full cold compile of every metric;
# a killed-mid-compile attempt still helps: completed compiles persist
# in .jax_cache, so the retry resumes further along
WEDGE_SLEEP_S = 300       # the wedged relay recovers in ~10-40 min
ERROR_SLEEP_S = 15        # transient INTERNAL errors retry quickly


def main() -> None:
    # The remote TPU relay occasionally throws transient INTERNAL
    # errors AND occasionally wedges entirely (every call hangs, no
    # errors — see CLAUDE.md).  Each attempt therefore runs in a
    # subprocess with a hard timeout; a timeout (= wedge) waits for the
    # relay watchdog, a fast error retries quickly.
    import subprocess
    import sys

    if os.environ.get("ADLM_BENCH_CHILD"):
        return _run()

    last = None
    for attempt in range(3):
        sleep_s = ERROR_SLEEP_S
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env={**os.environ, "ADLM_BENCH_CHILD": "1"},
                timeout=ATTEMPT_TIMEOUT_S, capture_output=True,
                text=True)
            out = proc.stdout.strip()
            # forward the child's "# ..." diagnostics (e.g. a skipped
            # extra metric) to stderr so they aren't silently dropped
            for line in out.splitlines()[:-1]:
                print(line, file=sys.stderr, flush=True)
            if proc.returncode == 0 and '"metric"' in out:
                print(out.splitlines()[-1], flush=True)
                return
            last = f"exit {proc.returncode}: {proc.stderr[-500:]}"
        except subprocess.TimeoutExpired:
            last = f"attempt timed out after {ATTEMPT_TIMEOUT_S}s " \
                   "(relay wedge?)"
            sleep_s = WEDGE_SLEEP_S
        print(f"# bench attempt {attempt + 1} failed: {last}", flush=True)
        if attempt < 2:
            time.sleep(sleep_s)
    raise RuntimeError(f"bench failed after 3 attempts: {last}")


def _best_dt(loop, repeats=3):
    """Smallest elapsed time across ``repeats`` runs of a pipelined
    timing loop.  The axon relay occasionally injects multi-second
    stalls into a single loop (observed: a ~49 ms train step once
    reported as 175 ms), so a one-shot mean is not robust; the minimum
    over independent loops reports uncontended device throughput."""
    return min(loop() for _ in range(repeats))


def _host_random_variables(model, rng_seed=42):
    """Materialize params host-side from abstract shapes: values don't
    affect throughput and this skips a multi-minute remote TPU compile
    of the init graph."""
    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((1, 65, 65, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(rng, init_x))
    nprng = np.random.RandomState(rng_seed)
    return jax.tree.map(
        lambda s: jnp.asarray(
            nprng.uniform(0.01, 0.1, size=s.shape).astype(s.dtype)),
        shapes)


def _bench_inference(cfg, model, params, constants, pc):
    from adlm_tpu.interpret.evaluate import make_inference_fn

    fn = make_inference_fn(model, cfg.model.num_classes, with_stats=False)
    nprng = np.random.RandomState(0)
    images = jnp.asarray(
        nprng.rand(BATCH, H, W, 3).astype(np.float32), jnp.bfloat16)
    labels = jnp.asarray(nprng.randint(0, 20, size=(BATCH, H, W)),
                         jnp.int32)

    # NOTE: sync via host fetch — block_until_ready does not reliably
    # wait for remote execution through the axon relay.  Steady-state
    # throughput: enqueue all calls (device pipeline stays full), then
    # drain.
    for _ in range(WARMUP):
        out = fn(params, constants, pc, images, labels)
        np.asarray(out["intersection"])

    def loop():
        t0 = time.perf_counter()
        outs = [fn(params, constants, pc, images, labels)
                for _ in range(ITERS)]
        for out in outs:
            np.asarray(out["intersection"])
        return time.perf_counter() - t0

    return BATCH * ITERS / _best_dt(loop)


def _bench_joint_train(cfg, model, variables, fused=False,
                       free_batch=None):
    """Joint-phase super-batch step at the reference training budget
    (iter_size=5, batch 2, 513² — configs/cityscapes_kld_imnet.gin).
    ``fused=True`` times the fused-accumulation path (one batch-10
    fwd/bwd with group-normalized losses; gradient-identical — see
    TrainConfig.fused_accumulation).  ``free_batch=N`` instead times a
    single-accumulation batch-N window — NOT the reference geometry
    (PERF.md: the reference budget is shape-bound at 40% MXU; this row
    shows the framework's training ceiling when batch geometry is
    free)."""
    import dataclasses
    from adlm_tpu.train.protoseg import (
        init_protoseg_state, make_train_step)

    train_kw = dict(compute_dtype="bfloat16", fused_accumulation=fused)
    if free_batch is not None:
        train_kw.update(iter_size=1, joint_batch_size=free_batch)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, **train_kw))
    state = init_protoseg_state(
        model, cfg, 1, 1000, jax.random.PRNGKey(0),
        jnp.zeros((1, 65, 65, 3), jnp.float32),
        params=variables["params"],
        constants=variables.get("constants", {}))
    step = make_train_step(model, cfg, 1, 1000)
    it, bs = cfg.train.iter_size, cfg.train.joint_batch_size
    wh, ww = cfg.data.window_size
    nprng = np.random.RandomState(1)
    images = jnp.asarray(nprng.rand(it, bs, wh, ww, 3).astype(np.float32))
    labels = jnp.asarray(nprng.randint(0, 20, size=(it, bs, wh, ww)),
                         jnp.int32)
    state, m = step(state, images, labels)
    np.asarray(m["loss"])  # warm + sync
    n = 4

    def loop():
        nonlocal state
        t0 = time.perf_counter()
        outs = []
        for _ in range(n):
            state, m = step(state, images, labels)
            outs.append(m)
        for m in outs:
            np.asarray(m["loss"])
        return time.perf_counter() - t0

    return _best_dt(loop) / n * 1000.0


def _bench_unoise_train(bf16=False):
    """Utility-UNet training step (depth 5, cf 6; reference
    src/train_util.py:45-59) at batch 8 × 256² slices."""
    from adlm_tpu.core.config import UNoiseConfig
    from adlm_tpu.models.unet import UNet
    from adlm_tpu.train.unoise import (
        init_utility_state, make_utility_train_step)

    cfg = UNoiseConfig(compute_dtype="bfloat16" if bf16 else "float32")
    nprng = np.random.RandomState(2)
    sample = jnp.asarray(nprng.rand(8, 256, 256, 3).astype(np.float32))
    masks = jnp.asarray((nprng.rand(8, 256, 256, 1) > 0.5
                         ).astype(np.float32))
    state = init_utility_state(cfg, jax.random.PRNGKey(0), sample)
    step = make_utility_train_step(cfg)
    state, loss = step(state, sample, masks)
    np.asarray(loss)  # warm + sync
    n = 4

    def loop():
        nonlocal state
        t0 = time.perf_counter()
        losses = []
        for _ in range(n):
            state, loss = step(state, sample, masks)
            losses.append(loss)
        for lo in losses:
            np.asarray(lo)
        return time.perf_counter() - t0

    return _best_dt(loop) / n * 1000.0


def _bench_push(cfg, model, params, constants, pc, batch=8):
    """Batched prototype push at full 2048×1024 resolution — the
    reference's #3 hot spot is this scan over the train split
    (reference segmentation/push.py:101-280).  Batch 8 keeps every
    device buffer ≤ ~201 MB (images f32 and the (B,129,257,P) distance
    map both scale with batch; ≳400 MB wedges the relay — CLAUDE.md),
    which is also the CLI's recommended ``--push-batch-size``."""
    from adlm_tpu.interpret.push import make_push_batched_fn

    fn = make_push_batched_fn(model, cfg.model.num_classes)
    nprng = np.random.RandomState(3)
    images = jnp.asarray(nprng.rand(batch, H, W, 3).astype(np.float32),
                         jnp.bfloat16)
    labels = jnp.asarray(nprng.randint(0, 20, size=(batch, H, W)),
                         jnp.int32)
    out = fn(params, constants, pc, images, labels)
    np.asarray(out[0])  # warm + sync
    n = 4

    def loop():
        t0 = time.perf_counter()
        outs = [fn(params, constants, pc, images, labels)
                for _ in range(n)]
        for o in outs:
            np.asarray(o[0])
        return time.perf_counter() - t0

    return batch * n / _best_dt(loop)


def _bench_nearest_scan(cfg, model, params, constants, pc, batch=8):
    """Batched k-nearest prune scan at full resolution (`prune
    --batch-size`) — the reference's per-image heap scan over the push
    set is its #4 hot spot (find_nearest.py:66-236)."""
    from adlm_tpu.interpret.nearest import make_nearest_batched_fn

    fn = make_nearest_batched_fn(model, cfg.model.num_classes)
    nprng = np.random.RandomState(9)
    images = jnp.asarray(nprng.rand(batch, H, W, 3).astype(np.float32),
                         jnp.bfloat16)
    labels = jnp.asarray(nprng.randint(0, 20, size=(batch, H, W)),
                         jnp.int32)
    out = fn(params, constants, pc, images, labels)
    np.asarray(out[0])  # warm + sync
    n = 3

    def loop():
        t0 = time.perf_counter()
        outs = [fn(params, constants, pc, images, labels)
                for _ in range(n)]
        for o in outs:
            np.asarray(o[0])
        return time.perf_counter() - t0

    return batch * n / _best_dt(loop)


def _bench_stats_upsampled_eval(cfg, model, params, constants, pc,
                                batch=8):
    """--stats-upsampled eval at full resolution — the slowest eval
    mode (reference eval_valid.py:158-214: statistics on bilinearly
    upsampled distances at label resolution).  The chunked prototype
    scan inside make_inference_fn clamps its (B,H,W,chunk) resize
    buffer to ≤ ~256 MB."""
    from adlm_tpu.interpret.evaluate import make_inference_fn

    fn = make_inference_fn(model, cfg.model.num_classes, with_stats=True,
                           stats_upsampled=True)
    nprng = np.random.RandomState(4)
    images = jnp.asarray(nprng.rand(batch, H, W, 3).astype(np.float32),
                         jnp.bfloat16)
    labels = jnp.asarray(nprng.randint(0, 20, size=(batch, H, W)),
                         jnp.int32)
    u = jnp.asarray(nprng.rand(batch, 100).astype(np.float32))
    v = jnp.asarray(nprng.rand(batch, 100).astype(np.float32))
    out = fn(params, constants, pc, images, labels, u, v)
    np.asarray(out["topk_purity"])  # warm + sync
    n = 3

    def loop():
        t0 = time.perf_counter()
        outs = [fn(params, constants, pc, images, labels, u, v)
                for _ in range(n)]
        for o in outs:
            np.asarray(o["topk_purity"])
            np.asarray(o["intersection"])
        return time.perf_counter() - t0

    return batch * n / _best_dt(loop)


def _bench_windowed_eval(cfg, model, params, constants, pc,
                         window=(512, 512)):
    """Fused windowed eval at batch 1 (the memory-bounded mode): the
    whole 15-window grid of a 2048×1024 image in ONE jit with on-device
    window slicing (interpret/windowed.py::_make_fused_window_program).
    Round 3's per-window driver measured 0.91 img/s — bounded by a
    ~3 MB upload + 2 relay dispatches per window; round 4's fused
    program measured 2.97 — bounded by the per-update counter sync and
    an 8 MB pred fetch per image the whole-image rows never pay.
    defer_sync queues the grid dispatches and drains counters once —
    the SAME pipelined-dispatch + counters-only-sync discipline as
    _bench_inference_b1 (identical counter values; only fetch timing
    moves)."""
    from adlm_tpu.interpret.windowed import WindowedSegEvaluator

    ev = WindowedSegEvaluator(model, cfg.model.num_classes, window,
                              fused=True, defer_sync=True)
    nprng = np.random.RandomState(7)
    images = jnp.asarray(nprng.rand(1, H, W, 3).astype(np.float32),
                         jnp.bfloat16)
    labels = jnp.asarray(nprng.randint(0, 20, size=(1, H, W)), jnp.int32)
    ev.update(params, constants, pc, images, labels)
    ev.drain()  # warm + sync
    n = 6

    def loop():
        t0 = time.perf_counter()
        for _ in range(n):
            ev.update(params, constants, pc, images, labels)
        ev.drain()
        return time.perf_counter() - t0

    return n / _best_dt(loop)


def _bench_inference_b1(cfg, model, params, constants, pc):
    """Single-image (batch 1) full-res inference throughput — the
    serving-latency-bound shape.  Pipelined steady state; the ~30 ms
    fixed relay dispatch latency (an environment artifact, CLAUDE.md)
    is hidden by pipelining, as a production serving loop would."""
    from adlm_tpu.interpret.evaluate import make_inference_fn

    fn = make_inference_fn(model, cfg.model.num_classes, with_stats=False)
    nprng = np.random.RandomState(5)
    images = jnp.asarray(nprng.rand(1, H, W, 3).astype(np.float32),
                         jnp.bfloat16)
    labels = jnp.asarray(nprng.randint(0, 20, size=(1, H, W)), jnp.int32)
    for _ in range(2):
        np.asarray(fn(params, constants, pc, images, labels)
                   ["intersection"])
    n = 12

    def loop():
        t0 = time.perf_counter()
        outs = [fn(params, constants, pc, images, labels)
                for _ in range(n)]
        for o in outs:
            np.asarray(o["intersection"])
        return time.perf_counter() - t0

    return n / _best_dt(loop)


def _bench_cls_train(batch=80, bf16=False):
    """Classification ProtoPNet joint step at the reference's CUB-200
    budget (reference settings.py: train_batch_size 80, img 224, vgg19,
    2000 prototypes × 128 channels, 200 classes; main.py epoch loop).
    ``bf16`` = `cls-train --bf16` (f32 is the reference's dtype)."""
    from adlm_tpu.models.ppnet import PPNet, default_proto_class
    from adlm_tpu.train.classification import (
        ClassificationConfig, init_classifier_state, make_cls_train_step)

    cfg = ClassificationConfig(
        compute_dtype="bfloat16" if bf16 else "float32")
    model = PPNet(cfg=cfg.model)
    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(rng, init_x, train=True))
    nprng = np.random.RandomState(6)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            nprng.uniform(0.01, 0.1, size=s.shape).astype(s.dtype)),
        shapes)
    state = init_classifier_state(
        model, cfg, "joint", rng, init_x, steps_per_epoch=75,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}))
    step = make_cls_train_step(model, cfg, "joint", steps_per_epoch=75)
    images = jnp.asarray(nprng.rand(batch, 224, 224, 3).astype(np.float32))
    labels = jnp.asarray(nprng.randint(0, 200, size=(batch,)))
    state, m = step(state, images, labels)
    np.asarray(m["loss"])  # warm + sync
    n = 4

    def loop():
        nonlocal state
        t0 = time.perf_counter()
        outs = []
        for _ in range(n):
            state, m = step(state, images, labels)
            outs.append(m)
        for m in outs:
            np.asarray(m["loss"])
        return time.perf_counter() - t0

    return _best_dt(loop) / n * 1000.0


def _run() -> None:
    from adlm_tpu.core.config import get_experiment
    from adlm_tpu.models.ppnet import PPNet, default_proto_class

    cfg = get_experiment("cityscapes_kld_imnet")
    model = PPNet(cfg=cfg.model)
    variables = _host_random_variables(model)
    params = variables["params"]
    constants = variables.get("constants", {})
    pc = default_proto_class(cfg.model.num_prototypes,
                             cfg.model.num_classes)

    # bf16 weights/activations for the MXU; the prototype head
    # accumulates in f32 internally
    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)

    ips_per_chip = _bench_inference(cfg, model, params_bf16, constants, pc)
    # the inference fn is unsharded — it runs on ONE chip regardless of
    # how many are visible, so the measurement is already per-chip

    extra = {}
    try:
        extra["joint_train_window_ms"] = round(
            _bench_joint_train(cfg, model, variables), 1)
        extra["joint_train_images_per_window"] = (
            cfg.train.iter_size * cfg.train.joint_batch_size)
    except Exception as e:  # pragma: no cover
        print(f"# joint-train extra metric skipped: {e}", flush=True)
    try:
        extra["joint_train_window_fused_ms"] = round(
            _bench_joint_train(cfg, model, variables, fused=True), 1)
    except Exception as e:  # pragma: no cover
        print(f"# fused joint-train extra metric skipped: {e}",
              flush=True)
    try:
        # training ceiling at free geometry: ONE batch-16 513² fwd/bwd
        # per optimizer step (not the reference's batch-2 × iter_size-5
        # contract — see PERF.md "shape-bound, not backward-bound")
        ms = _bench_joint_train(cfg, model, variables, free_batch=16)
        extra["joint_train_free_b16_ms"] = round(ms, 1)
        extra["joint_train_free_b16_ips"] = round(16.0 / (ms / 1000.0), 1)
    except Exception as e:  # pragma: no cover
        print(f"# free-geometry joint-train extra metric skipped: {e}",
              flush=True)
    try:
        extra["unoise_util_step_ms"] = round(_bench_unoise_train(), 1)
        extra["unoise_util_step_bf16_ms"] = round(
            _bench_unoise_train(bf16=True), 1)
    except Exception as e:  # pragma: no cover
        print(f"# unoise extra metric skipped: {e}", flush=True)
    try:
        extra["push_2048x1024_ips"] = round(_bench_push(
            cfg, model, params_bf16, constants, pc), 2)
        extra["push_batch"] = 8
        # batch 16 = the eval-optimum batch; the bf16 distance map is
        # ~200 MB, under the relay's ~300 MB wedge line (CLAUDE.md)
        extra["push_b16_ips"] = round(_bench_push(
            cfg, model, params_bf16, constants, pc, batch=16), 2)
    except Exception as e:  # pragma: no cover
        print(f"# push extra metric skipped: {e}", flush=True)
    try:
        extra["stats_upsampled_eval_ips"] = round(
            _bench_stats_upsampled_eval(
                cfg, model, params_bf16, constants, pc), 2)
        extra["stats_upsampled_batch"] = 8
        extra["stats_upsampled_b16_ips"] = round(
            _bench_stats_upsampled_eval(
                cfg, model, params_bf16, constants, pc, batch=16), 2)
    except Exception as e:  # pragma: no cover
        print(f"# stats-upsampled extra metric skipped: {e}", flush=True)
    try:
        extra["nearest_scan_ips"] = round(_bench_nearest_scan(
            cfg, model, params_bf16, constants, pc), 2)
        extra["nearest_scan_batch"] = 8
        extra["nearest_scan_b16_ips"] = round(_bench_nearest_scan(
            cfg, model, params_bf16, constants, pc, batch=16), 2)
    except Exception as e:  # pragma: no cover
        print(f"# nearest-scan extra metric skipped: {e}", flush=True)
    try:
        extra["windowed_eval_fused_ips"] = round(_bench_windowed_eval(
            cfg, model, params_bf16, constants, pc), 2)
    except Exception as e:  # pragma: no cover
        print(f"# windowed-eval extra metric skipped: {e}", flush=True)
    try:
        extra["inference_b1_ips"] = round(_bench_inference_b1(
            cfg, model, params_bf16, constants, pc), 2)
    except Exception as e:  # pragma: no cover
        print(f"# batch-1 inference extra metric skipped: {e}", flush=True)
    try:
        extra["cls_train_step_ms"] = round(_bench_cls_train(), 1)
        extra["cls_train_batch"] = 80
        extra["cls_train_step_bf16_ms"] = round(
            _bench_cls_train(bf16=True), 1)
    except Exception as e:  # pragma: no cover
        print(f"# cls-train extra metric skipped: {e}", flush=True)
    extra["flops_per_image_tflop"] = 3.17  # measured, see docstring
    extra["batch"] = BATCH

    print(json.dumps({
        "metric": "cityscapes_2048x1024_inference",
        "value": round(ips_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_per_chip / REFERENCE_IPS, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
