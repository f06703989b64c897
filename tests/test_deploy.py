"""AOT inference export (adlm_tpu/deploy) tests.

The reference has no deployment path (its eval scripts rebuild the
torch model and reload the checkpoint on every run, reference
segmentation/eval_valid.py:64-101); the exported StableHLO artifact is
the framework's serving story, so these tests pin the contract: the
deserialized program — weights baked in, no model code — must
reproduce the live model exactly, including the uint8 on-device
normalization path and cross-platform (cpu+tpu) lowering.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core.config import PPNetConfig
from adlm_tpu.deploy.export import (
    export_inference_artifact,
    load_inference_artifact,
)
from adlm_tpu.models.ppnet import PPNet, default_proto_class
from adlm_tpu.ops.resize import resize_bilinear


def _tiny_model(seed=0):
    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=33)
    model = PPNet(cfg=cfg)
    v = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 33, 33, 3)))
    return model, v["params"], v.get("constants", {})


def test_export_roundtrip_matches_live_model(tmp_path):
    model, params, constants = _tiny_model()
    pc = default_proto_class(6, 3)
    out = str(tmp_path / "artifact")
    manifest = export_inference_artifact(
        model, params, constants, pc, out, batch=2, size=(40, 48),
        normalize=None, platforms=("cpu",),
        compute_dtype=jnp.float32, class_names=["a", "b", "c"])
    assert os.path.exists(os.path.join(out, "inference_cpu.stablehlo"))
    assert manifest["input"] == {"shape": [2, 40, 48, 3],
                                 "dtype": "float32"}
    assert manifest["proto_class"] == np.asarray(pc).tolist()

    call, m2 = load_inference_artifact(out)
    assert m2 == json.loads(json.dumps(manifest))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 40, 48, 3).astype(np.float32))
    got = call(images)

    # the live comparison runs eager (unjitted) — op-fusion
    # reassociation puts the two paths ~1e-4 apart in f32, so the
    # contract is near-total argmax agreement + close logits, not bit
    # equality (two different XLA programs)
    logits, dist = model.apply({"params": params, "constants": constants},
                               images, train=False, return_distances=True)
    want_pred = np.argmax(np.asarray(resize_bilinear(logits, (40, 48))),
                          axis=-1)
    assert np.mean(np.asarray(got["pred"]) == want_pred) > 0.995
    assert np.mean(np.asarray(got["nearest_proto"])
                   == np.argmin(np.asarray(dist), axis=-1)) > 0.995
    np.testing.assert_allclose(np.asarray(got["grid_logits"]),
                               np.asarray(logits), rtol=5e-3, atol=1e-5)


def test_export_uint8_normalize_path(tmp_path):
    """normalize=(mean, std): the artifact takes RAW uint8 and matches
    the live model fed host-normalized f32 (same op sequence)."""
    model, params, constants = _tiny_model(seed=3)
    pc = default_proto_class(6, 3)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    out = str(tmp_path / "artifact")
    manifest = export_inference_artifact(
        model, params, constants, pc, out, batch=1, size=(40, 48),
        normalize=(mean, std), platforms=("cpu",),
        compute_dtype=jnp.float32)
    assert manifest["input"]["dtype"] == "uint8"

    call, _ = load_inference_artifact(out)
    rng = np.random.RandomState(3)
    raw = rng.randint(0, 256, size=(1, 40, 48, 3)).astype(np.uint8)
    got = call(jnp.asarray(raw))

    f32 = ((raw.astype(np.float32) / 255.0)
           - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    logits, _ = model.apply({"params": params, "constants": constants},
                            jnp.asarray(f32), train=False,
                            return_distances=True)
    want_pred = np.argmax(np.asarray(resize_bilinear(logits, (40, 48))),
                          axis=-1)
    assert np.mean(np.asarray(got["pred"]) == want_pred) > 0.995


def test_export_cross_platform_lowering(tmp_path):
    """platforms=("cpu", "tpu"): one artifact per platform — the tpu
    lowering happens WITHOUT tpu hardware present (jax.export
    cross-platform lowering, Pallas head included) and the cpu
    artifact stays callable here."""
    model, params, constants = _tiny_model(seed=5)
    pc = default_proto_class(6, 3)
    out = str(tmp_path / "artifact")
    manifest = export_inference_artifact(
        model, params, constants, pc, out, batch=1, size=(33, 33),
        normalize=((0.5, 0.5, 0.5), (0.25, 0.25, 0.25)),
        platforms=("cpu", "tpu"), compute_dtype=jnp.bfloat16)
    assert manifest["platforms"] == ["cpu", "tpu"]
    call, _ = load_inference_artifact(out)
    got = call(jnp.asarray(np.random.RandomState(5).randint(
        0, 256, size=(1, 33, 33, 3)).astype(np.uint8)))
    assert np.asarray(got["pred"]).shape == (1, 33, 33)


def test_export_cli(tmp_path):
    """CLI `export <run> <stage>` reads a checkpoint store and writes
    the artifact directory with the run's class table baked into the
    manifest."""
    from adlm_tpu.cli import main as cli_main
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.core.config import get_experiment

    model, params, constants = _tiny_model(seed=7)
    pc = default_proto_class(6, 3)
    run_dir = str(tmp_path / "run")
    store = CheckpointStore(run_dir)
    import dataclasses
    cfg = get_experiment("smoke")
    cfg = dataclasses.replace(cfg, model=model.cfg)
    store.save_config(cfg.to_json())
    store.save("push", "last", {"params": dict(params),
                                "constants": dict(constants),
                                "proto_class": np.asarray(pc),
                                "step": 0})

    cli_main(["export", run_dir, "push", "--size", "40,48",
              "--platforms", "cpu", "--f32-compute"])
    out = os.path.join(run_dir, "export", "push_1x40x48")
    call, manifest = load_inference_artifact(out)
    assert manifest["class_names"] is not None
    assert manifest["input"]["shape"] == [1, 40, 48, 3]
    got = call(jnp.asarray(np.random.RandomState(7).randint(
        0, 256, size=(1, 40, 48, 3)).astype(np.uint8)))
    assert np.asarray(got["pred"]).shape == (1, 40, 48)


def test_unoise_export_roundtrip(tmp_path):
    """U-Noise artifacts: utility mask server + noise importance map,
    raw-slice inputs with the tile/normalize baked in."""
    from adlm_tpu.core.config import UNoiseConfig
    from adlm_tpu.deploy.export import export_unoise_artifact
    from adlm_tpu.models.unet import UNet
    from adlm_tpu.train.unoise import _prep_images

    cfg = UNoiseConfig(depth=2, channel_factor=3, util_depth=2,
                       util_channel_factor=3)
    model = UNet(out_channels=1, depth=2, cf=3)
    v = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 3)),
                   train=True)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))

    out_u = str(tmp_path / "util")
    manifest = export_unoise_artifact(
        cfg, v["params"], v["batch_stats"], "utility", out_u, batch=2,
        size=(16, 16), platforms=("cpu",), compute_dtype=jnp.float32)
    assert manifest["outputs"] == ["mask_prob", "mask"]
    call, m2 = load_inference_artifact(out_u, platform="cpu")
    got = call(x)
    want_logits = model.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]},
        _prep_images(x, True, False), train=False)
    np.testing.assert_allclose(
        np.asarray(got["mask_prob"]),
        np.asarray(jax.nn.sigmoid(want_logits)), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(got["mask"]), np.asarray(want_logits > 0))

    out_n = str(tmp_path / "noise")
    manifest = export_unoise_artifact(
        cfg, v["params"], v["batch_stats"], "noise", out_n, batch=2,
        size=(16, 16), platforms=("cpu",), compute_dtype=jnp.float32)
    assert manifest["outputs"] == ["importance"]
    call, _ = load_inference_artifact(out_n, platform="cpu")
    got = call(x)
    np.testing.assert_allclose(
        np.asarray(got["importance"]),
        np.asarray(jax.nn.sigmoid(want_logits)), rtol=1e-5, atol=1e-6)


def test_unoise_export_cli(tmp_path, monkeypatch):
    """unoise-export consumes a real utility run directory."""
    import argparse

    from adlm_tpu.cli import cmd_unoise_export
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.models.unet import UNet

    run_dir = str(tmp_path / "run")
    store = CheckpointStore(run_dir)
    model = UNet(out_channels=1, depth=2, cf=3)
    v = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 16, 16, 3)),
                   train=True)
    store.save("utility", "best", {"params": dict(v["params"]),
                                   "batch_stats": dict(v["batch_stats"]),
                                   "step": 0})
    store.save_metadata("utility_config",
                        {"depth": 2, "channel_factor": 3})
    cmd_unoise_export(argparse.Namespace(
        run_dir=run_dir, model="utility", kind="best", batch=2,
        size="16,16", platforms="cpu", depth=5, channel_factor=6,
        f32_compute=True, out=None))
    out = os.path.join(run_dir, "export", "utility_2x16x16")
    assert os.path.exists(os.path.join(out, "inference_cpu.stablehlo"))
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["unet"] == {"depth": 2, "channel_factor": 3}


def test_cls_export_roundtrip(tmp_path):
    """Classifier artifact: logits/pred plus the reference's
    prototype_activations interpretability vector (local_analysis.py)."""
    from adlm_tpu.deploy.export import export_cls_artifact
    from adlm_tpu.ops.prototype import distance_to_similarity

    cfg = PPNetConfig(base_architecture="resnet18", img_size=32,
                      num_prototypes=6, prototype_channels=8,
                      num_classes=3, add_on_layers_type="regular",
                      patch_classification=False)
    model = PPNet(cfg=cfg)
    v = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)))
    pc = default_proto_class(6, 3)

    out = str(tmp_path / "cls")
    manifest = export_cls_artifact(
        model, v["params"], v.get("batch_stats", {}), pc, out, batch=2,
        size=(32, 32), normalize=None, platforms=("cpu",),
        compute_dtype=jnp.float32, class_names=["a", "b", "c"])
    assert manifest["outputs"] == ["logits", "pred", "proto_activation",
                                   "min_distances"]
    call, _ = load_inference_artifact(out, platform="cpu")
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    got = call(x)

    logits, min_d = model.apply(
        {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
        x, train=False)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(logits), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["min_distances"]),
                               np.asarray(min_d), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["proto_activation"]),
        np.asarray(distance_to_similarity(min_d, cfg.prototype_activation,
                                          cfg.epsilon)),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["pred"]),
                                  np.argmax(np.asarray(logits), -1))


def test_cls_export_cli(tmp_path):
    """cls-export consumes a real classification run directory
    (cls_config.json + orbax checkpoint) and bakes in the uint8
    ImageNet-normalization serving path."""
    import argparse

    from adlm_tpu.cli import cmd_cls_export
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.train.classification import ClassificationConfig
    from adlm_tpu.train.classification_pipeline import _save_cls_config

    cfg = ClassificationConfig(model=PPNetConfig(
        base_architecture="resnet18", img_size=32, num_prototypes=6,
        prototype_channels=8, num_classes=3,
        add_on_layers_type="regular", patch_classification=False))
    model = PPNet(cfg=cfg.model)
    v = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 32, 32, 3)))
    run_dir = str(tmp_path / "run")
    _save_cls_config(run_dir, cfg)
    store = CheckpointStore(run_dir)
    store.save("push", "best", {
        "params": dict(v["params"]),
        "batch_stats": dict(v.get("batch_stats", {})),
        "proto_class": np.asarray(default_proto_class(6, 3)),
        "step": 0})

    cmd_cls_export(argparse.Namespace(
        run_dir=run_dir, stage="push", kind="best", batch=2,
        platforms="cpu", f32_inputs=False, f32_compute=True, out=None))
    out = os.path.join(run_dir, "export", "push_2x32x32")
    call, m = load_inference_artifact(out, platform="cpu")
    assert m["input"]["dtype"] == "uint8"
    rng = np.random.RandomState(10)
    raw = rng.randint(0, 255, size=(2, 32, 32, 3)).astype(np.uint8)
    got = call(jnp.asarray(raw))

    mean = np.asarray(m["normalize"][0], np.float32)
    std = np.asarray(m["normalize"][1], np.float32)
    x = jnp.asarray((raw.astype(np.float32) / 255.0 - mean) / std)
    logits, _ = model.apply(
        {"params": v["params"], "batch_stats": v.get("batch_stats", {})},
        x, train=False)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(logits), rtol=1e-4, atol=1e-5)


def test_export_bf16_actually_lowers_bf16():
    """Guards the image cast: without it an f32 image against bf16
    kernels silently promotes every conv back to f32 (the artifact
    would be slower AND less accurate than a pure-f32 export)."""
    import tempfile

    from jax import export as jexport
    from adlm_tpu.deploy.export import export_cls_artifact

    cfg = PPNetConfig(base_architecture="resnet18", img_size=32,
                      num_prototypes=6, prototype_channels=8,
                      num_classes=3, add_on_layers_type="regular",
                      patch_classification=False)
    model = PPNet(cfg=cfg)
    v = model.init(jax.random.PRNGKey(11), jnp.zeros((1, 32, 32, 3)))
    pc = default_proto_class(6, 3)
    with tempfile.TemporaryDirectory() as out:
        export_cls_artifact(
            model, v["params"], v.get("batch_stats", {}), pc, out,
            batch=1, size=(32, 32), normalize=((0.5,) * 3, (0.25,) * 3),
            platforms=("cpu",), compute_dtype=jnp.bfloat16)
        with open(os.path.join(out, "inference_cpu.stablehlo"),
                  "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        mlir = exp.mlir_module()
        assert "bf16" in mlir
        # the convolutions themselves run bf16, not just the cast
        conv_lines = [l for l in mlir.splitlines()
                      if "stablehlo.convolution" in l]
        assert conv_lines and all("bf16" in l for l in conv_lines)
        # and it still executes end-to-end with sane outputs
        out_v = exp.call(jnp.zeros((1, 32, 32, 3), jnp.uint8))
        assert np.isfinite(np.asarray(out_v["logits"])).all()
