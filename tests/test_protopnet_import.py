"""import-protopnet: full reference CLASSIFICATION ProtoPNet → run dir.

Builds a torch module with the reference's exact classification
state_dict surface — its OWN feature stem module (resnet18, imported
from /root/reference), the 'regular' add-on stack, prototype vectors,
``ones`` and the bias-free last layer (reference model.py:54-143,
saved whole-module by save.py:11) — imports it through the CLI, and
checks the run is consumable by the classification eval step.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from test_stem_import_golden import _ref_stem  # noqa: E402

P, C, K = 10, 32, 5  # prototypes, proto channels, classes


class TorchProtoPNetCls(nn.Module):
    def __init__(self):
        super().__init__()
        self.features = _ref_stem("resnet18")
        self.add_on_layers = nn.Sequential(
            nn.Conv2d(512, C, kernel_size=1), nn.ReLU(),
            nn.Conv2d(C, C, kernel_size=1), nn.Sigmoid())
        self.prototype_vectors = nn.Parameter(torch.rand(P, C, 1, 1))
        self.ones = nn.Parameter(torch.ones(P, C, 1, 1),
                                 requires_grad=False)
        self.last_layer = nn.Linear(P, K, bias=False)
        self.prototype_class_identity = torch.zeros(P, K)
        for i in range(K):
            self.prototype_class_identity[2 * i:2 * i + 2, i] = 1


def test_import_protopnet_roundtrip_and_eval(tmp_path, monkeypatch):
    from adlm_tpu.cli import cmd_import_protopnet
    from adlm_tpu.core.checkpoint import CheckpointStore
    from adlm_tpu.models.ppnet import PPNet
    from adlm_tpu.train.classification import (ClassifierState,
                                               make_cls_eval_step)
    from adlm_tpu.train.classification_pipeline import load_cls_config

    torch.manual_seed(4)
    t_model = TorchProtoPNetCls()
    ckpt = str(tmp_path / "cls_ppnet.pth")
    torch.save(t_model, ckpt)
    monkeypatch.setenv("RESULTS_DIR", str(tmp_path / "runs"))
    cmd_import_protopnet(argparse.Namespace(
        run_name="cls_imported", checkpoint=ckpt, arch="resnet18",
        img_size=64, add_on="regular", stage="push", proto_class=None))

    run_dir = str(tmp_path / "runs" / "cls_imported")
    store = CheckpointStore(run_dir)
    payload = store.restore("push", "best")
    sd = t_model.state_dict()

    np.testing.assert_array_equal(
        np.asarray(payload["proto_class"]), np.repeat(np.arange(K), 2))
    np.testing.assert_allclose(
        np.asarray(payload["params"]["prototype_vectors"]),
        sd["prototype_vectors"].numpy()[:, :, 0, 0])
    np.testing.assert_allclose(
        np.asarray(payload["params"]["last_layer"]),
        sd["last_layer.weight"].numpy().T)
    np.testing.assert_allclose(
        np.asarray(payload["params"]["add_on"]["conv1"]["kernel"]),
        np.transpose(sd["add_on_layers.2.weight"].numpy(), (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(payload["params"]["features"]["conv1"]["kernel"]),
        np.transpose(sd["features.conv1.weight"].numpy(), (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(payload["batch_stats"]["features"]["bn1"]["var"]),
        sd["features.bn1.running_var"].numpy())
    for tree in (payload["params"], payload["batch_stats"]):
        assert not any(np.isnan(np.asarray(leaf)).any()
                       for leaf in jax.tree.leaves(tree))

    # the imported run drives the classification eval step
    cfg = load_cls_config(run_dir)
    assert cfg.model.num_prototypes == P
    assert cfg.model.num_classes == K
    model = PPNet(cfg=cfg.model)
    state = ClassifierState(
        params=jax.tree.map(jnp.asarray, payload["params"]),
        batch_stats=jax.tree.map(jnp.asarray, payload["batch_stats"]),
        proto_class=jnp.asarray(payload["proto_class"]),
        opt_state=None, step=jnp.asarray(0))
    ev = make_cls_eval_step(model, cfg)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    labels = jnp.asarray([0, 1])
    metrics = ev(state, x, labels)
    assert np.asarray(metrics["correct"]).shape == (2,)
    assert np.isfinite(float(metrics["cross_entropy"]))


def test_import_protopnet_rejects_bad_identity_and_corrupt_var(
        tmp_path, monkeypatch):
    """Review findings: --proto-class shape mismatches and negative BN
    running_var are hard errors (parity with import-protoseg)."""
    from adlm_tpu.cli import cmd_import_protopnet

    torch.manual_seed(8)
    t_model = TorchProtoPNetCls()
    sd = t_model.state_dict()
    monkeypatch.setenv("RESULTS_DIR", str(tmp_path / "runs"))

    bad_pc = str(tmp_path / "bad_pc.npy")
    np.save(bad_pc, np.zeros(P - 1, np.int32))
    ckpt = str(tmp_path / "cls.pth")
    torch.save(sd, ckpt)
    with pytest.raises(SystemExit, match="proto_class shape"):
        cmd_import_protopnet(argparse.Namespace(
            run_name="bad_pc", checkpoint=ckpt, arch="resnet18",
            img_size=64, add_on="regular", stage="push",
            proto_class=bad_pc))

    sd["features.bn1.running_var"][3] = -1.0
    ckpt2 = str(tmp_path / "cls_corrupt.pth")
    torch.save(sd, ckpt2)
    with pytest.raises(SystemExit, match="running_var"):
        cmd_import_protopnet(argparse.Namespace(
            run_name="corrupt", checkpoint=ckpt2, arch="resnet18",
            img_size=64, add_on="regular", stage="push",
            proto_class=None))
