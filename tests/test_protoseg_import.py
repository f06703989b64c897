"""import-protoseg: full reference PPNet checkpoint → usable run dir.

The reference persists trained ProtoSeg models as whole-module pickles
(``torch.save(ppnet)``, reference segmentation/train.py:60-65).  Here a
torch module with the reference's exact state_dict surface (deeplab-
named backbone under ``features.base``, ``deeplab_simple`` add-on,
``prototype_vectors``/``ones``/bias-free ``last_layer``, reference
model.py:54-143) is pickled, imported through the CLI, and the
resulting run dir is driven through eval-valid.
"""

import argparse
import json
import os

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from test_backbone_golden import TorchDeepLabV2, _randomize  # noqa: E402
from test_pipeline import _write_fake_dataset  # noqa: E402


class TorchPPNetSeg(nn.Module):
    """State-dict-compatible stand-in for the reference segmentation
    PPNet (smoke geometry: 6 prototypes × 8 channels, 3 classes)."""

    def __init__(self):
        super().__init__()
        self.features = nn.Module()
        self.features.base = TorchDeepLabV2(8, (1, 1, 1, 1),
                                            (6, 12, 18, 24))
        self.add_on_layers = nn.Sequential(nn.Sigmoid())
        self.prototype_vectors = nn.Parameter(torch.rand(6, 8, 1, 1))
        self.ones = nn.Parameter(torch.ones(6, 8, 1, 1),
                                 requires_grad=False)
        self.last_layer = nn.Linear(6, 3, bias=False)
        self.prototype_class_identity = torch.zeros(6, 3)
        for i in range(3):
            self.prototype_class_identity[2 * i:2 * i + 2, i] = 1


def _import_run(tmp_path, monkeypatch, ckpt_name="ref_ppnet.pth",
                save_module=True, proto_class_file=None):
    from adlm_tpu.cli import cmd_import_protoseg

    torch.manual_seed(0)
    t_model = TorchPPNetSeg()
    _randomize(t_model.features.base, 1)
    ckpt = str(tmp_path / ckpt_name)
    torch.save(t_model if save_module else t_model.state_dict(), ckpt)
    monkeypatch.setenv("RESULTS_DIR", str(tmp_path / "runs"))
    cmd_import_protoseg(argparse.Namespace(
        experiment="smoke", run_name="imported", checkpoint=ckpt,
        stage="push", proto_class=proto_class_file))
    return t_model, str(tmp_path / "runs" / "imported")


def test_import_protoseg_roundtrip(tmp_path, monkeypatch):
    from adlm_tpu.core.checkpoint import CheckpointStore

    t_model, run_dir = _import_run(tmp_path, monkeypatch)
    store = CheckpointStore(run_dir)
    payload = store.restore("push", "best")

    np.testing.assert_array_equal(
        np.asarray(payload["proto_class"]), [0, 0, 1, 1, 2, 2])
    np.testing.assert_allclose(
        np.asarray(payload["params"]["prototype_vectors"]),
        t_model.prototype_vectors.detach().numpy()[:, :, 0, 0])
    np.testing.assert_allclose(
        np.asarray(payload["params"]["last_layer"]),
        t_model.last_layer.weight.detach().numpy().T)
    # spot-check a backbone conv (OIHW→HWIO) and a BN running var
    sd = t_model.state_dict()
    np.testing.assert_allclose(
        np.asarray(payload["params"]["features"]["base"]["layer1"]
                   ["conv1"]["conv"]["kernel"]),
        np.transpose(sd["features.base.layer1.conv1.conv.weight"]
                     .numpy(), (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(payload["constants"]["features"]["base"]["layer1"]
                   ["conv1"]["bn"]["var"]),
        sd["features.base.layer1.conv1.bn.running_var"].numpy())
    # nothing NaN anywhere (the command's coverage check, re-asserted)
    for tree in (payload["params"], payload["constants"]):
        assert not any(np.isnan(np.asarray(leaf)).any()
                       for leaf in jax.tree.leaves(tree))


def test_import_protoseg_state_dict_and_eval(tmp_path, monkeypatch):
    """A plain state_dict (no module pickle) imports with the default
    contiguous identity, and eval-valid runs end-to-end on the run."""
    from adlm_tpu.cli import main as cli_main

    _, run_dir = _import_run(tmp_path, monkeypatch, save_module=False)
    data_root = str(tmp_path / "data")
    _write_fake_dataset(data_root)
    cli_main(["eval-valid", run_dir, "push", "--split", "val",
              "--data-path", data_root, "--max-images", "2"])
    out = os.path.join(run_dir, "evaluation", "push")
    assert os.path.exists(os.path.join(out, "mean_iou.txt"))
    assert np.isfinite(float(open(
        os.path.join(out, "mean_iou.txt")).read()))
    scores = json.load(open(os.path.join(out, "iou_scores.json")))
    assert scores


def test_import_protoseg_pruned_needs_identity(tmp_path, monkeypatch):
    """A pruned checkpoint (P not divisible by classes) without an
    identity must fail loudly; with --proto-class it imports ragged."""
    from adlm_tpu.cli import cmd_import_protoseg
    from adlm_tpu.core.checkpoint import CheckpointStore

    torch.manual_seed(2)
    t_model = TorchPPNetSeg()
    _randomize(t_model.features.base, 3)
    # prune one prototype -> 5 left, ragged identity
    sd = t_model.state_dict()
    sd["prototype_vectors"] = sd["prototype_vectors"][:5]
    sd["ones"] = sd["ones"][:5]
    sd["last_layer.weight"] = sd["last_layer.weight"][:, :5]
    ckpt = str(tmp_path / "pruned.pth")
    torch.save(sd, ckpt)
    monkeypatch.setenv("RESULTS_DIR", str(tmp_path / "runs"))

    with pytest.raises(SystemExit, match="proto-class"):
        cmd_import_protoseg(argparse.Namespace(
            experiment="smoke", run_name="pruned_fail", checkpoint=ckpt,
            stage="pruned", proto_class=None))

    pc = np.asarray([0, 0, 1, 2, 2], np.int32)
    pc_file = str(tmp_path / "pc.npy")
    np.save(pc_file, pc)
    cmd_import_protoseg(argparse.Namespace(
        experiment="smoke", run_name="pruned_ok", checkpoint=ckpt,
        stage="pruned", proto_class=pc_file))
    payload = CheckpointStore(
        str(tmp_path / "runs" / "pruned_ok")).restore("pruned", "best")
    np.testing.assert_array_equal(np.asarray(payload["proto_class"]), pc)
    assert np.asarray(payload["params"]["prototype_vectors"]).shape \
        == (5, 8)


def test_export_torch_roundtrip(tmp_path, monkeypatch):
    """export-torch is the exact inverse of import-protoseg: a run
    exported to a reference-named state_dict re-imports bit-equal."""
    from adlm_tpu.cli import cmd_export_torch, cmd_import_protoseg
    from adlm_tpu.core.checkpoint import CheckpointStore

    t_model, run_dir = _import_run(tmp_path, monkeypatch)
    original = CheckpointStore(run_dir).restore("push", "best")

    cmd_export_torch(argparse.Namespace(
        run_dir=run_dir, stage="push", kind="best", out=None))
    out = os.path.join(run_dir, "export_torch", "push_best.pth")
    assert os.path.exists(out)
    pc = np.load(os.path.splitext(out)[0] + "_proto_class.npy")
    np.testing.assert_array_equal(pc, [0, 0, 1, 1, 2, 2])

    # the exported dict has the reference's exact key set
    sd = {k: v.numpy() for k, v in torch.load(
        out, map_location="cpu", weights_only=True).items()}
    want_keys = {k for k in t_model.state_dict()
                 if not k.endswith("num_batches_tracked")}
    assert set(sd) == want_keys

    # re-import → bit-equal to the original run
    monkeypatch.setenv("RESULTS_DIR", str(tmp_path / "runs2"))
    cmd_import_protoseg(argparse.Namespace(
        experiment="smoke", run_name="roundtrip", checkpoint=out,
        stage="push", proto_class=None))
    again = CheckpointStore(
        str(tmp_path / "runs2" / "roundtrip")).restore("push", "best")
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        original["params"], again["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        original["constants"], again["constants"])


def test_export_torch_bare_out_filename(tmp_path, monkeypatch):
    """--out without a directory component must not crash on
    os.makedirs('') (review finding)."""
    from adlm_tpu.cli import cmd_export_torch

    _, run_dir = _import_run(tmp_path, monkeypatch)
    monkeypatch.chdir(tmp_path)
    cmd_export_torch(argparse.Namespace(
        run_dir=run_dir, stage="push", kind="best", out="bare.pth"))
    assert os.path.exists(tmp_path / "bare.pth")
    assert os.path.exists(tmp_path / "bare_proto_class.npy")
