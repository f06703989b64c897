"""TensorBoard event-file writer (reference train.py:97-131 wires a
TensorBoard logger for every run)."""

import glob
import os

from adlm_tpu.utils.logging import RunLogger
from adlm_tpu.utils.tensorboard import (
    TBEventWriter,
    _crc32c,
    _masked_crc,
    read_scalars,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vector
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    # masked crc as used by TFRecord
    assert _masked_crc(b"123456789") == (
        (((0xE3069283 >> 15) | (0xE3069283 << 17)) + 0xA282EAD8)
        & 0xFFFFFFFF)


def test_writer_roundtrip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(1, {"train/loss": 0.5, "train/lr": 1e-3})
    w.add_scalars(2, {"train/loss": 0.25})
    w.add_scalar(3, "val/accuracy", 0.9)
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    # read_scalars validates every record's masked CRCs — this is the
    # TB-compatibility check (TB rejects records with bad CRCs)
    scalars = read_scalars(files[0])
    assert [s for s, _ in scalars["train/loss"]] == [1, 2]
    assert abs(scalars["train/loss"][1][1] - 0.25) < 1e-6
    assert scalars["val/accuracy"] == [(3, 0.8999999761581421)]


def test_run_logger_writes_tb_events(tmp_path):
    lg = RunLogger(str(tmp_path))
    lg.metrics(0, "warmup", "train", {"loss": 1.0, "accuracy": 0.1})
    lg.metrics(5, "warmup", "val", {"loss": 0.8})
    files = glob.glob(str(tmp_path / "logs" / "tb" /
                          "events.out.tfevents.*"))
    assert len(files) == 1
    scalars = read_scalars(files[0])
    assert scalars["train/warmup/loss"] == [(0, 1.0)]
    assert scalars["val/warmup/loss"] == [(5, 0.8000000119209290)]
    # CSV still written alongside
    assert os.path.exists(tmp_path / "logs" / "train_metrics.csv")


def test_neptune_optin_wiring(tmp_path, monkeypatch):
    """USE_NEPTUNE gates a neptune run exactly like the reference
    (train.py:111-131); verified against a stub module."""
    import sys
    import types

    records = {}

    class _Series:
        def __init__(self, key):
            self.key = key

        def append(self, value, step=None):
            records.setdefault(self.key, []).append((step, value))

    class _Run(dict):
        def __getitem__(self, key):
            return _Series(key)

        def __setitem__(self, key, value):
            records[key] = value

        def stop(self):
            records["stopped"] = True

    stub = types.ModuleType("neptune")
    stub.init_run = lambda project=None, name=None: _Run()
    monkeypatch.setitem(sys.modules, "neptune", stub)
    monkeypatch.setenv("USE_NEPTUNE", "1")
    monkeypatch.setenv("NEPTUNE_PROJECT", "org/proj")

    lg = RunLogger(str(tmp_path))
    lg.log_hyperparams({"lr": 0.1})
    lg.metrics(3, "joint", "train", {"loss": 0.5})
    lg.close()
    assert records["parameters"] == {"lr": 0.1}
    assert records["train/joint/loss"] == [(3, 0.5)]
    assert records["stopped"]
    assert os.path.exists(tmp_path / "logs" / "hyperparams.json")


def test_no_neptune_by_default(tmp_path, monkeypatch):
    monkeypatch.delenv("USE_NEPTUNE", raising=False)
    lg = RunLogger(str(tmp_path))
    assert lg._neptune is None
    lg.metrics(0, "warmup", "train", {"loss": 1.0})
    lg.close()
