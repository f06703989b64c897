"""HTTP inference server (adlm_tpu/deploy/server.py) tests.

The serving contract: a process holding ONE fixed-batch artifact must
give per-request answers identical to calling the artifact directly —
micro-batch coalescing, tail padding, pipelined dispatch, and the
single-item convenience path must all be invisible to clients.
"""

import http.client
import io
import json

import jax
import jax.numpy as jnp
import numpy as np

from adlm_tpu.core.config import PPNetConfig
from adlm_tpu.deploy.export import (
    export_inference_artifact,
    load_inference_artifact,
)
from adlm_tpu.deploy.server import InferenceServer, MicroBatcher
from adlm_tpu.models.ppnet import PPNet, default_proto_class


def _tiny_artifact(tmp_path, batch=4, seed=0):
    cfg = PPNetConfig(num_prototypes=6, num_classes=3,
                      prototype_channels=8, deeplab_n_features=8,
                      deeplab_n_blocks=(1, 1, 1, 1), img_size=33)
    model = PPNet(cfg=cfg)
    v = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 33, 33, 3)))
    out = str(tmp_path / "artifact")
    export_inference_artifact(
        model, v["params"], v.get("constants", {}),
        default_proto_class(6, 3), out, batch=batch, size=(33, 33),
        normalize=None, platforms=("cpu",), compute_dtype=jnp.float32)
    return out


def _post_npy(conn, path, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    conn.request("POST", path, body=buf.getvalue(),
                 headers={"Content-Type": "application/x-npy"})
    return conn.getresponse()


def _read_npz(resp):
    assert resp.status == 200, resp.read()
    return dict(np.load(io.BytesIO(resp.read())))


def test_microbatcher_splits_and_pads(tmp_path):
    """Requests of 1+2 rows coalesce into one padded batch-4 call and
    each caller gets exactly its own rows back."""
    out = _tiny_artifact(tmp_path)
    call, manifest = load_inference_artifact(out, platform="cpu")
    rng = np.random.RandomState(0)
    x = rng.rand(3, 33, 33, 3).astype(np.float32)
    want = call(jnp.asarray(np.concatenate(
        [x, np.zeros((1, 33, 33, 3), np.float32)])))

    b = MicroBatcher(call, batch=4, item_shape=(33, 33, 3),
                     dtype="float32", window_ms=50.0)
    import threading
    results = {}

    def go(name, arr):
        results[name] = b.submit(arr)

    t1 = threading.Thread(target=go, args=("a", x[:1]))
    t2 = threading.Thread(target=go, args=("b", x[1:]))
    t1.start(); t2.start(); t1.join(); t2.join()
    b.close()

    got = np.concatenate([results["a"]["pred"], results["b"]["pred"]]) \
        if results["a"]["pred"].shape[0] == 1 else np.concatenate(
            [results["b"]["pred"], results["a"]["pred"]])
    # row order within the coalesced batch follows submission order,
    # which the threads race for — compare as sets of per-image maps
    want_pred = np.asarray(want["pred"])[:3]
    got_sorted = got[np.lexsort(got.reshape(3, -1).T)]
    want_sorted = want_pred[np.lexsort(want_pred.reshape(3, -1).T)]
    np.testing.assert_array_equal(got_sorted, want_sorted)
    assert b.n_batches == 1  # coalesced, not two calls
    assert b.n_items == 3


def test_microbatcher_rejects_bad_requests(tmp_path):
    out = _tiny_artifact(tmp_path)
    call, _ = load_inference_artifact(out, platform="cpu")
    b = MicroBatcher(call, batch=4, item_shape=(33, 33, 3),
                     dtype="float32", window_ms=1.0)
    import pytest
    with pytest.raises(ValueError):
        b.submit(np.zeros((1, 32, 32, 3), np.float32))  # wrong shape
    with pytest.raises(ValueError):
        b.submit(np.zeros((5, 33, 33, 3), np.float32))  # over batch
    with pytest.raises(ValueError):
        b.submit(np.zeros((1, 33, 33, 3), np.float64))  # wrong dtype
    b.close()


def test_http_server_end_to_end(tmp_path):
    """healthz, manifest, single-item and batch /predict, outputs
    filter — responses equal the direct artifact call."""
    out = _tiny_artifact(tmp_path, seed=2)
    call, manifest = load_inference_artifact(out, platform="cpu")
    server = InferenceServer(out, port=0, platform="cpu", window_ms=2.0)
    server.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok" and health["batch"] == 4

        conn.request("GET", "/manifest")
        assert json.loads(conn.getresponse().read()) == manifest

        rng = np.random.RandomState(1)
        x = rng.rand(2, 33, 33, 3).astype(np.float32)
        want = call(jnp.asarray(np.concatenate(
            [x, np.zeros((2, 33, 33, 3), np.float32)])))

        # batch request
        got = _read_npz(_post_npy(conn, "/predict", x))
        assert set(got) == {"pred", "grid_logits", "nearest_proto"}
        np.testing.assert_array_equal(got["pred"],
                                      np.asarray(want["pred"])[:2])

        # single-item request drops the leading axis
        got1 = _read_npz(_post_npy(conn, "/predict?outputs=pred", x[0]))
        assert set(got1) == {"pred"}
        np.testing.assert_array_equal(got1["pred"],
                                      np.asarray(want["pred"])[0])

        # unknown output name → 400
        resp = _post_npy(conn, "/predict?outputs=nope", x[0])
        assert resp.status == 400
        assert "available" in json.loads(resp.read())

        # malformed body → 400
        conn.request("POST", "/predict", body=b"not an npy")
        assert conn.getresponse().status == 400

        # wrong shape → 400 with a useful message
        resp = _post_npy(conn, "/predict",
                         np.zeros((1, 32, 32, 3), np.float32))
        assert resp.status == 400
        assert "shape" in json.loads(resp.read())["error"]

        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["requests"] >= 2 and health["batches"] >= 2

        # Prometheus text exposition mirrors the healthz counters
        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type").startswith("text/plain")
        metrics = {}
        for line in resp.read().decode().splitlines():
            if line and not line.startswith("#"):
                k, v = line.split()
                metrics[k] = float(v)
        assert metrics["adlm_requests_total"] == health["requests"]
        assert metrics["adlm_batches_total"] == health["batches"]
        assert metrics["adlm_batch_size"] == health["batch"]
    finally:
        server.close()


def test_serve_cli_wiring(tmp_path, monkeypatch):
    """`serve` subcommand wires artifact_dir/port/window/platform into
    InferenceServer (the server loop itself is tested above)."""
    import adlm_tpu.deploy.server as srv_mod
    from adlm_tpu.cli import main as cli_main

    calls = {}

    class Stub:
        def __init__(self, artifact_dir, port, host, platform, window_ms):
            calls.update(artifact_dir=artifact_dir, port=port, host=host,
                         platform=platform, window_ms=window_ms)
            self.manifest = {"input": {"shape": [4, 33, 33, 3],
                                       "dtype": "float32"}}
            self.known_outputs = ["pred"]
            self.port = port

        def serve_forever(self):
            pass

        def close(self):
            pass

    monkeypatch.setattr(srv_mod, "InferenceServer", Stub)
    cli_main(["serve", str(tmp_path), "--port", "7001",
              "--window-ms", "3", "--platform", "cpu"])
    assert calls == {"artifact_dir": str(tmp_path), "port": 7001,
                     "host": "127.0.0.1", "platform": "cpu",
                     "window_ms": 3.0}
