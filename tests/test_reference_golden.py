"""Golden tests against the reference's ACTUAL code (not re-implementations).

The reference modules can't be imported wholesale (they pull gin and a
missing git submodule at import time), so the pure functions under test
are extracted from source and exec'd.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from adlm_tpu.ops.prototype import (  # noqa: E402
    distance_to_similarity,
    l2_distances,
    weighted_l2_distances,
)


def _extract_ppnet_methods():
    """Pull _l2_convolution / _weighted_l2_convolution out of the
    reference PPNet class source (reference model.py:177-221)."""
    src = open("/root/reference/model.py").read()
    w_start = src.index("    @staticmethod\n    def _weighted_l2_convolution")
    w_end = src.index("    def prototype_distances")
    body = src[w_start:w_end]
    # dedent one level and strip decorators/self
    lines = []
    for line in body.splitlines():
        line = line[4:] if line.startswith("    ") else line
        if line.strip() == "@staticmethod":
            continue
        lines.append(line)
    code = "\n".join(lines).replace("def _l2_convolution(self, x):",
                                    "def _l2_convolution(x, prototype_vectors, ones):")
    code = code.replace("self.prototype_vectors", "prototype_vectors")
    code = code.replace("self.ones", "ones")
    ns = {"torch": torch, "F": torch.nn.functional}
    exec(code, ns)
    return ns["_l2_convolution"], ns["_weighted_l2_convolution"]


def test_l2_distances_matches_reference_l2_convolution():
    ref_l2, _ = _extract_ppnet_methods()
    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 7, 9).astype(np.float32)       # NCHW for torch
    protos = rng.rand(12, 16, 1, 1).astype(np.float32)
    ones = np.ones_like(protos)

    expected = ref_l2(torch.tensor(x), torch.tensor(protos),
                      torch.tensor(ones)).numpy()      # (2, 12, 7, 9)

    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    got = np.asarray(l2_distances(jnp.asarray(x_nhwc),
                                  jnp.asarray(protos[:, :, 0, 0])))
    got_nchw = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, expected, rtol=1e-4, atol=1e-5)


def test_weighted_l2_matches_reference():
    _, ref_wl2 = _extract_ppnet_methods()
    rng = np.random.RandomState(1)
    x = rng.rand(2, 16, 5, 6).astype(np.float32)
    protos = rng.rand(8, 16, 1, 1).astype(np.float32)
    weights = rng.rand(8, 16, 1, 1).astype(np.float32)

    expected = ref_wl2(torch.tensor(x), torch.tensor(protos),
                       torch.tensor(weights)).numpy()

    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    got = np.asarray(weighted_l2_distances(
        jnp.asarray(x_nhwc), jnp.asarray(protos[:, :, 0, 0]),
        jnp.asarray(weights[:, :, 0, 0])))
    got_nchw = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, expected, rtol=1e-4, atol=1e-5)


def test_similarity_matches_reference_formula():
    """distance_2_similarity (reference model.py:231-237) on real values."""
    d = np.linspace(0, 50, 100).astype(np.float32)
    ours = np.asarray(distance_to_similarity(jnp.asarray(d)))
    ref = torch.log((torch.tensor(d) + 1) / (torch.tensor(d) + 1e-4))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5)
