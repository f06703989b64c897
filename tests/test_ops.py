"""Unit tests for core ops against naive references and torch semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adlm_tpu.ops import (
    cross_entropy_ignore,
    dice_coeff,
    distance_to_similarity,
    kld_prototype_loss,
    l2_distances,
    masked_l1,
    prototype_head,
    prototype_head_reference,
    resize_label_nearest,
    bce_with_logits,
)


def test_l2_distances_vs_naive():
    rng = np.random.RandomState(0)
    x = rng.randn(7, 5, 64).astype(np.float32)
    p = rng.randn(30, 64).astype(np.float32)
    d = np.asarray(l2_distances(jnp.asarray(x), jnp.asarray(p)))
    naive = ((x[..., None, :] - p[None, None]) ** 2).sum(-1)
    np.testing.assert_allclose(d, naive, rtol=1e-4, atol=1e-3)


def test_prototype_head_matches_reference_composition():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, 9, 64).astype(np.float32)
    p = rng.rand(30, 64).astype(np.float32)
    w = rng.randn(30, 3).astype(np.float32)
    logits, d = prototype_head(jnp.asarray(x), jnp.asarray(p), jnp.asarray(w))
    ref_logits, ref_d = prototype_head_reference(
        jnp.asarray(x), jnp.asarray(p), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d),
                               rtol=1e-4, atol=1e-4)


def test_prototype_head_gradients():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    p = jnp.asarray(rng.rand(6, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(6, 3).astype(np.float32))

    def loss_fused(x, p, w):
        logits, d = prototype_head(x, p, w)
        return jnp.sum(logits ** 2) + 0.1 * jnp.sum(jnp.sqrt(d + 1.0))

    def loss_ref(x, p, w):
        logits, d = prototype_head_reference(x, p, w)
        return jnp.sum(logits ** 2) + 0.1 * jnp.sum(jnp.sqrt(d + 1.0))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, p, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, p, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_distance_to_similarity_log():
    d = jnp.asarray([0.0, 1.0, 10.0])
    s = distance_to_similarity(d)
    expected = np.log((np.asarray(d) + 1) / (np.asarray(d) + 1e-4))
    np.testing.assert_allclose(np.asarray(s), expected, rtol=1e-5)


def test_resize_label_nearest_matches_pil():
    """Exact at non-degenerate positions; PIL's exact-integer-center
    picks are float-rounding-dependent, so allow a sub-2% mismatch
    (whole boundary rows/columns at most)."""
    from PIL import Image
    rng = np.random.RandomState(3)
    lab = rng.randint(0, 20, size=(37, 53)).astype(np.int32)
    for size in [(13, 17), (65, 65), (74, 106), (48, 62), (37, 53)]:
        pil = Image.fromarray(lab.astype(float)).resize(
            (size[1], size[0]), resample=Image.NEAREST)
        expected = np.asarray(pil).astype(np.int32)
        got = np.asarray(resize_label_nearest(jnp.asarray(lab), size))
        mismatch = np.mean(got != expected)
        assert mismatch < 0.02, (size, mismatch)


def test_resize_label_nearest_matches_documented_formula():
    rng = np.random.RandomState(4)
    lab = rng.randint(0, 20, size=(40, 48)).astype(np.int32)
    for oh, ow in [(52, 62), (24, 28), (129, 257)]:
        got = np.asarray(resize_label_nearest(jnp.asarray(lab), (oh, ow)))
        ys = np.minimum(((np.arange(oh) + 0.5) * 40 / oh).astype(int), 39)
        xs = np.minimum(((np.arange(ow) + 0.5) * 48 / ow).astype(int), 47)
        np.testing.assert_array_equal(got, lab[ys][:, xs])


def test_cross_entropy_ignore_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(4)
    logits = rng.randn(50, 19).astype(np.float32)
    raw = rng.randint(0, 20, size=(50,))  # 0 = void
    valid = raw != 0
    labels = np.where(valid, raw - 1, 0)

    loss, n_correct = cross_entropy_ignore(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid))

    t_logits = torch.tensor(logits)[torch.tensor(valid)]
    t_labels = torch.tensor(labels)[torch.tensor(valid)]
    expected = F.cross_entropy(t_logits, t_labels.long()).item()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    expected_correct = (t_logits.argmax(-1) == t_labels).sum().item()
    assert int(n_correct) == expected_correct


def _torch_kld_reference(activations, labels, num_classes):
    """Literal re-implementation of the reference loop semantics
    (reference segmentation/module.py:167-208) for golden-value tests."""
    import torch
    import torch.nn.functional as F
    acts = torch.tensor(activations)  # (B, N, P)
    labs = torch.tensor(labels)
    B, N, P = acts.shape
    K = P // num_classes
    klds = []
    for b in range(B):
        for c in torch.unique(labs[b]).numpy():
            if c < 0 or c >= num_classes:
                continue
            protos = list(range(c * K, (c + 1) * K))
            mask = labs[b] == c
            dists = [F.log_softmax(acts[b, :, i][mask], dim=0) for i in protos]
            for i in range(len(protos)):
                if len(protos) < 2 or len(dists[0]) < 2:
                    continue
                for j in range(i + 1, len(protos)):
                    kld1 = F.kl_div(dists[i], dists[j], log_target=True,
                                    reduction="sum")
                    kld2 = F.kl_div(dists[j], dists[i], log_target=True,
                                    reduction="sum")
                    klds.append((kld1 + kld2) / 2.0)
    if not klds:
        return 0.0
    return torch.exp(-torch.stack(klds)).mean().item()


def test_kld_prototype_loss_matches_reference_loop():
    rng = np.random.RandomState(5)
    B, N, C, K = 2, 40, 3, 4
    acts = rng.randn(B, N, C * K).astype(np.float32)
    labels = rng.randint(-1, C, size=(B, N))
    expected = _torch_kld_reference(acts, labels, C)
    proto_class = jnp.arange(C * K) // K
    got = float(kld_prototype_loss(jnp.asarray(acts), jnp.asarray(labels),
                                   proto_class))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_kld_prototype_loss_no_valid_pairs_is_zero():
    acts = jnp.zeros((1, 10, 6))
    labels = jnp.full((1, 10), -1)
    assert float(kld_prototype_loss(acts, labels, jnp.arange(6) // 2)) == 0.0


def test_kld_prototype_loss_single_pixel_class_skipped():
    rng = np.random.RandomState(6)
    acts = rng.randn(1, 10, 6).astype(np.float32)
    labels = np.full((1, 10), -1)
    labels[0, 3] = 1  # single pixel of class 1 -> skipped (<2 pixels)
    got = float(kld_prototype_loss(jnp.asarray(acts), jnp.asarray(labels),
                                   jnp.arange(6) // 2))
    assert got == 0.0


def test_kld_prototype_loss_ragged_identity():
    # pruned model: classes with 1 proto contribute no pairs
    rng = np.random.RandomState(9)
    acts = rng.randn(1, 20, 5).astype(np.float32)
    labels = rng.randint(0, 3, size=(1, 20))
    proto_class = jnp.asarray([0, 0, 1, 2, 2])
    got = float(kld_prototype_loss(jnp.asarray(acts), jnp.asarray(labels),
                                   proto_class))
    assert np.isfinite(got) and 0.0 < got <= 1.0


def test_masked_l1_matches_torch():
    import torch
    rng = np.random.RandomState(7)
    P, C = 12, 3
    w = rng.randn(P, C).astype(np.float32)
    got = float(masked_l1(jnp.asarray(w), jnp.arange(P) // (P // C)))
    ident = torch.zeros(P, C)
    K = P // C
    for c in range(C):
        ident[c * K:(c + 1) * K, c] = 1
    mask = 1 - ident.t()  # (C, P), torch weight layout
    expected = (torch.tensor(w).t() * mask).norm(p=1).item()
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_bce_and_dice_match_torch():
    import torch
    rng = np.random.RandomState(8)
    logits = rng.randn(4, 1, 16, 16).astype(np.float32)
    targets = (rng.rand(4, 1, 16, 16) > 0.5).astype(np.float32)
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    expected = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets)).item()
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    pred = logits > 0
    got_d = float(dice_coeff(jnp.asarray(pred), jnp.asarray(targets)))
    m1 = torch.tensor(pred, dtype=torch.float32).view(4, -1)
    m2 = torch.tensor(targets).view(4, -1)
    expected_d = (2.0 * (m1 * m2).sum() / (m1.sum() + m2.sum() + 1e-10)).item()
    np.testing.assert_allclose(got_d, expected_d, rtol=1e-5)
