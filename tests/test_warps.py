"""Geometric warp augmentation tests (U-Noise training distribution).

Covers the numpy re-implementations of the reference's albumentations
transforms (reference src/data.py:14-38): shape preservation, exact
identity at zero magnitude, mask binariness, reflect-101 edges, and the
pipeline's determinism under a fixed RandomState.
"""

import numpy as np

from adlm_tpu.data.warps import (
    _reflect101,
    elastic_transform,
    grid_distortion,
    optical_distortion,
    reference_geometric_augment,
    remap_pair,
    shift_scale_rotate,
)


def _sample(seed=0, h=31, w=37):
    rs = np.random.RandomState(seed)
    img = rs.rand(h, w, 3).astype(np.float32)
    mask = (rs.rand(h, w) > 0.6).astype(np.float32)
    return img, mask


def test_reflect101_indexing():
    # cv2.BORDER_REFLECT_101: ... 2 1 | 0 1 2 3 | 2 1 ...
    got = _reflect101(np.array([-2, -1, 0, 1, 2, 3, 4, 5]), 4)
    np.testing.assert_array_equal(got, [2, 1, 0, 1, 2, 3, 2, 1])
    # degenerate single-row axis
    np.testing.assert_array_equal(_reflect101(np.array([-1, 0, 1]), 1),
                                  [0, 0, 0])


def test_remap_identity():
    img, mask = _sample()
    ys, xs = np.mgrid[0:img.shape[0], 0:img.shape[1]].astype(np.float32)
    out_img, out_mask = remap_pair(img, mask, ys, xs)
    np.testing.assert_allclose(out_img, img, atol=1e-6)
    np.testing.assert_array_equal(out_mask, mask)


def test_elastic_identity_at_zero_magnitude():
    img, mask = _sample()
    out_img, out_mask = elastic_transform(img, mask,
                                          np.random.RandomState(0),
                                          alpha=0.0, sigma=6.0,
                                          alpha_affine=0.0)
    np.testing.assert_allclose(out_img, img, atol=1e-6)
    np.testing.assert_array_equal(out_mask, mask)


def test_elastic_moves_pixels_and_keeps_mask_binary():
    img, mask = _sample()
    out_img, out_mask = elastic_transform(img, mask,
                                          np.random.RandomState(1))
    assert out_img.shape == img.shape and out_mask.shape == mask.shape
    assert np.abs(out_img - img).max() > 1e-3  # actually warped
    assert set(np.unique(out_mask)) <= {0.0, 1.0}


def test_grid_distortion_identity_at_zero_limit():
    img, mask = _sample()
    out_img, out_mask = grid_distortion(img, mask,
                                        np.random.RandomState(0),
                                        distort_limit=0.0)
    np.testing.assert_allclose(out_img, img, atol=1e-5)
    np.testing.assert_array_equal(out_mask, mask)


def test_grid_distortion_warps():
    img, mask = _sample(2)
    out_img, out_mask = grid_distortion(img, mask, np.random.RandomState(2))
    assert out_img.shape == img.shape
    assert np.abs(out_img - img).max() > 1e-3
    assert set(np.unique(out_mask)) <= {0.0, 1.0}


def test_optical_distortion_identity_at_zero_limit():
    img, mask = _sample()
    out_img, out_mask = optical_distortion(img, mask,
                                           np.random.RandomState(0),
                                           distort_limit=0.0,
                                           shift_limit=0.0)
    np.testing.assert_allclose(out_img, img, atol=1e-5)
    np.testing.assert_array_equal(out_mask, mask)


def test_optical_distortion_radial_symmetry():
    """Pincushion/barrel distortion is radial: with the principal point
    centered, displacement grows with radius and the exact center pixel
    stays put."""
    h = w = 41
    img = np.zeros((h, w, 3), np.float32)
    img[h // 2, w // 2] = 1.0
    mask = np.zeros((h, w), np.float32)
    out_img, _ = optical_distortion(img, mask, np.random.RandomState(3),
                                    distort_limit=2.0, shift_limit=0.0)
    # center of mass unchanged (radial map fixes the center)
    ys, xs = np.mgrid[0:h, 0:w]
    m = out_img[:, :, 0]
    assert abs((ys * m).sum() / m.sum() - h // 2) < 0.5
    assert abs((xs * m).sum() / m.sum() - w // 2) < 0.5


def test_shift_scale_rotate_identity_at_zero():
    img, mask = _sample()
    out_img, out_mask = shift_scale_rotate(img, mask,
                                           np.random.RandomState(0),
                                           shift_limit=0.0,
                                           scale_limit=0.0,
                                           rotate_limit=0.0)
    np.testing.assert_allclose(out_img, img, atol=1e-5)
    np.testing.assert_array_equal(out_mask, mask)


def test_shift_scale_rotate_pure_shift():
    """A pure +1-pixel fractional shift translates content exactly."""
    img, mask = _sample(4, h=32, w=32)
    rs = np.random.RandomState(0)

    # uniform(-l, l) is monotone in the underlying sample; force the
    # exact shift by calling the kernel directly with a wrapped RS
    class FixedRS:
        def uniform(self, lo, hi):
            if lo == -0.0625:  # shift draw
                return 4.0 / 32.0
            return 0.0

    out_img, out_mask = shift_scale_rotate(img, mask, FixedRS(),
                                           shift_limit=0.0625,
                                           scale_limit=0.0,
                                           rotate_limit=0.0)
    # dst(x) = src(x - 4): interior content shifts by +4 in both axes
    np.testing.assert_allclose(out_img[10:30, 10:30], img[6:26, 6:26],
                               atol=1e-5)
    np.testing.assert_array_equal(out_mask[10:30, 10:30], mask[6:26, 6:26])


def test_rotation_90_exact_cv2_semantics():
    """scale=1, angle=90° on a 21px image: cv2.getRotationMatrix2D
    rotates about (w/2, h/2) = (10.5, 10.5) — NOT the pixel-grid center
    (10, 10) — giving dst(r, c) = src(c, 21 - r): np.rot90 shifted by
    one pixel.  Asserting that exact map pins the cv2 convention."""
    h = w = 21
    rs = np.random.RandomState(5)
    img = rs.rand(h, w, 3).astype(np.float32)
    mask = (rs.rand(h, w) > 0.5).astype(np.float32)

    class FixedRS:
        def uniform(self, lo, hi):
            if lo == -45.0:
                return 90.0
            return 0.0

    out_img, _ = shift_scale_rotate(img, mask, FixedRS(),
                                    rotate_limit=45.0)
    # out[r, c] = img[c, 21 - r] = transpose(img)[21 - r, c]
    t = np.transpose(img, (1, 0, 2))
    np.testing.assert_allclose(out_img[1:], t[1:][::-1], atol=1e-4)


def test_pipeline_deterministic_and_shape_stable():
    img, mask = _sample(6, h=48, w=40)
    out1 = reference_geometric_augment(img, mask, np.random.RandomState(7))
    out2 = reference_geometric_augment(img, mask, np.random.RandomState(7))
    np.testing.assert_array_equal(out1[0], out2[0])
    np.testing.assert_array_equal(out1[1], out2[1])
    assert out1[0].shape == img.shape and out1[1].shape == mask.shape


def test_unoise_dataset_exercises_warps():
    """A training run's worth of samples from the augmented dataset:
    finite, correct shape, and at least one draw hits the geometric
    branch (p=0.3 over 40 draws ≈ certain)."""
    from adlm_tpu.data.unoise_data import UNoiseDataset
    rs = np.random.RandomState(0)
    imgs = rs.rand(8, 32, 32).astype(np.float32)
    masks = (rs.rand(8, 32, 32) > 0.5).astype(np.float32)
    ds = UNoiseDataset(imgs, masks, augment=True, seed=3)
    for i in range(40):
        x, y = ds[i % 8]
        assert x.shape == (32, 32, 3) and y.shape == (32, 32, 1)
        assert np.isfinite(x).all()
        assert set(np.unique(y)) <= {0.0, 1.0}
