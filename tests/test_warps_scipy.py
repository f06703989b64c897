"""Independent warp verification vs scipy.ndimage.

test_warps checks properties (identity, exact 90°, ranges); these tests
cross-check the resampler and coordinate math against
``scipy.ndimage.map_coordinates`` — an independent implementation whose
``mode='mirror'`` boundary equals cv2's BORDER_REFLECT_101 (the
semantics albumentations uses, reference src/data.py:14-38) — plus
algebraic checks of the affine solvers and a frozen regression fixture
(tests/fixtures/warps_golden.npz).
"""

import os

import numpy as np
from scipy.ndimage import map_coordinates

from adlm_tpu.data.warps import (
    _affine_maps,
    _get_affine_transform,
    _sample_bilinear,
    _sample_nearest,
    elastic_transform,
    grid_distortion,
    optical_distortion,
    shift_scale_rotate,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "warps_golden.npz")


def _random_maps(rs, h, w, spread=4.0):
    """Float sample coordinates extending past every edge so the
    reflect-101 handling is exercised, nowhere near exact .5 ties."""
    my = rs.uniform(-spread, h - 1 + spread, size=(h, w)).astype(np.float32)
    mx = rs.uniform(-spread, w - 1 + spread, size=(h, w)).astype(np.float32)
    return my, mx


def test_bilinear_matches_scipy_map_coordinates():
    rs = np.random.RandomState(0)
    img = rs.rand(13, 17).astype(np.float32)
    my, mx = _random_maps(rs, 13, 17)
    ours = _sample_bilinear(img, my, mx)
    ref = map_coordinates(img.astype(np.float64), [my, mx], order=1,
                          mode="mirror")
    assert np.max(np.abs(ours - ref)) <= 1e-5


def test_bilinear_multichannel_matches_scipy():
    rs = np.random.RandomState(1)
    img = rs.rand(11, 9, 3).astype(np.float32)
    my, mx = _random_maps(rs, 11, 9)
    ours = _sample_bilinear(img, my, mx)
    for c in range(3):
        ref = map_coordinates(img[..., c].astype(np.float64), [my, mx],
                              order=1, mode="mirror")
        assert np.max(np.abs(ours[..., c] - ref)) <= 1e-5


def test_nearest_matches_scipy_map_coordinates():
    rs = np.random.RandomState(2)
    mask = rs.randint(0, 5, size=(12, 15)).astype(np.float32)
    my, mx = _random_maps(rs, 12, 15)
    ours = _sample_nearest(mask, my, mx)
    ref = map_coordinates(mask, [my, mx], order=0, mode="mirror")
    np.testing.assert_array_equal(ours, ref)


def test_affine_maps_invert_forward_matrix():
    """(map_x[i,j], map_y[i,j]) pushed through the FORWARD matrix must
    land back on destination pixel (j, i) — i.e. _affine_maps really is
    cv2.warpAffine's inverse sampling."""
    rs = np.random.RandomState(3)
    m = np.array([[1.1, 0.2, 3.0], [-0.15, 0.9, -2.0]])
    my, mx = _affine_maps(m, 10, 14)
    ys, xs = np.mgrid[0:10, 0:14].astype(np.float64)
    fwd_x = m[0, 0] * mx + m[0, 1] * my + m[0, 2]
    fwd_y = m[1, 0] * mx + m[1, 1] * my + m[1, 2]
    assert np.max(np.abs(fwd_x - xs)) <= 1e-4
    assert np.max(np.abs(fwd_y - ys)) <= 1e-4
    del rs


def test_affine_maps_match_scipy_affine_sampling():
    """Full warp via our maps + scipy resampler vs scipy's own
    map_coordinates driven by an independently-derived inverse."""
    rs = np.random.RandomState(4)
    img = rs.rand(16, 12).astype(np.float32)
    m = np.array([[0.95, -0.1, 1.5], [0.08, 1.05, -0.7]])
    my, mx = _affine_maps(m, 16, 12)
    ours = _sample_bilinear(img, my, mx)

    inv = np.linalg.inv(np.vstack([m, [0, 0, 1]]))
    ys, xs = np.mgrid[0:16, 0:12].astype(np.float64)
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    ref = map_coordinates(img.astype(np.float64), [src_y, src_x],
                          order=1, mode="mirror")
    assert np.max(np.abs(ours - ref)) <= 1e-5


def test_get_affine_transform_maps_points_exactly():
    rs = np.random.RandomState(5)
    for _ in range(5):
        src = rs.rand(3, 2).astype(np.float64) * 20
        dst = rs.rand(3, 2).astype(np.float64) * 20
        m = _get_affine_transform(src, dst)
        got = (m[:, :2] @ src.T + m[:, 2:]).T
        np.testing.assert_allclose(got, dst, atol=1e-9)


def _fixture_case(seed):
    rs = np.random.RandomState(seed)
    image = rs.rand(24, 20).astype(np.float32)
    mask = rs.randint(0, 3, size=(24, 20)).astype(np.float32)
    return image, mask


def _run_all(seed):
    out = {}
    for name, fn in (("elastic", elastic_transform),
                     ("grid", grid_distortion),
                     ("optical", optical_distortion),
                     ("ssr", shift_scale_rotate)):
        image, mask = _fixture_case(seed)
        rs = np.random.RandomState(seed + 100)
        img2, msk2 = fn(image, mask, rs)
        out[f"{name}_img"] = img2
        out[f"{name}_msk"] = msk2
    return out


def test_warp_outputs_match_frozen_fixture():
    """Regression pin: each transform's output on a fixed seed equals
    the stored fixture (guards future refactors of the coordinate
    math; regenerate deliberately with REGEN_WARP_FIXTURE=1)."""
    got = _run_all(seed=7)
    if not os.path.exists(FIXTURE) or os.environ.get("REGEN_WARP_FIXTURE"):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, **got)
    ref = np.load(FIXTURE)
    for k in got:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-6,
                                   err_msg=f"fixture drift in {k}")
