"""Native data-path library tests: parity with cv2/PIL reference semantics."""

import numpy as np
import pytest

from adlm_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++)")


def test_resize_bilinear_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, size=(37, 53, 3)).astype(np.uint8)
    for dh, dw in [(20, 30), (74, 106), (37, 53)]:
        got = native.resize_bilinear_u8(img, dh, dw)
        expected = cv2.resize(img.astype(np.float32), (dw, dh),
                              interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(got, expected, atol=1e-2)


def test_resize_nearest_matches_jax_op():
    """Native nearest must agree exactly with the jitted op — the two
    implement the same documented floor mapping."""
    import jax.numpy as jnp
    from adlm_tpu.ops.resize import resize_label_nearest
    rng = np.random.RandomState(1)
    lab = rng.randint(0, 20, size=(37, 53)).astype(np.int32)
    for dh, dw in [(13, 17), (74, 106), (52, 62), (65, 65)]:
        got = native.resize_nearest_i32(lab, dh, dw)
        expected = np.asarray(resize_label_nearest(jnp.asarray(lab),
                                                   (dh, dw)))
        np.testing.assert_array_equal(got, expected)


def _numpy_reference_augment(img, label, scale, window, start, flip,
                             mean, std):
    """Reference transform chain in numpy/cv2 (dataset.py:119-173)."""
    cv2 = pytest.importorskip("cv2")
    h, w = label.shape
    nh, nw = int(h * scale), int(w * scale)
    image = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    # documented floor nearest mapping (see ops/resize.py)
    ys = np.minimum(((np.arange(nh) + 0.5) * h / nh).astype(int), h - 1)
    xs = np.minimum(((np.arange(nw) + 0.5) * w / nw).astype(int), w - 1)
    lab = label[ys][:, xs].astype(np.int64)
    image = image / 255.0
    wh, ww = window
    pad_h = max(wh - nh, 0)
    pad_w = max(ww - nw, 0)
    if pad_h or pad_w:
        image = cv2.copyMakeBorder(image, 0, pad_h, 0, pad_w,
                                   cv2.BORDER_CONSTANT, value=list(mean))
        lab = cv2.copyMakeBorder(lab, 0, pad_h, 0, pad_w,
                                 cv2.BORDER_CONSTANT, value=0)
    sh, sw = start
    image = image[sh:sh + wh, sw:sw + ww]
    lab = lab[sh:sh + wh, sw:sw + ww]
    if flip:
        image = image[:, ::-1].copy()
        lab = lab[:, ::-1].copy()
    image = (image - np.asarray(mean)) / np.asarray(std)
    return image.astype(np.float32), lab.astype(np.int32)


@pytest.mark.parametrize("scale,flip", [(0.6, False), (1.3, True),
                                        (1.0, False)])
def test_augment_sample_matches_reference_chain(scale, flip):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, size=(40, 48, 3)).astype(np.uint8)
    label = rng.randint(0, 4, size=(40, 48)).astype(np.int32)
    window = (33, 33)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    nh, nw = int(40 * scale), int(48 * scale)
    max_sh = max(nh, window[0]) - window[0]
    max_sw = max(nw, window[1]) - window[1]
    start = (min(3, max_sh), min(5, max_sw))

    got_img, got_lab = native.augment_sample(
        img, label, scale, window, start, flip, mean, std)
    exp_img, exp_lab = _numpy_reference_augment(
        img, label, scale, window, start, flip, mean, std)
    np.testing.assert_array_equal(got_lab, exp_lab)
    # cv2's uint8 bilinear quantizes interpolation weights to fixed
    # point, so individual pixels can differ by 1 LSB; allow 1.5/255
    # in normalized space (labels above are exact)
    atol = 1.5 / 255.0 / min(std)
    np.testing.assert_allclose(got_img, exp_img, atol=atol)


def test_native_faster_than_python_path():
    import time
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, size=(1024, 2048, 3)).astype(np.uint8)
    label = rng.randint(0, 20, size=(1024, 2048)).astype(np.int32)
    t0 = time.perf_counter()
    for _ in range(3):
        native.augment_sample(img, label, 0.75, (513, 513), (10, 10),
                              True, (0.485, 0.456, 0.406),
                              (0.229, 0.224, 0.225))
    native_t = (time.perf_counter() - t0) / 3
    assert native_t < 0.5, f"native augment too slow: {native_t:.3f}s"


def test_remap_matches_numpy_warps():
    """Native remap (bilinear + nearest, reflect-101) is bit-equal to
    the numpy implementation in data/warps.py."""
    from adlm_tpu.data import warps
    rng = np.random.RandomState(1)
    img = rng.rand(33, 47).astype(np.float32)
    img3 = rng.rand(33, 47, 3).astype(np.float32)
    mask = (rng.rand(33, 47) > 0.6).astype(np.float32)
    # coords well outside the image exercise the reflection
    my = (rng.rand(21, 29) * 90 - 25).astype(np.float32)
    mx = (rng.rand(21, 29) * 120 - 30).astype(np.float32)
    np.testing.assert_array_equal(
        native.remap_bilinear(img, my, mx),
        warps._sample_bilinear(img, my, mx))
    np.testing.assert_array_equal(
        native.remap_bilinear(img3, my, mx),
        warps._sample_bilinear(img3, my, mx))
    np.testing.assert_array_equal(
        native.remap_nearest(mask, my, mx),
        warps._sample_nearest(mask, my, mx))


def test_gaussian_blur_matches_scipy():
    from scipy.ndimage import gaussian_filter
    rng = np.random.RandomState(2)
    f = (rng.rand(64, 80).astype(np.float32) * 2 - 1)
    for sigma in (1.5, 6.0):
        got = native.gaussian_blur(f, sigma)
        want = gaussian_filter(f, sigma, mode="constant", cval=0)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_unoise_threaded_batches_match_samples():
    """n_jobs>1 loading yields well-formed batches with augmentation
    applied (per-item RNGs; RandomState is not thread-safe)."""
    from adlm_tpu.data.unoise_data import UNoiseDataset, batches
    rng = np.random.RandomState(3)
    ds = UNoiseDataset(rng.rand(10, 32, 32).astype(np.float32),
                       (rng.rand(10, 32, 32) > 0.5).astype(np.float32),
                       augment=True)
    got = list(batches(ds, 4, shuffle=True, seed=0, n_jobs=4))
    assert len(got) == 3
    assert got[0][0].shape == (4, 32, 32, 3)
    assert got[0][1].shape == (4, 32, 32, 1)
    assert all(np.isfinite(b[0]).all() for b in got)
    # unaugmented threaded batches are exactly reproducible
    ds2 = UNoiseDataset(ds.images[..., 0], ds.masks)
    a = np.concatenate([b[0] for b in batches(ds2, 4, n_jobs=4)])
    b = np.concatenate([b[0] for b in batches(ds2, 4)])
    np.testing.assert_array_equal(a, b)
