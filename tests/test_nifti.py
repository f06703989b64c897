"""Dependency-free NIfTI-1 reader + the Pancreas preprocessors it
unlocks (previously gated on the absent nibabel).

The fixture files are constructed with struct.pack directly from the
NIfTI-1 specification — an implementation independent of the reader
under test — covering .nii and .nii.gz, little and big endian, int16
and float32 payloads, scl_slope/scl_inter scaling, and header
extensions (vox_offset > 352).
"""

import gzip
import os
import struct

import numpy as np
import pytest

from adlm_tpu.data.nifti import load_fdata


def _make_nifti(path, data, endian="<", slope=0.0, inter=0.0,
                vox_offset=352, compress=None):
    """Hand-built NIfTI-1 single-file image (spec fields only)."""
    code = {np.dtype(np.uint8): 2, np.dtype(np.int16): 4,
            np.dtype(np.int32): 8, np.dtype(np.float32): 16,
            np.dtype(np.float64): 64}[np.dtype(data.dtype)]
    hdr = bytearray(348)
    struct.pack_into(endian + "i", hdr, 0, 348)           # sizeof_hdr
    dims = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into(endian + "8h", hdr, 40, *dims)       # dim
    struct.pack_into(endian + "h", hdr, 70, code)         # datatype
    struct.pack_into(endian + "h", hdr, 72,
                     data.dtype.itemsize * 8)             # bitpix
    struct.pack_into(endian + "f", hdr, 108, vox_offset)  # vox_offset
    struct.pack_into(endian + "f", hdr, 112, slope)       # scl_slope
    struct.pack_into(endian + "f", hdr, 116, inter)       # scl_inter
    hdr[344:348] = b"n+1\x00"
    payload = (bytes(hdr) + b"\x00" * (vox_offset - 348)
               + np.asfortranarray(data).astype(
                   np.dtype(data.dtype).newbyteorder(endian)
               ).tobytes(order="F"))
    if compress is None:
        compress = path.endswith(".gz")
    with open(path, "wb") as f:
        f.write(gzip.compress(payload) if compress else payload)


def test_reader_roundtrip_dtypes_and_endianness(tmp_path):
    rng = np.random.RandomState(0)
    vol_f = rng.rand(5, 4, 3).astype(np.float32)
    vol_i = rng.randint(-500, 500, size=(4, 6, 2)).astype(np.int16)

    for name, data, endian in [("lf.nii", vol_f, "<"),
                               ("bf.nii", vol_f, ">"),
                               ("li.nii.gz", vol_i, "<"),
                               ("bi.nii.gz", vol_i, ">")]:
        p = str(tmp_path / name)
        _make_nifti(p, data, endian=endian)
        got = load_fdata(p)
        assert got.dtype == np.float64
        np.testing.assert_allclose(got, data.astype(np.float64),
                                   rtol=1e-6)


def test_reader_scaling_and_extensions(tmp_path):
    rng = np.random.RandomState(1)
    raw = rng.randint(0, 1000, size=(3, 3, 3)).astype(np.int16)
    p = str(tmp_path / "scaled.nii.gz")
    # CT-style rescale + a 16-byte header extension block
    _make_nifti(p, raw, slope=0.5, inter=-1024.0, vox_offset=368)
    np.testing.assert_allclose(load_fdata(p),
                               raw.astype(np.float64) * 0.5 - 1024.0)
    # slope 0 = "no scaling stored" (nibabel semantics)
    p2 = str(tmp_path / "noscale.nii")
    _make_nifti(p2, raw, slope=0.0, inter=7.0)
    np.testing.assert_allclose(load_fdata(p2), raw.astype(np.float64))


def test_reader_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.nii")
    with open(p, "wb") as f:
        f.write(b"\x00" * 400)
    with pytest.raises(ValueError, match="NIfTI"):
        load_fdata(p)


def _write_decathlon(tmp_path, n_patients=3, shape=(16, 20, 4)):
    """Tiny Medical-Decathlon-layout dataset (imagesTr/labelsTr)."""
    rng = np.random.RandomState(2)
    img_dir = os.path.join(tmp_path, "imagesTr")
    lab_dir = os.path.join(tmp_path, "labelsTr")
    os.makedirs(img_dir)
    os.makedirs(lab_dir)
    for i in range(n_patients):
        vol = rng.randint(-100, 400, size=shape).astype(np.int16)
        seg = np.zeros(shape, np.uint8)
        # annotate all but the last slice so slice filtering is visible
        seg[4:10, 6:12, :-1] = rng.randint(1, 3, size=(6, 6,
                                                       shape[2] - 1))
        _make_nifti(os.path.join(img_dir, f"pancreas_{i:03d}.nii.gz"),
                    vol)
        _make_nifti(os.path.join(lab_dir, f"pancreas_{i:03d}.nii.gz"),
                    seg)
    return str(tmp_path)


def test_preprocess_pancreas_without_nibabel(tmp_path):
    """The full Pancreas preprocessor now runs in this environment
    (reference preprocessPancreasScans.py:10-167)."""
    from adlm_tpu.data.preprocess import preprocess_pancreas

    src = _write_decathlon(tmp_path / "src")
    dst = str(tmp_path / "dst")
    preprocess_pancreas(src, dst, train_n=2, val_n=1,
                        upsample_to=(32, 64))
    import json
    with open(os.path.join(dst, "all_images.json")) as f:
        ids = json.load(f)
    assert len(ids["train"]) == 2 * 3  # 2 patients × 3 annotated slices
    assert len(ids["val"]) == 3
    one = ids["train"][0]
    img = np.load(os.path.join(dst, "img_with_margin_0", "train",
                               one + ".npy"))
    lab = np.load(os.path.join(dst, "annotations", "train",
                               one + ".npy"))
    assert img.shape == (32, 64, 3)
    assert lab.shape == (32, 64)
    assert set(np.unique(lab)) <= {0, 1, 2}


def test_prepare_unoise_data_without_nibabel(tmp_path):
    """U-Noise slice/bbox arrays from NIfTI (reference
    data/prepare_data.py:13-60)."""
    from adlm_tpu.data.preprocess import prepare_unoise_data

    src = _write_decathlon(tmp_path / "src")
    dst = str(tmp_path / "dst")
    os.makedirs(dst)
    prepare_unoise_data(src, dst, downscale=2)
    imgs = np.load(os.path.join(dst, "images.npy"))
    masks = np.load(os.path.join(dst, "masks.npy"))
    boxes = np.load(os.path.join(dst, "bounding_boxes.npy"))
    assert imgs.shape == (9, 8, 10)      # 3 patients × 3 slices, /2
    assert masks.shape == imgs.shape
    assert boxes.shape == (9, 4)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert set(np.unique(masks)) <= {0.0, 1.0}
    ys0, ys1, xs0, xs1 = boxes[0]
    assert 0 <= ys0 <= ys1 < 8 and 0 <= xs0 <= xs1 < 10
