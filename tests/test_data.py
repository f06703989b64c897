"""Data-layer tests: class tables, dataset aug, splits, preprocessors."""

import json
import os

import numpy as np
import pytest

from adlm_tpu.core.config import DataConfig
from adlm_tpu.data.constants import get_class_table
from adlm_tpu.data.dataset import SegmentationDataset
from adlm_tpu.data.pipeline import BatchLoader, superbatch_iterator
from adlm_tpu.data.unoise_data import UNoiseDataset, batches, split_datasets
from adlm_tpu.data.preprocess import (
    add_margins_to_image,
    generate_image_list,
)


def test_cityscapes_table_matches_reference():
    import importlib.util, sys
    spec = importlib.util.spec_from_file_location(
        "ref_constants", "/root/reference/segmentation/constants.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    t = get_class_table("cityscapes")
    assert dict(t.convert) == ref.CITYSCAPES_19_EVAL_CATEGORIES
    assert list(t.categories) == ref.CITYSCAPES_CATEGORIES
    p = get_class_table("pascal")
    assert dict(p.convert) == ref.PASCAL_ID_MAPPING
    assert list(p.categories) == ref.PASCAL_CATEGORIES
    # remap matches np.vectorize(dict.get) on realistic labels
    rng = np.random.RandomState(0)
    lab = rng.randint(0, 29, size=(20, 20))
    got = t.convert_labels(lab)
    expected = np.vectorize(ref.CITYSCAPES_19_EVAL_CATEGORIES.get)(lab)
    np.testing.assert_array_equal(got, expected)


def _write_fake_dataset(root, n=3, hw=(40, 60), n_classes_raw=29):
    rng = np.random.RandomState(0)
    img_dir = os.path.join(root, "img_with_margin_0", "train")
    ann_dir = os.path.join(root, "annotations", "train")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    ids = []
    for i in range(n):
        img_id = f"img{i}"
        ids.append(img_id)
        np.save(os.path.join(img_dir, img_id + ".npy"),
                rng.randint(0, 255, size=(*hw, 3)).astype(np.uint8))
        np.save(os.path.join(ann_dir, img_id + ".npy"),
                rng.randint(0, n_classes_raw, size=hw).astype(np.uint8))
    with open(os.path.join(root, "all_images.json"), "w") as f:
        json.dump({"train": ids}, f)
    return ids


def test_segmentation_dataset_getitem(tmp_path):
    root = str(tmp_path)
    _write_fake_dataset(root)
    cfg = DataConfig(class_table="cityscapes", window_size=(33, 33),
                     scales=(0.5, 1.5))
    ds = SegmentationDataset(cfg, "train", data_path=root)
    assert len(ds) == 3
    img, lab = ds[0]
    assert img.shape == (33, 33, 3) and img.dtype == np.float32
    assert lab.shape == (33, 33)
    assert lab.min() >= 0 and lab.max() <= 19
    # eval item: full res, normalized
    img_e, lab_e = ds.get_eval_item(0)
    assert img_e.shape == (40, 60, 3)
    assert lab_e.shape == (40, 60)


def test_superbatch_iterator_shapes(tmp_path):
    root = str(tmp_path)
    _write_fake_dataset(root)
    cfg = DataConfig(class_table="cityscapes", window_size=(33, 33))
    ds = SegmentationDataset(cfg, "train", data_path=root)
    it = superbatch_iterator(ds, iter_size=2, batch_size=2, steps=3)
    loader = BatchLoader(it)
    windows = list(loader)
    assert len(windows) == 3
    img, lab = windows[0]
    assert img.shape == (2, 2, 33, 33, 3)
    assert lab.shape == (2, 2, 33, 33)


def test_unoise_split_is_ordered():
    rng = np.random.RandomState(1)
    images = rng.rand(20, 16, 16).astype(np.float32)
    masks = (rng.rand(20, 16, 16) > 0.7).astype(np.float32)
    boxes = [None if i % 5 == 0 else np.zeros(4) for i in range(20)]
    train, val, test = split_datasets(images, masks, boxes)
    n = 16  # 4 filtered out
    assert len(train) == int(n * 0.8)
    assert len(val) == int(n * 0.9) - int(n * 0.8)
    assert len(test) == n - int(n * 0.9)
    img, mask = train[0]
    assert img.shape == (16, 16, 3)
    assert mask.shape == (16, 16, 1)
    # images kept in order: normalized first positive slice
    first_pos = images[1]
    got = val[0]  # deterministic, no augmentation

    b = list(batches(val, 2))
    assert b[0][0].shape[0] == 2


def test_add_margins_roundtrip():
    from PIL import Image
    rng = np.random.RandomState(2)
    arr = rng.randint(0, 255, size=(10, 12, 3)).astype(np.uint8)
    out = add_margins_to_image(Image.fromarray(arr), 3)
    out_arr = np.asarray(out)
    assert out_arr.shape == (16, 18, 3)
    np.testing.assert_array_equal(out_arr[3:-3, 3:-3], arr)
    # mirrored left margin
    np.testing.assert_array_equal(out_arr[3:-3, 2], arr[:, 0])
    np.testing.assert_array_equal(out_arr[3:-3, 0], arr[:, 2])


def test_generate_image_list(tmp_path):
    root = str(tmp_path)
    ids = _write_fake_dataset(root, n=4)
    os.remove(os.path.join(root, "all_images.json"))
    out = generate_image_list(root)
    assert out["train"] == sorted(ids)
    with open(os.path.join(root, "all_images.json")) as f:
        assert json.load(f) == out


def test_cityscapes_submission_lut_matches_reference_mapping():
    """Golden vs the reference's OUR_ID_2_SOURCE_ID construction
    (reference eval_test.py:52-60)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_constants2", "/root/reference/segmentation/constants.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    mapping = {v: k for k, v in ref.CITYSCAPES_19_EVAL_CATEGORIES.items()}
    mapping[0] = 0
    rev_origin = {v: k for k, v in ref.CITYSCAPES_ID_2_LABEL.items()}
    our2source = {k: rev_origin[ref.CITYSCAPES_CATEGORIES[v]]
                  for k, v in mapping.items()}

    lut = get_class_table("cityscapes").submission_lut(19)
    for pred in range(19):
        assert lut[pred] == our2source[pred + 1], pred


def test_eval_resize_pascal_quirk(tmp_path):
    """eval_resize resizes the INPUT while the label keeps native size
    (reference eval_valid.py:144-152 PASCAL path)."""
    root = str(tmp_path)
    _write_fake_dataset(root)
    cfg = DataConfig(class_table="cityscapes", window_size=(33, 33),
                     eval_resize=(24, 32))
    ds = SegmentationDataset(cfg, "train", data_path=root, is_eval=True)
    img, lab = ds.get_eval_item(0)
    assert img.shape == (24, 32, 3)
    assert lab.shape == (40, 60)  # native label size


def test_convert_images_to_numpy(tmp_path):
    """PNG->npy pass (reference segmentation/img_to_numpy.py:13-29):
    converts every PNG, skips existing npy, returns the count."""
    from PIL import Image
    from adlm_tpu.data.preprocess import convert_images_to_numpy
    rng = np.random.RandomState(4)
    d = tmp_path / "img_with_margin_0" / "test"
    d.mkdir(parents=True)
    arrs = {}
    for name in ("a", "b"):
        arr = rng.randint(0, 255, size=(8, 9, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{name}.png")
        arrs[name] = arr
    # pre-existing npy must not be overwritten
    np.save(d / "a.npy", np.zeros((1,), np.uint8))
    n = convert_images_to_numpy(str(tmp_path))
    assert n == 1
    np.testing.assert_array_equal(np.load(d / "b.npy"), arrs["b"])
    assert np.load(d / "a.npy").shape == (1,)
    # second run: nothing left to convert
    assert convert_images_to_numpy(str(tmp_path)) == 0


def test_eval_batches_with_counts_pads_tail(tmp_path):
    """with_counts=True yields (imgs, labs, n_real); the padded tail is
    zero images + all-void labels and n_real excludes them (the CLI
    slices per-image statistics by n_real)."""
    root = str(tmp_path)
    _write_fake_dataset(root, n=5)
    cfg = DataConfig(class_table="cityscapes", window_size=(33, 33))
    ds = SegmentationDataset(cfg, "train", data_path=root, is_eval=True)
    got = list(ds.eval_batches(2, with_counts=True))
    assert [b[2] for b in got] == [2, 2, 1]
    last_imgs, last_labs, n_real = got[-1]
    assert last_imgs.shape[0] == 2 and last_labs.shape[0] == 2
    np.testing.assert_array_equal(last_imgs[1], 0)
    np.testing.assert_array_equal(last_labs[1], 0)  # all void
    # 2-tuple contract unchanged without the flag
    plain = list(ds.eval_batches(2))
    assert len(plain[0]) == 2


def test_cells_dataset_normalization(tmp_path):
    """cells=True skips the /255 scaling and normalizes with the raw
    pixel-range mean/std (reference configs/cells.gin:
    PatchClassificationDataset.mean=[106.51]*3, std=[7.25]*3)."""
    root = str(tmp_path)
    _write_fake_dataset(root, n=2, hw=(40, 40), n_classes_raw=5)
    cfg = DataConfig(class_table="cells", window_size=(40, 40),
                     cells=True, mean=(106.51,) * 3, std=(7.25,) * 3,
                     scales=(1.0, 1.0))
    ds = SegmentationDataset(cfg, "train", data_path=root, is_eval=True)
    img, lab = ds.get_eval_item(0)
    raw = np.load(os.path.join(root, "img_with_margin_0", "train",
                               ds.img_ids[0] + ".npy")).astype(np.float32)
    np.testing.assert_allclose(img, (raw - 106.51) / 7.25, rtol=1e-5)
    assert lab.max() < 5


def test_preprocess_cityscapes_golden_vs_reference(tmp_path, monkeypatch):
    """End-to-end preprocessor golden: the reference's OWN
    process_images_in_chunks (preprocess_cityscapes.py:45-71) and our
    preprocess_cityscapes run on the same synthetic Cityscapes tree —
    the remapped annotation arrays and mirrored-margin image pixels
    must be identical."""
    import importlib.util
    import sys
    import types

    from PIL import Image
    from adlm_tpu.data.preprocess import preprocess_cityscapes

    # --- synthetic source tree (2 splits × 1 city × 2 images) ---
    src = str(tmp_path / "src")
    rng = np.random.RandomState(3)
    valid_ids = list(range(34))             # CITYSCAPES_ID_2_LABEL keys
    files = {}
    for split in ("train", "val"):
        city = "testcity"
        lab_dir = os.path.join(src, "gtFine_trainvaltest", "gtFine",
                               split, city)
        img_dir = os.path.join(src, "leftImg8bit_trainvaltest",
                               "leftImg8bit", split, city)
        os.makedirs(lab_dir), os.makedirs(img_dir)
        files[split] = []
        for i in range(2):
            img_id = f"{city}_{split}{i}"
            lab = rng.choice(valid_ids, size=(24, 32)).astype(np.uint8)
            Image.fromarray(lab, mode="L").save(
                os.path.join(lab_dir, f"{img_id}_gtFine_labelIds.png"))
            img = rng.randint(0, 256, size=(24, 32, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(img_dir, f"{img_id}_leftImg8bit.png"))
            files[split].append(f"{img_id}_gtFine_labelIds.png")

    # --- the reference's preprocessor, executed from its source ---
    ref_out = str(tmp_path / "ref_out")
    monkeypatch.setenv("SOURCE_DATA_PATH", src)
    monkeypatch.setenv("DATA_PATH", ref_out)
    if "argh" not in sys.modules:           # stub the absent CLI dep
        sys.modules["argh"] = types.ModuleType("argh")
    monkeypatch.syspath_prepend("/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_preproc_cs",
        "/root/reference/segmentation/preprocess_cityscapes.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    margin = 3
    ref.MARGIN_SIZE = margin                 # module global read per-call
    ref.MARGIN_IMG_DIR = os.path.join(ref_out, f"img_with_margin_{margin}")
    for split in ("train", "val"):
        os.makedirs(os.path.join(ref.ANNOTATIONS_DIR, split))
        os.makedirs(os.path.join(ref.MARGIN_IMG_DIR, split))
        got_ids = ref.process_images_in_chunks(
            (split, "testcity", files[split]))
        assert len(got_ids) == 2

    # --- ours ---
    our_out = str(tmp_path / "our_out")
    preprocess_cityscapes(src, our_out, margin=margin, n_jobs=1)

    for split in ("train", "val"):
        for f in files[split]:
            img_id = f.split("_gtFine_labelIds.png")[0]
            a = np.load(os.path.join(ref_out, "annotations", split,
                                     f"{img_id}.npy"))
            b = np.load(os.path.join(our_out, "annotations", split,
                                     f"{img_id}.npy"))
            np.testing.assert_array_equal(a, b)
            assert a.dtype == b.dtype == np.uint8
            ref_img = np.asarray(Image.open(os.path.join(
                ref_out, f"img_with_margin_{margin}", split,
                f"{img_id}.png")))
            our_img = np.asarray(Image.open(os.path.join(
                our_out, f"img_with_margin_{margin}", split,
                f"{img_id}.png")))
            np.testing.assert_array_equal(ref_img, our_img)
            assert ref_img.shape == (24 + 2 * margin, 32 + 2 * margin, 3)
    # ours also writes the npy fast path + the index json
    import json as _json
    with open(os.path.join(our_out, "all_images.json")) as fh:
        idx = _json.load(fh)
    assert sorted(idx["train"]) == sorted(
        f.split("_gtFine_labelIds.png")[0] for f in files["train"])


def test_preprocess_pascal_golden_vs_reference(tmp_path, monkeypatch):
    """PASCAL preprocessor golden vs the reference's own
    process_images_in_chunks (preprocess_pascal.py:26-61): label arrays
    and saved image npy/png content must be identical (our train split
    is the reference's train_aug list, PARITY.md)."""
    import importlib.util
    import sys
    import types

    from PIL import Image
    from adlm_tpu.data.preprocess import preprocess_pascal

    src = str(tmp_path / "src")
    rng = np.random.RandomState(5)
    ids = [f"2007_{i:06d}" for i in range(3)]
    os.makedirs(os.path.join(src, "SegmentationClassAug"))
    os.makedirs(os.path.join(src, "JPEGImages"))
    os.makedirs(os.path.join(src, "ImageSets", "SegmentationAug"))
    for img_id in ids:
        lab = rng.choice(list(range(21)) + [255],
                         size=(20, 28)).astype(np.uint8)
        Image.fromarray(lab, mode="L").save(
            os.path.join(src, "SegmentationClassAug", f"{img_id}.png"))
        img = rng.randint(0, 256, size=(20, 28, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(src, "JPEGImages", f"{img_id}.jpg"))
    with open(os.path.join(src, "ImageSets", "SegmentationAug",
                           "train_aug.txt"), "w") as f:
        f.write("".join(
            f"/JPEGImages/{i}.jpg /SegmentationClassAug/{i}.png\n"
            for i in ids))
    with open(os.path.join(src, "ImageSets", "SegmentationAug",
                           "val.txt"), "w") as f:
        f.write(ids[0] + "\n")

    ref_out = str(tmp_path / "ref_out")
    monkeypatch.setenv("SOURCE_DATA_PATH", src)
    monkeypatch.setenv("DATA_PATH", ref_out)
    if "argh" not in sys.modules:
        sys.modules["argh"] = types.ModuleType("argh")
    spec = importlib.util.spec_from_file_location(
        "ref_preproc_pascal",
        "/root/reference/segmentation/preprocess_pascal.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    os.makedirs(os.path.join(ref.ANNOTATIONS_DIR, "train_aug"))
    os.makedirs(os.path.join(ref.MARGIN_IMG_DIR, "train_aug"))
    got_ids, classes = ref.process_images_in_chunks(("train_aug", ids))
    assert got_ids == ids

    our_out = str(tmp_path / "our_out")
    preprocess_pascal(src, our_out, margin=0)

    for img_id in ids:
        a = np.load(os.path.join(ref_out, "annotations", "train_aug",
                                 f"{img_id}.npy"))
        b = np.load(os.path.join(our_out, "annotations", "train",
                                 f"{img_id}.npy"))
        np.testing.assert_array_equal(a, b)
        ai = np.load(os.path.join(ref_out, "img_with_margin_0",
                                  "train_aug", f"{img_id}.npy"))
        bi = np.load(os.path.join(our_out, "img_with_margin_0",
                                  "train", f"{img_id}.npy"))
        np.testing.assert_array_equal(ai, bi)
        ap = np.asarray(Image.open(os.path.join(
            ref_out, "img_with_margin_0", "train_aug", f"{img_id}.png")))
        bp = np.asarray(Image.open(os.path.join(
            our_out, "img_with_margin_0", "train", f"{img_id}.png")))
        np.testing.assert_array_equal(ap, bp)
