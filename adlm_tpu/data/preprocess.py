"""Offline dataset preprocessors.

Converts raw datasets into the framework's npy layout (see
data/dataset.py).  Covers the reference's preprocessing scripts:

* Cityscapes (reference segmentation/preprocess_cityscapes.py:45-158)
* PASCAL VOC 2012 + SegmentationClassAug (preprocess_pascal.py:26-104)
* Medical Decathlon Task07 Pancreas NIfTI → 2-D slices
  (preprocessPancreasScans.py:10-167 — including the fixes for its
  missing ``shutil`` import and the ``generateImageList.py:26`` syntax
  error, which are recorded reference bugs)
* U-Noise slice/bbox arrays (data/prepare_data.py:13-60)

NIfTI volumes load through nibabel when installed, else the
bundled dependency-free reader (data/nifti.py).
"""

from __future__ import annotations

import json
import os
from multiprocessing import Pool
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from adlm_tpu.data.constants import (
    CITYSCAPES_CATEGORIES,
    CITYSCAPES_ID_2_LABEL,
)


def add_margins_to_image(img: Image.Image, margin: int) -> Image.Image:
    """Mirror-pad an image on all sides (reference
    segmentation/utils.py:11-39)."""
    if margin == 0:
        return img
    w, h = img.size
    out = Image.new("RGB", (w + 2 * margin, h + 2 * margin))
    flip_lr = Image.FLIP_LEFT_RIGHT
    flip_tb = Image.FLIP_TOP_BOTTOM
    out.paste(img, (margin, margin))
    out.paste(img.crop((0, 0, margin, h)).transpose(flip_lr), (0, margin))
    out.paste(img.crop((w - margin, 0, w, h)).transpose(flip_lr),
              (w + margin, margin))
    out.paste(img.crop((0, 0, w, margin)).transpose(flip_tb), (margin, 0))
    out.paste(img.crop((0, h - margin, w, h)).transpose(flip_tb),
              (margin, h + margin))
    out.paste(img.crop((0, 0, margin, margin)).transpose(flip_lr)
              .transpose(flip_tb), (0, 0))
    out.paste(img.crop((w - margin, 0, w, margin)).transpose(flip_lr)
              .transpose(flip_tb), (w + margin, 0))
    out.paste(img.crop((0, h - margin, margin, h)).transpose(flip_lr)
              .transpose(flip_tb), (0, h + margin))
    out.paste(img.crop((w - margin, h - margin, w, h)).transpose(flip_lr)
              .transpose(flip_tb), (w + margin, h + margin))
    return out


def _cityscapes_lut() -> np.ndarray:
    cat2id = {c: i for i, c in enumerate(CITYSCAPES_CATEGORIES)}
    lut = np.zeros(256, np.uint8)
    for raw_id, label in CITYSCAPES_ID_2_LABEL.items():
        if raw_id >= 0:
            lut[raw_id] = cat2id[label]
    return lut


def _process_cityscapes_city(args):
    (labels_dir, images_dir, ann_out, img_out, split, city, margin) = args
    lut = _cityscapes_lut()
    city_dir = os.path.join(labels_dir, split, city)
    ids = []
    for fname in sorted(os.listdir(city_dir)):
        if not fname.endswith("_gtFine_labelIds.png"):
            continue
        img_id = fname.split("_gtFine_labelIds.png")[0]
        ids.append(img_id)
        label = np.asarray(Image.open(
            os.path.join(city_dir, fname)).convert("RGB"))[:, :, 0]
        np.save(os.path.join(ann_out, split, f"{img_id}.npy"), lut[label])
        img = Image.open(os.path.join(
            images_dir, split, city, img_id + "_leftImg8bit.png")
        ).convert("RGB")
        img = add_margins_to_image(img, margin)
        img.save(os.path.join(img_out, split, f"{img_id}.png"))
        np.save(os.path.join(img_out, split, f"{img_id}.npy"),
                np.asarray(img, np.uint8))
    return split, ids


def preprocess_cityscapes(source_path: str, target_path: str,
                          margin: int = 0, n_jobs: int = 8) -> None:
    labels_dir = os.path.join(source_path, "gtFine_trainvaltest", "gtFine")
    images_dir = os.path.join(source_path, "leftImg8bit_trainvaltest",
                              "leftImg8bit")
    ann_out = os.path.join(target_path, "annotations")
    img_out = os.path.join(target_path, f"img_with_margin_{margin}")
    jobs = []
    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(ann_out, split), exist_ok=True)
        os.makedirs(os.path.join(img_out, split), exist_ok=True)
        split_dir = os.path.join(labels_dir, split)
        if not os.path.isdir(split_dir):
            continue
        for city in sorted(os.listdir(split_dir)):
            jobs.append((labels_dir, images_dir, ann_out, img_out, split,
                         city, margin))
    all_images: Dict[str, List[str]] = {"train": [], "val": [], "test": []}
    with Pool(n_jobs) as pool:
        for split, ids in pool.imap_unordered(_process_cityscapes_city, jobs):
            all_images[split].extend(ids)
    for split in all_images:
        all_images[split].sort()
    with open(os.path.join(target_path, "all_images.json"), "w") as f:
        json.dump(all_images, f)


def preprocess_cityscapes_obj_masks(source_path: str, target_path: str,
                                    n_jobs: int = 8) -> None:
    """Instance-id variant: per-image binary object masks from
    gtFine instanceIds (reference preprocess_cityscapes.py:74-89,
    131-154).  Instances have ids ≥ 1000 (id = class*1000 + instance);
    saves a uint8 mask stack index per image under obj_masks/<split>."""
    labels_dir = os.path.join(source_path, "gtFine_trainvaltest", "gtFine")
    out_root = os.path.join(target_path, "obj_masks")
    for split in ("train", "val", "test"):
        split_dir = os.path.join(labels_dir, split)
        if not os.path.isdir(split_dir):
            continue
        os.makedirs(os.path.join(out_root, split), exist_ok=True)
        for city in sorted(os.listdir(split_dir)):
            city_dir = os.path.join(split_dir, city)
            for fname in sorted(os.listdir(city_dir)):
                if not fname.endswith("_gtFine_instanceIds.png"):
                    continue
                img_id = fname.split("_gtFine_instanceIds.png")[0]
                inst = np.asarray(Image.open(
                    os.path.join(city_dir, fname)), dtype=np.int32)
                obj_ids = [i for i in np.unique(inst) if i >= 1000]
                masks = np.stack(
                    [(inst == i).astype(np.uint8) for i in obj_ids]
                ) if obj_ids else np.zeros((0, *inst.shape), np.uint8)
                np.savez_compressed(
                    os.path.join(out_root, split, f"{img_id}.npz"),
                    masks=masks,
                    instance_ids=np.asarray(obj_ids, np.int32))


def preprocess_pascal(source_path: str, target_path: str,
                      margin: int = 0) -> None:
    """PASCAL VOC 2012 + SegmentationClassAug → npy layout
    (reference preprocess_pascal.py:26-104)."""
    ann_src = os.path.join(source_path, "SegmentationClassAug")
    img_src = os.path.join(source_path, "JPEGImages")
    split_dir = os.path.join(source_path, "ImageSets", "SegmentationAug")
    ann_out = os.path.join(target_path, "annotations")
    img_out = os.path.join(target_path, f"img_with_margin_{margin}")
    all_images: Dict[str, List[str]] = {}
    for split_file, split in (("train_aug.txt", "train"), ("val.txt", "val")):
        path = os.path.join(split_dir, split_file)
        if not os.path.exists(path):
            continue
        os.makedirs(os.path.join(ann_out, split), exist_ok=True)
        os.makedirs(os.path.join(img_out, split), exist_ok=True)
        ids = []
        with open(path) as f:
            for line in f:
                img_id = os.path.basename(line.split()[0]).split(".")[0]
                ids.append(img_id)
                label = np.asarray(Image.open(
                    os.path.join(ann_src, img_id + ".png")))
                np.save(os.path.join(ann_out, split, f"{img_id}.npy"),
                        label.astype(np.uint8))
                img = Image.open(os.path.join(
                    img_src, img_id + ".jpg")).convert("RGB")
                img = add_margins_to_image(img, margin)
                img.save(os.path.join(img_out, split, f"{img_id}.png"))
                np.save(os.path.join(img_out, split, f"{img_id}.npy"),
                        np.asarray(img, np.uint8))
        all_images[split] = sorted(ids)
    with open(os.path.join(target_path, "all_images.json"), "w") as f:
        json.dump(all_images, f)


def _nifti_fdata(path: str) -> np.ndarray:
    """``nibabel.load(path).get_fdata()`` when nibabel is installed
    (bit-parity with the reference environment), else the bundled
    dependency-free NIfTI-1 reader (adlm_tpu/data/nifti.py)."""
    try:
        import nibabel as nib
    except ImportError:
        from adlm_tpu.data.nifti import load_fdata
        return load_fdata(path)
    return nib.load(path).get_fdata()


def preprocess_pancreas(source_path: str, target_path: str,
                        train_n: int = 63, val_n: int = 26,
                        upsample_to: Tuple[int, int] = (1024, 2048)) -> None:
    """Medical Decathlon Task07 NIfTI → per-slice npy in the ProtoSeg
    layout with a 63/26/11 patient split
    (reference preprocessPancreasScans.py:10-167)."""
    img_dir = os.path.join(source_path, "imagesTr")
    lab_dir = os.path.join(source_path, "labelsTr")
    files = sorted(f for f in os.listdir(img_dir)
                   if f.endswith(".nii.gz") and not f.startswith("."))
    splits = {"train": files[:train_n],
              "val": files[train_n:train_n + val_n],
              "test": files[train_n + val_n:]}
    ann_out = os.path.join(target_path, "annotations")
    img_out = os.path.join(target_path, "img_with_margin_0")
    all_images: Dict[str, List[str]] = {}
    for split, split_files in splits.items():
        os.makedirs(os.path.join(ann_out, split), exist_ok=True)
        os.makedirs(os.path.join(img_out, split), exist_ok=True)
        ids = []
        for fname in split_files:
            vol = _nifti_fdata(os.path.join(img_dir, fname))
            seg = _nifti_fdata(os.path.join(lab_dir, fname))
            vmin, vmax = vol.min(), vol.max()
            vol = (vol - vmin) / (vmax - vmin + 1e-8) * 255.0
            for z in range(vol.shape[2]):
                if not np.any(seg[:, :, z]):
                    continue  # keep only annotated slices
                img_id = f"{fname.split('.')[0]}_slice{z:03d}"
                ids.append(img_id)
                sl = vol[:, :, z].astype(np.float32)
                lab = seg[:, :, z].astype(np.uint8)
                img = Image.fromarray(sl.astype(np.uint8)).resize(
                    (upsample_to[1], upsample_to[0]), Image.BILINEAR)
                lab_img = Image.fromarray(lab).resize(
                    (upsample_to[1], upsample_to[0]), Image.NEAREST)
                rgb = np.stack([np.asarray(img)] * 3, axis=-1)
                np.save(os.path.join(img_out, split, f"{img_id}.npy"), rgb)
                Image.fromarray(rgb).save(
                    os.path.join(img_out, split, f"{img_id}.png"))
                np.save(os.path.join(ann_out, split, f"{img_id}.npy"),
                        np.asarray(lab_img, np.uint8))
        all_images[split] = ids
    with open(os.path.join(target_path, "all_images.json"), "w") as f:
        json.dump(all_images, f)


def generate_image_list(target_path: str) -> Dict[str, List[str]]:
    """Build all_images.json by scanning the npy layout (the reference's
    generateImageList.py is unrunnable — syntax error at line 26)."""
    out: Dict[str, List[str]] = {}
    img_root = None
    for d in os.listdir(target_path):
        if d.startswith("img_with_margin_"):
            img_root = os.path.join(target_path, d)
            break
    if img_root is None:
        raise FileNotFoundError(f"no img_with_margin_* dir in {target_path}")
    for split in sorted(os.listdir(img_root)):
        split_dir = os.path.join(img_root, split)
        if not os.path.isdir(split_dir):
            continue
        out[split] = sorted(f[:-4] for f in os.listdir(split_dir)
                            if f.endswith(".npy"))
    with open(os.path.join(target_path, "all_images.json"), "w") as f:
        json.dump(out, f)
    return out


def prepare_unoise_data(source_path: str, target_path: str,
                        max_slices: int = 5000,
                        downscale: int = 2) -> None:
    """Pancreas volumes → (slices, masks, bboxes) arrays for U-Noise
    (reference data/prepare_data.py:13-60)."""
    img_dir = os.path.join(source_path, "imagesTr")
    lab_dir = os.path.join(source_path, "labelsTr")
    files = sorted(f for f in os.listdir(img_dir)
                   if f.endswith(".nii.gz") and not f.startswith("."))
    images, masks, boxes = [], [], []
    gmin, gmax = np.inf, -np.inf
    for fname in files:
        vol = _nifti_fdata(os.path.join(img_dir, fname))
        gmin = min(gmin, float(vol.min()))
        gmax = max(gmax, float(vol.max()))
    for fname in files:
        if len(images) >= max_slices:
            break
        vol = _nifti_fdata(os.path.join(img_dir, fname))
        seg = _nifti_fdata(os.path.join(lab_dir, fname))
        vol = (vol - gmin) / (gmax - gmin + 1e-8)
        for z in range(vol.shape[2]):
            m = seg[::downscale, ::downscale, z]
            ys, xs = np.nonzero(m)
            if len(ys) == 0:
                continue  # only slices with bounding boxes
            images.append(vol[::downscale, ::downscale, z].astype(np.float32))
            masks.append((m > 0).astype(np.float32))
            boxes.append(np.asarray(
                [ys.min(), ys.max(), xs.min(), xs.max()], np.int32))
            if len(images) >= max_slices:
                break
    os.makedirs(target_path, exist_ok=True)
    np.save(os.path.join(target_path, "images.npy"), np.stack(images))
    np.save(os.path.join(target_path, "masks.npy"), np.stack(masks))
    np.save(os.path.join(target_path, "bounding_boxes.npy"),
            np.stack(boxes))


def convert_images_to_numpy(data_path: str, margin: int = 0,
                            splits: Tuple[str, ...] = ("train", "train_aug",
                                                       "val", "test")) -> int:
    """Standalone PNG→npy pass over existing ``img_with_margin_<m>``
    directories (reference segmentation/img_to_numpy.py:13-29 — numpy
    files load much faster than PNGs).

    The online preprocessors above already write .npy alongside each
    PNG; this covers datasets laid out by other tools (or the
    reference's own preprocessing) where only PNGs exist.  Existing
    .npy files are not overwritten.

    Returns the number of images converted.
    """
    n = 0
    for split in splits:
        img_dir = os.path.join(data_path, f"img_with_margin_{margin}",
                               split)
        if not os.path.isdir(img_dir):
            continue
        for fname in sorted(os.listdir(img_dir)):
            if not fname.endswith(".png"):
                continue
            stem = fname[: -len(".png")]
            out = os.path.join(img_dir, stem + ".npy")
            if os.path.exists(out):
                continue
            with Image.open(os.path.join(img_dir, fname)) as im:
                arr = np.asarray(im.convert("RGB"), np.uint8)
            np.save(out, arr)
            n += 1
    return n
