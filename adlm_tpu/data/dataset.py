"""npy-backed segmentation dataset with reference-parity augmentation.

Disk layout (identical to the reference's preprocessed layout,
reference segmentation/dataset.py:55,72,86):

    DATA_PATH/
      all_images.json                      # {split: [img_id, ...]}
      img_with_margin_<m>/<split>/<id>.npy # HWC uint8 images (+.png for push)
      annotations/<split>/<id>.npy         # HW integer labels

Training augmentation matches reference dataset.py:119-173: class-table
remap, random scale ∈ scales, /255 (unless cells), pad to window with
dataset mean, random crop, random hflip, normalize.  Image resampling
uses PIL bilinear (the reference uses cv2.INTER_LINEAR; equivalent
family, not bit-identical) and label resampling PIL-exact nearest.
"""

from __future__ import annotations

import json
import os
import random
from typing import Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

from adlm_tpu.core.config import DataConfig
from adlm_tpu.data.constants import get_class_table


class SegmentationDataset:
    def __init__(self, cfg: DataConfig, split_key: str,
                 data_path: Optional[str] = None,
                 is_eval: bool = False,
                 push_prototypes: bool = False):
        self.cfg = cfg
        self.split_key = split_key
        self.is_eval = is_eval
        self.push_prototypes = push_prototypes
        self.table = get_class_table(cfg.class_table)
        self.data_path = data_path or os.environ.get("DATA_PATH", "")
        self.img_dir = os.path.join(
            self.data_path, f"img_with_margin_{cfg.image_margin_size}",
            split_key)
        self.annotations_dir = os.path.join(self.data_path, "annotations",
                                            split_key)
        with open(os.path.join(self.data_path, "all_images.json")) as f:
            self.img_ids: List[str] = json.load(f)[split_key]
        self.rng = random.Random()

    def __len__(self) -> int:
        return len(self.img_ids)

    def get_img_path(self, img_id: str) -> str:
        return os.path.join(self.img_dir, img_id + ".npy")

    def _load_raw(self, img_id: str, convert: bool = True,
                  mmap: bool = False) -> Tuple[np.ndarray, np.ndarray]:
        """``convert=False`` keeps the RAW annotation ids (the native
        augment kernel applies the class LUT to the cropped pixels
        only — converting 513² instead of 2M pixels).  ``mmap=True``
        memory-maps the image AND the label so only the sampled crop
        region is ever read (the fused kernel touches just the crop's
        source rows — a full-res Cityscapes label alone is 2 MB that
        the window path would otherwise read per sample)."""
        if mmap:
            image = np.load(self.get_img_path(img_id), mmap_mode="r")
            if image.dtype != np.uint8:
                image = image.astype(np.uint8)
        else:
            image = np.load(self.get_img_path(img_id)).astype(np.uint8)
        label = np.load(os.path.join(self.annotations_dir, img_id + ".npy"),
                        mmap_mode="r" if (mmap and not convert) else None)
        if label.ndim == 3:
            label = label[:, :, 0]
        if convert:
            label = self.table.convert_labels(label)
            # training ids fit uint8 (void 0, class c at c+1, C ≤ 31):
            # ship 4× fewer label bytes to the device — every consumer
            # casts to int32 INSIDE its jit before any arithmetic, so
            # uint8 wraparound can't occur.  Decided from the LUT (not
            # per item) so batch dtypes never vary → no recompiles.
            lut = self.table.convert_lut()
            if lut is None or int(np.max(lut)) <= 255:
                label = label.astype(np.uint8)
            else:
                label = label.astype(np.int32)
        m = self.cfg.image_margin_size
        if m != 0:
            image = image[m:-m, m:-m]
        return image, label

    def get_eval_item(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """Full-resolution normalized image + raw training-id label
        (eval/push path — no augmentation, reference eval_valid.py:136-156).
        With ``eval_resize`` set, the INPUT is resized (PASCAL eval uses
        513x513 inputs) while the label keeps its native size."""
        image, label = self._load_raw(self.img_ids[index])
        img = image.astype(np.float32)
        if not self.cfg.cells:
            img = img / 255.0
        img = (img - np.asarray(self.cfg.mean, np.float32)) / \
            np.asarray(self.cfg.std, np.float32)
        if self.cfg.eval_resize is not None and not self.push_prototypes:
            h, w = self.cfg.eval_resize
            from PIL import Image as PILImage
            chans = [np.asarray(PILImage.fromarray(img[:, :, c]).resize(
                (w, h), resample=PILImage.BILINEAR)) for c in range(3)]
            img = np.stack(chans, axis=-1)
        return img, label

    def get_overlay_item(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """Raw uint8 image + label at the EVAL size, for qualitative
        overlays (reference eval_valid.py:277-298: raw image bilinearly
        resized to the eval shape, label nearest-resized)."""
        image, label = self._load_raw(self.img_ids[index])
        if self.cfg.eval_resize is not None and not self.push_prototypes:
            h, w = self.cfg.eval_resize
            chans = [np.asarray(Image.fromarray(
                image[:, :, c].astype(np.float32)).resize(
                (w, h), resample=Image.BILINEAR)) for c in range(3)]
            image = np.clip(np.stack(chans, axis=-1), 0, 255).astype(
                np.uint8)
            label = np.asarray(Image.fromarray(
                label.astype(np.int32), mode="I").resize(
                (w, h), resample=Image.NEAREST), dtype=np.int32)
        return image, label

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        return self._augment(index, self.rng)

    def get_train_item(self, index: int,
                       sample_seed: Optional[int] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Augmented item with a PER-SAMPLE rng derived from
        ``sample_seed``: the augmentation stream becomes a pure function
        of (seed, global sample counter) — deterministic regardless of
        loader thread scheduling and exactly resumable from any window
        (the shared-``self.rng`` path draws in thread-completion order,
        which is neither).  ``None`` falls back to the shared rng."""
        rng = random.Random(sample_seed) if sample_seed is not None \
            else self.rng
        return self._augment(index, rng)

    def _augment(self, index: int, rng: random.Random
                 ) -> Tuple[np.ndarray, np.ndarray]:
        # native fast path: one C call for the whole transform chain,
        # raw (unconverted) labels + mmap'd image so work scales with
        # the WINDOW, not the source image
        from adlm_tpu import native
        use_native = native.available()
        image, label = self._load_raw(self.img_ids[index],
                                      convert=not use_native,
                                      mmap=use_native)
        h, w = label.shape[:2]

        # random scale jitter (reference dataset.py:120-128)
        if len(self.cfg.scales) >= 2 and not self.is_eval:
            s = rng.uniform(self.cfg.scales[0], self.cfg.scales[1])
        else:
            s = 1.0

        if use_native:
            wh, ww = self.cfg.window_size
            nh, nw = int(h * s), int(w * s)
            max_sh = max(nh, wh) - wh
            max_sw = max(nw, ww) - ww
            start = (rng.randint(0, max_sh) if max_sh > 0 else 0,
                     rng.randint(0, max_sw) if max_sw > 0 else 0)
            flip = (not self.is_eval) and rng.random() < 0.5
            return native.augment_sample(
                image, label, s, (wh, ww), start, flip,
                self.cfg.mean, self.cfg.std, cells=self.cfg.cells,
                normalize=not self.push_prototypes,
                label_lut=self.table.convert_lut())
        nh, nw = int(h * s), int(w * s)
        if (nh, nw) != (h, w):
            image = np.asarray(Image.fromarray(image).resize(
                (nw, nh), resample=Image.BILINEAR))
            label = np.asarray(Image.fromarray(label.astype(np.int32),
                                               mode="I").resize(
                (nw, nh), resample=Image.NEAREST), dtype=np.int64)
        label = label.astype(np.int64)

        img = image.astype(np.float32)
        if not self.cfg.cells:
            img = img / 255.0

        # pad to window with dataset mean (reference dataset.py:137-149)
        wh, ww = self.cfg.window_size
        pad_h = max(wh - label.shape[0], 0)
        pad_w = max(ww - label.shape[1], 0)
        if pad_h or pad_w:
            img = np.stack([
                np.pad(img[:, :, c], ((0, pad_h), (0, pad_w)),
                       constant_values=self.cfg.mean[c])
                for c in range(img.shape[2])], axis=-1)
            label = np.pad(label, ((0, pad_h), (0, pad_w)),
                           constant_values=0)

        # random crop (reference dataset.py:151-158) — draws from the
        # PER-SAMPLE rng (same as the native path) so the stream stays
        # a pure function of (seed, sample counter) without the C lib
        h, w = label.shape
        sh = rng.randint(0, h - wh) if h > wh else 0
        sw = rng.randint(0, w - ww) if w > ww else 0
        img = img[sh:sh + wh, sw:sw + ww]
        label = label[sh:sh + wh, sw:sw + ww]

        # random hflip (reference dataset.py:160-163)
        if not self.is_eval and rng.random() < 0.5:
            img = img[:, ::-1].copy()
            label = label[:, ::-1].copy()

        # normalize (reference dataset.py:77-79; push skips it)
        if not self.push_prototypes:
            img = (img - np.asarray(self.cfg.mean, np.float32)) / \
                np.asarray(self.cfg.std, np.float32)
        return img.astype(np.float32), label

    def supports_raw_eval(self) -> bool:
        """True when eval items can ship as RAW uint8 with normalization
        done on device (``make_inference_fn(normalize=...)``): no
        eval-time input resize (which the reference applies AFTER
        normalization) and /255 scaling in effect.  (u8→f32)/255 − mean
        then /std on device is the same f32 op sequence as the host
        path (equal to fp-ulp level; the integer eval metrics came out
        bit-identical on both CPU and TPU) — while the host→device
        transfer and the input device buffer shrink 4× (the remote
        relay wedges on ≳400 MB buffers; batch-16 full-res f32 inputs
        are 402 MB, uint8 are 100).  Push items are normalized exactly
        like eval items (the reference's push applies ToTensor+Normalize
        itself, segmentation/push.py:187) but skip the eval resize, so
        they qualify whenever /255 scaling applies."""
        return ((self.push_prototypes or self.cfg.eval_resize is None)
                and not self.cfg.cells)

    def get_eval_item_raw(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """(H, W, 3) uint8 image + raw training-id label, for the
        device-side-normalization eval path (supports_raw_eval)."""
        image, label = self._load_raw(self.img_ids[index])
        return np.ascontiguousarray(image, np.uint8), label

    def eval_items(self, raw: bool = False
                   ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        get = self.get_eval_item_raw if raw else self.get_eval_item
        for i in range(len(self)):
            img, lab = get(i)
            yield img[None], lab[None]

    def eval_batches(self, batch_size: int, pad_final: bool = True,
                     with_counts: bool = False, raw: bool = False
                     ) -> Iterator[Tuple[np.ndarray, ...]]:
        """Full-res eval batches; flushes early when image shapes differ
        (Cityscapes is uniform; PASCAL varies per image).

        ``pad_final`` pads partial batches with zero images and all-void
        labels (which contribute nothing to valid/I/U metrics), so the
        jitted eval fn never sees a new batch shape — a fresh shape
        costs a multi-minute remote compile (see CLAUDE.md).

        ``with_counts`` yields (images, labels, n_real) triples — the
        padded tail images MUST be excluded from statistics that don't
        go through the void-label mask (e.g. nearest-prototype counts).
        """
        imgs: list = []
        labs: list = []

        def flush():
            n_real = len(imgs)
            if pad_final:
                while len(imgs) < batch_size:
                    imgs.append(np.zeros_like(imgs[0]))
                    labs.append(np.zeros_like(labs[0]))
            out = np.stack(imgs), np.stack(labs)
            imgs.clear()
            labs.clear()
            if with_counts:
                return out + (n_real,)
            return out

        get = self.get_eval_item_raw if raw else self.get_eval_item
        for i in range(len(self)):
            img, lab = get(i)
            if imgs and img.shape != imgs[0].shape:
                yield flush()
            imgs.append(img)
            labs.append(lab)
            if len(imgs) == batch_size:
                yield flush()
        if imgs:
            yield flush()
