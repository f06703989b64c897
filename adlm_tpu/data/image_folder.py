"""Image-folder dataset for the ProtoPNet classification path.

Equivalent of the torchvision ``ImageFolder`` pipelines the reference
builds (reference main.py:50-105: resize(img_size) + ToTensor
[+ normalize]; augmentation is offline via img_aug.py).  Layout::

    root/<class_name>/*.jpg|png|...

Classes are the sorted subdirectory names (torchvision's convention).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".npy")


class ImageFolderDataset:
    def __init__(self, root: str, img_size: int,
                 normalize: bool = True,
                 mean: Tuple[float, ...] = IMAGENET_MEAN,
                 std: Tuple[float, ...] = IMAGENET_STD):
        self.root = root
        self.img_size = img_size
        self.normalize = normalize
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.classes: List[str] = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))
        if not self.classes:
            raise ValueError(f"no class subdirectories under {root!r}")
        self.samples: List[Tuple[str, int]] = []
        for ci, cname in enumerate(self.classes):
            cdir = os.path.join(root, cname)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(_EXTS):
                    self.samples.append((os.path.join(cdir, fname), ci))
        if not self.samples:
            raise ValueError(f"no images under {root!r}")

    def __len__(self) -> int:
        return len(self.samples)

    def load(self, index: int) -> Tuple[np.ndarray, int]:
        path, label = self.samples[index]
        if path.endswith(".npy"):
            arr = np.load(path)
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            img = Image.fromarray(arr.astype(np.uint8))
        else:
            img = Image.open(path)
        img = img.convert("RGB").resize(
            (self.img_size, self.img_size), resample=Image.BILINEAR)
        x = np.asarray(img, np.float32) / 255.0
        if self.normalize:
            x = (x - self.mean) / self.std
        return x, label

    def batches(self, batch_size: int, shuffle: bool = False,
                seed: int = 0, with_count: bool = False) -> Iterator:
        """(B, S, S, 3) float32 / (B,) int32 batches.  The final partial
        batch wraps around to the start so the jitted train step never
        sees a new batch shape.

        ``with_count=True`` yields ``(images, labels, n_valid)`` triples
        where ``n_valid < batch_size`` marks the wrapped tail batch —
        use it on eval / k-nearest / push paths so duplicated wrap
        images don't double-count (they'd bias test accuracy and could
        double-vote a prototype's k-nearest slots)."""
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        n_batches = -(-len(self) // batch_size)
        for b in range(n_batches):
            idxs = [int(order[(b * batch_size + j) % len(self)])
                    for j in range(batch_size)]
            items = [self.load(i) for i in idxs]
            out = (np.stack([im for im, _ in items]),
                   np.asarray([lb for _, lb in items], np.int32))
            if with_count:
                out = (*out, min(len(self) - b * batch_size, batch_size))
            yield out
