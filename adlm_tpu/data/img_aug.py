"""Offline image augmentation for the classification datasets (CUB).

The reference uses the Augmentor package to write ~30 augmented copies
per training image: rotate ±15°, skew, shear ±10°, each combined with
random horizontal flips (reference img_aug.py:18-48).  Re-implemented
with PIL affine transforms (Augmentor isn't a dependency here).
"""

from __future__ import annotations

import math
import os
import random
from typing import Optional

from PIL import Image


def _affine(img: Image.Image, kind: str, rng: random.Random) -> Image.Image:
    if kind == "rotate":
        return img.rotate(rng.uniform(-15, 15), resample=Image.BILINEAR)
    if kind == "shear":
        shear = math.tan(math.radians(rng.uniform(-10, 10)))
        return img.transform(img.size, Image.AFFINE,
                             (1, shear, 0, 0, 1, 0),
                             resample=Image.BILINEAR)
    if kind == "skew":
        # mild perspective-like skew via vertical shear
        shear = math.tan(math.radians(rng.uniform(-10, 10)))
        return img.transform(img.size, Image.AFFINE,
                             (1, 0, 0, shear, 1, 0),
                             resample=Image.BILINEAR)
    raise ValueError(kind)


def augment_directory(src_dir: str, dst_dir: str,
                      copies_per_op: int = 10,
                      seed: Optional[int] = 0) -> int:
    """Write rotate/shear/skew (+flip) variants per image per class dir.

    Mirrors the reference's layout: ``src_dir/<class>/<img>`` →
    ``dst_dir/<class>/<img>_<op><i>.jpg``.  Returns count written.
    """
    rng = random.Random(seed)
    n = 0
    for cls in sorted(os.listdir(src_dir)):
        cls_src = os.path.join(src_dir, cls)
        if not os.path.isdir(cls_src):
            continue
        cls_dst = os.path.join(dst_dir, cls)
        os.makedirs(cls_dst, exist_ok=True)
        for fname in sorted(os.listdir(cls_src)):
            if not fname.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            img = Image.open(os.path.join(cls_src, fname)).convert("RGB")
            stem = os.path.splitext(fname)[0]
            for op in ("rotate", "shear", "skew"):
                for i in range(copies_per_op):
                    out = _affine(img, op, rng)
                    if rng.random() < 0.5:
                        out = out.transpose(Image.FLIP_LEFT_RIGHT)
                    out.save(os.path.join(cls_dst,
                                          f"{stem}_{op}{i}.jpg"))
                    n += 1
    return n
