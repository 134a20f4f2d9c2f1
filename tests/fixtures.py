"""Synthetic mini-COCO fixture: a few images with polygon-annotated blobs.

Models the reference's data contract (guide.md:142-162): per-split
``images/`` dir + ``annotations.json`` with polygon segmentations, single
defect class ("thunderbolt", category id 1 like the Cable domain).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np


def _blob_polygon(cx: float, cy: float, r: float, n: int, rng) -> list:
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    radii = r * (0.6 + 0.4 * rng.random(n))
    xs = cx + radii * np.cos(angles)
    ys = cy + radii * np.sin(angles)
    poly = np.stack([xs, ys], axis=1).reshape(-1)
    return [float(f"{v:.2f}") for v in poly]


def make_mini_coco(root: Path, n_images: int = 6, seed: int = 0,
                   height: int = 120, width: int = 160,
                   max_inst: int = 3, radius: tuple = (8, 18)) -> dict:
    from PIL import Image

    from vision_instance_seg_tpu.data.polygons import polygons_to_bitmask

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(str(root), "images")
    os.makedirs(img_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img = (rng.random((height, width, 3)) * 60 + 40).astype(np.uint8)
        n_inst = int(rng.integers(1, max_inst + 1))
        margin = radius[1] + 2
        for _ in range(n_inst):
            cx = float(rng.uniform(margin, width - margin))
            cy = float(rng.uniform(margin, height - margin))
            r = float(rng.uniform(*radius))
            poly = _blob_polygon(cx, cy, r, 12, rng)
            mask = polygons_to_bitmask([poly], height, width)
            img[mask > 0] = (200, 60, 60)
            ys, xs = np.nonzero(mask)
            if ys.size == 0:
                continue
            bbox = [float(xs.min()), float(ys.min()),
                    float(xs.max() - xs.min() + 1), float(ys.max() - ys.min() + 1)]
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": 1,
                "bbox": bbox, "segmentation": [poly],
                "area": float(mask.sum()), "iscrowd": 0,
            })
            ann_id += 1
        fname = f"img_{i:06d}.jpg"
        Image.fromarray(img).save(os.path.join(img_dir, fname), quality=95)
        images.append({"id": i + 1, "file_name": fname,
                       "width": width, "height": height})

    dataset = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "thunderbolt", "supercategory": "thunderbolt"}],
    }
    ann_path = os.path.join(str(root), "annotations.json")
    with open(ann_path, "w") as f:
        json.dump(dataset, f)
    return {"root": str(root), "image_dir": img_dir, "ann_file": ann_path,
            "dataset": dataset}
