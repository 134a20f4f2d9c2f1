"""Traditional (geometric/photometric) augmentation CLI.

Mirrors reference scripts/augmentation/traditional_augment.py: the same op
pipeline/probabilities (:47-64, via data/augment.py — albumentations is not
in this image), per-annotation polygon->mask (:70-77), joint image+masks
augmentation (:139-150), mask->polygon with largest contour + eps
0.005*arcLength (:80-95), bbox-from-mask (:98-105), area = bbox w*h
(:169 — a reference approximation, preserved), category keep-filter
``CATEGORY_CONFIG`` (:31-35), balanced per-image quota (:237-261), 5x retry
budget (:264), seeded random+numpy (:198-199), fresh-id COCO JSON output
(:273-319). CLI: ``--category --n_augment --seed`` (:331-350).
"""

import argparse
import json
import os
import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from vision_instance_seg_tpu.data.augment import TraditionalAugmenter
from vision_instance_seg_tpu.data.polygons import (
    bbox_from_mask, mask_to_polygons, polygons_to_bitmask)

# category -> category_ids to keep (reference :31-35; note Screw uses 0)
CATEGORY_CONFIG = {
    "Cable": {"keep_ids": [1]},
    "Screw": {"keep_ids": [0]},
    "Casting": {"keep_ids": [0, 1]},
}


def augment_single(image, anns, augmenter, rng):
    """One augmentation attempt -> (aug image, new anns) or None."""
    h, w = image.shape[:2]
    masks = []
    for a in anns:
        seg = a["segmentation"]
        if not seg:
            return None
        masks.append(polygons_to_bitmask(seg, h, w))
    aug_img, aug_masks = augmenter(image, masks, rng)
    new_anns = []
    for a, m in zip(anns, aug_masks):
        polys = mask_to_polygons(m)
        bbox = bbox_from_mask(m)
        if not polys or bbox is None:
            continue  # instance fully lost by the transform
        new_anns.append({
            "category_id": a["category_id"],
            "segmentation": polys,
            "bbox": bbox,
            "area": float(bbox[2] * bbox[3]),  # reference approximation :169
            "iscrowd": 0,
        })
    if not new_anns:
        return None
    return aug_img, new_anns


def run_augmentation(category: str, n_augment: int, seed: int,
                     data_root: str, out_dir: str = None):
    random.seed(seed)
    np.random.seed(seed)
    rng = np.random.default_rng(seed)

    src_dir = Path(data_root) / category / "train"
    out = Path(out_dir) if out_dir else (
        Path(data_root).parent / "data_augmented" / category
        / "traditional_aug")
    img_out = out / "images"
    img_out.mkdir(parents=True, exist_ok=True)

    with open(src_dir / "annotations.json") as f:
        src = json.load(f)
    keep_ids = set(CATEGORY_CONFIG[category]["keep_ids"])
    by_image = {}
    for a in src["annotations"]:
        if a["category_id"] in keep_ids:
            by_image.setdefault(a["image_id"], []).append(a)
    images = [im for im in src["images"] if im["id"] in by_image]
    if not images:
        sys.exit(f"no annotated images for category {category}")

    # balanced per-image quota (reference :237-261)
    n_base, n_extra = divmod(n_augment, len(images))
    order = list(range(len(images)))
    rng.shuffle(order)
    quotas = [n_base + (1 if i < n_extra else 0) for i in range(len(images))]

    import cv2

    augmenter = TraditionalAugmenter()
    new_images, new_anns = [], []
    img_id = ann_id = 1
    total = 0
    for slot, img_idx in enumerate(order):
        im = images[img_idx]
        quota = quotas[slot]
        if quota == 0:
            continue
        path = src_dir / "images" / im["file_name"]
        bgr = cv2.imread(str(path))
        if bgr is None:
            print(f"  cannot read {path}; skipping")
            continue
        image = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        generated = attempts = 0
        while generated < quota and attempts < 5 * quota:  # retry budget
            attempts += 1
            result = augment_single(image, by_image[im["id"]], augmenter, rng)
            if result is None:
                continue
            aug_img, anns = result
            stem = Path(im["file_name"]).stem
            fname = f"{stem}_aug{generated:03d}.jpg"
            cv2.imwrite(str(img_out / fname),
                        cv2.cvtColor(aug_img, cv2.COLOR_RGB2BGR),
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
            new_images.append({"id": img_id, "file_name": fname,
                               "width": aug_img.shape[1],
                               "height": aug_img.shape[0]})
            for a in anns:
                new_anns.append({"id": ann_id, "image_id": img_id, **a})
                ann_id += 1
            img_id += 1
            generated += 1
            total += 1
        print(f"  {im['file_name']}: {generated}/{quota} "
              f"({attempts} attempts)")

    with open(out / "annotations.json", "w") as f:
        json.dump({
            "images": new_images, "annotations": new_anns,
            "categories": [c for c in src["categories"]
                           if c["id"] in keep_ids],
        }, f, ensure_ascii=False, indent=2)
    print(f"wrote {total} augmented images -> {out}")
    return total


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--category", required=True,
                    choices=list(CATEGORY_CONFIG))
    ap.add_argument("--n_augment", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--data-root",
                    default=os.environ.get("VIST_DATA_ROOT", "./data"))
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()
    run_augmentation(args.category, args.n_augment, args.seed,
                     args.data_root, args.out_dir)
