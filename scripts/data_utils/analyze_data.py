"""Dataset statistics report (10 sections) for a COCO annotations.json.

Mirrors reference scripts/data_utils/analyze_data.py: image-type
classification by filename prefix (:22-29), counts, annotations/image,
dimensions, bbox stats, segmentation formats, file-existence check
(:163-184), recommendations (:31-228).
"""

import argparse
import json
import os
import sys
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def classify_image_type(file_name: str) -> str:
    """By filename prefix (reference :22-29)."""
    base = os.path.basename(file_name).lower()
    if base.startswith(("gen", "genai")) or "_gen" in base:
        return "gen_ai"
    if "aug" in base:
        return "traditional_aug"
    return "original"


def analyze(ann_path: str, image_dir: str = None) -> dict:
    with open(ann_path) as f:
        data = json.load(f)
    images = data["images"]
    anns = data["annotations"]
    cats = {c["id"]: c["name"] for c in data.get("categories", [])}
    report = {}

    print("=" * 70)
    print(f"DATASET ANALYSIS: {ann_path}")
    print("=" * 70)

    # 1. counts
    report["counts"] = {"images": len(images), "annotations": len(anns),
                        "categories": len(cats)}
    print(f"\n[1] counts: {report['counts']}")

    # 2. image types
    types = Counter(classify_image_type(im["file_name"]) for im in images)
    report["image_types"] = dict(types)
    print(f"[2] image types: {dict(types)}")

    # 3. per-category annotation counts
    per_cat = Counter(cats.get(a["category_id"], a["category_id"])
                      for a in anns)
    report["per_category"] = dict(per_cat)
    print(f"[3] annotations per category: {dict(per_cat)}")

    # 4. annotations per image
    per_img = Counter(a["image_id"] for a in anns)
    n_ann = [per_img.get(im["id"], 0) for im in images]
    report["anns_per_image"] = {
        "mean": float(np.mean(n_ann)) if n_ann else 0,
        "max": int(max(n_ann)) if n_ann else 0,
        "empty_images": int(sum(1 for n in n_ann if n == 0))}
    print(f"[4] anns/image: {report['anns_per_image']}")

    # 5. image dimensions
    dims = Counter((im.get("width"), im.get("height")) for im in images)
    report["dimensions"] = {f"{w}x{h}": n for (w, h), n in
                            dims.most_common(5)}
    print(f"[5] top dimensions: {report['dimensions']}")

    # 6. bbox stats
    if anns:
        wh = np.array([[a["bbox"][2], a["bbox"][3]] for a in anns
                       if a.get("bbox")])
        areas = wh[:, 0] * wh[:, 1]
        report["bbox"] = {
            "mean_w": float(wh[:, 0].mean()), "mean_h": float(wh[:, 1].mean()),
            "min_area": float(areas.min()), "max_area": float(areas.max()),
            "small(<32^2)": int((areas < 1024).sum()),
            "medium": int(((areas >= 1024) & (areas < 9216)).sum()),
            "large(>96^2)": int((areas >= 9216).sum())}
        print(f"[6] bbox: {report['bbox']}")

    # 7. segmentation formats
    fmt = Counter()
    for a in anns:
        seg = a.get("segmentation")
        if not seg:
            fmt["none"] += 1
        elif isinstance(seg, dict):
            fmt["rle"] += 1
        else:
            fmt["polygon"] += 1
    report["segmentation_formats"] = dict(fmt)
    print(f"[7] segmentation formats: {dict(fmt)}")

    # 8. id integrity
    img_ids = [im["id"] for im in images]
    dup_imgs = len(img_ids) - len(set(img_ids))
    orphan = sum(1 for a in anns if a["image_id"] not in set(img_ids))
    report["id_integrity"] = {"duplicate_image_ids": dup_imgs,
                              "orphan_annotations": orphan}
    print(f"[8] id integrity: {report['id_integrity']}")

    # 9. file existence
    if image_dir:
        missing = [im["file_name"] for im in images
                   if not os.path.exists(os.path.join(image_dir,
                                                      im["file_name"]))]
        report["missing_files"] = len(missing)
        print(f"[9] missing files: {len(missing)}")
        for f in missing[:10]:
            print(f"     - {f}")
    else:
        print("[9] file existence: skipped (no --image-dir)")

    # 10. recommendations
    recs = []
    if report["anns_per_image"]["empty_images"]:
        recs.append("remove or annotate empty images")
    if report["id_integrity"]["orphan_annotations"]:
        recs.append("run fix_image_ids.py (orphan annotations)")
    if fmt.get("none"):
        recs.append(f"{fmt['none']} annotations lack segmentation")
    if report.get("missing_files"):
        recs.append("restore missing image files")
    min_ids = {a["category_id"] for a in anns}
    if min_ids and min(min_ids) > 0:
        recs.append("category ids start at "
                    f"{min(min_ids)}; training remaps to 0 "
                    "(fix_category_ids.py)")
    report["recommendations"] = recs
    print("[10] recommendations:")
    for r in recs or ["dataset looks clean"]:
        print(f"     - {r}")
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("annotations", help="path to annotations.json")
    ap.add_argument("--image-dir", default=None)
    a = ap.parse_args()
    analyze(a.annotations, a.image_dir)
