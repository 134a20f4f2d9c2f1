"""Remap category_id 1 -> 0 in a COCO annotations.json (with backup).

Mirrors reference scripts/data_utils/fix_category_ids.py:15-38 — the Cable
dataset stores thunderbolt as category 1 but training uses contiguous id 0
(SURVEY.md §2.2 category-id rules).
"""

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def fix_category_ids(ann_path: str, src_id: int = 1, dst_id: int = 0) -> dict:
    path = Path(ann_path)
    backup = path.with_suffix(path.suffix + ".backup")
    i = 0
    while backup.exists():
        i += 1
        backup = path.with_suffix(path.suffix + f".backup{i}")
    shutil.copy2(path, backup)
    print(f"backup written: {backup}")

    with open(path) as f:
        data = json.load(f)

    n = 0
    for ann in data["annotations"]:
        if ann["category_id"] == src_id:
            ann["category_id"] = dst_id
            n += 1
    for cat in data.get("categories", []):
        if cat["id"] == src_id:
            cat["id"] = dst_id

    with open(path, "w") as f:
        json.dump(data, f, ensure_ascii=False, indent=2)
    print(f"remapped {n} annotations: category {src_id} -> {dst_id}")
    return data


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("annotations", help="path to annotations.json")
    ap.add_argument("--src-id", type=int, default=1)
    ap.add_argument("--dst-id", type=int, default=0)
    a = ap.parse_args()
    fix_category_ids(a.annotations, a.src_id, a.dst_id)
