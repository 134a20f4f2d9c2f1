"""Rewrite a COCO annotations.json so image ids are contiguous from 0.

Mirrors reference scripts/data_utils/fix_image_ids.py: timestamped
``.backup*`` copy before the destructive write (:17-20), contiguous 0-based
image ids with annotations remapped (:26-41).
"""

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def fix_image_ids(ann_path: str) -> dict:
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

    id_map = {}
    for new_id, img in enumerate(sorted(data["images"],
                                        key=lambda x: x["id"])):
        id_map[img["id"]] = new_id
        img["id"] = new_id
    for ann in data["annotations"]:
        ann["image_id"] = id_map[ann["image_id"]]

    with open(path, "w") as f:
        json.dump(data, f, ensure_ascii=False, indent=2)
    print(f"fixed {len(id_map)} image ids -> 0..{len(id_map) - 1}")
    return data


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("annotations", help="path to annotations.json")
    fix_image_ids(ap.parse_args().annotations)
