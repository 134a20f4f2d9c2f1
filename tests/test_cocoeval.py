"""COCOeval parity tests — hand-computable AP scenarios.

pycocotools is not in this image, so these tests pin the evaluator to
analytically-known AP values of the COCO protocol (101-point interpolation,
IoU thresholds .5:.05:.95) — the same checks pass verbatim against
pycocotools when available.
"""

import numpy as np
import pytest

from vision_instance_seg_tpu.data import rle as mask_util
from vision_instance_seg_tpu.data.coco import COCOJson
from vision_instance_seg_tpu.evaluation.cocoeval import COCOeval


def make_gt(boxes_per_image, h=100, w=100):
    """boxes_per_image: list (per image) of lists of xywh boxes."""
    images, anns = [], []
    aid = 1
    for i, boxes in enumerate(boxes_per_image, start=1):
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "height": h, "width": w})
        for bb in boxes:
            x, y, bw, bh = bb
            mask = np.zeros((h, w), np.uint8)
            mask[int(y):int(y + bh), int(x):int(x + bw)] = 1
            seg = mask_util.encode(np.asfortranarray(mask))
            seg = dict(seg, counts=seg["counts"].decode("ascii"))
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": list(map(float, bb)),
                         "segmentation": seg,
                         "area": float(bw * bh), "iscrowd": 0})
            aid += 1
    return COCOJson(dataset={
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "defect"}]})


def make_dt(gt, dets):
    """dets: list of (image_id, xywh, score). Masks = exact boxes."""
    results = []
    for img_id, bb, score in dets:
        h = gt.imgs[img_id]["height"]
        w = gt.imgs[img_id]["width"]
        x, y, bw, bh = bb
        mask = np.zeros((h, w), np.uint8)
        mask[int(y):int(y + bh), int(x):int(x + bw)] = 1
        seg = mask_util.encode(np.asfortranarray(mask))
        seg = dict(seg, counts=seg["counts"].decode("ascii"))
        results.append({"image_id": img_id, "category_id": 1,
                        "bbox": list(map(float, bb)),
                        "segmentation": seg, "score": float(score)})
    return results


def run_eval(gt, results, iouType):
    dt = gt.loadRes(results)
    ev = COCOeval(gt, dt, iouType=iouType)
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return ev


@pytest.mark.parametrize("task", ["bbox", "segm"])
class TestKnownAPs:
    def test_perfect(self, task):
        gt = make_gt([[(10, 10, 30, 30)], [(40, 40, 20, 20)]])
        res = make_dt(gt, [(1, (10, 10, 30, 30), 0.9),
                           (2, (40, 40, 20, 20), 0.8)])
        ev = run_eval(gt, res, task)
        assert ev.stats[0] == pytest.approx(1.0)
        assert ev.stats[1] == pytest.approx(1.0)   # AP50

    def test_half_recall(self, task):
        """1 of 2 GT found perfectly: AP = 51/101 (101-pt interp)."""
        gt = make_gt([[(10, 10, 30, 30)], [(40, 40, 20, 20)]])
        res = make_dt(gt, [(1, (10, 10, 30, 30), 0.9)])
        ev = run_eval(gt, res, task)
        assert ev.stats[0] == pytest.approx(51 / 101, abs=1e-6)

    def test_false_positive_after_tp(self, task):
        """TP at higher score then FP: precision stays 1 up to recall 1."""
        gt = make_gt([[(10, 10, 30, 30)]])
        res = make_dt(gt, [(1, (10, 10, 30, 30), 0.9),
                           (1, (60, 60, 20, 20), 0.5)])
        ev = run_eval(gt, res, task)
        assert ev.stats[0] == pytest.approx(1.0)

    def test_fp_before_tp(self, task):
        """FP ranked above the TP: precision at full recall is 1/2."""
        gt = make_gt([[(10, 10, 30, 30)]])
        res = make_dt(gt, [(1, (60, 60, 20, 20), 0.9),
                           (1, (10, 10, 30, 30), 0.5)])
        ev = run_eval(gt, res, task)
        assert ev.stats[0] == pytest.approx(0.5)


class TestIoUThresholds:
    def test_partial_overlap_bbox(self):
        """IoU = 0.5625 -> counts at thresholds .50/.55 only -> AP = 2/10."""
        gt = make_gt([[(0, 0, 40, 40)]])
        # shifted box: overlap 30x40 / union (40x40 + 40x40 - 30x40)
        res = make_dt(gt, [(1, (10, 0, 40, 40), 0.9)])
        iou = (30 * 40) / (40 * 40 * 2 - 30 * 40)
        assert iou == pytest.approx(0.6, abs=1e-9)
        ev = run_eval(gt, res, "bbox")
        # matches at t=.5,.55,.6 -> 3 thresholds out of 10
        assert ev.stats[0] == pytest.approx(0.3)
        assert ev.stats[1] == pytest.approx(1.0)    # AP50
        assert ev.stats[2] == pytest.approx(0.0)    # AP75

    def test_area_ranges(self):
        """A 20x20 GT is 'small' (<32^2): APs defined, APl undefined (-1)."""
        gt = make_gt([[(10, 10, 20, 20)]])
        res = make_dt(gt, [(1, (10, 10, 20, 20), 0.9)])
        ev = run_eval(gt, res, "bbox")
        assert ev.stats[3] == pytest.approx(1.0)    # APs
        assert ev.stats[5] == -1.0                  # APl (no large GT)


class TestMetricDict:
    def test_keys(self):
        gt = make_gt([[(10, 10, 30, 30)]])
        res = make_dt(gt, [(1, (10, 10, 30, 30), 0.9)])
        ev = run_eval(gt, res, "segm")
        d = ev.metric_dict()
        assert set(d) == {"AP", "AP50", "AP75", "APs", "APm", "APl"}
        assert d["AP"] == pytest.approx(100.0)


class TestCrowd:
    def test_crowd_gt_ignored(self):
        """Matching a crowd GT doesn't consume it; det is ignored not FP."""
        gt = make_gt([[(10, 10, 30, 30)]])
        gt.anns[1]["iscrowd"] = 1
        gt.dataset["annotations"][0]["iscrowd"] = 1
        res = make_dt(gt, [(1, (10, 10, 30, 30), 0.9)])
        ev = run_eval(gt, res, "bbox")
        # all GT ignored -> no metric defined
        assert ev.stats[0] == -1.0
