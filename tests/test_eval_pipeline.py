"""End-to-end evaluation-pipeline integration test.

Feeds ground-truth-derived masks through the FULL evaluation chain —
EvalLoader (resize/pad) -> postprocess (bilinear up, crop, resize, 0.5
threshold) -> RLE encode -> COCOeval accumulate/summarize — and asserts
near-perfect AP. This is the pipeline the reference runs via detectron2's
``inference_on_dataset`` + ``COCOEvaluator`` (reference
training/maskdino/evaluate.py:120-132); any geometry/indexing bug in the
loader, the mask interpolation chain, the RLE codec, or the evaluator
breaks the expected AP.
"""

import numpy as np
import pytest

from vision_instance_seg_tpu.config import get_cfg
from vision_instance_seg_tpu.data.catalog import (DatasetCatalog,
                                                  MetadataCatalog)
from vision_instance_seg_tpu.data.coco import load_coco_json
from vision_instance_seg_tpu.data.polygons import polygons_to_bitmask
from vision_instance_seg_tpu.data.transforms import resize_shortest_edge_size
from vision_instance_seg_tpu.engine.evaluator import COCOEvaluator


def _resize(arr, out_h, out_w):
    import cv2
    return cv2.resize(arr.astype(np.float32), (out_w, out_h),
                      interpolation=cv2.INTER_LINEAR)


@pytest.fixture()
def eval_cfg():
    cfg = get_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 192
    cfg.INPUT.TEST_PAD_H = cfg.INPUT.TEST_PAD_W = 192
    cfg.TEST.SCORE_THRESH = 0.0
    return cfg


@pytest.mark.parametrize("batch_size", [1, 4])
def test_gt_echo_reaches_perfect_ap50(mini_coco, eval_cfg, batch_size):
    name = "mini_eval_pipeline"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(
        name, lambda: load_coco_json(mini_coco["ann_file"],
                                     mini_coco["image_dir"], name))
    dicts = DatasetCatalog.get(name)
    meta = MetadataCatalog.get(name)
    assert meta.thing_classes == ["thunderbolt"]

    cfg = eval_cfg
    cfg.TEST.BATCH_SIZE = batch_size  # 4 does not divide 6: pads last batch
    ch, cw = cfg.INPUT.TEST_PAD_H, cfg.INPUT.TEST_PAD_W
    mh, mw = ch // 4, cw // 4
    max_inst = max(len(d["annotations"]) for d in dicts)

    # Oracle "model": per image, emit GT masks mapped through the forward
    # geometry (orig -> resized valid region -> padded canvas -> 1/4 res),
    # exactly inverse to the evaluator's postprocess chain.
    state = {"i": 0}

    def oracle_one(d):
        oh, ow = d["height"], d["width"]
        vh, vw = resize_shortest_edge_size(
            oh, ow, cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST)
        probs = np.zeros((max_inst, mh, mw), np.float32)
        scores = np.zeros((max_inst,), np.float32)
        for k, ann in enumerate(d["annotations"]):
            m = polygons_to_bitmask(ann["segmentation"], oh, ow)
            m = _resize(m, vh, vw)
            canvas = np.zeros((ch, cw), np.float32)
            canvas[:vh, :vw] = m
            probs[k] = _resize(canvas, mh, mw)
            scores[k] = 0.9
        return probs, scores

    def oracle_inference(params, images):
        bs = images.shape[0]
        chunk = dicts[state["i"]:state["i"] + bs]
        state["i"] += bs
        chunk = chunk + [chunk[-1]] * (bs - len(chunk))  # loader pads last
        probs = np.zeros((bs, max_inst, mh, mw), np.float32)
        scores = np.zeros((bs, max_inst), np.float32)
        labels = np.zeros((bs, max_inst), np.int32)
        for b, d in enumerate(chunk):
            probs[b], scores[b] = oracle_one(d)
        return {"mask_probs": probs, "scores": scores, "labels": labels}

    evaluator = COCOEvaluator(name, cfg)
    res = evaluator.evaluate(oracle_inference, params=None)

    assert set(res.keys()) == {"bbox", "segm"}
    for task in ("bbox", "segm"):
        assert set(res[task].keys()) == {"AP", "AP50", "AP75",
                                         "APs", "APm", "APl"}
    # GT-echo through two bilinear round trips: IoU stays well above 0.5.
    # Metrics are on the detectron2/pycocotools summary 0-100 scale.
    assert res["segm"]["AP50"] == pytest.approx(100.0, abs=1e-4)
    assert res["segm"]["AP"] > 50.0
    assert res["bbox"]["AP50"] > 90.0
