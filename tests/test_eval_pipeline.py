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


def _register(mini_coco, name):
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(
        name, lambda: load_coco_json(mini_coco["ann_file"],
                                     mini_coco["image_dir"], name))
    return DatasetCatalog.get(name)


def _gt_oracle(dicts, cfg, max_inst, score=0.9, fp_per_image=0,
               fp_score=0.95):
    """Oracle inference fn: GT-echo masks plus optional high-score false
    positives (a square blob in the top-left corner of the canvas)."""
    ch, cw = cfg.INPUT.TEST_PAD_H, cfg.INPUT.TEST_PAD_W
    mh, mw = ch // 4, cw // 4
    n_slots = max_inst + fp_per_image
    state = {"i": 0}

    def infer(params, images):
        bs = images.shape[0]
        chunk = dicts[state["i"]:state["i"] + bs]
        state["i"] += bs
        chunk = chunk + [chunk[-1]] * (bs - len(chunk))
        probs = np.zeros((bs, n_slots, mh, mw), np.float32)
        scores = np.zeros((bs, n_slots), np.float32)
        labels = np.zeros((bs, n_slots), np.int32)
        for b, d in enumerate(chunk):
            oh, ow = d["height"], d["width"]
            vh, vw = resize_shortest_edge_size(
                oh, ow, cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST)
            for k, ann in enumerate(d["annotations"]):
                m = polygons_to_bitmask(ann["segmentation"], oh, ow)
                m = _resize(m, vh, vw)
                canvas = np.zeros((ch, cw), np.float32)
                canvas[:vh, :vw] = m
                probs[b, k] = _resize(canvas, mh, mw)
                scores[b, k] = score
            for f in range(fp_per_image):
                canvas = np.zeros((ch, cw), np.float32)
                canvas[2:14, 2:14] = 1.0
                probs[b, max_inst + f] = _resize(canvas, mh, mw)
                scores[b, max_inst + f] = fp_score
        return {"mask_probs": probs, "scores": scores, "labels": labels}

    return infer


def test_score_threshold_filters_detections(mini_coco, eval_cfg):
    """TEST.SCORE_THRESH must drop detections before RLE/accumulate
    (reference visualize.py threshold semantics): thresholding above every
    oracle score produces the empty-result NaN metrics."""
    dicts = _register(mini_coco, "mini_eval_thresh")
    cfg = eval_cfg
    cfg.TEST.BATCH_SIZE = 2
    max_inst = max(len(d["annotations"]) for d in dicts)
    cfg.TEST.SCORE_THRESH = 0.95
    ev = COCOEvaluator("mini_eval_thresh", cfg)
    res = ev.evaluate(_gt_oracle(dicts, cfg, max_inst, score=0.9), None)
    assert np.isnan(res["segm"]["AP50"])


def test_high_score_false_positives_lower_ap(mini_coco, eval_cfg):
    """Score ordering must flow through ranking: a false positive scored
    ABOVE every true detection caps AP50 strictly below 100."""
    dicts = _register(mini_coco, "mini_eval_fp")
    cfg = eval_cfg
    cfg.TEST.BATCH_SIZE = 2
    max_inst = max(len(d["annotations"]) for d in dicts)
    ev = COCOEvaluator("mini_eval_fp", cfg)
    res = ev.evaluate(
        _gt_oracle(dicts, cfg, max_inst, score=0.9, fp_per_image=1,
                   fp_score=0.99), None)
    assert 10.0 < res["segm"]["AP50"] < 99.9


def test_model_boxes_feed_bbox_task(mini_coco, eval_cfg):
    """When the model returns boxes (MaskDINO), the bbox task must use
    them, not mask-derived boxes: degenerate 1px boxes -> bbox AP50 ~ 0
    while segm AP50 stays perfect."""
    dicts = _register(mini_coco, "mini_eval_boxes")
    cfg = eval_cfg
    cfg.TEST.BATCH_SIZE = 2
    max_inst = max(len(d["annotations"]) for d in dicts)
    base = _gt_oracle(dicts, cfg, max_inst)

    def infer(params, images):
        out = base(params, images)
        bs = images.shape[0]
        boxes = np.tile(np.array([1.0, 1.0, 2.0, 2.0], np.float32),
                        (bs, max_inst, 1))          # degenerate xyxy
        out["boxes"] = boxes
        return out

    ev = COCOEvaluator("mini_eval_boxes", cfg)
    res = ev.evaluate(infer, None)
    assert res["segm"]["AP50"] == pytest.approx(100.0, abs=1e-4)
    assert res["bbox"]["AP50"] < 5.0


def test_eval_loader_process_striding(mini_coco, eval_cfg):
    """Multi-host: per-process EvalLoaders partition the dataset."""
    from vision_instance_seg_tpu.data.loader import EvalLoader

    dicts = _register(mini_coco, "mini_eval_stride")
    cfg = eval_cfg
    parts = []
    for pi in range(2):
        loader = EvalLoader(dicts, cfg, batch_size=1,
                            process_index=pi, process_count=2)
        parts.append([d["image_id"] for d in loader.dicts])
    assert sorted(parts[0] + parts[1]) == sorted(
        d["image_id"] for d in dicts)
    assert not set(parts[0]) & set(parts[1])


def test_correct_normalized_boxes_reach_perfect_bbox_ap(mini_coco, eval_cfg):
    """The box convention round-trips: boxes the model would ideally
    predict (xyxy normalized to the padded canvas, the training-side
    normalization) must come back out of postprocess as the original GT
    boxes -> bbox AP50 = 100."""
    dicts = _register(mini_coco, "mini_eval_goodbox")
    cfg = eval_cfg
    cfg.TEST.BATCH_SIZE = 2
    max_inst = max(len(d["annotations"]) for d in dicts)
    base = _gt_oracle(dicts, cfg, max_inst)
    ch, cw = cfg.INPUT.TEST_PAD_H, cfg.INPUT.TEST_PAD_W
    state = {"i": 0}

    def infer(params, images):
        out = base(params, images)
        bs = images.shape[0]
        chunk = dicts[state["i"]:state["i"] + bs]
        state["i"] += bs
        chunk = chunk + [chunk[-1]] * (bs - len(chunk))
        boxes = np.zeros((bs, max_inst, 4), np.float32)
        for b, d in enumerate(chunk):
            oh, ow = d["height"], d["width"]
            vh, vw = resize_shortest_edge_size(
                oh, ow, cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST)
            for k, ann in enumerate(d["annotations"]):
                x, y, w, h = ann["bbox"]
                boxes[b, k] = [x * (vw / ow) / cw, y * (vh / oh) / ch,
                               (x + w) * (vw / ow) / cw,
                               (y + h) * (vh / oh) / ch]
        out["boxes"] = boxes
        return out

    ev = COCOEvaluator("mini_eval_goodbox", cfg)
    res = ev.evaluate(infer, None)
    assert res["bbox"]["AP50"] == pytest.approx(100.0, abs=1e-4)
    assert res["segm"]["AP50"] == pytest.approx(100.0, abs=1e-4)
