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


def test_fast_postprocess_matches_parity_chain():
    """Single-warp box-restricted fast path vs the detectron2 two-stage
    resize chain: same detections, near-identical masks (sub-pixel
    boundary differences only), and provably-empty instances skipped."""
    from vision_instance_seg_tpu.engine.evaluator import postprocess_instances
    from vision_instance_seg_tpu.data import rle as mask_util
    import jax.numpy as jnp
    from vision_instance_seg_tpu.models.meta_arch import _mask_support_boxes

    rng = np.random.default_rng(0)
    hm = wm = 50                       # 1/4 of a 200px canvas
    k = 5
    probs = np.zeros((k, hm, wm), np.float32)
    # smooth blobs of varying size/position; instance 4 left empty
    yy, xx = np.mgrid[0:hm, 0:wm]
    for i, (cy, cx, r) in enumerate([(12, 15, 6), (30, 35, 10),
                                     (25, 10, 4), (40, 40, 3)]):
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        probs[i] = 1.0 / (1.0 + np.exp((np.sqrt(d2) - r) * 1.5))
    scores = np.linspace(0.9, 0.5, k).astype(np.float32)
    labels = np.zeros(k, np.int64)
    boxes_dev = np.asarray(_mask_support_boxes(jnp.asarray(probs)))

    common = dict(valid_h=180, valid_w=200, canvas_h=200, canvas_w=200,
                  orig_h=230, orig_w=260, image_id=1, category_ids=[1])
    slow = postprocess_instances(probs, scores, labels, fast=False, **common)
    fastr = postprocess_instances(probs, scores, labels, fast=True,
                                  mask_boxes=boxes_dev, **common)
    assert len(slow) == 4              # empty instance skipped in both
    assert len(fastr) == 4
    for s, f in zip(slow, fastr):
        ms = mask_util.decode(dict(s["segmentation"],
                                   counts=s["segmentation"]["counts"]))
        mf = mask_util.decode(dict(f["segmentation"],
                                   counts=f["segmentation"]["counts"]))
        inter = np.logical_and(ms, mf).sum()
        union = np.logical_or(ms, mf).sum()
        assert union > 0
        assert inter / union > 0.97, (s["score"], inter / union)


def test_support_box_contains_final_mask():
    """Any pixel > 0.5 after the parity chain must lie inside the
    device support box footprint (the skip-outside-box guarantee)."""
    from vision_instance_seg_tpu.engine.evaluator import (
        _warp_box_to_frame, postprocess_instances)
    from vision_instance_seg_tpu.data import rle as mask_util
    import jax.numpy as jnp
    from vision_instance_seg_tpu.models.meta_arch import _mask_support_boxes

    rng = np.random.default_rng(3)
    hm = wm = 25
    probs = rng.uniform(0, 0.8, (1, hm, wm)).astype(np.float32)
    scores = np.ones(1, np.float32)
    labels = np.zeros(1, np.int64)
    box = np.asarray(_mask_support_boxes(jnp.asarray(probs)))
    common = dict(valid_h=100, valid_w=100, canvas_h=100, canvas_w=100,
                  orig_h=90, orig_w=110, image_id=1, category_ids=[1])
    slow = postprocess_instances(probs, scores, labels, fast=False, **common)
    fastr = postprocess_instances(probs, scores, labels, fast=True,
                                  mask_boxes=box, **common)
    if slow:
        assert fastr
        ms = mask_util.decode(slow[0]["segmentation"])
        mf = mask_util.decode(fastr[0]["segmentation"])
        # every parity-positive pixel is also fast-positive-or-boundary
        only_slow = np.logical_and(ms, np.logical_not(mf)).sum()
        assert only_slow / max(ms.sum(), 1) < 0.03


def test_inference_fn_sorted_uint8_and_prefix_fetch():
    """make_inference_fn contract the evaluator's prefix-D2H relies on:
    scores sorted descending, mask_probs uint8 (x255 quantized), and
    _fetch_prefix returning exactly the leading rows."""
    import jax
    import jax.numpy as jnp
    from tests.test_models import tiny_cfg
    from vision_instance_seg_tpu.engine.evaluator import _fetch_prefix
    from vision_instance_seg_tpu.models import (build_model,
                                                make_inference_fn,
                                                normalize_image)

    cfg = tiny_cfg()
    model = build_model(cfg)
    x = jax.random.normal(jax.random.key(5), (2, 64, 64, 3)) * 40 + 110
    params = jax.jit(model.init)(jax.random.key(0), normalize_image(x, cfg))
    out = make_inference_fn(model, cfg)(params, x)

    s = np.asarray(out["scores"])
    assert (np.diff(s, axis=-1) <= 1e-6).all(), "scores must be sorted desc"
    assert out["mask_probs"].dtype == jnp.uint8

    # prefix fetch returns the exact leading rows, any need in [0, K]
    full = np.asarray(out["mask_probs"])
    for need in (0, 1, 5, full.shape[1]):
        got = _fetch_prefix(out["mask_probs"], 1, need)
        np.testing.assert_array_equal(got, full[1, :need])

    # batched variant: one slice covering every image's prefix at once
    from vision_instance_seg_tpu.engine.evaluator import (
        _batched_prefix_wins, _fetch_prefix_all)
    for needs in ([3, 7], [0, full.shape[1]], [0, 0]):
        got = _fetch_prefix_all(out["mask_probs"], needs)
        assert len(got) == len(needs)
        for b, n in enumerate(needs):
            np.testing.assert_array_equal(got[b], full[b, :n])
    # tunnel cost model: tiny rows (patches) -> batched always wins;
    # huge rows with one deep prefix -> per-image chunk fetches win
    assert _batched_prefix_wins([1, 1, 1], row_mb=0.004, k=100)
    assert not _batched_prefix_wins([1] * 7 + [100], row_mb=1.0, k=100)

    # TEST.PATCH_POSTPROCESS (default on): per-instance patches emitted,
    # uint8, and exactly equal to zero-padded slices of the quantized map
    assert out["mask_patches"].dtype == jnp.uint8
    p = int(cfg.TEST.PATCH_SIZE)
    assert out["mask_patches"].shape == full.shape[:2] + (p, p)
    origins = np.asarray(out["patch_origin"])
    patches = np.asarray(out["mask_patches"])
    for b in range(full.shape[0]):
        for i in range(full.shape[1]):
            x0p, y0p = origins[b, i]
            want = np.zeros((p, p), np.uint8)
            sl = full[b, i, y0p:y0p + p, x0p:x0p + p]
            want[:sl.shape[0], :sl.shape[1]] = sl
            np.testing.assert_array_equal(patches[b, i], want)


def _blob_probs(specs, hm, wm):
    yy, xx = np.mgrid[0:hm, 0:wm]
    probs = np.zeros((len(specs), hm, wm), np.float32)
    for i, (cy, cx, r) in enumerate(specs):
        if r > 0:
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            probs[i] = 1.0 / (1.0 + np.exp((np.sqrt(d2) - r) * 1.5))
    return probs


def test_patch_postprocess_byte_identical():
    """Device patch extraction + patch-sourced warp vs the full-map fast
    path: RLE results must be byte-identical, including the footprint-
    escape fallback (huge blob) and edge-touching boxes."""
    import jax.numpy as jnp
    from vision_instance_seg_tpu.engine.evaluator import (
        postprocess_instances)
    from vision_instance_seg_tpu.models.meta_arch import (
        _extract_mask_patches, _mask_support_boxes)

    hm = wm = 48
    p = 16
    specs = [(12, 15, 5),      # small, interior -> patch path
             (24, 24, 20),     # huge -> footprint escapes -> fallback
             (2, 2, 4),        # touches top-left edge (clamp equivalence)
             (45, 45, 4),      # touches bottom-right edge
             (0, 0, 0)]        # empty
    probs = _blob_probs(specs, hm, wm)
    u8 = np.round(probs * 255).astype(np.uint8)
    scores = np.linspace(0.9, 0.5, len(specs)).astype(np.float32)
    labels = np.zeros(len(specs), np.int64)
    boxes = np.asarray(_mask_support_boxes(jnp.asarray(probs)))

    origins, patches = map(np.asarray, _extract_mask_patches(
        jnp.asarray(u8[None]), jnp.asarray(boxes[None]), p))
    origins, patches = origins[0], patches[0]
    # extraction golden: patch == zero-padded numpy slice of the map
    for i in range(len(specs)):
        x0p, y0p = origins[i]
        want = np.zeros((p, p), np.uint8)
        sl = u8[i, y0p:y0p + p, x0p:x0p + p]
        want[:sl.shape[0], :sl.shape[1]] = sl
        np.testing.assert_array_equal(patches[i], want, err_msg=f"inst {i}")

    # full canvas valid so the edge-touching blobs survive the valid crop
    common = dict(valid_h=48, valid_w=48, canvas_h=48, canvas_w=48,
                  orig_h=70, orig_w=90, image_id=1, category_ids=[1])
    full = postprocess_instances(u8, scores, labels, fast=True,
                                 mask_boxes=boxes, **common)
    fetched = []
    via_patch = postprocess_instances(
        None, scores, labels, fast=True, mask_boxes=boxes,
        mask_patches=patches, patch_origins=origins, mask_hw=(hm, wm),
        fetch_row=lambda i: (fetched.append(i), u8[i])[1], **common)
    assert len(full) == len(via_patch) == 4
    assert fetched == [1], "only the huge blob should fall back"
    for a, b in zip(full, via_patch):
        assert a["segmentation"] == b["segmentation"]
        assert a["bbox"] == b["bbox"]
        assert a["score"] == b["score"]


def test_patch_postprocess_whole_map():
    """Maps no larger than the patch ride the embedded-whole-map shortcut:
    byte-identical with zero fallbacks."""
    import jax.numpy as jnp
    from vision_instance_seg_tpu.engine.evaluator import (
        postprocess_instances)
    from vision_instance_seg_tpu.models.meta_arch import (
        _extract_mask_patches, _mask_support_boxes)

    hm, wm, p = 12, 10, 16
    probs = _blob_probs([(6, 5, 4), (2, 8, 2)], hm, wm)
    u8 = np.round(probs * 255).astype(np.uint8)
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.zeros(2, np.int64)
    boxes = np.asarray(_mask_support_boxes(jnp.asarray(probs)))
    origins, patches = map(np.asarray, _extract_mask_patches(
        jnp.asarray(u8[None]), jnp.asarray(boxes[None]), p))
    common = dict(valid_h=40, valid_w=44, canvas_h=48, canvas_w=48,
                  orig_h=60, orig_w=66, image_id=1, category_ids=[1])
    full = postprocess_instances(u8, scores, labels, fast=True,
                                 mask_boxes=boxes, **common)
    via_patch = postprocess_instances(
        None, scores, labels, fast=True, mask_boxes=boxes,
        mask_patches=patches[0], patch_origins=origins[0], mask_hw=(hm, wm),
        fetch_row=lambda i: pytest.fail("no fallback expected"), **common)
    assert [r["segmentation"] for r in full] == \
        [r["segmentation"] for r in via_patch]


def test_evaluator_patch_path_matches_full(mini_coco, eval_cfg):
    """COCOEvaluator with a patch-emitting inference fn must produce
    exactly the same metrics as the same fn without patches (the host
    branch: patch prefix fetch, fit checks, fallback row fetches)."""
    import jax.numpy as jnp
    from vision_instance_seg_tpu.models.meta_arch import (
        _extract_mask_patches, _mask_support_boxes)

    dicts = _register(mini_coco, "mini_eval_patch")
    cfg = eval_cfg
    cfg.TEST.BATCH_SIZE = 2
    max_inst = max(len(d["annotations"]) for d in dicts)

    def with_boxes(base, patches):
        def infer(params, images):
            out = base(params, images)
            probs = out["mask_probs"]
            boxes = _mask_support_boxes(jnp.asarray(probs))
            out["mask_boxes"] = np.asarray(boxes)
            u8 = np.round(probs * 255).astype(np.uint8)
            out["mask_probs"] = u8
            if patches:
                # p=8 << GT blob sizes: most instances fall back, a few fit
                o, pt = _extract_mask_patches(jnp.asarray(u8), boxes, 8)
                out["patch_origin"] = np.asarray(o)
                out["mask_patches"] = np.asarray(pt)
            return out
        return infer

    res_plain = COCOEvaluator("mini_eval_patch", cfg).evaluate(
        with_boxes(_gt_oracle(dicts, cfg, max_inst), False), None)
    res_patch = COCOEvaluator("mini_eval_patch", cfg).evaluate(
        with_boxes(_gt_oracle(dicts, cfg, max_inst), True), None)
    for task in ("bbox", "segm"):
        for key, v in res_plain[task].items():
            np.testing.assert_equal(res_patch[task][key], v)  # NaN-aware
    assert res_patch["segm"]["AP50"] == pytest.approx(100.0, abs=1e-4)


def test_evaluator_device_fetch_paths_identical(mini_coco, eval_cfg,
                                                monkeypatch):
    """DEVICE-array outputs through both D2H strategies — async-prefetch
    full fetch (default) and the cost-model batched/per-image slice
    fetches (VIST_EVAL_PREFETCH=0) — must score identically to the
    host-array patch path."""
    import jax.numpy as jnp
    from vision_instance_seg_tpu.models.meta_arch import (
        _extract_mask_patches, _mask_support_boxes)

    dicts = _register(mini_coco, "mini_eval_devfetch")
    cfg = eval_cfg
    cfg.TEST.BATCH_SIZE = 2
    max_inst = max(len(d["annotations"]) for d in dicts)

    def make_infer_device():
        base = _gt_oracle(dicts, cfg, max_inst)   # stateful: one per run

        def infer(params, images):
            out = base(params, images)
            probs = jnp.asarray(out["mask_probs"])
            boxes = _mask_support_boxes(probs)
            u8 = jnp.round(probs * 255).astype(jnp.uint8)
            o, pt = _extract_mask_patches(u8, boxes, 8)
            return {**{k: jnp.asarray(v) for k, v in out.items()
                       if k != "mask_probs"},
                    "mask_probs": u8, "mask_boxes": boxes,
                    "patch_origin": o, "mask_patches": pt}
        return infer

    baseline = COCOEvaluator("mini_eval_devfetch", cfg).evaluate(
        make_infer_device(), None)
    monkeypatch.setenv("VIST_EVAL_PREFETCH", "0")
    cost_model = COCOEvaluator("mini_eval_devfetch", cfg).evaluate(
        make_infer_device(), None)
    for task in ("bbox", "segm"):
        for key, v in baseline[task].items():
            np.testing.assert_equal(cost_model[task][key], v)
    assert baseline["segm"]["AP50"] == pytest.approx(100.0, abs=1e-4)


def test_box_scaling_does_not_clobber_patch_geometry():
    """Regression (r4): the bbox-conversion branch rebound sx/sy INSIDE the
    instance loop, so on the MaskDINO path (boxes present) every instance
    after the first failed _patch_fits with canvas-scale values (~325) and
    fell back to a full-row fetch — 2050 stray fetches per 127-image eval
    and two crashes before the fallback was made total. With patches that
    provably fit, NO instance may invoke fetch_row."""
    import numpy as np
    from vision_instance_seg_tpu.engine.evaluator import (
        postprocess_instances)

    hm = wm = 80
    p = 64
    k = 4
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    labels = np.zeros(k, np.int64)
    patches = np.zeros((k, p, p), np.uint8)
    origins = np.zeros((k, 2), np.int32)
    boxes01 = np.zeros((k, 4), np.float32)
    mask_boxes = np.zeros((k, 4), np.int32)
    for i in range(k):
        # small interior blobs, patches at the map origin: all fit
        mask_boxes[i] = [20 + i, 20, 30 + i, 30]
        patches[i, 20:30, 20 + i:30 + i] = 255
        boxes01[i] = [0.2, 0.2, 0.4, 0.4]

    def boom(i):
        raise AssertionError(
            f"fetch_row called for instance {i} — patch-fit geometry "
            "was clobbered by the box-scaling branch")

    results = postprocess_instances(
        None, scores, labels, 246, 320, 320, 320, 250, 325, 1, [1],
        score_thresh=0.05, boxes=boxes01, mask_boxes=mask_boxes,
        fast=True, mask_patches=patches, patch_origins=origins,
        mask_hw=(hm, wm), fetch_row=boom)
    assert len(results) == k
    for r in results:
        assert r["bbox"][2] > 0 and r["bbox"][3] > 0
