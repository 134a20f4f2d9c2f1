import numpy as np

from vision_instance_seg_tpu.data.polygons import (
    bbox_from_mask, mask_to_polygons, polygon_area, polygons_to_bitmask)
from vision_instance_seg_tpu.data.transforms import (
    EvalTransform, TrainTransform, resize_shortest_edge_size)


def test_resize_shortest_edge_semantics():
    assert resize_shortest_edge_size(480, 640, 480, 800) == (480, 640)
    h, w = resize_shortest_edge_size(400, 800, 640, 800)
    assert min(h, w) <= 640 and max(h, w) <= 800
    # cap by max_size preserves aspect
    h, w = resize_shortest_edge_size(100, 1000, 640, 800)
    assert max(h, w) == 800


def test_polygons_to_bitmask_and_back():
    poly = [10, 10, 50, 10, 50, 40, 10, 40]
    m = polygons_to_bitmask([poly], 60, 70)
    assert m.sum() > 0
    bb = bbox_from_mask(m)
    assert abs(bb[0] - 10) <= 1 and abs(bb[1] - 10) <= 1
    polys = mask_to_polygons(m)
    assert len(polys) == 1
    m2 = polygons_to_bitmask(polys, 60, 70)
    inter = (m & m2).sum()
    union = (m | m2).sum()
    assert inter / union > 0.9


def test_polygon_area_shoelace():
    xs = np.array([0.0, 4.0, 4.0, 0.0])
    ys = np.array([0.0, 0.0, 3.0, 3.0])
    assert polygon_area(xs, ys) == 12.0


def _record(h=100, w=140, n=2, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    annos = []
    for k in range(n):
        x0, y0 = 10 + 40 * k, 20
        poly = [x0, y0, x0 + 25, y0, x0 + 25, y0 + 30, x0, y0 + 30]
        annos.append({"category_id": 0, "iscrowd": 0, "segmentation": [poly],
                      "bbox": [x0, y0, 25, 30], "bbox_mode": "xywh"})
    return {"__image__": img, "image_id": 7, "height": h, "width": w,
            "annotations": annos}


def test_train_transform_static_canvas():
    t = TrainTransform(canvas_size=128, min_sizes=[96, 112, 128], max_size=160)
    rng = np.random.default_rng(3)
    for _ in range(5):
        s = t(_record(), rng, max_instances=6)
        assert s.image.shape == (128, 128, 3)
        assert s.gt_masks.shape == (6, 128, 128)
        assert s.num_instances <= 6
        for j in range(s.num_instances):
            x0, y0, x1, y1 = s.gt_boxes[j]
            m = s.gt_masks[j]
            ys, xs = np.nonzero(m)
            assert x0 == xs.min() and y0 == ys.min()
            assert x1 == xs.max() + 1 and y1 == ys.max() + 1


def test_train_transform_no_lsj_multiscale():
    t = TrainTransform(canvas_size=128, min_sizes=[96], max_size=128, lsj=False)
    rng = np.random.default_rng(0)
    s = t(_record(), rng, max_instances=4)
    assert s.valid_h <= 128 and s.valid_w <= 128


def test_eval_transform():
    t = EvalTransform(min_size=128, max_size=160, pad_h=160, pad_w=160)
    s = t(_record())
    assert s.image.shape == (160, 160, 3)
    assert s.orig_h == 100 and s.orig_w == 140
    # image content occupies the valid region only
    assert s.image[:s.valid_h, :s.valid_w].sum() > 0
    assert s.image[s.valid_h:, :].sum() == 0
