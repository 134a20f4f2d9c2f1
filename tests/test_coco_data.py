import numpy as np

from vision_instance_seg_tpu.config import get_cfg
from vision_instance_seg_tpu.data import DatasetCatalog, MetadataCatalog, load_coco_json
from vision_instance_seg_tpu.data.coco import COCOJson, merge_datasets, renumber_ids
from vision_instance_seg_tpu.data.loader import EvalLoader, TrainLoader


def test_load_coco_json(mini_coco):
    dicts = load_coco_json(mini_coco["ann_file"], mini_coco["image_dir"], "mini_train")
    assert len(dicts) == 6
    meta = MetadataCatalog.get("mini_train")
    assert meta.thing_classes == ["thunderbolt"]
    assert meta.thing_dataset_id_to_contiguous_id == {1: 0}
    d = dicts[0]
    assert set(d) >= {"file_name", "image_id", "height", "width", "annotations"}
    for a in d["annotations"]:
        assert a["category_id"] == 0  # contiguous remap
        assert a["bbox_mode"] == "xywh"


def test_catalog_lazy_registration(mini_coco):
    name = "mini_lazy"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(
        name, lambda: load_coco_json(mini_coco["ann_file"], mini_coco["image_dir"]))
    dd = DatasetCatalog.get(name)
    assert len(dd) == 6


def test_cocojson_queries(mini_coco):
    coco = COCOJson(mini_coco["ann_file"])
    assert coco.getCatIds() == [1]
    img_ids = coco.getImgIds()
    assert len(img_ids) == 6
    ann_ids = coco.getAnnIds(imgIds=[img_ids[0]])
    anns = coco.loadAnns(ann_ids)
    for a in anns:
        m = coco.annToMask(a)
        assert m.shape == (120, 160)
        assert m.sum() > 0


def test_merge_and_renumber(mini_coco):
    ds = mini_coco["dataset"]
    merged = merge_datasets(ds, ds, force_category_id=1)
    assert len(merged["images"]) == 12
    ids = [a["id"] for a in merged["annotations"]]
    assert len(ids) == len(set(ids))
    ren = renumber_ids(merged)
    assert [i["id"] for i in ren["images"]] == list(range(1, 13))


def _mini_cfg():
    cfg = get_cfg()
    cfg.INPUT.IMAGE_SIZE = 128
    cfg.INPUT.TEST_PAD_H = 160
    cfg.INPUT.TEST_PAD_W = 160
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 160
    cfg.INPUT.MAX_INSTANCES = 8
    cfg.SOLVER.IMS_PER_BATCH = 2
    return cfg


def test_train_loader_batches(mini_coco):
    cfg = _mini_cfg()
    dicts = load_coco_json(mini_coco["ann_file"], mini_coco["image_dir"])
    loader = TrainLoader(dicts, cfg)
    b0 = loader.make_batch(0)
    assert b0["image"].shape == (2, 128, 128, 3)
    assert b0["gt_masks"].shape == (2, 8, 128, 128)
    assert b0["gt_classes"].shape == (2, 8)
    # masks and boxes consistent
    for i in range(2):
        n = b0["num_instances"][i]
        assert (b0["gt_classes"][i][:n] >= 0).all()
        assert (b0["gt_classes"][i][n:] == -1).all()
        for j in range(n):
            assert b0["gt_masks"][i, j].sum() > 0
            x0, y0, x1, y1 = b0["gt_boxes"][i, j]
            assert x1 > x0 and y1 > y0
    # determinism
    b0b = loader.make_batch(0)
    np.testing.assert_array_equal(b0["image"], b0b["image"])
    b1 = loader.make_batch(1)
    assert not np.array_equal(b0["image"], b1["image"])


def test_eval_loader_fixed_shapes(mini_coco):
    cfg = _mini_cfg()
    dicts = load_coco_json(mini_coco["ann_file"], mini_coco["image_dir"])
    loader = EvalLoader(dicts, cfg, batch_size=4)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (4, 160, 160, 3)
    assert batches[-1]["__pad__"] == 2
