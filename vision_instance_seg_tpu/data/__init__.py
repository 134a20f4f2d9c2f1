from vision_instance_seg_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from vision_instance_seg_tpu.data.coco import load_coco_json, save_coco_json

__all__ = ["DatasetCatalog", "MetadataCatalog", "load_coco_json", "save_coco_json"]
