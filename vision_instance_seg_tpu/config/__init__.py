from vision_instance_seg_tpu.config.core import CfgNode
from vision_instance_seg_tpu.config.defaults import get_cfg

__all__ = ["CfgNode", "get_cfg"]
