"""Model zoo: Swin/ResNet backbones, Mask2Former/MaskDINO heads."""

from vision_instance_seg_tpu.models.meta_arch import (  # noqa: F401
    MaskFormer, build_model, instance_inference, make_inference_fn,
    normalize_image)
from vision_instance_seg_tpu.models.resnet import ResNet, build_resnet  # noqa: F401
from vision_instance_seg_tpu.models.swin import (  # noqa: F401
    SWIN_VARIANTS, SwinTransformer, build_swin)
