"""vision_instance_seg_tpu — TPU-native instance-segmentation framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Wlsghdh/VISION-Instance-Seg reference stack (Swin/ResNet backbones,
Mask2Former + MaskDINO set-prediction heads, COCO data pipeline,
training/eval/serving surfaces), designed TPU-first:

- compute path: jit-compiled train/eval steps, bf16 matmuls on the MXU,
  Pallas kernels for window attention and multi-scale deformable sampling
- scale path: SPMD over a `jax.sharding.Mesh` (data/model axes) — no
  process-level DDP machinery
- host path: C RLE codec (pycocotools-compatible), double-buffered input
  pipeline, COCO-parity evaluator

Import as ``import vision_instance_seg_tpu as vist``.
"""

__version__ = "0.1.0"

from vision_instance_seg_tpu.config import CfgNode, get_cfg  # noqa: F401

# Persistent XLA compilation cache for every entrypoint that imports the
# package (remote-helper compiles here cost 30 s - 16 min per process;
# reloads are ~ms). Pure config-set, env-gated: VIST_JAX_CACHE=0 opts out.
from vision_instance_seg_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()
