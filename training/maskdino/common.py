"""Shared setup for the maskdino training/eval/vis CLIs.

Factors out what the reference duplicates across train_original.py /
train_full.py / train_experiments.py / evaluate.py (dataset registration
:174-244, config assembly :250-301): register a Cable-defect COCO dataset
under a name, assemble the MaskDINO R-50 4-scale config with the
reference's solver settings, and apply free-form ``opts`` overrides.
"""

import os
import sys
from pathlib import Path
from typing import List, Optional

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from vision_instance_seg_tpu.config import get_cfg
from vision_instance_seg_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from vision_instance_seg_tpu.data.coco import load_coco_json

DEFAULT_DATA_ROOT = os.environ.get("VIST_DATA_ROOT", "./data")


def bootstrap_distributed(dist_url: str | None = None,
                          num_machines: int | None = None,
                          machine_rank: int | None = None) -> int:
    """Start the JAX distributed runtime for multi-host SPMD runs.

    Every training/eval CLI calls this before touching devices — the
    reference ships its dist flags into detectron2's ``launch`` machinery
    (train_experiments.py:241-248); here the same CLI surface
    (--dist-url/--num-machines/--machine-rank) maps onto
    `jax.distributed.initialize` via ``parallel.comm.initialize`` (a no-op
    unless a coordinator is configured by flag or environment, so
    single-host runs are unaffected). Returns the process count.
    """
    from vision_instance_seg_tpu.parallel import comm

    if comm.initialize(dist_url=dist_url, num_machines=num_machines,
                       machine_rank=machine_rank):
        print(f"[dist] initialized: process {comm.process_index()}/"
              f"{comm.process_count()}, {len(__import__('jax').devices())} "
              "global devices")
    return comm.process_count()


def filter_original_only(dataset_dicts: List[dict],
                         n_original: int = 40) -> List[dict]:
    """Keep only the original images 000000.jpg..0000NN.jpg (reference
    train_original.py:174-195 filename whitelist)."""
    keep = {f"{i:06d}.jpg" for i in range(n_original)}
    out = [d for d in dataset_dicts
           if os.path.basename(d["file_name"]) in keep]
    return out


def register_dataset(name: str, ann_file: str, image_root: str,
                     filter_fn=None, thing_classes=("thunderbolt",)):
    """Register (re-register-safe) with category ids remapped to 0
    (reference train_original.py:198-244 forces category_id=0)."""
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)

    def loader():
        dicts = load_coco_json(ann_file, image_root, name)
        if filter_fn is not None:
            dicts = filter_fn(dicts)
        for d in dicts:
            for a in d.get("annotations", []):
                a["category_id"] = 0
        return dicts

    DatasetCatalog.register(name, loader)
    MetadataCatalog.get(name).set(
        thing_classes=list(thing_classes),
        json_file=ann_file, image_root=image_root, evaluator_type="coco")
    return name


def setup_cfg(train_name: Optional[str] = None,
              test_name: Optional[str] = None,
              output_dir: str = "./output/maskdino",
              batch_size: int = 2, lr: float = 1e-4, max_iter: int = 3000,
              amp: bool = True, weights: str = "",
              opts: Optional[list] = None,
              checkpoint_period: Optional[int] = None,
              eval_period: Optional[int] = None,
              num_workers: Optional[int] = None,
              seed: Optional[int] = None,
              config_file: str = ""):
    """MaskDINO R-50 4-scale config matching the reference's overrides
    (train_original.py:250-301, train_experiments.py:48-87)."""
    cfg = get_cfg()
    cfg.MODEL.MASK_DINO.ENABLED = True
    cfg.MODEL.BACKBONE.NAME = "resnet"          # R-50 base yaml
    # MaskDINO base yaml: CLASS_WEIGHT 4.0 (Mask2Former default is 2.0)
    cfg.MODEL.MASK_FORMER.CLASS_WEIGHT = 4.0
    # "4s_dowsample1": 4 encoder scales (res3-5 + one /64 downsample)
    cfg.MODEL.SEM_SEG_HEAD.TOTAL_NUM_FEATURE_LEVELS = 4
    cfg.MODEL.WEIGHTS = weights
    if train_name:
        cfg.DATASETS.TRAIN = [train_name]
    if test_name:
        cfg.DATASETS.TEST = [test_name]
    cfg.SOLVER.IMS_PER_BATCH = batch_size
    cfg.SOLVER.BASE_LR = lr
    cfg.SOLVER.MAX_ITER = max_iter
    cfg.SOLVER.STEPS = [int(max_iter * 0.8), int(max_iter * 0.9)]
    cfg.SOLVER.WARMUP_ITERS = min(200, max(100, max_iter // 20))
    cfg.SOLVER.CHECKPOINT_PERIOD = min(1000, max(500, max_iter // 5))
    cfg.TEST.EVAL_PERIOD = min(1000, max(500, max_iter // 5))
    # grad clip: reference fixes full_model->norm 0.01 (:294-299)
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 0.01
    cfg.SOLVER.AMP.ENABLED = amp
    cfg.TPU.COMPUTE_DTYPE = "bfloat16" if amp else "float32"
    # rematerialize backbone blocks + encoder layers in backward: large
    # canvases (800px) exceed HBM without it at batch >= 4
    cfg.MODEL.SWIN.USE_CHECKPOINT = True
    cfg.TPU.REMAT_ENCODER = True
    # rolled encoder-layer scan in training: the 4-scale fwd+bwd Pallas
    # program OOMs the compile helper when unrolled (docs/PERF.md)
    cfg.TPU.SCAN_ENC_UNROLL = 1
    # TPU-fast criterion. The vectorized Jonker-Volgenant matcher makes
    # exact assignment nearly free (275 vs 260 ms/step greedy, bs4/800px)
    # and is worth +23 AP50 for MaskDINO (docs/PERF.md A/B); grid-point
    # sampling replaces the element-serial random-point gathers (~1.2 s).
    # Parity criterion: `MODEL.MASK_FORMER.POINT_MODE random` in opts.
    cfg.MODEL.MASK_FORMER.MATCHER = "hungarian"
    cfg.MODEL.MASK_FORMER.POINT_MODE = "grid"
    # Ramp the denoising loss 0->1 over the first half of training: at the
    # reference's data scale (26-127 images) dn taxes early query shaping
    # — measured +25 segm AP50 on the 800-step demo (75.7 warmup-400 vs
    # 50.5 dn-always-on, docs/PERF.md). Parity (always-on dn): pass
    # `MODEL.MASK_DINO.DN_WARMUP_STEPS 0` in opts.
    cfg.MODEL.MASK_DINO.DN_WARMUP_STEPS = max_iter // 2
    cfg.OUTPUT_DIR = output_dir
    # explicit CLI periods/seed/workers win over the max_iter-derived
    # defaults (reference train_experiments.py:221-239 CLI surface)
    if checkpoint_period is not None:
        cfg.SOLVER.CHECKPOINT_PERIOD = checkpoint_period
    if eval_period is not None:
        cfg.TEST.EVAL_PERIOD = eval_period
    if num_workers is not None:
        cfg.DATALOADER.NUM_WORKERS = num_workers
    if seed is not None:
        cfg.SEED = seed
    if config_file:
        cfg.merge_from_file(config_file)
    if opts:
        cfg.merge_from_list(list(opts))
    return cfg
