"""Labeling-server AI-segmentation batch-1 latency (BASELINE.md config).

End-to-end: save a checkpoint (orbax), load it through
``AISegmentationModel`` (the module behind POST /ai/segment), then time
``predict`` on a crop — covers preprocess, the 512px batch-1 TPU forward,
and the mask postprocess, i.e. what an annotator waits for per click.

Usage: python scripts/bench_labeling.py [--iters 10]
"""

import argparse
import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from labeling_server.ai_segmentation import AISegmentationModel
    from vision_instance_seg_tpu.config import get_cfg
    from vision_instance_seg_tpu.engine.checkpoint import save_checkpoint
    from vision_instance_seg_tpu.engine.trainer import create_train_state
    from vision_instance_seg_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.MASK_DINO.ENABLED = True
    cfg.MODEL.BACKBONE.NAME = "resnet"
    cfg.MODEL.MASK_DINO.CROSS_ATTENTION = "dense"
    cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = "window"
    cfg.INPUT.TEST_PAD_H = cfg.INPUT.TEST_PAD_W = 512

    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.key(0),
                               {"image": jnp.zeros((1, 512, 512, 3))})
    ckpt_dir = tempfile.mkdtemp(prefix="vist_ckpt_")
    ckpt_path = save_checkpoint(ckpt_dir, state, 0)

    seg = AISegmentationModel(checkpoint=ckpt_path, cfg=cfg.clone(),
                              score_thresh=0.0)

    rng = np.random.default_rng(0)
    crop = rng.integers(0, 255, (300, 400, 3)).astype(np.uint8)
    seg.predict(crop)                     # compile
    seg.predict(crop)
    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        mask, score = seg.predict(crop)
        ts.append(time.perf_counter() - t0)
    ms = statistics.median(ts) * 1e3
    print(json.dumps({
        "metric": "labeling_ai_segment_batch1_latency_ms",
        "value": round(ms, 2), "unit": "ms",
        "detail": {"backend": jax.default_backend(), "canvas": 512,
                   "model": "maskdino_r50_dense",
                   "mask_nonzero": int(mask.sum()) if mask is not None else 0,
                   "score": round(float(score), 4)}}))


if __name__ == "__main__":
    main()
