"""Capture a device trace of one train step and print top ops.

Usage: python scripts/profile_train.py [--batch 4] [--image-size 800]
Then:  python scripts/xplane_top_ops.py <printed xplane path> 40
"""

import argparse
import glob
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--image-size", type=int, default=800)
    ap.add_argument("--encoder", default="window")
    ap.add_argument("--max-instances", type=int, default=20)
    ap.add_argument("--matcher", default="greedy")
    ap.add_argument("--point-mode", default="grid")
    ap.add_argument("--logdir", default="/tmp/vist_profile_train")
    ap.add_argument("--maskdino", action="store_true")
    ap.add_argument("--cross", default="dense",
                    choices=["dense", "deformable"])
    ap.add_argument("--backbone", default="swin",
                    choices=["swin", "resnet"])
    ap.add_argument("--levels", type=int, default=0,
                    help="encoder scales (0 = config default)")
    ap.add_argument("opts", nargs="*", default=[],
                    help="trailing KEY VALUE config overrides (bench.py "
                         "style), e.g. TPU.WINDOW_ATTN_NHWC True")
    args = ap.parse_args()

    from vision_instance_seg_tpu.config import get_cfg
    from vision_instance_seg_tpu.engine.solver import make_optimizer
    from vision_instance_seg_tpu.engine.trainer import (TrainState,
                                                        make_train_step)
    from vision_instance_seg_tpu.models import build_model, normalize_image

    cfg = get_cfg()
    cfg.INPUT.IMAGE_SIZE = args.image_size
    cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = args.encoder
    cfg.MODEL.SWIN.USE_CHECKPOINT = True
    cfg.TPU.REMAT_ENCODER = True
    cfg.MODEL.MASK_FORMER.MATCHER = args.matcher
    cfg.MODEL.MASK_FORMER.POINT_MODE = args.point_mode
    cfg.INPUT.MAX_INSTANCES = args.max_instances
    cfg.SOLVER.IMS_PER_BATCH = args.batch
    if args.backbone == "resnet":
        cfg.MODEL.BACKBONE.NAME = "resnet"
    if args.maskdino:
        cfg.MODEL.MASK_DINO.ENABLED = True
        cfg.MODEL.MASK_DINO.CROSS_ATTENTION = args.cross
    if args.levels:
        cfg.MODEL.SEM_SEG_HEAD.TOTAL_NUM_FEATURE_LEVELS = args.levels
    # match bench_train / the training CLIs: rolled encoder scan keeps the
    # 4-scale fwd+bwd Pallas program within the compile helper's memory
    cfg.TPU.SCAN_ENC_UNROLL = 1
    if args.opts:
        cfg.merge_from_list(list(args.opts))
    model = build_model(cfg)

    b, hw, m = args.batch, args.image_size, int(cfg.INPUT.MAX_INSTANCES)
    images = jnp.zeros((b, hw, hw, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0),
                                 normalize_image(images[:1], cfg))
    tx = make_optimizer(cfg, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    masks = np.zeros((b, m, hw, hw), np.uint8)
    masks[:, 0, 100:300, 100:300] = 1
    boxes = np.zeros((b, m, 4), np.float32)
    boxes[:, 0] = [100.0, 100.0, 300.0, 300.0]
    batch = {"image": images,
             "gt_classes": jnp.zeros((b, m), jnp.int32),
             "gt_masks": jnp.asarray(masks),
             "gt_boxes": jnp.asarray(boxes),
             "num_instances": jnp.ones((b,), jnp.int32)}
    step = make_train_step(cfg, model, tx)   # already jitted + donated

    key = jax.random.key(0)
    t0 = time.perf_counter()
    state, logs = step(state, batch, key)
    print("compile+run1:", round(time.perf_counter() - t0, 1), "s",
          "loss:", float(logs["loss_total"]), file=sys.stderr)
    t0 = time.perf_counter()
    state, logs = step(state, batch, key)
    print("run2:", round(float(logs["loss_total"]), 3),
          round(time.perf_counter() - t0, 2), "s", file=sys.stderr)

    jax.profiler.start_trace(args.logdir)
    for _ in range(2):
        state, logs = step(state, batch, key)
        _ = float(logs["loss_total"])
    jax.profiler.stop_trace()

    planes = glob.glob(args.logdir + "/**/*.xplane.pb", recursive=True)
    print(max(planes, key=lambda p: Path(p).stat().st_mtime))


if __name__ == "__main__":
    main()
