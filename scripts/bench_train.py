"""Train-step benchmark (BASELINE.md config: Swin-T fine-tune).

Scan-timed ms/step for the fully-jitted train step (forward, Hungarian
matching, point-sampled losses, backward, clip, AdamW) at the train canvas.

Usage: python scripts/bench_train.py [--batch 8] [--image-size 800]
       [--encoder window] [--maskdino]
"""

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=800)
    ap.add_argument("--encoder", default="window")
    ap.add_argument("--maskdino", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--max-instances", type=int, default=20,
                    help="GT pad count; defect images have <= ~10 instances")
    ap.add_argument("--matcher", default="greedy",
                    choices=["greedy", "hungarian", "hungarian_dfs"])
    ap.add_argument("--point-mode", default="grid",
                    choices=["grid", "random"])
    ap.add_argument("--backbone", default="swin", choices=["swin", "resnet"])
    ap.add_argument("--cross", default="dense",
                    choices=["dense", "deformable"],
                    help="MaskDINO decoder cross-attention")
    ap.add_argument("--levels", type=int, default=4,
                    help="MaskDINO encoder scales (4 = reference 4s yaml)")
    ap.add_argument("--reps", type=int, default=REPS,
                    help="in-jit scan repetitions per timed call")
    ap.add_argument("--no-remat-encoder", action="store_true",
                    help="keep encoder-layer activations instead of "
                         "rematerializing (bs4 R-50 encoder activations "
                         "are only ~28 MB/layer)")
    ap.add_argument("opts", nargs="*", default=[],
                    help="trailing KEY VALUE config overrides (bench.py "
                         "style), e.g. TPU.WINDOW_ATTN_NHWC True")
    args = ap.parse_args()
    reps = args.reps

    from vision_instance_seg_tpu.config import get_cfg
    from vision_instance_seg_tpu.engine.solver import make_optimizer
    from vision_instance_seg_tpu.engine.trainer import (TrainState,
                                                        make_train_step)
    from vision_instance_seg_tpu.models import build_model, normalize_image

    cfg = get_cfg()
    cfg.INPUT.IMAGE_SIZE = args.image_size
    cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = args.encoder
    cfg.MODEL.SWIN.USE_CHECKPOINT = True
    cfg.TPU.REMAT_ENCODER = not args.no_remat_encoder
    # rolled scan over the deformable encoder layers: keeps the fwd+bwd
    # Pallas program small enough for the remote compile helper at 4-scale
    cfg.TPU.SCAN_ENC_UNROLL = 1
    cfg.MODEL.MASK_FORMER.MATCHER = args.matcher
    cfg.MODEL.MASK_FORMER.POINT_MODE = args.point_mode
    cfg.INPUT.MAX_INSTANCES = args.max_instances
    cfg.SOLVER.IMS_PER_BATCH = args.batch
    cfg.MODEL.BACKBONE.NAME = args.backbone
    if args.maskdino:
        cfg.MODEL.MASK_DINO.ENABLED = True
        cfg.MODEL.MASK_DINO.CROSS_ATTENTION = args.cross
        # reference trained config is 4-scale (4s_dowsample1)
        cfg.MODEL.SEM_SEG_HEAD.TOTAL_NUM_FEATURE_LEVELS = args.levels
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
    boxes = np.tile(np.array([100, 100, 300, 300], np.float32), (b, m, 1))
    batch = {"image": images,
             "gt_classes": jnp.zeros((b, m), jnp.int32),
             "gt_boxes": jnp.asarray(boxes),       # xyxy canvas pixels
             "gt_masks": jnp.asarray(masks),
             "num_instances": jnp.ones((b,), jnp.int32)}
    step = make_train_step(cfg, model, tx)

    @jax.jit
    def run(state, batch, key):
        def body(carry, i):
            st, tot = carry
            st2, logs = step(st, batch, jax.random.fold_in(key, i))
            return (st2, tot + logs["loss_total"]), None
        (st, tot), _ = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                    jnp.arange(reps))
        return tot

    key = jax.random.key(0)
    t0 = time.perf_counter()
    float(run(state, batch, key))
    compile_s = time.perf_counter() - t0
    float(run(state, batch, key))
    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        float(run(state, batch, key))
        ts.append(time.perf_counter() - t0)
    ms = statistics.median(ts) * 1e3 / reps
    print(json.dumps({
        "metric": "train_step_ms",
        "model": "maskdino" if args.maskdino else "mask2former",
        "encoder": args.encoder, "matcher": args.matcher,
        "point_mode": args.point_mode, "batch": b, "image_size": hw,
        "levels": args.levels if args.maskdino else None,
        "ms_per_step": round(ms, 2),
        "images_per_sec": round(b / (ms / 1e3), 2),
        "compile_s": round(compile_s, 1)}))


if __name__ == "__main__":
    main()
