"""Capture a device trace of the flagship forward and print top ops.

Writes a jax.profiler trace, then converts the xplane with
tensorboard_plugin_profile to the framework-op-stats table and prints the
top-N ops by self time. Works on the real TPU (axon) if the PJRT plugin
exports device traces.

Usage: python scripts/profile_infer.py [--image-size 800] [--batch 1] [--top 25]
"""

import argparse
import glob
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=800)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--encoder", default="window")
    ap.add_argument("--model", default="mask2former",
                    choices=["mask2former", "maskdino"])
    ap.add_argument("--backbone", default="swin_t")
    ap.add_argument("--levels", type=int, default=4,
                    help="MaskDINO encoder scales (4 = reference 4s yaml)")
    ap.add_argument("--logdir", default="/tmp/vist_profile")
    ap.add_argument("opts", nargs="*", default=[],
                    help="trailing KEY VALUE config overrides (bench.py "
                         "style), e.g. TPU.WINDOW_ATTN_NHWC True")
    args = ap.parse_args()

    from vision_instance_seg_tpu.config import get_cfg
    from vision_instance_seg_tpu.models import build_model, normalize_image

    cfg = get_cfg()
    cfg.INPUT.TEST_PAD_H = cfg.INPUT.TEST_PAD_W = args.image_size
    cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = args.encoder
    if args.encoder == "window":
        cfg.MODEL.SWIN.WINDOW_SIZE = 8    # flagship default (bench.py)
    if args.backbone == "swin_b":
        cfg.MODEL.SWIN.EMBED_DIM = 128
        cfg.MODEL.SWIN.DEPTHS = [2, 2, 18, 2]
        cfg.MODEL.SWIN.NUM_HEADS = [4, 8, 16, 32]
    elif args.backbone == "r50":
        cfg.MODEL.BACKBONE.NAME = "resnet"
    if args.model == "maskdino":
        cfg.MODEL.MASK_DINO.ENABLED = True
        cfg.MODEL.MASK_DINO.CROSS_ATTENTION = (
            "deformable" if args.encoder == "deformable" else "dense")
        cfg.MODEL.SEM_SEG_HEAD.TOTAL_NUM_FEATURE_LEVELS = args.levels
    if args.opts:
        cfg.merge_from_list(list(args.opts))
    model = build_model(cfg)
    images = jnp.zeros((args.batch, args.image_size, args.image_size, 3),
                       jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0),
                                 normalize_image(images[:1], cfg))

    @jax.jit
    def forward(params, images):
        out = model.apply(params, normalize_image(images, cfg),
                          deterministic=True, aux_masks=False)
        if isinstance(out, dict):        # MaskDINO
            cls_l, mask_l = out["pred_logits"], out["pred_masks"]
        else:
            cls_l, mask_l = out
        return (jnp.sum(cls_l[-1].astype(jnp.float32))
                + jnp.sum(mask_l[-1].astype(jnp.float32)))

    float(forward(params, images))          # compile
    float(forward(params, images))

    jax.profiler.start_trace(args.logdir)
    for _ in range(3):
        float(forward(params, images))
    jax.profiler.stop_trace()

    planes = glob.glob(args.logdir + "/**/*.xplane.pb", recursive=True)
    if not planes:
        print("no xplane captured", file=sys.stderr)
        sys.exit(1)
    plane = max(planes, key=lambda p: Path(p).stat().st_mtime)
    print("xplane:", plane, file=sys.stderr)

    # The tensorboard plugin converter is protobuf-incompatible here; our
    # own raw-varint parser does the top-op table (see xplane_top_ops.py).
    import subprocess
    subprocess.run([sys.executable,
                    str(Path(__file__).parent / "xplane_top_ops.py"),
                    plane, str(args.top)], check=True)


if __name__ == "__main__":
    main()
