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
    ap.add_argument("--logdir", default="/tmp/vist_profile")
    args = ap.parse_args()

    from vision_instance_seg_tpu.config import get_cfg
    from vision_instance_seg_tpu.models import build_model, normalize_image

    cfg = get_cfg()
    cfg.INPUT.TEST_PAD_H = cfg.INPUT.TEST_PAD_W = args.image_size
    cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = args.encoder
    model = build_model(cfg)
    images = jnp.zeros((args.batch, args.image_size, args.image_size, 3),
                       jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0),
                                 normalize_image(images[:1], cfg))

    @jax.jit
    def forward(params, images):
        cls_l, mask_l = model.apply(params, normalize_image(images, cfg),
                                    deterministic=True)
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

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [plane], "framework_op_stats^", {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode()
    lines = data.splitlines()
    print(lines[0])
    for ln in lines[1:args.top + 1]:
        print(ln)


if __name__ == "__main__":
    main()
