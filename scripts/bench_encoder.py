"""Microbench: pixel-decoder encoder variants on the real TPU.

Compares SEM_SEG_HEAD.ENCODER_ATTENTION = deformable | full for the
flagship Swin-T Mask2Former at the eval canvas, batch 1 and 4.

Usage: python scripts/bench_encoder.py [--image-size 800] [--iters 5]
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


def bench_one(encoder: str, batch: int, image_hw: int, iters: int) -> dict:
    from vision_instance_seg_tpu.config import get_cfg
    from vision_instance_seg_tpu.models import build_model, normalize_image

    cfg = get_cfg()
    cfg.INPUT.TEST_PAD_H = cfg.INPUT.TEST_PAD_W = image_hw
    cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = encoder
    model = build_model(cfg)

    images = jnp.zeros((batch, image_hw, image_hw, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0),
                                 normalize_image(images[:1], cfg))

    @jax.jit
    def forward(params, images):
        cls_layers, mask_layers = model.apply(
            params, normalize_image(images, cfg), deterministic=True)
        return (jnp.sum(cls_layers[-1].astype(jnp.float32))
                + jnp.sum(mask_layers[-1].astype(jnp.float32)))

    t0 = time.perf_counter()
    float(forward(params, images))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        float(forward(params, images))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(forward(params, images))
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    return {"encoder": encoder, "batch": batch,
            "ms_per_batch": round(dt * 1e3, 2),
            "images_per_sec": round(batch / dt, 2),
            "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=800)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--encoders", default="full,deformable")
    ap.add_argument("--batches", default="1,4")
    args = ap.parse_args()

    for enc in args.encoders.split(","):
        for b in [int(x) for x in args.batches.split(",")]:
            try:
                r = bench_one(enc, b, args.image_size, args.iters)
            except Exception as e:  # keep going; report the failure
                r = {"encoder": enc, "batch": b, "error": repr(e)[:300]}
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
