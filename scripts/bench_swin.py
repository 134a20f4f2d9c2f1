"""Swin-T backbone component ablation on the real TPU.

Times the backbone with: (a) identity attention (MLPs/LN/reshapes only),
(b) jnp reference window attention, (c) fused Pallas kernel. The deltas
isolate the attention cost vs everything else.

Usage: python scripts/bench_swin.py [--image-size 800] [--batch 1]
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

REPS = 8


def _time(fn, p, x, iters=5):
    @jax.jit
    def run(p, x):
        def body(carry, _):
            return carry + fn(p, x + carry * 1e-30), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return out

    t0 = time.perf_counter()
    float(run(p, x))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        float(run(p, x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(p, x))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3 / REPS, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=800)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--window-size", type=int, default=0,
                    help="backbone window size (0 = config default; the "
                         "flagship uses 8)")
    args = ap.parse_args()

    from vision_instance_seg_tpu.config import get_cfg
    from vision_instance_seg_tpu.kernels.window_attention import (
        fused_window_attention, fused_window_attention_nhwc)
    from vision_instance_seg_tpu.models import normalize_image
    from vision_instance_seg_tpu.models.meta_arch import build_swin

    hw = args.image_size
    cfg = get_cfg()
    if args.window_size:
        cfg.MODEL.SWIN.WINDOW_SIZE = args.window_size
    x = jnp.zeros((args.batch, hw, hw, 3), jnp.float32)

    def identity_attn(q, k, v, rel_bias, shift_mask, scale, num_windows):
        return v

    from vision_instance_seg_tpu.models.swin import (
        reference_window_attention)

    variants = [("identity_attn", identity_attn),
                ("default_attn", None),     # flagship: transpose-free jnp
                ("pallas_attn", fused_window_attention),
                ("jnp_attn", reference_window_attention)]
    if cfg.MODEL.SWIN.WINDOW_SIZE % 8 == 0:
        # fused NHWC partition+attention+merge kernel (ws multiple of 8)
        variants.append(("nhwc_attn", fused_window_attention_nhwc))
    for name, attn in variants:
        bb = build_swin(cfg, dtype=jnp.bfloat16, attn_fn=attn)
        p = jax.jit(lambda k, xx: bb.init(k, xx, True))(
            jax.random.key(0), normalize_image(x[:1], cfg))

        def fwd(p, xx, bb=bb):
            feats = bb.apply(p, normalize_image(xx, cfg), True)
            return sum(jnp.sum(v.astype(jnp.float32)) for v in feats.values())

        ms, cs = _time(fwd, p, x, iters=args.iters)
        print(json.dumps({"config": name, "ms": round(ms, 2),
                          "compile_s": round(cs, 1),
                          "batch": args.batch}), flush=True)


if __name__ == "__main__":
    main()
