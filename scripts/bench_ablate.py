"""Ablation timings: where does inference time go on the real TPU?

Times (at the eval canvas): backbone only; backbone+pixel-decoder with
0 encoder layers; full model with N full-attention / deformable encoder
layers. One compile per config — expect minutes of compile time total.

Usage: python scripts/bench_ablate.py [--image-size 800] [--batch 1]
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


REPS = 8  # in-jit repetitions: amortizes the per-dispatch tunnel overhead


def _scan_fn(fn):
    """fn(params, images) -> scalar  =>  jitted K-rep loop. The carry feeds
    back into the input (x + carry*1e-30) so XLA cannot hoist the model call
    out of the loop."""
    @jax.jit
    def run(params, images):
        def body(carry, _):
            return carry + fn(params, images + carry * 1e-30), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return out
    return run


def _time(fn, *args, iters=5):
    run = _scan_fn(fn)
    t0 = time.perf_counter()
    float(run(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        float(run(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3 / REPS, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=800)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--configs", default="backbone,enc0,window6")
    args = ap.parse_args()
    sel = set(args.configs.split(","))

    from vision_instance_seg_tpu.config import get_cfg
    from vision_instance_seg_tpu.models import build_model, normalize_image
    from vision_instance_seg_tpu.models.meta_arch import build_swin
    from vision_instance_seg_tpu.kernels.window_attention import (
        fused_window_attention)

    hw = args.image_size
    images = jnp.zeros((args.batch, hw, hw, 3), jnp.float32)

    def report(name, ms, compile_s):
        print(json.dumps({"config": name, "ms": round(ms, 2),
                          "compile_s": round(compile_s, 1),
                          "batch": args.batch}), flush=True)

    # 1. backbone only
    if "backbone" in sel:
        cfg = get_cfg()
        cfg.INPUT.TEST_PAD_H = cfg.INPUT.TEST_PAD_W = hw
        backbone = build_swin(cfg, dtype=jnp.bfloat16,
                              attn_fn=fused_window_attention)
        p_bb = jax.jit(lambda k, x: backbone.init(k, x, True))(
            jax.random.key(0), normalize_image(images[:1], cfg))

        @jax.jit
        def bb_fwd(p, x):
            feats = backbone.apply(p, normalize_image(x, cfg), True)
            return sum(jnp.sum(v.astype(jnp.float32)) for v in feats.values())

        report("backbone_swin_t",
               *_time(bb_fwd, p_bb, images, iters=args.iters))

    # 2..n full model at various encoder configs
    for name, enc_attn, enc_layers in [
        ("enc0", "full", 0),
        ("window6", "window", 6),
        ("full6", "full", 6),
        ("deform6", "deformable", 6),
    ]:
        if name not in sel:
            continue
        cfg = get_cfg()
        cfg.INPUT.TEST_PAD_H = cfg.INPUT.TEST_PAD_W = hw
        cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = enc_attn
        cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = enc_layers
        model = build_model(cfg)
        p = jax.jit(model.init)(jax.random.key(0),
                                normalize_image(images[:1], cfg))

        @jax.jit
        def fwd(p, x, model=model):
            cls_l, mask_l = model.apply(p, normalize_image(x, cfg),
                                        deterministic=True)
            return (jnp.sum(cls_l[-1].astype(jnp.float32))
                    + jnp.sum(mask_l[-1].astype(jnp.float32)))

        try:
            report(name, *_time(fwd, p, images, iters=args.iters))
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
