"""Minimal-repro hunt for the 800px transfer-checkpoint Pallas eval crash.

The r5 800px transfer-init parity checkpoint
(/tmp/vist_overfit_y2rcatid) trains fine and evaluates cleanly on the
XLA jnp core (segm/bbox AP50 99.0/99.0) but reproducibly kills the TPU
worker ("kernel fault") when evaluated through the Pallas sampling
kernels — while the r4 FROM-SCRATCH 800px checkpoint evaluated fine on
the same code. Params are NaN/Inf-free and offsets are clamped before
location build, so the usual suspects are out. This script tightens the
repro:

  --stage model   one batch-1 jitted inference call with the Pallas core
                  (the smallest full-model reproduction)
  --stage kernel  capture the value_proj / sampling_offsets /
                  attention_weights outputs of every encoder layer on
                  the (safe) jnp-core path, reconstruct the exact
                  (value, locations, weights) operands the Pallas kernel
                  would see, and run the standalone kernel per layer —
                  isolating whether the fault lives in the kernel itself
                  or in its co-residency with the surrounding graph.

Usage: VIST_ASSUME_TPU=1 python scripts/repro_kernel_fault.py \
    --data-root /tmp/vist_overfit_y2rcatid/mini --stage kernel
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def build_cfg(data_root: str, image_size: int = 800):
    from vision_instance_seg_tpu.config import get_cfg
    from vision_instance_seg_tpu.data.catalog import DatasetCatalog
    from vision_instance_seg_tpu.data.coco import load_coco_json

    root = Path(data_root)
    name = "repro_mini"
    if name not in DatasetCatalog.list():
        DatasetCatalog.register(
            name, lambda: load_coco_json(str(root / "annotations.json"),
                                         str(root / "images"), name))
    cfg = get_cfg()
    cfg.MODEL.MASK_DINO.ENABLED = True
    cfg.MODEL.MASK_DINO.CROSS_ATTENTION = "deformable"
    cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = "deformable"
    cfg.MODEL.BACKBONE.NAME = "resnet"
    cfg.MODEL.SEM_SEG_HEAD.TOTAL_NUM_FEATURE_LEVELS = 4
    cfg.MODEL.MASK_FORMER.CLASS_WEIGHT = 4.0
    cfg.INPUT.IMAGE_SIZE = image_size
    cfg.INPUT.MIN_SIZE_TEST = image_size
    cfg.INPUT.MAX_SIZE_TEST = image_size * 2
    cfg.INPUT.TEST_PAD_H = cfg.INPUT.TEST_PAD_W = image_size
    cfg.TEST.BATCH_SIZE = 1
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.OUTPUT_DIR = str(root / "out")
    return cfg, name


def restore_params(cfg):
    """Load the checkpoint's params without a Trainer (no loader/opt)."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from vision_instance_seg_tpu.engine.checkpoint import latest_checkpoint
    import os

    path = latest_checkpoint(os.path.join(cfg.OUTPUT_DIR, "checkpoints"))
    t = ocp.PyTreeCheckpointer().restore(path)
    params = t["params"]
    return jax.device_put(
        jax.tree_util.tree_map(np.asarray, params)), path


def first_batch(cfg, name):
    from vision_instance_seg_tpu.data.catalog import DatasetCatalog
    from vision_instance_seg_tpu.data.loader import EvalLoader

    dicts = DatasetCatalog.get(name)
    return next(iter(EvalLoader(
        dicts, cfg, batch_size=int(cfg.TEST.get("BATCH_SIZE", 1)))))


def stage_model(cfg, name):
    import jax.numpy as jnp

    from vision_instance_seg_tpu.models import build_model, make_inference_fn

    cfg.freeze()
    params, path = restore_params(cfg)
    print(f"restored {path}", flush=True)
    model = build_model(cfg)
    infer = make_inference_fn(model, cfg)
    batch = first_batch(cfg, name)
    print("dispatching batch-1 Pallas inference...", flush=True)
    out = infer(params, jnp.asarray(batch["image"]))
    s = float(jnp.sum(out["scores"]))
    print(json.dumps({"stage": "model", "ok": True, "score_sum": s}))


def stage_kernel(cfg, name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_instance_seg_tpu.kernels.msdeform_attn import (
        DEFAULT_HALO, fused_ms_deform_attn)
    from vision_instance_seg_tpu.models import build_model, normalize_image
    from vision_instance_seg_tpu.models.pixel_decoder import (
        _encoder_reference_points)

    cfg.TPU.USE_PALLAS_DEFORM_ATTN = False     # capture on the safe path
    cfg.freeze()
    params, path = restore_params(cfg)
    print(f"restored {path}", flush=True)
    model = build_model(cfg)
    batch = first_batch(cfg, name)
    imgs = normalize_image(jnp.asarray(batch["image"]), cfg)

    want = ("value_proj", "sampling_offsets", "attention_weights")

    @jax.jit
    def captured(params, imgs):
        _, inter = model.apply(
            params, imgs, deterministic=True, aux_masks=False,
            capture_intermediates=lambda mdl, _: mdl.name in want,
            mutable=["intermediates"])
        return inter

    inter = jax.device_get(captured(params, imgs))
    # walk the tree: keep only ENCODER captures (path contains 'encoder')
    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    caps = {}
    for path_k, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path_k)
        if "encoder" not in key:
            continue
        for w in want:
            if w in key:
                caps.setdefault(w, []).append((key, np.asarray(leaf)))
    for w in want:
        assert w in caps, (w, [k for k, _ in flat][:20])
        print(w, [(k.split('/')[-3], a.shape) for k, a in caps[w]],
              flush=True)

    # encoder spatial shapes at this canvas (stride 8..64 ceil-div)
    size = cfg.INPUT.TEST_PAD_H
    shapes = [( -(-size // s), -(-size // s))
              for s in (8, 16, 32, 64)][:cfg.MODEL.SEM_SEG_HEAD.
                                        TOTAL_NUM_FEATURE_LEVELS]
    q = sum(h * w for h, w in shapes)
    off0 = caps["sampling_offsets"][0][1]
    q_cap = off0.shape[-2] if off0.ndim in (3, 4) else None
    assert q_cap == q, (
        f"derived shapes {shapes} (q={q}) disagree with capture q={q_cap}"
        f" — adjust the stride table")
    nl = len(shapes)
    nh, npts = 8, 4
    ref = jnp.asarray(_encoder_reference_points(shapes))   # (Q, L, 2)
    wh = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)

    def layer_tensors(i):
        vp = caps["value_proj"][0][1]
        off = caps["sampling_offsets"][0][1]
        aw = caps["attention_weights"][0][1]
        # scanned encoder: captures are stacked (L, B, ...) when ndim
        # exceeds the unscanned rank
        def pick(a):
            return a[i] if a.ndim == 4 else a
        vp, off, aw = pick(vp), pick(off), pick(aw)
        b = vp.shape[0]
        hd = vp.shape[-1] // nh
        v = jnp.asarray(vp).reshape(b, -1, nh, hd)
        off = jnp.asarray(off).reshape(b, q, nh, nl, npts, 2)
        off = jnp.clip(off, -float(DEFAULT_HALO), float(DEFAULT_HALO))
        loc = (ref[None, :, None, :, None, :]
               + off / wh[None, None, None, :, None, :])
        a = jnp.asarray(aw).reshape(b, q, nh, nl * npts)
        a = jax.nn.softmax(a, axis=-1).reshape(b, q, nh, nl, npts)
        return v, loc, a

    n_layers = (caps["value_proj"][0][1].shape[0]
                if caps["value_proj"][0][1].ndim == 4 else 1)
    print(f"{n_layers} encoder layer captures; shapes={shapes}",
          flush=True)
    run = jax.jit(lambda v, l, a: jnp.sum(
        fused_ms_deform_attn(v, tuple(shapes), l, a)))
    for i in range(n_layers):
        v, loc, a = layer_tensors(i)
        print(f"layer {i}: dispatching standalone Pallas kernel "
              f"(off range checked: loc min {float(loc.min()):.4f} "
              f"max {float(loc.max()):.4f})", flush=True)
        s = float(run(v, loc, a))
        print(f"layer {i}: OK sum={s:.4f}", flush=True)
    print(json.dumps({"stage": "kernel", "ok": True,
                      "layers": int(n_layers)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--image-size", type=int, default=800)
    ap.add_argument("--stage", choices=["model", "kernel"],
                    default="kernel")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("opts", nargs="*", default=[],
                    help="trailing KEY VALUE config overrides (smoke "
                         "tests shrink the model to match tiny ckpts)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    cfg, name = build_cfg(args.data_root, args.image_size)
    if args.opts:
        cfg.merge_from_list(list(args.opts))
    if args.stage == "model":
        stage_model(cfg, name)
    else:
        stage_kernel(cfg, name)


if __name__ == "__main__":
    main()
