"""Visualize predictions: overlays and GT-vs-prediction side-by-sides.

Mirrors reference training/maskdino/visualize.py: batch-1 prediction over
the val images with a score threshold (:76-149 incl. :101-104 filter),
mask/box overlays (:108-116), GT-vs-pred comparison with contours
(:151-229), prediction_summary.json (:137-139), CLI --model/--threshold
(:232-235).
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

from common import (DEFAULT_DATA_ROOT, bootstrap_distributed,  # noqa: E402
                    register_dataset)


def _color(i):
    palette = [(255, 60, 60), (60, 200, 60), (60, 120, 255), (255, 200, 0),
               (200, 60, 255), (0, 220, 220)]
    return palette[i % len(palette)]


def draw_instances(img: np.ndarray, masks, scores, alpha=0.45,
                   contours=True) -> np.ndarray:
    import cv2

    out = img.copy()
    for i, (m, s) in enumerate(zip(masks, scores)):
        color = np.array(_color(i), np.float32)
        mm = m.astype(bool)
        out[mm] = (out[mm] * (1 - alpha) + color * alpha).astype(np.uint8)
        if contours:
            cs, _ = cv2.findContours(m.astype(np.uint8), cv2.RETR_EXTERNAL,
                                     cv2.CHAIN_APPROX_SIMPLE)
            cv2.drawContours(out, cs, -1, _color(i), 2)
            if len(cs):
                x, y = cs[0][:, 0, 0].min(), max(cs[0][:, 0, 1].min() - 5, 10)
                cv2.putText(out, f"{s:.2f}", (int(x), int(y)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, _color(i), 1)
    return out


def main():
    bootstrap_distributed()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, help="checkpoint dir")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--data-root", default=DEFAULT_DATA_ROOT)
    ap.add_argument("--category", default="Cable")
    ap.add_argument("--split", default="val")
    ap.add_argument("--output-dir", default="./output/visualization")
    ap.add_argument("--max-images", type=int, default=50)
    ap.add_argument("--comparison", action="store_true",
                    help="GT-vs-prediction side-by-side panels")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from common import setup_cfg
    from vision_instance_seg_tpu.data.catalog import DatasetCatalog
    from vision_instance_seg_tpu.data.loader import EvalLoader
    from vision_instance_seg_tpu.data.polygons import polygons_to_bitmask
    from vision_instance_seg_tpu.engine.checkpoint import load_checkpoint
    from vision_instance_seg_tpu.engine.evaluator import _resize_bilinear
    from vision_instance_seg_tpu.engine.trainer import create_train_state
    from vision_instance_seg_tpu.models import build_model, make_inference_fn

    split_dir = os.path.join(args.data_root, args.category, args.split)
    dataset = register_dataset(
        f"vis_{args.category}_{args.split}",
        os.path.join(split_dir, "annotations.json"),
        os.path.join(split_dir, "images"))

    cfg = setup_cfg(test_name=dataset, output_dir=args.output_dir,
                    opts=args.opts)
    cfg.freeze()
    model = build_model(cfg)
    h, w = cfg.INPUT.TEST_PAD_H, cfg.INPUT.TEST_PAD_W
    state = create_train_state(cfg, model, jax.random.key(0),
                               {"image": jnp.zeros((1, h, w, 3))})
    state = load_checkpoint(args.model, state)
    infer = make_inference_fn(model, cfg)

    os.makedirs(args.output_dir, exist_ok=True)
    dicts = DatasetCatalog.get(dataset)[:args.max_images]
    loader = EvalLoader(dicts, cfg, batch_size=1)
    summary = []
    for rec, batch in zip(dicts, loader):
        out = {k: np.asarray(v) for k, v in
               infer(state.params, batch["image"]).items()}
        vh, vw = int(batch["valid_hw"][0, 0]), int(batch["valid_hw"][0, 1])
        oh, ow = int(batch["orig_hw"][0, 0]), int(batch["orig_hw"][0, 1])
        keep = out["scores"][0] > args.threshold
        # mask_probs arrive uint8-quantized (x255, make_inference_fn)
        pscale = 1 / 255 if out["mask_probs"].dtype == np.uint8 else 1.0
        masks, scores = [], []
        for i in np.where(keep)[0]:
            m = _resize_bilinear(
                out["mask_probs"][0, i].astype(np.float32) * pscale,
                h, w)[:vh, :vw]
            m = _resize_bilinear(m, oh, ow) > 0.5
            if m.sum():
                masks.append(m)
                scores.append(float(out["scores"][0, i]))
        img = cv2.cvtColor(cv2.imread(rec["file_name"]), cv2.COLOR_BGR2RGB)
        pred_vis = draw_instances(img, masks, scores)
        base = os.path.basename(rec["file_name"])
        if args.comparison:
            gt_masks = [polygons_to_bitmask(a["segmentation"], oh, ow)
                        for a in rec.get("annotations", [])]
            gt_vis = draw_instances(img, gt_masks, [1.0] * len(gt_masks))
            panel = np.concatenate([gt_vis, pred_vis], axis=1)
            cv2.putText(panel, "GT", (10, 30), cv2.FONT_HERSHEY_SIMPLEX,
                        1.0, (255, 255, 255), 2)
            cv2.putText(panel, "Prediction", (ow + 10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 1.0, (255, 255, 255), 2)
            out_img = panel
            out_name = f"compare_{base}"
        else:
            out_img = pred_vis
            out_name = f"pred_{base}"
        cv2.imwrite(os.path.join(args.output_dir, out_name),
                    cv2.cvtColor(out_img, cv2.COLOR_RGB2BGR))
        summary.append({"image": base, "num_predictions": len(masks),
                        "scores": scores,
                        "num_gt": len(rec.get("annotations", []))})
        print(f"{base}: {len(masks)} predictions")

    with open(os.path.join(args.output_dir, "prediction_summary.json"),
              "w") as f:
        json.dump({"threshold": args.threshold, "images": summary}, f,
                  indent=2)
    print(f"wrote {len(summary)} visualizations to {args.output_dir}")


if __name__ == "__main__":
    main()
