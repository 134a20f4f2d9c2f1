"""Offline evaluation of trained checkpoints on the Cable val set.

Mirrors reference training/maskdino/evaluate.py: val-set registration via
load_coco_json (:28-56), config + checkpoint load (:58-115), bbox+segm
COCO evaluation (:120-132), per-metric printout and {name}_results.json
(:149-156), original-vs-full comparison table (:204-220).
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from common import (DEFAULT_DATA_ROOT, bootstrap_distributed,  # noqa: E402
                    register_dataset, setup_cfg)


def register_val_dataset(data_root: str, category: str = "Cable") -> str:
    val_dir = os.path.join(data_root, category, "val")
    return register_dataset(
        "thunderbolt_val",
        os.path.join(val_dir, "annotations.json"),
        os.path.join(val_dir, "images"))


def evaluate_model(model_path: str, output_dir: str, name: str,
                   dataset: str, opts=None) -> dict:
    """Load a checkpoint and run bbox+segm COCO eval (reference :91-164)."""
    from vision_instance_seg_tpu.engine.checkpoint import load_checkpoint
    from vision_instance_seg_tpu.engine.evaluator import COCOEvaluator
    from vision_instance_seg_tpu.engine.solver import make_optimizer
    from vision_instance_seg_tpu.engine.trainer import (
        TrainState, create_train_state)
    from vision_instance_seg_tpu.models import build_model, make_inference_fn

    import jax
    import jax.numpy as jnp

    cfg = setup_cfg(test_name=dataset, output_dir=output_dir, opts=opts)
    cfg.freeze()
    model = build_model(cfg)
    h, w = cfg.INPUT.TEST_PAD_H, cfg.INPUT.TEST_PAD_W
    sample = {"image": jnp.zeros((1, h, w, 3))}
    state = create_train_state(cfg, model, jax.random.key(0), sample)
    state = load_checkpoint(model_path, state)

    evaluator = COCOEvaluator(dataset, cfg)
    infer = make_inference_fn(model, cfg)
    metrics = evaluator.evaluate(infer, state.params)

    os.makedirs(output_dir, exist_ok=True)
    out_file = os.path.join(output_dir, f"{name}_results.json")
    with open(out_file, "w") as f:
        json.dump({t: {k: float(v) for k, v in m.items()}
                   for t, m in metrics.items()}, f, indent=2)
    print(f"\n[{name}]")
    for task in ("bbox", "segm"):
        line = "  ".join(f"{k}={v:6.2f}" for k, v in metrics[task].items())
        print(f"  {task}: {line}")
    return metrics


def main():
    bootstrap_distributed()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default=DEFAULT_DATA_ROOT)
    ap.add_argument("--category", default="Cable")
    ap.add_argument("--original-model",
                    default="./output/maskdino_original/checkpoints/ckpt_final")
    ap.add_argument("--full-model",
                    default="./output/maskdino_full/checkpoints/ckpt_final")
    ap.add_argument("--output-dir", default="./output/evaluation")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    dataset = register_val_dataset(args.data_root, args.category)
    results = {}
    for name, path in (("original", args.original_model),
                       ("full", args.full_model)):
        if os.path.exists(path):
            results[name] = evaluate_model(path, args.output_dir, name,
                                           dataset, args.opts)
        else:
            print(f"[skip] {name}: checkpoint not found at {path}")

    if len(results) == 2:  # comparison table (reference :204-220)
        print(f"\n{'=' * 60}\nCOMPARISON (original 26 vs full set)\n{'=' * 60}")
        print(f"{'metric':10s} {'original':>10s} {'full':>10s} {'delta':>10s}")
        for task in ("bbox", "segm"):
            for k in ("AP", "AP50", "AP75"):
                a = results["original"][task][k]
                b = results["full"][task][k]
                print(f"{task}/{k:6s} {a:10.2f} {b:10.2f} {b - a:+10.2f}")


if __name__ == "__main__":
    main()
