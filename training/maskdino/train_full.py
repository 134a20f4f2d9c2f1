"""Train MaskDINO on the FULL Cable train set (original + augmented).

Mirrors reference training/maskdino/train_full.py (the train_original.py
twin without the original-only filter; reference :36-273 duplicates the
mapper/trainer/config blocks — here both CLIs share training/maskdino/
common.py instead).
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from common import (DEFAULT_DATA_ROOT, bootstrap_distributed,  # noqa: E402
                    register_dataset, setup_cfg)


def main():
    bootstrap_distributed()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default=DEFAULT_DATA_ROOT)
    ap.add_argument("--category", default="Cable")
    ap.add_argument("--output-dir", default="./output/maskdino_full")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--max-iter", type=int, default=10000)
    ap.add_argument("--weights", default="")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-amp", action="store_true")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    train_dir = os.path.join(args.data_root, args.category, "train")
    val_dir = os.path.join(args.data_root, args.category, "val")
    train_name = register_dataset(
        "thunderbolt_full_train",
        os.path.join(train_dir, "annotations.json"),
        os.path.join(train_dir, "images"))
    if os.path.exists(os.path.join(val_dir, "annotations.json")):
        test_name = register_dataset(
            "thunderbolt_full_val",
            os.path.join(val_dir, "annotations.json"),
            os.path.join(val_dir, "images"))
    else:
        test_name = train_name

    cfg = setup_cfg(train_name=train_name, test_name=test_name,
                    output_dir=args.output_dir, batch_size=args.batch_size,
                    lr=args.lr, max_iter=args.max_iter,
                    amp=not args.no_amp, weights=args.weights,
                    opts=args.opts)
    cfg.freeze()

    from vision_instance_seg_tpu.engine.evaluator import COCOEvaluator
    from vision_instance_seg_tpu.engine.trainer import Trainer
    from vision_instance_seg_tpu.models import make_inference_fn

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    trainer.train()

    evaluator = COCOEvaluator(test_name, cfg)
    infer = make_inference_fn(trainer.model, cfg)
    metrics = evaluator.evaluate(infer, trainer.state.params)
    with open(os.path.join(cfg.OUTPUT_DIR, "results.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=float)
    print(json.dumps(metrics, indent=2, default=float))


if __name__ == "__main__":
    main()
