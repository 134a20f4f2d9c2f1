"""Train MaskDINO on the 40 ORIGINAL Cable images only.

Mirrors reference training/maskdino/train_original.py: filename-whitelist
filter of the original images (:174-195), dataset registration with
category forced to 0 / thing_classes ["thunderbolt"] (:198-244), MaskDINO
R-50 config with bs/lr/iters/grad-clip overrides (:250-301), eval-on-train
sanity ("Using train for eval too", :264), trainer resume_or_load + train
(:334-336).
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from common import (DEFAULT_DATA_ROOT, bootstrap_distributed,  # noqa: E402
                    filter_original_only, register_dataset, setup_cfg)


def main():
    bootstrap_distributed()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default=DEFAULT_DATA_ROOT)
    ap.add_argument("--category", default="Cable")
    ap.add_argument("--output-dir", default="./output/maskdino_original")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--max-iter", type=int, default=3000)
    ap.add_argument("--n-original", type=int, default=40)
    ap.add_argument("--weights", default="",
                    help="pretrained backbone (torch .pth / d2 .pkl)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-amp", action="store_true")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    train_dir = os.path.join(args.data_root, args.category, "train")
    ann = os.path.join(train_dir, "annotations.json")
    imgs = os.path.join(train_dir, "images")
    name = "thunderbolt_original_train"
    register_dataset(
        name, ann, imgs,
        filter_fn=lambda d: filter_original_only(d, args.n_original))

    cfg = setup_cfg(train_name=name, test_name=name,  # eval-on-train sanity
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

    evaluator = COCOEvaluator(name, cfg)
    infer = make_inference_fn(trainer.model, cfg)
    metrics = evaluator.evaluate(infer, trainer.state.params)
    with open(os.path.join(cfg.OUTPUT_DIR, "results.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=float)
    print(json.dumps(metrics, indent=2, default=float))


if __name__ == "__main__":
    main()
