"""Multi-model experiment runner over the 13-experiment grid.

Mirrors reference training/train_template.py: the ``EXPERIMENTS`` grid
(:25-42 = the registry's 13 names), uniform ``HYPERPARAMS`` (:45-57),
per-model train functions (:63-165), ``run_experiment`` (:172-221),
``run_all_experiments`` + summary table (:224-265), CLI ``--model/--exp/
--epochs/--batch_size/--lr`` (:273-285). All four model types route to
the TPU-native stack: ``maskdino``/``mask2former`` natively; ``yolo`` and
``faster_rcnn`` are BOX-DETECTION routes over the same JAX models
(Swin-T / R-50 MaskDINO with mask-derived boxes) that return the
reference yolo branch's ultralytics-shaped metric contract
{mAP50, mAP75, mAP, precision, recall} (reference train_template.py:
63-101; its own branch cannot run end-to-end — the COCO->YOLO conversion
and data.yaml are TODO stubs there — so this route is the working
equivalent, clearly labeled via the result's ``backend`` field).
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"
                       / "data_utils"))

from register_experiments import (  # noqa: E402
    EXPERIMENT_NAMES, get_dataset_names, register_all_experiments)

# 13 experiments (reference train_template.py:25-42 == registry :20-37)
EXPERIMENTS = list(EXPERIMENT_NAMES)

# uniform hyperparameters (reference train_template.py:45-57)
HYPERPARAMS = {
    "epochs": 100,
    "batch_size": 8,
    "learning_rate": 1e-4,
    "optimizer": "AdamW",
    "lr_scheduler": "cosine",
    "warmup_epochs": 5,
    "image_size": 640,
    "seed": 42,
    "early_stopping_patience": 15,
}

SUPPORTED_MODELS = ("maskdino", "mask2former", "yolo", "faster_rcnn")
# box-detection routes: JAX MaskDINO trained on the same data, boxes from
# the learned masks, metrics in the ultralytics contract
BOX_ROUTES = {"yolo": "swin", "faster_rcnn": "resnet"}


def build_cfg(model: str, exp_name: str, args) -> "object":
    from vision_instance_seg_tpu.config import get_cfg

    train_name, test_name = get_dataset_names(exp_name)
    cfg = get_cfg()
    cfg.MODEL.MASK_DINO.ENABLED = model != "mask2former"
    if model in BOX_ROUTES:
        cfg.MODEL.BACKBONE.NAME = BOX_ROUTES[model]
        if model == "faster_rcnn":
            cfg.MODEL.RESNETS.DEPTH = 50
        # detection route: report boxes derived from the learned masks
        # (TEST.BOX_FROM_MASK) — the measured-reliable box source at this
        # data scale (docs/PERF.md bbox ladder)
        cfg.MODEL.MASK_FORMER.TEST.BOX_FROM_MASK = True
    cfg.DATASETS.TRAIN = [train_name]
    cfg.DATASETS.TEST = [test_name]
    cfg.SOLVER.IMS_PER_BATCH = args.batch_size
    cfg.SOLVER.BASE_LR = args.lr
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupCosineLR"
    cfg.SEED = HYPERPARAMS["seed"]
    cfg.INPUT.IMAGE_SIZE = HYPERPARAMS["image_size"]
    # epochs -> iterations over the actual dataset size
    from vision_instance_seg_tpu.data.catalog import DatasetCatalog
    n_train = len(DatasetCatalog.get(train_name))
    iters_per_epoch = max(1, n_train // args.batch_size)
    cfg.SOLVER.MAX_ITER = args.epochs * iters_per_epoch
    cfg.SOLVER.WARMUP_ITERS = HYPERPARAMS["warmup_epochs"] * iters_per_epoch
    cfg.SOLVER.CHECKPOINT_PERIOD = max(500, iters_per_epoch * 10)
    # epoch-granularity eval + early stopping (reference train_template.py
    # HYPERPARAMS early_stopping_patience=15 epochs without improvement)
    cfg.TEST.EVAL_PERIOD = iters_per_epoch
    cfg.TEST.EARLY_STOP_PATIENCE = HYPERPARAMS["early_stopping_patience"]
    cfg.OUTPUT_DIR = os.path.join(args.output_dir, model, exp_name)
    if args.opts:
        cfg.merge_from_list(args.opts)
    return cfg


def train_model(model: str, exp_name: str, args) -> dict:
    """Train + evaluate one (model, experiment); returns metric dict."""
    from vision_instance_seg_tpu.engine.evaluator import COCOEvaluator
    from vision_instance_seg_tpu.engine.trainer import Trainer
    from vision_instance_seg_tpu.models import make_inference_fn

    cfg = build_cfg(model, exp_name, args)
    cfg.freeze()
    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    train_logs = trainer.train()

    _, test_name = get_dataset_names(exp_name)
    evaluator = COCOEvaluator(test_name, cfg)
    infer = make_inference_fn(trainer.model, cfg)
    metrics = evaluator.evaluate(infer, trainer.state.params)
    if model in BOX_ROUTES:
        # ultralytics-shaped contract of the reference yolo branch
        # (train_template.py:95-100): box mAPs + operating-point P/R
        prec, rec = evaluator.last_pr_best_f1.get("bbox", (float("nan"),) * 2)
        bbox = metrics.get("bbox", {})
        return {"train": train_logs,
                "mAP50": bbox.get("AP50"), "mAP75": bbox.get("AP75"),
                "mAP": bbox.get("AP"), "precision": prec, "recall": rec,
                "backend": f"maskdino-tpu/{cfg.MODEL.BACKBONE.NAME}"
                           "+box_from_mask",
                "coco": metrics}
    return {"train": train_logs, **metrics}


def run_experiment(model: str, exp_name: str, args) -> dict:
    print(f"\n{'=' * 70}\n[{model}] {exp_name}\n{'=' * 70}")
    if model in BOX_ROUTES:
        # disclose the routing up front, not only in the result JSON's
        # "backend" field (advisor r4): the reference's own yolo branch is
        # a TODO stub, so these names train the JAX detector instead
        print(f"note: '{model}' routes to maskdino-tpu/"
              f"{BOX_ROUTES[model]} + box_from_mask (ultralytics-shaped "
              f"metrics; the reference's {model} branch is a TODO stub)")
    t0 = time.time()
    try:
        metrics = train_model(model, exp_name, args)
        result = {"experiment": exp_name, "model": model,
                  "status": "completed", "metrics": metrics,
                  "hyperparams": HYPERPARAMS,
                  "elapsed_s": round(time.time() - t0, 1)}
    except Exception as e:  # per-experiment isolation (reference :159-166)
        import traceback
        traceback.print_exc()
        result = {"experiment": exp_name, "model": model, "status": "failed",
                  "error": str(e)}
    out_dir = Path(args.output_dir) / model / exp_name
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "results.json", "w") as f:
        json.dump(result, f, indent=2, default=float)
    return result


def run_all_experiments(model: str, args):
    results = [run_experiment(model, e, args) for e in EXPERIMENTS]
    out = Path(args.output_dir) / model / "all_results.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print_summary(results)
    return results


def print_summary(results):
    print(f"\n{'=' * 70}\nSUMMARY\n{'=' * 70}")
    print(f"{'experiment':45s} {'status':12s} {'segm AP':>8s}")
    for r in results:
        m = r.get("metrics", {}) if r["status"] == "completed" else {}
        segm = m.get("segm") or m.get("coco", {}).get("segm", {})
        ap = segm.get("AP", float("nan")) if segm else float("nan")
        print(f"{r['experiment']:45s} {r['status']:12s} {ap:8.2f}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="maskdino",
                    choices=SUPPORTED_MODELS)
    ap.add_argument("--exp", default="all",
                    help="experiment name or 'all'")
    ap.add_argument("--epochs", type=int, default=HYPERPARAMS["epochs"])
    ap.add_argument("--batch_size", type=int,
                    default=HYPERPARAMS["batch_size"])
    ap.add_argument("--lr", type=float,
                    default=HYPERPARAMS["learning_rate"])
    ap.add_argument("--output-dir", default="./results")
    ap.add_argument("--base-dir", default=None, help="dataset root")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("opts", nargs=argparse.REMAINDER,
                    help="free-form cfg overrides, e.g. SOLVER.MAX_ITER 100")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(__file__).resolve().parent / "maskdino"))
    from common import bootstrap_distributed
    bootstrap_distributed()
    register_all_experiments(args.base_dir)
    if args.exp == "all":
        run_all_experiments(args.model, args)
    else:
        if args.exp not in EXPERIMENTS:
            sys.exit(f"unknown experiment {args.exp!r}; "
                     f"choose from {EXPERIMENTS}")
        r = run_experiment(args.model, args.exp, args)
        print_summary([r])


if __name__ == "__main__":
    main()
