"""End-to-end learning proof: overfit the synthetic mini-COCO set on TPU.

Trains the real flagship (Swin-T Mask2Former, window encoder, TPU-fast
criterion) on 6 synthetic blob images and evaluates with the full COCO
pipeline (RLE + pycocotools-parity AP). A healthy stack overfits to high
AP50 in a few hundred steps — this exercises loader, transforms, train
step, checkpointing-free loop, inference, postprocess, and the evaluator
against REAL learned weights rather than oracles.

Usage: python scripts/overfit_demo.py [--steps 300] [--image-size 256]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--maskdino", action="store_true")
    # reference-scale learning runs (VERDICT r3 #5): the reference trains
    # 127 images for 3k iters (BASELINE.md); scale the synthetic set and
    # canvas up from the 6-image micro default
    ap.add_argument("--n-images", type=int, default=6)
    ap.add_argument("--max-inst", type=int, default=3)
    ap.add_argument("--backbone", default="swin_t",
                    choices=["swin_t", "r50"])
    ap.add_argument("--encoder", default="window",
                    choices=["window", "deformable", "full"],
                    help="pixel-decoder encoder (deformable = parity)")
    ap.add_argument("--levels", type=int, default=3,
                    help="TOTAL_NUM_FEATURE_LEVELS (4 = reference 4s)")
    ap.add_argument("--clamp-ab", action="store_true",
                    help="after training, A/B the Pallas halo offset clamp "
                         "against the unclamped jnp core + measure the "
                         "fraction of offsets beyond the halo (VERDICT #6)")
    # criterion A/B (VERDICT r1 #4): exact-vs-greedy matcher and
    # grid-vs-random point sampling, measured on the same data/seed
    ap.add_argument("--matcher", default="greedy",
                    choices=["greedy", "hungarian", "hungarian_dfs"])
    ap.add_argument("--points", default="grid", choices=["grid", "random"])
    # MaskDINO mechanism ablations (localize training-quality regressions)
    ap.add_argument("--no-dn", action="store_true",
                    help="disable contrastive denoising queries")
    ap.add_argument("--no-two-stage", action="store_true",
                    help="learned queries instead of encoder proposals")
    ap.add_argument("--box-init", default="no",
                    choices=["no", "bitmask"],
                    help="MaskDINO mask-enhanced box initialization")
    ap.add_argument("--semantic-ce", action="store_true",
                    help="softmax-CE classification (no-object channel)")
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--dn-num", type=int, default=16)
    ap.add_argument("--dn-warmup", type=int, default=0,
                    help="ramp dn loss weight 0->1 over this many steps "
                         "(MODEL.MASK_DINO.DN_WARMUP_STEPS)")
    ap.add_argument("--cross", default="dense",
                    choices=["dense", "deformable"],
                    help="MaskDINO decoder cross-attention")
    ap.add_argument("--no-box-bias", action="store_true",
                    help="disable the dense-mode Gaussian box locality bias")
    ap.add_argument("--no-geo-readout", action="store_true",
                    help="disable the dense-mode attention-geometry box head")
    ap.add_argument("--geo-readout", action="store_true",
                    help="enable the dense-mode attention-geometry box head")
    ap.add_argument("--mask-bias", action="store_true",
                    help="M2F-style mask-guided attention in the dense "
                         "MaskDINO decoder (MODEL.MASK_DINO.MASK_ATTN_BIAS)")
    ap.add_argument("--box-from-mask", action="store_true",
                    help="derive eval boxes from predicted masks "
                         "(MODEL.MASK_FORMER.TEST.BOX_FROM_MASK)")
    ap.add_argument("--box-cost", type=float, default=1.0,
                    help="scale on box L1/GIoU terms in the MATCHING cost")
    ap.add_argument("--level-cycle", action="store_true",
                    help="M2F-style per-layer level round-robin in the "
                         "dense MaskDINO decoder (DENSE_LEVEL_CYCLE)")
    ap.add_argument("--box-loss-weight", type=float, default=1.0,
                    help="scale on the box L1/GIoU LOSS weights (0 = "
                         "mask-only MaskDINO, isolates whether box-loss "
                         "gradients dilute the shared trunk)")
    # offline re-eval + transfer-init (VERDICT r4 #1/#2): reuse a previous
    # run's synthetic dataset + checkpoint instead of retraining (an r4
    # flagship 127-image run lost its eval to a since-fixed fetch_row bug;
    # the checkpoint and data survived in /tmp)
    ap.add_argument("--data-root", default=None,
                    help="existing mini-COCO dir (annotations.json + "
                         "images/) from a previous run; skips generation "
                         "and keeps OUTPUT_DIR inside it")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training; restore the latest checkpoint "
                         "from OUTPUT_DIR/checkpoints and evaluate")
    ap.add_argument("--init-from", default=None,
                    help="orbax checkpoint dir to transfer-init PARAMS "
                         "from (fresh optimizer/step) — e.g. a converged "
                         "320px checkpoint as the stand-in for the "
                         "reference's unavailable ImageNet init on an "
                         "800px budget; param trees must match")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS env is not "
                         "honored here — the axon TPU plugin pre-registers "
                         "and wins, and hangs when the tunnel is down)")
    ap.add_argument("opts", nargs="*", default=[],
                    help="trailing KEY VALUE config overrides")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fixtures import make_mini_coco
    from vision_instance_seg_tpu.config import get_cfg
    from vision_instance_seg_tpu.data.catalog import DatasetCatalog
    from vision_instance_seg_tpu.data.coco import load_coco_json
    from vision_instance_seg_tpu.engine.evaluator import COCOEvaluator
    from vision_instance_seg_tpu.engine.trainer import Trainer
    from vision_instance_seg_tpu.models import make_inference_fn

    if args.data_root:
        root = Path(args.data_root)
        mc = {"ann_file": str(root / "annotations.json"),
              "image_dir": str(root / "images")}
    else:
        root = Path(tempfile.mkdtemp(prefix="vist_overfit_")) / "mini"
        root.mkdir(parents=True)
        # canvas and blob radii scale with --image-size so instance/canvas
        # proportions match the 256px micro setup at any scale
        s = args.image_size / 256.0
        mc = make_mini_coco(root, n_images=args.n_images, seed=0,
                            height=int(200 * s), width=int(260 * s),
                            max_inst=args.max_inst,
                            radius=(8 * s, 18 * s))
    name = "overfit_mini"
    DatasetCatalog.register(
        name, lambda: load_coco_json(mc["ann_file"], mc["image_dir"], name))

    cfg = get_cfg()
    if args.maskdino:
        cfg.MODEL.MASK_DINO.ENABLED = True
        cfg.MODEL.MASK_DINO.CROSS_ATTENTION = args.cross
        cfg.MODEL.MASK_DINO.BOX_ATTN_BIAS = not args.no_box_bias
        cfg.MODEL.MASK_DINO.GEO_READOUT = (args.geo_readout
                                           and not args.no_geo_readout)
        cfg.MODEL.MASK_DINO.BOX_COST_IN_MATCH = args.box_cost
        cfg.MODEL.MASK_FORMER.BOX_WEIGHT *= args.box_loss_weight
        cfg.MODEL.MASK_FORMER.GIOU_WEIGHT *= args.box_loss_weight
        cfg.MODEL.MASK_DINO.MASK_ATTN_BIAS = args.mask_bias
        cfg.MODEL.MASK_DINO.DENSE_LEVEL_CYCLE = args.level_cycle
        cfg.MODEL.MASK_DINO.DN_NUM = args.dn_num
        cfg.MODEL.MASK_DINO.DN_WARMUP_STEPS = args.dn_warmup
        # MaskDINO base yaml class weight (4.0 vs Mask2Former's 2.0)
        cfg.MODEL.MASK_FORMER.CLASS_WEIGHT = 4.0
        if args.no_dn:
            cfg.MODEL.MASK_DINO.DN = "no"
        if args.no_two_stage:
            cfg.MODEL.MASK_DINO.TWO_STAGE = False
        cfg.MODEL.MASK_DINO.INITIALIZE_BOX_TYPE = args.box_init
        cfg.MODEL.MASK_DINO.SEMANTIC_CE_LOSS = args.semantic_ce
        cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = args.queries
    cfg.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = args.encoder
    cfg.MODEL.SEM_SEG_HEAD.TOTAL_NUM_FEATURE_LEVELS = args.levels
    if args.backbone == "r50":
        cfg.MODEL.BACKBONE.NAME = "resnet"
    cfg.MODEL.MASK_FORMER.TEST.BOX_FROM_MASK = args.box_from_mask
    cfg.MODEL.MASK_FORMER.MATCHER = args.matcher
    cfg.MODEL.MASK_FORMER.POINT_MODE = args.points
    cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS = 4096
    cfg.MODEL.SWIN.USE_CHECKPOINT = True
    cfg.TPU.REMAT_ENCODER = True
    cfg.MODEL.SWIN.DROP_PATH_RATE = 0.0
    cfg.INPUT.IMAGE_SIZE = args.image_size
    cfg.INPUT.MAX_INSTANCES = 8
    cfg.INPUT.LSJ.MIN_SCALE = 0.9        # mild LSJ so it can actually overfit
    cfg.INPUT.LSJ.MAX_SCALE = 1.1
    cfg.INPUT.MIN_SIZE_TEST = args.image_size
    cfg.INPUT.MAX_SIZE_TEST = args.image_size * 2
    cfg.INPUT.TEST_PAD_H = cfg.INPUT.TEST_PAD_W = args.image_size
    cfg.SOLVER.IMS_PER_BATCH = args.batch
    cfg.SOLVER.BASE_LR = args.lr
    cfg.SOLVER.MAX_ITER = args.steps
    cfg.SOLVER.WARMUP_ITERS = 20
    cfg.SOLVER.STEPS = [int(args.steps * 0.9)]
    cfg.SOLVER.CHECKPOINT_PERIOD = 10 ** 9
    cfg.TEST.EVAL_PERIOD = 10 ** 9
    cfg.TEST.SCORE_THRESH = 0.05
    # batched eval: 127-image runs at TEST.BATCH_SIZE=1 paid ~25 ms of
    # tunnel dispatch overhead per image
    cfg.TEST.BATCH_SIZE = 8
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.OUTPUT_DIR = str(root / "out")
    if args.opts:
        cfg.merge_from_list(list(args.opts))

    t0 = time.time()
    trainer = Trainer(cfg)
    if args.eval_only:
        trainer.resume_or_load(resume=True)
        logs = {"loss_total": float("nan")}
        train_s = 0.0
        print(f"eval-only: restored from {trainer.checkpoint_dir()} "
              f"(step {int(trainer.state.step)})", file=sys.stderr)
    else:
        if args.init_from:
            from vision_instance_seg_tpu.engine.checkpoint import (
                load_checkpoint)
            donor = load_checkpoint(args.init_from, trainer.state)
            trainer.state = trainer.state.replace(params=donor.params)
            trainer._commit_state_to_mesh()
            print(f"transfer-init params from {args.init_from}",
                  file=sys.stderr)
        logs = trainer.train()
        train_s = time.time() - t0
        print(f"trained {args.steps} steps in {train_s:.0f}s "
              f"(final loss {float(logs['loss_total']):.3f})",
              file=sys.stderr)
        # persist the trained weights BEFORE eval: a post-train crash must
        # not cost the run (an r4 320px run lost its 804 s of training to
        # an eval bug); the printed dir allows offline re-evaluation via
        # --data-root <mini dir> --eval-only
        try:
            trainer.save_checkpoint()
            print(f"checkpoint: {trainer.checkpoint_dir()}",
                  file=sys.stderr)
        except Exception as e:  # checkpointing must never kill the demo
            print(f"checkpoint save failed: {e}", file=sys.stderr)

    infer = make_inference_fn(trainer.model, cfg)
    res = COCOEvaluator(name, cfg).evaluate(infer, trainer.state.params)
    detail = {"steps": args.steps, "train_s": round(train_s, 1),
              **({"eval_only": True} if args.eval_only else {}),
              **({"init_from": args.init_from} if args.init_from else {}),
              "matcher": args.matcher, "points": args.points,
              "final_loss": round(float(logs["loss_total"]), 3),
              "segm": {k: round(float(v), 2)
                       for k, v in res["segm"].items()},
              "bbox": {k: round(float(v), 2)
                       for k, v in res["bbox"].items()},
              "bbox_AP50": round(float(res["bbox"]["AP50"]), 2)}
    if args.clamp_ab:
        detail["clamp_ab"] = _offset_clamp_ab(cfg, trainer, name)
    print(json.dumps({
        "metric": ("overfit_mini_maskdino_segm_AP50" if args.maskdino else "overfit_mini_segm_AP50"),
        "value": round(float(res["segm"]["AP50"]), 2),
        "unit": "AP50",
        "detail": detail}))


def _offset_clamp_ab(cfg, trainer, name) -> dict:
    """Quantify the Pallas halo offset clamp on THIS trained model
    (VERDICT r3 #6).

    The blocked kernel's exactness contract clamps sampling offsets to
    +-halo px (kernels/msdeform_attn.py docstring); the reference CUDA op
    does not. Two measurements on the trained weights:
    - eval AP with the jnp core (unclamped, reference semantics) vs the
      default clamped kernel path;
    - the fraction of predicted offsets beyond the halo, captured from
      the sampling_offsets Dense outputs on one eval batch
      (capture_intermediates; offsets are in px of the sampled level).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_instance_seg_tpu.data.loader import EvalLoader
    from vision_instance_seg_tpu.data.catalog import DatasetCatalog
    from vision_instance_seg_tpu.engine.evaluator import COCOEvaluator
    from vision_instance_seg_tpu.kernels.msdeform_attn import DEFAULT_HALO
    from vision_instance_seg_tpu.models import (build_model,
                                                make_inference_fn,
                                                normalize_image)

    out = {"halo_px": DEFAULT_HALO}
    cfg2 = cfg.clone()
    cfg2.defrost()
    cfg2.TPU.USE_PALLAS_DEFORM_ATTN = False   # jnp core: unclamped
    cfg2.freeze()
    model2 = build_model(cfg2)
    res2 = COCOEvaluator(name, cfg2).evaluate(
        make_inference_fn(model2, cfg2), trainer.state.params)
    out["unclamped_segm_AP50"] = round(float(res2["segm"]["AP50"]), 2)
    out["unclamped_bbox_AP50"] = round(float(res2["bbox"]["AP50"]), 2)

    # offset magnitudes from one eval batch (jnp-core model; offsets are
    # identical pre-clamp on either path)
    dicts = DatasetCatalog.get(name)
    batch = next(iter(EvalLoader(dicts, cfg2, batch_size=1)))
    imgs = normalize_image(jnp.asarray(batch["image"]), cfg2)
    _, inter = model2.apply(trainer.state.params, imgs, deterministic=True,
                            aux_masks=False, capture_intermediates=lambda
                            mdl, _: mdl.name == "sampling_offsets",
                            mutable=["intermediates"])
    mags = []
    for leaf in jax.tree_util.tree_leaves(inter):
        off = np.asarray(leaf, np.float32)
        mags.append(np.abs(off.reshape(-1, 2)).max(-1))
    mags = np.concatenate(mags)
    out["offsets_measured"] = int(mags.size)
    out["frac_beyond_halo"] = round(float((mags > DEFAULT_HALO).mean()), 4)
    out["offset_px_p50_p99_max"] = [
        round(float(np.percentile(mags, 50)), 2),
        round(float(np.percentile(mags, 99)), 2),
        round(float(mags.max()), 2)]
    return out


if __name__ == "__main__":
    main()
