"""Default configuration tree.

Covers every knob the reference sets through Detectron2/MaskDINO configs
(reference training/maskdino/train_original.py:250-301, train_experiments.py:48-87,
the MaskDINO base YAML ``maskdino_R50_bs16_50ep_4s_dowsample1_2048.yaml``) plus the
TPU-native knobs (mesh axes, dtype policy, Pallas kernel toggles) that replace the
CUDA/DDP machinery.

Key naming follows the Detectron2/MaskDINO convention (``MODEL.SWIN.*``,
``SOLVER.*``, ``INPUT.*``) so the reference CLIs' free-form ``opts`` overrides
(e.g. ``SOLVER.BASE_LR 5e-5``) keep working verbatim.
"""

from vision_instance_seg_tpu.config.core import CfgNode as CN


def get_cfg() -> CN:
    _C = CN()

    _C.VERSION = 1
    _C.OUTPUT_DIR = "./output"
    _C.SEED = 42

    # ------------------------------------------------------------------ MODEL
    _C.MODEL = CN()
    _C.MODEL.META_ARCHITECTURE = "MaskFormer"  # MaskFormer | MaskDINO
    _C.MODEL.WEIGHTS = ""
    _C.MODEL.PIXEL_MEAN = [123.675, 116.28, 103.53]
    _C.MODEL.PIXEL_STD = [58.395, 57.12, 57.375]
    _C.MODEL.DEVICE = "tpu"  # informational; jax picks the backend

    _C.MODEL.BACKBONE = CN()
    _C.MODEL.BACKBONE.NAME = "swin"  # swin | resnet
    _C.MODEL.BACKBONE.FREEZE_AT = 0

    _C.MODEL.RESNETS = CN()
    _C.MODEL.RESNETS.DEPTH = 50
    _C.MODEL.RESNETS.NORM = "FrozenBN"  # FrozenBN | GN | LN
    _C.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    _C.MODEL.RESNETS.STEM_OUT_CHANNELS = 64

    _C.MODEL.SWIN = CN()
    _C.MODEL.SWIN.PRETRAIN_IMG_SIZE = 224
    _C.MODEL.SWIN.PATCH_SIZE = 4
    _C.MODEL.SWIN.EMBED_DIM = 96
    _C.MODEL.SWIN.DEPTHS = [2, 2, 6, 2]        # Swin-T; Swin-S [2,2,18,2]
    _C.MODEL.SWIN.NUM_HEADS = [3, 6, 12, 24]   # Swin-B: dim 128 heads [4,8,16,32]
    _C.MODEL.SWIN.WINDOW_SIZE = 7
    _C.MODEL.SWIN.MLP_RATIO = 4.0
    _C.MODEL.SWIN.QKV_BIAS = True
    _C.MODEL.SWIN.QK_SCALE = 0.0  # 0.0 -> default head_dim**-0.5
    _C.MODEL.SWIN.DROP_RATE = 0.0
    _C.MODEL.SWIN.ATTN_DROP_RATE = 0.0
    _C.MODEL.SWIN.DROP_PATH_RATE = 0.3
    _C.MODEL.SWIN.APE = False
    _C.MODEL.SWIN.PATCH_NORM = True
    _C.MODEL.SWIN.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    _C.MODEL.SWIN.USE_CHECKPOINT = False  # jax.checkpoint per block

    _C.MODEL.SEM_SEG_HEAD = CN()
    _C.MODEL.SEM_SEG_HEAD.NAME = "MaskFormerHead"
    _C.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 1  # thunderbolt (single defect class)
    _C.MODEL.SEM_SEG_HEAD.IGNORE_VALUE = 255
    _C.MODEL.SEM_SEG_HEAD.CONVS_DIM = 256
    _C.MODEL.SEM_SEG_HEAD.MASK_DIM = 256
    _C.MODEL.SEM_SEG_HEAD.NORM = "GN"
    _C.MODEL.SEM_SEG_HEAD.PIXEL_DECODER_NAME = "MSDeformAttnPixelDecoder"
    _C.MODEL.SEM_SEG_HEAD.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    _C.MODEL.SEM_SEG_HEAD.DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES = ["res3", "res4", "res5"]
    _C.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 6
    _C.MODEL.SEM_SEG_HEAD.COMMON_STRIDE = 4
    _C.MODEL.SEM_SEG_HEAD.NUM_FEATURE_LEVELS = 3  # scales fed to the decoder
    # encoder scales; above len(DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES)
    # adds stride-2 downsampled extra levels. Mask2Former default = 3; the
    # MaskDINO CLIs set 4 ("4s_dowsample1" reference yaml: res3-5 + /64)
    _C.MODEL.SEM_SEG_HEAD.TOTAL_NUM_FEATURE_LEVELS = 3
    _C.MODEL.SEM_SEG_HEAD.DEFORM_NUM_POINTS = 4
    _C.MODEL.SEM_SEG_HEAD.DEFORM_NUM_HEADS = 8
    # encoder token mixer: "deformable" (reference parity) or "full"
    # (dense flash attention — faster on TPU at 640-800px, see CLAUDE.md)
    # "deformable" (reference parity), "full" (dense flash attention),
    # "window" (TPU-native: Pallas windowed attention + cross-scale fusion)
    _C.MODEL.SEM_SEG_HEAD.ENCODER_ATTENTION = "deformable"
    _C.MODEL.SEM_SEG_HEAD.ENCODER_WINDOW_SIZE = 8
    # FPN mask-feature fusion: "last" = upstream parity (only the finest
    # encoder level feeds the FPN, maskdino_encoder out[-1]); "chain" =
    # r1-r3 behavior (all encoder levels progressively fused)
    _C.MODEL.SEM_SEG_HEAD.FPN_FUSION = "last"

    # Mask2Former head (reference gets this from Mask2Former/MaskDINO yaml)
    _C.MODEL.MASK_FORMER = CN()
    _C.MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME = "MultiScaleMaskedTransformerDecoder"
    _C.MODEL.MASK_FORMER.DEEP_SUPERVISION = True
    _C.MODEL.MASK_FORMER.NO_OBJECT_WEIGHT = 0.1
    _C.MODEL.MASK_FORMER.CLASS_WEIGHT = 2.0
    _C.MODEL.MASK_FORMER.MASK_WEIGHT = 5.0
    _C.MODEL.MASK_FORMER.DICE_WEIGHT = 5.0
    _C.MODEL.MASK_FORMER.BOX_WEIGHT = 5.0    # used by MaskDINO
    _C.MODEL.MASK_FORMER.GIOU_WEIGHT = 2.0   # used by MaskDINO
    _C.MODEL.MASK_FORMER.HIDDEN_DIM = 256
    _C.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = 100
    _C.MODEL.MASK_FORMER.NHEADS = 8
    _C.MODEL.MASK_FORMER.DROPOUT = 0.0
    _C.MODEL.MASK_FORMER.DIM_FEEDFORWARD = 2048
    _C.MODEL.MASK_FORMER.DEC_LAYERS = 10  # 9 + 1 (convention: yaml "10" = 9 layers)
    _C.MODEL.MASK_FORMER.PRE_NORM = False
    _C.MODEL.MASK_FORMER.ENFORCE_INPUT_PROJ = False
    _C.MODEL.MASK_FORMER.SIZE_DIVISIBILITY = 32
    _C.MODEL.MASK_FORMER.TRAIN_NUM_POINTS = 12544
    _C.MODEL.MASK_FORMER.OVERSAMPLE_RATIO = 3.0
    _C.MODEL.MASK_FORMER.IMPORTANCE_SAMPLE_RATIO = 0.75
    # TPU-fast criterion variants (reference-parity defaults; the training
    # CLIs switch to greedy+grid — see training/maskdino/common.py):
    # MATCHER: "hungarian" (exact; serial DFS while-loops, seconds/step on
    # TPU) | "greedy" (vectorized global-argmin, near-optimal).
    # POINT_MODE: "random" (PointRend importance sampling; element-serial
    # gathers) | "grid" (regular-grid resize, fused vectorized).
    _C.MODEL.MASK_FORMER.MATCHER = "hungarian"
    _C.MODEL.MASK_FORMER.POINT_MODE = "random"
    _C.MODEL.MASK_FORMER.TEST = CN()
    _C.MODEL.MASK_FORMER.TEST.SEMANTIC_ON = False
    _C.MODEL.MASK_FORMER.TEST.INSTANCE_ON = True
    _C.MODEL.MASK_FORMER.TEST.PANOPTIC_ON = False
    _C.MODEL.MASK_FORMER.TEST.OBJECT_MASK_THRESHOLD = 0.0
    _C.MODEL.MASK_FORMER.TEST.OVERLAP_THRESHOLD = 0.0
    _C.MODEL.MASK_FORMER.TEST.SEM_SEG_POSTPROCESSING_BEFORE_INFERENCE = False
    # derive eval/serving boxes from the predicted masks (tight box around
    # mask > 0.5) instead of the box head. Off = reference parity (MaskDINO
    # reports its regressed boxes). At small data scales the mask pathway
    # localizes long before box regression does: the M2F control (whose
    # boxes are mask-derived by construction) scores bbox AP50 36.6 on the
    # micro-overfit where regressed boxes score ~0 (docs/PERF.md r3 ladder).
    _C.MODEL.MASK_FORMER.TEST.BOX_FROM_MASK = False

    # MaskDINO-specific (reference MaskDINO config: denoising + boxes + two-stage)
    _C.MODEL.MASK_DINO = CN()
    _C.MODEL.MASK_DINO.ENABLED = False
    _C.MODEL.MASK_DINO.DN = "seg"             # "no" | "standard" | "seg"
    _C.MODEL.MASK_DINO.DN_NUM = 100           # total denoising queries
    _C.MODEL.MASK_DINO.DN_NOISE_SCALE = 0.4
    _C.MODEL.MASK_DINO.DN_LABEL_NOISE_RATIO = 0.2
    # Ramp the dn loss weight linearly 0 -> 1 over this many steps (0 = off).
    # dn regularizes at scale but taxes small-data memorization (~11 AP50 on
    # the micro-overfit ladder, docs/PERF.md) — warmup lets the matched
    # losses shape queries first.
    _C.MODEL.MASK_DINO.DN_WARMUP_STEPS = 0
    _C.MODEL.MASK_DINO.TWO_STAGE = True
    _C.MODEL.MASK_DINO.INITIAL_PRED = True
    _C.MODEL.MASK_DINO.LEARN_TGT = False
    # decoder cross-attention: "deformable" (MaskDINO parity) or "dense"
    # (TPU-native dense attention over the multi-scale tokens)
    _C.MODEL.MASK_DINO.CROSS_ATTENTION = "deformable"
    # dense cross-attention only: add a Gaussian locality bias centered on
    # each query's reference box (the TPU-native analog of deformable
    # attention's box-anchored sampling). Without it dense attention has no
    # locality prior and the box head learns an image-independent box prior
    # instead of reading the image (measured: bbox AP ~0 on the overfit demo)
    _C.MODEL.MASK_DINO.BOX_ATTN_BIAS = True
    # dense cross-attention only: per-head attention centroid/spread readout
    # feeding a zero-init geometry head that refines the reference boxes —
    # restores the positional signal that position-free value features
    # cannot carry. Default OFF: on the micro-overfit it did not recover
    # bbox AP and cost segm AP (docs/PERF.md round-3 ladder) — the box
    # bottleneck there is references far from objects, not the readout.
    _C.MODEL.MASK_DINO.GEO_READOUT = False
    # dense cross-attention only: Mask2Former-style mask-guided attention —
    # threshold the PREVIOUS layer's predicted mask at each level's
    # resolution and mask attention outside it (additive -1e9, empty-mask
    # fallback per level). Locality rides the mask pathway (which learns at
    # small data scale) instead of the reference box (which doesn't): the
    # M2F micro control scores segm 50.5 where the best box-biased dense
    # variant scores 40.6 (docs/PERF.md round-3 ladder).
    _C.MODEL.MASK_DINO.MASK_ATTN_BIAS = False
    # dense cross-attention only: Mask2Former-style per-layer level
    # round-robin — decoder layer li attends only feature level
    # (li % num_levels), coarse-to-fine, instead of all multi-scale tokens
    # at once. ~num_levels x fewer cross-attention keys per layer and the
    # M2F attention schedule (reference analog: level_index = i %
    # num_feature_levels in mask2former_transformer_decoder.py).
    _C.MODEL.MASK_DINO.DENSE_LEVEL_CYCLE = False
    _C.MODEL.MASK_DINO.INITIALIZE_BOX_TYPE = "no"
    _C.MODEL.MASK_DINO.SEMANTIC_CE_LOSS = False
    # scale on the box L1/GIoU terms in the Hungarian MATCHING cost only
    # (the box losses themselves are unaffected). 1.0 = reference parity;
    # 0.0 matches with mask+cls costs only (Mask2Former-style). See
    # models/criterion_dino.py DinoCriterionConfig.box_cost_in_match.
    _C.MODEL.MASK_DINO.BOX_COST_IN_MATCH = 1.0

    # ----------------------------------------------------------------- INPUT
    _C.INPUT = CN()
    # reference train_original.py:272-275
    _C.INPUT.MIN_SIZE_TRAIN = [480, 512, 544, 576, 608, 640]
    _C.INPUT.MAX_SIZE_TRAIN = 800
    _C.INPUT.MIN_SIZE_TEST = 640
    _C.INPUT.MAX_SIZE_TEST = 800
    _C.INPUT.RANDOM_FLIP = "horizontal"
    _C.INPUT.CROP = CN()
    _C.INPUT.CROP.ENABLED = False
    _C.INPUT.CROP.TYPE = "absolute_range"
    _C.INPUT.CROP.SIZE = [384, 600]
    _C.INPUT.FORMAT = "RGB"
    # TPU-native: fixed padded canvas so jit sees static shapes.
    # LSJ (large-scale jitter) resize into a fixed square, Mask2Former-style.
    _C.INPUT.IMAGE_SIZE = 640          # train canvas (square)
    _C.INPUT.LSJ = CN()
    _C.INPUT.LSJ.ENABLED = True
    _C.INPUT.LSJ.MIN_SCALE = 0.5
    _C.INPUT.LSJ.MAX_SCALE = 2.0
    _C.INPUT.TEST_PAD_H = 800          # eval canvas: shortest 640 / longest <=800
    _C.INPUT.TEST_PAD_W = 800          #  always fits; 800 = 25*32 (static for jit)
    _C.INPUT.MAX_INSTANCES = 100       # GT padding inside jit
    _C.INPUT.MASK_FORMAT = "bitmask"

    # -------------------------------------------------------------- DATASETS
    _C.DATASETS = CN()
    _C.DATASETS.TRAIN = []
    _C.DATASETS.TEST = []

    _C.DATALOADER = CN()
    _C.DATALOADER.NUM_WORKERS = 2
    _C.DATALOADER.PREFETCH_BATCHES = 2  # device double-buffering depth
    _C.DATALOADER.FILTER_EMPTY_ANNOTATIONS = True
    _C.DATALOADER.CACHE_IMAGES = 512    # LRU decoded-image cache entries (0 = off)

    # ---------------------------------------------------------------- SOLVER
    _C.SOLVER = CN()
    _C.SOLVER.IMS_PER_BATCH = 2
    _C.SOLVER.BASE_LR = 1e-4
    _C.SOLVER.MAX_ITER = 3000
    _C.SOLVER.STEPS = [2400, 2700]     # 80% / 90% (train_experiments.py:70)
    _C.SOLVER.GAMMA = 0.1
    _C.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"  # or WarmupCosineLR
    _C.SOLVER.WARMUP_FACTOR = 1e-3
    _C.SOLVER.WARMUP_ITERS = 100
    _C.SOLVER.WARMUP_METHOD = "linear"
    _C.SOLVER.WEIGHT_DECAY = 0.05
    _C.SOLVER.WEIGHT_DECAY_NORM = 0.0
    _C.SOLVER.WEIGHT_DECAY_EMBED = 0.0
    _C.SOLVER.OPTIMIZER = "ADAMW"      # or SGD (d2 default; momentum below)
    _C.SOLVER.MOMENTUM = 0.9
    _C.SOLVER.BACKBONE_MULTIPLIER = 0.1
    _C.SOLVER.CLIP_GRADIENTS = CN()
    _C.SOLVER.CLIP_GRADIENTS.ENABLED = True
    _C.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"  # reference fixes full_model->norm
    _C.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 0.01
    _C.SOLVER.CLIP_GRADIENTS.NORM_TYPE = 2.0
    _C.SOLVER.AMP = CN()
    _C.SOLVER.AMP.ENABLED = True       # bf16 compute on TPU
    _C.SOLVER.CHECKPOINT_PERIOD = 1000

    # ------------------------------------------------------------------ TEST
    _C.TEST = CN()
    _C.TEST.EVAL_PERIOD = 1000
    # stop after N eval rounds without segm-AP improvement (0 = off;
    # reference train_template.py HYPERPARAMS early_stopping_patience)
    _C.TEST.EARLY_STOP_PATIENCE = 0
    _C.TEST.DETECTIONS_PER_IMAGE = 100
    _C.TEST.SCORE_THRESH = 0.0
    _C.TEST.BATCH_SIZE = 1        # eval-loop batch (padded static shapes)
    # Single-warp box-restricted mask postprocess (device tight boxes +
    # one warpAffine into the original frame) instead of the detectron2
    # two-stage resize chain. ~equal AP (sub-pixel boundary differences
    # only, tested vs the parity chain); False restores the exact chain.
    _C.TEST.FAST_POSTPROCESS = True
    # Device-side per-instance mask patches: each detection's support-box
    # region is cropped into a fixed (PATCH_SIZE, PATCH_SIZE) uint8 patch
    # on device (one-hot row/col selection matmuls — MXU work, no gathers)
    # and the eval loop transfers patches instead of full (Hm, Wm) prob
    # maps (~10x fewer D2H bytes/instance; this platform's tunnel moves
    # ~50 ms/MB). Instances whose warp source footprint exceeds the patch
    # fall back to a single-row fetch of the full map, so results stay
    # byte-identical to PATCH_POSTPROCESS=False (tested).
    _C.TEST.PATCH_POSTPROCESS = True
    # 64 stands (r4 A/B): the eval profile showed 58% of the loop in
    # full-row fallbacks for patch-escaping instances, but raising the
    # patch to 128 measured WORSE end to end (4.4 vs 10.3 img/s on the
    # trained-checkpoint bench) — the 4x patch prefix bytes through the
    # ~50 ms/MB tunnel cost more than the fallbacks they avoided
    _C.TEST.PATCH_SIZE = 64

    # ------------------------------------------------------------------- TPU
    _C.TPU = CN()
    _C.TPU.MESH_AXES = ["data", "model"]
    _C.TPU.MESH_SHAPE = [-1, 1]        # -1 = all remaining devices on the data axis
    _C.TPU.COMPUTE_DTYPE = "bfloat16"  # activations/matmuls; params stay fp32
    _C.TPU.PARAM_DTYPE = "float32"
    # Measured on v5e (scan-timed, 800x800 Swin-T backbone): XLA's
    # batched-matmul window attention (~1.9 ms) beats the Pallas kernel
    # even after 8-pair packing + in-kernel geometry masks (~4.6 ms,
    # grid-step-overhead-bound at these tiny 49x32 tiles) -> default False.
    # The kernel stays available for experimentation (golden-tested).
    _C.TPU.USE_PALLAS_WINDOW_ATTN = False
    # kernels/window_attention.py fused NHWC path: partition + attention +
    # merge in ONE Pallas kernel consuming the raw (B, Hp, Wp, 3C) qkv map —
    # the stage-1/2 window partition/merge layout copies named in the
    # docs/PERF.md roofline never touch HBM. Backbone only; requires
    # MODEL.SWIN.WINDOW_SIZE % 8 == 0 (sublane alignment) — blocks with
    # other window sizes fall back to the jnp path. Parameters are
    # identical to the jnp path (same qkv/proj Denses), so checkpoints and
    # TP shardings are unaffected. Default pending TPU measurement.
    _C.TPU.WINDOW_ATTN_NHWC = False
    # kernels/msdeform_attn.py — blocked halo-window Pallas kernel for the
    # deformable encoder (6.4 ms/img at 800px/13k tokens vs ~38 ms/layer
    # for the XLA-gather jnp core); golden-tested vs the jnp core, which
    # remains the fallback for CPU and the decoder's free queries
    _C.TPU.USE_PALLAS_DEFORM_ATTN = True
    # jax.checkpoint each pixel-decoder encoder layer in backward (HBM);
    # pair with MODEL.SWIN.USE_CHECKPOINT for the backbone blocks. The
    # training CLIs enable both; forward-only inference is unaffected.
    _C.TPU.REMAT_ENCODER = False
    _C.TPU.REMAT_BACKBONE = False
    # nn.scan-fold the deformable encoder layers (one trace, stacked
    # params) — keeps the 4-scale Pallas train-step MLIR small enough for
    # the compile helper; False restores per-layer encoder_layer{i} params
    _C.TPU.SCAN_ENC_LAYERS = True
    # scan unroll: 6 (full) = loop-equivalent XLA program for inference;
    # the training CLIs and bench_train set 1 (rolled) so the fwd+bwd
    # program stays compilable at 4-scale. Param layout is unaffected.
    _C.TPU.SCAN_ENC_UNROLL = 6
    # nn.scan Swin stage bodies with >= 2 (regular, shifted) block pairs
    # (one pair trace per stage; params stack under stage{s}_blocks —
    # torch imports are restacked by utils/weights.py). Shrinks the
    # per-layer HBM->SMEM param-staging DMA tail named in the PERF.md
    # roofline and the program size of deep variants (S/B/L stage 3).
    _C.TPU.SCAN_SWIN_STAGES = True
    # unroll (in pairs): full unroll (9 covers S/B/L stage 3) keeps the
    # loop's cross-layer fusion; 1 = rolled while-loop (smallest program)
    _C.TPU.SCAN_SWIN_UNROLL = 9
    # same fold for the window-encoder layers (flagship pixel decoder):
    # (unshifted, shifted) pairs scan over stacked params
    _C.TPU.SCAN_WENC_LAYERS = True
    _C.TPU.PROFILE = False             # jax.profiler trace behind a flag
    _C.TPU.PROFILE_DIR = "/tmp/vist_trace"

    return _C.clone()
