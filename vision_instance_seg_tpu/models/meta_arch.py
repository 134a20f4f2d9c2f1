"""MaskFormer meta-architecture: backbone -> pixel decoder -> masked decoder.

Replaces the reference stack's ``MaskFormer``/``MaskDINO`` meta-arch
(detectron2 META_ARCHITECTURE, built by ``build_model`` — reference
train_original.py:29, evaluate.py:109). One flax module produces the stacked
deep-supervision predictions; the loss (criterion.py) and the inference
post-process live outside the module so train/eval steps stay pure jitted
functions over (params, batch).

Inference post-process follows Mask2Former instance inference: top-K over
query x class scores, mask-probability calibration, masks returned at 1/4
canvas resolution (small device->host transfer; final resize to the original
image size + RLE encode happen on host — engine/evaluator.py for the eval
loop, labeling_server/ai_segmentation.py for serving).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_instance_seg_tpu.models.deform_attn import DeformCoreFn
from vision_instance_seg_tpu.models.pixel_decoder import build_pixel_decoder
from vision_instance_seg_tpu.models.resnet import build_resnet
from vision_instance_seg_tpu.models.swin import AttnFn, build_swin
from vision_instance_seg_tpu.models.transformer_decoder import (
    build_transformer_decoder)


class MaskFormer(nn.Module):
    """Instance segmentation model over prebuilt submodules. Input NHWC
    float images already normalized; output (cls_layers, mask_layers)."""

    backbone: nn.Module
    pixel_decoder: nn.Module
    predictor: nn.Module
    dtype: jnp.dtype = jnp.float32

    def __call__(self, images: jnp.ndarray, deterministic: bool = True,
                 aux_masks: bool = True):
        feats = self.backbone(images.astype(self.dtype), deterministic)
        mask_features, multi_scale = self.pixel_decoder(feats)
        cls_layers, mask_layers = self.predictor(multi_scale, mask_features,
                                                 deterministic,
                                                 aux_masks=aux_masks)
        return cls_layers, mask_layers


class MaskDINO(nn.Module):
    """MaskDINO meta-arch: adds boxes, two-stage and denoising on top of the
    shared backbone + deformable pixel decoder. Training call feeds GT for
    the CDN queries; eval call omits them (reference arch selected by
    MODEL.MASK_DINO.ENABLED / META_ARCHITECTURE)."""

    backbone: nn.Module
    pixel_decoder: nn.Module
    predictor: nn.Module
    dtype: jnp.dtype = jnp.float32

    def __call__(self, images: jnp.ndarray, deterministic: bool = True,
                 gt_classes=None, gt_boxes=None, gt_valid=None, dn_rng=None,
                 aux_masks: bool = True):
        feats = self.backbone(images.astype(self.dtype), deterministic)
        mask_features, multi_scale = self.pixel_decoder(feats)
        return self.predictor(multi_scale, mask_features, deterministic,
                              gt_classes=gt_classes, gt_boxes=gt_boxes,
                              gt_valid=gt_valid, dn_rng=dn_rng,
                              aux_masks=aux_masks)


def build_model(cfg, dtype=None, window_attn_fn=None, deform_core_fn=None
                ) -> MaskFormer:
    """Build the model, auto-wiring Pallas kernels per cfg.TPU flags."""
    from vision_instance_seg_tpu.config.validate import validate_cfg
    validate_cfg(cfg)
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    if window_attn_fn is None and cfg.TPU.USE_PALLAS_WINDOW_ATTN:
        try:
            from vision_instance_seg_tpu.kernels.window_attention import (
                fused_window_attention)
            window_attn_fn = fused_window_attention
        except ImportError:
            window_attn_fn = None
    # NHWC fused partition+attention+merge kernels: the backbone takes the
    # fused-qkv variant, the window encoder the split-projection variant
    # (q/k from src+pos, v from src, canvas-pad masks). Layers whose window
    # size is not a multiple of 8 fall back to the jnp paths.
    swin_attn_fn = window_attn_fn
    wenc_attn_fn = window_attn_fn
    if window_attn_fn is None and cfg.TPU.WINDOW_ATTN_NHWC:
        from vision_instance_seg_tpu.kernels.window_attention import (
            fused_window_attention_nhwc, fused_window_attention_nhwc_split)
        swin_attn_fn = fused_window_attention_nhwc
        wenc_attn_fn = fused_window_attention_nhwc_split
    if deform_core_fn is None and cfg.TPU.USE_PALLAS_DEFORM_ATTN:
        # fused_ms_deform_attn itself dispatches: blocked Pallas kernel for
        # grid-aligned encoder queries on TPU, jnp core otherwise (CPU
        # backend, decoder's free queries)
        from vision_instance_seg_tpu.kernels.msdeform_attn import (
            fused_ms_deform_attn)
        deform_core_fn = fused_ms_deform_attn
    if cfg.MODEL.BACKBONE.NAME == "swin":
        backbone = build_swin(cfg, dtype=dtype, attn_fn=swin_attn_fn)
    elif cfg.MODEL.BACKBONE.NAME == "resnet":
        backbone = build_resnet(cfg, dtype=dtype)
    else:
        raise ValueError(f"unknown backbone {cfg.MODEL.BACKBONE.NAME}")
    pixel_decoder = build_pixel_decoder(cfg, dtype=dtype,
                                        core_fn=deform_core_fn,
                                        attn_fn=wenc_attn_fn)
    if is_maskdino(cfg):
        from vision_instance_seg_tpu.models.maskdino_decoder import (
            build_maskdino_decoder)
        return MaskDINO(backbone=backbone, pixel_decoder=pixel_decoder,
                        predictor=build_maskdino_decoder(
                            cfg, dtype=dtype, core_fn=deform_core_fn),
                        dtype=dtype)
    return MaskFormer(
        backbone=backbone,
        pixel_decoder=pixel_decoder,
        predictor=build_transformer_decoder(cfg, dtype=dtype),
        dtype=dtype)


def is_maskdino(cfg) -> bool:
    return (cfg.MODEL.META_ARCHITECTURE == "MaskDINO"
            or cfg.MODEL.MASK_DINO.ENABLED)


def normalize_image(images: jnp.ndarray, cfg) -> jnp.ndarray:
    """(B, H, W, 3) RGB 0-255 -> normalized (reference PIXEL_MEAN/STD).

    INPUT.FORMAT follows detectron2: loaders decode RGB; "BGR" flips the
    channel order BEFORE normalization so PIXEL_MEAN/STD (given in FORMAT
    order) and BGR-trained conv stems (e.g. d2 MSRA R-50 pkls) apply
    unchanged. The reference MaskDINO/Mask2Former configs use "RGB".
    """
    if cfg.INPUT.FORMAT == "BGR":
        images = images[..., ::-1]
    mean = jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32)
    return (images - mean) / std


def instance_inference(cls_logits: jnp.ndarray, mask_logits: jnp.ndarray,
                       num_classes: int, topk: int = 100
                       ) -> Dict[str, jnp.ndarray]:
    """Mask2Former instance inference for ONE image (final layer).

    cls_logits (Q, C+1); mask_logits (Q, Hm, Wm) at 1/4 canvas resolution.
    Returns scores (K,), labels (K,), mask_probs (K, Hm, Wm) — all static
    shapes, fully jittable/vmappable.
    """
    q = cls_logits.shape[0]
    scores = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[:, :-1]
    flat = scores.reshape(-1)                            # Q*C
    k = min(topk, flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat, k)
    query_idx = top_idx // num_classes
    labels = top_idx % num_classes
    masks = mask_logits[query_idx].astype(jnp.float32)   # (K, Hm, Wm)
    probs = jax.nn.sigmoid(masks)
    binm = (probs > 0.5).astype(jnp.float32)
    # mask-probability calibration (Mask2Former: score *= mean prob in mask)
    mask_score = (probs * binm).sum((1, 2)) / (binm.sum((1, 2)) + 1e-6)
    return {"scores": top_scores * mask_score,
            "labels": labels,
            "mask_probs": probs}


def maskdino_instance_inference(cls_logits: jnp.ndarray,
                                mask_logits: jnp.ndarray,
                                boxes: jnp.ndarray, num_classes: int,
                                topk: int = 100) -> Dict[str, jnp.ndarray]:
    """MaskDINO inference for ONE image: sigmoid scores, top-K over QxC.

    cls_logits (Q, C) — no no-object channel — for the default focal
    classifier, or (Q, C+1) under MODEL.MASK_DINO.SEMANTIC_CE_LOSS (softmax
    with the no-object channel dropped); boxes (Q, 4) cxcywh in [0,1].
    """
    if cls_logits.shape[-1] == num_classes + 1:      # SEMANTIC_CE_LOSS
        scores = jax.nn.softmax(cls_logits.astype(jnp.float32),
                                axis=-1)[:, :-1]
    else:
        scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    flat = scores.reshape(-1)
    k = min(topk, flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat, k)
    query_idx = top_idx // num_classes
    labels = top_idx % num_classes
    masks = mask_logits[query_idx].astype(jnp.float32)
    probs = jax.nn.sigmoid(masks)
    binm = (probs > 0.5).astype(jnp.float32)
    mask_score = (probs * binm).sum((1, 2)) / (binm.sum((1, 2)) + 1e-6)
    from vision_instance_seg_tpu.models.box_ops import box_cxcywh_to_xyxy
    return {"scores": top_scores * mask_score,
            "labels": labels,
            "mask_probs": probs,
            "boxes": box_cxcywh_to_xyxy(boxes[query_idx])}


def make_inference_fn(model, cfg):
    """Jitted batch inference: batch dict -> per-image top-K instances."""
    num_classes = cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES
    topk = cfg.TEST.DETECTIONS_PER_IMAGE
    dino = isinstance(model, MaskDINO)
    patch_size = (int(cfg.TEST.get("PATCH_SIZE", 64))
                  if cfg.TEST.get("PATCH_POSTPROCESS", False)
                  and cfg.TEST.get("FAST_POSTPROCESS", True) else 0)

    def infer(params, images):
        images = normalize_image(images, cfg)
        if dino:
            out = model.apply(params, images, deterministic=True,
                              aux_masks=False)
            res = jax.vmap(
                lambda c, m, bx: maskdino_instance_inference(
                    c, m, bx, num_classes, topk)
            )(out["pred_logits"][-1], out["pred_masks"][-1],
              out["pred_boxes"][-1])
        else:
            cls_layers, mask_layers = model.apply(params, images,
                                                  deterministic=True,
                                                  aux_masks=False)
            res = jax.vmap(
                lambda c, m: instance_inference(c, m, num_classes, topk)
            )(cls_layers[-1], mask_layers[-1])
        res = dict(res)
        # final scores are mask-quality reweighted (score *= mean in-mask
        # prob), so the top_k order no longer holds; re-sort descending ON
        # DEVICE so the evaluator can D2H only the above-threshold PREFIX
        # of the dominant (K, Hm, Wm) tensor. Masks are permuted with a
        # one-hot matmul (MXU) — an XLA row gather is element-serial on TPU
        order = jnp.argsort(-res["scores"], axis=-1)
        res["scores"] = jnp.take_along_axis(res["scores"], order, axis=-1)
        res["labels"] = jnp.take_along_axis(res["labels"], order, axis=-1)
        if "boxes" in res:
            res["boxes"] = jnp.take_along_axis(res["boxes"],
                                               order[..., None], axis=1)
        onehot = jax.nn.one_hot(order, res["mask_probs"].shape[1],
                                dtype=res["mask_probs"].dtype)
        res["mask_probs"] = jnp.einsum("bik,bkhw->bihw", onehot,
                                       res["mask_probs"])
        # tight integer boxes around (prob > 0.5) at mask resolution, +1 px
        # margin: bilinear resampling is a convex combination, so any
        # resampled pixel > 0.5 has a source pixel > 0.5 in its 1-px
        # footprint — the host postprocess only resizes/encodes inside the
        # box (empty box = provably empty final mask, skipped outright)
        res["mask_boxes"] = _mask_support_boxes(res["mask_probs"])
        # mask probs leave the device uint8-quantized (x255): quarter of
        # the f32 D2H bytes of the dominant output tensor; the 0.5 decision
        # boundary moves by <1/510 in probability — far below the bilinear
        # requantization the parity chain already tolerates
        res["mask_probs"] = jnp.round(
            res["mask_probs"] * 255.0).astype(jnp.uint8)
        if patch_size:
            # fixed-size per-instance crops of the quantized map: the eval
            # loop D2Hs these (~P*P bytes/instance) instead of full (Hm, Wm)
            # rows; instances whose warp footprint escapes the patch fall
            # back to a full-row fetch (engine/evaluator.py _patch_fits)
            res["patch_origin"], res["mask_patches"] = _extract_mask_patches(
                res["mask_probs"], res["mask_boxes"], patch_size)
        return res

    return jax.jit(infer)


def _extract_mask_patches(mask_probs: jnp.ndarray, mask_boxes: jnp.ndarray,
                          p: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop each instance's support-box region into a fixed (p, p) patch.

    mask_probs (B, K, Hm, Wm) uint8; mask_boxes (B, K, 4) int32 xyxy at
    mask resolution (_mask_support_boxes). Returns origins (B, K, 2) int32
    (x0p, y0p) and patches (B, K, p, p) uint8 with
    ``patch[i, j] == mask_probs[y0p + i, x0p + j]`` exactly (0 past the map
    edge). Origins center the box and clip to the map, so any box with >=
    (p - box_side) / 2 px of slack fits with margin for the host warp's
    bilinear footprint. Selection is two one-hot matmuls per instance (MXU
    work) — an XLA row gather is element-serial on TPU. Exact: each output
    element is a sum with exactly one nonzero term; HIGHEST precision keeps
    the 0-255 integers bit-exact through the f32 matmul.
    """
    hm, wm = mask_probs.shape[-2:]
    x0, y0, x1, y1 = (mask_boxes[..., i] for i in range(4))
    x0p = jnp.clip(x0 - (p - (x1 - x0)) // 2, 0, max(wm - p, 0))
    y0p = jnp.clip(y0 - (p - (y1 - y0)) // 2, 0, max(hm - p, 0))
    pi = jnp.arange(p, dtype=jnp.int32)[:, None]
    rows = (y0p[..., None, None] + pi
            == jnp.arange(hm, dtype=jnp.int32)).astype(jnp.float32)
    cols = (x0p[..., None, None] + pi
            == jnp.arange(wm, dtype=jnp.int32)).astype(jnp.float32)
    tmp = jnp.einsum("bkph,bkhw->bkpw", rows,
                     mask_probs.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    patches = jnp.einsum("bkpw,bkqw->bkpq", tmp, cols,
                         precision=jax.lax.Precision.HIGHEST)
    return (jnp.stack([x0p, y0p], -1),
            jnp.round(patches).astype(jnp.uint8))


def _mask_support_boxes(mask_probs: jnp.ndarray) -> jnp.ndarray:
    """(..., K, Hm, Wm) probs -> (..., K, 4) int32 (x0, y0, x1, y1),
    exclusive upper bounds, +1 margin, clipped; (0, 0, 0, 0) when empty."""
    h, w = mask_probs.shape[-2:]
    binm = mask_probs > 0.5
    rows = binm.any(-1)
    cols = binm.any(-2)
    yi = jnp.arange(h, dtype=jnp.int32)
    xi = jnp.arange(w, dtype=jnp.int32)
    y0 = jnp.min(jnp.where(rows, yi, h), -1) - 1
    y1 = jnp.max(jnp.where(rows, yi, -1), -1) + 2
    x0 = jnp.min(jnp.where(cols, xi, w), -1) - 1
    x1 = jnp.max(jnp.where(cols, xi, -1), -1) + 2
    valid = rows.any(-1)
    box = jnp.stack([jnp.clip(x0, 0, w), jnp.clip(y0, 0, h),
                     jnp.clip(x1, 0, w), jnp.clip(y1, 0, h)], -1)
    return jnp.where(valid[..., None], box, 0).astype(jnp.int32)
