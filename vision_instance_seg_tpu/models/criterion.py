"""Set-prediction criterion: CE + point-sampled mask BCE + dice.

Replaces the reference stack's ``SetCriterion`` (Mask2Former/MaskDINO
criterion with uncertainty point-rend sampling, reached via build_model —
reference train_original.py:29; loss weights MODEL.MASK_FORMER.*_WEIGHT).

TPU-native design:
- Fully jitted, static shapes: GT padded to MAX_INSTANCES with a validity
  mask; invalid pairs contribute exactly zero loss.
- Importance point sampling (oversample 3x, top-uncertainty 75% + random
  25%) implemented with static-shape ``top_k`` — never a boolean gather.
- Deep supervision: the (L+1)-layer stacked predictions are folded through
  ``jax.vmap`` over the layer axis with fresh match per layer (official
  Mask2Former semantics), then summed.
- Normalization by total #GT in the global batch (the whole sharded batch
  lives in one jit program, so the sum is already global under pjit —
  no detectron2-style comm.all_reduce needed).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vision_instance_seg_tpu.models.matcher import (
    MatchResult, grid_sample_masks, hungarian_match, point_sample_nhw)


class CriterionConfig(NamedTuple):
    num_classes: int = 1
    eos_coef: float = 0.1            # NO_OBJECT_WEIGHT
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    deep_supervision: bool = True
    # TPU-fast criterion variants (training CLIs enable both; the defaults
    # keep reference semantics):
    # matcher: "hungarian" (exact, serial DFS loops — seconds/step on TPU)
    #          or "greedy" (vectorized global-argmin, near-optimal).
    # point_mode: "random" (PointRend importance sampling, element-serial
    #             bilinear gathers) or "grid" (regular-grid resize, fused).
    matcher: str = "hungarian"
    point_mode: str = "random"


def criterion_config_from_cfg(cfg) -> CriterionConfig:
    m = cfg.MODEL.MASK_FORMER
    return CriterionConfig(
        num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        eos_coef=m.NO_OBJECT_WEIGHT, class_weight=m.CLASS_WEIGHT,
        mask_weight=m.MASK_WEIGHT, dice_weight=m.DICE_WEIGHT,
        num_points=m.TRAIN_NUM_POINTS, oversample_ratio=m.OVERSAMPLE_RATIO,
        importance_sample_ratio=m.IMPORTANCE_SAMPLE_RATIO,
        deep_supervision=m.DEEP_SUPERVISION,
        matcher=m.get("MATCHER", "hungarian"),
        point_mode=m.get("POINT_MODE", "random"))


def _uniform_points(key, n: int) -> jnp.ndarray:
    return jax.random.uniform(key, (n, 2), jnp.float32)


def importance_sample_points(key, pair_logits: jnp.ndarray,
                             num_points: int, oversample: float,
                             importance_ratio: float) -> jnp.ndarray:
    """Per-pair point coords (N, P, 2) biased to uncertain regions.

    pair_logits: (N, H, W) predicted mask logits for the N pairs.
    PointRend scheme: sample P*oversample random points, keep the
    top-(importance_ratio*P) most uncertain (|logit| smallest), fill the
    rest with fresh uniform points.
    """
    n = pair_logits.shape[0]
    n_sampled = int(num_points * oversample)
    n_uncertain = int(importance_ratio * num_points)
    n_random = num_points - n_uncertain
    k1, k2 = jax.random.split(key)
    cand = jax.random.uniform(k1, (n, n_sampled, 2), jnp.float32)

    def sample_one(logits, pts):
        vals = point_sample_nhw(logits[None], pts)[0]       # (n_sampled,)
        unc = -jnp.abs(vals)                                 # higher = less sure
        _, idx = jax.lax.top_k(unc, n_uncertain)
        return pts[idx]

    top = jax.vmap(sample_one)(pair_logits, cand)            # (N, n_unc, 2)
    rnd = jax.random.uniform(k2, (n, n_random, 2), jnp.float32)
    return jnp.concatenate([top, rnd], axis=1)


def _one_layer_losses(key, cls_logits, mask_logits, gt_classes, gt_masks,
                      gt_valid, cc: CriterionConfig,
                      gt_grid=None) -> Dict[str, jnp.ndarray]:
    """Losses for one decoder layer's predictions.

    cls_logits (B, Q, C+1); mask_logits (B, Q, Hm, Wm);
    gt_classes (B, M); gt_masks (B, M, H, W) in {0,1}; gt_valid (B, M).
    gt_grid: precomputed (B, M, P) {0,1} grid samples (point_mode="grid").
    """
    b, q = cls_logits.shape[:2]
    m = gt_classes.shape[1]
    k_match, k_loss = jax.random.split(key)
    grid_mode = cc.point_mode == "grid"

    num_masks = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)

    # ---- matching costs on sampled mask values
    if grid_mode:
        # regular-grid resize: fused vectorized ops, no per-point gathers
        pred_pts = grid_sample_masks(mask_logits.astype(jnp.float32),
                                     cc.num_points)          # (B, Q, P)
        gt_pts_bin = gt_grid
    else:
        # uniform random points (official matcher behavior)
        match_pts = _uniform_points(k_match, cc.num_points)
        pred_pts = jax.vmap(lambda ml: point_sample_nhw(ml, match_pts))(
            mask_logits.astype(jnp.float32))                 # (B, Q, P)
        gt_pts = jax.vmap(lambda gm: point_sample_nhw(gm, match_pts))(
            gt_masks.astype(jnp.float32))                    # (B, M, P)
        gt_pts_bin = (gt_pts > 0.5).astype(jnp.float32)
    match = hungarian_match(cls_logits, None, gt_classes, gt_pts_bin,
                            pred_pts, gt_valid, cc.class_weight,
                            cc.mask_weight, cc.dice_weight,
                            method=cc.matcher)

    # ---- classification loss over all queries
    target_cls = jnp.full((b, q), cc.num_classes, jnp.int32)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, m))
    qidx = jnp.where(match.gt_valid, match.gt_to_query, q)   # q = OOB -> drop
    target_cls = target_cls.at[bidx, qidx].set(
        jnp.clip(gt_classes, 0, cc.num_classes - 1), mode="drop")
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target_cls[..., None], axis=-1)[..., 0]
    w = jnp.where(target_cls == cc.num_classes, cc.eos_coef, 1.0)
    loss_ce = (nll * w).sum() / w.sum()

    # ---- mask losses on matched pairs
    if grid_mode:
        # reuse the matching-grid values: select matched queries' rows
        pred_v = jnp.take_along_axis(
            pred_pts, match.gt_to_query[:, :, None], axis=1
        ).reshape(b * m, -1)                                 # (B*M, P)
        gt_v = gt_pts_bin.reshape(b * m, -1)
    else:
        # PointRend importance sampling (oversample + top-uncertainty)
        matched_logits = jnp.take_along_axis(
            mask_logits, match.gt_to_query[:, :, None, None], axis=1)
        flat_pred = matched_logits.reshape(b * m, *matched_logits.shape[2:])
        pts = importance_sample_points(
            k_loss, flat_pred.astype(jnp.float32), cc.num_points,
            cc.oversample_ratio, cc.importance_sample_ratio)  # (B*M, P, 2)
        pred_v = jax.vmap(lambda lg, p: point_sample_nhw(lg[None], p)[0])(
            flat_pred.astype(jnp.float32), pts)               # (B*M, P)
        flat_gt = gt_masks.reshape(
            b * m, *gt_masks.shape[2:]).astype(jnp.float32)
        gt_v = jax.vmap(
            lambda g, p: point_sample_nhw(g[None], p)[0])(flat_gt, pts)
        gt_v = (gt_v > 0.5).astype(jnp.float32)

    valid = match.gt_valid.reshape(b * m).astype(jnp.float32)
    bce = jax.nn.softplus(pred_v) - pred_v * gt_v            # = BCE-with-logits
    loss_mask = ((bce.mean(-1) * valid).sum()) / num_masks

    pr = jax.nn.sigmoid(pred_v)
    num = 2.0 * (pr * gt_v).sum(-1)
    den = pr.sum(-1) + gt_v.sum(-1)
    dice = 1.0 - (num + 1.0) / (den + 1.0)
    loss_dice = ((dice * valid).sum()) / num_masks

    return {"loss_ce": loss_ce, "loss_mask": loss_mask, "loss_dice": loss_dice}


def set_criterion(key, cls_logits_layers, mask_logits_layers, gt_classes,
                  gt_masks, gt_valid, cc: CriterionConfig
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Deep-supervised total loss.

    cls_logits_layers: (L+1, B, Q, C+1); mask_logits_layers: (L+1, B, Q, Hm, Wm).
    Returns (total, dict of per-component losses for the FINAL layer plus
    aggregate aux loss).
    """
    n_layers = cls_logits_layers.shape[0]
    # GT grid samples are layer-invariant — compute once outside the scan
    gt_grid = None
    if cc.point_mode == "grid":
        gt_grid = (grid_sample_masks(gt_masks.astype(jnp.float32),
                                     cc.num_points) > 0.5).astype(jnp.float32)
    if not cc.deep_supervision:
        ld = _one_layer_losses(key, cls_logits_layers[-1],
                               mask_logits_layers[-1], gt_classes, gt_masks,
                               gt_valid, cc, gt_grid=gt_grid)
        total = (cc.class_weight * ld["loss_ce"]
                 + cc.mask_weight * ld["loss_mask"]
                 + cc.dice_weight * ld["loss_dice"])
        return total, {**ld, "loss_total": total}

    # one traced layer body, scanned over the (L+1) stacked predictions —
    # keeps the jit graph L-times smaller than a Python loop
    keys = jax.random.split(key, n_layers)

    def body(carry, xs):
        k, cls_l, mask_l = xs
        ld = _one_layer_losses(k, cls_l, mask_l, gt_classes, gt_masks,
                               gt_valid, cc, gt_grid=gt_grid)
        weighted = (cc.class_weight * ld["loss_ce"]
                    + cc.mask_weight * ld["loss_mask"]
                    + cc.dice_weight * ld["loss_dice"])
        return carry + weighted, (weighted,
                                  jnp.stack([ld["loss_ce"], ld["loss_mask"],
                                             ld["loss_dice"]]))

    total, (per_layer, comps) = jax.lax.scan(
        body, jnp.zeros((), jnp.float32),
        (keys, cls_logits_layers, mask_logits_layers))
    logs = {"loss_ce": comps[-1, 0], "loss_mask": comps[-1, 1],
            "loss_dice": comps[-1, 2],
            "loss_aux": total - per_layer[-1], "loss_total": total}
    return total, logs
