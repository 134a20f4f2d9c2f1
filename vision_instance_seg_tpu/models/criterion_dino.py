"""MaskDINO set criterion: focal cls + mask (point BCE/dice) + box (L1/GIoU)
+ denoising losses, fully jitted with static shapes.

Replaces MaskDINO's SetCriterion/matcher (reference stack via build_model,
train_original.py:29). Differences from the Mask2Former criterion
(criterion.py): sigmoid-focal classification over ``num_classes`` logits
(no no-object channel), box losses with iterative-refinement deep
supervision, known-assignment denoising losses (positive dn query i of each
group supervises GT slot i; negatives supervise background), and an extra
"encoder" supervision level for the two-stage proposals.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from vision_instance_seg_tpu.models.box_ops import (
    box_cxcywh_to_xyxy, generalized_box_iou)
from vision_instance_seg_tpu.models.criterion import (
    _uniform_points, importance_sample_points)
from vision_instance_seg_tpu.models.matcher import (
    assign, batch_dice_cost, batch_sigmoid_ce_cost, grid_sample_masks,
    point_sample_nhw)

_INVALID_COST = 1e6


class DinoCriterionConfig(NamedTuple):
    num_classes: int = 1
    class_weight: float = 4.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    box_weight: float = 5.0
    giou_weight: float = 2.0
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    deep_supervision: bool = True
    # MODEL.MASK_DINO.SEMANTIC_CE_LOSS: softmax CE over num_classes+1
    # logits (no-object channel, weight no_object_weight) instead of focal
    semantic_ce_loss: bool = False
    no_object_weight: float = 0.1
    # see criterion.CriterionConfig: TPU-fast variants vs reference parity
    matcher: str = "hungarian"
    point_mode: str = "random"
    # scale on the box L1/GIoU terms in the MATCHING cost only (losses are
    # unaffected). While the box head is untrained its costs are noise at
    # weight 5+2 — they dominate the mask/cls costs, the assignment churns,
    # and a churned query's dice-optimal mask is the fuzzy UNION of the GTs
    # (observed on the overfit demo: the top-6 detections shared one
    # identical union mask). Mask2Former's matcher has no box costs, which
    # is why it never collapses this way. 1.0 = reference parity.
    box_cost_in_match: float = 1.0


def dino_criterion_config_from_cfg(cfg) -> DinoCriterionConfig:
    m = cfg.MODEL.MASK_FORMER
    return DinoCriterionConfig(
        num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        class_weight=m.CLASS_WEIGHT, mask_weight=m.MASK_WEIGHT,
        dice_weight=m.DICE_WEIGHT, box_weight=m.BOX_WEIGHT,
        giou_weight=m.GIOU_WEIGHT, num_points=m.TRAIN_NUM_POINTS,
        oversample_ratio=m.OVERSAMPLE_RATIO,
        importance_sample_ratio=m.IMPORTANCE_SAMPLE_RATIO,
        deep_supervision=m.DEEP_SUPERVISION,
        semantic_ce_loss=cfg.MODEL.MASK_DINO.SEMANTIC_CE_LOSS,
        no_object_weight=m.NO_OBJECT_WEIGHT,
        matcher=m.get("MATCHER", "hungarian"),
        point_mode=m.get("POINT_MODE", "random"),
        box_cost_in_match=float(
            cfg.MODEL.MASK_DINO.get("BOX_COST_IN_MATCH", 1.0)))


def sigmoid_focal_loss(logits, targets, alpha: float, gamma: float):
    """Elementwise focal loss; logits/targets same shape."""
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        a_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = a_t * loss
    return loss


def _focal_class_cost(cls_logits, gt_classes, alpha, gamma):
    """(Q, C) logits x (M,) classes -> (Q, M) DINO focal matching cost."""
    p = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    neg = (1 - alpha) * (p ** gamma) * (-jnp.log1p(-p + 1e-8))
    pos = alpha * ((1 - p) ** gamma) * (-jnp.log(p + 1e-8))
    idx = jnp.clip(gt_classes, 0, cls_logits.shape[1] - 1)
    return pos[:, idx] - neg[:, idx]


def _ce_class_cost(cls_logits, gt_classes, num_classes):
    """SEMANTIC_CE_LOSS matching cost: -softmax_prob[gt] ((Q,C+1) logits)."""
    p = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    idx = jnp.clip(gt_classes, 0, num_classes - 1)
    return -p[:, idx]


def dino_hungarian_match(cls_logits, pred_pts, gt_pts, pred_boxes, gt_boxes,
                         gt_classes, gt_valid, cc: DinoCriterionConfig):
    """Per-batch Hungarian with class+mask+dice+box+giou costs.

    Shapes: cls (B,Q,C); pred_pts (B,Q,P); gt_pts (B,M,P);
    pred_boxes/gt_boxes (B,{Q,M},4) cxcywh; -> gt_to_query (B,M) int32.
    """

    def per_image(cls_l, pr_pts, g_pts, pr_box, g_box, g_cls, valid):
        if cc.semantic_ce_loss:
            c_class = _ce_class_cost(cls_l, g_cls, cc.num_classes)
        else:
            c_class = _focal_class_cost(cls_l, g_cls, cc.focal_alpha,
                                        cc.focal_gamma)
        c_mask = batch_sigmoid_ce_cost(pr_pts.astype(jnp.float32),
                                       g_pts.astype(jnp.float32))
        c_dice = batch_dice_cost(pr_pts.astype(jnp.float32),
                                 g_pts.astype(jnp.float32))
        c_l1 = jnp.abs(pr_box[:, None] - g_box[None]).sum(-1)
        c_giou = -generalized_box_iou(box_cxcywh_to_xyxy(pr_box),
                                      box_cxcywh_to_xyxy(g_box))
        bs = cc.box_cost_in_match
        cost = (cc.class_weight * c_class + cc.mask_weight * c_mask
                + cc.dice_weight * c_dice + bs * cc.box_weight * c_l1
                + bs * cc.giou_weight * c_giou)
        cost = jnp.where(valid[None, :], cost, _INVALID_COST)
        i, j = assign(cost.T, cc.matcher)
        return jnp.zeros((cost.shape[1],), jnp.int32).at[i].set(
            j.astype(jnp.int32))

    return jax.vmap(per_image)(cls_logits, pred_pts, gt_pts, pred_boxes,
                               gt_boxes, gt_classes, gt_valid)


def _matched_losses(key, cls_logits, mask_logits, boxes, gt_classes,
                    gt_masks, gt_boxes, gt_valid, gt_to_query,
                    cc: DinoCriterionConfig, with_masks: bool = True,
                    pred_grid=None, gt_grid=None) -> Dict[str, jnp.ndarray]:
    """Losses given an assignment. All padded-invalid pairs contribute 0.

    point_mode="grid": pred_grid (B, Q', P) and gt_grid (B, M, P) carry the
    precomputed regular-grid samples (no per-point gathers)."""
    b, q = cls_logits.shape[:2]
    m = gt_classes.shape[1]
    num_masks = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, m))

    qidx = jnp.where(gt_valid, gt_to_query, q)
    cls_t = jnp.clip(gt_classes, 0, cc.num_classes - 1)
    if cc.semantic_ce_loss:
        # softmax CE with a no-object channel, no-object weight 0.1
        # (same convention as the Mask2Former criterion)
        target_cls = jnp.full((b, q), cc.num_classes, jnp.int32)
        target_cls = target_cls.at[bidx, qidx].set(cls_t, mode="drop")
        logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, target_cls[..., None],
                                   axis=-1)[..., 0]
        wce = jnp.where(target_cls == cc.num_classes, cc.no_object_weight,
                        1.0)
        loss_cls = (nll * wce).sum() / wce.sum()
    else:
        # focal classification: one-hot targets at matched queries.
        # DINO normalization: elementwise-sum / num_boxes. (Round-1 bug:
        # "mean(classes) * Q / num_boxes" overweighted cls by Q/C = ~100x
        # with one class and crippled MaskDINO training — VERDICT r1.)
        onehot = jnp.zeros((b, q, cc.num_classes), jnp.float32)
        onehot = onehot.at[bidx, qidx, cls_t].set(1.0, mode="drop")
        loss_cls = sigmoid_focal_loss(cls_logits.astype(jnp.float32), onehot,
                                      cc.focal_alpha, cc.focal_gamma)
        loss_cls = loss_cls.sum() / num_masks

    # boxes
    pr_box = jnp.take_along_axis(boxes, gt_to_query[..., None], axis=1)
    l1 = jnp.abs(pr_box - gt_boxes).sum(-1)
    giou = jax.vmap(lambda a, bx: jnp.diagonal(
        generalized_box_iou(box_cxcywh_to_xyxy(a), box_cxcywh_to_xyxy(bx))))(
        pr_box, gt_boxes)
    vf = gt_valid.astype(jnp.float32)
    loss_bbox = (l1 * vf).sum() / num_masks
    loss_giou = ((1.0 - giou) * vf).sum() / num_masks

    out = {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
           "loss_giou": loss_giou}
    if not with_masks:
        out["loss_mask"] = jnp.zeros(())
        out["loss_dice"] = jnp.zeros(())
        return out

    # masks on matched pairs
    if cc.point_mode == "grid":
        pred_v = jnp.take_along_axis(
            pred_grid, gt_to_query[:, :, None], axis=1).reshape(b * m, -1)
        gt_v = gt_grid.reshape(b * m, -1)
    else:
        # importance-sampled points (PointRend scheme)
        matched = jnp.take_along_axis(
            mask_logits, gt_to_query[:, :, None, None], axis=1)
        flat_pred = matched.reshape(
            b * m, *matched.shape[2:]).astype(jnp.float32)
        pts = importance_sample_points(key, flat_pred, cc.num_points,
                                       cc.oversample_ratio,
                                       cc.importance_sample_ratio)
        pred_v = jax.vmap(lambda lg, p: point_sample_nhw(lg[None], p)[0])(
            flat_pred, pts)
        flat_gt = gt_masks.reshape(
            b * m, *gt_masks.shape[2:]).astype(jnp.float32)
        gt_v = (jax.vmap(lambda g, p: point_sample_nhw(g[None], p)[0])(
            flat_gt, pts) > 0.5).astype(jnp.float32)
    valid = gt_valid.reshape(b * m).astype(jnp.float32)
    bce = jax.nn.softplus(pred_v) - pred_v * gt_v
    out["loss_mask"] = (bce.mean(-1) * valid).sum() / num_masks
    pr = jax.nn.sigmoid(pred_v)
    dice = 1.0 - (2 * (pr * gt_v).sum(-1) + 1) / (pr.sum(-1) + gt_v.sum(-1) + 1)
    out["loss_dice"] = (dice * valid).sum() / num_masks
    return out


def _weighted(ld: Dict[str, jnp.ndarray], cc: DinoCriterionConfig):
    return (cc.class_weight * ld["loss_cls"]
            + cc.mask_weight * ld["loss_mask"]
            + cc.dice_weight * ld["loss_dice"]
            + cc.box_weight * ld["loss_bbox"]
            + cc.giou_weight * ld["loss_giou"])


def _dn_losses(key, cls_logits, mask_logits, boxes, dn_meta, gt_classes,
               gt_masks, gt_boxes, gt_valid, cc: DinoCriterionConfig,
               gt_grid=None):
    """Known-assignment CDN losses over the dn prefix of the query axis."""
    groups, m = dn_meta["groups"], dn_meta["max_gt"]
    b = cls_logits.shape[0]
    pred_grid = None
    if cc.point_mode == "grid":
        pred_grid = grid_sample_masks(mask_logits.astype(jnp.float32),
                                      cc.num_points)
    num_masks = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0) * groups

    # classification over ALL dn queries: pos -> gt class, neg -> background
    pos_mask = dn_meta["pos_mask"]                       # (B, T)
    rep_cls = jnp.tile(jnp.clip(gt_classes, 0, cc.num_classes - 1),
                       (1, 2 * groups))                  # (B, T)
    dn_valid = jnp.tile(gt_valid, (1, 2 * groups))
    if cc.semantic_ce_loss:
        # pos dn -> gt class, neg dn -> no-object; padded dn slots excluded
        target_cls = jnp.where(pos_mask, rep_cls, cc.num_classes)
        logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, target_cls[..., None],
                                   axis=-1)[..., 0]
        wce = jnp.where(pos_mask, 1.0, cc.no_object_weight) \
            * dn_valid.astype(jnp.float32)
        loss_cls = (nll * wce).sum() / jnp.maximum(wce.sum(), 1.0)
    else:
        onehot = jax.nn.one_hot(rep_cls, cc.num_classes) \
            * pos_mask[..., None].astype(jnp.float32)
        # same DINO normalization as the match branch: elementwise sum over
        # the (valid) dn queries / (num_boxes * groups); padded dn slots
        # masked out (the torch reference is ragged, nothing to mask)
        loss_cls = sigmoid_focal_loss(cls_logits.astype(jnp.float32), onehot,
                                      cc.focal_alpha, cc.focal_gamma)
        loss_cls = (loss_cls.sum(-1) * dn_valid).sum() / jnp.maximum(
            num_masks, 1.0)

    # box + mask losses on positive dn queries only, assignment = identity
    total = jnp.zeros(())
    logs = {"loss_cls": loss_cls, "loss_bbox": jnp.zeros(()),
            "loss_giou": jnp.zeros(()), "loss_mask": jnp.zeros(()),
            "loss_dice": jnp.zeros(())}
    keys = jax.random.split(key, groups)
    for g in range(groups):
        s = g * 2 * m
        idx = jnp.broadcast_to(jnp.arange(s, s + m)[None], (b, m)
                               ).astype(jnp.int32)
        ld = _matched_losses(keys[g], cls_logits, mask_logits, boxes,
                             gt_classes, gt_masks, gt_boxes, gt_valid,
                             idx, cc, pred_grid=pred_grid, gt_grid=gt_grid)
        # cls is handled globally above (incl. negatives); drop per-group cls
        for k in ("loss_bbox", "loss_giou", "loss_mask", "loss_dice"):
            logs[k] = logs[k] + ld[k] / groups
    total = cc.class_weight * loss_cls + _weighted(
        {**logs, "loss_cls": jnp.zeros(())}, cc)
    return total, logs


def maskdino_criterion(key, outputs: Dict, gt_classes, gt_masks,
                       gt_boxes_cxcywh, gt_valid,
                       cc: DinoCriterionConfig,
                       dn_scale=1.0
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total MaskDINO loss over all decoder layers + enc level + dn.

    ``dn_scale`` (scalar, may be traced) multiplies the denoising-loss
    contribution: MODEL.MASK_DINO.DN_WARMUP_STEPS ramps it 0 -> 1 so dn —
    a regularizer that pays at scale but taxes small-data memorization by
    ~11 AP50 (docs/PERF.md micro ladder) — phases in after the matched
    losses have shaped the queries.
    """
    cls_layers = outputs["pred_logits"]      # (L, B, T+Q, C)
    mask_layers = outputs["pred_masks"]
    box_layers = outputs["pred_boxes"]
    dn_meta = outputs.get("dn_meta")
    t = dn_meta["total"] if dn_meta else 0

    n_layers = cls_layers.shape[0]
    keys = jax.random.split(key, n_layers + 2)
    total = jnp.zeros(())
    logs: Dict[str, jnp.ndarray] = {}

    grid_mode = cc.point_mode == "grid"
    if grid_mode:
        gt_pts = (grid_sample_masks(gt_masks.astype(jnp.float32),
                                    cc.num_points) > 0.5).astype(jnp.float32)
    else:
        match_pts = _uniform_points(keys[-1], cc.num_points)
        gt_pts = (jax.vmap(lambda gm: point_sample_nhw(gm, match_pts))(
            gt_masks.astype(jnp.float32)) > 0.5).astype(jnp.float32)

    def _pred_pts(mask_l):
        if grid_mode:
            return grid_sample_masks(mask_l.astype(jnp.float32),
                                     cc.num_points)
        return jax.vmap(lambda ml: point_sample_nhw(ml, match_pts))(
            mask_l.astype(jnp.float32))

    def _layer_losses(k, cls_f, mask_f, box_f):
        """Matched (+ dn) losses for ONE stacked layer (B, T+Q, ...)."""
        cls_l, mask_l, box_l = cls_f[:, t:], mask_f[:, t:], box_f[:, t:]
        pred_pts = _pred_pts(mask_l)
        gt_to_q = dino_hungarian_match(cls_l, pred_pts, gt_pts, box_l,
                                       gt_boxes_cxcywh, gt_classes,
                                       gt_valid, cc)
        ld = _matched_losses(k, cls_l, mask_l, box_l, gt_classes,
                             gt_masks, gt_boxes_cxcywh, gt_valid, gt_to_q, cc,
                             pred_grid=pred_pts if grid_mode else None,
                             gt_grid=gt_pts if grid_mode else None)
        lt = _weighted(ld, cc)
        dn_logs = {}
        if dn_meta and t > 0:
            dn_total, dnl = _dn_losses(
                k, cls_f[:, :t], mask_f[:, :t], box_f[:, :t], dn_meta,
                gt_classes, gt_masks, gt_boxes_cxcywh, gt_valid, cc,
                gt_grid=gt_pts if grid_mode else None)
            lt = lt + dn_scale * dn_total
            dn_logs = {"loss_dn": dn_total}
            dn_logs.update({f"dn_{k2[5:]}": v for k2, v in dnl.items()
                            if k2.startswith("loss_")})
        return lt, {**ld, **dn_logs}

    if cc.deep_supervision:
        # one traced layer body scanned over the (L+1) stacked predictions:
        # a Python loop traces L+1 copies of the JV matcher + point losses
        # and the 4-scale MaskDINO train module (~18 MB StableHLO) OOM-kills
        # this platform's remote compile helper
        def body(carry, xs):
            lt, ld = _layer_losses(*xs)
            return carry + lt, ld
        total, comps = jax.lax.scan(
            body, total, (keys[:n_layers], cls_layers, mask_layers,
                          box_layers))
        logs.update(jax.tree.map(lambda a: a[-1], comps))
    else:
        lt, ld = _layer_losses(keys[n_layers - 1], cls_layers[-1],
                               mask_layers[-1], box_layers[-1])
        total = total + lt
        logs.update(ld)

    # encoder (two-stage) supervision: class + boxes + masks
    if "enc_cls" in outputs:
        enc_cls = outputs["enc_cls"]
        enc_boxes = outputs["enc_boxes"]
        enc_masks = outputs["enc_masks"]
        pred_pts = _pred_pts(enc_masks)
        gt_to_q = dino_hungarian_match(enc_cls, pred_pts, gt_pts, enc_boxes,
                                       gt_boxes_cxcywh, gt_classes,
                                       gt_valid, cc)
        ld = _matched_losses(keys[-2], enc_cls, enc_masks, enc_boxes,
                             gt_classes, gt_masks, gt_boxes_cxcywh, gt_valid,
                             gt_to_q, cc,
                             pred_grid=pred_pts if grid_mode else None,
                             gt_grid=gt_pts if grid_mode else None)
        total = total + _weighted(ld, cc)
        logs["loss_enc"] = _weighted(ld, cc)
        logs.update({f"enc_{k[5:]}": v for k, v in ld.items()
                     if k.startswith("loss_")})

    logs["loss_total"] = total
    return total, logs
