"""MaskDINO transformer decoder: two-stage, box head, denoising queries.

Replaces the reference's MaskDINO decoder (maskdino/modeling/transformer_decoder,
reached via ``add_maskdino_config``+``build_model`` — reference
train_original.py:29; the trained config is the 4-scale R-50 MaskDINO yaml,
train_original.py:256-260). TPU-native design:

- Two-stage proposals: per-position class/box heads over the flattened
  encoder tokens, static top-K (``jax.lax.top_k``) query selection — no
  dynamic shapes.
- Box-guided deformable cross-attention (models/deform_attn.py — same core
  as the pixel decoder, so one Pallas kernel serves both).
- Iterative box refinement with ``stop_gradient`` between layers (DINO
  convention).
- Contrastive denoising (CDN): a *static* number of noised GT groups
  (positives + negatives) prepended to the matchable queries, isolated via
  a static additive attention mask. Group count = DN_NUM // MAX_INSTANCES —
  everything is padded/masked, never ragged.
- Classification is sigmoid/focal style (num_classes logits, no "no-object"
  channel) as in DINO/MaskDINO; MODEL.MASK_DINO.SEMANTIC_CE_LOSS switches
  to softmax-CE if needed.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_instance_seg_tpu.models.box_ops import (
    box_cxcywh_to_xyxy, box_xyxy_to_cxcywh)
from vision_instance_seg_tpu.models.deform_attn import (
    DeformCoreFn, MSDeformAttn)
from vision_instance_seg_tpu.models.layers import (
    LayerNorm, inverse_sigmoid, position_embedding_sine,
    resize_bilinear_2tap, trunc_normal_init, embedding_init)
from vision_instance_seg_tpu.models.transformer_decoder import (
    MLPHead, MultiheadAttention)


class DNInfo(NamedTuple):
    """Static denoising layout: [dn_pos | dn_neg] * groups + match queries."""
    groups: int
    max_gt: int            # M (pad size per group half)
    total: int             # groups * 2 * max_gt

    @property
    def single(self) -> int:
        return 2 * self.max_gt


def build_dn_queries(rng, gt_classes, gt_boxes_cxcywh, gt_valid, num_classes,
                     groups: int, noise_scale: float,
                     label_noise_ratio: float):
    """Noised GT labels/boxes for CDN training (static shapes).

    gt_classes (B, M) int32; gt_boxes_cxcywh (B, M, 4) normalized;
    gt_valid (B, M) bool. Returns (dn_labels (B, T), dn_boxes (B, T, 4),
    dn_pos_mask (B, T) bool) with T = groups * 2 * M; layout per group:
    [M positives | M negatives].
    """
    b, m = gt_classes.shape
    k_lab, k_box, k_neg = jax.random.split(rng, 3)

    def one_group(key, negative: bool):
        kl, ksign, kpart = jax.random.split(key, 3)
        # label flip
        flip = jax.random.bernoulli(kl, label_noise_ratio * 0.5,
                                    (b, m))
        rand_lab = jax.random.randint(kl, (b, m), 0, num_classes)
        labels = jnp.where(flip, rand_lab, gt_classes)
        # box noise, DINO CDN convention: every coord of (cx, cy, w, h)
        # jittered additively by sign * part * (w_or_h / 2) * scale with
        # part ~ U[0,1) for positives and U[1,2) for NEGATIVES — the shell
        # keeps the two distributions geometrically separable (sampling
        # negatives from U[0,2) overlaps the positives and makes the dn
        # classification task ambiguous: loss_dn plateaus and its gradient
        # drowns the matched losses — diagnosed r2 on the overfit demo)
        w = gt_boxes_cxcywh[..., 2]
        h = gt_boxes_cxcywh[..., 3]
        diff = jnp.stack([w / 2, h / 2, w / 2, h / 2], -1)   # (B, M, 4)
        sign = jax.random.randint(ksign, (b, m, 4), 0, 2) * 2.0 - 1.0
        part = jax.random.uniform(kpart, (b, m, 4))
        if negative:
            part = part + 1.0
        boxes = gt_boxes_cxcywh + sign * part * diff * noise_scale
        boxes = jnp.clip(boxes, 1e-4, 1.0)
        return labels, boxes

    keys = jax.random.split(k_box, groups)
    labs, boxes, pos = [], [], []
    for g in range(groups):
        kp, kn = jax.random.split(keys[g])
        lp, bp = one_group(kp, negative=False)
        ln, bn = one_group(kn, negative=True)
        labs += [lp, ln]
        boxes += [bp, bn]
        pos += [jnp.ones((b, m), bool), jnp.zeros((b, m), bool)]
    dn_labels = jnp.concatenate(labs, axis=1)
    dn_boxes = jnp.concatenate(boxes, axis=1)
    dn_pos = jnp.concatenate(pos, axis=1) & jnp.tile(gt_valid, (1, 2 * groups))
    return dn_labels, dn_boxes, dn_pos


def dn_attn_mask(dn: DNInfo, num_queries: int) -> np.ndarray:
    """Static additive attention mask (T+Q, T+Q): -inf where attending is
    forbidden (cross-group, match->dn)."""
    t = dn.total
    size = t + num_queries
    mask = np.zeros((size, size), np.float32)
    # match queries cannot see any dn query
    mask[t:, :t] = -1e9
    # dn group i sees only itself (and the match queries)
    for gi in range(dn.groups):
        s, e = gi * dn.single, (gi + 1) * dn.single
        mask[s:e, :t] = -1e9
        mask[s:e, s:e] = 0.0
    return mask


def box_gaussian_bias(key_xy: jnp.ndarray, refs: jnp.ndarray,
                      log_sigma: jnp.ndarray) -> jnp.ndarray:
    """Gaussian cross-attention locality bias from reference boxes.

    The dense analog of deformable attention's box-anchored sampling
    (reference CUDA MSDeformAttn samples around each query's reference box;
    SURVEY §2.4): additive logit bias -0.5 * ((key - center) / sigma)^2
    with sigma = box wh x exp(log_sigma) (per-layer learned, init 1.0 so
    the Gaussian covers ~±2 box extents), floored at 0.02 of the canvas so
    tiny boxes keep a view.

    key_xy (S, 2) normalized key centers; refs (B, Q, 4) cxcywh in [0,1];
    log_sigma (2,). Returns (B, 1, Q, S) f32, broadcast over heads — XLA
    fuses the add into the logits, nothing (B, H, Q, S)-sized is
    materialized beyond the logits themselves.
    """
    sig = jnp.maximum(refs[..., 2:] * jnp.exp(log_sigma), 0.02)
    d = (key_xy[None, None] - refs[..., None, :2]) / sig[..., None, :]
    return (-0.5 * (d * d).sum(-1))[:, None]


class MaskDINODecoder(nn.Module):
    """Returns dict of stacked per-layer predictions + dn/enc extras."""

    num_classes: int = 1
    hidden_dim: int = 256
    num_queries: int = 100
    num_heads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    mask_dim: int = 256
    num_levels: int = 3
    num_points: int = 4
    two_stage: bool = True
    dn_groups: int = 1
    dn_noise_scale: float = 0.4
    dn_label_noise_ratio: float = 0.2
    initial_pred: bool = True
    # learned content queries even in two-stage mode (MODEL.MASK_DINO.
    # LEARN_TGT): boxes still come from the top-K proposals
    learn_tgt: bool = False
    # "no" | "bitmask" | "mask2box": initialize decoder reference boxes from
    # the two-stage proposal MASKS (tight box around mask>0; both reference
    # variants compute the same bounds, they differ only in implementation)
    initialize_box_type: str = "no"
    # softmax-CE classification (num_classes+1 logits with a no-object
    # channel) instead of sigmoid/focal (MODEL.MASK_DINO.SEMANTIC_CE_LOSS)
    semantic_ce_loss: bool = False
    # "deformable": MaskDINO-parity sparse sampling around reference boxes.
    # "dense": TPU-native dense cross-attention over all multi-scale tokens
    # (2 GFLOP/layer MXU matmuls instead of scattered bilinear gathers).
    cross_attention: str = "deformable"
    # dense mode: Gaussian locality bias on the cross-attention logits,
    # centered on each query's reference box with per-layer learned width —
    # the dense analog of deformable attention's box-anchored sampling.
    # Without it dense attention carries no locality prior and the box head
    # minimizes its loss by memorizing an image-independent box prior
    # instead of reading the image (bbox AP ~0 on the overfit demo).
    box_attn_bias: bool = True
    # dense mode: Mask2Former-style mask-guided attention — threshold the
    # current predicted mask at each level's resolution and mask attention
    # outside it (additive -1e9, per-level empty-mask fallback). Ties the
    # locality prior to the mask pathway (which learns at small data
    # scales) instead of the reference box (which doesn't): the M2F
    # control's mask-anchored attention scores segm 50.5 on the micro-
    # overfit vs 40.6 for the best box-biased dense variant (docs/PERF.md).
    # Reference analog: Mask2Former's attn_mask from outputs_mask
    # (mask2former/modeling/transformer_decoder/mask2former_transformer_decoder.py).
    mask_attn_bias: bool = False
    # dense mode: Mask2Former-style per-layer level ROUND-ROBIN — decoder
    # layer li cross-attends only feature level (li % num_levels), in the
    # coarse-to-fine order the pixel decoder emits, instead of all ~13k
    # multi-scale tokens at once. Cuts cross-attention keys ~num_levels x
    # per layer AND reproduces M2F's coarse-to-fine attention schedule (the
    # remaining structural difference after the r3 micro ladder eliminated
    # box-loss dilution and mask gating as explanations for the M2F
    # control's segm edge — docs/PERF.md). Reference analog: Mask2Former's
    # `level_index = i % self.num_feature_levels`
    # (mask2former_transformer_decoder.py forward).
    dense_level_cycle: bool = False
    # dense mode: per-head attention centroid/spread readout feeding a
    # zero-init geometry head that refines the reference boxes. Attention
    # output is a convex combination of position-free value features, so
    # the box head cannot recover WHERE the attended mass was (the classic
    # DETR slow-box-convergence pathology that deformable attention — the
    # reference decoder's cross-attention — was invented to fix); the
    # readout restores a directly-decodable geometric signal. (Default off:
    # no measured gain on the overfit demo — see docs/PERF.md r3 ladder.)
    geo_readout: bool = False
    dtype: jnp.dtype = jnp.float32
    core_fn: Optional[DeformCoreFn] = None

    @property
    def _num_cls_out(self) -> int:
        return self.num_classes + (1 if self.semantic_ce_loss else 0)

    @property
    def _cls_bias_init(self):
        # focal/sigmoid classification starts at prior prob 0.01 (DETR
        # convention, bias = -log((1-p)/p) ~ -4.59): without it every query
        # opens at p=0.5 and the focal loss spends most of training
        # suppressing 98 background queries instead of ranking the matched
        # ones. Softmax CE keeps the default zero init.
        if self.semantic_ce_loss:
            return nn.initializers.zeros
        return nn.initializers.constant(-math.log((1 - 0.01) / 0.01))

    def _heads(self):
        return (LayerNorm(dtype=self.dtype, name="decoder_norm"),
                nn.Dense(self._num_cls_out, dtype=jnp.float32,
                         bias_init=self._cls_bias_init,
                         name="class_embed"),
                MLPHead(self.hidden_dim, self.mask_dim, 3, dtype=self.dtype,
                        name="mask_embed"),
                MLPHead(self.hidden_dim, 4, 3, dtype=jnp.float32,
                        zero_last=True, name="box_embed"))

    @staticmethod
    def _predict(heads, x, mask_features):
        norm, cls_h, mask_h, _ = heads
        y = norm(x)
        cls = cls_h(y.astype(jnp.float32))
        emb = mask_h(y)
        masks = jnp.einsum("bqc,bhwc->bqhw", emb.astype(jnp.float32),
                           mask_features.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        return cls, masks

    @staticmethod
    def _refine_boxes(heads, x, ref, geo_delta=None, normed: bool = True):
        """sigmoid(box_mlp(x) + inv_sigmoid(ref)).

        Upstream computes this TWICE per layer with the same aliased box
        MLP (MaskDINO dino_decoder.TransformerDecoder.forward vs
        maskdino_decoder.pred_box): the INTERNAL reference-point update
        feeds the RAW layer output (``normed=False``), while the REPORTED
        per-layer boxes feed the decoder-normed output. Both paths are
        reproduced so imported checkpoints see the exact layouts they were
        trained on (verified end-to-end by tests/test_torch_parity.py).
        """
        norm, _, _, box_h = heads
        y = norm(x) if normed else x
        delta = box_h(y.astype(jnp.float32))
        if geo_delta is not None:
            delta = delta + geo_delta
        # eps=1e-3: DINO/MaskDINO's inverse_sigmoid convention (util.misc),
        # not Deformable-DETR's 1e-5 — matters once boxes saturate
        return jax.nn.sigmoid(delta + inverse_sigmoid(ref, eps=1e-3))

    @nn.compact
    def __call__(self, multi_scale_features: List[jnp.ndarray],
                 mask_features: jnp.ndarray, deterministic: bool = True,
                 gt_classes: Optional[jnp.ndarray] = None,
                 gt_boxes: Optional[jnp.ndarray] = None,
                 gt_valid: Optional[jnp.ndarray] = None,
                 dn_rng: Optional[jnp.ndarray] = None,
                 aux_masks: bool = True) -> Dict:
        c = self.hidden_dim
        b = mask_features.shape[0]
        heads = self._heads()
        # created unconditionally so init (eval path, no GT) and train share
        # one parameter tree
        dn_label_table = self.param("dn_label_enc", embedding_init(),
                                    (self.num_classes + 1, c), jnp.float32)

        srcs, shapes = [], []
        for f in multi_scale_features[:self.num_levels]:
            h, w = f.shape[1], f.shape[2]
            srcs.append(f.reshape(b, h * w, c))
            shapes.append((h, w))
        value = jnp.concatenate(srcs, axis=1)          # (B, S, C)

        out: Dict = {}

        # ---------------- two-stage proposals
        # anchor per token: pixel centers, base size 0.05 * 2^lvl; border
        # validity follows upstream gen_encoder_output_proposals (MaskDINO
        # maskdino_decoder.py): tokens whose anchor coords leave
        # (0.01, 0.99) get their memory ZEROED before enc_output and their
        # proposal logit pushed to +inf (boxes saturate at 1.0) — a STATIC
        # per-shape mask here (pixel centers are compile-time constants),
        # zero TPU cost. Dormant below ~51 tokens per side; at 800px the
        # res3 border ring is excluded exactly as in the reference.
        anchors, valids = [], []
        for lvl, (h, w) in enumerate(shapes):
            ys = (np.arange(h, dtype=np.float32) + 0.5) / h
            xs = (np.arange(w, dtype=np.float32) + 0.5) / w
            gy, gx = np.meshgrid(ys, xs, indexing="ij")
            wh = np.full((h * w, 2), 0.05 * (2.0 ** lvl), np.float32)
            a = np.concatenate([gx.reshape(-1, 1), gy.reshape(-1, 1), wh], 1)
            anchors.append(a)
            valids.append(((a > 0.01) & (a < 0.99)).all(-1))
        anchors_np = np.concatenate(anchors, 0)             # (S, 4)
        valid = jnp.asarray(np.concatenate(valids, 0))      # (S,) bool
        anchors = jnp.asarray(anchors_np)
        value_masked = jnp.where(valid[None, :, None], value, 0)
        enc = nn.Dense(c, dtype=self.dtype, name="enc_output")(value_masked)
        enc = LayerNorm(dtype=self.dtype, name="enc_output_norm")(enc)
        enc_cls = nn.Dense(self._num_cls_out, dtype=jnp.float32,
                           bias_init=self._cls_bias_init,
                           name="enc_class_embed")(enc.astype(jnp.float32))
        enc_delta = MLPHead(c, 4, 3, dtype=jnp.float32, zero_last=True,
                            name="enc_box_embed")(enc.astype(jnp.float32))
        anchor_logit = jnp.where(valid[:, None],
                                 inverse_sigmoid(anchors, eps=1e-3), 1e4)
        enc_boxes = jax.nn.sigmoid(enc_delta + anchor_logit[None])
        if self.two_stage:
            # foreground channels only (under SEMANTIC_CE_LOSS the last
            # logit is no-object and must not drive proposal selection)
            score = enc_cls[..., :self.num_classes].max(axis=-1)   # (B, S)
            _, top_idx = jax.lax.top_k(score, self.num_queries)
            # upstream gathers the UNDETACHED proposals and reports the
            # interm (enc-level) cls/mask through forward_prediction_heads
            # — decoder_norm + the SHARED class/mask heads — with gradient
            # into the encoder memory; selection alone uses the separate
            # enc head logits (maskdino_decoder.py forward: tgt_undetach ->
            # forward_prediction_heads -> tgt = tgt_undetach.detach())
            tgt_undetach = jnp.take_along_axis(enc, top_idx[..., None],
                                               axis=1)
            refs_undetach = jnp.take_along_axis(enc_boxes,
                                                top_idx[..., None], axis=1)
            out["enc_boxes"] = refs_undetach
            if aux_masks or self.initialize_box_type != "no":
                # aux_masks=False (serving): proposal masks feed only the
                # enc-level loss (training) and mask-based box init
                out["enc_cls"], out["enc_masks"] = self._predict(
                    heads, tgt_undetach, mask_features)
            else:
                norm_h, cls_h = heads[0], heads[1]
                out["enc_cls"] = cls_h(
                    norm_h(tgt_undetach).astype(jnp.float32))
            tgt = jax.lax.stop_gradient(tgt_undetach)
            refs = jax.lax.stop_gradient(refs_undetach)
            if self.learn_tgt:
                # learned content queries; boxes still from the proposals
                qf = self.param("query_feat", embedding_init(),
                                (self.num_queries, c), jnp.float32)
                tgt = jnp.broadcast_to(qf[None], (b, self.num_queries, c)
                                       ).astype(self.dtype)
            if self.initialize_box_type != "no":
                # tight boxes around the proposal masks replace the box-head
                # refs (reference maskdino decoder: BitMasks/masks_to_boxes
                # on out_masks.detach(); empty masks keep the head's box)
                mb, mb_valid = masks_to_boxes_cxcywh(
                    jax.lax.stop_gradient(out["enc_masks"]))
                refs = jnp.where(mb_valid[..., None], mb, refs)
        else:
            qf = self.param("query_feat", embedding_init(),
                            (self.num_queries, c), jnp.float32)
            qb = self.param("query_box", embedding_init(),
                            (self.num_queries, 4), jnp.float32)
            tgt = jnp.broadcast_to(qf[None], (b, self.num_queries, c)
                                   ).astype(self.dtype)
            refs = jax.nn.sigmoid(jnp.broadcast_to(
                qb[None], (b, self.num_queries, 4)))

        # ---------------- denoising queries (training only)
        dn_on = (gt_classes is not None and dn_rng is not None
                 and self.dn_groups > 0)
        attn_bias = None
        if dn_on:
            m = gt_classes.shape[1]
            dn = DNInfo(groups=self.dn_groups, max_gt=m,
                        total=self.dn_groups * 2 * m)
            dn_labels, dn_boxes, dn_pos = build_dn_queries(
                dn_rng, gt_classes, gt_boxes, gt_valid, self.num_classes,
                self.dn_groups, self.dn_noise_scale,
                self.dn_label_noise_ratio)
            dn_tgt = dn_label_table[dn_labels].astype(self.dtype)
            tgt = jnp.concatenate([dn_tgt, tgt], axis=1)
            refs = jnp.concatenate([dn_boxes, refs], axis=1)
            mask = jnp.asarray(dn_attn_mask(dn, self.num_queries))
            attn_bias = jnp.broadcast_to(
                mask[None, None], (b, self.num_heads) + mask.shape)
            out["dn_meta"] = {"groups": self.dn_groups, "max_gt": m,
                              "total": dn.total, "pos_mask": dn_pos,
                              "labels": dn_labels, "boxes": dn_boxes}

        # ---------------- decoder layers
        x = tgt
        cls_list, mask_list, box_list = [], [], []
        if self.initial_pred:
            if aux_masks:
                cls0, masks0 = self._predict(heads, x, mask_features)
                mask_list.append(masks0)
            else:
                norm, cls_h = heads[0], heads[1]
                cls0 = cls_h(norm(x).astype(jnp.float32))
            cls_list.append(cls0)
            box_list.append(refs)

        ref_pos_head = MLPHead(c, c, 2, dtype=self.dtype,
                               name="ref_point_head")
        geo_head = None
        if self.cross_attention == "dense" and self.geo_readout:
            # shared across layers like box_embed; zero-init so refinement
            # starts exactly at the reference boxes
            geo_head = MLPHead(64, 4, 2, dtype=jnp.float32, zero_last=True,
                               name="geo_box_head")
        kpos = None
        key_xy = None
        if self.cross_attention == "dense":
            # key positions: per-level sine embedding + learned level embed
            lvl_embed = self.param("kpos_level_embed", embedding_init(),
                                   (len(shapes), c), jnp.float32)
            kp, kxy = [], []
            for lvl, (h, w) in enumerate(shapes):
                p = position_embedding_sine(h, w, c, dtype=self.dtype)
                kp.append(p.reshape(h * w, c)
                          + lvl_embed[lvl].astype(self.dtype))
                py, px = jnp.meshgrid((jnp.arange(h) + 0.5) / h,
                                      (jnp.arange(w) + 0.5) / w,
                                      indexing="ij")
                kxy.append(jnp.stack([px.reshape(-1), py.reshape(-1)], -1))
            kpos = jnp.concatenate(kp, axis=0)[None]     # (1, S, C)
            key_xy = jnp.concatenate(kxy, axis=0)        # (S, 2) f32
            loffs = np.cumsum([0] + [h * w for h, w in shapes])
        mf_levels = None
        if self.cross_attention == "dense" and self.mask_attn_bias:
            # per-level downsampled mask FEATURES: the level-resolution mask
            # logit is then one small einsum per layer (resize is linear in
            # the features, so this equals resizing the full-res logits —
            # see transformer_decoder._attn_mask_from_features)
            mf_levels = [resize_bilinear_2tap(
                mask_features, h, w,
                spatial_axes=(1, 2)).astype(self.dtype)
                for (h, w) in shapes]
        for li in range(self.dec_layers):
            # query pos embedding from current reference boxes (sine of 4d)
            qpos = ref_pos_head(_box_pos_embed(refs, c).astype(self.dtype))

            y = MultiheadAttention(c, self.num_heads, dtype=self.dtype,
                                   name=f"layer{li}_self_attn")(
                x + qpos, x + qpos, x, attn_bias)
            x = LayerNorm(dtype=self.dtype, name=f"layer{li}_norm1")(x + y)

            geo = None
            if self.cross_attention == "dense":
                if self.dense_level_cycle:
                    # M2F-style round-robin: this layer attends ONE level,
                    # coarse-to-fine in the pixel decoder's level order
                    lv = li % len(shapes)
                    val_l = value[:, loffs[lv]:loffs[lv + 1]]
                    kpos_l = kp[lv][None]
                    kxy_l = kxy[lv]
                    mf_l = None if mf_levels is None else [mf_levels[lv]]
                else:
                    val_l, kpos_l = value, kpos
                    kxy_l, mf_l = key_xy, mf_levels
                xbias = None
                if self.box_attn_bias:
                    log_s = self.param(f"layer{li}_xattn_log_sigma",
                                       nn.initializers.zeros, (2,),
                                       jnp.float32)
                    xbias = box_gaussian_bias(kxy_l, refs, log_s)
                if mf_l is not None:
                    # mask-guided attention: threshold the CURRENT mask
                    # prediction (from the post-self-attn query state) at
                    # each level; a query empty at a level attends that
                    # whole level (M2F's empty-mask fallback)
                    norm_h, _, mask_h, _ = heads
                    emb = mask_h(norm_h(x))
                    keeps = []
                    for mf in mf_l:
                        ml = jnp.einsum("bqc,bhwc->bqhw", emb, mf,
                                        preferred_element_type=jnp.float32)
                        k = (ml > 0.0).reshape(ml.shape[0], ml.shape[1], -1)
                        any_k = jnp.any(k, axis=-1, keepdims=True)
                        keeps.append(jnp.where(any_k, k, True))
                    keep = jnp.concatenate(keeps, axis=-1)   # (B, Qt, S_l)
                    mbias = jnp.where(keep, 0.0, -1e9
                                      ).astype(jnp.float32)[:, None]
                    xbias = mbias if xbias is None else xbias + mbias
                y = MultiheadAttention(c, self.num_heads, dtype=self.dtype,
                                       name=f"layer{li}_cross_attn")(
                    x + qpos, val_l + kpos_l, val_l, xbias,
                    key_xy=kxy_l if geo_head is not None else None)
                if geo_head is not None:
                    y, geo = y
            else:
                ref4 = jnp.broadcast_to(
                    refs[:, :, None, :],
                    refs.shape[:2] + (len(shapes), 4))
                y = MSDeformAttn(c, self.num_heads, len(shapes),
                                 self.num_points, dtype=self.dtype,
                                 core_fn=self.core_fn,
                                 name=f"layer{li}_cross_attn")(
                    x + qpos, ref4, value, shapes)
            x = LayerNorm(dtype=self.dtype, name=f"layer{li}_norm2")(x + y)

            y = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                         name=f"layer{li}_ffn1")(x)
            y = nn.Dense(c, dtype=self.dtype,
                         name=f"layer{li}_ffn2")(nn.relu(y))
            x = LayerNorm(dtype=self.dtype, name=f"layer{li}_norm3")(x + y)

            geo_delta = None
            if geo is not None:
                # geometry relative to the current reference box, f32:
                # per-head centroid offset and spread in box-size units
                wh = jnp.maximum(refs[..., 2:], 0.02)          # (B, Q, 2)
                rel_c = (geo[..., :2] - refs[..., None, :2]) / wh[..., None, :]
                rel_s = geo[..., 2:] / wh[..., None, :]
                feats = jnp.concatenate(
                    [jnp.clip(rel_c, -8.0, 8.0),
                     jnp.log(jnp.clip(rel_s, 1e-3, 1e3))], -1)
                geo_delta = geo_head(feats.reshape(feats.shape[0],
                                                   feats.shape[1], -1))
            # reported boxes: box MLP on the NORMED output (upstream
            # pred_box); internal next-layer references: box MLP on the RAW
            # output, detached (upstream dino_decoder loop) — see
            # _refine_boxes
            new_refs = self._refine_boxes(heads, x, refs, geo_delta)
            if aux_masks or li == self.dec_layers - 1:
                cls_l, masks_l = self._predict(heads, x, mask_features)
                mask_list.append(masks_l)
            else:
                norm, cls_h = heads[0], heads[1]
                cls_l = cls_h(norm(x).astype(jnp.float32))
            cls_list.append(cls_l)
            box_list.append(new_refs)
            refs = jax.lax.stop_gradient(
                self._refine_boxes(heads, x, refs, geo_delta, normed=False))

        out["pred_logits"] = jnp.stack(cls_list)   # (L+1, B, T+Q, C)
        # aux_masks=False: ONLY the final layer's mask is materialized
        out["pred_masks"] = jnp.stack(mask_list)   # (L+1, B, T+Q, Hm, Wm)
        out["pred_boxes"] = jnp.stack(box_list)    # (L+1, B, T+Q, 4)
        return out


def masks_to_boxes_cxcywh(masks: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tight normalized cxcywh boxes around ``masks > 0``.

    masks (..., H, W) logits. Static-shape equivalent of the reference's
    BitMasks.get_bounding_boxes / masks_to_boxes (maskdino decoder
    INITIALIZE_BOX_TYPE): per mask, the min/max row/col of positive pixels
    (inclusive bounds, +1 on the max edge), normalized by (W, H). Returns
    (boxes (..., 4), valid (...,)) — empty masks are flagged invalid.
    """
    h, w = masks.shape[-2:]
    binm = masks > 0
    rows = binm.any(-1)                                  # (..., H)
    cols = binm.any(-2)                                  # (..., W)
    yi = jnp.arange(h, dtype=jnp.float32)
    xi = jnp.arange(w, dtype=jnp.float32)
    big = 1e9
    y0 = jnp.min(jnp.where(rows, yi, big), -1)
    y1 = jnp.max(jnp.where(rows, yi, -big), -1) + 1.0
    x0 = jnp.min(jnp.where(cols, xi, big), -1)
    x1 = jnp.max(jnp.where(cols, xi, -big), -1) + 1.0
    valid = rows.any(-1)
    boxes = jnp.stack([(x0 + x1) / (2 * w), (y0 + y1) / (2 * h),
                       (x1 - x0) / w, (y1 - y0) / h], -1)
    boxes = jnp.clip(boxes, 0.0, 1.0)
    return jnp.where(valid[..., None], boxes, 0.0), valid


def _box_pos_embed(boxes: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sine embedding of (cx, cy, w, h) -> (..., 2*dim).

    Matches DINO's ``gen_sineembed_for_position`` exactly (dim//2 sin/cos-
    INTERLEAVED channels per coordinate, concatenated in (y, x, w, h)
    order) so that imported ``ref_point_head`` weights see the layout they
    were trained on (upstream MLP input is ``query_dim//2 * d_model`` =
    2*dim).
    """
    half = dim // 2
    scale = 2 * jnp.pi
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / half)

    def embed(v):
        p = v[..., None] * scale / dim_t                   # (..., half)
        inter = jnp.stack([jnp.sin(p[..., 0::2]),
                           jnp.cos(p[..., 1::2])], axis=-1)
        return inter.reshape(p.shape[:-1] + (half,))

    parts = [embed(boxes[..., i]) for i in (1, 0, 2, 3)]   # y, x, w, h
    return jnp.concatenate(parts, -1)


def build_maskdino_decoder(cfg, dtype=jnp.float32,
                           core_fn: Optional[DeformCoreFn] = None
                           ) -> MaskDINODecoder:
    m = cfg.MODEL.MASK_FORMER
    md = cfg.MODEL.MASK_DINO
    max_inst = int(cfg.INPUT.MAX_INSTANCES)
    groups = max(1, int(md.DN_NUM) // max(max_inst, 1)) if md.DN != "no" else 0
    return MaskDINODecoder(
        num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
        hidden_dim=m.HIDDEN_DIM, num_queries=m.NUM_OBJECT_QUERIES,
        num_heads=m.NHEADS, dim_feedforward=m.DIM_FEEDFORWARD,
        dec_layers=m.DEC_LAYERS - 1,
        mask_dim=cfg.MODEL.SEM_SEG_HEAD.MASK_DIM,
        # DINO-style decoder attends over ALL encoder scales (4 in the
        # reference 4s config: res3-5 + the /64 downsample)
        num_levels=cfg.MODEL.SEM_SEG_HEAD.TOTAL_NUM_FEATURE_LEVELS,
        num_points=cfg.MODEL.SEM_SEG_HEAD.DEFORM_NUM_POINTS,
        two_stage=md.TWO_STAGE, dn_groups=groups,
        dn_noise_scale=md.DN_NOISE_SCALE,
        dn_label_noise_ratio=md.DN_LABEL_NOISE_RATIO,
        initial_pred=md.INITIAL_PRED,
        learn_tgt=md.LEARN_TGT,
        initialize_box_type=md.INITIALIZE_BOX_TYPE,
        semantic_ce_loss=md.SEMANTIC_CE_LOSS,
        cross_attention=md.get("CROSS_ATTENTION", "deformable"),
        box_attn_bias=bool(md.get("BOX_ATTN_BIAS", True)),
        mask_attn_bias=bool(md.get("MASK_ATTN_BIAS", False)),
        dense_level_cycle=bool(md.get("DENSE_LEVEL_CYCLE", False)),
        geo_readout=bool(md.get("GEO_READOUT", False)),
        dtype=dtype, core_fn=core_fn)
