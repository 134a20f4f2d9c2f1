"""Box utilities (cxcywh/xyxy, IoU, GIoU) — jnp, fully vectorized.

Replaces torchvision/detectron2 box ops used by MaskDINO's box head
(reference stack via build_model, train_original.py:29). All boxes
normalized to [0,1] unless stated.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], -1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)


def box_iou_pairwise(a: jnp.ndarray, b: jnp.ndarray):
    """a (..., N, 4) x b (..., M, 4) xyxy -> iou, union (..., N, M)."""
    area_a = box_area(a)[..., :, None]
    area_b = box_area(b)[..., None, :]
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-9), union


def generalized_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """GIoU matrix (..., N, M) for xyxy boxes (degenerate-safe)."""
    iou, union = box_iou_pairwise(a, b)
    lt = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    hull = jnp.maximum(wh[..., 0] * wh[..., 1], 1e-9)
    return iou - (hull - union) / hull


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) {0,1} -> xyxy PIXEL boxes; zeros for empty masks."""
    h, w = masks.shape[-2:]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    any_x = masks.max(axis=-2) > 0.5        # (..., W)
    any_y = masks.max(axis=-1) > 0.5        # (..., H)
    big = 1e9
    x0 = jnp.min(jnp.where(any_x, xs, big), -1)
    x1 = jnp.max(jnp.where(any_x, xs + 1, -big), -1)
    y0 = jnp.min(jnp.where(any_y, ys, big), -1)
    y1 = jnp.max(jnp.where(any_y, ys + 1, -big), -1)
    empty = ~jnp.any(any_x, -1)
    box = jnp.stack([x0, y0, x1, y1], -1)
    return jnp.where(empty[..., None], 0.0, box)
