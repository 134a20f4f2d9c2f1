"""AI-assisted segmentation for the labeling tool.

Rebuild of reference labeling_server/ai_segmentation.py: checkpoint-backed
inference with classical-CV fallback (:41-133), interactive +/- point
refinement via brush circles + color-similarity region growing (:135-224),
mask -> COCO polygon via largest contour + Douglas-Peucker eps =
0.005*arcLength (:226-248), ``SegmentationRefiner`` with undo history
(:260-335), WSGI sub-app exposing ``/segment`` and ``/refine`` (:339-450),
and a ``__main__`` smoke test on a random image (:453-472).

The model backend is the JAX predictor (engine/evaluator postprocess path)
instead of mmdet — same ``AISegmentationModel.predict`` contract
(BASELINE.json parity surface).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def mask_to_polygon(mask: np.ndarray, epsilon_frac: float = 0.005
                    ) -> Optional[List[float]]:
    """Largest contour -> Douglas-Peucker flat [x0,y0,x1,y1,...]
    (reference :226-248)."""
    contours, _ = cv2.findContours(mask.astype(np.uint8),
                                   cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return None
    c = max(contours, key=cv2.contourArea)
    if cv2.contourArea(c) < 10:
        return None
    eps = epsilon_frac * cv2.arcLength(c, True)
    poly = cv2.approxPolyDP(c, eps, True).reshape(-1, 2)
    if len(poly) < 3:
        return None
    return [float(v) for xy in poly for v in xy]


def classical_segment(image_rgb: np.ndarray) -> Optional[np.ndarray]:
    """Otsu + morphology + largest component (reference fallback :99-133)."""
    gray = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2GRAY)
    _, th = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    if (th > 0).mean() > 0.5:
        th = 255 - th
    kernel = np.ones((3, 3), np.uint8)
    th = cv2.morphologyEx(th, cv2.MORPH_CLOSE, kernel)
    th = cv2.morphologyEx(th, cv2.MORPH_OPEN, kernel)
    contours, _ = cv2.findContours(th, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return None
    c = max(contours, key=cv2.contourArea)
    out = np.zeros_like(th)
    cv2.drawContours(out, [c], -1, 1, -1)
    return out.astype(np.uint8)


class AISegmentationModel:
    """Batch-1 segmentation: JAX model if a checkpoint is given, classical
    CV otherwise. ``predict`` returns (mask, score) on the input crop."""

    def __init__(self, checkpoint: Optional[str] = None, cfg=None,
                 score_thresh: float = 0.3):
        self.score_thresh = score_thresh
        self._predictor = None
        if checkpoint:
            self._load_model(checkpoint, cfg)

    def _load_model(self, checkpoint: str, cfg=None):
        import jax
        import jax.numpy as jnp

        from vision_instance_seg_tpu.config import get_cfg
        from vision_instance_seg_tpu.engine.checkpoint import load_checkpoint
        from vision_instance_seg_tpu.engine.trainer import create_train_state
        from vision_instance_seg_tpu.models import (
            build_model, make_inference_fn)

        if cfg is None:
            cfg = get_cfg()
            cfg.MODEL.MASK_DINO.ENABLED = True
            cfg.MODEL.BACKBONE.NAME = "resnet"
        # batch-1 low-latency canvas
        cfg.INPUT.TEST_PAD_H = cfg.INPUT.TEST_PAD_W = 512
        cfg.freeze()
        self.cfg = cfg
        model = build_model(cfg)
        h, w = cfg.INPUT.TEST_PAD_H, cfg.INPUT.TEST_PAD_W
        state = create_train_state(cfg, model, jax.random.key(0),
                                   {"image": jnp.zeros((1, h, w, 3))})
        state = load_checkpoint(checkpoint, state)
        # checkpoint restore yields HOST numpy arrays — commit them to the
        # device once, or every predict re-uploads the full weight tree
        # (~100 MB, seconds through the tunneled TPU)
        self._params = jax.device_put(state.params)
        self._infer = make_inference_fn(model, cfg)
        self._canvas = (h, w)

        # latency path: select the top-1 instance and threshold ON DEVICE —
        # host<->device transfer is the dominant cost of a batch-1 request
        # (the full top-K mask_probs tensor is ~6.5 MB; this returns a
        # (H, W) uint8 mask + a scalar, ~0.26 MB)
        base_infer = self._infer

        def _top1(params, images):
            out = base_infer(params, images)
            # mask_probs arrive uint8-quantized (x255, make_inference_fn)
            prob = jax.image.resize(
                out["mask_probs"][0, 0].astype(jnp.float32), (h, w),
                method="bilinear")
            return {"mask": (prob > 127.5).astype(jnp.uint8),
                    "score": out["scores"][0, 0]}

        self._infer_top1 = jax.jit(_top1)

    def predict(self, image_rgb: np.ndarray
                ) -> Tuple[Optional[np.ndarray], float]:
        """(H, W, 3) uint8 crop -> (binary mask (H, W) | None, score)."""
        h, w = image_rgb.shape[:2]
        if self._predictor is None and not hasattr(self, "_infer"):
            m = classical_segment(image_rgb)
            return m, 0.5 if m is not None else 0.0
        ch, cw = self._canvas
        scale = min(ch / h, cw / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        canvas = np.zeros((ch, cw, 3), np.float32)
        canvas[:nh, :nw] = cv2.resize(image_rgb, (nw, nh)).astype(np.float32)
        out = self._infer_top1(self._params, canvas[None])
        score = float(out["score"])
        if score < self.score_thresh:
            m = classical_segment(image_rgb)
            return m, 0.5 if m is not None else 0.0
        mask_c = np.asarray(out["mask"])[:nh, :nw]
        mask = (cv2.resize(mask_c.astype(np.float32), (w, h)) > 0.5
                ).astype(np.uint8)
        return mask, score

    def predict_polygon(self, image_rgb: np.ndarray) -> Optional[List[float]]:
        mask, _ = self.predict(image_rgb)
        if mask is None or mask.sum() == 0:
            return None
        return mask_to_polygon(mask)

    def refine_with_points(self, image_rgb: np.ndarray, mask: np.ndarray,
                           pos_points: List[Tuple[int, int]],
                           neg_points: List[Tuple[int, int]],
                           brush_radius: int = 8,
                           color_tol: float = 24.0) -> np.ndarray:
        """Interactive refinement (reference :135-224): each + point paints
        a brush circle and region-grows into color-similar neighbors; each
        - point erases the same way."""
        out = mask.copy().astype(np.uint8)
        img = image_rgb.astype(np.float32)

        def grow(seed_xy, add: bool):
            x, y = int(seed_xy[0]), int(seed_xy[1])
            h, w = out.shape
            if not (0 <= x < w and 0 <= y < h):
                return
            cv2.circle(out, (x, y), brush_radius, 1 if add else 0, -1)
            seed_color = img[max(y - 2, 0):y + 3, max(x - 2, 0):x + 3]
            seed_color = seed_color.reshape(-1, 3).mean(0)
            dist = np.linalg.norm(img - seed_color, axis=-1)
            similar = (dist < color_tol).astype(np.uint8)
            # flood from the seed within the color-similar region
            ff_mask = np.zeros((h + 2, w + 2), np.uint8)
            ff_mask[1:-1, 1:-1] = 1 - similar
            region = similar.copy()
            n, labels = cv2.connectedComponents(similar)
            lab = labels[y, x]
            if lab > 0:
                region = (labels == lab).astype(np.uint8)
                if add:
                    out[region > 0] = 1
                else:
                    out[region > 0] = 0

        for p in pos_points:
            grow(p, True)
        for p in neg_points:
            grow(p, False)
        return out


class SegmentationRefiner:
    """Stateful refinement session with undo history (reference :260-335)."""

    def __init__(self, model: AISegmentationModel, image_rgb: np.ndarray,
                 max_history: int = 30):
        self.model = model
        self.image = image_rgb
        self.history: List[np.ndarray] = []
        self.max_history = max_history
        mask, self.score = model.predict(image_rgb)
        self.mask = (mask if mask is not None
                     else np.zeros(image_rgb.shape[:2], np.uint8))

    def _push(self):
        self.history.append(self.mask.copy())
        if len(self.history) > self.max_history:
            self.history.pop(0)

    def add_point(self, x: int, y: int, positive: bool = True):
        self._push()
        self.mask = self.model.refine_with_points(
            self.image, self.mask,
            [(x, y)] if positive else [], [] if positive else [(x, y)])
        return self.mask

    def undo(self) -> np.ndarray:
        if self.history:
            self.mask = self.history.pop()
        return self.mask

    def polygon(self) -> Optional[List[float]]:
        if self.mask.sum() == 0:
            return None
        return mask_to_polygon(self.mask)


# --------------------------------------------------------- WSGI sub-app
def make_blueprint(model: AISegmentationModel):
    """Route table {(method, path): handler} for /segment and /refine —
    mounted by a WSGI server the same way the reference registers its
    Flask blueprint (:339-450)."""
    import base64
    import io

    from PIL import Image

    sessions: Dict[str, SegmentationRefiner] = {}

    def _decode(b64: str) -> np.ndarray:
        if "," in b64:
            b64 = b64.split(",", 1)[1]
        return np.asarray(Image.open(
            io.BytesIO(base64.b64decode(b64))).convert("RGB"))

    def segment(payload: dict) -> dict:
        img = _decode(payload["image_data"])
        sid = payload.get("session_id", "default")
        refiner = SegmentationRefiner(model, img)
        sessions[sid] = refiner
        poly = refiner.polygon()
        return {"status": "ok" if poly else "no_object",
                "polygon": poly, "score": refiner.score,
                "session_id": sid}

    def refine(payload: dict) -> dict:
        sid = payload.get("session_id", "default")
        if sid not in sessions:
            return {"error": "unknown session; call /segment first"}
        r = sessions[sid]
        if payload.get("undo"):
            r.undo()
        else:
            r.add_point(int(payload["x"]), int(payload["y"]),
                        bool(payload.get("positive", True)))
        return {"status": "ok", "polygon": r.polygon(),
                "session_id": sid}

    return {("POST", "/segment"): segment, ("POST", "/refine"): refine}


if __name__ == "__main__":
    # smoke test on a random image (reference :453-472)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (256, 256, 3)).astype(np.uint8)
    img[96:160, 96:160] = 250  # bright square "defect"
    model = AISegmentationModel()
    mask, score = model.predict(img)
    print(f"predict: mask={None if mask is None else mask.shape} "
          f"sum={0 if mask is None else int(mask.sum())} score={score:.2f}")
    if mask is not None:
        refined = model.refine_with_points(img, mask, [(128, 128)], [])
        print(f"refine: sum {int(mask.sum())} -> {int(refined.sum())}")
        poly = mask_to_polygon(refined)
        print(f"polygon: {0 if poly is None else len(poly) // 2} points")
