"""COCO instance-segmentation evaluator (inference loop + AP).

Replaces detectron2's ``inference_on_dataset`` + ``COCOEvaluator`` pipeline
(reference evaluate.py:120-132): batch the val set at a fixed padded canvas,
run the jitted inference function (top-K instances at 1/4-canvas mask
resolution), then on host: upsample mask probs to the canvas, crop the valid
region, resize to the original image size, threshold at 0.5, RLE-encode
(bit-identical codec, data/rle.py), and run the pycocotools-parity COCOeval
for both bbox and segm tasks. Output keys AP/AP50/AP75/APs/APm/APl match
reference evaluate.py:215.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Dict, List, Optional

import numpy as np

from vision_instance_seg_tpu.data import rle as mask_util
from vision_instance_seg_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from vision_instance_seg_tpu.data.coco import COCOJson
from vision_instance_seg_tpu.data.loader import EvalLoader
from vision_instance_seg_tpu.evaluation.cocoeval import COCOeval

logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=8)
def _chunk_fetcher(chunk: int, hm: int, wm: int):
    """One jitted fixed-shape slice fetch: (B, K, hm, wm)[b, s:s+chunk]."""
    import jax

    @jax.jit
    def fetch(mp, b, start):
        return jax.lax.dynamic_slice(
            mp, (b, start, 0, 0), (1, chunk, hm, wm))[0]

    return fetch


def _fetch_prefix(mp, b: int, need: int) -> np.ndarray:
    """D2H rows [0, need) of device array ``mp[b]`` ((K, Hm, Wm) probs).

    Fixed-shape chunks keep it ONE compiled kernel however many detections
    clear the threshold; the chunk is the smallest divisor of K >= 16 so
    chunks tile K exactly (no clamped/overlapping tail slices).
    """
    k, hm, wm = mp.shape[1:]
    if need <= 0:
        return np.zeros((0, hm, wm), mp.dtype)
    chunk = next(c for c in range(min(16, k), k + 1) if k % c == 0)
    fetch = _chunk_fetcher(chunk, hm, wm)
    n = -(-need // chunk)
    return np.concatenate(
        [np.asarray(fetch(mp, b, j * chunk)) for j in range(n)])[:need]


def _prefix_pad(k: int, max_need: int) -> int:
    """Smallest chunk-grid length >= max_need (same chunk rule as
    :func:`_fetch_prefix` so the compiled slice-shape variety stays
    bounded at <= K/chunk executables)."""
    chunk = next(c for c in range(min(16, k), k + 1) if k % c == 0)
    return min(k, -(-max_need // chunk) * chunk)


def _fetch_prefix_all(mp, needs) -> list:
    """Batched D2H: rows [0, needs[b]) of ``mp[b]`` for EVERY b at once.

    One static leading-prefix slice + one transfer instead of
    ``sum(ceil(need/chunk))`` per-image chunk dispatches — on this
    platform's tunnel each dispatch costs ~25 ms, which dominated the
    per-image path (~50 round-trips per 8-image batch of patches). Costs
    ``B * max(needs)`` rows of bytes instead of ``sum(needs)``; callers
    pick between the two with the 25 ms/dispatch + 50 ms/MB cost model.
    """
    k = mp.shape[1]
    tail = mp.shape[2:]
    bsz = len(needs)
    max_need = max(needs)
    if max_need <= 0:
        return [np.zeros((0,) + tail, mp.dtype) for _ in range(bsz)]
    padded = _prefix_pad(k, max_need)
    rows = np.asarray(mp[:bsz, :padded])
    return [rows[i, :needs[i]] for i in range(bsz)]


def _batched_prefix_wins(needs, row_mb: float, k: int) -> bool:
    """Tunnel cost model: batched single-slice fetch vs per-image chunks.

    per-image: ceil(need/16) dispatches each + sum(needs) rows of bytes;
    batched:   2 dispatches (slice + transfer) + B * padded rows.
    """
    needs = [n for n in needs]
    if max(needs, default=0) <= 0:
        return True
    per_img = (sum(-(-n // 16) for n in needs if n > 0) * 25.0
               + sum(needs) * row_mb * 50.0)
    padded = _prefix_pad(k, max(needs))
    batched = 2 * 25.0 + len(needs) * padded * row_mb * 50.0
    return batched <= per_img


def _start_host_copies(out, skip=("mask_probs",)) -> bool:
    """Enqueue async D2H of an inference-output tree's SMALL leaves.

    Called right after the jit dispatch so the tunnel transfers of batch
    n overlap the host postprocess of batch n-1 (the copies queue behind
    the compute producing them). The full-resolution ``mask_probs``
    tensor is skipped — it is fetched lazily per needed prefix/row.
    Best-effort: platforms without ``copy_to_host_async`` just no-op
    (returns False; callers then fall back to the cost-model sliced
    fetches). Kill switch: ``VIST_EVAL_PREFETCH=0``.
    """
    import os
    if os.environ.get("VIST_EVAL_PREFETCH", "1") == "0":
        return False
    ok = False
    for key, v in out.items():
        if key in skip or isinstance(v, np.ndarray):
            continue
        try:
            v.copy_to_host_async()
            ok = True
        except (AttributeError, NotImplementedError, RuntimeError):
            return False
    return ok


def _row_fetcher(mp, b: int):
    """Lazy single-row D2H: ``i -> np (Hm, Wm)`` of device array mp[b, i]
    (patch-postprocess fallback for instances that escape their patch)."""
    if isinstance(mp, np.ndarray):
        return lambda i: mp[b, i]
    hm, wm = mp.shape[2:]
    fetch = _chunk_fetcher(1, hm, wm)
    return lambda i: np.asarray(fetch(mp, b, int(i)))[0]


def _resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize HxW float array (cv2 if present, else PIL)."""
    try:
        import cv2
        return cv2.resize(arr, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        from PIL import Image
        return np.asarray(Image.fromarray(arr).resize((out_w, out_h),
                                                      Image.BILINEAR))


def _out_rect(qbox, sx: float, sy: float, orig_h: int, orig_w: int):
    """Output rectangle (x0o, y0o, x1o, y1o) in the original-image frame
    whose source footprint intersects support box ``qbox``; None when the
    box or the rectangle is empty."""
    x0q, y0q, x1q, y1q = (int(v) for v in qbox)
    if x1q <= x0q or y1q <= y0q:
        return None
    x0o = max(0, int(np.floor((x0q - 0.5) / sx - 0.5)))
    y0o = max(0, int(np.floor((y0q - 0.5) / sy - 0.5)))
    x1o = min(orig_w, int(np.ceil((x1q + 0.5) / sx + 0.5)))
    y1o = min(orig_h, int(np.ceil((y1q + 0.5) / sy + 0.5)))
    if x1o <= x0o or y1o <= y0o:
        return None
    return x0o, y0o, x1o, y1o


def _src_span(lo_o: int, hi_o: int, s: float):
    """Integer source rows/cols the warp's bilinear kernel touches for
    output span [lo_o, hi_o) at scale s, BEFORE edge clamping."""
    lo = int(np.floor(s * (lo_o + 0.5) - 0.5))
    hi = int(np.floor(s * (hi_o - 0.5) - 0.5)) + 1
    return lo, hi


def _patch_fits(qbox, origin, p: int, hm: int, wm: int, sx: float,
                sy: float, orig_h: int, orig_w: int) -> bool:
    """True iff warping from the device patch is byte-identical to warping
    from the full (hm, wm) map: every source row/col the bilinear kernel
    touches (after the full map's edge clamp) lies inside the patch, and
    wherever the full map would clamp at an edge, the patch boundary IS
    that map edge (so BORDER_REPLICATE replicates the same values)."""
    if hm <= p and wm <= p:
        return True                      # patch embeds the whole map
    rect = _out_rect(qbox, sx, sy, orig_h, orig_w)
    if rect is None:
        return True                      # nothing to warp
    x0o, y0o, x1o, y1o = rect
    x0p, y0p = int(origin[0]), int(origin[1])
    lo_x, hi_x = _src_span(x0o, x1o, sx)
    lo_y, hi_y = _src_span(y0o, y1o, sy)
    ok_x = (max(lo_x, 0) >= x0p and min(hi_x, wm - 1) < min(x0p + p, wm)
            and (lo_x >= 0 or x0p == 0)
            and (hi_x <= wm - 1 or x0p + p == wm))
    ok_y = (max(lo_y, 0) >= y0p and min(hi_y, hm - 1) < min(y0p + p, hm)
            and (lo_y >= 0 or y0p == 0)
            and (hi_y <= hm - 1 or y0p + p == hm))
    return ok_x and ok_y


def _warp_patch_source(patch: np.ndarray, origin, qbox, hm: int, wm: int,
                       valid_h: int, valid_w: int, canvas_h: int,
                       canvas_w: int, orig_h: int, orig_w: int):
    """_warp_box_patch, but sourcing from a device-cropped (p, p) float
    patch whose [0, 0] is full-map pixel ``origin`` (x0p, y0p). Caller must
    have checked ``_patch_fits`` — given that, the result is byte-identical
    to warping the full map: the affine translation shifts by the integer
    origin (exact in f64, so cv2's fixed-point fractional coordinates are
    unchanged) and every touched source pixel holds the same value."""
    import cv2

    p = patch.shape[0]
    if hm <= p and wm <= p:
        return _warp_box_patch(patch[:hm, :wm], qbox, valid_h, valid_w,
                               canvas_h, canvas_w, orig_h, orig_w)
    sx = (valid_w * wm) / (orig_w * canvas_w)
    sy = (valid_h * hm) / (orig_h * canvas_h)
    rect = _out_rect(qbox, sx, sy, orig_h, orig_w)
    if rect is None:
        return None, 0, 0
    x0o, y0o, x1o, y1o = rect
    # _warp_box_patch hands cv2 a float32 matrix which cv2 widens to f64
    # per pixel; replicate that exact rounding, THEN shift by the integer
    # origin in f64 (exact), so the fixed-point fractional source
    # coordinates match the full-map warp bit for bit
    tx = float(np.float32((x0o + 0.5) * sx - 0.5)) - int(origin[0])
    ty = float(np.float32((y0o + 0.5) * sy - 0.5)) - int(origin[1])
    m = np.array([[float(np.float32(sx)), 0.0, tx],
                  [0.0, float(np.float32(sy)), ty]], np.float64)
    out = cv2.warpAffine(
        patch, m, (x1o - x0o, y1o - y0o),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_REPLICATE)
    return out > 0.5, x0o, y0o


def _warp_box_patch(prob: np.ndarray, qbox, valid_h: int, valid_w: int,
                    canvas_h: int, canvas_w: int, orig_h: int,
                    orig_w: int):
    """Single-warp fast path: resample ``prob`` (Hm, Wm) directly into the
    (orig_h, orig_w) frame, restricted to the output rectangle that the
    device-computed support box ``qbox`` can touch. Returns
    (bool patch, x0o, y0o) — the rest of the frame is provably all-zero —
    or (None, 0, 0) for an empty box.

    The parity chain (mask-res -> canvas bilinear -> crop valid -> orig
    bilinear) composes into one affine resampling of the mask-res grid:
    src_x = (x + 0.5) * (valid_w * Wm) / (orig_w * canvas_w) - 0.5 (same
    for y). One cv2.warpAffine evaluates exactly that map — no 4x-upsampled
    intermediate frame, no second pass — and only inside the box (outside
    it every final pixel is provably <= 0.5, see _mask_support_boxes).
    Differs from the two-stage chain only by the intermediate bilinear
    requantization (sub-pixel boundary shifts; AP-equal on the test corpus).
    """
    import cv2

    hm, wm = prob.shape
    sx = (valid_w * wm) / (orig_w * canvas_w)
    sy = (valid_h * hm) / (orig_h * canvas_h)
    rect = _out_rect(qbox, sx, sy, orig_h, orig_w)
    if rect is None:
        return None, 0, 0
    x0o, y0o, x1o, y1o = rect
    # dst->src affine (WARP_INVERSE_MAP): src = s * (dst + o + 0.5) - 0.5
    m = np.array([[sx, 0.0, (x0o + 0.5) * sx - 0.5],
                  [0.0, sy, (y0o + 0.5) * sy - 0.5]], np.float32)
    patch = cv2.warpAffine(
        prob, m, (x1o - x0o, y1o - y0o),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_REPLICATE)
    return patch > 0.5, x0o, y0o


def _warp_box_to_frame(prob: np.ndarray, qbox, valid_h: int, valid_w: int,
                       canvas_h: int, canvas_w: int, orig_h: int,
                       orig_w: int) -> np.ndarray:
    """Full-frame composite of ``_warp_box_patch`` (test/reference surface;
    the eval loop encodes straight from the patch via encode_box_patch)."""
    out = np.zeros((orig_h, orig_w), np.uint8)
    patch, x0o, y0o = _warp_box_patch(prob, qbox, valid_h, valid_w,
                                      canvas_h, canvas_w, orig_h, orig_w)
    if patch is not None:
        out[y0o:y0o + patch.shape[0], x0o:x0o + patch.shape[1]] = patch
    return out


def postprocess_instances(mask_probs: np.ndarray, scores: np.ndarray,
                          labels: np.ndarray, valid_h: int, valid_w: int,
                          canvas_h: int, canvas_w: int, orig_h: int,
                          orig_w: int, image_id: int,
                          category_ids: List[int],
                          score_thresh: float = 0.0,
                          boxes: Optional[np.ndarray] = None,
                          mask_boxes: Optional[np.ndarray] = None,
                          fast: bool = True,
                          mask_patches: Optional[np.ndarray] = None,
                          patch_origins: Optional[np.ndarray] = None,
                          mask_hw: Optional[tuple] = None,
                          fetch_row=None) -> List[dict]:
    """One image: (K, Hm, Wm) probs -> COCO result dicts with RLE segms.

    Default (``fast`` + device ``mask_boxes``): one box-restricted
    warpAffine per instance (_warp_box_to_frame). Parity path
    (``fast=False``): the detectron2 chain 1/4-canvas -> canvas (bilinear)
    -> crop valid -> original size (bilinear) -> >0.5.
    ``boxes`` (K, 4) xyxy normalized to the canvas (MaskDINO box head) are
    used for the bbox task when given; otherwise boxes come from the mask.

    When ``mask_patches`` (K', p, p) + ``patch_origins`` (K, 2) +
    ``mask_hw`` (Hm, Wm) are given (device patch postprocess,
    TEST.PATCH_POSTPROCESS), the fast path warps from the small patches —
    byte-identical to the full map by the _patch_fits contract — and
    ``mask_probs`` may be None; instances whose footprint escapes the
    patch are refetched via ``fetch_row(i) -> (Hm, Wm)``.
    """
    results = []
    use_patches = (fast and mask_patches is not None
                   and patch_origins is not None and mask_hw is not None)
    k = (mask_patches if use_patches else mask_probs).shape[0]
    keep = np.nonzero(np.asarray(scores[:k], np.float32) > score_thresh)[0]
    use_fast = fast and mask_boxes is not None
    # make_inference_fn ships probs uint8-quantized (x255)
    src_dtype = (mask_patches if use_patches else mask_probs).dtype
    prob_scale = np.float32(1 / 255 if src_dtype == np.uint8 else 1)
    if use_patches:
        hm, wm = mask_hw
        pp = mask_patches.shape[1]
        sx = (valid_w * wm) / (orig_w * canvas_w)
        sy = (valid_h * hm) / (orig_h * canvas_h)
    # NOTE: per-instance cv2 resizes ARE the fast path — cv2's >4-channel
    # resize falls back to a naive kernel (measured 110x slower for
    # (200,200,100)->(800,800,100)); don't "vectorize" this loop.
    for i in keep:
        score = float(scores[i])
        if use_fast:
            if mask_boxes[i, 2] <= mask_boxes[i, 0]:   # provably empty
                continue
            if use_patches and _patch_fits(mask_boxes[i], patch_origins[i],
                                           pp, hm, wm, sx, sy,
                                           orig_h, orig_w):
                patch, x0o, y0o = _warp_patch_source(
                    mask_patches[i].astype(np.float32) * prob_scale,
                    patch_origins[i], mask_boxes[i], hm, wm,
                    valid_h, valid_w, canvas_h, canvas_w, orig_h, orig_w)
            else:
                row = (mask_probs[i] if not use_patches
                       else np.asarray(fetch_row(i)))
                row_scale = np.float32(
                    1 / 255 if row.dtype == np.uint8 else 1)
                patch, x0o, y0o = _warp_box_patch(
                    row.astype(np.float32) * row_scale, mask_boxes[i],
                    valid_h, valid_w, canvas_h, canvas_w, orig_h, orig_w)
            if patch is None or not patch.any():
                continue
            # patch-sized RLE: no megapixel frame materialized or scanned
            seg = mask_util.encode_box_patch(patch, x0o, y0o, orig_h, orig_w)
        else:
            m = _resize_bilinear(mask_probs[i].astype(np.float32)
                                 * prob_scale, canvas_h, canvas_w)
            m = m[:valid_h, :valid_w]
            m = _resize_bilinear(m, orig_h, orig_w)
            binm = (m > 0.5).astype(np.uint8)
            if binm.sum() == 0:
                continue
            seg = mask_util.encode(np.asfortranarray(binm))
        if isinstance(seg["counts"], bytes):
            seg = dict(seg, counts=seg["counts"].decode("ascii"))
        if boxes is not None:
            # normalized-canvas xyxy -> original-image xywh. LOCAL names:
            # this branch used to rebind ``sx``/``sy`` INSIDE the instance
            # loop, clobbering the patch-fit geometry for every following
            # instance — on the MaskDINO path (boxes present) every
            # instance after the first failed _patch_fits with sx=325 and
            # fell back to a full-row fetch (2050 stray fetches per 127-
            # image eval; two eval crashes before the fallback was made
            # total). Root-caused r4 via the traced-fits repro.
            bsx = canvas_w / max(valid_w, 1) * orig_w
            bsy = canvas_h / max(valid_h, 1) * orig_h
            x0, y0, x1, y1 = (float(boxes[i, 0]) * bsx,
                              float(boxes[i, 1]) * bsy,
                              float(boxes[i, 2]) * bsx,
                              float(boxes[i, 3]) * bsy)
            x0, y0 = max(x0, 0.0), max(y0, 0.0)
            x1, y1 = min(x1, orig_w), min(y1, orig_h)
            bbox = [x0, y0, max(x1 - x0, 0.0), max(y1 - y0, 0.0)]
        elif use_fast:
            # tight box from the warped binary patch directly — identical
            # to toBbox(seg) (both are the nonzero bounds of the same
            # binary mask) without re-DECODING the string just encoded
            # (profiled r4: string_to_counts was the #1 host item)
            ys, xs = np.nonzero(patch)
            bbox = [float(x0o + xs.min()), float(y0o + ys.min()),
                    float(xs.max() - xs.min() + 1),
                    float(ys.max() - ys.min() + 1)]
        else:
            bbox = mask_util.toBbox(seg).tolist()
        results.append({
            "image_id": int(image_id),
            "category_id": int(category_ids[int(labels[i])]),
            "segmentation": seg,
            "bbox": [float(b) for b in bbox],
            "score": score,
        })
    return results


class COCOEvaluator:
    """Evaluate a dataset with bbox+segm COCO AP (detectron2-compatible)."""

    def __init__(self, dataset_name: str, cfg, output_dir: Optional[str] = None):
        self.dataset_name = dataset_name
        self.cfg = cfg
        self.output_dir = output_dir
        meta = MetadataCatalog.get(dataset_name)
        # contiguous label -> dataset category id
        id_map = meta.get("thing_dataset_id_to_contiguous_id")
        if id_map:
            self.category_ids = [k for k, _ in sorted(
                id_map.items(), key=lambda kv: kv[1])]
        else:
            n = len(meta.get("thing_classes", ["object"]))
            self.category_ids = list(range(n))
        self.json_file = meta.get("json_file")

    def evaluate(self, inference_fn, params) -> Dict[str, Dict[str, float]]:
        import jax

        # commit host-loaded params to device once — otherwise every batch
        # re-uploads the full weight tree. Multi-host: each process
        # evaluates its process_index-strided subset INDEPENDENTLY, so the
        # inference jit must run on local devices only — a jit over global
        # (mesh-committed) arrays needs lockstep participation that
        # per-process strided batch counts violate (and device_put refuses
        # non-addressable inputs outright). Fully-replicated global params
        # already hold the whole tree on every local device: rebind each
        # leaf to its first local shard (zero cross-host traffic).
        # TP-sharded leaves can't be localized this way and are left alone
        # (loud jit error > silent wrong math).
        def _commit(a):
            if isinstance(a, jax.Array) and not a.is_fully_addressable:
                if a.sharding.is_fully_replicated:
                    return a.addressable_data(0)
                return a
            return jax.device_put(a)
        params = jax.tree_util.tree_map(_commit, params)
        cfg = self.cfg
        dicts = DatasetCatalog.get(self.dataset_name)
        loader = EvalLoader(dicts, cfg,
                            batch_size=int(cfg.TEST.get("BATCH_SIZE", 1)))
        canvas_h, canvas_w = cfg.INPUT.TEST_PAD_H, cfg.INPUT.TEST_PAD_W
        fast = bool(cfg.TEST.get("FAST_POSTPROCESS", True))
        # derive bbox results from the mask RLE (postprocess_instances'
        # boxes=None branch) instead of the box head; small-data knob,
        # see config/defaults.py TEST.BOX_FROM_MASK
        box_from_mask = bool(cfg.MODEL.MASK_FORMER.TEST.get(
            "BOX_FROM_MASK", False))
        results: List[dict] = []
        t0 = time.time()
        n_images = 0

        def host_postprocess(batch, out, prefetched=False):
            nonlocal n_images
            mp = out["mask_probs"]
            small = {k: np.asarray(v) for k, v in out.items()
                     if k not in ("mask_probs", "mask_patches")}
            bsz = batch["image"].shape[0] - batch.get("__pad__", 0)
            thresh = cfg.TEST.SCORE_THRESH
            # D2H is ~50 ms/MB through this platform's tunnel and the
            # (B, K, Hm, Wm) prob tensor dominates it; scores are sorted
            # descending on device (make_inference_fn), so fetch only the
            # prefix covering the above-threshold detections, in fixed-shape
            # chunks (one compiled dynamic_slice, many cheap dispatches).
            # "prefix through the LAST kept index" stays correct even for
            # unsorted third-party inference fns.
            needs = []
            for b in range(bsz):
                kept = np.nonzero(small["scores"][b] > thresh)[0]
                needs.append(int(kept.max()) + 1 if kept.size else 0)
            # device patch postprocess (TEST.PATCH_POSTPROCESS): fetch the
            # small per-instance patches instead of full prob rows; the
            # full map stays on device for the rare footprint-escape
            # fallback (byte-identical either way, see _patch_fits)
            use_patches = fast and "mask_patches" in out
            device_mp = not isinstance(mp, np.ndarray)
            if use_patches:
                pt = out["mask_patches"]
                row_mb = (pt.shape[2] * pt.shape[3]
                          * pt.dtype.itemsize) / 1e6
                if prefetched and not isinstance(pt, np.ndarray):
                    # the async copy already moved (or is moving) the
                    # whole tensor — reading it back is (near-)free and
                    # overlapped the previous batch's host work
                    full = np.asarray(pt)
                    patch_np = [full[b, :needs[b]] for b in range(bsz)]
                elif (isinstance(pt, np.ndarray)
                        or _batched_prefix_wins(needs[:bsz], row_mb,
                                                pt.shape[1])):
                    patch_np = _fetch_prefix_all(pt, needs[:bsz])
                else:
                    patch_np = [_fetch_prefix(pt, b, needs[b])
                                for b in range(bsz)]
                probs = [None] * bsz
            elif not device_mp or sum(needs) * 2 >= bsz * mp.shape[1]:
                mp_np = np.asarray(mp)          # little to skip: one bulk D2H
                probs = [mp_np[b] for b in range(bsz)]
            else:
                row_mb = (mp.shape[2] * mp.shape[3]
                          * mp.dtype.itemsize) / 1e6
                if _batched_prefix_wins(needs[:bsz], row_mb, mp.shape[1]):
                    probs = _fetch_prefix_all(mp, needs[:bsz])
                else:
                    probs = [_fetch_prefix(mp, b, needs[b])
                             for b in range(bsz)]
            for b in range(bsz):
                vh, vw = (int(batch["valid_hw"][b, 0]),
                          int(batch["valid_hw"][b, 1]))
                oh, ow = (int(batch["orig_hw"][b, 0]),
                          int(batch["orig_hw"][b, 1]))
                extra = {}
                if use_patches:
                    hm, wm = (int(mp.shape[2]), int(mp.shape[3]))
                    pp = int(patch_np[b].shape[1])
                    sx = (vw * wm) / (ow * canvas_w)
                    sy = (vh * hm) / (oh * canvas_h)
                    mb = small["mask_boxes"][b]
                    po = small["patch_origin"][b]
                    kept = np.nonzero(
                        small["scores"][b][:needs[b]] > thresh)[0]
                    bad = [i for i in kept
                           if mb[i, 2] > mb[i, 0]
                           and not _patch_fits(mb[i], po[i], pp, hm, wm,
                                               sx, sy, oh, ow)]
                    # fetch strategy for footprint-escape rows: chunked
                    # prefix (few dispatches, all leading rows) vs one
                    # dispatch per bad row. Cost model for this platform's
                    # tunnel: ~25 ms/dispatch + ~50 ms/MB.
                    # the pre-screen picks the fetch strategy; the
                    # per-instance check in postprocess_instances makes
                    # the ACTUAL warp decision. They evaluate the same
                    # expression on the same arrays, yet two r4 320px
                    # runs crashed on an instance the pre-screen did not
                    # flag (fetch_row None / prefix IndexError at i=31,
                    # /tmp/r4_tpu.log 08-20) — so fetch_row must be
                    # TOTAL: prefix rows where prefetched, lazy single-
                    # row fetch beyond (byte-identical, ~25 ms), plus a
                    # detailed log to root-cause the disagreement.
                    single = _row_fetcher(mp, b)

                    def _escape_log(i, b=b, mb=mb, po=po, pp=pp, hm=hm,
                                    wm=wm, sx=sx, sy=sy, oh=oh, ow=ow,
                                    bad=tuple(bad)):
                        logger.warning(
                            "patch-fit disagreement: image idx %d inst %d "
                            "not in pre-screen bad=%s; box=%s origin=%s "
                            "pp=%d hm=%d wm=%d sx=%.8g sy=%.8g oh=%d "
                            "ow=%d fits=%s", b, int(i), bad,
                            mb[int(i)].tolist(), po[int(i)].tolist(), pp,
                            hm, wm, sx, sy, oh, ow,
                            _patch_fits(mb[int(i)], po[int(i)], pp, hm,
                                        wm, sx, sy, oh, ow))

                    if bad:
                        n_pref = max(bad) + 1
                        row_mb = hm * wm / 1e6
                        pref_cost = (-(-n_pref // 16) * 25
                                     + n_pref * row_mb * 50)
                        single_cost = len(bad) * (25 + row_mb * 50)
                        if pref_cost < single_cost:
                            rows = _fetch_prefix(mp, b, n_pref)

                            def fetch_row(i, rows=rows, n=n_pref,
                                          single=single, log=_escape_log):
                                if int(i) < n:
                                    return rows[int(i)]
                                log(i)
                                return single(i)
                        else:
                            fetch_row = single
                    else:
                        def fetch_row(i, single=single, log=_escape_log):
                            log(i)
                            return single(i)
                    extra = dict(mask_patches=patch_np[b],
                                 patch_origins=po, mask_hw=(hm, wm),
                                 fetch_row=fetch_row)
                results.extend(postprocess_instances(
                    probs[b], small["scores"][b], small["labels"][b],
                    vh, vw, canvas_h, canvas_w, oh, ow,
                    int(batch["image_id"][b]), self.category_ids,
                    thresh,
                    boxes=small["boxes"][b]
                    if "boxes" in small and not box_from_mask else None,
                    mask_boxes=small.get("mask_boxes", [None])[b]
                    if "mask_boxes" in small else None,
                    fast=fast, **extra))
                n_images += 1

        # pipeline: dispatch batch n+1 (async jit call) before doing host
        # postprocess of batch n, so TPU compute + D2H overlap the
        # per-instance host work
        pending = None
        for batch in loader:
            out = inference_fn(params, batch["image"])
            # enqueue the small-leaf D2H now: the transfers queue behind
            # this batch's compute and ride the tunnel WHILE the host
            # postprocesses the previous batch
            prefetched = _start_host_copies(out)
            if pending is not None:
                host_postprocess(*pending)
            pending = (batch, out, prefetched)
        if pending is not None:
            host_postprocess(*pending)
        dt = time.time() - t0
        logger.info("inference on %d images in %.1fs (%.2f im/s)",
                    n_images, dt, n_images / max(dt, 1e-9))
        # multi-host: each process ran its strided EvalLoader subset; merge
        # all per-host detection lists before accumulating (detectron2's
        # comm.gather inside COCOEvaluator, SURVEY §2.3 comm row)
        from vision_instance_seg_tpu.parallel import comm
        if comm.process_count() > 1:
            results = [r for part in comm.all_gather_objects(results)
                       for r in part]
        return self.evaluate_predictions(results)

    def evaluate_predictions(self, results: List[dict]
                             ) -> Dict[str, Dict[str, float]]:
        gt = COCOJson(self.json_file) if self.json_file else None
        if gt is None:
            raise ValueError(f"dataset {self.dataset_name} has no json_file")
        out: Dict[str, Dict[str, float]] = {}
        if not results:
            nan = {k: float("nan") for k in
                   ["AP", "AP50", "AP75", "APs", "APm", "APl"]}
            self.last_pr_best_f1 = {}
            return {"bbox": dict(nan), "segm": dict(nan)}
        dt = gt.loadRes(results)
        self.last_pr_best_f1 = {}
        for task in ("bbox", "segm"):
            ev = COCOeval(gt, dt, iouType=task)
            ev.evaluate()
            ev.accumulate()
            ev.summarize()
            out[task] = ev.metric_dict()
            # operating-point P/R for the experiment template's yolo-route
            # metric contract (cocoeval.pr_best_f1)
            self.last_pr_best_f1[task] = ev.pr_best_f1()
        return out
