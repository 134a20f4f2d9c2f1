"""ctypes loader + numpy wrappers for the native RLE codec.

``get_lib()`` returns the loaded library or None (after one silent build
attempt); data/rle.py routes its hot entry points through these wrappers
when available and falls back to the numpy reference otherwise. Parity is
enforced by tests/test_native_rle.py.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("VIST_NO_NATIVE"):
        return None
    from vision_instance_seg_tpu.data.native.build import LIB, build

    try:
        build()
        lib = ctypes.CDLL(str(LIB))
    except Exception:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f64p = ctypes.POINTER(ctypes.c_double)
    chp = ctypes.c_char_p

    lib.rle_encode.restype = ctypes.c_int64
    lib.rle_encode.argtypes = [u8p, ctypes.c_int64, i64p]
    lib.rle_decode.restype = ctypes.c_int
    lib.rle_decode.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, u8p]
    lib.rle_to_string.restype = ctypes.c_int64
    lib.rle_to_string.argtypes = [i64p, ctypes.c_int64, chp]
    lib.rle_fr_string.restype = ctypes.c_int64
    lib.rle_fr_string.argtypes = [chp, ctypes.c_int64, i64p]
    lib.rle_area.restype = ctypes.c_int64
    lib.rle_area.argtypes = [i64p, ctypes.c_int64]
    lib.rle_iou.restype = None
    lib.rle_iou.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                            i64p, i64p, i64p, ctypes.c_int64, u8p, f64p]
    lib.rle_merge.restype = ctypes.c_int64
    lib.rle_merge.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                              ctypes.c_int64, ctypes.c_int, i64p]
    _lib = lib
    return _lib


def _i64(a) -> Tuple[np.ndarray, "ctypes.POINTER"]:
    arr = np.ascontiguousarray(a, dtype=np.int64)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def mask_to_counts(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    flat = np.asarray(mask, dtype=np.uint8).flatten(order="F")
    flat = np.ascontiguousarray(flat)
    out = np.empty(flat.size + 1, dtype=np.int64)
    n = lib.rle_encode(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       flat.size, out.ctypes.data_as(
                           ctypes.POINTER(ctypes.c_int64)))
    return out[:n]


def counts_to_mask(counts: np.ndarray, h: int, w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    c, cp = _i64(counts)
    out = np.empty(h * w, dtype=np.uint8)
    rc = lib.rle_decode(cp, len(c), h * w,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError(f"RLE counts sum != h*w {h * w}")
    return out.reshape((h, w), order="F")


def counts_to_string(counts: np.ndarray) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    c, cp = _i64(counts)
    buf = ctypes.create_string_buffer(13 * max(len(c), 1))
    n = lib.rle_to_string(cp, len(c), buf)
    return buf.raw[:n]


def string_to_counts(s: bytes) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(max(len(s), 1), dtype=np.int64)
    n = lib.rle_fr_string(s, len(s),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out[:n]


def _pack(counts_list: List[np.ndarray]):
    lens = np.asarray([len(c) for c in counts_list], np.int64)
    offsets = np.zeros(len(counts_list), np.int64)
    if len(counts_list) > 1:
        offsets[1:] = np.cumsum(lens)[:-1]
    flat = (np.concatenate(counts_list).astype(np.int64)
            if counts_list else np.zeros(0, np.int64))
    return flat, offsets, lens


def rle_iou(dt_counts: List[np.ndarray], gt_counts: List[np.ndarray],
            iscrowd: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    df, do, dl = _pack(dt_counts)
    gf, go, gl = _pack(gt_counts)
    crowd = np.ascontiguousarray(iscrowd, dtype=np.uint8)
    out = np.zeros((len(dt_counts), len(gt_counts)), np.float64)
    lib.rle_iou(
        *(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
          for a in (df, do, dl)), len(dt_counts),
        *(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
          for a in (gf, go, gl)), len(gt_counts),
        crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def rle_merge(counts_list: List[np.ndarray], hw: int,
              intersect: bool) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    flat, offsets, lens = _pack(counts_list)
    out = np.empty(hw + 2, dtype=np.int64)
    n = lib.rle_merge(
        *(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
          for a in (flat, offsets, lens)), len(counts_list), hw,
        1 if intersect else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if n < 0:
        raise ValueError("rle_merge failed")
    return out[:n]
