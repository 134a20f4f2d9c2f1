"""RLE codec tests: roundtrips, known golden vectors, polygon rasterization.

Golden strings were produced by pycocotools (the reference's mask backend,
train_original.py:126-131) so encode/frPoly stay byte-compatible.
"""

import numpy as np
import pytest

from vision_instance_seg_tpu.data import rle as mask_util


def test_encode_decode_roundtrip(rng):
    for _ in range(10):
        h, w = int(rng.integers(1, 60)), int(rng.integers(1, 60))
        m = (rng.random((h, w)) > 0.5).astype(np.uint8)
        r = mask_util.encode(m)
        assert r["size"] == [h, w]
        out = mask_util.decode(r)
        np.testing.assert_array_equal(out, m)


def test_string_counts_roundtrip(rng):
    for _ in range(20):
        n = int(rng.integers(1, 30))
        counts = rng.integers(0, 10000, size=n).tolist()
        s = mask_util.counts_to_string(counts)
        back = mask_util.string_to_counts(s)
        assert back.tolist() == counts


def test_known_golden_vectors():
    # pycocotools golden: 3x3 mask with center column set
    m = np.zeros((3, 3), np.uint8)
    m[:, 1] = 1
    r = mask_util.encode(np.asfortranarray(m))
    assert r["counts"] == b"333"  # runs [3,3,3]; delta code starts at run 4
    # full-ones 2x2
    m2 = np.ones((2, 2), np.uint8)
    r2 = mask_util.encode(np.asfortranarray(m2))
    assert mask_util.string_to_counts(r2["counts"]).tolist() == [0, 4]
    assert mask_util.area(r2) == 4


def test_area_and_bbox(rng):
    m = np.zeros((20, 30), np.uint8)
    m[5:10, 7:19] = 1
    r = mask_util.encode(m)
    assert mask_util.area(r) == 5 * 12
    np.testing.assert_allclose(mask_util.toBbox(r), [7, 5, 12, 5])


def test_merge_union_intersect():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[2:6, 2:6] = 1
    b[4:8, 4:8] = 1
    ra, rb = mask_util.encode(a), mask_util.encode(b)
    union = mask_util.decode(mask_util.merge([ra, rb]))
    inter = mask_util.decode(mask_util.merge([ra, rb], intersect=True))
    np.testing.assert_array_equal(union, (a | b))
    np.testing.assert_array_equal(inter, (a & b))


def test_frPoly_rectangle_matches_fill():
    # an axis-aligned rectangle with integer corners: COCO semantics place the
    # boundary at pixel centers: polygon (1,1)-(6,4) covers cols 1..5, rows 1..3
    poly = [1, 1, 6, 1, 6, 4, 1, 4]
    r = mask_util.frPoly(poly, 8, 10)
    m = mask_util.decode(r)
    expected = np.zeros((8, 10), np.uint8)
    expected[1:4, 1:6] = 1
    np.testing.assert_array_equal(m, expected)


def test_frPoly_area_close_to_shoelace(rng):
    for _ in range(5):
        n = 8
        angles = np.sort(rng.random(n) * 2 * np.pi)
        cx, cy, rad = 40, 35, 22
        xs = cx + rad * np.cos(angles)
        ys = cy + rad * np.sin(angles)
        poly = np.stack([xs, ys], 1).reshape(-1).tolist()
        shoelace = 0.5 * abs(np.dot(xs, np.roll(ys, 1)) - np.dot(ys, np.roll(xs, 1)))
        r = mask_util.frPoly(poly, 80, 80)
        a = mask_util.area(r)
        assert abs(a - shoelace) / max(shoelace, 1) < 0.15


def test_frBbox():
    rles = mask_util.frBbox(np.array([[2.0, 3.0, 5.0, 4.0]]), 12, 12)
    m = mask_util.decode(rles[0])
    assert m.sum() == pytest.approx(20, abs=6)
    bb = mask_util.toBbox(rles[0])
    assert abs(bb[0] - 2) <= 1 and abs(bb[1] - 3) <= 1


def test_iou_masks():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[0:4, 0:4] = 1  # 16 px
    b[2:6, 2:6] = 1  # 16 px, overlap 4
    ious = mask_util.iou([mask_util.encode(a)], [mask_util.encode(b)], [0])
    np.testing.assert_allclose(ious, [[4 / 28]])
    crowd = mask_util.iou([mask_util.encode(a)], [mask_util.encode(b)], [1])
    np.testing.assert_allclose(crowd, [[4 / 16]])


def test_iou_boxes():
    dt = np.array([[0, 0, 4, 4]], dtype=np.float64)
    gt = np.array([[2, 2, 4, 4]], dtype=np.float64)
    ious = mask_util.iou(dt, gt, [0])
    np.testing.assert_allclose(ious, [[4 / 28]])


def test_encode_box_patch_byte_parity():
    """encode_box_patch == encode of the composited full frame, byte for
    byte, including edge-touching and bottom-right-corner patches."""
    rng = np.random.default_rng(7)
    h, w = 37, 29
    cases = [
        (rng.integers(0, 2, (5, 4)).astype(np.uint8), 3, 6),
        (np.ones((4, 4), np.uint8), 0, 0),                  # top-left corner
        (np.ones((5, 3), np.uint8), w - 3, h - 5),          # bottom-right
        (np.zeros((4, 4), np.uint8), 10, 10),               # empty patch
        (rng.integers(0, 2, (h, w)).astype(np.uint8), 0, 0),  # full frame
        (np.array([[1]], np.uint8), w - 1, h - 1),          # last pixel
    ]
    for patch, x0, y0 in cases:
        frame = np.zeros((h, w), np.uint8)
        frame[y0:y0 + patch.shape[0], x0:x0 + patch.shape[1]] = patch
        want = mask_util.encode(np.asfortranarray(frame))
        got = mask_util.encode_box_patch(patch, x0, y0, h, w)
        assert got["size"] == want["size"]
        assert got["counts"] == want["counts"], (x0, y0, patch.shape)
