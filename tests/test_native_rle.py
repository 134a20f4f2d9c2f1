"""Native C RLE codec parity vs the numpy reference (bit-identical)."""

import numpy as np
import pytest

from vision_instance_seg_tpu.data import native, rle


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native codec not built (no gcc?)")
    return lib


def random_mask(rng, h=73, w=61, p=0.4):
    return (rng.random((h, w)) < p).astype(np.uint8)


class TestNativeParity:
    def test_counts(self, lib, rng):
        for _ in range(10):
            m = random_mask(rng)
            np.testing.assert_array_equal(
                native.mask_to_counts(m), rle._mask_to_counts(m))

    def test_roundtrip(self, lib, rng):
        m = random_mask(rng, 120, 90)
        c = native.mask_to_counts(m)
        s = native.counts_to_string(c)
        assert s == rle.counts_to_string(c)
        c2 = native.string_to_counts(s)
        np.testing.assert_array_equal(c2, c)
        m2 = native.counts_to_mask(c, 120, 90)
        np.testing.assert_array_equal(m2, m)

    def test_empty_and_full(self, lib):
        for m in (np.zeros((8, 8), np.uint8), np.ones((8, 8), np.uint8)):
            np.testing.assert_array_equal(
                native.mask_to_counts(m), rle._mask_to_counts(m))

    def test_iou_matches_python(self, lib, rng):
        dts = [random_mask(rng, 50, 50, 0.3) for _ in range(4)]
        gts = [random_mask(rng, 50, 50, 0.3) for _ in range(3)]
        dt_r = [rle.encode(np.asfortranarray(m)) for m in dts]
        gt_r = [rle.encode(np.asfortranarray(m)) for m in gts]
        got = native.rle_iou([rle.string_to_counts(r["counts"]) for r in dt_r],
                             [rle.string_to_counts(r["counts"]) for r in gt_r],
                             np.array([0, 1, 0], np.uint8))
        # python reference path, forced
        import importlib
        expected = np.zeros((4, 3))
        for i, d in enumerate(dts):
            for j, g in enumerate(gts):
                inter = int((d.astype(bool) & g.astype(bool)).sum())
                if j == 1:
                    union = int(d.sum())
                else:
                    union = int(d.sum()) + int(g.sum()) - inter
                expected[i, j] = inter / union if union else 0
        np.testing.assert_allclose(got, expected, rtol=1e-12)

    def test_merge_matches_python(self, lib, rng):
        masks = [random_mask(rng, 40, 30, 0.3) for _ in range(3)]
        rles = [rle.encode(np.asfortranarray(m)) for m in masks]
        for intersect in (False, True):
            merged = rle.merge(rles, intersect=intersect)
            acc = masks[0].astype(bool)
            for m in masks[1:]:
                acc = (acc & m.astype(bool)) if intersect \
                    else (acc | m.astype(bool))
            np.testing.assert_array_equal(rle.decode(merged),
                                          acc.astype(np.uint8))
