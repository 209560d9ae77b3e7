"""RLE mask tests (kornia-py segmentation.rs parity)."""

import numpy as np
import pytest

from kornia_tpu.ops import segmentation as seg


def test_roundtrip():
    rng = np.random.default_rng(0)
    mask = (rng.random((23, 17)) < 0.3).astype(np.uint8)
    rle = seg.mask_to_rle(mask)
    back = seg.rle_to_mask(rle, 23, 17)
    np.testing.assert_array_equal(back, mask)


def test_coco_convention():
    # column-major, starts with a zero-run
    mask = np.zeros((3, 2), np.uint8)
    mask[0, 0] = 1  # first element in column-major order
    rle = seg.mask_to_rle(mask)
    assert rle[0] == 0 and rle[1] == 1 and sum(rle) == 6


def test_bad_counts():
    with pytest.raises(ValueError):
        seg.rle_to_mask([1, 2], 10, 10)


def test_iou():
    a = np.zeros((4, 4)); a[:2] = 1
    b = np.zeros((4, 4)); b[1:3] = 1
    assert seg.masks_iou(a, b) == pytest.approx(4 / 12)
    assert seg.masks_iou(np.zeros((2, 2)), np.zeros((2, 2))) == 0.0
