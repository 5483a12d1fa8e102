"""Face matting: convex-hull landmark mask.

Parity with tools/wild_fit_base.py:346-420 (`get_image_hull_mask` +
`merge_add_mask`): the face region is the filled convex hull of the 68
landmarks; everything outside is zeroed.
"""
from __future__ import annotations

import numpy as np


def hull_mask(shape_hw, kp_xy: np.ndarray) -> np.ndarray:
    """[H, W] uint8 mask = filled convex hull of landmarks ((x, y) order)."""
    import cv2

    mask = np.zeros(shape_hw[:2], np.uint8)
    hull = cv2.convexHull(np.asarray(kp_xy, np.int32))
    cv2.fillConvexPoly(mask, hull, 1)
    return mask


def apply_mask(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    return img * mask[..., None].astype(img.dtype)
