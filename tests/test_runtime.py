"""Native C++ rasterizer vs the NumPy reference paths (bit-identical)."""

import numpy as np
import pytest

from fluid2d_tpu.runtime import load_rasterizer
from fluid2d_tpu.scenes import builder

pytestmark = pytest.mark.skipif(load_rasterizer() is None,
                                reason="no native toolchain available")


def _arrays(x=96, y=48):
    return builder.new_scene_arrays(x, y)


def test_native_circle_matches_numpy():
    rng = np.random.default_rng(5)
    centers = rng.uniform(0, 96, (40, 2))
    radius = 7.3

    bc_n, mask_n, dye_n = _arrays()
    bc_p, mask_p, dye_p = _arrays()
    old = builder.USE_NATIVE
    try:
        builder.USE_NATIVE = True
        for c in centers:
            builder.paint_circle(bc_n, mask_n, dye_n, c, radius)
        builder.USE_NATIVE = False
        for c in centers:
            builder.paint_circle(bc_p, mask_p, dye_p, c, radius)
    finally:
        builder.USE_NATIVE = old

    np.testing.assert_array_equal(mask_n, mask_p)
    np.testing.assert_array_equal(bc_n, bc_p)
    np.testing.assert_array_equal(dye_n, dye_p)
    assert mask_n.sum() > 0


def test_native_circles_batch():
    lib = load_rasterizer()
    bc, mask, dye = _arrays()
    circles = np.array([[10.0, 10.0, 4.0], [50.5, 20.25, 6.5]], dtype=np.float64)
    lib.raster_circles(mask, bc, dye, mask.shape[0], mask.shape[1], circles, 2)

    bc_r, mask_r, dye_r = _arrays()
    old = builder.USE_NATIVE
    try:
        builder.USE_NATIVE = False
        for cx, cy, r in circles:
            builder.paint_circle(bc_r, mask_r, dye_r, (cx, cy), r)
    finally:
        builder.USE_NATIVE = old
    np.testing.assert_array_equal(mask, mask_r)


def test_native_box_and_gray_mask():
    lib = load_rasterizer()
    bc, mask, dye = _arrays()
    lib.raster_box(mask, bc, dye, mask.shape[0], mask.shape[1], 5, 3, 20, 40)
    bc_r, mask_r, dye_r = _arrays()
    builder.paint_box(bc_r, mask_r, dye_r, (5, 3), (20, 40))
    np.testing.assert_array_equal(mask, mask_r)

    gray = np.random.default_rng(0).integers(0, 255, mask.shape, dtype=np.uint8)
    bc2, mask2, dye2 = _arrays()
    lib.raster_gray_mask(mask2, bc2, dye2, mask2.shape[0], mask2.shape[1],
                         np.ascontiguousarray(gray), 200)
    np.testing.assert_array_equal(mask2 == 1, gray < 200)
    assert (bc2[gray < 200] == 0).all()


def test_scene3_native_equals_numpy():
    """Scene 3's 100 random cylinders — the real consumer — through both
    paths."""
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    old = builder.USE_NATIVE
    try:
        builder.USE_NATIVE = True
        bc_n, mask_n, dye_n = build_scene_arrays(3, 64)
        builder.USE_NATIVE = False
        bc_p, mask_p, dye_p = build_scene_arrays(3, 64)
    finally:
        builder.USE_NATIVE = old
    np.testing.assert_array_equal(mask_n, mask_p)
    np.testing.assert_array_equal(bc_n, bc_p)
    np.testing.assert_array_equal(dye_n, dye_p)
