"""Stencil primitives vs scalar-oracle derivatives on random fields."""

import numpy as np
import pytest

from fluid2d_tpu.ops import stencil as st
from tests import oracle as orc

RNG = np.random.default_rng(0)


def _rand(shape=(9, 13)):
    return RNG.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("d", [-2, -1, 1, 2])
def test_shift_x_clamps(d):
    f = _rand()
    out = np.asarray(st.shift_x(f, d))
    for i in range(f.shape[0]):
        for j in range(f.shape[1]):
            assert out[i, j] == f[orc.clamp_idx(f.shape[0], i + d), j]


@pytest.mark.parametrize("d", [-2, -1, 1, 2])
def test_shift_y_clamps(d):
    f = _rand()
    out = np.asarray(st.shift_y(f, d))
    for i in range(f.shape[0]):
        for j in range(f.shape[1]):
            assert out[i, j] == f[i, orc.clamp_idx(f.shape[1], j + d)]


def test_shift_broadcasts_leading_axes():
    f = _rand((3, 9, 13))
    out = np.asarray(st.shift2(f, 1, -2))
    for c in range(3):
        ref = np.asarray(st.shift2(f[c], 1, -2))
        np.testing.assert_array_equal(out[c], ref)


@pytest.mark.parametrize(
    ("vec_fn", "scalar_fn"),
    [
        (st.fdiff_x, orc.fdiff_x),
        (st.fdiff_y, orc.fdiff_y),
        (st.bdiff_x, orc.bdiff_x),
        (st.bdiff_y, orc.bdiff_y),
        (st.diff_x, orc.diff_x),
        (st.diff_y, orc.diff_y),
        (st.diff2_x, orc.diff2_x),
        (st.diff2_y, orc.diff2_y),
    ],
)
def test_derivatives_match_scalar(vec_fn, scalar_fn):
    f = _rand()
    dx = 0.125
    out = np.asarray(vec_fn(f, dx))
    for i in range(f.shape[0]):
        for j in range(f.shape[1]):
            np.testing.assert_allclose(out[i, j], scalar_fn(f, i, j, dx), rtol=1e-6, atol=1e-6)


def test_sign_semantics():
    x = np.array([-1.0, -0.0, 0.0, 2.5, np.nan], dtype=np.float32)
    out = np.asarray(st.sign(x))
    np.testing.assert_array_equal(out, [-1.0, 1.0, 1.0, 1.0, 1.0])


def test_tmin_tmax_nan_policy():
    x = np.array([np.nan, 0.5, -2.0], dtype=np.float32)
    lo = np.float32(0.1)
    np.testing.assert_array_equal(np.asarray(st.tmin(x, lo)), np.array([lo, lo, -2.0], np.float32))
    np.testing.assert_array_equal(
        np.asarray(st.tmax(x, -lo)), np.array([-lo, 0.5, -lo], np.float32)
    )
