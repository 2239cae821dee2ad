"""Vorticity confinement force: math parity and the NaN/clamp branch."""

import numpy as np
import jax.numpy as jnp

from fluid2d_tpu.ops.vorticity import confinement_force
from tests import oracle as orc

RNG = np.random.default_rng(3)


def _oracle_force(v_np, fluid, dx):
    F = np.float32
    X, Y = fluid.shape
    vort = np.zeros((X, Y), F)
    vabs = np.zeros((X, Y), F)
    for i in range(X):
        for j in range(Y):
            if fluid[i, j]:
                w = orc.diff_x(v_np, i, j, dx)[1] - orc.diff_y(v_np, i, j, dx)[0]
                vort[i, j] = w
                vabs[i, j] = abs(w)
    force = np.zeros((X, Y, 2), F)
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(X):
            for j in range(Y):
                gx = orc.diff_x(vabs, i, j, dx)
                gy = orc.diff_y(vabs, i, j, dx)
                norm = np.sqrt(gx * gx + gy * gy)
                nx, ny = gx / norm, gy / norm
                force[i, j, 0] = np.fmax(np.fmin(ny * vort[i, j], F(0.1)), F(-0.1))
                force[i, j, 1] = np.fmax(np.fmin(-nx * vort[i, j], F(0.1)), F(-0.1))
    return force


def test_force_matches_oracle_on_random_field():
    shape = (12, 10)
    fluid = np.ones(shape, dtype=bool)
    v = RNG.standard_normal(shape + (2,)).astype(np.float32)
    ref = _oracle_force(v, fluid, 0.1)
    got = np.moveaxis(
        np.asarray(confinement_force(jnp.asarray(np.moveaxis(v, -1, 0)), jnp.asarray(fluid), 0.1)),
        0, -1,
    )
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_zero_field_takes_nan_clamp_branch():
    """Uniform flow → ω ≡ 0 → ∇‖ω‖ = 0 → 0/0 NaN → fmin/fmax clamp
    yields +0.1 in BOTH components (the reference's effective behavior,
    ``fs/vorticity_confinement.py:49,55``)."""
    shape = (8, 8)
    fluid = np.ones(shape, dtype=bool)
    v = np.zeros(shape + (2,), dtype=np.float32)
    got = np.asarray(confinement_force(jnp.asarray(np.moveaxis(v, -1, 0)), jnp.asarray(fluid), 0.1))
    ref = _oracle_force(v, fluid, 0.1)
    assert np.all(got == np.float32(0.1))
    np.testing.assert_array_equal(np.moveaxis(got, 0, -1), ref)


def test_force_clamped_to_limits():
    v = (10.0 * RNG.standard_normal((16, 16, 2))).astype(np.float32)
    fluid = np.ones((16, 16), dtype=bool)
    got = np.asarray(
        confinement_force(jnp.asarray(np.moveaxis(v, -1, 0)), jnp.asarray(fluid), 0.01)
    )
    assert np.all(got <= 0.1) and np.all(got >= -0.1)
    assert not np.isnan(got).any()
