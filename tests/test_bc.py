"""Boundary-condition gather maps vs the scalar oracle's scatter kernels,
on every built-in scene and on handcrafted pattern grids."""

import numpy as np
import pytest

from fluid2d_tpu.scenes.compile import compile_scene
from fluid2d_tpu.scenes.runtime_bc import dye_bc, pressure_bc, velocity_bc
from fluid2d_tpu.scenes.scenes import build_scene_arrays
from tests.oracle import Oracle

RNG = np.random.default_rng(7)


def _oracle_for(bc, mask, dye):
    return Oracle(bc, mask, dye, dt=1e-3, dx=0.01, re=100.0, enable_dye=True)


def _to_cl(arr):  # (X, Y, C) → (C, X, Y)
    return np.moveaxis(arr, -1, 0)


@pytest.mark.parametrize("num", [1, 2, 3, 4, 5, 6])
def test_scene_bc_parity(num):
    bc, mask, dye = build_scene_arrays(num, 36)
    scene = compile_scene(bc, mask, dye)
    orc = _oracle_for(bc, mask, dye)

    v = RNG.standard_normal(mask.shape + (2,)).astype(np.float32)
    v_ref = v.copy()
    orc.set_velocity_bc(v_ref)
    v_jax = np.moveaxis(np.asarray(velocity_bc(_to_cl(v), scene)), 0, -1)
    np.testing.assert_array_equal(v_jax, v_ref)

    p = RNG.standard_normal(mask.shape).astype(np.float32)
    p_ref = p.copy()
    orc.set_pressure_bc(p_ref)
    p_jax = np.asarray(pressure_bc(p, scene))
    np.testing.assert_allclose(p_jax, p_ref, rtol=0, atol=0)

    d = RNG.random(mask.shape + (3,)).astype(np.float32)
    d_ref = d.copy()
    orc.set_dye_bc(d_ref)
    d_jax = np.moveaxis(np.asarray(dye_bc(_to_cl(d), scene)), 0, -1)
    np.testing.assert_array_equal(d_jax, d_ref)


def _pattern_grid():
    """Handcrafted mask exercising all four ghost patterns and all ten
    pressure patterns, with ≥2-px walls like the scenes."""
    mask = np.zeros((16, 16), dtype=np.uint8)
    mask[:, :2] = 1  # bottom wall
    mask[:, -2:] = 1  # top wall
    mask[:2, :] = 2  # inflow column
    mask[-1, :] = 3  # outflow column
    mask[6:10, 6:10] = 1  # interior block: corners exercise patterns 5-8
    bc = np.zeros(mask.shape + (2,), dtype=np.float32)
    bc[mask == 2] = [1.0, 0.0]
    dye = np.zeros(mask.shape + (3,), dtype=np.float32)
    dye[mask == 2] = [1.0, 0.5, 0.2]
    return bc, mask, dye


def test_pattern_grid_bc_parity():
    bc, mask, dye = _pattern_grid()
    scene = compile_scene(bc, mask, dye)
    # the block must produce ghost targets on all four sides
    assert np.asarray(scene.vbc_targets).sum(axis=(1, 2)).min() >= 1
    codes = set(np.unique(np.asarray(scene.pbc_code)))
    assert {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10} <= codes

    orc = _oracle_for(bc, mask, dye)
    v = RNG.standard_normal(mask.shape + (2,)).astype(np.float32)
    v_ref = v.copy()
    orc.set_velocity_bc(v_ref)
    v_jax = np.moveaxis(np.asarray(velocity_bc(_to_cl(v), scene)), 0, -1)
    np.testing.assert_array_equal(v_jax, v_ref)

    p = RNG.standard_normal(mask.shape).astype(np.float32)
    p_ref = p.copy()
    orc.set_pressure_bc(p_ref)
    np.testing.assert_array_equal(np.asarray(pressure_bc(p, scene)), p_ref)


def test_outflow_nan_policy():
    bc, mask, dye = _pattern_grid()
    scene = compile_scene(bc, mask, dye)
    v = np.zeros(mask.shape + (2,), dtype=np.float32)
    v[-2, :, 0] = np.nan  # upstream of the outflow column
    out = np.asarray(velocity_bc(_to_cl(v), scene))
    assert np.all(out[0][-1, :] == np.float32(0.05))  # fmax(NaN, 0.05) → 0.05


def test_ghost_conflict_priority():
    """Conflicting ghost targets (racy in the reference — two wall
    triggers around curved obstacles aim at the same ghost cell) resolve
    by the documented fixed priority: pattern 4 > 3 > 2 > 1
    (docs/PARITY.md §2). Scene 6's image mask produces real conflicts;
    oracle and runtime must still agree exactly."""
    bc, mask, dye = build_scene_arrays(6, 36)
    scene = compile_scene(bc, mask, dye)
    conflict = np.asarray(scene.vbc_targets).sum(axis=0) > 1
    assert conflict.any()  # the scene really does produce conflicts

    v = RNG.standard_normal(mask.shape + (2,)).astype(np.float32)
    orc = _oracle_for(bc, mask, dye)
    v_ref = v.copy()
    orc.set_velocity_bc(v_ref)
    v_jax = np.moveaxis(np.asarray(velocity_bc(_to_cl(v), scene)), 0, -1)
    np.testing.assert_array_equal(v_jax, v_ref)
