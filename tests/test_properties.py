"""Physical-invariant property tests (SURVEY.md §4.3)."""

import numpy as np
import pytest

from fluid2d_tpu.config import SimConfig
from fluid2d_tpu.models.simulator import make_run_fn, make_step_fn
from fluid2d_tpu.scenes.compile import get_scene
from fluid2d_tpu.state import init_state
from fluid2d_tpu.utils.metrics import divergence


@pytest.mark.parametrize("scheme", ["upwind", "kk", "cip"])
def test_invariants_over_run(scheme):
    res = 32
    cfg = SimConfig.create(resolution=res, re=1000.0, scheme=scheme,
                           vor_eps=5.0, enable_dye=True)
    scene = get_scene(1, res)
    state = init_state(scene, cfg)
    run = make_run_fn(cfg)
    wall = np.asarray(scene.wall)

    for _ in range(4):
        state = run(state, scene, 10)
        v = np.asarray(state.v)
        dye = np.asarray(state.dye)
        assert not np.isnan(v).any() and not np.isnan(np.asarray(state.p)).any()
        # ‖v‖ ≤ VELOCITY_LIMIT after every step (fs/solver.py:12,89)
        assert np.sqrt((v**2).sum(axis=0)).max() <= cfg.velocity_limit + 1e-5
        # dye stays in [0, 1] on the current buffer (fs/solver.py:152,373)
        assert dye.min() >= 0.0 and dye.max() <= 1.0
        # deep wall cells never acquire velocity (only ghost layers are
        # written; first wall layer is never written at all)
        first_layer = wall & ~np.asarray(scene.vbc_targets).any(axis=0)
        assert np.abs(v[:, first_layer]).max() == 0.0


def test_sor_reduces_divergence():
    """More SOR iterations → (weakly) smaller RMS divergence of the
    projected velocity over a developed flow."""
    res = 32
    scene = get_scene(1, res)
    rms = {}
    for n_iter in (1, 8):
        cfg = SimConfig.create(resolution=res, re=1000.0, scheme="upwind",
                               vor_eps=None, enable_dye=False,
                               n_pressure_iter=n_iter)
        state = make_run_fn(cfg)(init_state(scene, cfg), scene, 60)
        div = np.asarray(divergence(state.v, cfg.dx))
        fluid = np.asarray(scene.fluid)
        rms[n_iter] = float(np.sqrt((div[fluid] ** 2).mean()))
    assert rms[8] < rms[1]


def test_step_counter_and_determinism():
    res = 24
    cfg = SimConfig.create(resolution=res, scheme="cip", enable_dye=True)
    scene = get_scene(2, res)
    step = make_step_fn(cfg)

    a = init_state(scene, cfg)
    for _ in range(3):
        a = step(a, scene)
    assert int(a.step) == 3

    b = init_state(scene, cfg)
    for _ in range(3):
        b = step(b, scene)
    np.testing.assert_array_equal(np.asarray(a.v), np.asarray(b.v))
