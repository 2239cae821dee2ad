"""End-to-end parity: N full time steps vs the scalar reference oracle.

This is the build's substitute for golden-field regression against the
Taichi reference (not installable here — SURVEY.md §4): the oracle
mirrors the reference's per-cell kernels and buffer dance; the JAX build
must reproduce every carried field, including the stale alternate
buffers and CIP gradient fields.

Initial conditions: smooth random fields in BOTH buffers (distinct), not
zeros. Two reasons: (a) distinguishable buffer contents catch any
staleness-semantics error that zeros would mask; (b) vorticity
confinement divides by an unguarded ∇‖ω‖ norm — at exactly-zero
gradient (uniform/quiet regions of a zero start) the NaN→clamp path is
*discontinuous*, so single-ulp differences between any two correct
implementations (XLA fusion vs scalar NumPy — or Taichi GPU vs CPU)
blow up to O(0.1) force jumps. Smooth random fields have nonzero
gradients a.e., testing the confinement math itself rather than that
unstable branch (which has its own targeted test in test_vorticity.py).
"""

import numpy as np
import pytest

from fluid2d_tpu.config import SimConfig
from fluid2d_tpu.models.simulator import make_run_fn
from fluid2d_tpu.scenes.compile import compile_scene
from fluid2d_tpu.scenes.scenes import build_scene_arrays
from fluid2d_tpu.state import init_state
from tests.oracle import Oracle

RES = 20
STEPS = 6


def _smooth_random(rng, shape, amplitude):
    """Band-limited random field: white noise blurred with a few box
    passes so derivatives are O(amplitude/dx) but never exactly zero."""
    f = rng.standard_normal(shape)
    for ax in (0, 1):
        for _ in range(2):
            f = (np.roll(f, 1, axis=ax) + f + np.roll(f, -1, axis=ax)) / 3.0
    return (amplitude * f).astype(np.float32)


def _random_fields(mask, enable_dye, cip, seed):
    rng = np.random.default_rng(seed)
    shp = mask.shape
    fields = {
        "v": _smooth_random(rng, shp + (2,), 0.5),
        "v_alt": _smooth_random(rng, shp + (2,), 0.5),
        "p": _smooth_random(rng, shp, 0.3),
        "p_alt": _smooth_random(rng, shp, 0.3),
    }
    if cip:
        fields["vx"] = _smooth_random(rng, shp + (2,), 1.0)
        fields["vx_alt"] = _smooth_random(rng, shp + (2,), 1.0)
        fields["vy"] = _smooth_random(rng, shp + (2,), 1.0)
        fields["vy_alt"] = _smooth_random(rng, shp + (2,), 1.0)
    if enable_dye:
        fields["dye"] = np.abs(_smooth_random(rng, shp + (3,), 0.4))
        fields["dye_alt"] = np.abs(_smooth_random(rng, shp + (3,), 0.4))
        if cip:
            fields["dyex"] = _smooth_random(rng, shp + (3,), 1.0)
            fields["dyex_alt"] = _smooth_random(rng, shp + (3,), 1.0)
            fields["dyey"] = _smooth_random(rng, shp + (3,), 1.0)
            fields["dyey_alt"] = _smooth_random(rng, shp + (3,), 1.0)
    return fields


def _seed_state(state, fields):
    import jax.numpy as jnp

    def cl(a):
        return jnp.asarray(np.moveaxis(a, -1, 0)) if a.ndim == 3 else jnp.asarray(a)

    return state._replace(**{k: cl(v) for k, v in fields.items()})


def _seed_oracle(orc, fields):
    pairs = {"v": orc.v, "p": orc.p}
    if orc.scheme == "cip":
        pairs.update(vx=orc.vx, vy=orc.vy)
    if orc.enable_dye:
        pairs["dye"] = orc.dye
        if orc.scheme == "cip":
            pairs.update(dyex=orc.dyex, dyey=orc.dyey)
    for name, buf in pairs.items():
        np.copyto(buf.cur, fields[name])
        np.copyto(buf.nxt, fields[name + "_alt"])


def _run_pair(num, scheme, *, vor_eps, enable_dye, pressure_solver="sor", re=1000.0,
              steps=STEPS, seed=0):
    bc, mask, dye = build_scene_arrays(num, RES)
    cfg = SimConfig.create(
        resolution=RES,
        re=re,
        scheme=scheme,
        vor_eps=vor_eps,
        enable_dye=enable_dye,
        pressure_solver=pressure_solver,
    )
    fields = _random_fields(mask, enable_dye, scheme == "cip", seed)

    scene = compile_scene(bc, mask, dye)
    state = _seed_state(init_state(scene, cfg), fields)
    state = make_run_fn(cfg)(state, scene, steps)

    orc = Oracle(
        bc, mask, dye,
        dt=cfg.dt, dx=cfg.dx, re=re, scheme=scheme, vor_eps=vor_eps,
        enable_dye=enable_dye, pressure_solver=pressure_solver,
        omega=cfg.sor_omega, n_iter=cfg.n_pressure_iter,
    )
    _seed_oracle(orc, fields)
    for _ in range(steps):
        orc.step()
    return state, orc


def _cmp(name, jax_arr, np_arr, tol=2e-5):
    got = np.asarray(jax_arr)
    if got.ndim == 3:  # (C, X, Y) → (X, Y, C)
        got = np.moveaxis(got, 0, -1)
    scale = max(1.0, float(np.abs(np_arr).max()))
    np.testing.assert_allclose(got, np_arr, atol=tol * scale, rtol=0, err_msg=name)


@pytest.mark.parametrize("scheme", ["upwind", "kk", "cip"])
@pytest.mark.parametrize("num", [1, 2])
def test_parity_full(scheme, num):
    """Dye + vorticity confinement on scenes 1 (1-wide outflow) and 2
    (2-wide outflow, corner pressure patterns); every carried buffer."""
    state, orc = _run_pair(num, scheme, vor_eps=5.0, enable_dye=True)
    _cmp("v", state.v, orc.v.cur)
    _cmp("v_alt", state.v_alt, orc.v.nxt)
    _cmp("p", state.p, orc.p.cur)
    _cmp("p_alt", state.p_alt, orc.p.nxt)
    _cmp("dye", state.dye, orc.dye.cur)
    _cmp("dye_alt", state.dye_alt, orc.dye.nxt)
    if scheme == "cip":
        _cmp("vx", state.vx, orc.vx.cur)
        _cmp("vy", state.vy, orc.vy.cur)
        _cmp("dyex", state.dyex, orc.dyex.cur)
        _cmp("dyey", state.dyey, orc.dyey.cur)


@pytest.mark.parametrize("scheme", ["upwind", "cip"])
def test_parity_zero_start_no_vc(scheme):
    """The reference's actual start state (all zeros) — vc disabled, so
    no unstable 0/0 branch; everything else exercised from cold."""
    bc, mask, dye = build_scene_arrays(4, RES)
    cfg = SimConfig.create(resolution=RES, re=1000.0, scheme=scheme,
                           vor_eps=None, enable_dye=False)
    scene = compile_scene(bc, mask, dye)
    state = make_run_fn(cfg)(init_state(scene, cfg), scene, STEPS)
    orc = Oracle(bc, mask, dye, dt=cfg.dt, dx=cfg.dx, re=1000.0, scheme=scheme,
                 vor_eps=None, enable_dye=False)
    for _ in range(STEPS):
        orc.step()
    _cmp("v", state.v, orc.v.cur)
    _cmp("p", state.p, orc.p.cur)


def test_parity_jacobi():
    state, orc = _run_pair(1, "upwind", vor_eps=None, enable_dye=False,
                           pressure_solver="jacobi")
    _cmp("v", state.v, orc.v.cur)
    _cmp("p", state.p, orc.p.cur)


@pytest.mark.parametrize("num", [3, 5, 6])
def test_parity_remaining_scenes_cip(num):
    """CIP + dye over the obstacle-heavy scenes (shorter horizon)."""
    state, orc = _run_pair(num, "cip", vor_eps=5.0, enable_dye=True, steps=4)
    _cmp("v", state.v, orc.v.cur)
    _cmp("p", state.p, orc.p.cur)
    _cmp("dye", state.dye, orc.dye.cur)


@pytest.mark.parametrize(
    ("num", "scheme"),
    [(3, "upwind"), (3, "kk"), (4, "kk"), (4, "cip"),
     (5, "upwind"), (5, "kk"), (6, "upwind"), (6, "kk")],
)
def test_parity_full_matrix(num, scheme):
    """Completes the all-schemes × all-scenes matrix (BASELINE: fields
    match the reference semantics on every combination). Short horizon
    keeps the scalar oracle affordable."""
    state, orc = _run_pair(num, scheme, vor_eps=5.0, enable_dye=True, steps=3, seed=num)
    _cmp("v", state.v, orc.v.cur)
    _cmp("p", state.p, orc.p.cur)
    _cmp("dye", state.dye, orc.dye.cur)
