"""Pallas kernels (interpret mode) vs the jnp reference path."""

import numpy as np
import pytest
import jax.numpy as jnp

from fluid2d_tpu.ops.cip import cip_advect
from fluid2d_tpu.ops.pallas_stencil import cip_advect_pallas, pick_tile

RNG = np.random.default_rng(9)


def _mk(*shape):
    return jnp.asarray(RNG.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("chans", [2, 3])
@pytest.mark.parametrize("tile", [8, 16])
def test_cip_advect_pallas_matches_jnp(chans, tile):
    X, Y = 48, 20
    dt, dx = 0.002, 0.05
    f, fx, fy = _mk(chans, X, Y), _mk(chans, X, Y), _mk(chans, X, Y)
    vel = _mk(2, X, Y)
    alts = [_mk(chans, X, Y) for _ in range(3)]
    fluid = RNG.random((X, Y)) > 0.3
    fluid8 = jnp.asarray(fluid, jnp.int8)

    ref = cip_advect(f, fx, fy, vel[0], vel[1], dt, dx)
    ref = [np.asarray(jnp.where(fluid, r, a)) for r, a in zip(ref, alts)]
    got = cip_advect_pallas(f, fx, fy, vel, *alts, fluid8, dt, dx,
                            tile_x=tile, interpret=True)
    for name, g, r in zip(("fn", "fxn", "fyn"), got, ref):
        scale = max(1.0, np.abs(r).max())
        np.testing.assert_allclose(np.asarray(g), r, atol=1e-5 * scale, rtol=0, err_msg=name)


def test_cip_advect_pallas_self_advection():
    """vel is f (velocity advecting itself) skips the duplicate fetch."""
    X, Y = 32, 12
    dt, dx = 0.002, 0.05
    f, fx, fy = _mk(2, X, Y), _mk(2, X, Y), _mk(2, X, Y)
    alts = [_mk(2, X, Y) for _ in range(3)]
    fluid = RNG.random((X, Y)) > 0.3
    fluid8 = jnp.asarray(fluid, jnp.int8)

    ref = cip_advect(f, fx, fy, f[0], f[1], dt, dx)
    ref = [np.asarray(jnp.where(fluid, r, a)) for r, a in zip(ref, alts)]
    got = cip_advect_pallas(f, fx, fy, f, *alts, fluid8, dt, dx,
                            tile_x=8, interpret=True)
    for g, r in zip(got, ref):
        scale = max(1.0, np.abs(r).max())
        np.testing.assert_allclose(np.asarray(g), r, atol=1e-5 * scale, rtol=0)


def test_cip_advect_pallas_upwind_boundaries():
    """Velocity signs force reads across the tile and grid edges in every
    direction; the clamp handling at first/last tiles must match."""
    X, Y = 32, 12
    dt, dx = 0.01, 0.1
    f, fx, fy = _mk(2, X, Y), _mk(2, X, Y), _mk(2, X, Y)
    # Alternating sign bands crossing tile boundaries.
    u = jnp.asarray(np.tile(np.repeat([1.0, -1.0], 4), X // 8)[:, None] * np.ones((X, Y)),
                    jnp.float32)
    vel = jnp.stack([u, -u])
    alts = [jnp.zeros((2, X, Y), jnp.float32) for _ in range(3)]
    fluid8 = jnp.ones((X, Y), jnp.int8)

    ref = cip_advect(f, fx, fy, vel[0], vel[1], dt, dx)
    got = cip_advect_pallas(f, fx, fy, vel, *alts, fluid8, dt, dx,
                            tile_x=8, interpret=True)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("tile", [8, 16])
def test_sor_iteration_pallas_matches_jnp(tile):
    from fluid2d_tpu.ops.pallas_stencil import sor_iteration_pallas
    from fluid2d_tpu.ops.pressure import sor_pressure_iteration
    from fluid2d_tpu.scenes.compile import compile_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    bc, mask, dye = build_scene_arrays(2, 16)  # grid (32, 16)
    scene = compile_scene(bc, mask, dye)
    p = _mk(*mask.shape)
    pa = _mk(*mask.shape)
    u = _mk(*mask.shape)
    w = _mk(*mask.shape)
    omega, dt, dx = 1.3, 1e-3, 1 / 16

    ref = sor_pressure_iteration(p, pa, u, w, scene, omega, dt, dx)
    got = sor_iteration_pallas(p, pa, u, w, scene.pbc_code, scene.fluid8,
                               omega, dt, dx, tile_x=tile, interpret=True)
    for name, g, r in zip(("pn", "pc"), got, ref):
        scale = max(1.0, np.abs(np.asarray(r)).max())
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-5 * scale, rtol=0, err_msg=name)


@pytest.mark.parametrize("tile", [8, 16])
@pytest.mark.parametrize("n_iters", [1, 2, 4])
def test_jacobi_iteration_pallas_matches_jnp(tile, n_iters):
    """Fused Pallas Jacobi (VERDICT r3 item #7) vs chained jnp
    jacobi_pressure_iteration — up to 4 iterations per kernel (2-row
    halo each), so the default n_pressure_iter=2 is one kernel."""
    from fluid2d_tpu.ops.pallas_stencil import jacobi_iteration_pallas
    from fluid2d_tpu.ops.pressure import jacobi_pressure_iteration
    from fluid2d_tpu.scenes.compile import compile_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    bc, mask, dye = build_scene_arrays(2, 16)  # grid (32, 16)
    scene = compile_scene(bc, mask, dye)
    p, pa, u, w = (_mk(*mask.shape) for _ in range(4))
    dt, dx = 1e-3, 1 / 16

    ref = (p, pa)
    for _ in range(n_iters):
        ref = jacobi_pressure_iteration(*ref, u, w, scene, dt, dx)
    got = jacobi_iteration_pallas(p, pa, u, w, scene.pbc_code, scene.not_wall8,
                                  dt, dx, n_iters=n_iters, tile_x=tile,
                                  interpret=True)
    for name, g, r in zip(("pn", "pc"), got, ref):
        scale = max(1.0, np.abs(np.asarray(r)).max())
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-5 * scale, rtol=0, err_msg=name)


def test_jacobi_pallas_vlimit_matches_separate():
    """`v_limit` folding in the fused Jacobi kernel: the third output is
    exactly limit_vector_norm of the input velocity."""
    from fluid2d_tpu.ops.limiters import limit_vector_norm
    from fluid2d_tpu.ops.pallas_stencil import jacobi_iteration_pallas
    from fluid2d_tpu.scenes.compile import compile_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    bc, mask, dye = build_scene_arrays(2, 16)
    scene = compile_scene(bc, mask, dye)
    p, pa = _mk(*mask.shape), _mk(*mask.shape)
    u = 4.0 * _mk(*mask.shape)
    w = 4.0 * _mk(*mask.shape)
    dt, dx = 1e-3, 1 / 16

    pn, pc, vlim = jacobi_iteration_pallas(
        p, pa, u, w, scene.pbc_code, scene.not_wall8, dt, dx,
        n_iters=2, v_limit=3.0, tile_x=8, interpret=True)
    ref = limit_vector_norm(jnp.stack([u, w]), 3.0)
    np.testing.assert_allclose(np.asarray(vlim), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_update_pressure_jacobi_routes_to_pallas_interpret():
    """models/common.update_pressure takes the fused Jacobi path when
    pressure_solver='jacobi' and kernels force Pallas — and matches the
    jnp route."""
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.common import update_pressure
    from fluid2d_tpu.scenes.compile import get_scene

    res = 16
    scene = get_scene(2, res)
    p, pa = _mk(2 * res, res), _mk(2 * res, res)
    v = jnp.stack([_mk(2 * res, res), _mk(2 * res, res)])

    cfg_j = SimConfig.create(resolution=res, scheme="cip", vor_eps=None,
                             enable_dye=False, pressure_solver="jacobi",
                             kernels="pallas_interpret")
    cfg_ref = SimConfig.create(resolution=res, scheme="cip", vor_eps=None,
                               enable_dye=False, pressure_solver="jacobi",
                               kernels="xla")
    got = update_pressure(p, pa, v, scene, cfg_j)
    ref = update_pressure(p, pa, v, scene, cfg_ref)
    for name, g, r in zip(("pn", "pc"), got, ref):
        scale = max(1.0, np.abs(np.asarray(r)).max())
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-5 * scale, rtol=0, err_msg=name)


@pytest.mark.parametrize("n_total", [2, 3, 4])
def test_sor_fused_pair_matches_chained(n_total):
    """The fused 2-iterations-per-kernel SOR (halo depth 6) against
    chained single-iteration kernels AND the jnp path. Tolerance, not
    bit-equality: the three program structures fuse differently, so
    XLA's FMA contraction rounds a few intermediates differently
    (~1-ulp each; each variant is tile-size-invariant, verified while
    building this)."""
    from fluid2d_tpu.ops.pallas_stencil import sor_iteration_pallas
    from fluid2d_tpu.ops.pressure import sor_pressure_iteration
    from fluid2d_tpu.scenes.compile import compile_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    bc, mask, dye = build_scene_arrays(2, 24)  # grid (48, 24)
    scene = compile_scene(bc, mask, dye)
    p, pa, u, w = _mk(*mask.shape), _mk(*mask.shape), _mk(*mask.shape), _mk(*mask.shape)
    omega, dt, dx = 1.3, 0.05 / 24, 1 / 24
    rest = (u, w, scene.pbc_code, scene.fluid8, omega, dt, dx)

    chained = (p, pa)
    jnp_pair = (p, pa)
    for _ in range(n_total):
        chained = sor_iteration_pallas(*chained, *rest, tile_x=8, interpret=True)
        jnp_pair = sor_pressure_iteration(*jnp_pair, u, w, scene, omega, dt, dx)

    fused = (p, pa)
    n = n_total
    while n > 0:
        k = min(2, n)
        fused = sor_iteration_pallas(*fused, *rest, n_iters=k, tile_x=8, interpret=True)
        n -= k

    for name, g, r in zip(("pn", "pc"), fused, chained):
        scale = max(1.0, np.abs(np.asarray(r)).max())
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-5 * scale, rtol=0, err_msg=name)
    for name, g, r in zip(("pn", "pc"), fused, jnp_pair):
        scale = max(1.0, np.abs(np.asarray(r)).max())
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-5 * scale, rtol=0, err_msg=name + "/jnp")


def test_sor_fused_vlimit_matches_separate():
    """v_limit folded into the fused pair == the standalone limiter."""
    from fluid2d_tpu.ops.limiters import limit_vector_norm
    from fluid2d_tpu.ops.pallas_stencil import sor_iteration_pallas
    from fluid2d_tpu.scenes.compile import compile_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    bc, mask, dye = build_scene_arrays(1, 16)
    scene = compile_scene(bc, mask, dye)
    p, pa = _mk(*mask.shape), _mk(*mask.shape)
    u = 3.0 * _mk(*mask.shape)
    w = 3.0 * _mk(*mask.shape)
    rest = (u, w, scene.pbc_code, scene.fluid8, 1.3, 1e-3, 1 / 16)

    plain = sor_iteration_pallas(p, pa, *rest, n_iters=2, tile_x=8, interpret=True)
    lim = sor_iteration_pallas(p, pa, *rest, n_iters=2, v_limit=1.0,
                               tile_x=8, interpret=True)
    assert jnp.array_equal(plain[0], lim[0]) and jnp.array_equal(plain[1], lim[1])
    ref_v = limit_vector_norm(jnp.stack([u, w]), 1.0)
    np.testing.assert_allclose(np.asarray(lim[2]), np.asarray(ref_v), atol=1e-6, rtol=0)


def test_full_step_sor_fuse2_matches():
    """cfg.sor_fuse=2 (fused pair kernel) over full steps vs the default
    chained path."""
    import dataclasses

    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.simulator import make_run_fn
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    cfg1 = SimConfig.create(resolution=16, scheme="cip", vor_eps=None,
                            enable_dye=True, kernels="pallas_interpret")
    cfg2 = dataclasses.replace(cfg1, sor_fuse=2)
    scene = get_scene(1, 16)
    s1 = make_run_fn(cfg1)(init_state(scene, cfg1), scene, 3)
    s2 = make_run_fn(cfg2)(init_state(scene, cfg2), scene, 3)
    for name in ("v", "p", "dye", "p_alt"):
        r = np.asarray(getattr(s1, name))
        scale = max(1.0, np.abs(r).max())
        np.testing.assert_allclose(np.asarray(getattr(s2, name)), r,
                                   atol=1e-5 * scale, rtol=0, err_msg=name)


def test_full_step_2d_tiled_matches_xla(monkeypatch):
    """The 2-D (row + lane) tiled phase kernels — used when the lane
    width exceeds the 1-D VMEM budget — against the XLA path. Forcing
    the 2-D dispatch by making every 1-D phase tile infeasible."""
    import jax

    import fluid2d_tpu.ops.pallas_phases as ph
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.simulator import step_fn_for
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays
    from fluid2d_tpu.state import init_state
    from tests.test_parity import _random_fields, _seed_state

    res = 256  # Y=256 → ty=128, n_ty=2
    _, mask, _ = build_scene_arrays(2, res)
    scene = get_scene(2, res)
    fields = _random_fields(mask, True, True, seed=6)

    cfg = SimConfig.create(resolution=res, re=1000.0, scheme="cip",
                           vor_eps=5.0, enable_dye=True, kernels="xla")
    step = jax.jit(step_fn_for(cfg))
    ref = step(step(_seed_state(init_state(scene, cfg), fields), scene), scene)

    monkeypatch.setattr(ph, "_vmem_tile", lambda *a, **k: None)
    cfg2 = SimConfig.create(resolution=res, re=1000.0, scheme="cip",
                            vor_eps=5.0, enable_dye=True, kernels="pallas_interpret")
    step2 = jax.jit(step_fn_for(cfg2))
    got = step2(step2(_seed_state(init_state(scene, cfg2), fields), scene), scene)

    for name, a, b in zip(ref._fields, ref, got):
        if a is None:
            continue
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, atol=2e-5 * scale, rtol=0, err_msg=name)


def test_pick_tile():
    assert pick_tile(3200) is not None and 3200 % pick_tile(3200) == 0
    assert pick_tile(40) == 8
    assert pick_tile(800) is not None and 800 % pick_tile(800) == 0
    assert pick_tile(10) is None  # pathological → jnp fallback


def test_pick_tile2d_alignment():
    """Tiles must be multiples of (8, 128): the block index maps work in
    those units, so a misaligned tile silently fetches wrong halos.
    Unalignable grids must return None (→ XLA fallback), not a bad tile."""
    from fluid2d_tpu.ops.pallas_stencil import pick_tile2d

    cheap = lambda t, ty: 0  # noqa: E731
    for x, y in [(8192, 4096), (640, 512), (1024, 256)]:
        tile = pick_tile2d(x, y, cheap)
        assert tile is not None
        t, ty = tile
        assert x % t == 0 and t % 8 == 0
        assert y % ty == 0 and ty % 128 == 0
    # y with no 128-multiple divisor ≥128 and ≥2 tiles → None
    assert pick_tile2d(640, 320, cheap) is None
    assert pick_tile2d(4000, 2000, cheap) is None


def test_pick_tile2d_dma_constraints():
    """The DMA-window velocity kernel needs 128-aligned lane widths and a
    window that fits inside the array (offset clamping), plus the usual
    (8, 128) tile alignment. On-TPU equivalence + perf:
    scripts/dma_window_check.py / scripts/dma_window_bench.py."""
    from fluid2d_tpu.ops.pallas_phases import _pick_tile2d_dma
    from fluid2d_tpu.ops.pallas_stencil import _HB, _HY

    tile = _pick_tile2d_dma(8192, 4096)  # BASELINE config #5
    assert tile is not None
    t, ty = tile
    assert 8192 % t == 0 and t % 8 == 0
    assert 4096 % ty == 0 and ty % 128 == 0
    assert 4096 >= ty + 2 * _HY and 8192 >= t + 2 * _HB

    assert _pick_tile2d_dma(3200, 1600) is None  # lane width not 128-aligned
    assert _pick_tile2d_dma(512, 256) is None  # window cannot fit (256 < ty+256)


def test_cip_velocity_dma_window_matches_9block():
    """The DMA-window 2-D velocity kernel (one strided async copy per
    input into VMEM scratch, double-buffered across grid steps) is
    bit-identical to the 9-block BlockSpec-assembly kernel: both feed
    the same `_cip_velocity_body` with the same window values. Smallest
    feasible grid (24, 384): 3×3 tiles of (8, 128), so every edge-fix
    branch (clamped-offset realignment + edge replication) executes,
    including the exact-fit lane case y == ty + 2·_HY. On-TPU witness
    at (256, 512): scripts/dma_window_check.py (also bitwise)."""
    import fluid2d_tpu.ops.pallas_phases as ph
    from fluid2d_tpu.scenes.compile import compile_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    x, y = 24, 384
    bc_const, mask, bc_dye = build_scene_arrays(2, y)
    scene = compile_scene(bc_const[:x], mask[:x], bc_dye[:x])
    rng = np.random.default_rng(7)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32))  # noqa: E731
    v, va = f32(2, x, y), f32(2, x, y)
    vx, vxa, vy, vya = (f32(2, x, y) * 0.1 for _ in range(4))
    pr = f32(x, y)
    re, dt, dx = 1000.0, 0.05 / y, 1.0 / y

    a = ph._cip_velocity_phase_2d(v, pr, va, vx, vxa, vy, vya, scene,
                                  re, dt, dx, interpret=True)
    b = ph._cip_velocity_phase_2d_dma(v, pr, va, vx, vxa, vy, vya, scene,
                                      re, dt, dx, tile=(8, 128), interpret=True)
    for n, p_, q in zip(("v", "vx", "vy", "vna", "vxna", "vyna"), a, b):
        np.testing.assert_array_equal(np.asarray(p_), np.asarray(q), err_msg=n)


def test_cip_velocity_2d_slide_matches_9block():
    """The row-sliding 2-D velocity kernel (transposed grid, t-new-rows
    fetch per interior tile, lane fixes via the _slide_fetch hooks) is
    bit-identical to the 9-block kernel. Grid (24, 384) with tile
    (8, 128): 3×3 tiles, so every branch runs — sweep-start full fetch,
    interior tail fetch + head copy, last-tile realign, and both
    stripe-end lane fixes (y == ty + 2·_HY exact fit). On-TPU witness:
    scripts/dma_window_check.py --slide."""
    import fluid2d_tpu.ops.pallas_phases as ph
    from fluid2d_tpu.scenes.compile import compile_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    x, y = 24, 384
    bc_const, mask, bc_dye = build_scene_arrays(2, y)
    scene = compile_scene(bc_const[:x], mask[:x], bc_dye[:x])
    rng = np.random.default_rng(11)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s, dtype=np.float32))  # noqa: E731
    v, va = f32(2, x, y), f32(2, x, y)
    vx, vxa, vy, vya = (f32(2, x, y) * 0.1 for _ in range(4))
    pr = f32(x, y)
    re, dt, dx = 1000.0, 0.05 / y, 1.0 / y

    a = ph._cip_velocity_phase_2d(v, pr, va, vx, vxa, vy, vya, scene,
                                  re, dt, dx, interpret=True)
    b = ph._cip_velocity_phase_2d_slide(v, pr, va, vx, vxa, vy, vya, scene,
                                        re, dt, dx, tile=(8, 128), interpret=True)
    for n, p_, q in zip(("v", "vx", "vy", "vna", "vxna", "vyna"), a, b):
        np.testing.assert_array_equal(np.asarray(p_), np.asarray(q), err_msg=n)


@pytest.mark.parametrize("scheme", ["cip", "upwind", "kk"])
@pytest.mark.parametrize("num", [1, 2])
def test_full_step_pallas_interpret_matches_xla(scheme, num):
    """Full steps with kernels='pallas_interpret' vs 'xla' on CPU — this
    exercises the whole-phase mega-kernels (velocity BC + non-advection
    + gradients + advection; dye BC + diffusion + advection + clamp;
    fused SOR) against the jnp reference path, including every stale
    alternate buffer."""
    import jax

    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.simulator import step_fn_for
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state
    from tests.test_parity import _random_fields, _seed_state
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    res = 16  # grid (32, 16); tile 8
    _, mask, _ = build_scene_arrays(num, res)
    scene = get_scene(num, res)
    fields = _random_fields(mask, True, scheme == "cip", seed=4)

    outs = {}
    for kern in ("xla", "pallas_interpret"):
        cfg = SimConfig.create(resolution=res, re=100.0, scheme=scheme,
                               vor_eps=5.0, enable_dye=True, kernels=kern)
        state = _seed_state(init_state(scene, cfg), fields)
        step = jax.jit(step_fn_for(cfg))
        out = step(state, scene)
        out = step(out, scene)  # second step feeds stale buffers back
        outs[kern] = out

    for name, a, b in zip(outs["xla"]._fields, outs["xla"], outs["pallas_interpret"]):
        if a is None:
            continue
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(a, b, atol=2e-5 * scale, rtol=0, err_msg=name)


@pytest.mark.parametrize("scheme", ["upwind", "kk"])
def test_mac_dye_channel_grid_matches_folded(scheme):
    """The (n_t, chans) c-minor MAC dye kernel computes exactly what the
    channel-folded one does (VERDICT r2 item #6 A/B; the folded layout
    stays the default per the measured numbers in the docstring)."""
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.ops.pallas_phases import mac_dye_phase_pallas
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    res = 32
    cfg = SimConfig.create(resolution=res, scheme=scheme, enable_dye=True)
    scene = get_scene(2, res)
    state = init_state(scene, cfg)
    rng = np.random.default_rng(4)
    dye = jnp.asarray(rng.random((3, 2 * res, res)), jnp.float32)
    dye_alt = jnp.asarray(rng.random((3, 2 * res, res)), jnp.float32)
    vel = jnp.asarray(0.5 * rng.standard_normal((2, 2 * res, res)), jnp.float32)
    del state

    a = mac_dye_phase_pallas(dye, dye_alt, vel, scene, scheme, cfg.dt, cfg.dx,
                             interpret=True, channel_grid=False)
    b = mac_dye_phase_pallas(dye, dye_alt, vel, scene, scheme, cfg.dt, cfg.dx,
                             interpret=True, channel_grid=True)
    for name, x, y in zip(("dye_cur", "dc"), a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)


def test_cip_velocity_channel_grid_matches_folded():
    """The (n_t, 2) c-minor CIP velocity kernel (shared phases spilled to
    VMEM scratch) matches the channel-folded kernel: na/gradient outputs
    bit-identical, advected outputs to 1-ulp FMA-contraction noise (the
    two programs fuse differently under XLA interpret mode)."""
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.ops.pallas_phases import cip_velocity_phase_pallas
    from fluid2d_tpu.scenes.compile import get_scene

    rng = np.random.default_rng(5)
    res = 32
    cfg = SimConfig.create(resolution=res, scheme="cip")
    scene = get_scene(2, res)
    shp2 = (2, 2 * res, res)
    v, va = (jnp.asarray(0.5 * rng.standard_normal(shp2), jnp.float32) for _ in range(2))
    vx, vxa, vy, vya = (jnp.asarray(rng.standard_normal(shp2), jnp.float32)
                        for _ in range(4))
    p = jnp.asarray(0.3 * rng.standard_normal(shp2[1:]), jnp.float32)

    a = cip_velocity_phase_pallas(v, p, va, vx, vxa, vy, vya, scene,
                                  1000.0, cfg.dt, cfg.dx, interpret=True)
    b = cip_velocity_phase_pallas(v, p, va, vx, vxa, vy, vya, scene,
                                  1000.0, cfg.dt, cfg.dx, interpret=True,
                                  channel_grid=True)
    names = ("v", "vx", "vy", "vna", "vxna", "vyna")
    for n, x, y in zip(names, a, b):
        x, y = np.asarray(x), np.asarray(y)
        if n in ("vna", "vxna", "vyna"):
            np.testing.assert_array_equal(x, y, err_msg=n)
        else:
            scale = max(1.0, np.abs(x).max())
            np.testing.assert_allclose(y, x, atol=1e-6 * scale, rtol=0, err_msg=n)


def test_cip_dye_window_inputs_match_triples():
    """Element-offset window fetch (one stream per input) computes
    exactly what the halo-triple fetch does in the channel-grid CIP dye
    kernel, including the clamped-offset realignment at the two
    grid-edge tiles (pallas_stencil._wext)."""
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.ops.pallas_phases import cip_dye_phase_pallas
    from fluid2d_tpu.scenes.compile import get_scene

    rng = np.random.default_rng(6)
    res = 32
    cfg = SimConfig.create(resolution=res, scheme="cip", enable_dye=True)
    scene = get_scene(2, res)
    shp3 = (3, 2 * res, res)
    dye, da = (jnp.asarray(rng.random(shp3), jnp.float32) for _ in range(2))
    dxg, dxa, dyg, dya = (jnp.asarray(rng.standard_normal(shp3), jnp.float32)
                          for _ in range(4))
    vel = jnp.asarray(0.5 * rng.standard_normal((2, 2 * res, res)), jnp.float32)

    a = cip_dye_phase_pallas(dye, da, dxg, dxa, dyg, dya, vel, scene,
                             1000.0, cfg.dt, cfg.dx, interpret=True,
                             window_inputs=False)
    b = cip_dye_phase_pallas(dye, da, dxg, dxa, dyg, dya, vel, scene,
                             1000.0, cfg.dt, cfg.dx, interpret=True,
                             window_inputs=True)
    names = ("dye", "dyex", "dyey", "dna", "dxna", "dyna")
    for n, x, y in zip(names, a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=n)


def test_cip_velocity_window_inputs_match_triples():
    """Element-offset window fetch matches the halo-triple fetch in the
    folded 1-D CIP velocity kernel, bitwise."""
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.ops.pallas_phases import cip_velocity_phase_pallas
    from fluid2d_tpu.scenes.compile import get_scene

    rng = np.random.default_rng(7)
    res = 32
    cfg = SimConfig.create(resolution=res, scheme="cip")
    scene = get_scene(2, res)
    shp2 = (2, 2 * res, res)
    v, va = (jnp.asarray(0.5 * rng.standard_normal(shp2), jnp.float32) for _ in range(2))
    vx, vxa, vy, vya = (jnp.asarray(rng.standard_normal(shp2), jnp.float32)
                        for _ in range(4))
    p = jnp.asarray(0.3 * rng.standard_normal(shp2[1:]), jnp.float32)

    a = cip_velocity_phase_pallas(v, p, va, vx, vxa, vy, vya, scene,
                                  1000.0, cfg.dt, cfg.dx, interpret=True,
                                  window_inputs=False)
    b = cip_velocity_phase_pallas(v, p, va, vx, vxa, vy, vya, scene,
                                  1000.0, cfg.dt, cfg.dx, interpret=True,
                                  window_inputs=True)
    names = ("v", "vx", "vy", "vna", "vxna", "vyna")
    for n, x, y in zip(names, a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=n)


def test_cip_dye_sliding_window_matches_triples():
    """The sliding-window dye kernel (c-major grid, manual tail DMAs,
    16-row overlap carried forward in VMEM scratch) computes exactly
    what the triple-fetch channel-grid kernel does."""
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.ops.pallas_phases import cip_dye_phase_pallas
    from fluid2d_tpu.scenes.compile import get_scene

    rng = np.random.default_rng(8)
    res = 128  # lane width must be 128-aligned for the manual DMAs
    cfg = SimConfig.create(resolution=res, scheme="cip", enable_dye=True)
    scene = get_scene(2, res)
    shp3 = (3, 2 * res, res)
    dye, da = (jnp.asarray(rng.random(shp3), jnp.float32) for _ in range(2))
    dxg, dxa, dyg, dya = (jnp.asarray(rng.standard_normal(shp3), jnp.float32)
                          for _ in range(4))
    vel = jnp.asarray(0.5 * rng.standard_normal((2, 2 * res, res)), jnp.float32)

    a = cip_dye_phase_pallas(dye, da, dxg, dxa, dyg, dya, vel, scene,
                             1000.0, cfg.dt, cfg.dx, interpret=True,
                             window_inputs=False)
    # (tile, subtiles): t=8 is the production tile at res=4096; sub=2
    # is the bigger-DMA-chunk variant (T=16 fetch, t=8 compute passes).
    for tile, sub in ((None, None), (8, 1), (8, 2)):
        b = cip_dye_phase_pallas(dye, da, dxg, dxa, dyg, dya, vel, scene,
                                 1000.0, cfg.dt, cfg.dx, interpret=True,
                                 sliding=True, tile_x=tile, subtiles=sub)
        names = ("dye", "dyex", "dyey", "dna", "dxna", "dyna")
        for n, x, y in zip(names, a, b):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{n} tile={tile} sub={sub}")


def test_cip_dye_mask_scratch_matches_per_program():
    """The mask-scratch dye variant (int mask windows assembled once per
    row tile at c == 0 into i32 VMEM scratch) is bitwise identical to
    the per-program assembly — the masks are channel-independent, so
    only their provenance changes."""
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.ops.pallas_phases import cip_dye_phase_pallas
    from fluid2d_tpu.scenes.compile import get_scene

    rng = np.random.default_rng(9)
    res = 16
    cfg = SimConfig.create(resolution=res, scheme="cip", enable_dye=True)
    scene = get_scene(2, res)
    shp3 = (3, 2 * res, res)
    dye, da = (jnp.asarray(rng.random(shp3), jnp.float32) for _ in range(2))
    dxg, dxa, dyg, dya = (jnp.asarray(rng.standard_normal(shp3), jnp.float32)
                          for _ in range(4))
    vel = jnp.asarray(0.5 * rng.standard_normal((2, 2 * res, res)), jnp.float32)

    a = cip_dye_phase_pallas(dye, da, dxg, dxa, dyg, dya, vel, scene,
                             1000.0, cfg.dt, cfg.dx, interpret=True)
    b = cip_dye_phase_pallas(dye, da, dxg, dxa, dyg, dya, vel, scene,
                             1000.0, cfg.dt, cfg.dx, interpret=True,
                             mask_scratch=True)
    for n, x, y in zip(("dye", "dyex", "dyey", "dna", "dxna", "dyna"), a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=n)


@pytest.mark.parametrize("n_iters", [1, 2])
def test_sor_sliding_window_matches_triples(n_iters):
    """The sliding-window SOR kernel matches the triple-fetch one
    bitwise at a 128-aligned lane width (both tile sizes incl. t=8)."""
    from fluid2d_tpu.ops.pallas_stencil import sor_iteration_pallas
    from fluid2d_tpu.scenes.compile import compile_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    bc, mask, dyearr = build_scene_arrays(2, 128)  # grid (256, 128)
    scene = compile_scene(bc, mask, dyearr)
    p, pa, u, w = (_mk(*mask.shape) for _ in range(4))
    omega, dt, dx = 1.3, 1e-3, 1 / 128

    for tile in (None, 8):
        a = sor_iteration_pallas(p, pa, u, w, scene.pbc_code, scene.fluid8,
                                 omega, dt, dx, n_iters=n_iters, v_limit=10.0,
                                 tile_x=tile, sliding=False, interpret=True)
        b = sor_iteration_pallas(p, pa, u, w, scene.pbc_code, scene.fluid8,
                                 omega, dt, dx, n_iters=n_iters, v_limit=10.0,
                                 tile_x=tile, sliding=True, interpret=True)
        for name, x, y in zip(("pn", "pc", "vlim"), a, b):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{name} tile={tile}")


def test_confinement_sliding_window_matches_triples():
    """The sliding-window confinement kernel matches the triple-fetch
    one bitwise at a 128-aligned lane width."""
    from fluid2d_tpu.ops.pallas_phases import confinement_pallas
    from fluid2d_tpu.scenes.compile import compile_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    bc, mask, dyearr = build_scene_arrays(2, 128)
    scene = compile_scene(bc, mask, dyearr)
    v = _mk(2, *mask.shape)
    va = _mk(2, *mask.shape)

    for tile in (None, 8):
        a = confinement_pallas(v, va, scene.fluid8, 1e-3, 5.0, 1 / 128,
                               tile_x=tile, sliding=False, interpret=True)
        b = confinement_pallas(v, va, scene.fluid8, 1e-3, 5.0, 1 / 128,
                               tile_x=tile, sliding=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]),
                                      err_msg=f"tile={tile}")
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_cip_velocity_sliding_window_matches_triples():
    """The 1-D sliding-window CIP velocity kernel (eight f32 planes in
    double-buffered VMEM scratch, t new rows per interior tile) computes
    exactly what the folded triple-fetch kernel does at a 128-aligned
    lane width (both the auto tile and the t=8 frontier tile)."""
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.ops.pallas_phases import cip_velocity_phase_pallas
    from fluid2d_tpu.scenes.compile import get_scene

    rng = np.random.default_rng(13)
    res = 128
    cfg = SimConfig.create(resolution=res, scheme="cip", enable_dye=False)
    scene = get_scene(2, res)
    shp2 = (2, 2 * res, res)
    v, va = (jnp.asarray(0.5 * rng.standard_normal(shp2), jnp.float32)
             for _ in range(2))
    vx, vxa, vy, vya = (jnp.asarray(0.1 * rng.standard_normal(shp2), jnp.float32)
                        for _ in range(4))
    p = jnp.asarray(0.3 * rng.standard_normal((2 * res, res)), jnp.float32)

    names = ("v", "vx", "vy", "vna", "vxna", "vyna")
    for tile in (None, 8):
        a = cip_velocity_phase_pallas(v, p, va, vx, vxa, vy, vya, scene,
                                      1000.0, cfg.dt, cfg.dx, tile_x=tile,
                                      sliding=False, interpret=True)
        b = cip_velocity_phase_pallas(v, p, va, vx, vxa, vy, vya, scene,
                                      1000.0, cfg.dt, cfg.dx, tile_x=tile,
                                      sliding=True, interpret=True)
        for n, x, y in zip(names, a, b):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{n} tile={tile}")


@pytest.mark.parametrize("scheme", ["upwind", "kk"])
def test_mac_sliding_windows_match_triples(scheme):
    """Sliding-window MAC velocity and dye kernels match the
    triple-fetch ones bitwise at a 128-aligned lane width."""
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.ops.pallas_phases import (
        mac_dye_phase_pallas,
        mac_velocity_phase_pallas,
    )
    from fluid2d_tpu.scenes.compile import get_scene

    rng = np.random.default_rng(11)
    res = 128
    cfg = SimConfig.create(resolution=res, scheme=scheme, enable_dye=True)
    scene = get_scene(2, res)
    shp = (2 * res, res)
    v, va = (jnp.asarray(0.5 * rng.standard_normal((2, *shp)), jnp.float32)
             for _ in range(2))
    p = jnp.asarray(0.3 * rng.standard_normal(shp), jnp.float32)
    dye, da = (jnp.asarray(rng.random((3, *shp)), jnp.float32) for _ in range(2))

    for tile in (None, 8):
        a = mac_velocity_phase_pallas(v, p, va, scene, scheme, 1000.0,
                                      cfg.dt, cfg.dx, tile_x=tile,
                                      sliding=False, interpret=True)
        b = mac_velocity_phase_pallas(v, p, va, scene, scheme, 1000.0,
                                      cfg.dt, cfg.dx, tile_x=tile,
                                      sliding=True, interpret=True)
        for name, x, y in zip(("v", "vbc"), a, b):
            x, y = np.asarray(x), np.asarray(y)
            if name == "vbc":
                np.testing.assert_array_equal(x, y, err_msg=f"{name} tile={tile}")
            else:
                # The two program structures fuse differently under XLA
                # interpret mode → ~1-ulp FMA-contraction noise on the
                # momentum update (same split as
                # test_cip_velocity_channel_grid_matches_folded).
                scale = max(1.0, np.abs(x).max())
                np.testing.assert_allclose(y, x, atol=1e-6 * scale, rtol=0,
                                           err_msg=f"{name} tile={tile}")

        c = mac_dye_phase_pallas(dye, da, v, scene, scheme, cfg.dt, cfg.dx,
                                 tile_x=tile, sliding=False, interpret=True)
        d = mac_dye_phase_pallas(dye, da, v, scene, scheme, cfg.dt, cfg.dx,
                                 tile_x=tile, sliding=True, interpret=True)
        for name, x, y in zip(("dye", "dbc"), c, d):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{name} tile={tile}")
