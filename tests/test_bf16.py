"""bfloat16 transport mode (SimConfig.dtype).

The state's HBM storage dtype is bfloat16 while all arithmetic stays
float32 — kernels upcast on load and round once per phase store
(utils/dtypes.py). These tests pin the semantics on the CPU jnp path
and the Pallas interpret path; the perf claim (the measured byte-rate
bound, docs/BENCH.md bf16 twin probe) is benched on TPU.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from fluid2d_tpu import FluidSimulator
from fluid2d_tpu.config import SimConfig
from fluid2d_tpu.models.simulator import make_run_fn, scene_for_dtype
from fluid2d_tpu.scenes.compile import get_scene
from fluid2d_tpu.state import init_state
from fluid2d_tpu.utils.metrics import diagnostics, has_nan

SCHEMES = ("upwind", "kk", "cip")


def _mk(scheme: str, dtype: str, kernels: str = "xla", res: int = 24, steps: int = 5):
    cfg = SimConfig.create(
        resolution=res, re=100.0, scheme=scheme, vor_eps=5.0,
        enable_dye=True, kernels=kernels, dtype=dtype,
    )
    scene = scene_for_dtype(get_scene(2, res), cfg)
    state = init_state(scene, cfg)
    state = make_run_fn(cfg)(state, scene, steps)
    return state, scene, cfg


def test_config_rejects_unknown_dtype():
    with pytest.raises(ValueError, match="transport dtype"):
        SimConfig.create(resolution=24, dtype="float64")


@pytest.mark.parametrize("scheme", SCHEMES)
def test_bf16_state_dtype_preserved_through_scan(scheme):
    state, _, _ = _mk(scheme, "bfloat16")
    for name, leaf in zip(state._fields, state):
        if name == "step" or leaf is None:
            continue
        assert leaf.dtype == jnp.bfloat16, name


@pytest.mark.parametrize("scheme", SCHEMES)
def test_bf16_tracks_f32(scheme):
    """bf16 transport only adds per-phase storage rounding: after a few
    steps the fields must track the f32 run to bf16-accumulation
    tolerance (and stay finite)."""
    s16, _, _ = _mk(scheme, "bfloat16")
    s32, _, _ = _mk(scheme, "float32")
    assert not has_nan(s16)
    for name in ("v", "p", "dye"):
        a = np.asarray(getattr(s16, name), np.float32)
        b = np.asarray(getattr(s32, name), np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        err = np.abs(a - b).max() / scale
        assert err < 0.08, f"{name}: relative error {err:.4f}"


def test_bf16_pallas_interpret_matches_jnp():
    """The Pallas kernels' bf16 handling (upcast at window assembly,
    round at stores) must agree with the jnp path's (upcast at phase
    entry, round at phase outputs) to a few bf16 ulps per step."""
    sp, _, _ = _mk("cip", "bfloat16", kernels="pallas_interpret", steps=3)
    sj, _, _ = _mk("cip", "bfloat16", kernels="xla", steps=3)
    for name in ("v", "p", "dye", "vx", "vy"):
        a = np.asarray(getattr(sp, name), np.float32)
        b = np.asarray(getattr(sj, name), np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 0.03, name


def test_bf16_pallas_interpret_matches_jnp_mac():
    sp, _, _ = _mk("kk", "bfloat16", kernels="pallas_interpret", steps=3)
    sj, _, _ = _mk("kk", "bfloat16", kernels="xla", steps=3)
    for name in ("v", "p", "dye"):
        a = np.asarray(getattr(sp, name), np.float32)
        b = np.asarray(getattr(sj, name), np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 0.03, name


def test_bf16_simulator_end_to_end(tmp_path: Path):
    """Facade round trip: create → step → render → diagnostics →
    checkpoint → resume, all under bf16 transport."""
    sim = FluidSimulator.create(1, 24, re=100.0, scheme="cip", dtype="bfloat16")
    sim.step(4)
    assert sim.state.v.dtype == jnp.bfloat16
    assert sim.scene.bc_const.dtype == jnp.bfloat16
    rgb = sim.get_norm_field()
    assert rgb.dtype == np.float32 and np.isfinite(rgb).all()
    assert "div_rms" in diagnostics(sim.state, sim.scene, sim.cfg)

    path = tmp_path / "ckpt.npz"
    sim.save(path)
    restored = FluidSimulator.load(path, bc_num=1)
    assert restored.cfg.dtype == "bfloat16"
    assert restored.state.v.dtype == jnp.bfloat16
    # bf16 → f32 (npz) → bf16 is lossless
    np.testing.assert_array_equal(
        np.asarray(sim.state.v, np.float32), np.asarray(restored.state.v, np.float32)
    )
    restored.step(2)
    sim.step(2)
    np.testing.assert_array_equal(
        np.asarray(sim.state.v, np.float32), np.asarray(restored.state.v, np.float32)
    )


def test_bf16_field_dump_widens_to_f32():
    sim = FluidSimulator.create(1, 24, re=100.0, scheme="upwind", dtype="bfloat16")
    sim.step(2)
    fields = sim.field_to_numpy()
    assert fields["v"].dtype == np.float32
    assert fields["p"].dtype == np.float32


@pytest.mark.parametrize("path", ["gspmd", "halo"])
def test_bf16_sharded_matches_single_device(path):
    """bf16 transport under spatial decomposition: the shards hold bf16
    leaves, the ghost exchange ships bf16 rows (half the link bytes),
    and the result must track the single-device bf16 run. Tolerance is
    a few bf16 ulps: the two compilations reorder f32 arithmetic, and
    each phase-store rounding can then flip the nearest bf16."""
    from fluid2d_tpu.parallel.sharding import make_mesh, shard_pytree
    from fluid2d_tpu.utils.io import _cast_state
    from tests.test_parity import _random_fields, _seed_state

    res = 128 if path == "halo" else 32
    cfg = SimConfig.create(resolution=res, re=1000.0, scheme="cip",
                           vor_eps=5.0, enable_dye=True, dtype="bfloat16")
    scene = scene_for_dtype(get_scene(2, res), cfg)
    fields = _random_fields(np.zeros(scene.shape, bool), True, True, seed=11)
    seed = lambda: _cast_state(  # noqa: E731 — identical bf16 start both runs
        _seed_state(init_state(scene, cfg), fields), cfg
    )

    ref = make_run_fn(cfg)(seed(), scene, 6)

    mesh = make_mesh(8)
    if path == "halo":
        from fluid2d_tpu.parallel.halo import ghost_width, make_sharded_run_halo

        assert 2 * res // 8 >= 2 * ghost_width(cfg)
        run_s = make_sharded_run_halo(cfg, mesh)
    else:
        run_s = make_run_fn(cfg)
    got = run_s(shard_pytree(seed(), mesh), shard_pytree(scene, mesh), 6)

    for name, a, b in zip(ref._fields, ref, got):
        if a is None or name == "step":
            continue
        assert b.dtype == a.dtype, name
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, atol=0.02 * scale, rtol=0, err_msg=name)


def _bf(rng, *shape, scale=1.0):
    a = scale * rng.standard_normal(shape, dtype=np.float32)
    return jnp.asarray(a).astype(jnp.bfloat16)


def _assert_bf16_ulp(x, y, name, max_ulp=1):
    """Assert two bf16 arrays are within `max_ulp` representable values
    of each other (bit-pattern distance in IEEE total order). The slide
    and BlockSpec program structures fuse differently under XLA
    interpret mode → rare 1-ulp FMA-contraction wobble on the f32
    value being rounded (same effect the f32 MAC slide test tolerates,
    tests/test_pallas.py test_mac_sliding_windows_match_triples)."""
    assert x.dtype == jnp.bfloat16, name
    assert y.dtype == jnp.bfloat16, name

    def order(a):
        u = np.asarray(a).view(np.uint16).astype(np.int64)
        return np.where(u >= 0x8000, 0xFFFF - u, u + 0x8000)

    d = np.abs(order(x) - order(y))
    xf = np.asarray(x, np.float32)
    yf = np.asarray(y, np.float32)
    # Near-zero cancellation results (|value| ≪ field scale) can land a
    # few bf16 bit-steps apart from one FMA contraction while the
    # absolute difference stays ~1e-7 of the field — the f32 tests'
    # atol=1e-6·scale treatment (test_mac_sliding_windows_match_triples).
    tiny = np.abs(xf - yf) <= 1e-6 * max(1.0, float(np.abs(xf).max()))
    bad = (d > max_ulp) & ~tiny
    assert not bad.any(), (
        f"{name}: {int(bad.sum())} elements differ by > {max_ulp} bf16 "
        f"ulp beyond cancellation tolerance (max ulp {int(d.max())})")


def test_bf16_sliding_kernels_match_blockspec():
    """bf16 transport through the manual-DMA fetch variants (VERDICT r4
    item #2): for every sliding kernel, bf16 inputs through the slide
    path must be BITWISE identical to the same bf16 inputs through the
    BlockSpec triple path — both upcast at the same `_k32` read points
    and round once at the same stores, so the fetch mechanism must not
    change a single bit. On-chip alignment witness for the sub-tile
    (mod-8 under bf16's (16,128) tiling) row-slice DMAs:
    scripts/bf16_dma_probe.py."""
    from fluid2d_tpu.ops.pallas_phases import (
        cip_dye_phase_pallas,
        cip_velocity_phase_pallas,
        confinement_pallas,
    )
    from fluid2d_tpu.ops.pallas_stencil import sor_iteration_pallas

    rng = np.random.default_rng(21)
    res = 128  # 128-aligned lane width so the manual DMAs dispatch
    cfg = SimConfig.create(resolution=res, scheme="cip", enable_dye=True,
                           dtype="bfloat16")
    scene = scene_for_dtype(get_scene(2, res), cfg)
    shp2, shp3 = (2, 2 * res, res), (3, 2 * res, res)

    # dye slide (c-major grid, manual tail DMAs)
    dye, da = _bf(rng, *shp3), _bf(rng, *shp3)
    dxg, dxa, dyg, dya = (_bf(rng, *shp3, scale=0.1) for _ in range(4))
    vel = _bf(rng, *shp2, scale=0.5)
    a = cip_dye_phase_pallas(dye, da, dxg, dxa, dyg, dya, vel, scene,
                             1000.0, cfg.dt, cfg.dx, interpret=True,
                             sliding=False)
    b = cip_dye_phase_pallas(dye, da, dxg, dxa, dyg, dya, vel, scene,
                             1000.0, cfg.dt, cfg.dx, interpret=True,
                             sliding=True, tile_x=8)
    for n, x, y in zip(("dye", "dyex", "dyey", "dna", "dxna", "dyna"), a, b):
        _assert_bf16_ulp(x, y, n)

    # velocity 1-D slide (15-plane window)
    v, va = _bf(rng, *shp2, scale=0.5), _bf(rng, *shp2, scale=0.5)
    vx, vxa, vy, vya = (_bf(rng, *shp2, scale=0.1) for _ in range(4))
    p = _bf(rng, 2 * res, res, scale=0.3)
    a = cip_velocity_phase_pallas(v, p, va, vx, vxa, vy, vya, scene,
                                  1000.0, cfg.dt, cfg.dx, tile_x=8,
                                  sliding=False, interpret=True)
    b = cip_velocity_phase_pallas(v, p, va, vx, vxa, vy, vya, scene,
                                  1000.0, cfg.dt, cfg.dx, tile_x=8,
                                  sliding=True, interpret=True)
    for n, x, y in zip(("v", "vx", "vy", "vna", "vxna", "vyna"), a, b):
        _assert_bf16_ulp(x, y, n)

    # SOR slide (p/p_alt/u/w window)
    u, w = v[0], v[1]
    a = sor_iteration_pallas(p, da[0], u, w, scene.pbc_code, scene.fluid8,
                             1.3, cfg.dt, cfg.dx, n_iters=2, v_limit=10.0,
                             tile_x=8, sliding=False, interpret=True)
    b = sor_iteration_pallas(p, da[0], u, w, scene.pbc_code, scene.fluid8,
                             1.3, cfg.dt, cfg.dx, n_iters=2, v_limit=10.0,
                             tile_x=8, sliding=True, interpret=True)
    for n, x, y in zip(("pn", "pc", "vlim"), a, b):
        _assert_bf16_ulp(x, y, n)

    # confinement slide (2-plane window)
    a = confinement_pallas(v, va, scene.fluid8, cfg.dt, 5.0, cfg.dx,
                           tile_x=8, sliding=False, interpret=True)
    b = confinement_pallas(v, va, scene.fluid8, cfg.dt, 5.0, cfg.dx,
                           tile_x=8, sliding=True, interpret=True)
    _assert_bf16_ulp(a[0], b[0], "conf_v")
    _assert_bf16_ulp(a[1], b[1], "conf_va")


def test_bf16_mac_sliding_kernels_match_blockspec():
    """MAC velocity/dye slide kernels under bf16 (their window scratches
    were the last hardcoded-f32 DMA targets — round-5 fix): slide vs
    triples to ≤1 bf16 ulp, same bound as the CIP test above."""
    from fluid2d_tpu.ops.pallas_phases import (
        mac_dye_phase_pallas,
        mac_velocity_phase_pallas,
    )

    rng = np.random.default_rng(23)
    res = 128
    cfg = SimConfig.create(resolution=res, scheme="kk", enable_dye=True,
                           dtype="bfloat16")
    scene = scene_for_dtype(get_scene(2, res), cfg)
    shp = (2 * res, res)
    v, va = _bf(rng, 2, *shp, scale=0.5), _bf(rng, 2, *shp, scale=0.5)
    p = _bf(rng, *shp, scale=0.3)
    dye, da = _bf(rng, 3, *shp), _bf(rng, 3, *shp)

    a = mac_velocity_phase_pallas(v, p, va, scene, "kk", 1000.0,
                                  cfg.dt, cfg.dx, tile_x=8,
                                  sliding=False, interpret=True)
    b = mac_velocity_phase_pallas(v, p, va, scene, "kk", 1000.0,
                                  cfg.dt, cfg.dx, tile_x=8,
                                  sliding=True, interpret=True)
    for n, x, y in zip(("v", "vbc"), a, b):
        _assert_bf16_ulp(x, y, f"mac_vel/{n}")

    c = mac_dye_phase_pallas(dye, da, v, scene, "kk", cfg.dt, cfg.dx,
                             tile_x=8, sliding=False, interpret=True)
    d = mac_dye_phase_pallas(dye, da, v, scene, "kk", cfg.dt, cfg.dx,
                             tile_x=8, sliding=True, interpret=True)
    for n, x, y in zip(("dye", "dbc"), c, d):
        _assert_bf16_ulp(x, y, f"mac_dye/{n}")


def test_bf16_velocity_2d_slide_matches_9block():
    """bf16 through the row-sliding 2-D velocity kernel (the res=4096
    winner) vs the 9-block BlockSpec kernel — bitwise, same grid/tile
    as the f32 twin test (every _slide_fetch branch runs)."""
    import fluid2d_tpu.ops.pallas_phases as ph
    from fluid2d_tpu.scenes.compile import compile_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    x, y = 24, 384
    bc_const, mask, bc_dye = build_scene_arrays(2, y)
    scene = compile_scene(bc_const[:x], mask[:x], bc_dye[:x])
    cfg = SimConfig.create(resolution=y, scheme="cip", dtype="bfloat16")
    scene = scene_for_dtype(scene, cfg)
    rng = np.random.default_rng(22)
    v, va = _bf(rng, 2, x, y), _bf(rng, 2, x, y)
    vx, vxa, vy, vya = (_bf(rng, 2, x, y, scale=0.1) for _ in range(4))
    pr = _bf(rng, x, y)
    re, dt, dx = 1000.0, 0.05 / y, 1.0 / y

    a = ph._cip_velocity_phase_2d(v, pr, va, vx, vxa, vy, vya, scene,
                                  re, dt, dx, interpret=True)
    b = ph._cip_velocity_phase_2d_slide(v, pr, va, vx, vxa, vy, vya, scene,
                                        re, dt, dx, tile=(8, 128),
                                        interpret=True)
    for n, p_, q in zip(("v", "vx", "vy", "vna", "vxna", "vyna"), a, b):
        _assert_bf16_ulp(p_, q, n)


def test_dtype_is_part_of_cli_surface():
    from fluid2d_tpu.cli import build_parser

    args = build_parser().parse_args(["--dtype", "bfloat16"])
    assert args.dtype == "bfloat16"
    args = build_parser().parse_args([])
    assert not hasattr(args, "dtype")  # sentinel default (resume semantics)
