"""Randomized-configuration parity fuzz (deterministic seeds).

Samples odd resolutions, scheme/solver/feature combinations, and random
smooth initial states, and checks multi-step agreement with the scalar
oracle — catching anything the fixed test matrix misses (tile-divisor
edge cases, feature interactions, odd grid shapes)."""

import numpy as np
import pytest

from fluid2d_tpu.config import SimConfig
from fluid2d_tpu.models.simulator import make_run_fn
from fluid2d_tpu.scenes.compile import compile_scene
from fluid2d_tpu.scenes.scenes import build_scene_arrays
from fluid2d_tpu.state import init_state
from tests.oracle import Oracle
from tests.test_parity import _random_fields, _seed_oracle, _seed_state


def _sample_config(rng):
    return {
        "num": int(rng.integers(1, 7)),
        "res": int(rng.choice([16, 20, 24, 28])),
        "scheme": str(rng.choice(["upwind", "kk", "cip"])),
        "vor_eps": float(rng.choice([0.0, 2.0, 5.0])) or None,
        "enable_dye": bool(rng.integers(0, 2)),
        "pressure_solver": str(rng.choice(["sor", "jacobi"])),
        "n_iter": int(rng.integers(1, 4)),
        "re": float(rng.choice([100.0, 1e4, 1e6])),
    }


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_config_parity(seed):
    rng = np.random.default_rng(1000 + seed)
    c = _sample_config(rng)
    bc, mask, dye_arr = build_scene_arrays(c["num"], c["res"])
    cfg = SimConfig.create(
        resolution=c["res"], re=c["re"], scheme=c["scheme"], vor_eps=c["vor_eps"],
        enable_dye=c["enable_dye"], pressure_solver=c["pressure_solver"],
        n_pressure_iter=c["n_iter"],
    )
    fields = _random_fields(mask, c["enable_dye"], c["scheme"] == "cip", seed=seed)

    scene = compile_scene(bc, mask, dye_arr)
    state = _seed_state(init_state(scene, cfg), fields)
    state = make_run_fn(cfg)(state, scene, 3)

    orc = Oracle(
        bc, mask, dye_arr,
        dt=cfg.dt, dx=cfg.dx, re=c["re"], scheme=c["scheme"], vor_eps=c["vor_eps"],
        enable_dye=c["enable_dye"], pressure_solver=c["pressure_solver"],
        omega=cfg.sor_omega, n_iter=c["n_iter"],
    )
    _seed_oracle(orc, fields)
    for _ in range(3):
        orc.step()

    pairs = [("v", state.v, orc.v.cur), ("p", state.p, orc.p.cur)]
    if c["enable_dye"]:
        pairs.append(("dye", state.dye, orc.dye.cur))
    if c["scheme"] == "cip":
        pairs += [("vx", state.vx, orc.vx.cur), ("vy", state.vy, orc.vy.cur)]
    for name, jx, ref in pairs:
        got = np.asarray(jx)
        if got.ndim == 3:
            got = np.moveaxis(got, 0, -1)
        scale = max(1.0, float(np.abs(ref).max()))
        np.testing.assert_allclose(
            got, ref, atol=2e-5 * scale, rtol=0, err_msg=f"{name} cfg={c}"
        )
