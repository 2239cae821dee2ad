"""Measure per-phase cost of the CIP step by differential timing.

**Superseded for attribution by scripts/trace_kernels.py** (round 3):
the on-chip trace showed this differential method hides cross-cutting
costs — 26% of the res=1600 step was while-carry copies that toggling
any phase partially removed, so the subtraction smeared them into the
toggled phase (docs/BENCH.md "The hidden 26%"). Kept because marginal
cost under a toggle is still the right number for "what does turning
dye off buy me", and as the A/B harness for config-level experiments.

* dye phase      = step(dye on) − step(dye off)
* confinement    = step(vc=5)   − step(vc=0)
* one SOR iter   = (step(n_iter=4) − step(n_iter=2)) / 2
* velocity phase = remainder

Usage: python scripts/phase_breakdown.py [--res 1600] [--steps 300]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def ms_per_step(res, steps, **overrides):
    import dataclasses

    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.simulator import make_run_fn
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    base = dict(resolution=res, re=1e6, scheme="cip", vor_eps=5.0, enable_dye=True)
    n_iter = overrides.pop("n_pressure_iter", None)
    base.update(overrides)
    cfg = SimConfig.create(**base)
    if n_iter is not None:
        cfg = dataclasses.replace(cfg, n_pressure_iter=n_iter)
    scene = get_scene(2, res)
    st = init_state(scene, cfg)
    run = make_run_fn(cfg)
    st = run(st, scene, steps)
    float(np.asarray(st.v[0, 0, 0]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        st = run(st, scene, steps)
        float(np.asarray(st.v[0, 0, 0]))
        best = min(best, (time.perf_counter() - t0) / steps * 1e3)
    return best


def main() -> None:
    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=1600)
    parser.add_argument("--steps", type=int, default=300)
    args = parser.parse_args()

    full = ms_per_step(args.res, args.steps)
    no_dye = ms_per_step(args.res, args.steps, enable_dye=False)
    no_vc = ms_per_step(args.res, args.steps, vor_eps=0.0)
    it4 = ms_per_step(args.res, args.steps, n_pressure_iter=4)

    dye = full - no_dye
    vc = full - no_vc
    sor1 = (it4 - full) / 2
    vel = full - dye - vc - 2 * sor1
    print(f"full step:        {full:7.3f} ms  ({1e3 / full:.1f} steps/s)")
    print(f"dye phase:        {dye:7.3f} ms")
    print(f"confinement:      {vc:7.3f} ms")
    print(f"SOR (per iter):   {sor1:7.3f} ms")
    print(f"velocity (resid): {vel:7.3f} ms")


if __name__ == "__main__":
    main()
