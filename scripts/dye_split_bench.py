"""Experiment: split the CIP dye phase into per-channel kernels.

The 3-channel dye kernel is VMEM-locked at t=8 (window amp 1.75); a
1-channel kernel fits t=16 (amp 1.375, −21% VPU work on the dye math)
at the cost of re-fetching velocity/masks and recomputing the carrying
-velocity context per kernel. This measures whether the trade wins.

Usage: python scripts/dye_split_bench.py [--res 1600] [--steps 300]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=1600)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--tile", type=int, default=16)
    args = parser.parse_args()

    import jax.numpy as jnp

    import fluid2d_tpu.models.cip as cipmod
    import fluid2d_tpu.ops.pallas_phases as ph
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.simulator import make_run_fn
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    cfg = SimConfig.create(resolution=args.res, re=1e6, scheme="cip",
                           vor_eps=5.0, enable_dye=True)
    scene = get_scene(2, args.res)
    orig = ph.cip_dye_phase_pallas

    def sync(st):
        return float(np.asarray(st.v[0, 0, 0]))

    def measure(label):
        run = make_run_fn(cfg)
        st = init_state(scene, cfg)
        st = run(st, scene, args.steps)
        sync(st)
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            st = run(st, scene, args.steps)
            sync(st)
            best = max(best, args.steps / (time.perf_counter() - t0))
        print(f"{label}: {best:.1f} steps/s", flush=True)

    measure("dye 3ch t=8 (current)")

    def split_dye(dye, dye_alt, dyex, dyex_alt, dyey, dyey_alt, vel, scn,
                  re, dt, dx, **kw):
        outs = []
        for c in range(dye.shape[0]):
            s = slice(c, c + 1)
            scn_c = scn._replace(bc_dye=scn.bc_dye[s])
            outs.append(orig(dye[s], dye_alt[s], dyex[s], dyex_alt[s],
                             dyey[s], dyey_alt[s], vel, scn_c, re, dt, dx,
                             tile_x=args.tile, **kw))
        return tuple(jnp.concatenate([o[i] for o in outs], axis=0) for i in range(6))

    cipmod.cip_dye_phase_pallas = split_dye
    try:
        measure(f"dye 1ch x3 t={args.tile}    ")
    except Exception as exc:
        print(f"split failed: {type(exc).__name__}: {str(exc)[:150]}", flush=True)
    finally:
        cipmod.cip_dye_phase_pallas = orig


if __name__ == "__main__":
    main()
