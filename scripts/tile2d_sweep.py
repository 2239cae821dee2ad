"""Sweep 2-D (t, ty) tile choices for the res=4096 CIP phase kernels.

Round-2 finding: the phase kernels are VPU-bound (19% of the measured
2.7 TB/s HBM roofline), so the right tile objective is WINDOW-AREA
amplification ((t+2hx)(ty+256)/(t·ty) — compute runs on the assembled
halo window), not grid count. This script measures full-step rates with
forced tile choices to recalibrate pick_tile2d's objective/VMEM model.

Usage: python scripts/tile2d_sweep.py [--res 4096] [--steps 20]
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
    parser.add_argument("--res", type=int, default=4096)
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args()

    import fluid2d_tpu.ops.pallas_phases as ph
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.simulator import make_run_fn
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    cfg = SimConfig.create(resolution=args.res, re=1e6, scheme="cip",
                           vor_eps=5.0, enable_dye=True)
    scene = get_scene(3, args.res)
    real_pick = ph.pick_tile2d

    def measure(label, vel_tile, dye_tile):
        def fake_pick(x, y, cost, **kw):
            if cost is ph._cip_velocity_cost2d:
                return vel_tile or real_pick(x, y, cost, **kw)
            return dye_tile or real_pick(x, y, cost, **kw)

        ph.pick_tile2d = fake_pick
        try:
            run = make_run_fn(cfg)
            st = init_state(scene, cfg)
            st = run(st, scene, args.steps)
            float(np.asarray(st.v[0, 0, 0]))
            t0 = time.perf_counter()
            st = run(st, scene, args.steps)
            float(np.asarray(st.v[0, 0, 0]))
            rate = args.steps / (time.perf_counter() - t0)
            print(f"{label}: {rate:.2f} steps/s", flush=True)
        except Exception as exc:  # VMEM overflow → Mosaic compile error
            print(f"{label}: FAILED {type(exc).__name__}: {str(exc)[:120]}", flush=True)
        finally:
            ph.pick_tile2d = real_pick

    measure("auto            ", None, None)
    measure("vel(32,512) dye auto ", (32, 512), None)
    measure("vel auto dye(32,512) ", None, (32, 512))
    measure("vel(32,512) dye(32,512)", (32, 512), (32, 512))


if __name__ == "__main__":
    main()
