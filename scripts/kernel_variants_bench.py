"""A/B kernel-layout variants end-to-end (docs/BENCH.md ledger entries).

Each variant swaps ONE phase kernel's layout via its keyword switch and
times the FULL production step (make_run_fn, 2-step scan body) — layout
experiments are only meaningful end-to-end: Pallas pipelining, DMA
dedup, and Mosaic scheduling all change with the grid shape
(docs/BENCH.md: the dye channel grid won 13% in 1-D and lost 15% in
2-D at a different resolution).

Variants:
  mac-dye-cgrid     (n_t, 3) c-minor MAC dye kernel vs channel-folded
  cip-vel-cgrid     (n_t, 2) c-minor CIP velocity kernel vs folded/2-D

Usage:
  python scripts/kernel_variants_bench.py --variant mac-dye-cgrid \
      --res 1600 --scheme kk --steps 400
  python scripts/kernel_variants_bench.py --variant cip-vel-cgrid \
      --res 4096 --steps 60 [--bc 3]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def time_full_run(cfg, scene, steps: int) -> float:
    from fluid2d_tpu.models.simulator import make_run_fn
    from fluid2d_tpu.state import init_state

    run = make_run_fn(cfg)
    state = init_state(scene, cfg)
    state = run(state, scene, steps)
    float(np.asarray(state.v).ravel()[0])  # fence (tunnel-safe)
    state = init_state(scene, cfg)
    t0 = time.perf_counter()
    state = run(state, scene, steps)
    float(np.asarray(state.v).ravel()[0])
    elapsed = time.perf_counter() - t0
    if not np.isfinite(np.asarray(state.v)).all():
        msg = "non-finite fields — variant result is invalid"
        raise RuntimeError(msg)
    return steps / elapsed


def main() -> None:
    from fluid2d_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--variant", required=True,
                   choices=["mac-dye-cgrid", "cip-vel-cgrid"])
    p.add_argument("--res", type=int, default=1600)
    p.add_argument("--scheme", type=str, default="")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--bc", type=int, default=2)
    args = p.parse_args()

    import fluid2d_tpu.ops.pallas_phases as ph
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.scenes.compile import get_scene

    scheme = args.scheme or ("kk" if args.variant == "mac-dye-cgrid" else "cip")
    scene = get_scene(args.bc, args.res)
    cfg = SimConfig.create(resolution=args.res, re=1e6, scheme=scheme,
                           vor_eps=5.0, enable_dye=True)

    if args.variant == "mac-dye-cgrid":
        import fluid2d_tpu.models.mac as mod

        orig, attr = ph.mac_dye_phase_pallas, "mac_dye_phase_pallas"
    else:
        import fluid2d_tpu.models.cip as mod

        orig, attr = ph.cip_velocity_phase_pallas, "cip_velocity_phase_pallas"

    for label, flag in (("baseline", False), ("channel_grid", True)):
        setattr(mod, attr, functools.partial(orig, channel_grid=flag))
        try:
            rate = time_full_run(cfg, scene, args.steps)
            print(f"{args.variant} res={args.res} {scheme} {label:12s}: "
                  f"{rate:8.2f} steps/s", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue the A/B
            print(f"{args.variant} res={args.res} {scheme} {label:12s}: "
                  f"FAILED ({type(e).__name__}: {e})", flush=True)
    setattr(mod, attr, orig)


if __name__ == "__main__":
    main()
