"""Probe: does shipping FEWER int8 mask planes raise a phase kernel's
DMA-geometry ceiling? (VERDICT r3 item #1c — the last untried
fewer-streams shape after the merged/folded/2-D-block probes died.)

The production dye kernel ships inflow8 + not_wall8 as halo TRIPLES (6
int8 streams) plus fluid8 as a center block; velocity ships vbc_code +
not_wall8 triples plus fluid8. All of fluid/not_wall/inflow are one bit
and the BC codes are small ints, so a single packed int8 plane could
carry them (decode = bitwise ANDs in-kernel, VPU-cheap). Before
touching the kernels, measure the no-op-twin ceiling of each packed mix
at the production tile/grid: if the ceiling does not move, packing
cannot help (the real kernels already run at 99-100% of their mix
ceilings — docs/BENCH.md round-4 roofline).

Usage: python scripts/mask_pack_probe.py [--res 1600] [--t-dye 80 --t-vel 64]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=1600)
    parser.add_argument("--t-dye", type=int, default=None)
    parser.add_argument("--t-vel", type=int, default=None)
    args = parser.parse_args()

    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()
    enable_compile_cache()

    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.utils import profiling

    res = args.res
    x_rows, y_cols = 2 * res, res

    # Dispatched production tiles (from the BlockSpec trace) unless pinned.
    cfg = SimConfig.create(resolution=res, scheme="cip", vor_eps=5.0,
                           enable_dye=True)
    profiling.step_blockspec_bytes(cfg, res)
    tiles = profiling.step_blockspec_bytes.last_tiles
    t_dye = args.t_dye or tiles.get("cip_dye")
    t_vel = args.t_vel or tiles.get("cip_velocity")
    print(f"tiles: dye={t_dye} velocity={t_vel}")

    # Variant mixes: production vs all-masks-packed-into-one plane.
    M = profiling._KERNEL_MIXES
    M["cip_dye_pack"] = {
        "grid": "cg",
        # 6 dye triples + velocity + bc_dye + ONE packed int8 triple
        "ins": [("t", "c")] * 6 + [("t", 2), ("t", "c"), ("t8", None)],
        "outs": ["c"] * 6,
    }
    M["cip_velocity_pack"] = {
        "grid": "1d",
        "ins": [("t", 2), ("t", None)] + [("t", 2)] * 5
        + [("t", 2), ("t8", None)],
        "outs": [2] * 6,
    }

    rows = {}
    for name, t in (("cip_dye", t_dye), ("cip_dye_pack", t_dye),
                    ("cip_velocity", t_vel), ("cip_velocity_pack", t_vel)):
        if t is None:
            continue
        got = profiling.measure_mix_ceiling(name, x_rows, y_cols, t)
        if got is None:
            rows[name] = None
            continue
        bps, nbytes = got
        rows[name] = {"ceiling_GBps": round(bps / 1e9, 1),
                      "MB_per_call": round(nbytes / 2**20, 1),
                      # time to move the call's bytes at the ceiling — the
                      # figure that decides whether packing helps (fewer
                      # bytes AND a possibly different rate)
                      "floor_ms": round(nbytes / bps * 1e3, 3)}
        print(name, rows[name])
    print(json.dumps({"res": res, "t_dye": t_dye, "t_vel": t_vel, "rows": rows}))


if __name__ == "__main__":
    main()
