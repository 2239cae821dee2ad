"""Probe: would DE-channel-gridding the dye kernel raise its DMA
ceiling at the 64 MiB arena?

Round-3's sweep measured the `(n_t, c)` channel-grid structure itself
as a ceiling suppressor (cgrid mixes 615-670 GB/s vs plain-grid
756-955 at comparable stream counts), but the channel-FOLDED dye
kernel was retired in round 2 when the c-grid won end-to-end at the
16 MiB VMEM limit (t=8/16 tiles). At the 64 MiB arena the folded
kernel could run t=16-40 — so measure the folded mix's no-op ceiling
at those tiles vs the shipped c-grid's 617 at t=80. Only if the folded
ceiling clears ~700 GB/s is resurrecting the folded kernel worth it
(the real kernels run at 99-100% of their mix ceilings).

Usage: python scripts/folded_dye_probe.py [--res 1600]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=1600)
    parser.add_argument("--tiles", type=str, default="16,32,40")
    args = parser.parse_args()

    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()
    enable_compile_cache()

    from fluid2d_tpu.utils import profiling

    res = args.res
    x_rows, y_cols = 2 * res, res

    # Folded mix: the round-2 channel-folded dye kernel's operand list —
    # 6 three-channel f32 triples + the 2-channel velocity triple + the
    # 3-channel bc_dye triple + 2 int8 triples + fluid center; 6
    # three-channel outputs. Same BYTES as the c-grid form, plain grid.
    profiling._KERNEL_MIXES["cip_dye_folded"] = {
        "grid": "1d",
        "ins": [("t", 3)] * 6 + [("t", 2), ("t", 3), ("t8", None), ("t8", None),
                ("c8", None)],
        "outs": [3] * 6,
    }

    rows = {}
    for t in (int(s) for s in args.tiles.split(",")):
        if x_rows % t:
            rows[f"folded_t{t}"] = "non-divisor"
            continue
        got = profiling.measure_mix_ceiling("cip_dye_folded", x_rows, y_cols, t)
        if got is None:
            rows[f"folded_t{t}"] = None
            continue
        bps, nbytes = got
        rows[f"folded_t{t}"] = {"ceiling_GBps": round(bps / 1e9, 1),
                                "floor_ms": round(nbytes / bps * 1e3, 3)}
        print(f"folded t={t}:", rows[f"folded_t{t}"])
    # c-grid control at the production tile
    got = profiling.measure_mix_ceiling("cip_dye", x_rows, y_cols, 80)
    if got:
        bps, nbytes = got
        rows["cgrid_t80"] = {"ceiling_GBps": round(bps / 1e9, 1),
                             "floor_ms": round(nbytes / bps * 1e3, 3)}
        print("cgrid t=80:", rows["cgrid_t80"])
    print(json.dumps({"res": res, "rows": rows}))


if __name__ == "__main__":
    main()
