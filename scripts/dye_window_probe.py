"""Decision probe: element-offset windows vs halo triples at the CIP dye
kernel's exact stream mix (7 per-channel f32 inputs, 6 outputs).

The geometry sweep (scripts/dma_geometry_sweep.py) showed aggregate DMA
throughput degrades with concurrent stream count and small block rows
(t=8 single-stream caps at ~546 GB/s). At full lane width a window
[r0-8, r0+t+8) x [0, Y) is ONE CONTIGUOUS HBM region, so a window fetch
is both fewer streams (1 vs 3 per input) and a 3x larger transfer than
the triple scheme's 8-row side blocks. This probe measures the no-op
ceiling of both geometries at the two production configs:

  res=4096: t=8  (the 1-D cgrid dye kernel's tile at Y=4096)
  res=1600: t=32 (its tile at Y=1600)

Run ON THE TPU:  python scripts/dye_window_probe.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.dma_geometry_sweep import run_case  # noqa: E402


def main() -> None:
    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()

    enable_compile_cache()
    results: list[dict] = []

    print("res=4096 geometry (8192 x 4096), dye stream mix 7-in/6-out:")
    run_case("triples n_in=7 t=8 n_out=6", 300, results,
             x=8192, y=4096, t=8, n_in=7, n_out=6, triples=True)
    run_case("windows n_in=7 t=8 n_out=6", 300, results,
             x=8192, y=4096, t=8, n_in=7, n_out=6, windows=True)
    run_case("windows n_in=7 t=16 n_out=6", 300, results,
             x=8192, y=4096, t=16, n_in=7, n_out=6, windows=True)

    print("\nres=1600 geometry (3200 x 1600), dye stream mix 7-in/6-out:")
    run_case("triples n_in=7 t=32 n_out=6", 300, results,
             x=3200, y=1600, t=32, n_in=7, n_out=6, triples=True)
    run_case("windows n_in=7 t=32 n_out=6", 300, results,
             x=3200, y=1600, t=32, n_in=7, n_out=6, windows=True)


if __name__ == "__main__":
    main()
