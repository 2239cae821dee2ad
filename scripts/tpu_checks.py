"""On-device validation suite (run manually / per round on the real TPU).

The pytest suite pins the CPU backend (tests/conftest.py) so it can run
anywhere and exercise Pallas kernels only in interpret mode. This script
is the complement: it drives the REAL compiled kernels on the current
accelerator and checks physics equivalence, stability, and throughput.

    python scripts/tpu_checks.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    return ok


def main() -> int:
    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="smaller grids / fewer steps")
    args = parser.parse_args()

    import jax

    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.simulator import make_run_fn
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    res = 128 if args.quick else 256
    steps = 30 if args.quick else 50
    ok = True

    # 1. Pallas vs XLA physics equivalence (discontinuity-free config).
    scene = get_scene(2, res)
    outs = {}
    for kern in ("pallas", "xla"):
        cfg = SimConfig.create(resolution=res, re=1000.0, scheme="cip",
                               vor_eps=None, enable_dye=True, kernels=kern)
        outs[kern] = make_run_fn(cfg)(init_state(scene, cfg), scene, steps)
        np.asarray(outs[kern].v)
    for name in ("v", "p", "dye", "vx"):
        a = np.asarray(getattr(outs["pallas"], name))
        b = np.asarray(getattr(outs["xla"], name))
        scale = max(1.0, float(np.abs(b).max()))
        d = float(np.abs(a - b).max())
        ok &= check(f"pallas==xla {name}", d <= 1e-4 * scale, f"maxdiff {d:.2e}")

    # 1b. Same equivalence with the 2-D tiled phase kernels forced
    #     (the compiled path — interpret-mode tests can't catch Mosaic
    #     lowering bugs). Needs Y ≥ 256 so a 2-D tiling exists; verify
    #     the forced dispatch really took the 2-D path (a silent XLA
    #     fallback would make this check vacuous).
    import fluid2d_tpu.ops.pallas_phases as ph

    res2d = max(res, 256)
    scene2d = get_scene(2, res2d)
    tile2d = __import__("fluid2d_tpu.ops.pallas_stencil", fromlist=["pick_tile2d"]).pick_tile2d(
        2 * res2d, res2d, ph._cip_velocity_cost2d
    )
    ok &= check("2-D tiling available at check resolution", tile2d is not None, f"{tile2d}")
    cfg = SimConfig.create(resolution=res2d, re=1000.0, scheme="cip",
                           vor_eps=None, enable_dye=True, kernels="xla")
    ref2d = make_run_fn(cfg)(init_state(scene2d, cfg), scene2d, steps)
    np.asarray(ref2d.v)
    orig_vmem_tile = ph._vmem_tile
    try:
        ph._vmem_tile = lambda *a, **k: None  # make every 1-D tile infeasible
        cfg = SimConfig.create(resolution=res2d, re=1000.0, scheme="cip",
                               vor_eps=None, enable_dye=True, kernels="pallas")
        out2d = make_run_fn(cfg)(init_state(scene2d, cfg), scene2d, steps)
        np.asarray(out2d.v)
    finally:
        ph._vmem_tile = orig_vmem_tile
    for name in ("v", "p", "dye"):
        a = np.asarray(getattr(out2d, name))
        b = np.asarray(getattr(ref2d, name))
        scale = max(1.0, float(np.abs(b).max()))
        d = float(np.abs(a - b).max())
        ok &= check(f"pallas2d==xla {name}", d <= 1e-4 * scale, f"maxdiff {d:.2e}")

    # 2. Full-feature stability (confinement + dye + limiter).
    for scheme in ("cip", "kk", "upwind"):
        cfg = SimConfig.create(resolution=res, re=1e6, scheme=scheme,
                               vor_eps=5.0, enable_dye=True)
        st = make_run_fn(cfg)(init_state(scene, cfg), scene, steps * 2)
        v = np.asarray(st.v)
        ok &= check(
            f"stability {scheme}",
            not np.isnan(v).any() and np.sqrt((v**2).sum(0)).max() <= cfg.velocity_limit + 1e-4,
            f"max|v| {np.sqrt((v**2).sum(0)).max():.3f}",
        )

    # 3. Throughput sanity at the headline config.
    if not args.quick:
        bres = 1600
        cfg = SimConfig.create(resolution=bres, scheme="cip", vor_eps=5.0, enable_dye=True)
        bscene = get_scene(2, bres)
        run = make_run_fn(cfg)
        st = run(init_state(bscene, cfg), bscene, 100)
        float(np.asarray(st.v[0, 0, 0]))
        t0 = time.perf_counter()
        st = run(st, bscene, 100)
        float(np.asarray(st.v[0, 0, 0]))
        rate = 100 / (time.perf_counter() - t0)
        ok &= check("throughput res=1600 cip ≥ 60 steps/s", rate >= 60, f"{rate:.1f} steps/s")

    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
