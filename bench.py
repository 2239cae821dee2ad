"""Benchmark harness: simulation steps/sec on the BASELINE config.

Headline metric (BASELINE.json): sim steps/sec at res=1600 with CIP
advection + SOR Poisson solve (+dye +vorticity confinement, the
reference's defaults) on one TPU chip. The reference publishes no
numbers; the driver-set target is ≥60 steps/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Usage: python bench.py [--res 1600] [--scheme cip] [--steps 200] [--all]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _setup_tpu():
    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()  # before the first TPU compile (see tpu_flags)
    enable_compile_cache()  # amortize the res≥1600 compiles across runs


def bench_config(res: int, scheme: str, steps: int, *, enable_dye=True, vor_eps=5.0,
                 bc=2, re=1_000_000.0, dt=None, dtype="float32"):
    _setup_tpu()

    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.simulator import make_run_fn, scene_for_dtype
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    cfg = SimConfig.create(
        resolution=res, re=re, dt=dt, scheme=scheme, vor_eps=vor_eps,
        enable_dye=enable_dye, dtype=dtype,
    )
    scene = scene_for_dtype(get_scene(bc, res), cfg)
    state = init_state(scene, cfg)
    run = make_run_fn(cfg)

    import numpy as np

    def sync(st):
        # A real device→host transfer: block_until_ready alone does not
        # reliably fence execution through remote-runtime tunnels.
        return float(np.asarray(st.v[0, 0, 0]))

    # Warmup with the SAME static step count so the timed call reuses the
    # compiled executable (scan length is a static argument — a different
    # n would recompile inside the timing).
    state = run(state, scene, steps)
    sync(state)

    t0 = time.perf_counter()
    state = run(state, scene, steps)
    sync(state)
    elapsed = time.perf_counter() - t0
    return steps / elapsed, state


# The five BASELINE.json configs as named presets (VERDICT r3 item #6):
# one command reproduces the whole comparison table. Step counts sized
# so each timed run is ≥ ~1 s over the tunnel's ~30 ms invocation floor.
_PRESETS = {
    1: {"desc": "bc=1 channel flow, res=400, upwind, Re=1000, dt=5e-4",
        "kw": {"res": 400, "scheme": "upwind", "bc": 1, "re": 1000.0,
               "dt": 5e-4, "vor_eps": None, "enable_dye": False},
        "steps": 2000},
    2: {"desc": "bc=2 obstacle flow, res=800, Kawamura-Kuwahara, Re=1000",
        "kw": {"res": 800, "scheme": "kk", "bc": 2, "re": 1000.0},
        "steps": 1000},
    3: {"desc": "bc=3 Re=1e8, res=800, CIP + vorticity confinement vc=10",
        "kw": {"res": 800, "scheme": "cip", "bc": 3, "re": 1e8, "vor_eps": 10.0},
        "steps": 600},
    4: {"desc": "bc=5 multi-obstacle mask, res=1600, CIP + dye/vorticity",
        "kw": {"res": 1600, "scheme": "cip", "bc": 5},
        "steps": 300},
    5: {"desc": "bc=6 dragon mask, res=1600, CIP + dye/vorticity",
        "kw": {"res": 1600, "scheme": "cip", "bc": 6},
        "steps": 300},
    6: {"desc": "res=4096 obstacle sweep (bc=3), CIP — single chip "
               "(the v5p-8 sharded leg needs real multi-chip hardware)",
        "kw": {"res": 4096, "scheme": "cip", "bc": 3},
        "steps": 80},
}


def run_preset(n: int, dtype: str = "float32") -> dict:
    import numpy as np

    p = _PRESETS[n]
    rate, state = bench_config(steps=p["steps"], dtype=dtype, **p["kw"])
    finite = bool(np.isfinite(np.asarray(state.v, np.float32)).all())
    metric = f"baseline_config_{n}"
    if dtype != "float32":
        metric += f"_{dtype}"
    return {
        "metric": metric,
        "desc": p["desc"],
        "value": round(rate, 2) if finite else 0.0,
        "unit": "steps/s",
        "stable": finite,
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=1600)
    parser.add_argument("--scheme", type=str, default="cip", choices=["upwind", "kk", "cip"])
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="Transport (HBM) dtype; arithmetic stays f32 "
                             "(the headline metric stays float32 = reference "
                             "parity; bfloat16 is the measured fast path)")
    parser.add_argument("--all", action="store_true", help="Print a side table of configs")
    parser.add_argument("--config", type=str, default=None,
                        help="BASELINE.json preset number 1..6, or 'all'")
    parser.add_argument("--roofline", action="store_true",
                        help="Print measured-HBM roofline accounting to stderr")
    args = parser.parse_args()

    if args.config:
        nums = sorted(_PRESETS) if args.config == "all" else [int(args.config)]
        rows = [run_preset(n, args.dtype) for n in nums]
        for r, n in zip(rows, nums):
            print(f"# config {n}: {r['value']:9.1f} steps/s "
                  f"stable={r['stable']}  ({r['desc']})", file=sys.stderr)
        print(json.dumps(rows if len(rows) > 1 else rows[0]))
        return

    if args.roofline:
        _setup_tpu()  # the roofline compiles kernels whose tiles assume it
        from fluid2d_tpu.utils.profiling import roofline_report

        rep = roofline_report(args.res, args.scheme, args.steps, dtype=args.dtype)
        # One machine-readable JSON line (VERDICT r2 item #7) plus the
        # human-readable echo on stderr.
        print(json.dumps({"roofline": rep}))
        for k, v in rep.items():
            out = f"{v:.2f}" if isinstance(v, (int, float)) else v
            print(f"# {k}: {out}", file=sys.stderr)

    if args.all:
        # Step counts sized so each timed run is ≥ ~1 s: the tunnel's
        # ~30 ms per-invocation latency floor corrupts short runs (a
        # 50-step res=400 run reads 4× slower than the true rate).
        # res=4096 rows included so docs/BENCH.md's sweep table is
        # reproducible from this one command (VERDICT r2 item #7).
        for res, steps in ((400, 2000), (800, 1000), (1600, 400), (4096, 80)):
            for scheme in ("upwind", "kk", "cip"):
                rate, _ = bench_config(res, scheme, steps)
                print(f"# res={res:5d} scheme={scheme:6s}: {rate:9.1f} steps/s", file=sys.stderr)

    rate, state = bench_config(args.res, args.scheme, args.steps, dtype=args.dtype)

    import numpy as np

    metric = f"steps_per_sec_res{args.res}_{args.scheme}"
    if args.dtype != "float32":
        metric += f"_{args.dtype}"
    if np.isnan(np.asarray(state.v)).any():  # a benchmark of NaNs is not a benchmark
        print(json.dumps({"metric": metric, "value": 0.0,
                          "unit": "steps/s", "vs_baseline": 0.0}))
        return

    target = 60.0  # BASELINE.json: ≥60 steps/s @ res=1600 CIP on one chip
    print(json.dumps({
        "metric": metric,
        "value": round(rate, 2),
        "unit": "steps/s",
        "vs_baseline": round(rate / target, 3),
    }))


if __name__ == "__main__":
    main()
