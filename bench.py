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


def bench_config(res: int, scheme: str, steps: int, *, enable_dye=True, vor_eps=5.0, bc=2):
    import jax

    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()  # before the first TPU compile (see tpu_flags)
    enable_compile_cache()  # amortize the res≥1600 compiles across runs

    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.simulator import make_run_fn
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    cfg = SimConfig.create(
        resolution=res, re=1_000_000.0, scheme=scheme, vor_eps=vor_eps, enable_dye=enable_dye
    )
    scene = get_scene(bc, res)
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


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=1600)
    parser.add_argument("--scheme", type=str, default="cip", choices=["upwind", "kk", "cip"])
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--all", action="store_true", help="Print a side table of configs")
    parser.add_argument("--roofline", action="store_true",
                        help="Print measured-HBM roofline accounting to stderr")
    args = parser.parse_args()

    if args.roofline:
        from fluid2d_tpu.utils.profiling import roofline_report

        rep = roofline_report(args.res, args.scheme, args.steps)
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

    rate, state = bench_config(args.res, args.scheme, args.steps)

    import numpy as np

    metric = f"steps_per_sec_res{args.res}_{args.scheme}"
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
