"""Capture an on-chip profiler trace and publish the per-kernel breakdown.

VERDICT r2 item #1: the round-2 phase split (scripts/phase_breakdown.py)
was differential — toggle a phase, subtract step times — which hides
overlap and attributes compiler rescheduling to the toggled phase. This
script measures the real thing: a ``jax.profiler`` trace around a
compiled N-step run on the TPU, parsed with ``jax.profiler.ProfileData``
(the xplane.pb reader shipped with JAX), aggregated per XLA op on the
device timeline.

Kernel identification: Mosaic lowers every ``pallas_call`` to a
``closed_call``/``custom-call`` whose HLO *result type* is visible in
the trace event name. Within one config the output-tuple signature is
unambiguous (e.g. the CIP velocity phase is the only op returning six
(2, X, Y) f32 arrays), so ops are labeled by signature — no fragile HLO
text matching. Everything else is bucketed by op class (fusion / copy /
async DMA / control).

The per-kernel times are joined with the BlockSpec-derived DMA byte
ledger (utils/profiling.step_blockspec_bytes) and the measured copy
bandwidth to give each kernel's achieved HBM rate — the direct test of
round 2's "VPU-bound, not bandwidth-bound" claim.

Usage:
  python scripts/trace_kernels.py [--res 1600] [--scheme cip] [--steps 200]
                                  [--bc 2] [--json FILE]
"""

from __future__ import annotations

import argparse
import glob
import json
import re
import sys
import tempfile
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

_SHAPE_RE = re.compile(r"(f32|bf16|u8|s32|pred)\[([\d,]*)\]")


def _result_shapes(event_name: str) -> list[tuple[int, ...]]:
    """Output shapes of an HLO op from its event-name text (the segment
    before ``custom-call(`` / ``fusion(`` / first operand list)."""
    head = event_name.split(" custom-call(")[0].split(" fusion(")[0]
    head = head.split(" copy(")[0].split(" while(")[0]
    return [
        tuple(int(d) for d in dims.split(",") if d)
        for _, dims in _SHAPE_RE.findall(head)
    ]


def classify(event_name: str, scheme: str) -> str:
    """Bucket an XLA-op trace event; Pallas kernels by output signature."""
    name = event_name.lstrip("%")
    op = name.split(" ", 1)[0].split(".")[0].rstrip("0123456789")
    if op in ("closed_call", "custom-call") and "ConcatBitcast" not in event_name:
        shapes = _result_shapes(event_name)
        leads = tuple(s[0] if len(s) == 3 else None for s in shapes)
        n = len(leads)
        if n == 6 and set(leads) == {2}:
            return "pallas:cip_velocity"
        if n == 6 and set(leads) == {3}:
            return "pallas:cip_dye"
        if n == 1 and leads[0] == 2:
            return "pallas:confinement"
        if n == 2 and set(leads) == {None}:
            return "pallas:sor_iter"
        if n == 3 and leads[2] == 2 and leads[0] is None:
            return "pallas:sor_final_limit"
        if n == 2 and set(leads) == {2}:
            return "pallas:mac_velocity"
        if n == 2 and set(leads) == {3}:
            return "pallas:mac_dye"
        return f"pallas:other[{leads}]"
    if op.startswith("while"):
        return "_control"  # parent span enclosing the whole loop body
    if op.startswith("fusion") or op.startswith("slice_bitcast_fusion"):
        return "xla_fusion"
    if op.startswith("copy") and "copy-" not in op:
        return "copy"
    if "start" in op or "done" in op or "ConcatBitcast" in event_name:
        return "async_dma"
    return f"other:{op}"


# trace-label ↔ BlockSpec-ledger names (ledger: ops/pallas_phases.py,
# ops/pallas_stencil.py log_traffic call sites)
_LEDGER_GROUPS = {
    "pallas:cip_velocity": ("cip_velocity", "cip_velocity_2d"),
    "pallas:cip_dye": ("cip_dye", "cip_dye_2d"),
    "pallas:mac_velocity": ("mac_velocity",),
    "pallas:mac_dye": ("mac_dye",),
    "pallas:confinement": ("confinement",),
    "pallas:sor": ("sor_x1", "sor_x2"),
}


def capture(res: int, scheme: str, steps: int, bc: int, logdir: str,
            dtype: str = "float32") -> dict:
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.simulator import make_run_fn, scene_for_dtype
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state
    from fluid2d_tpu.utils.profiling import step_blockspec_bytes

    cfg = SimConfig.create(resolution=res, re=1e6, scheme=scheme,
                           vor_eps=5.0, enable_dye=True, dtype=dtype)
    scene = scene_for_dtype(get_scene(bc, res), cfg)
    state = init_state(scene, cfg)
    run = make_run_fn(cfg)

    state = run(state, scene, steps)  # compile + warm
    float(np.asarray(state.v).ravel()[0])

    t0 = time.perf_counter()
    jax.profiler.start_trace(logdir)
    out = run(state, scene, steps)
    float(np.asarray(out.v).ravel()[0])
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0

    per_kernel_bytes = step_blockspec_bytes(cfg, res, bc=bc)
    return {"wall_s": wall, "ledger": per_kernel_bytes, "cfg": cfg}


def parse_trace(logdir: str, steps: int, scheme: str) -> dict:
    from jax.profiler import ProfileData

    xplane = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))[-1]
    pd = ProfileData.from_file(xplane)
    agg: dict[str, list] = {}  # label → [count, ns]
    loop_ns = 0.0
    for plane in pd.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                label = classify(e.name, scheme)
                if label == "_control":
                    loop_ns += e.duration_ns
                    continue
                a = agg.setdefault(label, [0, 0.0])
                a[0] += 1
                a[1] += e.duration_ns
    return {"agg": agg, "loop_ns": loop_ns, "xplane": xplane}


def main() -> None:
    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=1600)
    p.add_argument("--scheme", type=str, default="cip")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--bc", type=int, default=2)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="Transport (HBM) dtype — bf16 halves the ledger's "
                        "float bytes (utils/profiling logs the real figure)")
    p.add_argument("--json", type=str, default="")
    p.add_argument("--keep-trace", action="store_true")
    args = p.parse_args()

    logdir = tempfile.mkdtemp(prefix="fluid2d_trace_") if not args.keep_trace \
        else f"/tmp/fluid2d_trace_res{args.res}"
    cap = capture(args.res, args.scheme, args.steps, args.bc, logdir,
                  dtype=args.dtype)
    tr = parse_trace(logdir, args.steps, args.scheme)

    agg = tr["agg"]
    # merge the two SOR call sites for the ledger join
    sor_ns = sum(v[1] for k, v in agg.items() if k.startswith("pallas:sor"))
    busy_ns = sum(v[1] for v in agg.values())
    loop_us = tr["loop_ns"] / args.steps / 1e3

    from fluid2d_tpu.utils.profiling import measure_hbm_bandwidth

    bw = measure_hbm_bandwidth()

    rows = []
    for label, (count, ns) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        us_step = ns / args.steps / 1e3
        row = {
            "label": label,
            "calls_per_step": round(count / args.steps, 2),
            "us_per_step": round(us_step, 1),
            "pct_of_busy": round(100 * ns / busy_ns, 1),
        }
        ledger_names = _LEDGER_GROUPS.get(
            "pallas:sor" if label.startswith("pallas:sor") else label, ()
        )
        nbytes = sum(cap["ledger"].get(n, 0) for n in ledger_names)
        if label.startswith("pallas:sor"):
            # attribute the grouped SOR bytes time-proportionally
            nbytes = nbytes * (ns / sor_ns) if sor_ns else 0
        if nbytes:
            gbps = nbytes / (us_step * 1e-6) / 1e9
            row["dma_MB_per_step"] = round(nbytes / 2**20, 1)
            row["achieved_GBps"] = round(gbps, 1)
            row["pct_of_copy_bw"] = round(100 * gbps * 1e9 / bw, 1)
        rows.append(row)

    report = {
        "res": args.res,
        "scheme": args.scheme,
        "dtype": args.dtype,
        "steps": args.steps,
        "wall_steps_per_sec": round(args.steps / cap["wall_s"], 1),
        "device_loop_us_per_step": round(loop_us, 1),
        "device_busy_us_per_step": round(busy_ns / args.steps / 1e3, 1),
        "measured_copy_GBps": round(bw / 1e9, 1),
        "kernels": rows,
    }
    hdr = (f"{'label':26s} {'x/step':>7s} {'µs/step':>9s} {'%busy':>6s} "
           f"{'MB/step':>8s} {'GB/s':>7s} {'%copyBW':>7s}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r['label']:26s} {r['calls_per_step']:7.2f} {r['us_per_step']:9.1f} "
              f"{r['pct_of_busy']:6.1f} "
              f"{r.get('dma_MB_per_step', 0) or '':>8} "
              f"{r.get('achieved_GBps', 0) or '':>7} "
              f"{r.get('pct_of_copy_bw', 0) or '':>7}")
    print(f"device loop: {loop_us:.1f} µs/step   busy: "
          f"{busy_ns / args.steps / 1e3:.1f} µs/step   wall: "
          f"{1e6 * cap['wall_s'] / args.steps:.1f} µs/step")
    print(json.dumps(report))
    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
