"""Does halving bytes-per-element beat the DMA-geometry ceiling?

Every round-3/4 geometry probe changed the NUMBER or SHAPE of operand
streams (merged planes, folded channels, c-grid ranks, mask packing) and
lost. The one untried direction is bytes PER ELEMENT: a bf16 transport
mode would halve the shipped bytes of every f32 plane while keeping the
operand geometry identical. Whether that buys time depends on what the
per-kernel ceiling is actually made of:

* byte-rate bound  -> bf16 twin runs ~2x faster per call -> a reduced-
  precision transport mode is the remaining big single-chip lever;
* descriptor/issue bound -> bf16 twin runs at f32 time (same DMA count,
  same block count) -> the lever is dead and the ledger records it.

This probe answers that with the no-op twin machinery from
utils/profiling (same BlockSpec structure as the production kernels, no
VPU work, full-size arrays past VMEM): the cip_dye and cip_velocity
mixes at their res=1600 dispatched tiles, f32 vs bf16, plus a bf16 run
at 2x tile (halved bytes fit a doubled tile in the same VMEM budget).
f32 is re-run after the bf16 arms as the health gate.

Run on the TPU dev chip:  python scripts/bf16_geometry_probe.py
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import fluid2d_tpu.ops.pallas_stencil as ps  # noqa: E402
from fluid2d_tpu.utils.profiling import (  # noqa: E402
    _KERNEL_MIXES,
    _time_noop_twin,
    _tok_specs,
)

from jax.experimental import pallas as pl  # noqa: E402


def mix_twin(name: str, x_rows: int, y_cols: int, t: int,
             dtype, iters: int | None = None) -> tuple[float, int]:
    """Seconds per call and bytes per call for kernel `name`'s operand
    mix rebuilt at element dtype `dtype` (int8 mask planes unchanged).
    Clone of profiling.measure_mix_ceiling with the dtype knob — kept
    here because the production registry is deliberately f32-only."""
    mix = _KERNEL_MIXES[name]
    n_t = x_rows // t
    assert n_t >= 2 and x_rows % t == 0
    cg = mix["grid"] == "cg"
    chans = 3
    isz = jnp.dtype(dtype).itemsize

    def arr_shape(lead):
        if lead == "c":
            return (chans, x_rows, y_cols)
        if lead is None:
            return (x_rows, y_cols)
        return (lead, x_rows, y_cols)

    trip = ps._halo_triple_specs_cgrid if cg else ps._halo_triple_specs
    cent = ps._center_spec_cgrid if cg else ps._center_spec

    in_specs, args, nbytes = [], [], 0
    for k, (kind, lead) in enumerate(mix["ins"]):
        is8 = kind.endswith("8")
        dt = jnp.int8 if is8 else dtype
        a = jnp.full(arr_shape(lead), k + 1, dt)
        ld = chans if lead == "c" else lead
        if kind.startswith("t"):
            in_specs += trip(t, y_cols, n_t, lead)
            args += [a] * 3
            nbytes += ps.triple_bytes(x_rows, y_cols, t, ld,
                                      itemsize=1 if is8 else isz)
        else:
            in_specs.append(cent(t, y_cols, lead))
            args.append(a)
            nbytes += ps.center_bytes(x_rows, y_cols, ld,
                                      itemsize=1 if is8 else isz)

    tok_in, tok_out = _tok_specs(2 if cg else 1)
    in_specs.append(tok_in)
    args.append(jnp.zeros((8, 128), jnp.float32))
    out_specs = [cent(t, y_cols, lead) for lead in mix["outs"]] + [tok_out]
    out_shape = [jax.ShapeDtypeStruct(arr_shape(lead), dtype)
                 for lead in mix["outs"]]
    out_shape.append(jax.ShapeDtypeStruct((8, 128), jnp.float32))
    nbytes += sum(ps.center_bytes(x_rows, y_cols,
                                  chans if lead == "c" else lead, itemsize=isz)
                  for lead in mix["outs"])
    n_in = len(in_specs)

    def kernel(*refs):
        ins, outs = refs[:n_in], refs[n_in:]
        acc = jnp.float32(0)
        for r in ins:
            acc += jnp.sum(r[...].astype(jnp.float32))
        for o in outs:
            o[...] = jnp.full(o.shape, acc, o.dtype)

    grid = (n_t, chans) if cg else (n_t,)
    call = pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                          out_specs=out_specs, out_shape=out_shape)
    bps, nb = _time_noop_twin(call, args, nbytes, iters)
    return nb / bps, nb  # seconds per call, bytes per call


CASES = [
    # (kernel, res=1600 dispatched tile)
    ("cip_dye", 80),
    ("cip_velocity", 64),
]


def main() -> None:
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1600)
    args = ap.parse_args()
    x_rows, y_cols = 2 * args.res, args.res

    for name, t in CASES:
        rows = []
        sec32, nb32 = mix_twin(name, x_rows, y_cols, t, jnp.float32)
        rows.append(("f32", t, sec32, nb32))
        for dt_name, dt, tt in (("bf16", jnp.bfloat16, t),
                                ("bf16", jnp.bfloat16, 2 * t)):
            try:
                sec, nb = mix_twin(name, x_rows, y_cols, tt, dt)
                rows.append((dt_name, tt, sec, nb))
            except Exception as e:  # compile refusal is itself a finding
                print(json.dumps({"kernel": name, "dtype": dt_name,
                                  "t": tt, "error": str(e)[:200]}))
        sec32b, _ = mix_twin(name, x_rows, y_cols, t, jnp.float32)
        rows.append(("f32/regate", t, sec32b, nb32))
        gate_drift = abs(sec32b - sec32) / sec32
        for dt_name, tt, sec, nb in rows:
            print(json.dumps({
                "kernel": name, "dtype": dt_name, "t": tt,
                "ms_per_call": round(sec * 1e3, 3),
                "GBps_of_mix_bytes": round(nb / sec / 1e9, 1),
                "time_vs_f32": round(sec / sec32, 3),
                "gate_drift_pct": round(100 * gate_drift, 1),
            }))


if __name__ == "__main__":
    main()
