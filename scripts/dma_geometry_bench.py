"""Is ~700 GB/s a DMA-*geometry* ceiling, or are the phase kernels VPU-bound?

The round-3 on-chip traces show every fused phase kernel achieving
600-730 GB/s of its BlockSpec bytes — at BOTH res=1600 and res=4096 —
while a 1-operand streaming copy measures ~2.7 TB/s on the same chip
(utils/profiling.measure_hbm_bandwidth). Two hypotheses fit that data:

  (a) VPU-bound (the standing claim, docs/BENCH.md): the kernels' ~70-pass
      expression DAGs limit throughput; DMA overlaps and is never the
      constraint.
  (b) DMA-geometry-bound: ~30 operands per kernel with (t,Y) center
      blocks and (8,Y) side blocks make the DMA engine the constraint at
      ~700 GB/s, and the VPU work hides UNDER the DMA time.

This script separates them: a pallas_call with the CIP dye kernel's EXACT
operand/BlockSpec geometry (same grid (n_t, chans), same halo triples,
same outputs, same scratch) whose body does near-zero VPU work — each
block is consumed via one scalar read, outputs are a broadcast fill. Its
achieved GB/s (same byte ledger as the real kernel) is the geometry's
DMA speed-of-light:

  * ≈ streaming copy  → geometry is fine; (a) VPU-bound confirmed.
  * ≈ the real kernel's 600-730 → (b): the ceiling is the DMA schedule,
    and the optimization direction is fewer/larger operand blocks, not
    fewer VPU passes.

Usage: python scripts/dma_geometry_bench.py [--res 1600] [--iters 200]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def dyelike_call(res: int, tile_x: int | None = None):
    """A pallas_call with the CIP dye kernel's exact BlockSpec geometry
    (fluid2d_tpu/ops/pallas_phases.py:cip_dye_phase_pallas) and a
    near-no-op body. Returns (call, args, bytes_per_call)."""
    from fluid2d_tpu.ops.pallas_phases import _vmem_tile
    from fluid2d_tpu.ops.pallas_stencil import (
        _center_spec_cgrid,
        _halo_triple_specs_cgrid,
        center_bytes,
        triple_bytes,
    )

    chans, x_rows, y_cols = 3, 2 * res, res

    # The real kernel's calibrated tile (t=32 at Y=1600, t=8 at Y=4096).
    def cost_rows(t: int) -> float:
        blocks = 9 * (t + 16) + 0.6 * (t + 16) + 6 * t + 0.25 * t
        return 2 * blocks + 10 * t + 20 * t

    t = tile_x or _vmem_tile(x_rows, y_cols, cost_rows)
    if t is None:
        msg = f"no feasible row tile at res={res} (the real kernel goes 2-D here)"
        raise SystemExit(msg)
    n_t = x_rows // t

    f32 = functools.partial(jnp.zeros, dtype=jnp.float32)
    i8 = functools.partial(jnp.zeros, dtype=jnp.int8)
    d = f32((chans, x_rows, y_cols))
    vel = f32((2, x_rows, y_cols))
    mask = i8((x_rows, y_cols))

    h2 = lambda lead: _halo_triple_specs_cgrid(t, y_cols, n_t, lead)  # noqa: E731
    specs = (
        h2("c") + h2("c") + h2("c") + h2("c") + h2("c") + h2("c")
        + h2(2) + h2("c") + h2(None) + h2(None) + [_center_spec_cgrid(t, y_cols, None)]
    )
    args = [d] * 18 + [vel] * 3 + [d] * 3 + [mask] * 6 + [mask]

    def kernel(*refs):
        ins, outs, _scratch = refs[:31], refs[31:37], refs[37]
        # Touch every input block with ONE scalar read — forces the DMA
        # without VPU passes over the block.
        acc = jnp.float32(0)
        for r in ins:
            # One-row load, widened before the extract (Mosaic only
            # supports 32-bit scalar vector.extracts).
            row = r[(0,) * (r.ndim - 2)][:1, :]
            acc += row.astype(jnp.float32)[0, 0]
        for o in outs:
            o[...] = jnp.full(o.shape, acc, jnp.float32)

    out_sd = jax.ShapeDtypeStruct(d.shape, d.dtype)
    call = pl.pallas_call(
        kernel,
        grid=(n_t, chans),
        in_specs=specs,
        out_specs=[_center_spec_cgrid(t, y_cols, "c")] * 6,
        out_shape=[out_sd] * 6,
        scratch_shapes=[pltpu.VMEM((10, t, y_cols), jnp.float32)],
    )

    nbytes = (
        (6 * chans + 2 + chans) * triple_bytes(x_rows, y_cols, t, None)
        + 2 * triple_bytes(x_rows, y_cols, t, None, itemsize=1)
        + center_bytes(x_rows, y_cols, None, itemsize=1)
        + 6 * chans * center_bytes(x_rows, y_cols, None)
    )
    return call, args, nbytes, t


def element_call(res: int, t: int, packed: bool):
    """Candidate geometries for a DMA-count-bound dye kernel, on an
    X-padded array layout (h=8 rows each side, so every halo window is a
    SINGLE in-bounds ``pl.Element`` block — no side-block DMAs, no
    window concats).

    packed=False — today's operand list, windows instead of triples:
      grid (n_t, chans); 13 input blocks + 6 output blocks per step
      (vs 37 with halo triples).
    packed=True — additionally pack the 6 per-channel dye fields into
      one (chans*6, X, Y) array and the 2 i8 masks into one:
      grid (n_t,); 5 input + 1 output blocks per step.
    """
    h = 8
    chans, x_rows, y_cols = 3, 2 * res + 2 * h, res
    f32 = functools.partial(jnp.zeros, dtype=jnp.float32)
    i8 = functools.partial(jnp.zeros, dtype=jnp.int8)
    n_t = (x_rows - 2 * h) // t
    tb = t // 8

    def win_spec(lead):
        # (lead, t+2h, Y) window at element offset (c|0, i*t, 0); offsets
        # written as 8·k so Mosaic's divisibility prover accepts them.
        dims = (pl.Element(t + 2 * h), pl.Element(y_cols))
        if lead == "c":
            return pl.BlockSpec((pl.Element(1), *dims),
                                lambda i, c: (c, (i * tb) * 8, 0),
                                memory_space=pltpu.VMEM)
        if lead is None:
            return pl.BlockSpec(dims, lambda i, *cc: ((i * tb) * 8, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((pl.Element(lead), *dims),
                            lambda i, *cc: (0, (i * tb) * 8, 0),
                            memory_space=pltpu.VMEM)

    def out_spec(lead):
        # Center rows only, shifted past the low pad: offset i*t + h.
        dims = (pl.Element(t), pl.Element(y_cols))
        if lead == "c":
            return pl.BlockSpec((pl.Element(1), *dims),
                                lambda i, c: (c, (i * tb + 1) * 8, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((pl.Element(lead), *dims),
                            lambda i, *cc: (0, (i * tb + 1) * 8, 0),
                            memory_space=pltpu.VMEM)

    if packed:
        big = f32((chans * 6, x_rows, y_cols))
        vel = f32((2, x_rows, y_cols))
        bcd = f32((chans, x_rows, y_cols))
        mask = i8((x_rows, y_cols))
        specs = [win_spec(chans * 6), win_spec(2), win_spec(chans), win_spec(None)]
        args = [big, vel, bcd, mask]
        out_sd = jax.ShapeDtypeStruct(big.shape, big.dtype)
        o_specs, n_out, grid = [out_spec(chans * 6)], 1, (n_t,)
        # bytes: windows re-fetch 2h rows per tile; outputs center-only.
        win_rows = (x_rows - 2 * h) + 2 * h * n_t
        nbytes = (
            (chans * 6 + 2 + chans) * win_rows * y_cols * 4
            + win_rows * y_cols
            + chans * 6 * (x_rows - 2 * h) * y_cols * 4
        )
    else:
        d = f32((chans, x_rows, y_cols))
        vel = f32((2, x_rows, y_cols))
        mask = i8((x_rows, y_cols))
        specs = ([win_spec("c")] * 6 + [win_spec(2), win_spec("c")]
                 + [win_spec(None)] * 3)
        args = [d] * 6 + [vel, d] + [mask] * 3
        out_sd = jax.ShapeDtypeStruct(d.shape, d.dtype)
        o_specs, n_out, grid = [out_spec("c")] * 6, 6, (n_t, chans)
        win_rows = (x_rows - 2 * h) + 2 * h * n_t
        nbytes = (
            (6 * chans + 2 + chans) * win_rows * y_cols * 4
            + 2 * win_rows * y_cols + win_rows * y_cols
            + 6 * chans * (x_rows - 2 * h) * y_cols * 4
        )

    def kernel(*refs):
        ins, outs = refs[: len(specs)], refs[len(specs):]
        acc = jnp.float32(0)
        for r in ins:
            row = r[(0,) * (r.ndim - 2)][:1, :]
            acc += row.astype(jnp.float32)[0, 0]
        for o in outs:
            o[...] = jnp.full(o.shape, acc, jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=o_specs,
        out_shape=[out_sd] * n_out,
    )
    return call, args, nbytes


def time_scan(call, args, iters: int) -> float:
    """Seconds per call, scan-amortized (the first arg is carried so the
    loop isn't constant-folded)."""

    @jax.jit
    def loop(first, rest):
        def body(c, _):
            outs = call(c, *rest)
            return outs[0], None

        out, _ = jax.lax.scan(body, first, None, length=iters)
        return out

    first, rest = args[0], args[1:]
    out = loop(first, rest)
    float(np.asarray(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = loop(first, rest)
    float(np.asarray(out[0, 0, 0]))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem
    from fluid2d_tpu.utils.profiling import measure_hbm_bandwidth

    raise_scoped_vmem()

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=1600)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--tile", type=int, default=None)
    args = p.parse_args()

    bw = measure_hbm_bandwidth() / 1e9
    print(f"streaming copy (1 operand, (64,2048) blocks): {bw:7.1f} GB/s")

    call, call_args, nbytes, t = dyelike_call(args.res, args.tile)
    sec = time_scan(call, call_args, args.iters)
    print(
        f"dye-geometry no-op (31 in / 6 out triples, t={t}, res={args.res}): "
        f"{nbytes / 2**20:.0f} MB in {sec * 1e3:.2f} ms = "
        f"{nbytes / sec / 1e9:7.1f} GB/s"
    )

    for packed, label in ((False, "element windows (13 in / 6 out)"),
                          (True, "packed + element (4 in / 1 out)")):
        try:
            call, call_args, nb = element_call(args.res, args.tile or t, packed)
            sec = time_scan(call, call_args, args.iters)
            print(f"{label:42s}: {nb / 2**20:.0f} MB in {sec * 1e3:.2f} ms = "
                  f"{nb / sec / 1e9:7.1f} GB/s")
        except Exception as e:  # noqa: BLE001 — feasibility probe
            print(f"{label:42s}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:150]})")
    print(
        "verdict hint: triples ~copy-speed → VPU-bound stands; "
        "~600-730 GB/s → DMA-geometry ceiling (fewer/larger blocks win)"
    )


if __name__ == "__main__":
    main()
