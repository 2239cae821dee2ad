"""What controls Pallas DMA throughput on this chip? A one-axis-at-a-time sweep.

Background (scripts/dma_geometry_bench.py, docs/BENCH.md): the fused
phase kernels all run at 600-730 GB/s of their BlockSpec bytes while a
1-in/1-out streaming copy measures ~2.6 TB/s, and a NO-OP kernel with
the dye phase's exact geometry also caps at ~620 GB/s — the kernels sit
at their operand geometry's DMA speed-of-light. But the element-window
variant (19 blocks vs 37) measured the same ~630, so raw block COUNT is
not the control variable. This sweep isolates the axes:

  in-count   n distinct input arrays, (64, Y) center blocks, 1 output
  rows       block row depth t in {8,16,32,64,128}, 1-in/1-out
  lanes      full-lane block width Y in {1600, 2048, 4096}
  triples    one input fetched as (cur, prev8, next8) halo triple
  outs       1 input, n_out outputs
  cgrid      (3, X, Y) input with (1, t, Y) blocks over grid (n_t, 3)
  phase-mix  n_in inputs + n_out outputs at the dye kernel's t

Every case reports achieved GB/s of the bytes its BlockSpecs actually
ship (same ledger convention as the real kernels). Run ON THE TPU:

  python scripts/dma_geometry_sweep.py [--res 1600] [--iters 300]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_HB = 8


def make_case(
    x: int, y: int, t: int, n_in: int = 1, n_out: int = 1,
    triples: bool = False, cgrid: bool = False, packed: bool = False,
    windows: bool = False, merged: bool = False, cgrid2d: bool = False,
):
    """A no-op pallas_call: `n_in` DISTINCT input arrays (so XLA cannot
    alias their buffers), each consumed in full; `n_out` broadcast-filled
    outputs. `packed=True` instead packs the n_in planes into ONE
    (n_in, X, Y) array fetched as a single lead-dim block per tile (the
    plane-packing redesign hypothesis: one DMA descriptor per fetch
    instead of n_in), with one packed output. `merged=True` stacks the
    n_in planes along X into ONE (n_in·X, Y) array read through n_in
    row-offset BlockSpecs — same block geometry and spec count as the
    distinct-array case, ONE hbm buffer (does the DMA gate count arrays
    or BlockSpec streams?). Returns (call, args, bytes/call)."""
    n_t = x // t

    if packed:
        big = jnp.asarray(
            np.stack([np.full((x, y), i + 1.0, np.float32) for i in range(n_in)])
        )
        if triples:
            tb = t // _HB
            cur = pl.BlockSpec((n_in, t, y), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
            prev = pl.BlockSpec(
                (n_in, _HB, y), lambda i: (0, jnp.maximum(i * tb - 1, 0), 0),
                memory_space=pltpu.VMEM,
            )
            nxt = pl.BlockSpec(
                (n_in, _HB, y),
                lambda i: (0, jnp.minimum(i * tb + tb, n_t * tb - 1), 0),
                memory_space=pltpu.VMEM,
            )
            in_specs, args = [cur, prev, nxt], [big, big, big]
            nbytes = n_in * (x + 2 * _HB * n_t) * y * 4 + n_out * n_in * x * y * 4
        else:
            cur = pl.BlockSpec((n_in, t, y), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
            in_specs, args = [cur], [big]
            nbytes = (1 + n_out) * n_in * x * y * 4
        out_spec = pl.BlockSpec((n_in, t, y), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        grid = (n_t,)
        out_sd = jax.ShapeDtypeStruct((n_in, x, y), jnp.float32)
    elif cgrid:
        arrs = [jnp.asarray(np.full((3, x, y), i + 1.0, np.float32)) for i in range(n_in)]
        spec = pl.BlockSpec((1, t, y), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, t, y), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM)
        grid = (n_t, 3)
        out_sd = jax.ShapeDtypeStruct((3, x, y), jnp.float32)
        in_specs = [spec] * n_in
        args = arrs
        nbytes = (n_in + n_out) * 3 * x * y * 4
    elif cgrid2d:
        # Channel grid with 2-D blocks: (3, X, Y) arrays RESHAPED (free,
        # contiguous) to (3X, Y); per-program blocks are plain (t, Y)
        # at row offset c·n_t + i — the fast 2-D-block DMA geometry
        # instead of cgrid's (1, t, Y) 3-D blocks (~600 GB/s ceiling).
        arrs = [jnp.asarray(np.full((3 * x, y), i + 1.0, np.float32))
                for i in range(n_in)]
        spec = pl.BlockSpec((t, y), lambda i, c: (c * n_t + i, 0),
                            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((t, y), lambda i, c: (c * n_t + i, 0),
                                memory_space=pltpu.VMEM)
        grid = (n_t, 3)
        out_sd = jax.ShapeDtypeStruct((3 * x, y), jnp.float32)
        in_specs = [spec] * n_in
        args = arrs
        nbytes = (n_in + n_out) * 3 * x * y * 4
        if windows:
            # ONE (t+16, Y) element-offset window per input; X-padded by
            # 8 per channel segment is NOT possible without relayout, so
            # offsets clamp per channel segment like _win_row0.
            h = _HB
            tb = t // h

            def row0(i, c):
                # per-channel-segment clamp: [c·x, c·x + x − (t+2h)]
                return (c * n_t * tb + jnp.clip(i * tb - 1, 0, (n_t - 1) * tb - 2)) * h

            in_specs = [pl.BlockSpec(
                (pl.Element(t + 2 * h), pl.Element(y)),
                lambda i, c: (row0(i, c), 0), memory_space=pltpu.VMEM,
            )] * n_in
            nbytes = n_in * 3 * (x + 2 * h * n_t) * y * 4 + n_out * 3 * x * y * 4
    elif merged:
        grid = (n_t,)
        big = jnp.asarray(np.concatenate(
            [np.full((x, y), p + 1.0, np.float32) for p in range(n_in)]))
        if triples:
            tb = t // _HB
            in_specs = []
            for p in range(n_in):
                r0b = p * n_t * tb  # plane p's row offset in 8-row blocks
                in_specs += [
                    pl.BlockSpec((t, y), lambda i, p=p: (p * n_t + i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (_HB, y),
                        lambda i, r0b=r0b: (r0b + jnp.maximum(i * tb - 1, 0), 0),
                        memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (_HB, y),
                        lambda i, r0b=r0b: (
                            r0b + jnp.minimum(i * tb + tb, n_t * tb - 1), 0),
                        memory_space=pltpu.VMEM),
                ]
            args = [big] * (3 * n_in)
            nbytes = n_in * (x + 2 * _HB * n_t) * y * 4 + n_out * x * y * 4
        else:
            in_specs = [
                pl.BlockSpec((t, y), lambda i, p=p: (p * n_t + i, 0),
                             memory_space=pltpu.VMEM)
                for p in range(n_in)
            ]
            args = [big] * n_in
            nbytes = (n_in + n_out) * x * y * 4
        # Output carries the merged shape (time_scan chains outs[0] back
        # into args[0]); only the plane-0 blocks are written, so the out
        # stream ships the same x·y·4 bytes as the distinct-array case.
        out_spec = pl.BlockSpec((t, y), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out_sd = jax.ShapeDtypeStruct((n_in * x, y), jnp.float32)
    else:
        arrs = [jnp.asarray(np.full((x, y), i + 1.0, np.float32)) for i in range(n_in)]
        center = pl.BlockSpec((t, y), lambda i: (i, 0), memory_space=pltpu.VMEM)
        grid = (n_t,)
        out_sd = jax.ShapeDtypeStruct((x, y), jnp.float32)
        out_spec = center
        if triples:
            tb = t // _HB
            prev = pl.BlockSpec(
                (_HB, y), lambda i: (jnp.maximum(i * tb - 1, 0), 0),
                memory_space=pltpu.VMEM,
            )
            nxt = pl.BlockSpec(
                (_HB, y), lambda i: (jnp.minimum(i * tb + tb, n_t * tb - 1), 0),
                memory_space=pltpu.VMEM,
            )
            in_specs = [center, prev, nxt] * n_in
            args = [a for a in arrs for _ in range(3)]
            nbytes = n_in * (x + 2 * _HB * n_t) * y * 4 + n_out * x * y * 4
        else:
            in_specs = [center] * n_in
            args = arrs
            nbytes = (n_in + n_out) * x * y * 4

    if windows and not cgrid2d:
        # ONE (t+2h, Y) element-offset window block per input instead of
        # a 3-spec halo triple: same bytes, one third the input streams.
        # Arrays are X-padded by h=8 top+bottom so window offsets never
        # clamp (offsets in multiples of 8 keep Mosaic's divisibility
        # prover happy).
        h = _HB
        xp = x + 2 * h
        arrs = [jnp.asarray(np.full((xp, y), i + 1.0, np.float32))
                for i in range(n_in)]
        tb = t // h
        win = pl.BlockSpec(
            (pl.Element(t + 2 * h), pl.Element(y)),
            lambda i: ((i * tb) * h, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (pl.Element(t), pl.Element(y)),
            lambda i: ((i * tb + 1) * h, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs, args, grid = [win] * n_in, arrs, (n_t,)
        out_sd = jax.ShapeDtypeStruct((xp, y), jnp.float32)
        nbytes = n_in * (x + 2 * h * n_t) * y * 4 + n_out * x * y * 4

    n_blocks = len(in_specs)

    def kernel(*refs):
        # Consume every input block with a FULL reduction: a one-scalar
        # read lets the pipeline skip moving the bytes (first attempt
        # measured 7.5 TB/s — beyond the chip's HBM), so the probe was
        # timing DMA-issue overhead only. A sum touches every element at
        # VPU-pass cost (~20× cheaper than the HBM stream it forces).
        ins, outs = refs[:n_blocks], refs[n_blocks:]
        acc = jnp.float32(0)
        for r in ins:
            acc += jnp.sum(r[...])
        for o in outs:
            o[...] = jnp.full(o.shape, acc, jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * n_out,
        out_shape=[out_sd] * n_out,
    )
    return call, args, nbytes


def time_scan(call, args, iters: int) -> float:
    """Seconds per call; the first output is carried so nothing folds."""

    @jax.jit
    def loop(first, rest):
        def body(c, _):
            outs = call(c, *rest)
            return outs[0], None

        out, _ = jax.lax.scan(body, first, None, length=iters)
        return out

    first, rest = args[0], args[1:]
    out = loop(first, rest)
    float(np.asarray(out.ravel()[0]))
    t0 = time.perf_counter()
    out = loop(first, rest)
    float(np.asarray(out.ravel()[0]))
    return (time.perf_counter() - t0) / iters


def run_case(label: str, iters: int, results: list, **kw) -> None:
    try:
        call, args, nbytes = make_case(**kw)
        # The tunnel has a per-invocation latency floor of ~30 ms (see
        # utils/profiling.measure_hbm_bandwidth) — scale the scan length
        # so ~1 TB moves per timed call, swamping it. The first sweep
        # ran a fixed 300 iters and every sub-0.4 ms/call case was
        # floor-dominated garbage (39 MB cases all "measured" ~0.10 ms).
        iters = min(20000, max(iters, int(3e11 / nbytes)))
        sec = time_scan(call, args, iters)
        gbps = nbytes / sec / 1e9
        print(f"  {label:44s}: {nbytes / 2**20:6.0f} MB in {sec * 1e3:7.2f} ms"
              f" = {gbps:7.1f} GB/s", flush=True)
        results.append({"case": label, "GBps": round(gbps, 1), **kw})
    except Exception as e:  # noqa: BLE001 — feasibility sweep
        print(f"  {label:44s}: FAILED ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]})", flush=True)
        results.append({"case": label, "GBps": None, **kw})


def main() -> None:
    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem
    from fluid2d_tpu.utils.profiling import measure_hbm_bandwidth

    raise_scoped_vmem()

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=1600)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--json", type=str, default=None)
    p.add_argument("--only", type=str, default=None,
                   help="comma-separated section names to run "
                        "(incount,rows,lanes,triples,outs,cgrid,packed,"
                        "windows,mixes,merged)")
    args = p.parse_args()

    x, y = 2 * args.res, args.res
    results: list[dict] = []
    want = lambda s: args.only is None or s in args.only.split(",")  # noqa: E731

    bw = measure_hbm_bandwidth() / 1e9
    print(f"streaming copy reference ((64,2048) blocks, 320 MB in+out): {bw:7.1f} GB/s")

    if want("incount"):
        print(f"\nin-count (t=64, Y={y}, center blocks, 1 out):")
        for n in (1, 2, 4, 8, 13, 23):
            run_case(f"n_in={n}", args.iters, results, x=x, y=y, t=64, n_in=n)

    if want("rows"):
        print(f"\nblock rows (1 in / 1 out, Y={y}):")
        for t in (8, 16, 32, 64, 128, 256):
            if x % t == 0:
                run_case(f"t={t}", args.iters, results, x=x, y=y, t=t)

    if want("lanes"):
        print("\nlane width (1 in / 1 out, t=64, same total bytes):")
        for yy in (1600, 2048, 4096):
            xx = x * y // yy // 64 * 64
            run_case(f"Y={yy}", args.iters, results, x=xx, y=yy, t=64)

    if want("triples"):
        print(f"\nhalo triples (t=32, Y={y}, 1 out):")
        for n in (1, 4, 9):
            run_case(f"triples n_in={n}", args.iters, results,
                     x=x, y=y, t=32, n_in=n, triples=True)

    if want("outs"):
        print(f"\noutput count (1 in, t=64, Y={y}):")
        for n in (1, 2, 6):
            run_case(f"n_out={n}", args.iters, results, x=x, y=y, t=64, n_out=n)

    if want("cgrid"):
        print(f"\nchannel grid ((1,t,Y) blocks over (n_t, 3), t=32, Y={y}):")
        for n in (1, 7):
            run_case(f"cgrid n_in={n}", args.iters, results,
                     x=x, y=y, t=32, n_in=n, cgrid=True)

    if want("packed"):
        print(f"\nplane packing (ONE (P,X,Y) array, (P,t,Y) blocks, Y={y}):")
        # t chosen so the packed in+out blocks fit VMEM double-buffered.
        for n, tp in ((6, 32), (13, 16), (23, 8)):
            run_case(f"packed P={n} t={tp}", args.iters, results,
                     x=x, y=y, t=tp, n_in=n, packed=True)
        run_case("packed P=23 t=8 triples", args.iters, results,
                 x=x, y=y, t=8, n_in=23, packed=True, triples=True)

    if want("windows"):
        print(f"\nelement windows (ONE (t+16,Y) block per input, X-padded, Y={y}):")
        for n in (1, 4, 9):
            run_case(f"windows n_in={n} t=32", args.iters, results,
                     x=x, y=y, t=32, n_in=n, windows=True)
        run_case("windows n_in=9 t=8", args.iters, results,
                 x=x, y=y, t=8, n_in=9, windows=True)
        run_case("windows n_in=9 t=32 n_out=6", args.iters, results,
                 x=x, y=y, t=32, n_in=9, n_out=6, windows=True)
        run_case("windows n_in=16 t=32 n_out=6", args.iters, results,
                 x=x, y=y, t=32, n_in=16, n_out=6, windows=True)

    if want("mixes"):
        print(f"\nphase-like mixes (center blocks only, Y={y}):")
        run_case("n_in=23 n_out=6 t=32", args.iters, results,
                 x=x, y=y, t=32, n_in=23, n_out=6)
        run_case("n_in=23 n_out=6 t=8", args.iters, results,
                 x=x, y=y, t=8, n_in=23, n_out=6)
        run_case("n_in=9 triples n_out=6 t=32", args.iters, results,
                 x=x, y=y, t=32, n_in=9, n_out=6, triples=True)

    if want("cgrid2d"):
        # The dye kernel's layout question: same (n_t, 3) channel grid,
        # (t, Y) 2-D row-offset blocks on (3X, Y)-reshaped arrays vs the
        # shipped (1, t, Y) 3-D blocks (the `cgrid` section, 494-667).
        print(f"\ncgrid2d ((t,Y) blocks on (3X,Y) arrays over (n_t, 3), Y={y}):")
        for n, tt in ((7, 32), (7, 80), (8, 80)):
            run_case(f"cgrid2d n_in={n} t={tt}", args.iters, results,
                     x=x, y=y, t=tt, n_in=n, cgrid2d=True)
        run_case("cgrid2d n_in=8 t=80 n_out=6", args.iters, results,
                 x=x, y=y, t=80, n_in=8, n_out=6, cgrid2d=True)
        run_case("cgrid2d windows n_in=8 t=80 n_out=6", args.iters, results,
                 x=x, y=y, t=80, n_in=8, n_out=6, cgrid2d=True, windows=True)
        run_case("cgrid2d windows n_in=8 t=128 n_out=6", args.iters, results,
                 x=x, y=y, t=128, n_in=8, n_out=6, cgrid2d=True, windows=True)
        # 3-D twin at the same t for a clean A/B
        run_case("cgrid n_in=7 t=80", args.iters, results,
                 x=x, y=y, t=80, n_in=7, cgrid=True)

    if want("bigcopy"):
        # Residency control: the 2,618 GB/s "streaming copy" reference
        # exceeds a v5e's ~819 GB/s HBM spec — only possible if the
        # 40 MB scan-carried array stays VMEM-resident across scan
        # iterations (v5e VMEM is ~128 MB). If rates collapse toward
        # ~819 GB/s once in+out exceed VMEM, the in-count axis was a
        # residency curve, not a stream-count curve — and the phase
        # kernels at 600-730 GB/s are near the HARDWARE roofline.
        print(f"\nbig-array copies (1 in / 1 out, t=64, Y={y}):")
        for xx in (3200, 6400, 12800, 25600, 51200):
            mb = 2 * xx * y * 4 / 2**20
            run_case(f"copy {mb:.0f} MB total", args.iters, results,
                     x=xx, y=y, t=64)
        print(f"\nbig-array n_in=4 (t=64, Y={y}):")
        for xx in (3200, 12800, 25600):
            mb = 5 * xx * y * 4 / 2**20
            run_case(f"4-in {mb:.0f} MB total", args.iters, results,
                     x=xx, y=y, t=64, n_in=4)

    if want("folded"):
        # Channel-FOLDED alternatives to the (n_t, 3) channel grid (whose
        # ~620 GB/s ceiling the cgrid2d section pinned on the grid
        # structure itself): every dye plane as its own (X, Y) array on a
        # plain (n_t,) grid — n_in = 7 per-channel × 3 + vel ≈ 23
        # window streams, 18 outputs — plus lead-3 packed blocks (the
        # pre-cgrid folded layout) and a split-phase-sized mix.
        print(f"\nfolded-plane mixes ((n_t,) grid, separate (X,Y) planes, Y={y}):")
        run_case("windows n_in=23 t=32 n_out=18", args.iters, results,
                 x=x, y=y, t=32, n_in=23, n_out=18, windows=True)
        run_case("windows n_in=23 t=64 n_out=18", args.iters, results,
                 x=x, y=y, t=64, n_in=23, n_out=18, windows=True)
        run_case("windows n_in=15 t=64 n_out=12", args.iters, results,
                 x=x, y=y, t=64, n_in=15, n_out=12, windows=True)
        run_case("windows n_in=12 t=64 n_out=9", args.iters, results,
                 x=x, y=y, t=64, n_in=12, n_out=9, windows=True)
        run_case("packed P=3 t=64", args.iters, results,
                 x=x, y=y, t=64, n_in=3, packed=True)
        run_case("packed P=2 t=64", args.iters, results,
                 x=x, y=y, t=64, n_in=2, packed=True)

    if want("merged"):
        # Does the stream-count gate count HBM ARRAYS or BlockSpec
        # streams? Same spec count/geometry as the in-count axis, one
        # buffer. If merged ≈ distinct, the gate is per-spec and plane
        # merging is a dead end; if merged ≈ n_in=1, restructure the
        # phase kernels around merged planes.
        print(f"\nmerged planes (ONE (P·X, Y) array, P row-offset specs, Y={y}):")
        for n in (4, 8, 13, 23):
            run_case(f"merged n_in={n} t=64", args.iters, results,
                     x=x, y=y, t=64, n_in=n, merged=True)
        run_case("merged n_in=8 t=32 triples", args.iters, results,
                 x=x, y=y, t=32, n_in=8, merged=True, triples=True)
        run_case("merged n_in=8 t=80 triples", args.iters, results,
                 x=x, y=y, t=80, n_in=8, merged=True, triples=True)
        # distinct-array twins at the dye kernel's real t=80 for A/B
        run_case("triples n_in=8 t=80", args.iters, results,
                 x=x, y=y, t=80, n_in=8, triples=True)
        run_case("windows n_in=8 t=80", args.iters, results,
                 x=x, y=y, t=80, n_in=8, windows=True)
        run_case("windows n_in=8 t=80 n_out=6", args.iters, results,
                 x=x, y=y, t=80, n_in=8, n_out=6, windows=True)
        run_case("windows n_in=4 t=80 n_out=3", args.iters, results,
                 x=x, y=y, t=80, n_in=4, n_out=3, windows=True)
        run_case("windows n_in=8 t=80 n_out=3", args.iters, results,
                 x=x, y=y, t=80, n_in=8, n_out=3, windows=True)

    if args.json:
        Path(args.json).write_text(json.dumps(
            {"copy_GBps": round(bw, 1), "res": args.res, "cases": results}, indent=1))
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
