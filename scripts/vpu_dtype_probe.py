"""Does the VPU run bf16 arithmetic faster than f32 on this chip?

Context (docs/BENCH.md round-4 bf16 ledger): under bf16 *transport*
(bf16 HBM planes, f32 in-kernel compute) the fused phase kernels run at
the SAME device time as f32 — the on-chip trace shows dye 1549 µs vs
1570, velocity 945 vs 1010 — despite shipping half the bytes. The
kernels are VPU-bound once the DMA halves, so the remaining lever is
VPU element throughput, and the one hardware axis there is dtype:
Mosaic tiles bf16 as (16, 128) packed pairs, so native-bf16 arithmetic
*could* retire 2 lanes/cycle where f32 retires 1.

This probe measures it directly: one Pallas kernel per dtype running a
long chained multiply-add/select DAG on a VMEM-resident block, grid
over enough tiles to amortize, with so many passes per element that DMA
is irrelevant. Reports Gel/s (element-ops/s) per dtype and the ratio.

    python scripts/vpu_dtype_probe.py [--passes 256] [--rows 1024]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=2048, help="total rows (8-mult)")
    p.add_argument("--cols", type=int, default=1024)
    p.add_argument("--tile", type=int, default=256, help="rows per grid step")
    p.add_argument("--passes", type=int, default=256,
                   help="chained element-ops per element per kernel call")
    p.add_argument("--iters", type=int, default=300,
                   help="scan length per timed call — sized so the call "
                        "takes ≫ the tunnel's ~30 ms invocation floor")
    p.add_argument("--mode", type=str, default="fma",
                   choices=["fma", "poly", "select", "cipmix"],
                   help="op mix: pure multiply-add chain, sign-select "
                        "chain, or a CIP-like blend of both")
    args = p.parse_args()

    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()
    from fluid2d_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if jax.default_backend() != "tpu":
        print("needs TPU", file=sys.stderr)
        sys.exit(1)

    def kernel(x_ref, o_ref, *, passes, mode):
        x = x_ref[...]
        dt = x.dtype
        c1 = jnp.asarray(1.000001, dt)
        c2 = jnp.asarray(1e-6, dt)
        acc = x
        def sel(v):
            # bf16 comparisons are unsupported on this target ("Target
            # does not support this comparison"), and an f32-compare i1
            # mask cannot relayout onto bf16's packed (16,128) tiling —
            # so the realistic mixed pattern is: select entirely in the
            # f32 domain, downcast the result.
            if dt == jnp.bfloat16:
                vf = v.astype(jnp.float32)
                return jnp.where(vf > 0, jnp.float32(1.000001),
                                 jnp.float32(-1.000001)).astype(dt)
            return jnp.where(v > 0, c1, -c1)

        if mode == "fma":
            for _ in range(passes):
                acc = acc * c1 + c2
        elif mode == "poly":  # nonlinear — cannot constant-fold
            for _ in range(passes // 3):
                acc = (acc * acc) * c2 + acc * c1
        elif mode == "select":
            for _ in range(passes // 2):
                acc = acc * sel(acc) + c2
        else:  # cipmix: products, adds, selects in CIP-ish proportion
            for _ in range(passes // 4):
                a2 = acc * acc
                acc = (a2 * sel(acc) + acc) * c1 + c2
        o_ref[...] = acc

    rows, cols, t = args.rows, args.cols, args.tile
    grid = rows // t
    results = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.full((rows, cols), 0.5, dtype)
        call = pl.pallas_call(
            functools.partial(kernel, passes=args.passes, mode=args.mode),
            grid=(grid,),
            in_specs=[pl.BlockSpec((t, cols), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((t, cols), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
        )

        @jax.jit
        def loop(x, call=call):
            def body(c, _):
                return call(c), None

            y, _ = jax.lax.scan(body, x, None, length=args.iters)
            return y

        import numpy as np

        def sync(a):
            # block_until_ready does not reliably fence through the axon
            # tunnel (see bench.py) — force a real device→host transfer.
            return float(np.asarray(a[0, 0], np.float32))

        y = loop(x)  # compile + warm
        sync(y)
        t0 = time.perf_counter()
        y = loop(x)
        sync(y)
        sec = time.perf_counter() - t0
        # element-ops: every pass is ~1 vector op per element (fma; the
        # select/cipmix modes count each listed op) — comparability
        # across dtypes is what matters, not the absolute op count.
        per_pass = {"fma": 1.0, "poly": 1.0, "select": 1.0, "cipmix": 1.0}[args.mode]
        elops = rows * cols * args.passes * per_pass * args.iters
        gels = elops / sec / 1e9
        name = jnp.dtype(dtype).name
        results[name] = round(gels, 1)
        print(f"# {name:9s} {args.mode:7s} passes={args.passes} "
              f"{sec*1e3:8.2f} ms  {gels:8.1f} Gel/s", file=sys.stderr)

    ratio = results["bfloat16"] / results["float32"]
    print(json.dumps({"mode": args.mode, "passes": args.passes,
                      "tile": (t, cols), **results,
                      "bf16_over_f32": round(ratio, 3)}))


if __name__ == "__main__":
    main()
