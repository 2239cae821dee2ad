"""Find the chip's best-achievable VPU element rate (the roofline's
VPU-floor denominator).

The first multi-chain probe (utils/profiling.measure_vpu_throughput,
round-5 WIP) measured 622 G weighted-elops/s — but the real cip_dye
kernel retires its counted DAG at ~2,060 G/s, so that probe was
VMEM-bound (8 block-sized accumulators spill every pass), NOT
ALU-bound, and a "floor" built on it lands 3× above the kernels' real
device time (pct_of_geometry_roofline read 329%). A floor needs the
OPTIMISTIC rate: the max weighted-elops/s any configuration achieves.

This sweeps (block rows, chain count, fused-DAG depth) — depth is the
number of fma passes per element between VMEM load and store; at high
depth Mosaic keeps the chunk in vregs across the whole chain, exposing
the ALU-bound rate rather than the 1R+1W VMEM-fed rate.

Accounting matches utils/profiling._jaxpr_vpu_elops: one fma = 2
weighted elops (mul + add are separate jaxpr eqns).

Usage: python scripts/vpu_rate_sweep.py [--iters 50]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def measure(rows, cols, t, nchain, depth, iters=50, dtype=jnp.float32):
    dt = jnp.dtype(dtype)

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        c1 = jnp.asarray(1.000001, dt)
        c2 = jnp.asarray(1e-6, dt)
        accs = [x * jnp.asarray(1.0 + 1e-7 * k, dt) for k in range(nchain)]
        for _ in range(depth // nchain):
            accs = [a * c1 + c2 for a in accs]
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[...] = acc

    call = pl.pallas_call(
        kernel, grid=(rows // t,),
        in_specs=[pl.BlockSpec((t, cols), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((t, cols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, cols), dt),
    )

    @jax.jit
    def loop(x):
        def body(c, _):
            return call(c), None

        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    x = jnp.full((rows, cols), 0.5, dt)
    y = loop(x)
    float(np.asarray(y[0, 0], np.float32))
    t0 = time.perf_counter()
    y = loop(x)
    float(np.asarray(y[0, 0], np.float32))
    sec = time.perf_counter() - t0
    # Weighted elops per element: depth fmas (2 each) + nchain init muls
    # + nchain−1 merge adds.
    elops = rows * cols * (2 * (depth // nchain) * nchain + 2 * nchain - 1) * iters
    return elops / sec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", type=str, default="float32")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}")

    best = None
    rows, cols = 2048, 1024
    for t in (8, 32, 256):
        for nchain in (1, 4, 8):
            for depth in (64, 256, 1024):
                if depth % nchain:
                    continue
                r = measure(rows, cols, t, nchain, depth, args.iters,
                            args.dtype)
                tag = f"t={t:4d} chains={nchain} depth={depth:5d}"
                print(f"{tag}: {r / 1e9:8.1f} G weighted-elops/s")
                if best is None or r > best[0]:
                    best = (r, tag)
    print(f"BEST: {best[1]} → {best[0] / 1e9:.1f} G/s")
