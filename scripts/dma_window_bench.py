"""Phase-level A/B: DMA-window vs 9-block CIP velocity kernel at res=4096.

Times a `lax.scan` of the velocity phase alone (outputs fed back as
inputs), isolating the window-fetch strategy from the rest of the step.
The end-to-end check is `kernel_variants_bench.py --variant cip-vel-dma`;
this script exists because the full res=4096 step takes ~25 min to
compile per arm while the phase alone compiles in ~2 min.

Run ON THE TPU:
  python scripts/dma_window_bench.py [--res 4096] [--steps 50] [--bc 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def main() -> None:
    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=4096)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--bc", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import fluid2d_tpu.ops.pallas_phases as ph
    from fluid2d_tpu.scenes.compile import get_scene

    scene = get_scene(args.bc, args.res)
    shape = (2 * args.res, args.res)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.standard_normal((2, *shape), dtype=np.float32) * 0.1)
    g = jnp.asarray(rng.standard_normal((4, 2, *shape), dtype=np.float32) * 0.01)
    pr = jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * 0.1)
    re, dt, dx = 1e6, 0.05 / args.res, 1.0 / args.res

    def arm(label, **kw):
        # pr and scene ride as jit ARGUMENTS: closing over them embeds
        # 128 MB of f32 + the scene planes as HLO constants, which the
        # remote-compile tunnel rejects (HTTP 413).
        def one(carry, _, pr, scene):
            v, va, vx, vxa, vy, vya = carry
            out = ph.cip_velocity_phase_pallas(
                v, pr, va, vx, vxa, vy, vya, scene, re, dt, dx, **kw
            )
            return (out[0], out[3], out[1], out[4], out[2], out[5]), None

        @jax.jit
        def run(carry, pr, scene):
            step = lambda c, x: one(c, x, pr, scene)  # noqa: E731
            return jax.lax.scan(step, carry, None, length=args.steps)[0]

        carry = (v, v, g[0], g[1], g[2], g[3])
        out = run(carry, pr, scene)
        float(np.asarray(out[0][0, 0, 0]))  # fence (compile + warmup)
        t0 = time.perf_counter()
        out = run(carry, pr, scene)
        float(np.asarray(out[0][0, 0, 0]))
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"  {label:12s}: {ms:7.2f} ms/phase-call", flush=True)
        return ms

    print(f"CIP velocity phase alone, res={args.res} bc={args.bc} "
          f"({args.steps}-step scan):")
    a = arm("9-block", dma_windows=False)
    b = arm("dma-window", dma_windows=True)
    a2 = arm("9-block(2)", dma_windows=False)  # window-health re-check
    print(f"  dma/9-block: {b / min(a, a2):.3f}")


if __name__ == "__main__":
    main()
