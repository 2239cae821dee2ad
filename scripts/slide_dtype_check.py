"""On-chip check: 1-D sliding-window kernels vs their BlockSpec twins
under a chosen transport dtype.

Complements scripts/dma_window_check.py (which covers the 2-D velocity
window kernels): this drives the dye (c-major slide), SOR, confinement
and 1-D velocity slide kernels — the `_slide_fetch` pipeline whose
row-slice DMAs start at sub-tile offsets under bf16's (16, 128) tiling
(primitive ops validated by scripts/bf16_dma_probe.py; this is the
full-kernel witness on real hardware). Tolerance: bitwise for f32, one
output-dtype ulp for bf16 (FMA-contraction wobble flips the store
rounding — same bound as tests/test_bf16.py).

Run ON THE TPU:
  python scripts/slide_dtype_check.py [--x 256] [--y 512] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--x", type=int, default=256)
    p.add_argument("--y", type=int, default=512)
    p.add_argument("--tile", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.models.simulator import scene_for_dtype
    from fluid2d_tpu.ops.pallas_phases import (
        cip_dye_phase_pallas,
        cip_velocity_phase_pallas,
        confinement_pallas,
    )
    from fluid2d_tpu.ops.pallas_stencil import sor_iteration_pallas
    from fluid2d_tpu.scenes.compile import compile_scene
    from fluid2d_tpu.scenes.scenes import build_scene_arrays

    bc_const, mask, bc_dye = build_scene_arrays(2, args.y)
    scene = compile_scene(bc_const[: args.x], mask[: args.x], bc_dye[: args.x])
    cfg = SimConfig.create(resolution=args.y, scheme="cip", enable_dye=True,
                           dtype=args.dtype)
    scene = scene_for_dtype(scene, cfg)
    dtp = jnp.dtype(args.dtype)

    rng = np.random.default_rng(17)
    shape = (args.x, args.y)

    def mk(*s, scale=1.0):
        return jnp.asarray(
            scale * rng.standard_normal(s, dtype=np.float32)).astype(dtp)

    tol = 0.0 if args.dtype == "float32" else 2.0**-8
    re, dt, dx = 1000.0, 0.05 / args.y, 1.0 / args.y

    def cmp(name, a, b):
        for i, (x, y) in enumerate(zip(a, b)):
            x = np.asarray(x, np.float32)
            y = np.asarray(y, np.float32)
            scale = max(1.0, float(np.abs(x).max()))
            np.testing.assert_allclose(y, x, atol=max(tol * scale, 1e-6 * scale),
                                       rtol=0, err_msg=f"{name}[{i}]")
        exact = all((np.asarray(x) == np.asarray(y)).all() for x, y in zip(a, b))
        print(f"  {name}: slide == blockspec ({'bitwise' if exact else 'ulp-tol'})")

    dye, da = mk(3, *shape), mk(3, *shape)
    dxg, dxa, dyg, dya = (mk(3, *shape, scale=0.1) for _ in range(4))
    vel = mk(2, *shape, scale=0.5)
    run = lambda **kw: jax.jit(  # noqa: E731
        lambda *a: cip_dye_phase_pallas(*a, re, dt, dx, **kw)
    )(dye, da, dxg, dxa, dyg, dya, vel, scene)
    cmp("cip_dye", run(sliding=False, tile_x=args.tile),
        run(sliding=True, tile_x=args.tile))

    v, va = mk(2, *shape, scale=0.5), mk(2, *shape, scale=0.5)
    vx, vxa, vy, vya = (mk(2, *shape, scale=0.1) for _ in range(4))
    pr = mk(*shape, scale=0.3)
    runv = lambda **kw: jax.jit(  # noqa: E731
        lambda *a: cip_velocity_phase_pallas(*a, re, dt, dx, **kw)
    )(v, pr, va, vx, vxa, vy, vya, scene)
    cmp("cip_velocity_1d", runv(sliding=False, tile_x=args.tile),
        runv(sliding=True, tile_x=args.tile))

    runs = lambda **kw: jax.jit(  # noqa: E731
        lambda *a: sor_iteration_pallas(*a, 1.3, dt, dx, n_iters=2,
                                        v_limit=10.0, **kw)
    )(pr, da[0], v[0], v[1], scene.pbc_code, scene.fluid8)
    cmp("sor", runs(sliding=False, tile_x=args.tile),
        runs(sliding=True, tile_x=args.tile))

    runc = lambda **kw: jax.jit(  # noqa: E731
        lambda *a: confinement_pallas(*a, dt, 5.0, dx, **kw)
    )(v, va, scene.fluid8)
    cmp("confinement", runc(sliding=False, tile_x=args.tile),
        runc(sliding=True, tile_x=args.tile))

    from fluid2d_tpu.ops.pallas_phases import (
        mac_dye_phase_pallas,
        mac_velocity_phase_pallas,
    )

    runm = lambda **kw: jax.jit(  # noqa: E731
        lambda *a: mac_velocity_phase_pallas(*a, "kk", re, dt, dx, **kw)
    )(v, pr, va, scene)
    cmp("mac_velocity(kk)", runm(sliding=False, tile_x=args.tile),
        runm(sliding=True, tile_x=args.tile))

    runmd = lambda **kw: jax.jit(  # noqa: E731
        lambda *a: mac_dye_phase_pallas(*a, "kk", dt, dx, **kw)
    )(dye, da, v, scene)
    cmp("mac_dye(kk)", runmd(sliding=False, tile_x=args.tile),
        runmd(sliding=True, tile_x=args.tile))

    print(f"1-D sliding kernels OK on ({args.x}, {args.y}) "
          f"tile={args.tile} dtype={args.dtype}")


if __name__ == "__main__":
    main()
