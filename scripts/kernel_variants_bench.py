"""A/B kernel-layout variants end-to-end (docs/BENCH.md ledger entries).

Each variant swaps ONE phase kernel's layout via its keyword switch and
times the FULL production step (make_run_fn, 2-step scan body) — layout
experiments are only meaningful end-to-end: Pallas pipelining, DMA
dedup, and Mosaic scheduling all change with the grid shape
(docs/BENCH.md: the dye channel grid won 13% in 1-D and lost 15% in
2-D at a different resolution).

Variants (each documented by its ledger entry in docs/BENCH.md):
  mac-dye-cgrid     (n_t, 3) c-minor MAC dye kernel vs channel-folded
  cip-vel-cgrid     (n_t, 2) c-minor CIP velocity kernel vs folded/2-D
  cip-dye-storder   early vs late output stores in the CIP dye body
  cip-dye-tile      dye tile_x sweep vs the auto pick (--tiles)
  cip-vel-tile      velocity tile_x sweep vs the auto pick (--tiles)
  cip-dye-win       element-offset windows vs halo triples (dye)
  cip-vel-win       element-offset windows vs halo triples (velocity)
  cip-dye-slide     sliding-window vs triple-fetch dye (128-aligned Y)
  cip-dye-sub       DMA subtile count in the sliding dye kernel
  cip-vel-slide     row-sliding vs full-window 2-D velocity (--force-tile2d)
  cip-vel-slide1d   1-D sliding velocity vs folded triples (128-aligned Y)
  cip-vel-dma       DMA-window vs 9-block 2-D velocity assembly
  sor-fuse          fused-pair SOR kernel vs the chained default

Usage:
  python scripts/kernel_variants_bench.py --variant mac-dye-cgrid \
      --res 1600 --scheme kk --steps 400
  python scripts/kernel_variants_bench.py --variant cip-vel-cgrid \
      --res 4096 --steps 60 [--bc 3]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def time_full_run(cfg, scene, steps: int) -> float:
    from fluid2d_tpu.models.simulator import make_run_fn
    from fluid2d_tpu.state import init_state

    run = make_run_fn(cfg)
    state = init_state(scene, cfg)
    state = run(state, scene, steps)
    # Fence with a ONE-element device→host transfer: np.asarray(state.v)
    # would ship the whole ~41 MB field through the tunnel inside the
    # timed region (~1.7 s at res=1600 — it halved both arms' rates in
    # the first cip-vel A/B before this fix).
    float(np.asarray(state.v[0, 0, 0]))
    state = init_state(scene, cfg)
    t0 = time.perf_counter()
    state = run(state, scene, steps)
    float(np.asarray(state.v[0, 0, 0]))
    elapsed = time.perf_counter() - t0
    if not np.isfinite(np.asarray(state.v)).all():
        msg = "non-finite fields — variant result is invalid"
        raise RuntimeError(msg)
    return steps / elapsed


def _cip_dye_body_latestore(
    ti, n_t, re, dt, dx, win, vctx, inflowe, nwe, fluid,
    d_out, dx_out, dy_out, dna_out, dxna_out, dyna_out, cs, oc=0,
):
    """The pre-reorder dye body: all six stores at the end (A/B arm)."""
    import jax.numpy as jnp

    import fluid2d_tpu.ops.pallas_phases as ph
    from fluid2d_tpu.ops.limiters import clamp_field
    from fluid2d_tpu.ops.pallas_stencil import cip_advect_window_expr

    nw_mid = nwe != 0
    nw_in = nw_mid[1:-1]
    de, bcde, dae = win("d", 3), win("bcd", 3), win("da", 2)
    dxe, dxae = win("dx", 1), win("dxa", 1)
    dye_, dyae = win("dy", 1), win("dya", 1)
    dc = ph._reclamp(jnp.where(inflowe != 0, bcde, de), ti, n_t, 3)
    d_na = jnp.where(nw_mid, dc[1:-1] + (ph._lap_window(dc, dx) / re) * dt, dae)
    d_na = ph._reclamp(d_na, ti, n_t, 2)
    delta = d_na - dc[1:-1]
    gx_na = ph._reclamp(
        jnp.where(nw_in, ph._grad_update_window(dxe, delta, "x", dx), dxae), ti, n_t, 1)
    gy_na = ph._reclamp(
        jnp.where(nw_in, ph._grad_update_window(dye_, delta, "y", dx), dyae), ti, n_t, 1)
    fn, fxn, fyn = cip_advect_window_expr(
        d_na[1:-1], gx_na, gy_na, None, None, dt, dx, ctx=vctx)
    d_out[oc] = clamp_field(jnp.where(fluid, cs(fn), cs(dc[3:-3])), 0.0, 1.0)
    dx_out[oc] = jnp.where(fluid, cs(fxn), cs(dxe[1:-1]))
    dy_out[oc] = jnp.where(fluid, cs(fyn), cs(dye_[1:-1]))
    dna_out[oc] = cs(d_na[2:-2])
    dxna_out[oc] = cs(gx_na[1:-1])
    dyna_out[oc] = cs(gy_na[1:-1])


def main() -> None:
    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--variant", required=True,
                   choices=["mac-dye-cgrid", "cip-vel-cgrid",
                            "cip-dye-storder", "cip-dye-tile", "cip-vel-dma",
                            "cip-dye-win", "cip-vel-win", "cip-dye-slide",
                            "cip-vel-slide", "cip-vel-slide1d", "cip-dye-sub",
                            "cip-vel-tile", "cip-vel-auto-vs-2dslide",
                            "sor-fuse", "cip-dye-maskscratch"])
    p.add_argument("--res", type=int, default=1600)
    p.add_argument("--scheme", type=str, default="")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--bc", type=int, default=2)
    p.add_argument("--tiles", type=str, default="32,40,48",
                   help="comma list of tile_x values for cip-dye-tile")
    p.add_argument("--force-tile2d", type=str, default=None,
                   help="T,TY tile override for the cip-vel-slide arm")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="transport dtype for every arm (A/B bf16 layouts)")
    p.add_argument("--force-tile", type=int, default=None,
                   help="pass tile_x to the variant arm (bypass the VMEM "
                        "cost model — Mosaic may still refuse to compile)")
    args = p.parse_args()

    import fluid2d_tpu.ops.pallas_phases as ph
    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.scenes.compile import get_scene

    from fluid2d_tpu.models.simulator import scene_for_dtype

    scheme = args.scheme or ("kk" if args.variant == "mac-dye-cgrid" else "cip")
    cfg = SimConfig.create(resolution=args.res, re=1e6, scheme=scheme,
                           vor_eps=5.0, enable_dye=True, dtype=args.dtype)
    scene = scene_for_dtype(get_scene(args.bc, args.res), cfg)

    def report(label, thunk):
        try:
            rate = thunk()
            print(f"{args.variant} res={args.res} {scheme} {label:12s}: "
                  f"{rate:8.2f} steps/s", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue the A/B
            print(f"{args.variant} res={args.res} {scheme} {label:12s}: "
                  f"FAILED ({type(e).__name__}: {e})", flush=True)

    if args.variant == "sor-fuse":
        # Re-probe of the round-2 fused-pair SOR rejection (143.3 vs
        # 146.8 at the then-default 16 MiB scoped-VMEM limit): the raised
        # limit moved every other tile frontier, so the fused kernel's
        # depth-6 windows may now fit tiles large enough to win.
        import dataclasses

        for rnd in range(2):
            for label, fuse in (("chained", 1), ("fused2", 2)):
                c = dataclasses.replace(cfg, sor_fuse=fuse)
                report(f"{label} r{rnd}",
                       lambda c=c: time_full_run(c, scene, args.steps))
        return

    if args.variant == "cip-dye-storder":
        # Arms differ only in where the dye body stores its outputs; the
        # kernel resolves _cip_dye_body as a module global, so patch it.
        orig_body = ph._cip_dye_body
        report("early-store", lambda: time_full_run(cfg, scene, args.steps))
        ph._cip_dye_body = _cip_dye_body_latestore
        report("late-store", lambda: time_full_run(cfg, scene, args.steps))
        ph._cip_dye_body = orig_body
        return

    if args.variant == "cip-dye-maskscratch":
        # Hoist the channel-independent int mask window assembly (i8 _ext
        # + i32 widen) into per-tile VMEM scratch at c == 0 — the dye
        # kernel is VPU-bound under bf16, and each of the 2 extra channel
        # programs pays ~8 full-window passes re-deriving masks.
        import fluid2d_tpu.models.cip as mod

        orig = ph.cip_dye_phase_pallas
        for rnd in range(2):
            mod.cip_dye_phase_pallas = functools.partial(orig, mask_scratch=False)
            report(f"per-prog r{rnd}",
                   lambda: time_full_run(cfg, scene, args.steps))
            mod.cip_dye_phase_pallas = functools.partial(orig, mask_scratch=True)
            report(f"scratch r{rnd}",
                   lambda: time_full_run(cfg, scene, args.steps))
        mod.cip_dye_phase_pallas = orig
        return

    if args.variant == "cip-dye-tile":
        import fluid2d_tpu.models.cip as mod

        orig = ph.cip_dye_phase_pallas
        report("auto", lambda: time_full_run(cfg, scene, args.steps))
        for t in (int(s) for s in args.tiles.split(",")):
            mod.cip_dye_phase_pallas = functools.partial(orig, tile_x=t)
            report(f"t={t}", lambda: time_full_run(cfg, scene, args.steps))
        mod.cip_dye_phase_pallas = orig
        return

    if args.variant == "cip-vel-tile":
        import fluid2d_tpu.models.cip as mod

        orig = ph.cip_velocity_phase_pallas
        report("auto", lambda: time_full_run(cfg, scene, args.steps))
        for t in (int(s) for s in args.tiles.split(",")):
            mod.cip_velocity_phase_pallas = functools.partial(orig, tile_x=t)
            report(f"t={t}", lambda: time_full_run(cfg, scene, args.steps))
        mod.cip_velocity_phase_pallas = orig
        return

    if args.variant == "cip-dye-win":
        # Element-offset window inputs vs halo triples in the 1-D
        # channel-grid dye kernel (interleaved: both arms see the same
        # tunnel window).
        import fluid2d_tpu.models.cip as mod

        orig = ph.cip_dye_phase_pallas
        for rnd in range(2):
            for label, flag in (("triples", False), ("windows", True)):
                mod.cip_dye_phase_pallas = functools.partial(
                    orig, window_inputs=flag)
                report(f"{label} r{rnd}", lambda: time_full_run(cfg, scene, args.steps))
        mod.cip_dye_phase_pallas = orig
        return

    if args.variant == "cip-dye-slide":
        # Sliding-window dye kernel (c-major, ~1x halo amplification) vs
        # the c-minor triple-fetch kernel, at a 128-aligned lane width.
        import fluid2d_tpu.models.cip as mod

        orig = ph.cip_dye_phase_pallas
        for rnd in range(2):
            for label, flag in (("triples", False), ("sliding", True)):
                mod.cip_dye_phase_pallas = functools.partial(orig, sliding=flag)
                report(f"{label} r{rnd}", lambda: time_full_run(cfg, scene, args.steps))
        mod.cip_dye_phase_pallas = orig
        return

    if args.variant == "cip-vel-win":
        import fluid2d_tpu.models.cip as mod

        orig = ph.cip_velocity_phase_pallas
        for rnd in range(2):
            for label, flag in (("triples", False), ("windows", True)):
                mod.cip_velocity_phase_pallas = functools.partial(
                    orig, window_inputs=flag)
                report(f"{label} r{rnd}", lambda: time_full_run(cfg, scene, args.steps))
        mod.cip_velocity_phase_pallas = orig
        return

    if args.variant == "cip-vel-dma":
        # DMA-window vs 9-block window assembly in the 2-D velocity
        # kernel (only dispatched at 128-aligned lane widths, res=4096).
        import fluid2d_tpu.models.cip as mod

        orig = ph.cip_velocity_phase_pallas
        for label, flag in (("9-block", False), ("dma-window", True)):
            mod.cip_velocity_phase_pallas = functools.partial(
                orig, dma_windows=flag, dma_slide=False)
            report(label, lambda: time_full_run(cfg, scene, args.steps))
        mod.cip_velocity_phase_pallas = orig
        return

    if args.variant == "cip-dye-sub":
        # Subtiles in the sliding dye kernel: T = sub·t DMA chunks with
        # t-row compute passes (interleaved rounds).
        import fluid2d_tpu.models.cip as mod

        orig = ph.cip_dye_phase_pallas
        for rnd in range(2):
            for sub in (1, 2):
                mod.cip_dye_phase_pallas = functools.partial(
                    orig, sliding=True, subtiles=sub)
                report(f"sub={sub} r{rnd}", lambda: time_full_run(cfg, scene, args.steps))
        mod.cip_dye_phase_pallas = orig
        return

    if args.variant == "cip-vel-slide1d":
        # 1-D sliding-window velocity kernel vs the folded triple-fetch
        # one, at a 128-aligned lane width where the 1-D path is
        # feasible (interleaved rounds).
        import fluid2d_tpu.models.cip as mod

        orig = ph.cip_velocity_phase_pallas
        for rnd in range(2):
            for label, flag in (("triples", False), ("sliding", True)):
                mod.cip_velocity_phase_pallas = functools.partial(orig, sliding=flag)
                report(f"{label} r{rnd}", lambda: time_full_run(cfg, scene, args.steps))
        mod.cip_velocity_phase_pallas = orig
        return

    if args.variant == "cip-vel-slide":
        # Row-sliding vs full-window DMA fetch in the 2-D velocity
        # kernel (interleaved rounds: both arms see the same tunnel
        # window). Optional --force-tile2d T,TY pins the slide arm's tile.
        import fluid2d_tpu.models.cip as mod

        orig = ph.cip_velocity_phase_pallas
        tile2d = (tuple(int(x) for x in args.force_tile2d.split(","))
                  if args.force_tile2d else None)

        def slide_arm(*a, interpret=False):
            return ph._cip_velocity_phase_2d_slide(*a, tile=tile2d,
                                                   interpret=interpret)

        label_s = f"sliding {tile2d or '(auto)'}"
        for rnd in range(2):
            for label, fn in (("full-win", functools.partial(orig, dma_slide=False)),
                              (label_s, slide_arm)):
                mod.cip_velocity_phase_pallas = fn
                report(f"{label} r{rnd}", lambda: time_full_run(cfg, scene, args.steps))
        mod.cip_velocity_phase_pallas = orig
        return

    if args.variant == "cip-vel-auto-vs-2dslide":
        # The auto dispatch (at the 64 MiB arena: the 1-D triple kernel,
        # t=16 at Y=4096 — the t<=8 guard no longer routes to 2-D) vs
        # the forced row-sliding 2-D kernel. Round-4 question: the
        # ledger's 1-D-loses measurement pinned t=8; t=16 was never
        # compared.
        import fluid2d_tpu.models.cip as mod

        orig = ph.cip_velocity_phase_pallas

        def slide_arm(*a, interpret=False):
            return ph._cip_velocity_phase_2d_slide(*a, interpret=interpret)

        for rnd in range(2):
            for label, fn in (("auto(1-D)", orig), ("2d-slide", slide_arm)):
                mod.cip_velocity_phase_pallas = fn
                report(f"{label} r{rnd}", lambda: time_full_run(cfg, scene, args.steps))
        mod.cip_velocity_phase_pallas = orig
        return

    if args.variant == "mac-dye-cgrid":
        import fluid2d_tpu.models.mac as mod

        orig, attr = ph.mac_dye_phase_pallas, "mac_dye_phase_pallas"
    else:
        import fluid2d_tpu.models.cip as mod

        orig, attr = ph.cip_velocity_phase_pallas, "cip_velocity_phase_pallas"

    for label, flag in (("baseline", False), ("channel_grid", True)):
        kw = {"channel_grid": flag}
        if flag and args.force_tile:
            kw["tile_x"] = args.force_tile
            label = f"cgrid t={args.force_tile}"
        setattr(mod, attr, functools.partial(orig, **kw))
        report(label, lambda: time_full_run(cfg, scene, args.steps))
    setattr(mod, attr, orig)


if __name__ == "__main__":
    main()
