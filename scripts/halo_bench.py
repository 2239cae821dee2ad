"""Measure the halo path's per-shard overhead on ONE real chip.

VERDICT r1 item #4: multi-chip hardware is unavailable here, but the
ghost-window design's cost decomposes into pieces a single chip CAN
measure:

  T_multichip_step ≈ T_step(X_loc + 2h slab)  +  T_exchange

* The first term — the full step on a ghost-EXTENDED slab (redundant
  ghost-zone compute included) — is timed directly below, against the
  plain X_loc slab for the overhead ratio.
* The exchange is two ppermute shifts of h rows per state field per
  step over ICI (exactly what ``exchange_ghosts`` ships: h rows per
  link per direction — VERDICT r2 item #4 halved this from 2h); the
  byte volume is computed from that formula and converted to time over
  a SENSITIVITY BAND of assumed per-direction ICI bandwidths
  {low: 45, mid: 90, high: 180} GB/s — the mid point is the
  "How to Scale Your Model"-class v5p figure, the band covers protocol
  inefficiency (low) and full-duplex overlap (high). The exchange
  overlaps with nothing in the current schedule, so it is added in full
  (pessimistic), and send+recv are serialized in the formula (also
  pessimistic for full-duplex links).

Usage: python scripts/halo_bench.py [--res 4096] [--devices 8] [--steps 30]
Writes the projection JSON to stdout; BENCH.md records the derivation.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def slice_rows(tree, rows: int):
    """First `rows` X-rows of every grid leaf (ndim ≥ 2)."""
    return jax.tree.map(
        lambda a: a[..., :rows, :] if getattr(a, "ndim", 0) >= 2 else a, tree
    )


def time_step_on(cfg, scene_slab, steps: int) -> float:
    import jax.numpy as jnp

    from fluid2d_tpu.models.simulator import step_fn_for
    from fluid2d_tpu.state import init_state

    step = step_fn_for(cfg)

    @jax.jit
    def run(state):
        # 2 steps/iteration, matching the production run fn (the 1-step
        # body pays per-iteration carry copies — see make_run_fn).
        def body(st, _):
            return step(step(st, scene_slab), scene_slab), None

        out, _ = jax.lax.scan(body, state, None, length=steps // 2)
        return out

    state = init_state(scene_slab, cfg)
    state = jax.tree.map(
        lambda a: a if a is None or a.ndim < 2 else a + jnp.zeros((), a.dtype),
        state,
    )
    out = run(state)
    float(np.asarray(out.v[0, 0, 0]))
    t0 = time.perf_counter()
    out = run(state)
    float(np.asarray(out.v[0, 0, 0]))
    return (time.perf_counter() - t0) / steps


def time_window_build(res: int, devices: int, h: int, iters: int = 200) -> dict:
    """Per-step cost of building the ghost WORKING WINDOWS (the local
    concat work in exchange_ghosts, exclusive of the ppermute wire time),
    for the old where-select form vs the shipped lax.switch form
    (VERDICT r3 item #8) — replicated single-device: neighbor strips are
    precomputed arrays, the build runs over a full 32-channel state-sized
    pytree per iteration."""
    import jax.numpy as jnp

    x_loc, y = 2 * res // devices, res
    chans = 32
    arr = jnp.ones((chans, x_loc, y), jnp.float32)
    from_prev = jnp.full((chans, h, y), 2.0, jnp.float32)
    from_next = jnp.full((chans, h, y), 3.0, jnp.float32)

    def build_where(arr, idx):
        fill_shape = (chans, h, y)
        fill_bot = jnp.broadcast_to(from_next[:, -1:, :], fill_shape)
        fill_top = jnp.broadcast_to(from_prev[:, :1, :], fill_shape)
        first = jnp.concatenate([arr, from_next, fill_bot], axis=-2)
        mid = jnp.concatenate([from_prev, arr, from_next], axis=-2)
        last = jnp.concatenate([fill_top, from_prev, arr], axis=-2)
        return jnp.where(idx == 0, first, jnp.where(idx == devices - 1, last, mid))

    def build_switch(arr, idx):
        import jax

        def first():
            fill = jnp.broadcast_to(from_next[:, -1:, :], (chans, h, y))
            return jnp.concatenate([arr, from_next, fill], axis=-2)

        def mid():
            return jnp.concatenate([from_prev, arr, from_next], axis=-2)

        def last():
            fill = jnp.broadcast_to(from_prev[:, :1, :], (chans, h, y))
            return jnp.concatenate([fill, from_prev, arr], axis=-2)

        pos = (idx > 0).astype(jnp.int32) + (idx == devices - 1).astype(jnp.int32)
        return jax.lax.switch(pos, [first, mid, last])

    out = {}
    for label, fn in (("where_select", build_where), ("lax_switch", build_switch)):
        @jax.jit
        def loop(a, idx, fn=fn):
            def body(c, _):
                w = fn(c, idx)
                return w[:, h : h + x_loc, :], None

            o, _ = jax.lax.scan(body, a, None, length=iters)
            return o

        idx = jnp.int32(1)  # interior device: the hot case
        o = loop(arr, idx)
        float(np.asarray(o[0, 0, 0]))
        t0 = time.perf_counter()
        o = loop(arr, idx)
        float(np.asarray(o[0, 0, 0]))
        out[f"window_build_ms[{label}]"] = round(
            (time.perf_counter() - t0) / iters * 1e3, 3)
    return out


def main() -> None:
    from fluid2d_tpu.utils.cache import enable_compile_cache
    from fluid2d_tpu.utils.tpu_flags import raise_scoped_vmem

    raise_scoped_vmem()

    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--res", type=int, default=4096)
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--window-build", action="store_true",
                        help="ONLY time the ghost-window build forms "
                             "(old where-select vs lax.switch)")
    parser.add_argument("--ici-GBps", type=float, nargs=3, default=[45.0, 90.0, 180.0],
                        metavar=("LOW", "MID", "HIGH"),
                        help="assumed per-direction ICI bandwidth band (GB/s)")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="transport dtype: bf16 halves BOTH the slab "
                             "step's HBM bytes and the exchange volume")
    args = parser.parse_args()

    if args.window_build:
        from fluid2d_tpu.config import SimConfig
        from fluid2d_tpu.parallel.halo import ghost_width

        cfg = SimConfig.create(resolution=args.res, scheme="cip",
                               vor_eps=5.0, enable_dye=True)
        rep = {"res": args.res, "devices": args.devices,
               "ghost_width": ghost_width(cfg)}
        rep |= time_window_build(args.res, args.devices, ghost_width(cfg))
        print(json.dumps(rep))
        return

    from fluid2d_tpu.config import SimConfig
    from fluid2d_tpu.parallel.halo import ghost_width
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import SimState, init_state

    cfg = SimConfig.create(resolution=args.res, re=1e6, scheme="cip",
                           vor_eps=5.0, enable_dye=True, dtype=args.dtype)
    h = ghost_width(cfg)
    x_rows = 2 * args.res
    x_loc = x_rows // args.devices
    from fluid2d_tpu.models.simulator import scene_for_dtype

    scene = scene_for_dtype(get_scene(3, args.res), cfg)  # BASELINE #5 sweep

    t_plain = time_step_on(cfg, slice_rows(scene, x_loc), args.steps)
    t_ext = time_step_on(cfg, slice_rows(scene, x_loc + 2 * h), args.steps)

    # Exchange bytes: per step each interior device ppermutes h rows in
    # each direction for every carried grid channel — the exact volume
    # exchange_ghosts ships (parallel/halo.py: top/bot strips are h rows;
    # the end windows pad with replicated filler, no second strip).
    state = init_state(slice_rows(scene, x_loc), cfg)
    channels = sum(
        (1 if leaf.ndim == 2 else leaf.shape[0])
        for name, leaf in zip(SimState._fields, state)
        if leaf is not None and getattr(leaf, "ndim", 0) >= 2
    )
    itemsize = 2 if args.dtype == "bfloat16" else 4
    exch_bytes = 2 * h * args.res * itemsize * channels  # h rows, both dirs

    low, mid, high = args.ici_GBps
    proj = {}
    for label, bw in (("low", low), ("mid", mid), ("high", high)):
        t_comm = exch_bytes / (bw * 1e9)
        proj[label] = {
            "assumed_ici_GBps": bw,
            "exchange_ms_per_step": round(t_comm * 1e3, 3),
            "projected_steps_per_sec": round(1.0 / (t_ext + t_comm), 1),
        }
    print(json.dumps({
        "res": args.res,
        "devices": args.devices,
        "ghost_width": h,
        "x_loc": x_loc,
        "ms_per_step_plain_slab": round(t_plain * 1e3, 2),
        "ms_per_step_ghost_slab": round(t_ext * 1e3, 2),
        "ghost_compute_overhead_pct": round(100 * (t_ext / t_plain - 1), 1),
        "state_channels_exchanged": channels,
        "exchange_MB_per_step": round(exch_bytes / 2**20, 1),
        "projection": proj,
    }))


if __name__ == "__main__":
    main()
