"""Performance measurement: step timing, roofline accounting, traces.

SURVEY.md §5 notes the reference has no profiling at all; the BASELINE
asks the stencil path to be measured against the HBM roofline. Absolute
spec sheets lie about remote/tunneled chips, so the roofline here is
*measured*: the achievable elementwise HBM bandwidth is benchmarked on
the same device (scan-amortized, large arrays), and the step's minimal
byte traffic is derived from the state layout — % of roofline is then
(minimal bytes / step time) / achievable bandwidth.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from fluid2d_tpu.config import SimConfig
from fluid2d_tpu.state import SimState

__all__ = [
    "sync",
    "time_steps",
    "measure_hbm_bandwidth",
    "measure_vpu_throughput",
    "collect_pallas_elops",
    "step_min_bytes",
    "roofline_report",
    "trace",
]


def sync(state: SimState) -> None:
    """Fence execution with a real device→host transfer
    (``block_until_ready`` alone does not fence remote-tunnel runtimes)."""
    float(np.asarray(state.v.ravel()[0]))


def time_steps(run, state, scene, n: int) -> tuple[float, SimState]:
    """Seconds per step for a compiled `run(state, scene, n)`; compiles
    on a warmup call with the same static n."""
    state = run(state, scene, n)
    sync(state)
    t0 = time.perf_counter()
    state = run(state, scene, n)
    sync(state)
    return (time.perf_counter() - t0) / n, state


def measure_hbm_bandwidth(mbytes: int = 320, iters: int = 2000) -> float:
    """Achievable streaming HBM bandwidth (bytes/s, 1R+1W) on the current
    default device: a Pallas copy kernel, scan-amortized over enough
    iterations to swamp the tunnel's per-invocation latency floor
    (~30 ms observed on the axon runtime — short timings are meaningless
    there).

    **The working set must exceed VMEM** (round-4 correction,
    docs/BENCH.md "The 2.6 TB/s denominator was VMEM"): the previous
    40 MB default let the scan-carried array stay VMEM-resident across
    iterations and measured 2.6 TB/s — 3× the chip's HBM spec. At
    320 MB (in+out) the same kernel settles at ~305 GB/s, which is the
    honest streaming denominator. Pass ``mbytes=40`` to reproduce the
    resident figure."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    y = 2048
    x = max(64, (mbytes * 2**20 // 2 // 4 // y) // 64 * 64)
    f = jnp.ones((x, y), jnp.float32)
    t = 64
    # ≥ ~0.6 TB per timed call: swamps the tunnel's invocation floor
    # without multi-minute runs at large working sets.
    iters = min(iters, max(200, int(6e11 / (2 * f.size * 4))))

    if jax.default_backend() != "tpu":
        # Non-TPU backends can't compile Pallas (and interpret mode would
        # time the interpreter, not memory). Fall back to a jitted XLA
        # elementwise pass — an APPROXIMATE denominator that keeps
        # roofline_report usable on CPU hosts; with a buffer this small
        # it largely measures cache, not DRAM, bandwidth
        # (roofline_report labels the result accordingly).
        @jax.jit
        def xla_loop(f):
            out, _ = jax.lax.scan(lambda c, _: (c + 1.0, None), f, None, length=iters)
            return out

        out = xla_loop(f)
        float(np.asarray(out[0, 0]))
        t0 = time.perf_counter()
        out = xla_loop(f)
        float(np.asarray(out[0, 0]))
        return 2 * f.size * 4 / ((time.perf_counter() - t0) / iters)

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    copy1 = pl.pallas_call(
        copy_kernel,
        grid=(x // t,),
        in_specs=[pl.BlockSpec((t, y), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t, y), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x, y), jnp.float32),
    )

    @jax.jit
    def loop(f):
        def body(c, _):
            return copy1(c), None

        out, _ = jax.lax.scan(body, f, None, length=iters)
        return out

    out = loop(f)
    float(np.asarray(out[0, 0]))
    t0 = time.perf_counter()
    out = loop(f)
    float(np.asarray(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    return 2 * f.size * 4 / dt


# --- per-kernel mix ceilings --------------------------------------------------
#
# Each production kernel's DMA throughput is gated by its OPERAND
# GEOMETRY (stream mix, block depth, grid structure), not by the 1R+1W
# copy rate — measured by no-op twins with the same BlockSpec structure
# (scripts/dma_geometry_sweep.py). These descriptors mirror the real
# kernels' spec lists; `measure_mix_ceiling` builds the twin at the
# kernel's dispatched tile and the real grid size (so the working set
# exceeds VMEM like the real kernel's) and times it scan-amortized.
# f32 inputs: ("t", lead) halo triple / ("c", lead) center block; int8
# inputs: ("t8"/"c8", lead). Outputs: a list of leads. grid: "1d" for
# (n_t,), "cg" for the (n_t, 3) channel grid ("c" leads index it).

_KERNEL_MIXES: dict[str, dict] = {
    "cip_dye": {
        "grid": "cg",
        "ins": [("t", "c")] * 6 + [("t", 2), ("t", "c"), ("t8", None), ("t8", None),
                ("c8", None)],
        "outs": ["c"] * 6,
    },
    "cip_velocity": {
        "grid": "1d",
        "ins": [("t", 2), ("t", None)] + [("t", 2)] * 5
        + [("t8", None), ("t", 2), ("t8", None), ("c8", None)],
        "outs": [2] * 6,
    },
    "sor_x1": {
        "grid": "1d",
        "ins": [("t", None)] * 4 + [("t8", None)] * 2,
        "outs": [None, None, 2],  # final iteration carries the limited velocity
    },
    "sor_x2": {
        "grid": "1d",
        "ins": [("t", None)] * 4 + [("t8", None)] * 2,
        "outs": [None, None],
    },
    "jacobi_x1": {
        "grid": "1d",
        "ins": [("t", None)] * 4 + [("t8", None)] * 2,
        "outs": [None, None],
    },
    "jacobi_x2": {
        "grid": "1d",
        "ins": [("t", None)] * 4 + [("t8", None)] * 2,
        "outs": [None, None, 2],  # default: limiter folds into the one kernel
    },
    "confinement": {
        "grid": "1d",
        "ins": [("t", 2), ("c", 2), ("t8", None)],
        "outs": [2],
    },
    "mac_velocity": {
        "grid": "1d",
        "ins": [("t", 2), ("t", None), ("c", 2), ("t8", None), ("t", 2), ("c8", None)],
        "outs": [2, 2],
    },
    "mac_dye": {
        "grid": "1d",
        "ins": [("t", 3), ("c", 2), ("c", 3), ("t", 3), ("t8", None), ("c8", None)],
        "outs": [3, 3],
    },
}


# Sliding-fetch twins (the res=4096 dispatch): same manual-DMA geometry
# as the real kernels — per-plane make_async_copy into double-buffered
# VMEM windows via ops.pallas_stencil._slide_fetch, full fetch at ti==0,
# t new rows per interior tile. `arrays` lists the f32 HBM plane arrays
# (lead None → (X, Y); int lead → (lead, X, Y); "c" → one channel of a
# (chans, X, Y) array per program — c-major grids only). The velocity
# 2-D row-sliding kernel has its own twin (measure_slide2d_ceiling).

_SLIDE_MIXES: dict[str, dict] = {
    "sor_x1": {"grid": "1d", "arrays": [None] * 4, "f32_centers": [],
               "i8_triples": 2, "i8_centers": 0, "outs": [None, None, 2]},
    "sor_x2": {"grid": "1d", "arrays": [None] * 4, "f32_centers": [],
               "i8_triples": 2, "i8_centers": 0, "outs": [None, None]},
    "confinement": {"grid": "1d", "arrays": [2], "f32_centers": [2],
                    "i8_triples": 1, "i8_centers": 0, "outs": [2]},
    "mac_velocity": {"grid": "1d", "arrays": [2, None, 2],
                     "f32_centers": [2], "i8_triples": 1, "i8_centers": 1,
                     "outs": [2, 2]},
    "mac_dye": {"grid": "1d", "arrays": [3, 3], "f32_centers": [2, 3],
                "i8_triples": 1, "i8_centers": 1, "outs": [3, 3]},
    # c-major dye: grid (chans, n_t); 9 planes per program — 7 of the
    # channel's arrays + the 2-channel velocity (re-streamed per channel)
    "cip_dye": {"grid": "cmaj", "arrays": ["c"] * 7 + [2],
                "f32_centers": [], "i8_triples": 2, "i8_centers": 1,
                "outs": ["c"] * 6},
}


def slide_bytes(name: str, x_rows: int, y_cols: int, t: int) -> int | None:
    """Bytes per call implied by kernel `name`'s registered SLIDING plane
    layout — must equal the real kernel's `log_traffic` figure at the
    same grid/tile (guarded by tests). None for unregistered kernels."""
    import fluid2d_tpu.ops.pallas_stencil as ps

    desc = _SLIDE_MIXES.get(name)
    if desc is None:
        return None
    chans = 3
    n_t = x_rows // t
    rows = t + 2 * ps._HB
    slide_rows = rows + (n_t - 1) * t
    sweeps = chans if desc["grid"] == "cmaj" else 1
    nplanes = sum(1 if ld in (None, "c") else ld for ld in desc["arrays"])
    nbytes = nplanes * slide_rows * y_cols * 4 * sweeps
    for ld in desc["f32_centers"]:
        nbytes += ps.center_bytes(x_rows, y_cols, ld) * sweeps
    nbytes += desc["i8_triples"] * (x_rows + 2 * ps._HB * n_t) * y_cols * sweeps
    nbytes += desc["i8_centers"] * x_rows * y_cols * sweeps
    nbytes += sum(ps.center_bytes(x_rows, y_cols, chans if ld == "c" else ld)
                  for ld in desc["outs"])
    return nbytes


def measure_slide_ceiling(name: str, x_rows: int, y_cols: int, t: int,
                          iters: int | None = None) -> tuple[float, int] | None:
    """Measured DMA ceiling for a SLIDING-fetch kernel's geometry: a
    no-op twin that reproduces the manual-DMA window pipeline (full
    fetch at ti==0, t new rows per interior tile, head rows carried
    across slots on the copy engine) over the registered plane layout,
    then consumes everything with a full reduction. Returns
    (bytes/s, bytes/call) or None when unregistered / not on TPU."""
    import fluid2d_tpu.ops.pallas_stencil as ps
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    desc = _SLIDE_MIXES.get(name)
    if desc is None or jax.default_backend() != "tpu":
        return None
    n_t = x_rows // t
    if n_t < 2 or x_rows % t or y_cols % ps._HY:
        return None
    cmaj = desc["grid"] == "cmaj"
    chans = 3
    rows = t + 2 * ps._HB
    leads = desc["arrays"]
    nplanes = sum(1 if ld in (None, "c") else ld for ld in leads)

    def shape(ld):
        if ld == "c":
            return (chans, x_rows, y_cols)
        if ld is None:
            return (x_rows, y_cols)
        return (ld, x_rows, y_cols)

    trip = ps._halo_triple_specs_cgrid2 if cmaj else ps._halo_triple_specs
    cent = ps._center_spec_cgrid2 if cmaj else ps._center_spec

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [any_spec] * len(leads)
    args = [jnp.full(shape(ld), a + 1.0, jnp.float32)
            for a, ld in enumerate(leads)]
    for ld in desc["f32_centers"]:
        in_specs.append(cent(t, y_cols, ld))
        args.append(jnp.full(shape(ld), 0.5, jnp.float32))
    for _ in range(desc["i8_triples"]):
        in_specs += trip(t, y_cols, n_t, None)
        args += [jnp.ones((x_rows, y_cols), jnp.int8)] * 3
    for _ in range(desc["i8_centers"]):
        in_specs.append(cent(t, y_cols, None))
        args.append(jnp.ones((x_rows, y_cols), jnp.int8))
    tok_in, tok_out = _tok_specs(2 if cmaj else 1)
    in_specs.append(tok_in)
    args.append(jnp.zeros((8, 128), jnp.float32))
    out_specs = [cent(t, y_cols, ld) for ld in desc["outs"]] + [tok_out]
    out_shape = [jax.ShapeDtypeStruct(shape(ld), jnp.float32)
                 for ld in desc["outs"]]
    out_shape.append(jax.ShapeDtypeStruct((8, 128), jnp.float32))
    nbytes = slide_bytes(name, x_rows, y_cols, t)
    n_in, n_out = len(in_specs), len(out_specs)
    n_arr = len(leads)

    def kernel(*refs):
        hbm = refs[:n_arr]
        blocks = refs[n_arr:n_in]
        outs = refs[n_in : n_in + n_out]
        win_ref, sems, head_sems = refs[n_in + n_out :]
        if cmaj:
            c, ti = pl.program_id(0), pl.program_id(1)
        else:
            ti = pl.program_id(0)
        slot = jax.lax.rem(ti, 2)

        def plane_dmas(ds_r, r0, nr, s):
            out, p0 = [], 0
            for a, (ref, ld) in enumerate(zip(hbm, leads)):
                dst_r = pl.ds(r0, nr)
                if ld == "c":
                    src = ref.at[c, ds_r, :]
                    dst = win_ref.at[s, p0, dst_r]
                    n = 1
                elif ld is None:
                    src = ref.at[ds_r, :]
                    dst = win_ref.at[s, p0, dst_r]
                    n = 1
                else:
                    src = ref.at[:, ds_r, :]
                    dst = win_ref.at[s, p0 : p0 + ld, dst_r]
                    n = ld
                out.append(pltpu.make_async_copy(src, dst, sems.at[s, a]))
                p0 += n
            return out

        full = lambda s: plane_dmas(pl.ds(0, rows), 0, rows, s)  # noqa: E731
        tail = lambda tin, s: plane_dmas(  # noqa: E731
            pl.ds(ps._slide_tail_start(tin, t, x_rows), t), 2 * ps._HB, t, s)
        ps._slide_fetch(win_ref, full, tail, ti, n_t, t, slot,
                        head_sems=head_sems)

        # Light-touch consumption: the manual DMAs are explicit effects
        # (they move the bytes regardless), so reading ONE row per plane
        # suffices to order the kernel after the waits without a
        # full-window VPU reduction pacing the twin below its DMA.
        acc = jnp.sum(win_ref[slot, :, ps._HB, :])
        for b in blocks:
            acc += jnp.sum(b[..., :1, :].astype(jnp.float32))
        for o in outs:
            o[...] = jnp.full(o.shape, acc, jnp.float32)

    grid = (chans, n_t) if cmaj else (n_t,)
    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, nplanes, rows, y_cols), jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_arr)),
            pltpu.SemaphoreType.DMA(2),
        ],
    )
    return _time_noop_twin(call, args, nbytes, iters)


def measure_slide2d_ceiling(name: str, x_rows: int, y_cols: int,
                            t: int, ty: int,
                            iters: int | None = None) -> tuple[float, int] | None:
    """Measured DMA ceiling for the row-sliding 2-D velocity kernel's
    geometry (``_cip_velocity_kernel_2d_slide``): 15 planes in 8 HBM
    arrays fetched per column stripe with clamped lane offsets, grid
    (n_ty, n_tx) row-minor, int8 nine-block inputs, 12 output channels.
    The lane-edge realign fixes are VPU work and are omitted — this is
    the DMA-geometry ceiling."""
    import fluid2d_tpu.ops.pallas_phases as ph
    import fluid2d_tpu.ops.pallas_stencil as ps
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if name != "cip_velocity_2d" or jax.default_backend() != "tpu":
        return None
    n_tx, n_ty = x_rows // t, y_cols // ty
    if x_rows % t or y_cols % ty or n_tx < 2 or y_cols < ty + 2 * ps._HY:
        return None
    rows, cols = t + 2 * ps._HB, ty + 2 * ps._HY
    planes = ph._VEL_DMA_PLANES
    nplanes = ph._VEL_DMA_NPLANES

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    h9t = lambda: ps._halo9_specs(t, ty, n_tx, n_ty, None, transposed=True)  # noqa: E731
    tok_in, tok_out = _tok_specs(2)
    in_specs = [any_spec] * 8 + h9t() + h9t() + [
        ps._center2d_spec(t, ty, None, transposed=True), tok_in,
    ]
    args = [jnp.full((lead, x_rows, y_cols) if lead else (x_rows, y_cols),
                     a + 1.0, jnp.float32)
            for a, (_, lead) in enumerate(planes)]
    args += [jnp.ones((x_rows, y_cols), jnp.int8)] * 18
    args += [jnp.ones((x_rows, y_cols), jnp.int8)]
    args.append(jnp.zeros((8, 128), jnp.float32))
    out_specs = [ps._center2d_spec(t, ty, 2, transposed=True)] * 6 + [tok_out]
    out_shape = [jax.ShapeDtypeStruct((2, x_rows, y_cols), jnp.float32)] * 6
    out_shape.append(jax.ShapeDtypeStruct((8, 128), jnp.float32))
    slide_rows = rows + (n_tx - 1) * t
    nbytes = (
        nplanes * slide_rows * cols * 4 * n_ty
        + 2 * ps.nine_bytes(x_rows, y_cols, t, ty, None, itemsize=1)
        + ps.center_bytes(x_rows, y_cols, None, itemsize=1)
        + 12 * ps.center_bytes(x_rows, y_cols, None)
    )

    n_in, n_out = len(in_specs), len(out_specs)

    def kernel(*refs):
        hbm = refs[:8]
        blocks = refs[8:n_in]
        outs = refs[n_in : n_in + n_out]
        win_ref, sems, head_sems = refs[n_in + n_out :]
        tj, ti = pl.program_id(0), pl.program_id(1)
        slot = jax.lax.rem(tj * n_tx + ti, 2)
        cs0 = pl.multiple_of(
            jnp.clip(tj * ty - ps._HY, 0, y_cols - cols), ps._HY)
        ds_c = pl.ds(cs0, cols)

        def plane_dmas(ds_r, r0, nr, s):
            dst_r = pl.ds(r0, nr)
            out = []
            for a, (ref, (p0, lead)) in enumerate(zip(hbm, planes)):
                if lead is None:
                    src = ref.at[ds_r, ds_c]
                    dst = win_ref.at[s, p0, dst_r]
                else:
                    src = ref.at[:, ds_r, ds_c]
                    dst = win_ref.at[s, p0 : p0 + lead, dst_r]
                out.append(pltpu.make_async_copy(src, dst, sems.at[s, a]))
            return out

        full = lambda s: plane_dmas(pl.ds(0, rows), 0, rows, s)  # noqa: E731
        tail = lambda tin, s: plane_dmas(  # noqa: E731
            pl.ds(ps._slide_tail_start(tin, t, x_rows), t), 2 * ps._HB, t, s)
        ps._slide_fetch(win_ref, full, tail, ti, n_tx, t, slot,
                        head_sems=head_sems)

        # One-row consumption — see measure_slide_ceiling.
        acc = jnp.sum(win_ref[slot, :, ps._HB, :])
        for b in blocks:
            acc += jnp.sum(b[..., :1, :].astype(jnp.float32))
        for o in outs:
            o[...] = jnp.full(o.shape, acc, jnp.float32)

    call = pl.pallas_call(
        kernel, grid=(n_ty, n_tx), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, nplanes, rows, cols), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 8)),
            pltpu.SemaphoreType.DMA(2),
        ],
    )
    return _time_noop_twin(call, args, nbytes, iters)


def _tok_specs(grid_rank: int):
    """(in_spec, out_spec) for the twins' (8, 128) chaining token: a
    constant-index block that creates the carry→call dependence keeping
    the scan body live, without dragging a full-size output through the
    carry (a 200 MB carry copy per iteration inflated the res=4096 twin
    times ~5-10% and pushed the 'floor' above the measured step)."""
    from jax.experimental import pallas as pl

    zero = {1: lambda i: (0, 0), 2: lambda i, j: (0, 0)}[grid_rank]
    spec = pl.BlockSpec((8, 128), zero)
    return spec, spec


def _time_noop_twin(call, args, nbytes, iters):
    """Scan-amortized timing shared by the twin builders: the call's
    LAST input and output are the (8, 128) chaining token — carry it so
    the loop-invariant call cannot hoist, at negligible carry cost."""
    if iters is None:
        iters = min(2000, max(100, int(3e11 / nbytes)))
    rest, tok0 = args[:-1], args[-1]

    @jax.jit
    def loop(tok, rest):
        def body(c, _):
            outs = call(*rest, c)
            return outs[-1], None

        out, _ = jax.lax.scan(body, tok, None, length=iters)
        return out

    out = loop(tok0, rest)
    float(np.asarray(out.ravel()[0]))
    t0 = time.perf_counter()
    out = loop(tok0, rest)
    float(np.asarray(out.ravel()[0]))
    sec = (time.perf_counter() - t0) / iters
    return nbytes / sec, nbytes


def mix_bytes(name: str, x_rows: int, y_cols: int, t: int,
              itemsize: int = 4) -> int | None:
    """BlockSpec bytes per call implied by kernel `name`'s registered
    operand mix — must equal what the REAL kernel's `log_traffic` call
    reports at the same grid/tile, or the mix twin no longer models the
    kernel (guarded by tests/test_trace_tools.py). None for unregistered
    kernels."""
    import fluid2d_tpu.ops.pallas_stencil as ps

    mix = _KERNEL_MIXES.get(name)
    if mix is None:
        return None
    chans = 3
    nbytes = 0
    for kind, lead in mix["ins"]:
        isz = 1 if kind.endswith("8") else itemsize
        ld = chans if lead == "c" else lead
        if kind.startswith("t"):
            nbytes += ps.triple_bytes(x_rows, y_cols, t, ld, itemsize=isz)
        else:
            nbytes += ps.center_bytes(x_rows, y_cols, ld, itemsize=isz)
    nbytes += sum(
        ps.center_bytes(x_rows, y_cols, chans if lead == "c" else lead,
                        itemsize=itemsize)
        for lead in mix["outs"]
    )
    return nbytes


def measure_mix_ceiling(name: str, x_rows: int, y_cols: int, t: int,
                        iters: int | None = None,
                        dtype=None) -> tuple[float, int] | None:
    """Measured DMA ceiling (bytes/s of BlockSpec bytes, and the bytes
    per call) for kernel `name`'s operand mix: a no-op pallas_call with
    the same spec structure on DISTINCT full-size arrays (full-reduction
    consumption — a scalar read lets the pipeline skip moving bytes).
    `dtype` is the float planes' transport dtype (default f32; bf16
    builds the half-byte twin the bf16 transport mode dispatches).
    None when the kernel has no registered mix (2-D / sliding variants)
    or the backend is not TPU."""
    import fluid2d_tpu.ops.pallas_stencil as ps
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mix = _KERNEL_MIXES.get(name)
    if mix is None or jax.default_backend() != "tpu":
        return None
    fdt = jnp.dtype(dtype or jnp.float32)
    n_t = x_rows // t
    if n_t < 2 or x_rows % t:
        return None
    cg = mix["grid"] == "cg"
    chans = 3

    def arr_shape(lead):
        if lead == "c":
            return (chans, x_rows, y_cols)
        if lead is None:
            return (x_rows, y_cols)
        return (lead, x_rows, y_cols)

    trip = ps._halo_triple_specs_cgrid if cg else ps._halo_triple_specs
    cent = ps._center_spec_cgrid if cg else ps._center_spec

    in_specs, args = [], []
    for k, (kind, lead) in enumerate(mix["ins"]):
        a = jnp.full(arr_shape(lead), k + 1, jnp.int8 if kind.endswith("8") else fdt)
        if kind.startswith("t"):
            in_specs += trip(t, y_cols, n_t, lead)
            args += [a] * 3
        else:
            in_specs.append(cent(t, y_cols, lead))
            args.append(a)

    tok_in, tok_out = _tok_specs(2 if cg else 1)
    in_specs.append(tok_in)
    args.append(jnp.zeros((8, 128), jnp.float32))
    out_specs = [cent(t, y_cols, lead) for lead in mix["outs"]] + [tok_out]
    out_shape = [jax.ShapeDtypeStruct(arr_shape(lead), fdt)
                 for lead in mix["outs"]]
    out_shape.append(jax.ShapeDtypeStruct((8, 128), jnp.float32))
    nbytes = mix_bytes(name, x_rows, y_cols, t, itemsize=fdt.itemsize)
    n_in = len(in_specs)

    def kernel(*refs):
        ins, outs = refs[:n_in], refs[n_in:]
        acc = jnp.float32(0)
        for r in ins:
            v = r[...]
            acc += jnp.sum(v.astype(jnp.float32))
        for o in outs:
            o[...] = jnp.full(o.shape, acc, o.dtype)

    grid = (n_t, chans) if cg else (n_t,)
    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
    )
    return _time_noop_twin(call, args, nbytes, iters)


# --- VPU work model (round-5) -------------------------------------------------
#
# bf16 transport exposed the phase kernels as VPU-bound (docs/BENCH.md
# round-4/5 ledger): once the bytes halve, device time doesn't move, so a
# DMA-only roofline reports nonsense-high percentages under bf16. The
# honest per-kernel floor is max(DMA floor, VPU floor). The VPU side is
# modeled as (counted element-ops per step) / (measured element
# throughput): element-ops are counted from each pallas_call's traced
# kernel jaxpr (an op-weight walk — the same DAG Mosaic lowers, so no
# hand-kept registry can drift), and the throughput denominator is
# measured on-device with an ILP-friendly multi-chain fma kernel
# (a single dependent chain measures latency, not throughput).

# Op weights per output element. Transcendentals/division cost several
# VPU passes; ref get/swap are VMEM accesses fused into their consumers;
# static slices/reshapes are layout no-ops (lane-shift cost appears as
# the concatenate that consumes them, which IS counted).
_VPU_FREE = frozenset({
    "get", "swap", "slice", "squeeze", "reshape", "transpose", "copy",
    "bitcast_convert_type", "stop_gradient", "dynamic_slice",
    "dynamic_update_slice", "program_id", "num_programs",
})
_VPU_HEAVY = {"div": 3.0, "sqrt": 3.0, "rsqrt": 3.0, "exp": 3.0,
              "log": 3.0, "tanh": 3.0, "logistic": 3.0, "pow": 3.0,
              "integer_pow": 2.0, "rem": 3.0, "sign": 2.0}
_VPU_REDUCE = frozenset({
    "reduce_sum", "reduce_max", "reduce_min", "reduce_and", "reduce_or",
    "reduce_prod", "argmax", "argmin",
})


def _sub_jaxprs(params):
    from jax._src import core as jcore

    for v in params.values():
        vals = v if isinstance(v, (tuple, list)) else (v,)
        for item in vals:
            if isinstance(item, jcore.ClosedJaxpr):
                yield item.jaxpr
            elif isinstance(item, jcore.Jaxpr):
                yield item


def _jaxpr_vpu_elops(jaxpr) -> float:
    """Weighted element-op count of ONE execution of `jaxpr` (one grid
    program for a kernel jaxpr). cond branches count as their max; scan
    bodies multiply by the trip count."""
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _VPU_FREE:
            continue
        if name == "cond":
            total += max((_jaxpr_vpu_elops(b.jaxpr)
                          for b in eqn.params["branches"]), default=0.0)
            continue
        if name == "scan":
            total += _jaxpr_vpu_elops(eqn.params["jaxpr"].jaxpr) * eqn.params["length"]
            continue
        if name == "while":
            total += (_jaxpr_vpu_elops(eqn.params["body_jaxpr"].jaxpr)
                      + _jaxpr_vpu_elops(eqn.params["cond_jaxpr"].jaxpr))
            continue
        subs = list(_sub_jaxprs(eqn.params))
        if subs:  # pjit / closed_call / custom_* wrappers
            total += sum(_jaxpr_vpu_elops(s) for s in subs)
            continue
        if name in _VPU_REDUCE:
            total += sum(float(np.prod(v.aval.shape))
                         for v in eqn.invars if hasattr(v.aval, "shape"))
            continue
        out = eqn.outvars[0].aval
        if not hasattr(out, "shape"):
            continue
        elems = float(np.prod(out.shape)) if out.shape else 1.0
        total += elems * _VPU_HEAVY.get(name, 1.0)
    return total


def collect_pallas_elops(jaxpr) -> list[float]:
    """Total weighted element-ops of every ``pallas_call`` in `jaxpr`
    (recursively), in trace order — one entry per dispatch, aligned with
    the TRAFFIC_LOG ledger that the phase entry points append to at the
    same points during tracing."""
    out: list[float] = []

    def walk(j):
        for eqn in j.eqns:
            if eqn.primitive.name == "pallas_call":
                grid = getattr(eqn.params.get("grid_mapping"), "grid", ()) or ()
                n_programs = float(np.prod(grid)) if grid else 1.0
                kj = eqn.params["jaxpr"]
                kj = kj.jaxpr if hasattr(kj, "jaxpr") else kj
                out.append(_jaxpr_vpu_elops(kj) * n_programs)
            else:
                for s in _sub_jaxprs(eqn.params):
                    walk(s)

    walk(jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr)
    return out


_VPU_RATE_CACHE: dict[str, float] = {}


def measure_vpu_throughput(dtype="float32", passes: int = 8192,
                           iters: int = 20) -> float | None:
    """Best-achievable VPU element throughput (weighted el-ops/s) on the
    current device — the OPTIMISTIC denominator a floor needs.

    A Pallas kernel running `passes` fma element-passes per element on
    (8, 1024) blocks, split across 8 independent accumulator chains. At
    this fused depth Mosaic keeps the chunk in vregs across the chain,
    so the measurement is ALU-bound, not VMEM-fed: the dev chip reads
    ~3.8-4.4 T weighted-el-ops/s at depth 4096-8192 (still rising
    slowly — a mild UNDERestimate of peak, which makes per-kernel
    percentages mildly conservative-high; acceptable because the real
    phase kernels measure well below it at ~2.1 T/s). Shallow or
    block-sized-accumulator variants measure 0.4-1.7 T/s — those are
    VMEM-bandwidth figures, and a floor built on one lands ABOVE real
    kernel times (the first probe's 622 G/s put the step at 329% of its
    own "floor"; scripts/vpu_rate_sweep.py records the sweep).

    One fma counts as 2 weighted el-ops — the same accounting as
    :func:`_jaxpr_vpu_elops`, which sees mul and add as separate eqns.
    None off-TPU."""
    if jax.default_backend() != "tpu":
        return None
    key = str(jnp.dtype(dtype))
    if key in _VPU_RATE_CACHE:
        return _VPU_RATE_CACHE[key]
    from jax.experimental import pallas as pl

    dt = jnp.dtype(dtype)
    rows, cols, t = 2048, 1024, 8
    nchain = 8

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        c1 = jnp.asarray(1.000001, dt)
        c2 = jnp.asarray(1e-6, dt)
        accs = [x * jnp.asarray(1.0 + 1e-7 * k, dt) for k in range(nchain)]
        for _ in range(passes // nchain):
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
    float(np.asarray(y[0, 0], np.float32))  # fence (see sync)
    t0 = time.perf_counter()
    y = loop(x)
    float(np.asarray(y[0, 0], np.float32))
    sec = time.perf_counter() - t0
    # Per element: passes fmas at weight 2, + nchain init muls and
    # (nchain−1) merge adds at weight 1.
    elops = rows * cols * (2 * passes + 2 * nchain - 1) * iters
    rate = elops / sec
    _VPU_RATE_CACHE[key] = rate
    return rate


def step_min_bytes(cfg: SimConfig, x_rows: int, y_cols: int) -> int:
    """Lower bound on HBM bytes one step must move: every carried array
    written once + each phase's inputs read once."""
    cell = x_rows * y_cols * jnp.dtype(cfg.dtype).itemsize
    if cfg.scheme == "cip":
        writes = 2 * 6  # v/vx/vy cur+na
        reads = 2 * 7 + 1  # v, p, v_alt, grads+alts, masks-ish
    else:
        writes = 2 * 2
        reads = 2 * 3 + 1
    if cfg.vor_eps is not None:
        writes += 2
        reads += 2
    # pressure: per iteration read p, p_alt, u, w; write pn, pc
    writes += 2 * cfg.n_pressure_iter
    reads += 4 * cfg.n_pressure_iter
    writes += 2  # limiter
    reads += 2
    if cfg.enable_dye:
        chans = 3
        if cfg.scheme == "cip":
            writes += chans * 6
            reads += chans * 6 + 2
        else:
            writes += chans * 2
            reads += chans * 2 + 2
    return (writes + reads) * cell


def step_blockspec_bytes(cfg: SimConfig, res: int, bc: int = 2) -> dict[str, int]:
    """Per-kernel HBM bytes of ONE step, derived from the ACTUAL Pallas
    BlockSpecs the dispatch chooses at this config/resolution (each
    halo-triple input is re-fetched with its 8-row side blocks per tile;
    outputs stream once). Traced without executing: the phase entry
    points log into the ledger during ``jax.make_jaxpr``.

    Returns {} when the config routes to the jnp/XLA path (no Pallas
    kernels → no BlockSpecs to account)."""
    import fluid2d_tpu.ops.pallas_stencil as ps
    from fluid2d_tpu.models.simulator import scene_for_dtype, step_fn_for
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    scene = scene_for_dtype(get_scene(bc, res), cfg)
    state = init_state(scene, cfg)
    step = step_fn_for(cfg)
    ledger: list[tuple[str, int]] = []
    tiles: dict[str, int] = {}
    ps.TRAFFIC_LOG = ledger
    ps.TILE_LOG = tiles
    try:
        jaxpr = jax.make_jaxpr(lambda s: step(s, scene))(state)
    finally:
        ps.TRAFFIC_LOG = None
        ps.TILE_LOG = None
    per_kernel: dict[str, int] = {}
    for name, nbytes in ledger:
        per_kernel[name] = per_kernel.get(name, 0) + nbytes
    # Per-kernel VPU element-ops, counted from the SAME trace: the
    # ledger appends one entry per pallas dispatch right before its
    # pallas_call is traced, so the jaxpr's pallas_call eqns align with
    # the ledger positionally.
    elops_per_call = collect_pallas_elops(jaxpr)
    per_kernel_elops: dict[str, float] = {}
    if len(elops_per_call) == len(ledger):
        for (name, _), el in zip(ledger, elops_per_call):
            per_kernel_elops[name] = per_kernel_elops.get(name, 0.0) + el
    step_blockspec_bytes.last_tiles = tiles  # dispatched tile_x per kernel
    step_blockspec_bytes.last_elops = per_kernel_elops
    return per_kernel


def roofline_report(res: int = 1600, scheme: str = "cip", steps: int = 100,
                    dtype: str = "float32") -> dict:
    """Measure steps/s against MEASURED rooflines (VERDICT r3 item #2).

    Denominators (all measured on this device, working sets beyond
    VMEM — see the round-4 correction in docs/BENCH.md):
    * ``streaming_copy_GBps`` — the honest 1R+1W Pallas copy rate on a
      320 MB working set (~305 GB/s on the dev chip; the old 40 MB
      default stayed VMEM-resident and read 2.6 TB/s);
    * per-kernel ``ceiling_GBps`` — a no-op twin of each kernel's
      operand mix at its dispatched tile and the real grid size
      (:func:`measure_mix_ceiling`): what the DMA geometry alone allows.

    Per-kernel rows: BlockSpec bytes/step, the mix ceiling, the
    ceiling-implied floor time. ``pct_of_geometry_roofline`` compares
    the measured step against the sum of per-kernel floors — the honest
    "how much is left on the table at this kernel structure" figure;
    ``pct_of_copy_roofline`` uses the copy rate (the number a perfect
    1-stream restructure could chase).
    """
    from fluid2d_tpu.models.simulator import make_run_fn, scene_for_dtype
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    cfg = SimConfig.create(resolution=res, scheme=scheme, vor_eps=5.0,
                           enable_dye=True, dtype=dtype)
    scene = scene_for_dtype(get_scene(2, res), cfg)
    state = init_state(scene, cfg)
    run = make_run_fn(cfg)

    sec_per_step, _ = time_steps(run, state, scene, steps)
    bw = measure_hbm_bandwidth()
    min_bytes = step_min_bytes(cfg, 2 * res, res)
    per_kernel = step_blockspec_bytes(cfg, res)
    tiles = getattr(step_blockspec_bytes, "last_tiles", {})
    elops = getattr(step_blockspec_bytes, "last_elops", {})
    vpu_rate = measure_vpu_throughput()  # f32: the in-kernel compute dtype
    spec_bytes = sum(per_kernel.values()) or min_bytes
    report = {}
    if jax.default_backend() != "tpu":
        report["hbm_note"] = ("non-TPU backend: bandwidth denominator is an XLA "
                              "elementwise pass over a cache-sized buffer — treat "
                              "the roofline percentages as approximate")
    report |= {
        "steps_per_sec": 1.0 / sec_per_step,
        "ms_per_step": sec_per_step * 1e3,
        "streaming_copy_GBps": bw / 1e9,
        "min_traffic_MB_per_step": min_bytes / 2**20,
        "blockspec_traffic_MB_per_step": spec_bytes / 2**20,
        "copy_roofline_ms_per_step": spec_bytes / bw * 1e3,
        "pct_of_copy_roofline": 100.0 * (spec_bytes / sec_per_step) / bw,
    }
    kernels = {}
    floor_ms = 0.0
    floor_complete = True
    for name, nbytes in sorted(per_kernel.items()):
        row = {"MB_per_step": round(nbytes / 2**20, 1)}
        t = tiles.get(name)
        ceiling = None
        if isinstance(t, tuple) and t[0] == "slide":
            row["fetch"] = "slide"
            ceiling = measure_slide_ceiling(name, 2 * res, res, t[1])
        elif isinstance(t, tuple) and t[0] == "slide2d":
            row["fetch"] = "slide2d"
            ceiling = measure_slide2d_ceiling(name, 2 * res, res, t[1], t[2])
        elif t is not None:
            # sor_x1 appears with and without the limiter outputs; the
            # registered mix uses the final-iteration (limited) form.
            ceiling = measure_mix_ceiling(name, 2 * res, res, t,
                                          dtype=jnp.dtype(cfg.dtype))
        dma_floor = None
        if ceiling is not None:
            ceil_bps, _ = ceiling
            row["ceiling_GBps"] = round(ceil_bps / 1e9, 1)
            dma_floor = nbytes / ceil_bps * 1e3
            row["dma_floor_ms"] = round(dma_floor, 3)
        else:
            row["ceiling_GBps"] = None  # no registered twin for this variant
        # VPU floor: counted element-ops / measured multi-chain rate
        # (round-5 — without this term a bf16 roofline reports >100%:
        # the twins halve with the bytes while the real kernels don't).
        vpu_floor = None
        if vpu_rate is not None and name in elops:
            row["vpu_Gelops_per_step"] = round(elops[name] / 1e9, 3)
            vpu_floor = elops[name] / vpu_rate * 1e3
            row["vpu_floor_ms"] = round(vpu_floor, 3)
        if dma_floor is not None or vpu_floor is not None:
            floor = max(f for f in (dma_floor, vpu_floor) if f is not None)
            row["floor_ms"] = round(floor, 3)
            if dma_floor is not None and vpu_floor is not None:
                row["bound"] = "vpu" if vpu_floor > dma_floor else "dma"
            floor_ms += floor
        else:
            floor_complete = False
        kernels[name] = row
    report["kernels"] = kernels
    if vpu_rate is not None:
        report["vpu_rate_Gelops"] = round(vpu_rate / 1e9, 1)
    if kernels and floor_complete:
        report["geometry_floor_ms_per_step"] = round(floor_ms, 3)
        report["pct_of_geometry_roofline"] = round(
            100.0 * floor_ms / (sec_per_step * 1e3), 1)
    return report


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fluid2d_trace"):
    """jax.profiler trace capture around a block (view with TensorBoard
    or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
