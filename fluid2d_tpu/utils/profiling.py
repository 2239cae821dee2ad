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


def mix_bytes(name: str, x_rows: int, y_cols: int, t: int) -> int | None:
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
        isz = 1 if kind.endswith("8") else 4
        ld = chans if lead == "c" else lead
        if kind.startswith("t"):
            nbytes += ps.triple_bytes(x_rows, y_cols, t, ld, itemsize=isz)
        else:
            nbytes += ps.center_bytes(x_rows, y_cols, ld, itemsize=isz)
    nbytes += sum(
        ps.center_bytes(x_rows, y_cols, chans if lead == "c" else lead)
        for lead in mix["outs"]
    )
    return nbytes


def measure_mix_ceiling(name: str, x_rows: int, y_cols: int, t: int,
                        iters: int | None = None) -> tuple[float, int] | None:
    """Measured DMA ceiling (bytes/s of BlockSpec bytes, and the bytes
    per call) for kernel `name`'s operand mix: a no-op pallas_call with
    the same spec structure on DISTINCT full-size arrays (full-reduction
    consumption — a scalar read lets the pipeline skip moving bytes).
    None when the kernel has no registered mix (2-D / sliding variants)
    or the backend is not TPU."""
    import fluid2d_tpu.ops.pallas_stencil as ps
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mix = _KERNEL_MIXES.get(name)
    if mix is None or jax.default_backend() != "tpu":
        return None
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
        dtype = jnp.int8 if kind.endswith("8") else jnp.float32
        a = jnp.full(arr_shape(lead), k + 1, dtype)
        if kind.startswith("t"):
            in_specs += trip(t, y_cols, n_t, lead)
            args += [a] * 3
        else:
            in_specs.append(cent(t, y_cols, lead))
            args.append(a)

    out_specs = [cent(t, y_cols, lead) for lead in mix["outs"]]
    out_shape = [jax.ShapeDtypeStruct(arr_shape(lead), jnp.float32)
                 for lead in mix["outs"]]
    nbytes = mix_bytes(name, x_rows, y_cols, t)
    n_in = len(in_specs)

    def kernel(*refs):
        ins, outs = refs[:n_in], refs[n_in:]
        acc = jnp.float32(0)
        for r in ins:
            v = r[...]
            acc += jnp.sum(v.astype(jnp.float32))
        for o in outs:
            o[...] = jnp.full(o.shape, acc, jnp.float32)

    grid = (n_t, chans) if cg else (n_t,)
    call = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
    )
    if iters is None:
        iters = min(2000, max(100, int(3e11 / nbytes)))

    # Chain the first output into the first (shape-matching) arg so the
    # scan cannot hoist the loop-invariant call.
    first_shape = out_shape[0].shape
    chain_idx = next(i for i, a in enumerate(args)
                     if a.shape == first_shape and a.dtype == jnp.float32)
    rest = [a for i, a in enumerate(args) if i != chain_idx]

    @jax.jit
    def loop(first, rest):
        def body(c, _):
            full = list(rest)
            full.insert(chain_idx, c)
            outs = call(*full)
            return outs[0], None

        out, _ = jax.lax.scan(body, first, None, length=iters)
        return out

    out = loop(args[chain_idx], rest)
    float(np.asarray(out.ravel()[0]))
    t0 = time.perf_counter()
    out = loop(args[chain_idx], rest)
    float(np.asarray(out.ravel()[0]))
    sec = (time.perf_counter() - t0) / iters
    return nbytes / sec, nbytes


def step_min_bytes(cfg: SimConfig, x_rows: int, y_cols: int) -> int:
    """Lower bound on HBM bytes one step must move: every carried array
    written once + each phase's inputs read once."""
    cell = x_rows * y_cols * 4
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
    from fluid2d_tpu.models.simulator import step_fn_for
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    scene = get_scene(bc, res)
    state = init_state(scene, cfg)
    step = step_fn_for(cfg)
    ledger: list[tuple[str, int]] = []
    tiles: dict[str, int] = {}
    ps.TRAFFIC_LOG = ledger
    ps.TILE_LOG = tiles
    try:
        jax.make_jaxpr(lambda s: step(s, scene))(state)
    finally:
        ps.TRAFFIC_LOG = None
        ps.TILE_LOG = None
    per_kernel: dict[str, int] = {}
    for name, nbytes in ledger:
        per_kernel[name] = per_kernel.get(name, 0) + nbytes
    step_blockspec_bytes.last_tiles = tiles  # dispatched tile_x per kernel
    return per_kernel


def roofline_report(res: int = 1600, scheme: str = "cip", steps: int = 100) -> dict:
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
    from fluid2d_tpu.models.simulator import make_run_fn
    from fluid2d_tpu.scenes.compile import get_scene
    from fluid2d_tpu.state import init_state

    cfg = SimConfig.create(resolution=res, scheme=scheme, vor_eps=5.0, enable_dye=True)
    scene = get_scene(2, res)
    state = init_state(scene, cfg)
    run = make_run_fn(cfg)

    sec_per_step, _ = time_steps(run, state, scene, steps)
    bw = measure_hbm_bandwidth()
    min_bytes = step_min_bytes(cfg, 2 * res, res)
    per_kernel = step_blockspec_bytes(cfg, res)
    tiles = getattr(step_blockspec_bytes, "last_tiles", {})
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
        if t is not None:
            # sor_x1 appears with and without the limiter outputs; the
            # registered mix uses the final-iteration (limited) form.
            ceiling = measure_mix_ceiling(name, 2 * res, res, t)
        if ceiling is not None:
            ceil_bps, _ = ceiling
            row["ceiling_GBps"] = round(ceil_bps / 1e9, 1)
            row["floor_ms"] = round(nbytes / ceil_bps * 1e3, 3)
            floor_ms += nbytes / ceil_bps * 1e3
        else:
            row["ceiling_GBps"] = None  # 2-D/sliding variant: no twin yet
            floor_complete = False
        kernels[name] = row
    report["kernels"] = kernels
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
