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


def measure_hbm_bandwidth(mbytes: int = 40, iters: int = 2000) -> float:
    """Achievable streaming HBM bandwidth (bytes/s, 1R+1W) on the current
    default device: a Pallas copy kernel, scan-amortized over enough
    iterations to swamp the tunnel's per-invocation latency floor
    (~30 ms observed on the axon runtime — short timings are meaningless
    there). A plain-XLA elementwise pass measures ~10× lower than this
    copy (its kernels are not stream-optimal), so this is the honest
    roofline denominator for DMA-pipelined Pallas kernels."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    y = 2048
    x = max(64, (mbytes * 2**20 // 4 // y) // 64 * 64)
    f = jnp.ones((x, y), jnp.float32)
    t = 64

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
    ps.TRAFFIC_LOG = ledger
    try:
        jax.make_jaxpr(lambda s: step(s, scene))(state)
    finally:
        ps.TRAFFIC_LOG = None
    per_kernel: dict[str, int] = {}
    for name, nbytes in ledger:
        per_kernel[name] = per_kernel.get(name, 0) + nbytes
    return per_kernel


def roofline_report(res: int = 1600, scheme: str = "cip", steps: int = 100) -> dict:
    """Measure steps/s against the HBM roofline.

    Two byte figures bracket the truth:
    * ``min_traffic`` — :func:`step_min_bytes`, the information-theoretic
      floor (every carried array written once, every input read once);
    * ``blockspec_traffic`` — the program's ACTUAL DMA bytes from the
      dispatched kernels' BlockSpecs (≥ the floor; includes halo
      re-fetches).
    ``pct_of_roofline`` uses the BlockSpec bytes, so it cannot exceed
    100% — values well under 100% mean the kernels are compute-bound
    (VPU), not bandwidth-bound, at this resolution.
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
    spec_bytes = sum(per_kernel.values()) or min_bytes
    report = {}
    if jax.default_backend() != "tpu":
        report["hbm_note"] = ("non-TPU backend: bandwidth denominator is an XLA "
                              "elementwise pass over a cache-sized buffer — treat "
                              "the roofline percentage as approximate")
    report |= {
        "steps_per_sec": 1.0 / sec_per_step,
        "ms_per_step": sec_per_step * 1e3,
        "measured_hbm_GBps": bw / 1e9,
        "min_traffic_MB_per_step": min_bytes / 2**20,
        "blockspec_traffic_MB_per_step": spec_bytes / 2**20,
        "roofline_ms_per_step": spec_bytes / bw * 1e3,
        "pct_of_roofline": 100.0 * (spec_bytes / sec_per_step) / bw,
    }
    for name, nbytes in sorted(per_kernel.items()):
        report[f"kernel_MB[{name}]"] = nbytes / 2**20
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
