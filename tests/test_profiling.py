"""utils/profiling: traffic accounting, bandwidth fallback, trace capture."""

import numpy as np

from fluid2d_tpu.config import SimConfig
from fluid2d_tpu.utils import profiling


def test_step_min_bytes_ordering():
    """The floor grows with enabled features and is strictly positive."""
    base = SimConfig.create(resolution=64, scheme="upwind", vor_eps=None, enable_dye=False)
    dye = SimConfig.create(resolution=64, scheme="upwind", vor_eps=None, enable_dye=True)
    cip = SimConfig.create(resolution=64, scheme="cip", vor_eps=5.0, enable_dye=True)
    b0 = profiling.step_min_bytes(base, 128, 64)
    b1 = profiling.step_min_bytes(dye, 128, 64)
    b2 = profiling.step_min_bytes(cip, 128, 64)
    assert 0 < b0 < b1 < b2


def test_blockspec_bytes_ledger():
    """The BlockSpec traffic ledger logs per-kernel bytes when the Pallas
    path dispatches, and stays empty on the XLA path; every logged figure
    must be at least one full read+write pass over the grid."""
    cfg_xla = SimConfig.create(resolution=64, scheme="cip", vor_eps=5.0,
                               enable_dye=True, kernels="xla")
    assert profiling.step_blockspec_bytes(cfg_xla, 64) == {}

    cfg_p = SimConfig.create(resolution=64, scheme="cip", vor_eps=5.0,
                             enable_dye=True, kernels="pallas_interpret")
    per_kernel = profiling.step_blockspec_bytes(cfg_p, 64)
    assert {"cip_velocity", "cip_dye", "confinement"} <= set(per_kernel)
    assert any(k.startswith("sor") for k in per_kernel)
    cell = 128 * 64 * 4
    for name, nbytes in per_kernel.items():
        assert nbytes >= 2 * cell, name


def test_measure_hbm_bandwidth_cpu_fallback():
    """On non-TPU backends the Pallas copy kernel can't compile; the XLA
    fallback must return a positive bandwidth instead of crashing
    (bench.py --roofline on a CPU host)."""
    bw = profiling.measure_hbm_bandwidth(mbytes=2, iters=10)
    assert bw > 0


def test_trace_context_writes_profile(tmp_path):
    """jax.profiler capture around a block produces trace artifacts."""
    import jax.numpy as jnp

    log_dir = tmp_path / "trace"
    with profiling.trace(str(log_dir)):
        float(np.asarray(jnp.arange(8.0).sum()))
    files = list(log_dir.rglob("*"))
    assert any(f.is_file() for f in files)
