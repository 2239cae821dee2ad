"""TPU compiler-flag plumbing: the scoped-VMEM limit.

Mosaic kernels allocate their window scratch and expression stack from
XLA's *scoped* VMEM arena, whose default limit is 16 MiB
(``--xla_tpu_scoped_vmem_limit_kib=16384``) — NOT the chip's physical
VMEM. The development chip accepts (and runs at full speed with) a
raised limit: the dye sub=2 kernel needs 16.61 MiB, fails at the
default, and compiles + WINS end-to-end at 24 MiB (29.5 → 30.5 steps/s
at res=4096, docs/BENCH.md ledger). Every "Mosaic VMEM frontier" in the
tile cost models is therefore conditional on this limit.

The flag must reach libtpu through ``LIBTPU_INIT_ARGS`` **before the
first TPU compile** (the runtime snapshots the env at plugin dlopen —
it is NOT an ``XLA_FLAGS`` flag; passing it there aborts the process
with "Unknown flag"). Call :func:`raise_scoped_vmem` before
``enable_compile_cache`` / the first jax backend query.
"""

from __future__ import annotations

import os
import re

__all__ = ["DEFAULT_KIB", "RAISED_KIB", "raise_scoped_vmem", "scoped_vmem_bytes"]

DEFAULT_KIB = 16384
# 64 MiB: enough for the res=4096 dye slide t=32 tile (needs ~52 MB;
# measured +1.8% over t=16, total ~41.4 steps/s). The general tile
# BUDGETS stay capped at the 48 MiB sweep-validated point
# (res=1600 cip 299 / MAC 615/613, res=4096 MAC 85.0/82.6) — larger
# budgets overshoot: 96 MiB's t=128 picks measured SLOWER (283.7 vs
# 288.6 same-config), and the frontier flattens past t≈64-80. Kernels
# whose Mosaic scoped needs outrun the byte models are clamped at their
# measured compile frontiers (the dye slide t clamp, pick_tile2d's
# 24 MiB budget cap).
RAISED_KIB = 65536
BUDGET_CAP_KIB = 49152

_requested_kib: int | None = None


def _env_kib() -> int | None:
    m = re.search(r"--xla_tpu_scoped_vmem_limit_kib=(\d+)",
                  os.environ.get("LIBTPU_INIT_ARGS", ""))
    return int(m.group(1)) if m else None


def scoped_vmem_bytes() -> int:
    """The scoped-VMEM limit the tile cost models may budget against
    (bytes). Reflects what this process requested via
    :func:`raise_scoped_vmem` or an externally set LIBTPU_INIT_ARGS;
    the conservative default otherwise."""
    kib = _requested_kib or _env_kib() or DEFAULT_KIB
    return kib * 1024


def raise_scoped_vmem(kib: int = RAISED_KIB) -> int:
    """Request a scoped-VMEM limit of `kib` KiB by appending to
    ``LIBTPU_INIT_ARGS``. Must run before the first TPU compile; an
    externally set value is respected, not overridden. Returns the
    limit in effect (KiB)."""
    global _requested_kib
    env = _env_kib()
    if env is not None:
        _requested_kib = env
        return env
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    os.environ["LIBTPU_INIT_ARGS"] = (
        (cur + " " if cur else "") + f"--xla_tpu_scoped_vmem_limit_kib={kib}"
    )
    _requested_kib = kib
    return kib
