"""Persistent XLA compilation cache.

First compiles at res≥1600 cost 20–40 s (minutes at res=4096 through a
remote tunnel); the persistent cache amortizes them across processes.
The CLI enables this via ``--compile-cache`` (default on); benchmarks
and scripts call :func:`enable_compile_cache` directly.
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `cache_dir`
    (default ``~/.cache/fluid2d_tpu/xla``) — TPU backends only: XLA:CPU
    AOT cache entries are not reliably host-portable (machine-feature
    mismatch errors on reload), and CPU compiles are cheap anyway.
    Never fatal — returns the directory on success, None otherwise.
    Note this resolves the backend, so call it after any
    ``jax.config.update("jax_platforms", ...)``."""
    import jax

    try:
        if jax.default_backend() != "tpu":
            return None
        if cache_dir is None:
            # The scoped-VMEM limit changes which programs compile (and
            # XLA's fusion sizing) but is not part of XLA's cache key —
            # keep per-limit cache directories so runs with different
            # limits never collide.
            from fluid2d_tpu.utils.tpu_flags import DEFAULT_KIB, scoped_vmem_bytes

            kib = scoped_vmem_bytes() // 1024
            suffix = "" if kib == DEFAULT_KIB else f"-vmem{kib}"
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "fluid2d_tpu", "xla" + suffix
            )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — an optimization, never fatal
        return None
    return cache_dir
