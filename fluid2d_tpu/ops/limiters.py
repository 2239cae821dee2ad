"""Field limiting / clamping safeguards.

Behavioral parity with ``/root/reference/fs/solver.py:38-49`` including
NaN handling: Taichi's ``ti.min``/``ti.max`` lower to fmin/fmax, which
return the non-NaN operand, so a NaN field value *clamps* instead of
propagating. See :func:`fluid2d_tpu.ops.stencil.tmin`.
"""

from __future__ import annotations

import jax.numpy as jnp

from fluid2d_tpu.ops.stencil import tmax, tmin

__all__ = ["limit_vector_norm", "clamp_field"]


def limit_vector_norm(v: jnp.ndarray, limit: float) -> jnp.ndarray:
    """Rescale vectors whose norm exceeds `limit` (``fs/solver.py:38-43``).

    `v` has shape (2, X, Y). Cells with norm ≤ limit (or NaN norm, which
    compares false, matching Taichi's ``if norm > limit``) are unchanged.
    """
    norm = jnp.sqrt(v[0] * v[0] + v[1] * v[1])
    scaled = limit * (v / norm)
    return jnp.where(norm > limit, scaled, v)


def clamp_field(f: jnp.ndarray, low: float, high: float) -> jnp.ndarray:
    """Elementwise clamp via min(max(f, low), high) with fmin/fmax NaN
    semantics (``fs/solver.py:46-49``): NaN → low."""
    return tmin(tmax(f, jnp.float32(low)), jnp.float32(high))
