"""Vorticity confinement (Fedkiw-style), full-array form.

Parity target: ``/root/reference/fs/vorticity_confinement.py``. Notes:

* The reference's persistent ``vorticity``/``vorticity_abs`` fields are
  written only at fluid cells and initialized to zero, so non-fluid cells
  are zero forever — equivalent to ``where(fluid, curl, 0)`` with no
  state to carry.
* ``∇‖ω‖ / |∇‖ω‖|`` is intentionally unguarded (``:49``): a zero gradient
  produces NaN which the reference then clamps to ±0.1 via fmin/fmax
  (NaN → takes the clamp bound, +0.1 after min-then-max). We reproduce
  that exact NaN policy via :func:`tmin`/:func:`tmax`.
* ``apply`` writes only the next buffer at fluid cells; the caller swaps
  (``:57-59``) — expressed here by returning the post-swap pair.
"""

from __future__ import annotations

import jax.numpy as jnp

from fluid2d_tpu.ops.stencil import diff_x, diff_y, tmax, tmin

__all__ = ["confinement_force", "apply_confinement"]


def confinement_force(v, fluid, dx: float):
    """Clamped confinement force field, shape (2, X, Y)."""
    curl = diff_x(v[1], dx) - diff_y(v[0], dx)
    vorticity = jnp.where(fluid, curl, 0.0)
    vort_abs = jnp.where(fluid, jnp.abs(curl), 0.0)

    gx = diff_x(vort_abs, dx)
    gy = diff_y(vort_abs, dx)
    norm = jnp.sqrt(gx * gx + gy * gy)
    nx = gx / norm  # unguarded on purpose: 0/0 → NaN, clamped below
    ny = gy / norm
    fx = ny * vorticity
    fy = -nx * vorticity
    fx = tmax(tmin(fx, jnp.float32(0.1)), jnp.float32(-0.1))
    fy = tmax(tmin(fy, jnp.float32(0.1)), jnp.float32(-0.1))
    return jnp.stack([fx, fy])


def apply_confinement(v_cur, v_alt, fluid, dt: float, weight: float, dx: float):
    """v_next = v_cur + dt·ε·f_conf at fluid cells (stale elsewhere), then
    swap. Returns the post-swap ``(v_cur, v_alt)`` pair."""
    force = confinement_force(v_cur, fluid, dx)
    vn = jnp.where(fluid, v_cur + dt * weight * force, v_alt)
    return vn, v_cur
