"""Pallas TPU stencil kernels for the hot per-step phases.

Why: the pure-jnp step compiles to ~29 XLA fusions with ~1.5 GB of
materialized temporaries per step at res=1600 — every fusion boundary
costs a full HBM round trip. These kernels fuse an entire phase (all of
CIP advection with its masked buffer composition, …) into ONE pass:
intermediate algebra lives in VMEM/registers instead of HBM.

Design (per kernel):

* The grid tiles the X (sublane) axis; ``tile_x`` must divide X (callers
  pick a good divisor — grids here are 2·res × res so one always
  exists; otherwise they fall back to the jnp path).
* Row halos use the **three-block trick**: each stencil input is passed
  three times with block index maps ``i-1, i, i+1`` (clamped), so the
  kernel sees the previous/current/next tile and assembles ±1-row
  shifted views in VMEM. Grid-edge tiles replicate their own edge row,
  reproducing the framework's clamp-to-edge semantics. This rides the
  standard Pallas pipeline (auto double-buffered DMA) and has no
  alignment constraints on the lane dimension — unlike manual
  ``make_async_copy`` row-slices, which Mosaic requires to be
  (8, 128)-aligned and which a 1600-wide grid cannot satisfy.
* Column (lane) halos never touch HBM: shifted-column views are built
  in-VMEM with edge-column concatenation (``_sy``).

Numerics are identical to the jnp reference path (same expression
structure; verified in interpret mode by tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pick_tile", "cip_advect_pallas"]


def pick_tile(x: int, preferred: int = 64) -> int | None:
    """Largest divisor of `x` that is ≤ preferred, a multiple of 8, and
    leaves ≥ 2 tiles (so prev/next blocks exist). None if X is
    pathological — caller falls back to the jnp path."""
    top = (min(preferred, x // 2) // 8) * 8
    for t in range(top, 7, -8):
        if x % t == 0:
            return t
    return None


def _sy(arr, d: int):
    """Shift columns by d with edge clamp, fully in VMEM."""
    if d == 0:
        return arr
    if d > 0:
        return jnp.concatenate([arr[:, d:], *([arr[:, -1:]] * d)], axis=1)
    d = -d
    return jnp.concatenate([*([arr[:, :1]] * d), arr[:, :-d]], axis=1)


def _xv(prev, cur, nxt, ti, n_t, d: int):
    """±1-row shifted view of the current tile, using neighbor tiles for
    the halo and replicating the grid-edge row at the first/last tile."""
    if d == 0:
        return cur
    if d == -1:
        normal = jnp.concatenate([prev[-1:], cur[:-1]], axis=0)
        first = jnp.concatenate([cur[:1], cur[:-1]], axis=0)
        return jnp.where(ti == 0, first, normal)
    if d == 1:
        normal = jnp.concatenate([cur[1:], nxt[:1]], axis=0)
        last = jnp.concatenate([cur[1:], cur[-1:]], axis=0)
        return jnp.where(ti == n_t - 1, last, normal)
    raise ValueError(d)


# ---------------------------------------------------------------------------
# CIP advection phase: (f, fx, fy) advected by (u, w), masked composition
# with the alternate buffers — the whole of fs/solver.py:267-332 plus the
# where(fluid, ·, alt) writes, in one pass per (channel, tile).
# ---------------------------------------------------------------------------


def _cip_kernel(
    n_t: int,
    dt: float,
    dx: float,
    # halo inputs: (prev, cur, next) triplets
    f_m, f_c, f_p, fx_m, fx_c, fx_p, fy_m, fy_c, fy_p,
    u_m, u_c, u_p, w_m, w_c, w_p,
    # center inputs
    alt_f, alt_fx, alt_fy, fluid_ref,
    # outputs
    fn_ref, fxn_ref, fyn_ref,
):
    ti = pl.program_id(1)

    def views(m_ref, c_ref, p_ref, chan: bool):
        prev = m_ref[0] if chan else m_ref[:]
        cur = c_ref[0] if chan else c_ref[:]
        nxt = p_ref[0] if chan else p_ref[:]
        return (
            _xv(prev, cur, nxt, ti, n_t, -1),
            cur,
            _xv(prev, cur, nxt, ti, n_t, 1),
        )

    f_xm, f, f_xp = views(f_m, f_c, f_p, True)
    fx_xm, fx, fx_xp = views(fx_m, fx_c, fx_p, True)
    fy_xm, fy, fy_xp = views(fy_m, fy_c, fy_p, True)
    u_xm, u, u_xp = views(u_m, u_c, u_p, False)
    w_xm, w, w_xp = views(w_m, w_c, w_p, False)

    i_s = jnp.where(u < 0.0, jnp.float32(-1.0), jnp.float32(1.0))
    j_s = jnp.where(w < 0.0, jnp.float32(-1.0), jnp.float32(1.0))
    up_x = jnp.logical_not(u < 0.0)
    up_y = jnp.logical_not(w < 0.0)

    sel_x = lambda m, p: jnp.where(up_x, m, p)  # noqa: E731
    sel_y = lambda m, p: jnp.where(up_y, m, p)  # noqa: E731

    f_im = sel_x(f_xm, f_xp)
    f_jm = sel_y(_sy(f, -1), _sy(f, 1))
    # Diagonal: both shifts BEFORE the selects, so both upwind masks are
    # evaluated at the center cell (same pitfall as ops/cip.py::_sel_xy).
    f_imjm = sel_x(
        sel_y(_sy(f_xm, -1), _sy(f_xm, 1)),
        sel_y(_sy(f_xp, -1), _sy(f_xp, 1)),
    )
    fx_im = sel_x(fx_xm, fx_xp)
    fx_jm = sel_y(_sy(fx, -1), _sy(fx, 1))
    fy_im = sel_x(fy_xm, fy_xp)
    fy_jm = sel_y(_sy(fy, -1), _sy(fy, 1))

    tmp1 = f - f_jm - f_im + f_imjm
    tmp2 = f_im - f
    tmp3 = f_jm - f

    i_s_denom = i_s * dx**3
    j_s_denom = j_s * dx**3

    a = (i_s * (fx_im + fx) * dx - 2.0 * (-tmp2)) / i_s_denom
    bb = (j_s * (fy_jm + fy) * dx - 2.0 * (-tmp3)) / j_s_denom
    cc = (-tmp1 - i_s * (fx_jm - fx) * dx) / j_s_denom
    dd = (-tmp1 - j_s * (fy_im - fy) * dx) / i_s_denom
    ee = (3.0 * tmp2 + i_s * (fx_im + 2.0 * fx) * dx) / dx**2
    ff = (3.0 * tmp3 + j_s * (fy_jm + 2.0 * fy) * dx) / dx**2
    gg = (-(fy_im - fy) + cc * dx**2) / (i_s * dx)

    X = -u * dt
    Y = -w * dt

    fn = ((a * X + cc * Y + ee) * X + gg * Y + fx) * X + ((bb * Y + dd * X + ff) * Y + fy) * Y + f
    Fx = (3.0 * a * X + 2.0 * cc * Y + 2.0 * ee) * X + (dd * Y + gg) * Y + fx
    Fy = (3.0 * bb * Y + 2.0 * dd * X + 2.0 * ff) * Y + (cc * X + gg) * X + fy

    dudx = 0.5 * (u_xp - u_xm) / dx
    dwdx = 0.5 * (w_xp - w_xm) / dx
    dudy = 0.5 * (_sy(u, 1) - _sy(u, -1)) / dx
    dwdy = 0.5 * (_sy(w, 1) - _sy(w, -1)) / dx
    fxn = Fx - dt * (Fx * dudx + Fy * dwdx) / 2.0
    fyn = Fy - dt * (Fx * dudy + Fy * dwdy) / 2.0

    fluid = fluid_ref[:] != 0
    fn_ref[0] = jnp.where(fluid, fn, alt_f[0])
    fxn_ref[0] = jnp.where(fluid, fxn, alt_fx[0])
    fyn_ref[0] = jnp.where(fluid, fyn, alt_fy[0])


def cip_advect_pallas(
    f, fx, fy, u, w, alt_f, alt_fx, alt_fy, fluid8,
    dt: float, dx: float, *, tile_x: int | None = None, interpret: bool = False,
):
    """Fused CIP advection phase.

    Equivalent to ``where(fluid, cip_advect(f, fx, fy, u, w), alt)`` per
    output (see :func:`fluid2d_tpu.ops.cip.cip_advect`), one HBM pass
    (plus the 3× halo re-reads of the five stencil inputs). `fluid8` is
    the fluid mask as int8; shapes: f/fx/fy/alt_* (C, X, Y), u/w (X, Y).
    """
    chans, x_rows, y_cols = f.shape
    # 22 double-buffered (t, Y) f32 tiles must fit in ~16 MB VMEM:
    # t ≤ 16MB / (2·22·Y·4B). For Y=1600 that means t=32.
    budget = 15 * 2**20 // (2 * 22 * y_cols * 4)
    t = tile_x or pick_tile(x_rows, preferred=max(8, budget))
    n_t = x_rows // t
    grid = (chans, n_t)

    def cspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    clamp_hi = lambda i: jnp.minimum(i + 1, n_t - 1)  # noqa: E731

    def halo3(chan: bool):
        if chan:
            return [
                cspec((1, t, y_cols), lambda c, i: (c, jnp.maximum(i - 1, 0), 0)),
                cspec((1, t, y_cols), lambda c, i: (c, i, 0)),
                cspec((1, t, y_cols), lambda c, i: (c, clamp_hi(i), 0)),
            ]
        return [
            cspec((t, y_cols), lambda c, i: (jnp.maximum(i - 1, 0), 0)),
            cspec((t, y_cols), lambda c, i: (i, 0)),
            cspec((t, y_cols), lambda c, i: (clamp_hi(i), 0)),
        ]

    center_c = cspec((1, t, y_cols), lambda c, i: (c, i, 0))
    mask_spec = cspec((t, y_cols), lambda c, i: (i, 0))

    kernel = functools.partial(_cip_kernel, n_t, dt, dx)
    out_shape = [jax.ShapeDtypeStruct(f.shape, f.dtype) for _ in range(3)]

    fn, fxn, fyn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[*halo3(True), *halo3(True), *halo3(True), *halo3(False), *halo3(False),
                  center_c, center_c, center_c, mask_spec],
        out_specs=[center_c, center_c, center_c],
        out_shape=out_shape,
        interpret=interpret,
    )(f, f, f, fx, fx, fx, fy, fy, fy, u, u, u, w, w, w, alt_f, alt_fx, alt_fy, fluid8)
    return fn, fxn, fyn
