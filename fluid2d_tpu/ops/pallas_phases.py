"""Whole-phase Pallas mega-kernels.

These fuse an entire solver phase into one HBM pass by cascading the
sub-steps on progressively narrower row windows inside the kernel (the
widest intermediate needs ≤ 8 halo rows, which one neighbor side-block
provides):

* :func:`cip_velocity_phase_pallas` — velocity BC → non-advection
  (pressure + diffusion) → gradient update → cubic CIP advection,
  i.e. ``fs/boundary_condition.py:16-39`` + ``fs/solver.py:192-332``
  minus confinement/pressure/limit, in ONE kernel. Outputs all six
  carried arrays (v, vx, vy current + their alternates).
* :func:`cip_dye_phase_pallas` — dye BC → diffusion → gradient update →
  CIP advection → [0,1] clamp (``DyeCipMacSolver``, ``fs/solver.py:353-401``).
* :func:`mac_velocity_phase_pallas` — velocity BC → fused momentum
  update for the upwind / Kawamura-Kuwahara schemes
  (``fs/solver.py:79-107``).
* :func:`mac_dye_phase_pallas` — dye BC → upwind/KK dye advection →
  clamp (``fs/solver.py:149-161``).

Window cascade bookkeeping: every expression function takes aligned row
windows and returns their interior; the kernel assembles the widest
window once from (cur, prev8, next8) blocks via
:func:`fluid2d_tpu.ops.pallas_stencil._ext` and slices down the chain.
Velocity-BC conflict semantics use the packed ``scene.vbc_code``
(docstring in scenes/compile.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluid2d_tpu.ops.pallas_stencil import (
    PallasInfeasibleError,
    _cast_store,
    _check_tile,
    _dma_ok,
    _HB,
    _k32,
    _HY,
    _center2d_spec,
    _center_spec,
    _center_spec_cgrid,
    _ext,
    _ext2d,
    _halo9_specs,
    _LH2,
    _center_spec_cgrid2,
    _halo_triple_specs,
    _halo_triple_specs_cgrid,
    _halo_triple_specs_cgrid2,
    _reclamp,
    _slide_fetch,
    _slide_tail_start,
    _sy,
    _vmem_tile,
    _wext,
    _win_spec,
    _win_spec_cgrid,
    center_bytes,
    cip_advect_window_expr,
    cip_velocity_ctx,
    ctx_load,
    ctx_store,
    log_traffic,
    nine_bytes,
    pick_tile,
    pick_tile2d,
    triple_bytes,
)

__all__ = [
    "cip_velocity_phase_pallas",
    "cip_dye_phase_pallas",
    "mac_velocity_phase_pallas",
    "mac_dye_phase_pallas",
]


from fluid2d_tpu.ops.limiters import clamp_field
from fluid2d_tpu.ops.stencil import tmax, tmin

# --- window expressions -----------------------------------------------------


def _velocity_bc_window(u_w, w_w, code, const_u, const_w):
    """Velocity BC (fs/boundary_condition.py:16-39) on aligned windows.

    `u_w`/`w_w` carry a ±2 row halo around `code`'s rows; `const_*`
    align with `code`. Returns (u, w) aligned with `code`.
    """
    n = code.shape[0]
    uc = u_w[2:-2]
    wc = w_w[2:-2]

    out_u = uc
    out_w = wc
    # Ghost mirrors (pattern k writes -v from two cells toward the fluid).
    out_u = jnp.where(code == 1, -u_w[0:n], out_u)
    out_w = jnp.where(code == 1, -w_w[0:n], out_w)
    out_u = jnp.where(code == 2, -u_w[4 : 4 + n], out_u)
    out_w = jnp.where(code == 2, -w_w[4 : 4 + n], out_w)
    out_u = jnp.where(code == 3, -_sy(uc, -2), out_u)
    out_w = jnp.where(code == 3, -_sy(wc, -2), out_w)
    out_u = jnp.where(code == 4, -_sy(uc, 2), out_u)
    out_w = jnp.where(code == 4, -_sy(wc, 2), out_w)
    # Inflow.
    out_u = jnp.where(code == 5, const_u, out_u)
    out_w = jnp.where(code == 5, const_w, out_w)
    # Outflow: x-component only, no backflow, reads the pre-BC value.
    out_u = jnp.where(code == 6, tmax(u_w[1 : 1 + n], jnp.float32(0.05)), out_u)
    return out_u, out_w


def _lap_window(f_w, dx: float):
    """∇²f on a ±1-halo window → interior rows (fs/differentiation.py:54-60).

    Divides by grid constants are strength-reduced to multiplies by
    Python-computed reciprocals throughout these helpers: Mosaic has no
    strength-reduction pass and a VPU divide costs several passes, while
    the reassociation stays within ~1 ulp of the reference's literal
    algebra (inside every Pallas-vs-jnp test tolerance; the jnp path
    keeps the reference's divides)."""
    inv_dx2 = 1.0 / dx**2
    fc = f_w[1:-1]
    ddx = f_w[2:] - 2.0 * fc + f_w[:-2]
    ddy = _sy(fc, 1) - 2.0 * fc + _sy(fc, -1)
    return (ddx + ddy) * inv_dx2


def _grad_pair_window(p_w, dx: float):
    """(∂p/∂x, ∂p/∂y) on a ±1-halo window → interior rows."""
    half_inv_dx = 0.5 / dx
    pc = p_w[1:-1]
    gx = (p_w[2:] - p_w[:-2]) * half_inv_dx
    gy = (_sy(pc, 1) - _sy(pc, -1)) * half_inv_dx
    return gx, gy


def _grad_update_window(g_c, delta_w, axis: str, dx: float):
    """CIP gradient update from the non-advection change
    (fs/solver.py:242-261): g + (Δ[+1] − Δ[−1]) / (2dx) along `axis`."""
    half_inv_dx = 0.5 / dx
    if axis == "x":
        return g_c + (delta_w[2:] - delta_w[:-2]) * half_inv_dx
    dc = delta_w[1:-1]
    return g_c + (_sy(dc, 1) - _sy(dc, -1)) * half_inv_dx


def _advect_upwind_window(u_c, w_c, phi_w, dx: float):
    """First-order upwind advection term (fs/advection.py:13-24) on a
    ±1-halo phi window; u/w aligned with the interior. The 1/dx scale
    factors out of both selected one-sided differences exactly, so the
    four divides become ONE trailing multiply."""
    inv_dx = 1.0 / dx
    pc = phi_w[1:-1]
    ax = u_c * jnp.where(u_c < 0.0, phi_w[2:] - pc, pc - phi_w[:-2])
    ay = w_c * jnp.where(w_c < 0.0, _sy(pc, 1) - pc, pc - _sy(pc, -1))
    return (ax + ay) * inv_dx


def _advect_kk_window(u_c, w_c, phi_w, dx: float):
    """Kawamura-Kuwahara advection term (fs/advection.py:28-60) on a
    ±2-halo phi window; u/w aligned with the interior."""
    n = u_c.shape[0]
    p2x, p1x = phi_w[4 : 4 + n], phi_w[3 : 3 + n]
    pc = phi_w[2 : 2 + n]
    m1x, m2x = phi_w[1 : 1 + n], phi_w[0:n]
    neg_x = -2.0 * p2x + 10.0 * p1x - 9.0 * pc + 2.0 * m1x - 1.0 * m2x
    pos_x = 1.0 * p2x - 2.0 * p1x + 9.0 * pc - 10.0 * m1x + 2.0 * m2x
    a = jnp.where(u_c < 0.0, neg_x, pos_x)

    p2y, p1y = _sy(pc, 2), _sy(pc, 1)
    m1y, m2y = _sy(pc, -1), _sy(pc, -2)
    neg_y = -2.0 * p2y + 10.0 * p1y - 9.0 * pc + 2.0 * m1y - 1.0 * m2y
    pos_y = 1.0 * p2y - 2.0 * p1y + 9.0 * pc - 10.0 * m1y + 2.0 * m2y
    b = jnp.where(w_c < 0.0, neg_y, pos_y)
    # 1/(6dx) factors out of both selected stencils (see _lap_window's
    # strength-reduction note): two divides become one multiply.
    return (u_c * a + w_c * b) * (1.0 / (6.0 * dx))


# --- CIP velocity phase kernel ----------------------------------------------


def _cip_velocity_body(
    ti, n_t: int, re: float, dt: float, dx: float,
    ve, pe, vae, vxe, vxae, vye, vyae, codee, conste, nwe, fluid,
    v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out, cs,
):
    """Shared compute: windows in, outputs written through `cs` (the
    column slicer — identity for 1-D row tiling, center-column slice for
    2-D tiling). Window row extents relative to the t output rows:
    ve ±5, pe/codee/conste ±3, vae/nwe ±2, vxe/vxae/vye/vyae ±1."""
    v_out, vx_out, vy_out = _cast_store(v_out), _cast_store(vx_out), _cast_store(vy_out)
    vna_out, vxna_out, vyna_out = (
        _cast_store(vna_out), _cast_store(vxna_out), _cast_store(vyna_out))
    # 1. Velocity BC on rows [-3, t+3); re-clamp so shifted reads of the
    #    COMPUTED vc match the jnp path's clamp-to-edge at grid ends.
    uc_bc, wc_bc = _velocity_bc_window(ve[0], ve[1], codee, conste[0], conste[1])
    uc_bc = _reclamp(uc_bc, ti, n_t, 3)
    wc_bc = _reclamp(wc_bc, ti, n_t, 3)

    # 2. Non-advection phase on rows [-2, t+2):
    #    fn = fc + (-∇p + ∇²fc/Re)·dt at not-wall, else the alt buffer.
    gpx, gpy = _grad_pair_window(pe, dx)  # rows [-2, t+2)
    nw_mid = nwe != 0  # rows [-2, t+2)
    inv_re = 1.0 / re  # strength-reduced (see _lap_window)
    u_na = jnp.where(nw_mid, uc_bc[1:-1] + (-gpx + _lap_window(uc_bc, dx) * inv_re) * dt, vae[0])
    w_na = jnp.where(nw_mid, wc_bc[1:-1] + (-gpy + _lap_window(wc_bc, dx) * inv_re) * dt, vae[1])
    u_na = _reclamp(u_na, ti, n_t, 2)
    w_na = _reclamp(w_na, ti, n_t, 2)

    # 3+4. Gradient update (rows [-1, t+1)) then CIP advection at fluid
    #    cells, carried by the phase-1 velocity; non-fluid keeps the
    #    BC'd pre-phase velocity / pre-phase grads. One channel at a
    #    time, each output stored as soon as it is computed — Mosaic's
    #    VMEM stack follows trace-order liveness, so finishing the u
    #    channel before creating the w channel's temporaries nearly
    #    halves the kernel's peak live set (→ larger feasible tiles).
    nw_in = nw_mid[1:-1]  # rows [-1, t+1)
    u_na_in = u_na[1:-1]  # rows [-1, t+1)
    w_na_in = w_na[1:-1]
    vna_out[0] = cs(u_na[2:-2])
    vna_out[1] = cs(w_na[2:-2])
    # Carrying-velocity context shared by both channels (Mosaic has no
    # CSE pass over the traced loop body).
    vctx = cip_velocity_ctx(u_na_in, w_na_in, dt, dx)

    for c, (f_na, fc_bc, delta) in enumerate(
        ((u_na, uc_bc, lambda: u_na - uc_bc[1:-1]),
         (w_na, wc_bc, lambda: w_na - wc_bc[1:-1]))
    ):
        d = delta()  # rows [-2, t+2)
        gx_na = jnp.where(nw_in, _grad_update_window(vxe[c], d, "x", dx), vxae[c])
        gy_na = jnp.where(nw_in, _grad_update_window(vye[c], d, "y", dx), vyae[c])
        gx_na = _reclamp(gx_na, ti, n_t, 1)
        gy_na = _reclamp(gy_na, ti, n_t, 1)
        vxna_out[c] = cs(gx_na[1:-1])
        vyna_out[c] = cs(gy_na[1:-1])
        fn, fxn, fyn = cip_advect_window_expr(
            f_na[1:-1], gx_na, gy_na, u_na_in, w_na_in, dt, dx, ctx=vctx
        )
        v_out[c] = jnp.where(fluid, cs(fn), cs(fc_bc[3:-3]))
        vx_out[c] = jnp.where(fluid, cs(fxn), cs(vxe[c][1:-1]))
        vy_out[c] = jnp.where(fluid, cs(fyn), cs(vye[c][1:-1]))


def _cip_velocity_kernel(
    n_t: int, re: float, dt: float, dx: float,
    v_c, v_p8, v_n8, p_c, p_p8, p_n8, va_c, va_p8, va_n8,
    vx_c, vx_p8, vx_n8, vxa_c, vxa_p8, vxa_n8,
    vy_c, vy_p8, vy_n8, vya_c, vya_p8, vya_n8,
    code_c, code_p8, code_n8, const_c, const_p8, const_n8,
    nw_c, nw_p8, nw_n8, fluid_ref,
    v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out,
):
    ti = pl.program_id(0)
    ve = _ext(v_c[:], v_p8[:], v_n8[:], ti, n_t, 5)
    pe = _ext(p_c[:], p_p8[:], p_n8[:], ti, n_t, 3)
    vae = _ext(va_c[:], va_p8[:], va_n8[:], ti, n_t, 2)
    vxe = _ext(vx_c[:], vx_p8[:], vx_n8[:], ti, n_t, 1)
    vxae = _ext(vxa_c[:], vxa_p8[:], vxa_n8[:], ti, n_t, 1)
    vye = _ext(vy_c[:], vy_p8[:], vy_n8[:], ti, n_t, 1)
    vyae = _ext(vya_c[:], vya_p8[:], vya_n8[:], ti, n_t, 1)
    codee = _ext(code_c[:], code_p8[:], code_n8[:], ti, n_t, 3).astype(jnp.int32)
    conste = _ext(const_c[:], const_p8[:], const_n8[:], ti, n_t, 3)
    nwe = _ext(nw_c[:], nw_p8[:], nw_n8[:], ti, n_t, 2).astype(jnp.int32)
    fluid = fluid_ref[:] != 0
    _cip_velocity_body(
        ti, n_t, re, dt, dx,
        ve, pe, vae, vxe, vxae, vye, vyae, codee, conste, nwe, fluid,
        v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out, lambda a: a,
    )


def _cip_velocity_kernel_win(
    n_t: int, t: int, re: float, dt: float, dx: float,
    v_w, p_w, va_w, vx_w, vxa_w, vy_w, vya_w, const_w,
    code_c, code_p8, code_n8, nw_c, nw_p8, nw_n8, fluid_ref,
    v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out,
):
    """The folded 1-D velocity kernel with element-offset WINDOW inputs:
    each f32 input is one (lead, t+16, Y) block instead of a halo triple
    (see the "single-window input fetch" note in pallas_stencil.py). The
    int8 codes/masks keep the triple path."""
    ti = pl.program_id(0)
    ve = _wext(v_w[:], ti, n_t, t, 5)
    pe = _wext(p_w[:], ti, n_t, t, 3)
    vae = _wext(va_w[:], ti, n_t, t, 2)
    vxe = _wext(vx_w[:], ti, n_t, t, 1)
    vxae = _wext(vxa_w[:], ti, n_t, t, 1)
    vye = _wext(vy_w[:], ti, n_t, t, 1)
    vyae = _wext(vya_w[:], ti, n_t, t, 1)
    conste = _wext(const_w[:], ti, n_t, t, 3)
    codee = _ext(code_c[:], code_p8[:], code_n8[:], ti, n_t, 3).astype(jnp.int32)
    nwe = _ext(nw_c[:], nw_p8[:], nw_n8[:], ti, n_t, 2).astype(jnp.int32)
    fluid = fluid_ref[:] != 0
    _cip_velocity_body(
        ti, n_t, re, dt, dx,
        ve, pe, vae, vxe, vxae, vye, vyae, codee, conste, nwe, fluid,
        v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out, lambda a: a,
    )


def _cip_velocity_kernel_slide(
    n_t: int, t: int, x_rows: int, re: float, dt: float, dx: float,
    v_h, p_h, va_h, vx_h, vxa_h, vy_h, vya_h, const_h,
    code_c, code_p8, code_n8, nw_c, nw_p8, nw_n8, fluid_ref,
    v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out,
    win_ref, sems, head_sems,
):
    """The folded 1-D velocity kernel with SLIDING windows for the eight
    f32 arrays (see the "sliding-window fetch" note in pallas_stencil.py):
    interior tiles fetch only the t new rows of each plane. Plane layout
    = :data:`_VEL_DMA_PLANES`. The int8 codes/masks keep the triple path."""
    ti = pl.program_id(0)
    slot = jax.lax.rem(ti, 2)
    rows = t + 2 * _HB
    hbm = (v_h, p_h, va_h, vx_h, vxa_h, vy_h, vya_h, const_h)

    def plane_dmas(ds_r, r0: int, nr: int, s):
        dst_r = pl.ds(r0, nr)
        out = []
        for a, (ref, (p0, lead)) in enumerate(zip(hbm, _VEL_DMA_PLANES)):
            if lead is None:
                src = ref.at[ds_r, :]
                dst = win_ref.at[s, p0, dst_r]
            else:
                src = ref.at[:, ds_r, :]
                dst = win_ref.at[s, p0 : p0 + lead, dst_r]
            out.append(pltpu.make_async_copy(src, dst, sems.at[s, a]))
        return out

    def full_dmas(s):
        return plane_dmas(pl.ds(0, rows), 0, rows, s)

    def tail_dmas(tin, s):
        return plane_dmas(pl.ds(_slide_tail_start(tin, t, x_rows), t), 2 * _HB, t, s)

    _slide_fetch(win_ref, full_dmas, tail_dmas, ti, n_t, t, slot,
                 head_sems=head_sems)

    def w(p0, lead, hx):
        r0, r1 = _HB - hx, _HB + t + hx
        if lead is None:
            return _k32(win_ref[slot, p0, r0:r1, :])
        return _k32(win_ref[slot, p0 : p0 + lead, r0:r1, :])

    ve, pe, vae = w(0, 2, 5), w(2, None, 3), w(3, 2, 2)
    vxe, vxae, vye, vyae = w(5, 2, 1), w(7, 2, 1), w(9, 2, 1), w(11, 2, 1)
    conste = w(13, 2, 3)
    codee = _ext(code_c[:], code_p8[:], code_n8[:], ti, n_t, 3).astype(jnp.int32)
    nwe = _ext(nw_c[:], nw_p8[:], nw_n8[:], ti, n_t, 2).astype(jnp.int32)
    fluid = fluid_ref[:] != 0
    _cip_velocity_body(
        ti, n_t, re, dt, dx,
        ve, pe, vae, vxe, vxae, vye, vyae, codee, conste, nwe, fluid,
        v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out, lambda a: a,
    )


def _cip_velocity_kernel_cgrid(
    n_t: int, re: float, dt: float, dx: float,
    v_c, v_p8, v_n8, p_c, p_p8, p_n8, va_c, va_p8, va_n8,
    vx_c, vx_p8, vx_n8, vxa_c, vxa_p8, vxa_n8,
    vy_c, vy_p8, vy_n8, vya_c, vya_p8, vya_n8,
    code_c, code_p8, code_n8, const_c, const_p8, const_n8,
    nw_c, nw_p8, nw_n8, fluid_ref,
    v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out,
    na_ref, bc_ref, ctx_ref,
):
    """Channel-grid variant of the CIP velocity phase: grid ``(n_t, 2)``
    with the velocity channel minor. The channel-coupled phases (BC +
    non-advection + carrying-velocity context) run once per row tile at
    c==0 and spill to VMEM scratch; each program then advects ONE
    channel's (f, fx, fy). This drops the per-program live set to one
    channel's gradient inputs/outputs + one channel's advect DAG — the
    same layout that made the dye kernel's 1-D t=8 tiles feasible at
    Y=4096 where the folded kernel cannot compile (its 15-channel +
    two-channel-DAG footprint exceeds VMEM at any t)."""
    ti = pl.program_id(0)
    c = pl.program_id(1)
    v_out, vx_out, vy_out = _cast_store(v_out), _cast_store(vx_out), _cast_store(vy_out)
    vna_out, vxna_out, vyna_out = (
        _cast_store(vna_out), _cast_store(vxna_out), _cast_store(vyna_out))

    @pl.when(c == 0)
    def _():
        ve = _ext(v_c[:], v_p8[:], v_n8[:], ti, n_t, 5)
        pe = _ext(p_c[:], p_p8[:], p_n8[:], ti, n_t, 3)
        vae = _ext(va_c[:], va_p8[:], va_n8[:], ti, n_t, 2)
        codee = _ext(code_c[:], code_p8[:], code_n8[:], ti, n_t, 3).astype(jnp.int32)
        conste = _ext(const_c[:], const_p8[:], const_n8[:], ti, n_t, 3)
        nwe = _ext(nw_c[:], nw_p8[:], nw_n8[:], ti, n_t, 2).astype(jnp.int32)
        uc_bc, wc_bc = _velocity_bc_window(ve[0], ve[1], codee, conste[0], conste[1])
        uc_bc = _reclamp(uc_bc, ti, n_t, 3)
        wc_bc = _reclamp(wc_bc, ti, n_t, 3)
        gpx, gpy = _grad_pair_window(pe, dx)
        nw_mid = nwe != 0
        inv_re = 1.0 / re  # strength-reduced (see _lap_window)
        u_na = jnp.where(
            nw_mid, uc_bc[1:-1] + (-gpx + _lap_window(uc_bc, dx) * inv_re) * dt, vae[0]
        )
        w_na = jnp.where(
            nw_mid, wc_bc[1:-1] + (-gpy + _lap_window(wc_bc, dx) * inv_re) * dt, vae[1]
        )
        u_na = _reclamp(u_na, ti, n_t, 2)
        w_na = _reclamp(w_na, ti, n_t, 2)
        na_ref[0] = u_na  # rows [-2, t+2)
        na_ref[1] = w_na
        bc_ref[0] = uc_bc[1:-1]  # rows [-2, t+2)
        bc_ref[1] = wc_bc[1:-1]
        ctx_store(ctx_ref, u_na[1:-1], w_na[1:-1], dt, dx)

    # --- per-channel advection (both c values) ---
    nwe2 = _ext(nw_c[:], nw_p8[:], nw_n8[:], ti, n_t, 2).astype(jnp.int32)
    nw_in = (nwe2 != 0)[1:-1]
    fluid = fluid_ref[:] != 0
    is0 = c == 0
    f_na = jnp.where(is0, na_ref[0], na_ref[1])  # rows [-2, t+2)
    fc_bc = jnp.where(is0, bc_ref[0], bc_ref[1])
    u_na_in = na_ref[0][1:-1]  # carrier: both channels, rows [-1, t+1)
    w_na_in = na_ref[1][1:-1]
    vctx = ctx_load(ctx_ref)

    vxe = _ext(vx_c[0], vx_p8[0], vx_n8[0], ti, n_t, 1)
    vxae = _ext(vxa_c[0], vxa_p8[0], vxa_n8[0], ti, n_t, 1)
    vye = _ext(vy_c[0], vy_p8[0], vy_n8[0], ti, n_t, 1)
    vyae = _ext(vya_c[0], vya_p8[0], vya_n8[0], ti, n_t, 1)

    vna_out[0] = f_na[2:-2]  # each program writes its own channel block
    d = f_na - fc_bc  # rows [-2, t+2)
    gx_na = jnp.where(nw_in, _grad_update_window(vxe, d, "x", dx), vxae)
    gy_na = jnp.where(nw_in, _grad_update_window(vye, d, "y", dx), vyae)
    gx_na = _reclamp(gx_na, ti, n_t, 1)
    gy_na = _reclamp(gy_na, ti, n_t, 1)
    vxna_out[0] = gx_na[1:-1]
    vyna_out[0] = gy_na[1:-1]
    fn, fxn, fyn = cip_advect_window_expr(
        f_na[1:-1], gx_na, gy_na, u_na_in, w_na_in, dt, dx, ctx=vctx
    )
    v_out[0] = jnp.where(fluid, fn, fc_bc[2:-2])
    vx_out[0] = jnp.where(fluid, fxn, vxe[1:-1])
    vy_out[0] = jnp.where(fluid, fyn, vye[1:-1])


def _cip_velocity_kernel_2d(
    n_tx: int, n_ty: int, ty: int, re: float, dt: float, dx: float,
    *refs,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    it = iter(refs)
    nine = lambda: [next(it) for _ in range(9)]
    v9, p9, va9 = nine(), nine(), nine()
    vx9, vxa9, vy9, vya9 = nine(), nine(), nine(), nine()
    code9, const9, nw9 = nine(), nine(), nine()
    fluid_ref = next(it)
    v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out = (next(it) for _ in range(6))

    e2 = lambda r9, hx: _ext2d([r[:] for r in r9], ti, tj, n_tx, n_ty, hx)
    # int8 lane-dim concats are unsupported by Mosaic — widen BEFORE _ext2d.
    e2i = lambda r9, hx: _ext2d([r[:].astype(jnp.int32) for r in r9], ti, tj, n_tx, n_ty, hx)
    ve = e2(v9, 5)
    pe = e2(p9, 3)
    vae = e2(va9, 2)
    vxe = e2(vx9, 1)
    vxae = e2(vxa9, 1)
    vye = e2(vy9, 1)
    vyae = e2(vya9, 1)
    codee = e2i(code9, 3)
    conste = e2(const9, 3)
    nwe = e2i(nw9, 2)
    fluid = fluid_ref[:] != 0

    cs = lambda a: a[..., :, _LH2 : _LH2 + ty]
    _cip_velocity_body(
        ti, n_tx, re, dt, dx,
        ve, pe, vae, vxe, vxae, vye, vyae, codee, conste, nwe, fluid,
        v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out, cs,
    )


def cip_velocity_phase_pallas(
    v, p, v_alt, vx, vx_alt, vy, vy_alt, scene,
    re: float, dt: float, dx: float,
    *, tile_x: int | None = None, interpret: bool = False,
    channel_grid: bool | None = None, dma_windows: bool | None = None,
    dma_slide: bool | None = None, window_inputs: bool | None = None,
    sliding: bool | None = None,
):
    """Whole CIP velocity phase (BC + non-advection + grads + advection).

    Returns ``(v_cur, vx_cur, vy_cur, v_na, vx_na, vy_na)`` — the first
    three are the advected state, the latter three become the alternate
    buffers (exactly like the jnp composition in models/cip.py). Uses
    row tiling when the lane width fits VMEM; when it does not,
    ``channel_grid`` (auto/None) tries the 1-D (n_t, 2) c-minor layout
    (one channel's advect DAG per program, shared phases in VMEM
    scratch — :func:`_cip_velocity_kernel_cgrid`) before falling back to
    2-D tiling; True/False force/skip the channel grid.
    """
    x_rows, y_cols = p.shape
    # Manual-DMA fetch variants (sliding / DMA-window) need every window
    # plane in ONE float dtype — f32 or bf16 (the transport-dtype note
    # in pallas_stencil.py; bf16's sub-tile row offsets validated on
    # chip by scripts/bf16_dma_probe.py).
    dma_able = _dma_ok(v, p, v_alt, scene.bc_const)
    if (dma_slide is True or dma_windows is True) and not dma_able:
        msg = "manual-DMA velocity variants need a uniform f32/bf16 dtype"
        raise PallasInfeasibleError(msg)

    def cost_rows(t: int) -> float:
        # 15 f32 halo channels (v 2, p 1, v_alt 2, grads+alts 8, const 2)
        # + i8 codes/masks + 12 output channels + fluid, plus stack. The
        # stack coefficient pins BOTH measured frontiers: at the 16 MiB
        # default limit t=16 compiles (+7%, 157 vs 146) and t=24 is
        # rejected; at the raised 24 MiB limit t=32 compiles AND wins
        # (+9%, 257.0 vs 235.8 auto, `--variant cip-vel-tile`) while
        # t=48 fails Mosaic compilation — coefficient 38 reproduces
        # exactly that boundary (55 would reject the measured-best t=32).
        blocks = 15.5 * (t + 2 * _HB) + 12.25 * t
        return 2 * blocks + 38 * t

    t = _check_tile(tile_x, x_rows) if tile_x else _vmem_tile(x_rows, y_cols, cost_rows)
    if (tile_x is None and t is not None and t >= 32
            and v.dtype == jnp.bfloat16):
        # bf16 frontier bump (measured round-5, `cip-vel-tile --dtype
        # bfloat16`): t=80 beats auto(64) 333.1 vs 324.5 and t=128 reads
        # 332.3 — prefer 1.25× the f32 pick where a valid divisor
        # exists (80 at Y=1600). Same t ≥ 32 and ≥48 MiB arena guards
        # as the dye pick (measured only at the raised limit).
        from fluid2d_tpu.utils.tpu_flags import scoped_vmem_bytes

        if scoped_vmem_bytes() >= 48 * 2**20:
            t = pick_tile(x_rows, preferred=t + t // 4) or t
    # channel_grid=None keeps the measured dispatch (folded 1-D, else
    # 2-D); True forces the c-minor layout. Not auto-tried on folded-
    # infeasible grids until it is benchmarked there: feasibility ≠ perf
    # (docs/BENCH.md ledger, the t=16@4096 collapse).
    if channel_grid is True:
        return _cip_velocity_phase_cgrid(
            v, p, v_alt, vx, vx_alt, vy, vy_alt, scene, re, dt, dx,
            tile_x=tile_x, interpret=interpret,
        )
    if dma_slide is True:
        return _cip_velocity_phase_2d_slide(
            v, p, v_alt, vx, vx_alt, vy, vy_alt, scene, re, dt, dx, interpret=interpret
        )
    if dma_windows is True:
        return _cip_velocity_phase_2d_dma(
            v, p, v_alt, vx, vx_alt, vy, vy_alt, scene, re, dt, dx, interpret=interpret
        )
    if t is None:
        # DMA-window fetch beats 9-block assembly when the lane width is
        # 128-aligned (measured at res=4096, docs/BENCH.md), and the
        # row-sliding variant beats the full-window one (it ships ~1/3
        # of the bytes on this DMA-paced phase). dma_slide=False skips
        # the sliding variant; dma_windows=False forces 9-block.
        if dma_windows is None and dma_able:
            if dma_slide is None and _pick_tile2d_slide(x_rows, y_cols) is not None:
                return _cip_velocity_phase_2d_slide(
                    v, p, v_alt, vx, vx_alt, vy, vy_alt, scene, re, dt, dx,
                    interpret=interpret,
                )
            if _pick_tile2d_dma(x_rows, y_cols) is not None:
                return _cip_velocity_phase_2d_dma(
                    v, p, v_alt, vx, vx_alt, vy, vy_alt, scene, re, dt, dx,
                    interpret=interpret,
                )
        return _cip_velocity_phase_2d(
            v, p, v_alt, vx, vx_alt, vy, vy_alt, scene, re, dt, dx, interpret=interpret
        )
    if (tile_x is None and t <= _HB and dma_windows is None
            and dma_slide is None and dma_able
            and _pick_tile2d_slide(x_rows, y_cols) is not None):
        # Measured at res=4096 under the raised scoped-VMEM limit: the
        # 1-D kernel now COMPILES at t=8 but loses to the row-sliding
        # 2-D kernel (30.6 vs 31.7 steps/s, `--variant cip-vel-tile
        # --tiles 8`) — a t=8 row window amplifies the VPU-side work
        # 2.25× while the 2-D tile runs t=16. Prefer 2-D when the 1-D
        # pick is VMEM-starved down to one halo block.
        return _cip_velocity_phase_2d_slide(
            v, p, v_alt, vx, vx_alt, vy, vy_alt, scene, re, dt, dx,
            interpret=interpret,
        )
    n_t = x_rows // t

    # Sliding-window fetch for the eight f32 arrays (manual DMAs: needs
    # a 128-aligned lane width). Default OFF — unlike the other 1-D
    # sliding kernels, this one measured a consistent LOSS at res=1664
    # (192.6 vs 197.9 steps/s, interleaved A/B, `--variant
    # cip-vel-slide1d`): at the velocity kernel's 15-plane window the
    # (2, 15, t+16, Y) scratch squeezes the pipeline's double-buffering
    # headroom and the 8-descriptor issue serializes against compute.
    # Selectable for future re-measurement; bitwise vs triples
    # (tests/test_pallas.py).
    if sliding is None:
        sliding = False
    if sliding and dma_able and y_cols % _HY == 0 and x_rows >= t + 2 * _HB and n_t >= 2:
        rows = t + 2 * _HB
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        i8 = lambda: _halo_triple_specs(t, y_cols, n_t, None)  # noqa: E731
        specs = [any_spec] * 8 + i8() + i8() + [_center_spec(t, y_cols, None)]
        args = (
            [v, p, v_alt, vx, vx_alt, vy, vy_alt, scene.bc_const]
            + [scene.vbc_code] * 3 + [scene.not_wall8] * 3 + [scene.fluid8]
        )
        log_traffic(
            "cip_velocity",
            15 * (rows + (n_t - 1) * t) * y_cols * v.dtype.itemsize
            + 2 * triple_bytes(x_rows, y_cols, t, None, itemsize=1)
            + center_bytes(x_rows, y_cols, None, itemsize=1)
            + 12 * center_bytes(x_rows, y_cols, None, itemsize=v.dtype.itemsize),
        )
        kernel = functools.partial(
            _cip_velocity_kernel_slide, n_t, t, x_rows, re, dt, dx)
        return pl.pallas_call(
            kernel,
            grid=(n_t,),
            in_specs=specs,
            out_specs=[_center_spec(t, y_cols, 2)] * 6,
            out_shape=[jax.ShapeDtypeStruct(v.shape, v.dtype)] * 6,
            scratch_shapes=[
                pltpu.VMEM((2, _VEL_DMA_NPLANES, rows, y_cols), v.dtype),
                pltpu.SemaphoreType.DMA((2, len(_VEL_DMA_PLANES))),
                pltpu.SemaphoreType.DMA(2),
            ],
            interpret=interpret,
        )(*args)

    if window_inputs is None:
        window_inputs = False  # see the measured note in cip_dye_phase_pallas
    window_inputs = window_inputs and x_rows >= t + 2 * _HB
    if window_inputs:
        w2 = _win_spec(t, y_cols, n_t, 2)
        i8 = lambda: _halo_triple_specs(t, y_cols, n_t, None)  # noqa: E731
        specs = (
            [w2, _win_spec(t, y_cols, n_t, None), w2, w2, w2, w2, w2, w2]
            + i8() + i8() + [_center_spec(t, y_cols, None)]
        )
        args = (
            [v, p, v_alt, vx, vx_alt, vy, vy_alt, scene.bc_const]
            + [scene.vbc_code] * 3 + [scene.not_wall8] * 3 + [scene.fluid8]
        )
    else:
        h2 = lambda lead: _halo_triple_specs(t, y_cols, n_t, lead)  # noqa: E731
        specs = (
            h2(2) + h2(None) + h2(2) + h2(2) + h2(2) + h2(2) + h2(2)
            + h2(None) + h2(2) + h2(None) + [_center_spec(t, y_cols, None)]
        )
        args = (
            [v] * 3 + [p] * 3 + [v_alt] * 3 + [vx] * 3 + [vx_alt] * 3
            + [vy] * 3 + [vy_alt] * 3
            + [scene.vbc_code] * 3 + [scene.bc_const] * 3
            + [scene.not_wall8] * 3 + [scene.fluid8]
        )
    log_traffic(
        "cip_velocity",
        15 * triple_bytes(x_rows, y_cols, t, None, itemsize=v.dtype.itemsize)
        + 2 * triple_bytes(x_rows, y_cols, t, None, itemsize=1)
        + center_bytes(x_rows, y_cols, None, itemsize=1)
        + 12 * center_bytes(x_rows, y_cols, None, itemsize=v.dtype.itemsize),
        t=t,
    )

    if window_inputs:
        kernel = functools.partial(_cip_velocity_kernel_win, n_t, t, re, dt, dx)
    else:
        kernel = functools.partial(_cip_velocity_kernel, n_t, re, dt, dx)
    out_sd = jax.ShapeDtypeStruct(v.shape, v.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=specs,
        out_specs=[_center_spec(t, y_cols, 2)] * 6,
        out_shape=[out_sd] * 6,
        interpret=interpret,
    )(*args)


def _cip_velocity_phase_cgrid(
    v, p, v_alt, vx, vx_alt, vy, vy_alt, scene, re, dt, dx,
    *, tile_x: int | None = None, interpret: bool = False,
):
    x_rows, y_cols = p.shape

    def cost_rows(t: int) -> float:
        # Shared f32 triples (v 2, p 1, v_alt 2, const 2) + ~0.5 i8 +
        # per-channel grads (4 one-channel triples) + 7 output rows
        # (5 c-blocks + the 2-channel vna) + fluid; VMEM scratch
        # (na 2·(t+4) + bc 2·(t+4) + ctx 10·t, single-buffered); stack =
        # max(shared-phase DAG, one channel's advect DAG) — trace-order
        # liveness frees the shared phase once it is spilled to scratch.
        # Coefficient 25 ≈ the dye kernel's calibrated 20 + the
        # where-selects over the scratch planes; REQUIRES on-TPU
        # calibration like every other model here (feasibility ≠ perf).
        blocks = (7 + 4 + 0.5) * (t + 2 * _HB) + 7.25 * t
        scratch = 4 * (t + 4) + 10 * t
        return 2 * blocks + scratch + 25 * t

    t = _check_tile(tile_x, x_rows) if tile_x else _vmem_tile(x_rows, y_cols, cost_rows)
    if t is None:
        msg = f"no valid cgrid tile for grid ({x_rows}, {y_cols})"
        raise PallasInfeasibleError(msg)
    n_t = x_rows // t

    hc = lambda lead: _halo_triple_specs_cgrid(t, y_cols, n_t, lead)  # noqa: E731
    specs = (
        hc(2) + hc(None) + hc(2) + hc("c") + hc("c") + hc("c") + hc("c")
        + hc(None) + hc(2) + hc(None) + [_center_spec_cgrid(t, y_cols, None)]
    )
    args = (
        [v] * 3 + [p] * 3 + [v_alt] * 3 + [vx] * 3 + [vx_alt] * 3 + [vy] * 3 + [vy_alt] * 3
        + [scene.vbc_code] * 3 + [scene.bc_const] * 3 + [scene.not_wall8] * 3 + [scene.fluid8]
    )
    # DMA totals equal the folded kernel's: per-channel triples stream
    # once per (tile, channel) = once over each array, constant-index
    # shared blocks once per tile.
    log_traffic(
        "cip_velocity",
        15 * triple_bytes(x_rows, y_cols, t, None, itemsize=v.dtype.itemsize)
        + 2 * triple_bytes(x_rows, y_cols, t, None, itemsize=1)
        + center_bytes(x_rows, y_cols, None, itemsize=1)
        + 12 * center_bytes(x_rows, y_cols, None, itemsize=v.dtype.itemsize),
        t=t,
    )

    kernel = functools.partial(_cip_velocity_kernel_cgrid, n_t, re, dt, dx)
    out_sd = jax.ShapeDtypeStruct(v.shape, v.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n_t, 2),
        in_specs=specs,
        out_specs=[_center_spec_cgrid(t, y_cols, "c")] * 6,
        out_shape=[out_sd] * 6,
        scratch_shapes=[
            pltpu.VMEM((2, t + 4, y_cols), jnp.float32),
            pltpu.VMEM((2, t + 4, y_cols), jnp.float32),
            pltpu.VMEM((10, t, y_cols), jnp.float32),
        ],
        interpret=interpret,
    )(*args)


def _cost2d(n_f32_halo: float, n_i8_halo: float, n_center: float):
    """VMEM byte model shared by the 2-D kernels: nine-block footprints
    for halo inputs (double-buffered), center blocks, and the Mosaic
    stack for the window-sized expression DAG."""

    def cost(t: int, ty: int) -> int:
        per_ch = t * ty + 2 * _HB * ty + 2 * t * _HY + 4 * _HB * _HY
        blocks = (n_f32_halo + n_i8_halo / 4) * per_ch + n_center * t * ty
        stack = 60 * t * (ty + 2 * _HY)
        return int(4 * (2 * blocks + stack))

    return cost


# velocity: 15 f32 halo ch (v2, p1, valt2, grads+alts 8, const2), 2 i8,
# 12 output ch + fluid.
_cip_velocity_cost2d = _cost2d(15, 2, 13)


def _cip_velocity_phase_2d(
    v, p, v_alt, vx, vx_alt, vy, vy_alt, scene, re, dt, dx, *, interpret=False
):
    x_rows, y_cols = p.shape
    tile = pick_tile2d(x_rows, y_cols, _cip_velocity_cost2d, halo_x=5)
    if tile is None:
        msg = f"no valid 1-D or 2-D tile for grid ({x_rows}, {y_cols})"
        raise PallasInfeasibleError(msg)
    t, ty = tile
    n_tx, n_ty = x_rows // t, y_cols // ty

    h9 = lambda lead: _halo9_specs(t, ty, n_tx, n_ty, lead)  # noqa: E731
    specs = (
        h9(2) + h9(None) + h9(2) + h9(2) + h9(2) + h9(2) + h9(2)
        + h9(None) + h9(2) + h9(None) + [_center2d_spec(t, ty, None)]
    )
    args = (
        [v] * 9 + [p] * 9 + [v_alt] * 9 + [vx] * 9 + [vx_alt] * 9 + [vy] * 9 + [vy_alt] * 9
        + [scene.vbc_code] * 9 + [scene.bc_const] * 9 + [scene.not_wall8] * 9 + [scene.fluid8]
    )
    log_traffic(
        "cip_velocity_2d",
        15 * nine_bytes(x_rows, y_cols, t, ty, None, itemsize=v.dtype.itemsize)
        + 2 * nine_bytes(x_rows, y_cols, t, ty, None, itemsize=1)
        + center_bytes(x_rows, y_cols, None, itemsize=1)
        + 12 * center_bytes(x_rows, y_cols, None, itemsize=v.dtype.itemsize),
    )

    kernel = functools.partial(_cip_velocity_kernel_2d, n_tx, n_ty, ty, re, dt, dx)
    out_sd = jax.ShapeDtypeStruct(v.shape, v.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n_tx, n_ty),
        in_specs=specs,
        out_specs=[_center2d_spec(t, ty, 2)] * 6,
        out_shape=[out_sd] * 6,
        interpret=interpret,
    )(*args)


# --- DMA-window variant of the 2-D CIP velocity phase ------------------------
#
# The 9-block scheme assembles each input's halo window with ~12 VPU
# passes (band concats + edge-fix selects) — measured as the res=4096
# per-cell gap vs res=1600 (docs/BENCH.md "Large grids"). When the lane
# width is 128-aligned (Y % 128 == 0, true at res=4096 but NOT at 1600),
# the whole rectangular window [r0-8, r0+t+8) × [c0-128, c0+ty+128) can
# instead be fetched with ONE strided make_async_copy per input into
# VMEM scratch: zero assembly work on interior tiles. The inputs stay in
# HBM (memory_space=ANY); windows are double-buffered across grid steps
# (program g prefetches g+1's windows before waiting on its own, so the
# DMA rides under the VPU compute exactly like the BlockSpec pipeline).
# Global-edge tiles fix their window in place under @pl.when: the DMA
# start offsets are clamped into the array, which shifts the fetched
# window by one halo block; the fix shifts it back and replicates the
# true edge row/column (raw clamp-to-edge, same as _ext2d). The two int8
# inputs keep the 9-block path: int8 sublane shifts relayout at (8,·)
# granularity, and they are 2 of 17 inputs.

# f32 plane layout in the DMA window scratch: (array, first plane, lead).
_VEL_DMA_PLANES = ((0, 2), (2, None), (3, 2), (5, 2), (7, 2), (9, 2), (11, 2), (13, 2))
_VEL_DMA_NPLANES = 15


def _lane_rep(col, n: int, dtype):
    """Replicate a single column across `n` lanes, bf16-safe: Mosaic's
    minor-dim (lane) broadcast is 32-bit-only ("Insertion of minor dim
    that is not a no-op only supported for 32-bit types"), so bf16
    columns round-trip through f32 — bf16→f32→bf16 is lossless."""
    if dtype == jnp.bfloat16:
        return jnp.repeat(col.astype(jnp.float32), n, axis=-1).astype(dtype)
    return jnp.repeat(col, n, axis=-1)


def _dma_window_fixes(win_ref, slot, nplanes, ti, tj, n_tx, n_ty, rows, cols):
    """Re-align a clamped-offset DMA window at global-edge tiles and
    replicate the true edge row/column into the halo (raw clamp-to-edge,
    matching :func:`_ext2d`). Per-plane loops keep the in-place shifts'
    temporaries one (rows, cols) slab, not nplanes of them."""

    @pl.when(ti == 0)
    def _():
        for k in range(nplanes):
            body = win_ref[slot, k, : rows - _HB, :]
            win_ref[slot, k, _HB:, :] = body
            win_ref[slot, k, :_HB, :] = jnp.repeat(
                win_ref[slot, k, _HB : _HB + 1, :], _HB, axis=0
            )

    @pl.when(ti == n_tx - 1)
    def _():
        for k in range(nplanes):
            body = win_ref[slot, k, _HB:, :]
            win_ref[slot, k, : rows - _HB, :] = body
            win_ref[slot, k, rows - _HB :, :] = jnp.repeat(
                win_ref[slot, k, rows - _HB - 1 : rows - _HB, :], _HB, axis=0
            )

    @pl.when(tj == 0)
    def _():
        for k in range(nplanes):
            body = win_ref[slot, k, :, : cols - _HY]
            win_ref[slot, k, :, _HY:] = body
            win_ref[slot, k, :, :_HY] = _lane_rep(
                win_ref[slot, k, :, _HY : _HY + 1], _HY, win_ref.dtype
            )

    @pl.when(tj == n_ty - 1)
    def _():
        for k in range(nplanes):
            body = win_ref[slot, k, :, _HY:]
            win_ref[slot, k, :, : cols - _HY] = body
            win_ref[slot, k, :, cols - _HY :] = _lane_rep(
                win_ref[slot, k, :, cols - _HY - 1 : cols - _HY], _HY, win_ref.dtype
            )


def _cip_velocity_kernel_2d_dma(
    n_tx: int, n_ty: int, t: int, ty: int, x_rows: int, y_cols: int,
    re: float, dt: float, dx: float,
    *refs,
):
    it = iter(refs)
    hbm = [next(it) for _ in range(8)]  # v, p, v_alt, vx, vx_alt, vy, vy_alt, const
    code9 = [next(it) for _ in range(9)]
    nw9 = [next(it) for _ in range(9)]
    fluid_ref = next(it)
    v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out = (next(it) for _ in range(6))
    win_ref, sems = next(it), next(it)

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    g = ti * n_ty + tj  # the last grid dim iterates minor
    n_g = n_tx * n_ty
    rows, cols = t + 2 * _HB, ty + 2 * _HY

    def dma_list(k, s):
        tik = k // n_ty
        tjk = jax.lax.rem(k, n_ty)
        # Clamp the window into the array; x_rows - rows is a multiple of
        # _HB and y_cols - cols of _HY, so the offsets stay DMA-aligned.
        rs = pl.multiple_of(jnp.clip(tik * t - _HB, 0, x_rows - rows), _HB)
        cs = pl.multiple_of(jnp.clip(tjk * ty - _HY, 0, y_cols - cols), _HY)
        ds_r, ds_c = pl.ds(rs, rows), pl.ds(cs, cols)
        out = []
        for a, (ref, (p0, lead)) in enumerate(zip(hbm, _VEL_DMA_PLANES)):
            src = ref.at[ds_r, ds_c] if lead is None else ref.at[:, ds_r, ds_c]
            dst = win_ref.at[s, p0] if lead is None else win_ref.at[s, p0 : p0 + lead]
            out.append(pltpu.make_async_copy(src, dst, sems.at[s, a]))
        return out

    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        for d in dma_list(0, 0):
            d.start()

    @pl.when(g + 1 < n_g)
    def _():
        for d in dma_list(g + 1, jax.lax.rem(g + 1, 2)):
            d.start()

    for d in dma_list(g, slot):
        d.wait()

    _dma_window_fixes(win_ref, slot, _VEL_DMA_NPLANES, ti, tj, n_tx, n_ty, rows, cols)

    def w(p0, lead, hx):
        r0, r1 = _HB - hx, _HB + t + hx
        if lead is None:
            return _k32(win_ref[slot, p0, r0:r1, :])
        return _k32(win_ref[slot, p0 : p0 + lead, r0:r1, :])

    e2i = lambda r9, hx: _ext2d(  # noqa: E731
        [r[:].astype(jnp.int32) for r in r9], ti, tj, n_tx, n_ty, hx
    )
    ve, pe, vae = w(0, 2, 5), w(2, None, 3), w(3, 2, 2)
    vxe, vxae, vye, vyae = w(5, 2, 1), w(7, 2, 1), w(9, 2, 1), w(11, 2, 1)
    conste = w(13, 2, 3)
    codee = e2i(code9, 3)
    nwe = e2i(nw9, 2)
    fluid = fluid_ref[:] != 0

    cs_ = lambda a: a[..., :, _HY : _HY + ty]  # noqa: E731
    _cip_velocity_body(
        ti, n_tx, re, dt, dx,
        ve, pe, vae, vxe, vxae, vye, vyae, codee, conste, nwe, fluid,
        v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out, cs_,
    )


def _pick_tile2d_dma(x: int, y: int):
    """(t, ty) for the DMA-window velocity kernel. Requirements beyond
    :func:`pick_tile2d`: the whole window must fit inside the array
    (offset clamping needs y ≥ ty + 2·_HY and x ≥ t + 2·_HB) and stay
    DMA-aligned (y % _HY == 0). VMEM model: double-buffered (nplanes,
    rows, cols) windows + output blocks + the Mosaic expression stack."""
    if y % _HY or x % _HB:
        return None

    def cost(t: int, ty: int) -> int:
        rows, cols = t + 2 * _HB, ty + 2 * _HY
        win = 2 * _VEL_DMA_NPLANES * rows * cols
        i8_blocks = 2 * 2 * (t * ty + 2 * _HB * ty + 2 * t * _HY + 4 * _HB * _HY) // 4
        outs = 2 * 13 * t * ty
        stack = 60 * t * cols
        return 4 * (win + i8_blocks + outs + stack)

    tile = pick_tile2d(x, y, cost, halo_x=5)
    if tile is None:
        return None
    t, ty = tile
    if y < ty + 2 * _HY or x < t + 2 * _HB:
        return None
    return t, ty


def _cip_velocity_phase_2d_dma(
    v, p, v_alt, vx, vx_alt, vy, vy_alt, scene, re, dt, dx,
    *, tile: tuple[int, int] | None = None, interpret: bool = False,
):
    x_rows, y_cols = p.shape
    tile = tile or _pick_tile2d_dma(x_rows, y_cols)
    if tile is None:
        msg = f"no valid DMA-window tile for grid ({x_rows}, {y_cols})"
        raise PallasInfeasibleError(msg)
    t, ty = tile
    n_tx, n_ty = x_rows // t, y_cols // ty

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    h9 = lambda: _halo9_specs(t, ty, n_tx, n_ty, None)  # noqa: E731
    specs = [any_spec] * 8 + h9() + h9() + [_center2d_spec(t, ty, None)]
    args = (
        [v, p, v_alt, vx, vx_alt, vy, vy_alt, scene.bc_const]
        + [scene.vbc_code] * 9 + [scene.not_wall8] * 9 + [scene.fluid8]
    )
    rows, cols = t + 2 * _HB, ty + 2 * _HY
    n_tiles = n_tx * n_ty
    log_traffic(
        "cip_velocity_2d",
        _VEL_DMA_NPLANES * rows * cols * v.dtype.itemsize * n_tiles
        + 2 * nine_bytes(x_rows, y_cols, t, ty, None, itemsize=1)
        + center_bytes(x_rows, y_cols, None, itemsize=1)
        + 12 * center_bytes(x_rows, y_cols, None, itemsize=v.dtype.itemsize),
    )

    kernel = functools.partial(
        _cip_velocity_kernel_2d_dma, n_tx, n_ty, t, ty, x_rows, y_cols, re, dt, dx
    )
    out_sd = jax.ShapeDtypeStruct(v.shape, v.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n_tx, n_ty),
        in_specs=specs,
        out_specs=[_center2d_spec(t, ty, 2)] * 6,
        out_shape=[out_sd] * 6,
        scratch_shapes=[
            pltpu.VMEM((2, _VEL_DMA_NPLANES, rows, cols), v.dtype),
            pltpu.SemaphoreType.DMA((2, len(_VEL_DMA_PLANES))),
        ],
        interpret=interpret,
    )(*args)


# --- row-sliding variant of the DMA-window 2-D velocity kernel ----------------
#
# The full-window DMA kernel re-fetches each plane's whole (t+16, ty+256)
# window per tile — a (t+16)/t × (ty+256)/ty traffic amplification, and
# the res=4096 trace pins the velocity phase at its DMA-geometry ceiling
# (docs/BENCH.md "res=4096 per-kernel trace"), so shipped bytes are the
# lever. This variant transposes the grid to (n_ty, n_tx) with the ROW
# tile minor: within each column stripe the window slides down the rows
# (the sliding-window machinery of _slide_fetch — interior tiles fetch
# only the t NEW rows; the 16 overlap rows ride the copy engine from the
# previous program's slot), leaving the per-stripe lane halo
# (ty+2·128)/ty as the only DMA amplification. Lane-edge realignment at
# the two stripe ends is applied per FETCHED row range via the fix
# hooks: the whole window at sweep starts, the tail rows on interior
# tiles — always before the next head DMA reads them.


def _cip_velocity_kernel_2d_slide(
    n_tx: int, n_ty: int, t: int, ty: int, x_rows: int, y_cols: int,
    re: float, dt: float, dx: float,
    *refs,
):
    it = iter(refs)
    hbm = [next(it) for _ in range(8)]  # v, p, v_alt, vx, vx_alt, vy, vy_alt, const
    code9 = [next(it) for _ in range(9)]
    nw9 = [next(it) for _ in range(9)]
    fluid_ref = next(it)
    v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out = (next(it) for _ in range(6))
    win_ref, sems, head_sems = next(it), next(it), next(it)

    tj = pl.program_id(0)
    ti = pl.program_id(1)
    slot = jax.lax.rem(tj * n_tx + ti, 2)
    rows, cols = t + 2 * _HB, ty + 2 * _HY
    # Per-stripe column window [tj·ty − 128, +cols), clamped into the
    # array; y_cols − cols is a multiple of _HY so the offset stays
    # DMA-aligned.
    cs0 = pl.multiple_of(jnp.clip(tj * ty - _HY, 0, y_cols - cols), _HY)
    ds_c = pl.ds(cs0, cols)

    def plane_dmas(ds_r, r0: int, nr: int, s):
        dst_r = pl.ds(r0, nr)
        out = []
        for a, (ref, (p0, lead)) in enumerate(zip(hbm, _VEL_DMA_PLANES)):
            if lead is None:
                src = ref.at[ds_r, ds_c]
                dst = win_ref.at[s, p0, dst_r]
            else:
                src = ref.at[:, ds_r, ds_c]
                dst = win_ref.at[s, p0 : p0 + lead, dst_r]
            out.append(pltpu.make_async_copy(src, dst, sems.at[s, a]))
        return out

    def full_dmas(s):
        return plane_dmas(pl.ds(0, rows), 0, rows, s)

    def tail_dmas(tin, s):
        return plane_dmas(pl.ds(_slide_tail_start(tin, t, x_rows), t), 2 * _HB, t, s)

    def col_fix(s, r0: int):
        # Lane realign of the freshly fetched rows [r0, rows): at the two
        # stripe ends the clamped column offset shifts the fetched window
        # by one lane block; shift back in place and replicate the true
        # edge column (raw clamp-to-edge — the _dma_window_fixes pattern,
        # restricted to the fresh rows). n_ty ≥ 2 is guaranteed by the
        # fit constraint y ≥ ty + 2·_HY, so the two branches are disjoint.
        @pl.when(tj == 0)
        def _():
            for k in range(_VEL_DMA_NPLANES):
                body = win_ref[s, k, r0:, : cols - _HY]
                win_ref[s, k, r0:, _HY:] = body
                win_ref[s, k, r0:, :_HY] = _lane_rep(
                    win_ref[s, k, r0:, _HY : _HY + 1], _HY, win_ref.dtype
                )

        @pl.when(tj == n_ty - 1)
        def _():
            for k in range(_VEL_DMA_NPLANES):
                body = win_ref[s, k, r0:, _HY:]
                win_ref[s, k, r0:, : cols - _HY] = body
                win_ref[s, k, r0:, cols - _HY :] = _lane_rep(
                    win_ref[s, k, r0:, cols - _HY - 1 : cols - _HY], _HY, win_ref.dtype
                )

    _slide_fetch(win_ref, full_dmas, tail_dmas, ti, n_tx, t, slot,
                 head_sems=head_sems,
                 fix_full=lambda s: col_fix(s, 0),
                 fix_tail=lambda s: col_fix(s, 2 * _HB))

    def w(p0, lead, hx):
        r0, r1 = _HB - hx, _HB + t + hx
        if lead is None:
            return _k32(win_ref[slot, p0, r0:r1, :])
        return _k32(win_ref[slot, p0 : p0 + lead, r0:r1, :])

    e2i = lambda r9, hx: _ext2d(  # noqa: E731
        [r[:].astype(jnp.int32) for r in r9], ti, tj, n_tx, n_ty, hx
    )
    ve, pe, vae = w(0, 2, 5), w(2, None, 3), w(3, 2, 2)
    vxe, vxae, vye, vyae = w(5, 2, 1), w(7, 2, 1), w(9, 2, 1), w(11, 2, 1)
    conste = w(13, 2, 3)
    codee = e2i(code9, 3)
    nwe = e2i(nw9, 2)
    fluid = fluid_ref[:] != 0

    cs_ = lambda a: a[..., :, _HY : _HY + ty]  # noqa: E731
    _cip_velocity_body(
        ti, n_tx, re, dt, dx,
        ve, pe, vae, vxe, vxae, vye, vyae, codee, conste, nwe, fluid,
        v_out, vx_out, vy_out, vna_out, vxna_out, vyna_out, cs_,
    )


def _pick_tile2d_slide(x: int, y: int):
    """(t, ty) for the row-sliding velocity kernel: the alignment and
    window-fit constraints of :func:`_pick_tile2d_dma` (plus ≥2 row
    tiles so the window actually slides), with :func:`pick_tile2d`'s
    window-amplification objective. A bytes-minimal objective (largest
    ty → (8, 2048)) was measured and LOSES: 27.3 vs 29.4 steps/s at
    res=4096 — with n_ty=2 every stripe is an edge stripe, so every
    interior tile pays the 15-plane lane-fix shift, and the t=8 row
    windows amplify the VPU-side work 2.25×. The amp objective picks
    (16, 1024), measured at parity with the full-window kernel
    (29.5 vs 29.4) while shipping ~45% fewer velocity-phase bytes
    (docs/BENCH.md ledger). VMEM model identical to the full-window
    kernel's (the window scratch is the same shape)."""
    if y % _HY or x % _HB:
        return None

    def cost(t: int, ty: int) -> int:
        rows, cols = t + 2 * _HB, ty + 2 * _HY
        win = 2 * _VEL_DMA_NPLANES * rows * cols
        i8_blocks = 2 * 2 * (t * ty + 2 * _HB * ty + 2 * t * _HY + 4 * _HB * _HY) // 4
        outs = 2 * 13 * t * ty
        stack = 60 * t * cols
        return 4 * (win + i8_blocks + outs + stack)

    tile = pick_tile2d(x, y, cost, halo_x=5)
    if tile is None:
        return None
    t, ty = tile
    if y < ty + 2 * _HY or x < t + 2 * _HB or x // t < 2:
        return None
    return t, ty


def _cip_velocity_phase_2d_slide(
    v, p, v_alt, vx, vx_alt, vy, vy_alt, scene, re, dt, dx,
    *, tile: tuple[int, int] | None = None, interpret: bool = False,
):
    x_rows, y_cols = p.shape
    tile = tile or _pick_tile2d_slide(x_rows, y_cols)
    if tile is None:
        msg = f"no valid sliding-window tile for grid ({x_rows}, {y_cols})"
        raise PallasInfeasibleError(msg)
    t, ty = tile
    n_tx, n_ty = x_rows // t, y_cols // ty

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    h9t = lambda: _halo9_specs(t, ty, n_tx, n_ty, None, transposed=True)  # noqa: E731
    specs = (
        [any_spec] * 8 + h9t() + h9t()
        + [_center2d_spec(t, ty, None, transposed=True)]
    )
    args = (
        [v, p, v_alt, vx, vx_alt, vy, vy_alt, scene.bc_const]
        + [scene.vbc_code] * 9 + [scene.not_wall8] * 9 + [scene.fluid8]
    )
    rows, cols = t + 2 * _HB, ty + 2 * _HY
    slide_rows = rows + (n_tx - 1) * t
    log_traffic(
        "cip_velocity_2d",
        _VEL_DMA_NPLANES * slide_rows * cols * v.dtype.itemsize * n_ty
        + 2 * nine_bytes(x_rows, y_cols, t, ty, None, itemsize=1)
        + center_bytes(x_rows, y_cols, None, itemsize=1)
        + 12 * center_bytes(x_rows, y_cols, None, itemsize=v.dtype.itemsize),
        slide2d=(t, ty),
    )

    kernel = functools.partial(
        _cip_velocity_kernel_2d_slide, n_tx, n_ty, t, ty, x_rows, y_cols, re, dt, dx
    )
    out_sd = jax.ShapeDtypeStruct(v.shape, v.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n_ty, n_tx),
        in_specs=specs,
        out_specs=[_center2d_spec(t, ty, 2, transposed=True)] * 6,
        out_shape=[out_sd] * 6,
        scratch_shapes=[
            pltpu.VMEM((2, _VEL_DMA_NPLANES, rows, cols), v.dtype),
            pltpu.SemaphoreType.DMA((2, len(_VEL_DMA_PLANES))),
            pltpu.SemaphoreType.DMA(2),
        ],
        interpret=interpret,
    )(*args)


# --- CIP dye phase kernel ----------------------------------------------------


def _cip_dye_body(
    ti, n_t: int, re: float, dt: float, dx: float,
    win, vctx, inflowe, nwe, fluid,
    d_out, dx_out, dy_out, dna_out, dxna_out, dyna_out, cs,
    oc: int = 0,
):
    """ONE dye channel's compute. In the 1-D kernel the channel index
    lives on the grid's minor dimension (see :func:`cip_dye_phase_pallas`)
    and outputs are (1, t, Y) blocks (``oc=0``); the 2-D kernel loops
    channels in-kernel and passes ``oc=c``. `win(key, hx)` yields this
    channel's row window for input `key`; `vctx` is the shared
    carrying-velocity context; `cs` slices output columns."""
    d_out, dx_out, dy_out = _cast_store(d_out), _cast_store(dx_out), _cast_store(dy_out)
    dna_out, dxna_out, dyna_out = (
        _cast_store(dna_out), _cast_store(dxna_out), _cast_store(dyna_out))
    nw_mid = nwe != 0
    nw_in = nw_mid[1:-1]

    de = win("d", 3)  # rows [-3, t+3)
    bcde = win("bcd", 3)
    dae = win("da", 2)
    dxe = win("dx", 1)
    dxae = win("dxa", 1)
    dye_ = win("dy", 1)
    dyae = win("dya", 1)

    # 1. Dye BC (inflow colors) on rows [-3, t+3), re-clamped.
    dc = _reclamp(jnp.where(inflowe != 0, bcde, de), ti, n_t, 3)

    # 2. Diffusion-only non-advection phase on rows [-2, t+2):
    #    dn = dc + (∇²dc/Re)·dt at not-wall (fs/solver.py:378-383).
    d_na = jnp.where(nw_mid, dc[1:-1] + (_lap_window(dc, dx) * (1.0 / re)) * dt, dae)
    d_na = _reclamp(d_na, ti, n_t, 2)
    # Store each output the moment its value is final (the velocity
    # kernel's store-ordering trick): Mosaic can retire the windowed
    # temporaries before the heavy advection DAG below instead of
    # keeping all six outputs live to the end.
    dna_out[oc] = cs(d_na[2:-2])

    # 3. Gradient update on rows [-1, t+1).
    delta = d_na - dc[1:-1]
    gx_na = _reclamp(
        jnp.where(nw_in, _grad_update_window(dxe, delta, "x", dx), dxae), ti, n_t, 1
    )
    gy_na = _reclamp(
        jnp.where(nw_in, _grad_update_window(dye_, delta, "y", dx), dyae), ti, n_t, 1
    )
    dxna_out[oc] = cs(gx_na[1:-1])
    dyna_out[oc] = cs(gy_na[1:-1])

    # 4. CIP advection by the (post-limit) velocity; then the global
    #    [0,1] clamp on the current buffer (fs/solver.py:366-373).
    fn, fxn, fyn = cip_advect_window_expr(
        d_na[1:-1], gx_na, gy_na, None, None, dt, dx, ctx=vctx
    )
    d_out[oc] = clamp_field(jnp.where(fluid, cs(fn), cs(dc[3:-3])), 0.0, 1.0)
    dx_out[oc] = jnp.where(fluid, cs(fxn), cs(dxe[1:-1]))
    dy_out[oc] = jnp.where(fluid, cs(fyn), cs(dye_[1:-1]))


def _cip_dye_kernel(
    n_t: int, re: float, dt: float, dx: float,
    d_c, d_p8, d_n8, da_c, da_p8, da_n8,
    dx_c, dx_p8, dx_n8, dxa_c, dxa_p8, dxa_n8,
    dy_c, dy_p8, dy_n8, dya_c, dya_p8, dya_n8,
    vel_c, vel_p8, vel_n8, bcd_c, bcd_p8, bcd_n8,
    inflow_c, inflow_p8, inflow_n8, nw_c, nw_p8, nw_n8, fluid_ref,
    d_out, dx_out, dy_out, dna_out, dxna_out, dyna_out,
    ctx_ref, mask_ref=None,
):
    ti = pl.program_id(0)
    c = pl.program_id(1)

    # The carrying-velocity context is channel-independent: compute it
    # once per row tile (the c-minor grid visits c=0 first) and spill to
    # VMEM scratch; channels 1.. re-read it instead of re-deriving.
    @pl.when(c == 0)
    def _():
        vele = _ext(vel_c[:], vel_p8[:], vel_n8[:], ti, n_t, 1)
        ctx_store(ctx_ref, vele[0], vele[1], dt, dx)

    vctx = ctx_load(ctx_ref)

    triples = {
        "d": (d_c, d_p8, d_n8),
        "da": (da_c, da_p8, da_n8),
        "dx": (dx_c, dx_p8, dx_n8),
        "dxa": (dxa_c, dxa_p8, dxa_n8),
        "dy": (dy_c, dy_p8, dy_n8),
        "dya": (dya_c, dya_p8, dya_n8),
        "bcd": (bcd_c, bcd_p8, bcd_n8),
    }

    def win(key, hx):
        a, b, d = triples[key]
        return _ext(a[0], b[0], d[0], ti, n_t, hx)

    if mask_ref is None:
        inflowe = _ext(
            inflow_c[:], inflow_p8[:], inflow_n8[:], ti, n_t, 3).astype(jnp.int32)
        nwe = _ext(nw_c[:], nw_p8[:], nw_n8[:], ti, n_t, 2).astype(jnp.int32)
    else:
        # The int mask windows are channel-independent like the velocity
        # ctx: assemble + widen once per row tile (at c == 0) into i32
        # scratch; channels 1.. re-read (the kernels are VPU-bound, and
        # each i8 _ext assembly + i32 widen costs full-window passes).
        t = inflow_c.shape[-2]

        @pl.when(c == 0)
        def _():
            mask_ref[0] = _ext(
                inflow_c[:], inflow_p8[:], inflow_n8[:], ti, n_t, 3
            ).astype(jnp.int32)
            mask_ref[1, : t + 4] = _ext(
                nw_c[:], nw_p8[:], nw_n8[:], ti, n_t, 2).astype(jnp.int32)

        inflowe = mask_ref[0]
        nwe = mask_ref[1, : t + 4]
    fluid = fluid_ref[:] != 0

    _cip_dye_body(ti, n_t, re, dt, dx, win, vctx, inflowe, nwe, fluid,
                  d_out, dx_out, dy_out, dna_out, dxna_out, dyna_out, lambda a: a)


def _cip_dye_kernel_win(
    n_t: int, t: int, re: float, dt: float, dx: float,
    d_w, da_w, dx_w, dxa_w, dy_w, dya_w, vel_w, bcd_w,
    inflow_c, inflow_p8, inflow_n8, nw_c, nw_p8, nw_n8, fluid_ref,
    d_out, dx_out, dy_out, dna_out, dxna_out, dyna_out,
    ctx_ref,
):
    """The channel-grid dye kernel with element-offset WINDOW inputs:
    each f32 input is one (1|2, t+16, Y) block instead of a halo triple
    (one DMA stream per input instead of three — see the
    "single-window input fetch" note in pallas_stencil.py). The int8
    masks keep the triple path: their bytes are marginal and int8 blocks
    relayout at (32, ·) granularity."""
    ti = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        vele = _wext(vel_w[:], ti, n_t, t, 1)
        ctx_store(ctx_ref, vele[0], vele[1], dt, dx)

    vctx = ctx_load(ctx_ref)

    wins = {"d": d_w, "da": da_w, "dx": dx_w, "dxa": dxa_w,
            "dy": dy_w, "dya": dya_w, "bcd": bcd_w}

    def win(key, hx):
        return _wext(wins[key][0], ti, n_t, t, hx)

    inflowe = _ext(inflow_c[:], inflow_p8[:], inflow_n8[:], ti, n_t, 3).astype(jnp.int32)
    nwe = _ext(nw_c[:], nw_p8[:], nw_n8[:], ti, n_t, 2).astype(jnp.int32)
    fluid = fluid_ref[:] != 0

    _cip_dye_body(ti, n_t, re, dt, dx, win, vctx, inflowe, nwe, fluid,
                  d_out, dx_out, dy_out, dna_out, dxna_out, dyna_out, lambda a: a)


# --- sliding-window variant of the 1-D channel-grid dye kernel ----------------
#
# At res=4096 the dye phase's t=8 row tiles re-fetch a (t+16)-row window
# for 8 output rows — a 3× halo amplification on 21 per-channel triple
# planes, and the per-kernel trace pins the phase at its operand
# geometry's DMA ceiling (~650 GB/s measured by the no-op probes), so
# shipped BYTES are the only lever (docs/BENCH.md "res=4096 per-kernel
# trace"). The sliding kernel makes the grid channel-MAJOR so each
# channel's row tiles stream sequentially, keeps every f32 input's
# current window in double-buffered VMEM scratch, and per interior tile
# fetches only the t NEW rows with one strided make_async_copy per
# input — the 16 overlap rows are copied forward from the previous
# program's slot. Amplification drops to ~(x+16)/x ≈ 1. Sweep-start
# tiles (ti==0) fetch the full window and realign it in place; the last
# tile realigns its clamped tail — both under pl.when, zero interior
# cost (the in-place pattern of _dma_window_fixes). Needs a 128-aligned
# lane width for the manual row-window DMAs (true at 4096, not 1600 —
# scripts/dma_rowwin_1600_check.py).

# win_ref plane layout: 7 per-channel arrays + the 2-channel velocity.
_DYE_SLIDE_NPLANES = 9


class _row_view:
    """Output-ref adapter writing a [r0, r0+n) row slice of each stored
    block — lets `_cip_dye_body` store one SUBTILE of a taller output
    block unchanged."""

    __slots__ = ("ref", "r0", "n")

    def __init__(self, ref, r0: int, n: int):
        self.ref, self.r0, self.n = ref, r0, n

    @property
    def dtype(self):
        return self.ref.dtype

    def __setitem__(self, key, val):
        self.ref[key, self.r0 : self.r0 + self.n] = val.astype(self.ref.dtype)


def _cip_dye_kernel_slide(
    n_t: int, t: int, sub: int, x_rows: int, re: float, dt: float, dx: float,
    d_h, da_h, dx_h, dxa_h, dy_h, dya_h, bcd_h, vel_h,
    inflow_c, inflow_p8, inflow_n8, nw_c, nw_p8, nw_n8, fluid_ref,
    d_out, dx_out, dy_out, dna_out, dxna_out, dyna_out,
    win_ref, sems, head_sems,
):
    """`sub` subtiles per program: the DMA tile is T = sub·t (bigger
    strided chunks — the t=8 fetch geometry caps at ~450-550 GB/s per
    the DMA-rows sweep — and 1/sub the program-issue overhead) while the
    compute runs `sub` sequential t-row passes, keeping the Mosaic
    expression stack at the t-row frontier."""
    c = pl.program_id(0)
    ti = pl.program_id(1)
    g = c * n_t + ti
    slot = jax.lax.rem(g, 2)
    T = sub * t
    rows = T + 2 * _HB
    per_ch = (d_h, da_h, dx_h, dxa_h, dy_h, dya_h, bcd_h)

    def full_dmas(ci, s):
        # The whole clamped window rows [0, T+16) — sweep starts only.
        out = []
        for k, ref in enumerate(per_ch):
            out.append(pltpu.make_async_copy(
                ref.at[pl.ds(ci, 1), pl.ds(0, rows), :],
                win_ref.at[s, pl.ds(k, 1)], sems.at[s, k]))
        out.append(pltpu.make_async_copy(
            vel_h.at[:, pl.ds(0, rows), :],
            win_ref.at[s, pl.ds(7, 2)], sems.at[s, 7]))
        return out

    def tail_dmas(ci, tin, s):
        # The T NEW rows [tin·T+8, tin·T+T+8) (start clamped to x−T at
        # the last tile; realigned there by _slide_fetch).
        ds = pl.ds(_slide_tail_start(tin, T, x_rows), T)
        dst_rows = pl.ds(2 * _HB, T)
        out = []
        for k, ref in enumerate(per_ch):
            out.append(pltpu.make_async_copy(
                ref.at[pl.ds(ci, 1), ds, :],
                win_ref.at[s, pl.ds(k, 1), dst_rows], sems.at[s, k]))
        out.append(pltpu.make_async_copy(
            vel_h.at[:, ds, :],
            win_ref.at[s, pl.ds(7, 2), dst_rows], sems.at[s, 7]))
        return out

    _slide_fetch(win_ref, functools.partial(full_dmas, c),
                 functools.partial(tail_dmas, c), ti, n_t, T, slot,
                 head_sems=head_sems)

    keys = {"d": 0, "da": 1, "dx": 2, "dxa": 3, "dy": 4, "dya": 5, "bcd": 6}

    inflowe_T = _ext(inflow_c[:], inflow_p8[:], inflow_n8[:], ti, n_t, 3).astype(jnp.int32)
    nwe_T = _ext(nw_c[:], nw_p8[:], nw_n8[:], ti, n_t, 2).astype(jnp.int32)
    fluid_T = fluid_ref[:] != 0
    outs = (d_out, dx_out, dy_out, dna_out, dxna_out, dyna_out)

    for s in range(sub):
        r0 = s * t

        def win(key, hx, r0=r0):
            k = keys[key]
            return _k32(win_ref[slot, k, _HB + r0 - hx : _HB + r0 + t + hx, :])

        vele = _k32(win_ref[slot, 7:9, _HB + r0 - 1 : _HB + r0 + t + 1, :])
        vctx = cip_velocity_ctx(vele[0], vele[1], dt, dx)
        # Virtual t-row tile index: _reclamp's grid-edge predicates hold
        # exactly for (first tile, first subtile) / (last, last).
        ti_v = ti * sub + s
        _cip_dye_body(
            ti_v, n_t * sub, re, dt, dx, win, vctx,
            inflowe_T[r0 : r0 + t + 6], nwe_T[r0 : r0 + t + 4],
            fluid_T[r0 : r0 + t],
            *(_row_view(o, r0, t) for o in outs), lambda a: a,
        )


def _dye_slide_subtiles(t: int, x_rows: int, y_cols: int) -> int:
    """Largest `sub` whose T = sub·t window + outputs + stack fit the
    scoped-VMEM limit (the compute stack stays t-row — only the DMA
    tile grows). Calibrated against the measured frontier: t=8 sub=2 at
    Y=4096 needs 16.61 MB (Mosaic's own figure) — rejected at the
    16 MiB default limit, selected (and measured +3.5% end-to-end) at
    the raised 24 MiB limit (utils/tpu_flags.raise_scoped_vmem)."""
    from fluid2d_tpu.utils.tpu_flags import scoped_vmem_bytes

    # The row model underestimates Mosaic's scoped figure by ~0.8 MB at
    # the calibration point; budget with a 1.3 MB margin.
    rows_budget = (scoped_vmem_bytes() - 1_300_000) / (y_cols * 4)
    for sub in (4, 2, 1):
        T = sub * t
        if x_rows % T or x_rows < T + 2 * _HB or x_rows // T < 2:
            continue
        win = 2 * _DYE_SLIDE_NPLANES * (T + 2 * _HB)
        outs = 2 * 6 * T
        i8 = 2 * 0.6 * (T + 2 * _HB)
        if win + outs + i8 + 20 * t <= rows_budget:
            return sub
    return 1


def _cip_dye_phase_slide(
    dye, dye_alt, dyex, dyex_alt, dyey, dyey_alt, vel, scene, re, dt, dx,
    *, tile_x: int, subtiles: int | None = None, interpret: bool = False,
):
    chans, x_rows, y_cols = dye.shape
    t = tile_x
    sub = subtiles or _dye_slide_subtiles(t, x_rows, y_cols)
    T = sub * t
    n_t = x_rows // T
    rows = T + 2 * _HB

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    i8 = lambda: _halo_triple_specs_cgrid2(T, y_cols, n_t, None)  # noqa: E731
    specs = [any_spec] * 8 + i8() + i8() + [_center_spec_cgrid2(T, y_cols, None)]
    args = (
        [dye, dye_alt, dyex, dyex_alt, dyey, dyey_alt, scene.bc_dye, vel]
        + [scene.inflow8] * 3 + [scene.not_wall8] * 3 + [scene.fluid8]
    )
    # Bytes: per-channel planes slide (one full window per sweep + T new
    # rows per interior tile ≈ 1× amplification); vel re-slides per
    # channel sweep; int8 masks keep triple amplification × chans sweeps.
    slide_rows = rows + (n_t - 1) * T
    log_traffic(
        "cip_dye",
        (7 * chans + 2 * chans) * slide_rows * y_cols * dye.dtype.itemsize
        + 2 * chans * (x_rows + 2 * _HB * n_t) * y_cols
        + chans * x_rows * y_cols
        + 6 * chans * center_bytes(x_rows, y_cols, None, itemsize=dye.dtype.itemsize),
        slide_t=T,
    )

    kernel = functools.partial(_cip_dye_kernel_slide, n_t, t, sub, x_rows, re, dt, dx)
    out_sd = jax.ShapeDtypeStruct(dye.shape, dye.dtype)

    return pl.pallas_call(
        kernel,
        grid=(chans, n_t),
        in_specs=specs,
        out_specs=[_center_spec_cgrid2(T, y_cols, "c")] * 6,
        out_shape=[out_sd] * 6,
        scratch_shapes=[
            pltpu.VMEM((2, _DYE_SLIDE_NPLANES, rows, y_cols), dye.dtype),
            pltpu.SemaphoreType.DMA((2, 8)),
            pltpu.SemaphoreType.DMA(2),
        ],
        interpret=interpret,
    )(*args)


def _cip_dye_kernel_2d(
    n_tx: int, n_ty: int, ty: int, chans: int, re: float, dt: float, dx: float,
    *refs,
):
    # Channel-FOLDED (unlike the 1-D kernel's channel grid): under 2-D
    # tiling, per-program mask/velocity window assembly is the dominant
    # fixed cost, and a (…, chans) grid would repeat it per channel —
    # measured 15% slower end-to-end at res=4096.
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    it = iter(refs)
    nine = lambda: [next(it)[:] for _ in range(9)]
    vals = {k: nine() for k in ("d", "da", "dx", "dxa", "dy", "dya")}
    vel9 = nine()
    vals["bcd"] = nine()
    # int8 lane-dim concats are unsupported by Mosaic — widen BEFORE _ext2d.
    inflow9 = [a.astype(jnp.int32) for a in nine()]
    nw9 = [a.astype(jnp.int32) for a in nine()]
    fluid_ref = next(it)
    outs = tuple(next(it) for _ in range(6))

    vele = _ext2d(vel9, ti, tj, n_tx, n_ty, 1)
    vctx = cip_velocity_ctx(vele[0], vele[1], dt, dx)
    inflowe = _ext2d(inflow9, ti, tj, n_tx, n_ty, 3)
    nwe = _ext2d(nw9, ti, tj, n_tx, n_ty, 2)
    fluid = fluid_ref[:] != 0

    cs = lambda a: a[..., :, _LH2 : _LH2 + ty]
    for c in range(chans):
        win = lambda key, hx, c=c: _ext2d(  # noqa: E731
            [v[c] for v in vals[key]], ti, tj, n_tx, n_ty, hx
        )
        _cip_dye_body(ti, n_tx, re, dt, dx, win, vctx, inflowe, nwe, fluid,
                      *outs, cs, oc=c)


def cip_dye_phase_pallas(
    dye, dye_alt, dyex, dyex_alt, dyey, dyey_alt, vel, scene,
    re: float, dt: float, dx: float,
    *, tile_x: int | None = None, window_inputs: bool | None = None,
    sliding: bool | None = None, subtiles: int | None = None,
    mask_scratch: bool | None = None, interpret: bool = False,
):
    """Whole CIP dye phase (BC + diffusion + grads + advection + clamp).

    Returns ``(dye_cur, dyex_cur, dyey_cur, d_na, dx_na, dy_na)``. Row
    tiling when the lane width fits VMEM, 2-D tiling otherwise.

    The grid is ``(n_t, chans)`` with the channel minor: per-channel
    work is independent, so each program holds ONE channel's blocks
    (3× smaller VMEM footprint → t=16 instead of t=8 at Y=1600, −21%
    window amplification on the VPU-bound dye algebra), while the
    channel-independent inputs (velocity, masks) keep constant block
    indices across the c-minor steps — Pallas skips their re-fetch —
    and the carrying-velocity context is computed once per row tile
    into VMEM scratch (:func:`fluid2d_tpu.ops.pallas_stencil.ctx_store`).
    """
    chans, x_rows, y_cols = dye.shape

    def cost_rows(t: int) -> float:
        # Per-program: 7 one-channel f32 halo triples + the 2-channel
        # velocity triple + ~2 i8 triples; 6 one-channel out blocks +
        # fluid; the 10-row ctx scratch (single-buffered) + stack. The
        # stack coefficient is calibrated down from the channel-folded
        # kernel's 60: with ONE channel's DAG live and the velocity ctx
        # in scratch, the measured-feasible frontier is t=32 at Y=1600
        # (+7% end-to-end, 178 vs 166) and t=8 at Y=4096 (1-D beats the
        # 2-D path, 18.9 vs 18.2) while t=40@1600 / t=16@4096 fail to
        # compile — coefficient 20 reproduces exactly that boundary.
        blocks = 9 * (t + 2 * _HB) + 0.6 * (t + 2 * _HB) + 6 * t + 0.25 * t
        return 2 * blocks + 10 * t + 20 * t

    t = _check_tile(tile_x, x_rows) if tile_x else _vmem_tile(x_rows, y_cols, cost_rows)
    if t is None:
        return _cip_dye_phase_2d(
            dye, dye_alt, dyex, dyex_alt, dyey, dyey_alt, vel, scene, re, dt, dx,
            interpret=interpret,
        )
    if tile_x is None and dye.dtype == jnp.bfloat16 and t >= 32:
        # bf16 transport halves every block buffer, moving the Mosaic
        # frontier past the f32-calibrated pick: t=160 compiles AND wins
        # at Y=1600 (305.1 vs auto(80) 295.2 same-window A/B, round-5
        # `cip-dye-tile --tiles 160 --dtype bfloat16`). Prefer 2× the
        # f32 pick where a valid divisor exists; the t ≥ 32 guard keeps
        # VMEM-starved geometries (where doubling is unmeasured) on the
        # f32-calibrated pick, and the arena guard keeps processes at
        # the 16 MiB default limit (where t=160's kernel OOMs at 22 MB
        # of Mosaic stack) on the budget the cost model enforced.
        from fluid2d_tpu.utils.tpu_flags import scoped_vmem_bytes

        if scoped_vmem_bytes() >= 48 * 2**20:
            t = pick_tile(x_rows, preferred=2 * t) or t
    n_t = x_rows // t

    # Sliding-window fetch (manual DMAs: needs a 128-aligned lane width
    # and the whole window inside the array). Default ON where legal:
    # measured 27.3 → 28.8 steps/s end-to-end at res=4096 (the t=8 halo
    # amplification drops 3× → ~1×; the remaining gap to the byte model
    # is VPU-bound window work — docs/BENCH.md ledger).
    can_slide = (_dma_ok(dye, vel, scene.bc_dye) and y_cols % _HY == 0
                 and x_rows >= t + 2 * _HB and n_t >= 2)
    if sliding is None:
        sliding = True
    if sliding and can_slide:
        # Measured compile frontier for the SLIDING kernel specifically:
        # its Mosaic scoped need is not linear in t (t=16 fits 24 MiB,
        # t=32 needs 50.25 MB — the generic row model says 37 MB), so
        # clamp to the largest measured-to-compile-and-win tile for the
        # limit in effect rather than trusting the model past it:
        # t=16 beat t=8+sub2 35.0 vs 34.1 at res=4096; t=32 at a
        # ≥53 MB arena beat t=16 41.4 vs 40.7 (docs/BENCH.md).
        from fluid2d_tpu.utils.tpu_flags import scoped_vmem_bytes

        # bf16 halves the slide window scratch and t=64 COMPILES there
        # (f32 t=64 OOMs) — but measured 4 same-window A/Bs split by
        # window health: t=64 "won" only in degraded windows (+2/+5%)
        # and lost in healthy ones (41.9 vs 42.4, 44.6 vs 45.5), so the
        # cap stays 32 for both dtypes (docs/BENCH.md round-5 row).
        t_cap = 32 if scoped_vmem_bytes() >= 53 * 2**20 else 16
        ts = t if tile_x else min(t, t_cap)
        return _cip_dye_phase_slide(
            dye, dye_alt, dyex, dyex_alt, dyey, dyey_alt, vel, scene, re, dt, dx,
            tile_x=ts, subtiles=subtiles, interpret=interpret,
        )

    # Window fetch needs the whole (t+16, Y) window inside the array.
    # Measured at res=1600: the fetch itself is 24% faster (983 vs
    # 752 GB/s no-op probe) but _wext's edge-realignment selects tip the
    # kernel VPU-bound — end-to-end 244 vs 248 steps/s — so triples stay
    # the default (scripts/kernel_variants_bench.py --variant cip-dye-win).
    if window_inputs is None:
        window_inputs = False
    window_inputs = window_inputs and x_rows >= t + 2 * _HB
    if window_inputs:
        wc = _win_spec_cgrid(t, y_cols, n_t, "c")
        specs = (
            [wc] * 6 + [_win_spec_cgrid(t, y_cols, n_t, 2)] + [wc]
            + _halo_triple_specs_cgrid(t, y_cols, n_t, None)
            + _halo_triple_specs_cgrid(t, y_cols, n_t, None)
            + [_center_spec_cgrid(t, y_cols, None)]
        )
        args = (
            [dye, dye_alt, dyex, dyex_alt, dyey, dyey_alt, vel, scene.bc_dye]
            + [scene.inflow8] * 3 + [scene.not_wall8] * 3 + [scene.fluid8]
        )
    else:
        h2 = lambda lead: _halo_triple_specs_cgrid(t, y_cols, n_t, lead)  # noqa: E731
        specs = (
            h2("c") + h2("c") + h2("c") + h2("c") + h2("c") + h2("c")
            + h2(2) + h2("c") + h2(None) + h2(None)
            + [_center_spec_cgrid(t, y_cols, None)]
        )
        args = (
            [dye] * 3 + [dye_alt] * 3 + [dyex] * 3 + [dyex_alt] * 3
            + [dyey] * 3 + [dyey_alt] * 3
            + [vel] * 3 + [scene.bc_dye] * 3 + [scene.inflow8] * 3
            + [scene.not_wall8] * 3 + [scene.fluid8]
        )
    # Same DMA totals as a channel-folded kernel: per-channel inputs
    # stream once per (tile, channel) pair = once over the array; the
    # channel-independent blocks are fetched once per tile (constant
    # index maps across the minor c steps → no re-fetch).
    log_traffic(
        "cip_dye",
        (6 * chans + 2 + chans)
        * triple_bytes(x_rows, y_cols, t, None, itemsize=dye.dtype.itemsize)
        + 2 * triple_bytes(x_rows, y_cols, t, None, itemsize=1)
        + center_bytes(x_rows, y_cols, None, itemsize=1)
        + 6 * chans * center_bytes(x_rows, y_cols, None, itemsize=dye.dtype.itemsize),
        t=t,
    )

    if window_inputs:
        kernel = functools.partial(_cip_dye_kernel_win, n_t, t, re, dt, dx)
    else:
        kernel = functools.partial(_cip_dye_kernel, n_t, re, dt, dx)
    out_sd = jax.ShapeDtypeStruct(dye.shape, dye.dtype)

    if mask_scratch is None:
        # Measured (round-5 `cip-dye-maskscratch` A/Bs): hoisting the
        # int mask assembly to per-tile scratch wins under bf16 (the
        # kernel is VPU-bound there: +1.3-6% interleaved) and LOSES
        # under f32 (−4-9%: the kernel hides VPU work under DMA, and
        # the scratch round-trips serialize against the pipeline).
        mask_scratch = dye.dtype == jnp.bfloat16
    scratch = [pltpu.VMEM((10, t, y_cols), jnp.float32)]
    if mask_scratch and not window_inputs:
        scratch.append(pltpu.VMEM((2, t + 6, y_cols), jnp.int32))

    return pl.pallas_call(
        kernel,
        grid=(n_t, chans),
        in_specs=specs,
        out_specs=[_center_spec_cgrid(t, y_cols, "c")] * 6,
        out_shape=[out_sd] * 6,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)


def _cip_dye_cost2d_factory(chans: int):
    # dye: 7 C-channel halo inputs + 2ch velocity, 2 i8, 6C outputs + fluid.
    return _cost2d(7 * chans + 2, 2, 6 * chans + 1)


def _cip_dye_phase_2d(
    dye, dye_alt, dyex, dyex_alt, dyey, dyey_alt, vel, scene, re, dt, dx, *, interpret=False
):
    chans, x_rows, y_cols = dye.shape
    tile = pick_tile2d(x_rows, y_cols, _cip_dye_cost2d_factory(chans))
    if tile is None:
        msg = f"no valid 1-D or 2-D tile for grid ({x_rows}, {y_cols})"
        raise PallasInfeasibleError(msg)
    t, ty = tile
    n_tx, n_ty = x_rows // t, y_cols // ty

    h9 = lambda lead: _halo9_specs(t, ty, n_tx, n_ty, lead)  # noqa: E731
    specs = (
        h9(chans) + h9(chans) + h9(chans) + h9(chans) + h9(chans) + h9(chans)
        + h9(2) + h9(chans) + h9(None) + h9(None) + [_center2d_spec(t, ty, None)]
    )
    args = (
        [dye] * 9 + [dye_alt] * 9 + [dyex] * 9 + [dyex_alt] * 9 + [dyey] * 9 + [dyey_alt] * 9
        + [vel] * 9 + [scene.bc_dye] * 9 + [scene.inflow8] * 9 + [scene.not_wall8] * 9
        + [scene.fluid8]
    )
    log_traffic(
        "cip_dye_2d",
        (6 * chans + 2 + chans)
        * nine_bytes(x_rows, y_cols, t, ty, None, itemsize=dye.dtype.itemsize)
        + 2 * nine_bytes(x_rows, y_cols, t, ty, None, itemsize=1)
        + center_bytes(x_rows, y_cols, None, itemsize=1)
        + 6 * chans * center_bytes(x_rows, y_cols, None, itemsize=dye.dtype.itemsize),
    )

    kernel = functools.partial(_cip_dye_kernel_2d, n_tx, n_ty, ty, chans, re, dt, dx)
    out_sd = jax.ShapeDtypeStruct(dye.shape, dye.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n_tx, n_ty),
        in_specs=specs,
        out_specs=[_center2d_spec(t, ty, chans)] * 6,
        out_shape=[out_sd] * 6,
        interpret=interpret,
    )(*args)


# --- vorticity confinement kernel --------------------------------------------


def _confinement_kernel(
    n_t: int, dt: float, weight: float, dx: float,
    v_c, v_p8, v_n8, va_ref, fl_c, fl_p8, fl_n8,
    vn_ref,
):
    ti = pl.program_id(0)
    ve = _ext(v_c[:], v_p8[:], v_n8[:], ti, n_t, 2)  # rows [-2, t+2)
    fle = _ext(fl_c[:], fl_p8[:], fl_n8[:], ti, n_t, 1).astype(jnp.int32)
    _confinement_core(ti, n_t, dt, weight, dx, ve, fle, va_ref, vn_ref)


def _confinement_kernel_slide(
    n_t: int, t: int, x_rows: int, dt: float, weight: float, dx: float,
    v_h, va_ref, fl_c, fl_p8, fl_n8,
    vn_ref, win_ref, sems, head_sems,
):
    """Confinement with a SLIDING velocity window (see the
    "sliding-window fetch" note in pallas_stencil.py)."""
    ti = pl.program_id(0)
    slot = jax.lax.rem(ti, 2)
    rows = t + 2 * _HB

    def full_dmas(s):
        return [pltpu.make_async_copy(
            v_h.at[:, pl.ds(0, rows), :], win_ref.at[s], sems.at[s])]

    def tail_dmas(tin, s):
        ds = pl.ds(_slide_tail_start(tin, t, x_rows), t)
        return [pltpu.make_async_copy(
            v_h.at[:, ds, :], win_ref.at[s, :, pl.ds(2 * _HB, t)], sems.at[s])]

    _slide_fetch(win_ref, full_dmas, tail_dmas, ti, n_t, t, slot,
                 head_sems=head_sems)
    ve = _k32(win_ref[slot, :, _HB - 2 : _HB + t + 2, :])
    fle = _ext(fl_c[:], fl_p8[:], fl_n8[:], ti, n_t, 1).astype(jnp.int32)
    _confinement_core(ti, n_t, dt, weight, dx, ve, fle, va_ref, vn_ref)


def _confinement_core(ti, n_t, dt, weight, dx, ve, fle, va_ref, vn_ref):
    vn_ref = _cast_store(vn_ref)
    fluid_mid = fle != 0  # rows [-1, t+1)

    # ω = ∂w/∂x − ∂u/∂y on rows [-1, t+1); zero at non-fluid (the
    # reference's persistent fields are written at fluid cells only and
    # start at zero — fs/vorticity_confinement.py:27-32).
    u_w, w_w = ve[0], ve[1]
    half_inv_dx = 0.5 / dx  # strength-reduced (see _lap_window)
    curl = ((w_w[2:] - w_w[:-2]) - (_sy(u_w[1:-1], 1) - _sy(u_w[1:-1], -1))) * half_inv_dx
    vort = jnp.where(fluid_mid, curl, 0.0)
    vabs = jnp.where(fluid_mid, jnp.abs(curl), 0.0)
    # But clamp-of-computed at the global edges: vabs' halo rows must
    # replicate the true edge rows for the gradient below.
    vort = _reclamp(vort, ti, n_t, 1)
    vabs = _reclamp(vabs, ti, n_t, 1)

    gx = (vabs[2:] - vabs[:-2]) * half_inv_dx
    vac = vabs[1:-1]
    gy = (_sy(vac, 1) - _sy(vac, -1)) * half_inv_dx
    # rsqrt replaces the sqrt + two divides with one op + two multiplies;
    # rsqrt(0) → inf so 0·inf → NaN and x·inf → ±inf preserve the
    # unguarded-norm NaN policy (PARITY.md §4) bit-for-sign.
    inv_norm = jax.lax.rsqrt(gx * gx + gy * gy)
    nx = gx * inv_norm
    ny = gy * inv_norm
    vort_c = vort[1:-1]
    fx = ny * vort_c
    fy = -nx * vort_c
    # min-then-max with fmin/fmax NaN policy (NaN → +0.1), exactly as
    # ops/vorticity.py.
    fx = tmax(tmin(fx, jnp.float32(0.1)), jnp.float32(-0.1))
    fy = tmax(tmin(fy, jnp.float32(0.1)), jnp.float32(-0.1))

    fluid = fluid_mid[1:-1]
    u_c = u_w[2:-2]
    w_c = w_w[2:-2]
    vn_ref[0] = jnp.where(fluid, u_c + dt * weight * fx, _k32(va_ref[0]))
    vn_ref[1] = jnp.where(fluid, w_c + dt * weight * fy, _k32(va_ref[1]))


def confinement_pallas(
    v, v_alt, fluid8, dt: float, weight: float, dx: float,
    *, tile_x: int | None = None, sliding: bool | None = None,
    interpret: bool = False,
):
    """Fused vorticity confinement (fs/vorticity_confinement.py): returns
    the new current buffer (fluid cells updated, alt elsewhere); the new
    alternate is the input `v` (pure pass-through, no copy needed)."""
    x_rows, y_cols = fluid8.shape

    def cost_rows(t: int) -> float:
        blocks = 2 * (t + 2 * _HB) + 2 * t + 0.3 * (t + 2 * _HB) + 2 * t
        return 2 * blocks + 30 * t

    t = _check_tile(tile_x, x_rows) if tile_x else _vmem_tile(x_rows, y_cols, cost_rows)
    if t is None:
        msg = f"no valid tile for grid ({x_rows}, {y_cols})"
        raise PallasInfeasibleError(msg)
    n_t = x_rows // t

    if sliding is None:
        sliding = True
    sliding = (sliding and _dma_ok(v) and y_cols % _HY == 0
               and x_rows >= t + 2 * _HB and n_t >= 2)

    rows = t + 2 * _HB
    scratch_shapes = []
    if sliding:
        specs = (
            [pl.BlockSpec(memory_space=pl.ANY), _center_spec(t, y_cols, 2)]
            + _halo_triple_specs(t, y_cols, n_t, None)
        )
        kernel = functools.partial(
            _confinement_kernel_slide, n_t, t, x_rows, dt, weight, dx)
        scratch_shapes = [
            pltpu.VMEM((2, 2, rows, y_cols), v.dtype),
            pltpu.SemaphoreType.DMA(2),
            pltpu.SemaphoreType.DMA(2),
        ]
        args = (v, v_alt, fluid8, fluid8, fluid8)
        v_bytes = 2 * (rows + (n_t - 1) * t) * y_cols * v.dtype.itemsize
    else:
        specs = (
            _halo_triple_specs(t, y_cols, n_t, 2)
            + [_center_spec(t, y_cols, 2)]
            + _halo_triple_specs(t, y_cols, n_t, None)
        )
        kernel = functools.partial(_confinement_kernel, n_t, dt, weight, dx)
        args = (v, v, v, v_alt, fluid8, fluid8, fluid8)
        v_bytes = 2 * triple_bytes(x_rows, y_cols, t, None, itemsize=v.dtype.itemsize)
    log_traffic(
        "confinement",
        v_bytes
        + triple_bytes(x_rows, y_cols, t, None, itemsize=1)
        + 4 * center_bytes(x_rows, y_cols, None, itemsize=v.dtype.itemsize),
        t=None if sliding else t, slide_t=t if sliding else None,
    )
    vn = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=specs,
        out_specs=[_center_spec(t, y_cols, 2)],
        out_shape=[jax.ShapeDtypeStruct(v.shape, v.dtype)],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)[0]
    return vn, v


# --- MAC (upwind / KK) phase kernels ----------------------------------------


def _mac_velocity_kernel(
    n_t: int, scheme: str, re: float, dt: float, dx: float,
    v_c, v_p8, v_n8, p_c, p_p8, p_n8, va_ref,
    code_c, code_p8, code_n8, const_c, const_p8, const_n8, fluid_ref,
    v_out, vbc_out,
):
    ti = pl.program_id(0)
    halo = 2 if scheme == "kk" else 1
    ve = _ext(v_c[:], v_p8[:], v_n8[:], ti, n_t, 2 + halo)
    pe = _ext(p_c[:], p_p8[:], p_n8[:], ti, n_t, 1)
    codee = _ext(code_c[:], code_p8[:], code_n8[:], ti, n_t, halo).astype(jnp.int32)
    conste = _ext(const_c[:], const_p8[:], const_n8[:], ti, n_t, halo)
    _mac_velocity_core(ti, n_t, scheme, re, dt, dx, ve, pe, va_ref[:],
                       codee, conste, fluid_ref[:] != 0, v_out, vbc_out)


def _mac_velocity_kernel_slide(
    n_t: int, t: int, x_rows: int, scheme: str, re: float, dt: float, dx: float,
    v_h, p_h, const_h, va_ref,
    code_c, code_p8, code_n8, fluid_ref,
    v_out, vbc_out, win_ref, sems, head_sems,
):
    """MAC velocity with SLIDING windows for v/p/const (see the
    "sliding-window fetch" note in pallas_stencil.py). Plane layout:
    0-1 v, 2 p, 3-4 bc_const."""
    ti = pl.program_id(0)
    slot = jax.lax.rem(ti, 2)
    rows = t + 2 * _HB
    srcs = ((v_h, 0, True), (p_h, 2, False), (const_h, 3, True))

    def full_dmas(s):
        out = []
        for ref, k, lead in srcs:
            src = ref.at[:, pl.ds(0, rows), :] if lead else ref.at[pl.ds(0, rows), :]
            dst = win_ref.at[s, pl.ds(k, 2)] if lead else win_ref.at[s, k]
            out.append(pltpu.make_async_copy(src, dst, sems.at[s, k]))
        return out

    def tail_dmas(tin, s):
        ds = pl.ds(_slide_tail_start(tin, t, x_rows), t)
        dr = pl.ds(2 * _HB, t)
        out = []
        for ref, k, lead in srcs:
            src = ref.at[:, ds, :] if lead else ref.at[ds, :]
            dst = win_ref.at[s, pl.ds(k, 2), dr] if lead else win_ref.at[s, k, dr]
            out.append(pltpu.make_async_copy(src, dst, sems.at[s, k]))
        return out

    _slide_fetch(win_ref, full_dmas, tail_dmas, ti, n_t, t, slot,
                 head_sems=head_sems)

    halo = 2 if scheme == "kk" else 1

    def win(k, n, hx):
        w = _k32(win_ref[slot, k : k + n, _HB - hx : _HB + t + hx, :])
        return w[0] if n == 1 else w

    ve = win(0, 2, 2 + halo)
    pe = win(2, 1, 1)
    conste = win(3, 2, halo)
    codee = _ext(code_c[:], code_p8[:], code_n8[:], ti, n_t, halo).astype(jnp.int32)
    _mac_velocity_core(ti, n_t, scheme, re, dt, dx, ve, pe, va_ref[:],
                       codee, conste, fluid_ref[:] != 0, v_out, vbc_out)


def _mac_velocity_core(
    ti, n_t: int, scheme: str, re: float, dt: float, dx: float,
    ve, pe, vac, codee, conste, fluid, v_out, vbc_out,
):
    v_out, vbc_out = _cast_store(v_out), _cast_store(vbc_out)
    vac = _k32(vac)
    halo = 2 if scheme == "kk" else 1
    # BC on rows [-halo, t+halo), re-clamped at grid-edge tiles.
    uc, wc = _velocity_bc_window(ve[0], ve[1], codee, conste[0], conste[1])
    uc = _reclamp(uc, ti, n_t, halo)
    wc = _reclamp(wc, ti, n_t, halo)
    u_cen = uc[halo:-halo]
    w_cen = wc[halo:-halo]

    advect = _advect_kk_window if scheme == "kk" else _advect_upwind_window
    adv_u = advect(u_cen, w_cen, uc, dx)
    adv_w = advect(u_cen, w_cen, wc, dx)

    gpx, gpy = _grad_pair_window(pe, dx)
    lap_u = _lap_window(uc[halo - 1 : uc.shape[0] - halo + 1], dx)
    lap_w = _lap_window(wc[halo - 1 : wc.shape[0] - halo + 1], dx)

    inv_re = 1.0 / re  # strength-reduced (see _lap_window)
    un = u_cen + dt * (-adv_u - gpx + lap_u * inv_re)
    wn = w_cen + dt * (-adv_w - gpy + lap_w * inv_re)

    v_out[0] = jnp.where(fluid, un, vac[0])
    v_out[1] = jnp.where(fluid, wn, vac[1])
    vbc_out[0] = u_cen
    vbc_out[1] = w_cen


def mac_velocity_phase_pallas(
    v, p, v_alt, scene, scheme: str, re: float, dt: float, dx: float,
    *, tile_x: int | None = None, sliding: bool | None = None,
    interpret: bool = False,
):
    """Velocity BC + fused MAC momentum update (``fs/solver.py:79-107``).

    Returns ``(v_cur, vc)`` — the updated velocity (fluid cells; alt
    elsewhere) and the BC'd pre-step velocity (the new alternate)."""
    x_rows, y_cols = p.shape

    def cost_rows(t: int) -> float:
        # The 40-row stack term is deliberately NOT recalibrated down
        # like the dye kernel's: a frontier-fit coefficient (9) was
        # measured end-to-end and REGRESSES despite compiling — t=64 at
        # Y=1600 gains 2%, but t=128 at Y=800 loses 4% and t=16 at
        # Y=4096 collapses to 2.7 steps/s (vs 49 at t=8; compiles-but-
        # thrashes). Mosaic feasibility is not a perf model; keep the
        # conservative figure whose tile choices are all measured good.
        blocks = 7 * (t + 2 * _HB) + 0.3 * (t + 2 * _HB) + 4 * t + 0.25 * t
        return 2 * blocks + 40 * t

    t = _check_tile(tile_x, x_rows) if tile_x else _vmem_tile(x_rows, y_cols, cost_rows)
    if t is None:
        msg = f"no valid tile for grid ({x_rows}, {y_cols})"
        raise PallasInfeasibleError(msg)
    n_t = x_rows // t

    if sliding is None:
        sliding = True
    sliding = (sliding and _dma_ok(v, p, scene.bc_const) and y_cols % _HY == 0
               and x_rows >= t + 2 * _HB and n_t >= 2)

    rows = t + 2 * _HB
    scratch_shapes = []
    if sliding:
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        specs = (
            [any_spec, any_spec, any_spec, _center_spec(t, y_cols, 2)]
            + _halo_triple_specs(t, y_cols, n_t, None)
            + [_center_spec(t, y_cols, None)]
        )
        args = [v, p, scene.bc_const, v_alt] + [scene.vbc_code] * 3 + [scene.fluid8]
        kernel = functools.partial(
            _mac_velocity_kernel_slide, n_t, t, x_rows, scheme, re, dt, dx)
        scratch_shapes = [
            pltpu.VMEM((2, 5, rows, y_cols), v.dtype),
            pltpu.SemaphoreType.DMA((2, 5)),
            pltpu.SemaphoreType.DMA(2),
        ]
        f32_bytes = 5 * (rows + (n_t - 1) * t) * y_cols * v.dtype.itemsize
    else:
        h2 = lambda lead: _halo_triple_specs(t, y_cols, n_t, lead)  # noqa: E731
        specs = (
            h2(2) + h2(None) + [_center_spec(t, y_cols, 2)]
            + h2(None) + h2(2) + [_center_spec(t, y_cols, None)]
        )
        args = [v] * 3 + [p] * 3 + [v_alt] + [scene.vbc_code] * 3 \
            + [scene.bc_const] * 3 + [scene.fluid8]
        kernel = functools.partial(_mac_velocity_kernel, n_t, scheme, re, dt, dx)
        f32_bytes = 5 * triple_bytes(x_rows, y_cols, t, None, itemsize=v.dtype.itemsize)
    log_traffic(
        "mac_velocity",
        f32_bytes
        + triple_bytes(x_rows, y_cols, t, None, itemsize=1)
        + center_bytes(x_rows, y_cols, None, itemsize=1)
        + 6 * center_bytes(x_rows, y_cols, None, itemsize=v.dtype.itemsize),
        t=None if sliding else t, slide_t=t if sliding else None,
    )

    out_sd = jax.ShapeDtypeStruct(v.shape, v.dtype)
    return pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=specs,
        out_specs=[_center_spec(t, y_cols, 2)] * 2,
        out_shape=[out_sd] * 2,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)


def _mac_dye_kernel(
    n_t: int, scheme: str, dt: float, dx: float,
    d_c, d_p8, d_n8, vel_ref, da_ref, bcd_c, bcd_p8, bcd_n8,
    inflow_c, inflow_p8, inflow_n8, fluid_ref,
    d_out, dbc_out,
):
    ti = pl.program_id(0)
    chans = d_c.shape[0]
    halo = 2 if scheme == "kk" else 1
    d_out, dbc_out = _cast_store(d_out), _cast_store(dbc_out)

    inflowe = _ext(inflow_c[:], inflow_p8[:], inflow_n8[:], ti, n_t, halo).astype(jnp.int32)
    fluid = fluid_ref[:] != 0
    u_cen = _k32(vel_ref[0])
    w_cen = _k32(vel_ref[1])
    advect = _advect_kk_window if scheme == "kk" else _advect_upwind_window

    for c in range(chans):
        de = _ext(d_c[c], d_p8[c], d_n8[c], ti, n_t, halo)
        bcde = _ext(bcd_c[c], bcd_p8[c], bcd_n8[c], ti, n_t, halo)
        dc = _reclamp(jnp.where(inflowe != 0, bcde, de), ti, n_t, halo)
        dn = dc[halo:-halo] - dt * advect(u_cen, w_cen, dc, dx)
        d_out[c] = clamp_field(jnp.where(fluid, dn, _k32(da_ref[c])), 0.0, 1.0)
        dbc_out[c] = dc[halo:-halo]


def _mac_dye_kernel_slide(
    n_t: int, t: int, x_rows: int, chans: int, scheme: str, dt: float, dx: float,
    d_h, bcd_h, vel_ref, da_ref,
    inflow_c, inflow_p8, inflow_n8, fluid_ref,
    d_out, dbc_out, win_ref, sems, head_sems,
):
    """Channel-folded MAC dye with SLIDING windows for dye/bc_dye (one
    lead-dim copy each per tile — see the "sliding-window fetch" note
    in pallas_stencil.py). Plane layout: 0..chans dye, chans.. bc_dye."""
    ti = pl.program_id(0)
    slot = jax.lax.rem(ti, 2)
    rows = t + 2 * _HB
    srcs = ((d_h, 0), (bcd_h, chans))

    def full_dmas(s):
        return [
            pltpu.make_async_copy(
                ref.at[:, pl.ds(0, rows), :],
                win_ref.at[s, pl.ds(k, chans)], sems.at[s, k])
            for ref, k in srcs
        ]

    def tail_dmas(tin, s):
        ds = pl.ds(_slide_tail_start(tin, t, x_rows), t)
        return [
            pltpu.make_async_copy(
                ref.at[:, ds, :],
                win_ref.at[s, pl.ds(k, chans), pl.ds(2 * _HB, t)], sems.at[s, k])
            for ref, k in srcs
        ]

    _slide_fetch(win_ref, full_dmas, tail_dmas, ti, n_t, t, slot,
                 head_sems=head_sems)

    halo = 2 if scheme == "kk" else 1
    d_out, dbc_out = _cast_store(d_out), _cast_store(dbc_out)
    inflowe = _ext(inflow_c[:], inflow_p8[:], inflow_n8[:], ti, n_t, halo).astype(jnp.int32)
    fluid = fluid_ref[:] != 0
    u_cen = _k32(vel_ref[0])
    w_cen = _k32(vel_ref[1])
    advect = _advect_kk_window if scheme == "kk" else _advect_upwind_window

    for c in range(chans):
        de = _k32(win_ref[slot, c, _HB - halo : _HB + t + halo, :])
        bcde = _k32(win_ref[slot, chans + c, _HB - halo : _HB + t + halo, :])
        dc = _reclamp(jnp.where(inflowe != 0, bcde, de), ti, n_t, halo)
        dn = dc[halo:-halo] - dt * advect(u_cen, w_cen, dc, dx)
        d_out[c] = clamp_field(jnp.where(fluid, dn, _k32(da_ref[c])), 0.0, 1.0)
        dbc_out[c] = dc[halo:-halo]


def _mac_dye_kernel_cgrid(
    n_t: int, scheme: str, dt: float, dx: float,
    d_c, d_p8, d_n8, vel_ref, da_c2, bcd_c, bcd_p8, bcd_n8,
    inflow_c, inflow_p8, inflow_n8, fluid_ref,
    d_out, dbc_out,
):
    ti = pl.program_id(0)
    halo = 2 if scheme == "kk" else 1
    d_out, dbc_out = _cast_store(d_out), _cast_store(dbc_out)

    inflowe = _ext(inflow_c[:], inflow_p8[:], inflow_n8[:], ti, n_t, halo).astype(jnp.int32)
    fluid = fluid_ref[:] != 0
    u_cen = _k32(vel_ref[0])
    w_cen = _k32(vel_ref[1])
    advect = _advect_kk_window if scheme == "kk" else _advect_upwind_window

    de = _ext(d_c[0], d_p8[0], d_n8[0], ti, n_t, halo)
    bcde = _ext(bcd_c[0], bcd_p8[0], bcd_n8[0], ti, n_t, halo)
    dc = _reclamp(jnp.where(inflowe != 0, bcde, de), ti, n_t, halo)
    dn = dc[halo:-halo] - dt * advect(u_cen, w_cen, dc, dx)
    d_out[0] = clamp_field(jnp.where(fluid, dn, _k32(da_c2[0])), 0.0, 1.0)
    dbc_out[0] = dc[halo:-halo]


def mac_dye_phase_pallas(
    dye, dye_alt, vel, scene, scheme: str, dt: float, dx: float,
    *, tile_x: int | None = None, interpret: bool = False,
    channel_grid: bool | None = None, sliding: bool | None = None,
):
    """Dye BC + upwind/KK advection + clamp (``fs/solver.py:149-161``).

    Returns ``(dye_cur, dc)`` — clamped advected dye and the BC'd
    pre-step dye (the new alternate).

    ``channel_grid`` selects a ``(n_t, chans)`` c-minor grid (one
    channel's blocks per program; velocity/masks constant-index across
    the minor steps → fetched once per row tile), the layout that won
    13% on the CIP dye kernel (VERDICT r2 item #6 asks for a measured
    ledger entry on this kernel either way). Default stays folded until
    the on-chip A/B lands — the first attempt was voided by a degraded
    tunnel window (kk measured 25.7 steps/s against its 540 healthy
    rate); the grid variant is selectable and interpret-tested
    bit-identical meanwhile."""
    chans, x_rows, y_cols = dye.shape
    if channel_grid is None:
        channel_grid = False

    def cost_rows(t: int) -> float:
        per_ch = 1 if channel_grid else chans
        blocks = 2 * per_ch * (t + 2 * _HB) + 0.3 * (t + 2 * _HB) + (3 * per_ch + 2) * t
        return 2 * blocks + 30 * t

    t = _check_tile(tile_x, x_rows) if tile_x else _vmem_tile(x_rows, y_cols, cost_rows)
    if t is None:
        msg = f"no valid tile for grid ({x_rows}, {y_cols})"
        raise PallasInfeasibleError(msg)
    n_t = x_rows // t

    if sliding is None:
        sliding = True
    sliding = (sliding and not channel_grid and _dma_ok(dye, vel, scene.bc_dye)
               and y_cols % _HY == 0 and x_rows >= t + 2 * _HB and n_t >= 2)
    isz = dye.dtype.itemsize
    f32_in = (
        2 * chans * ((t + 2 * _HB) + (n_t - 1) * t) * y_cols * isz
        if sliding else 2 * chans * triple_bytes(x_rows, y_cols, t, None, itemsize=isz)
    )
    log_traffic(
        "mac_dye",
        f32_in
        + triple_bytes(x_rows, y_cols, t, None, itemsize=1)
        + (2 + chans) * center_bytes(x_rows, y_cols, None, itemsize=isz)
        + center_bytes(x_rows, y_cols, None, itemsize=1)
        + 2 * chans * center_bytes(x_rows, y_cols, None, itemsize=isz),
        t=None if sliding else t, slide_t=t if sliding else None,
    )
    out_sd = jax.ShapeDtypeStruct(dye.shape, dye.dtype)

    if channel_grid:
        hc = lambda lead: _halo_triple_specs_cgrid(t, y_cols, n_t, lead)  # noqa: E731
        specs = (
            hc("c") + [_center_spec_cgrid(t, y_cols, 2), _center_spec_cgrid(t, y_cols, "c")]
            + hc("c") + hc(None) + [_center_spec_cgrid(t, y_cols, None)]
        )
        args = [dye] * 3 + [vel, dye_alt] + [scene.bc_dye] * 3 + [scene.inflow8] * 3 \
            + [scene.fluid8]
        kernel = functools.partial(_mac_dye_kernel_cgrid, n_t, scheme, dt, dx)
        return pl.pallas_call(
            kernel,
            grid=(n_t, chans),
            in_specs=specs,
            out_specs=[_center_spec_cgrid(t, y_cols, "c")] * 2,
            out_shape=[out_sd] * 2,
            interpret=interpret,
        )(*args)

    if sliding:
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        specs = (
            [any_spec, any_spec, _center_spec(t, y_cols, 2),
             _center_spec(t, y_cols, chans)]
            + _halo_triple_specs(t, y_cols, n_t, None)
            + [_center_spec(t, y_cols, None)]
        )
        args = [dye, scene.bc_dye, vel, dye_alt] + [scene.inflow8] * 3 + [scene.fluid8]
        kernel = functools.partial(
            _mac_dye_kernel_slide, n_t, t, x_rows, chans, scheme, dt, dx)
        rows = t + 2 * _HB
        return pl.pallas_call(
            kernel,
            grid=(n_t,),
            in_specs=specs,
            out_specs=[_center_spec(t, y_cols, chans)] * 2,
            out_shape=[out_sd] * 2,
            scratch_shapes=[
                pltpu.VMEM((2, 2 * chans, rows, y_cols), dye.dtype),
                pltpu.SemaphoreType.DMA((2, 2 * chans)),
                pltpu.SemaphoreType.DMA(2),
            ],
            interpret=interpret,
        )(*args)

    h2 = lambda lead: _halo_triple_specs(t, y_cols, n_t, lead)  # noqa: E731
    specs = (
        h2(chans) + [_center_spec(t, y_cols, 2), _center_spec(t, y_cols, chans)]
        + h2(chans) + h2(None) + [_center_spec(t, y_cols, None)]
    )
    args = [dye] * 3 + [vel, dye_alt] + [scene.bc_dye] * 3 + [scene.inflow8] * 3 + [scene.fluid8]
    kernel = functools.partial(_mac_dye_kernel, n_t, scheme, dt, dx)

    return pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=specs,
        out_specs=[_center_spec(t, y_cols, chans)] * 2,
        out_shape=[out_sd] * 2,
        interpret=interpret,
    )(*args)
