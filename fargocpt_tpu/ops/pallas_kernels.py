"""Hand-fused Pallas TPU kernels for the transport hot path.

The azimuthal van Leer sweep dominates the FARGO step: for each of the two
FARGO passes the XLA version makes ~8 HBM round-trips over the stacked
(K, NR, NAZ) quantity batch (slopes, upwind stars, fluxes, update as
separate fusion clusters split by the lane rolls). The fused kernel below
performs the complete sweep — density star, per-quantity specific values,
upwind interpolation, flux differencing, update — with ONE read and ONE
write of the batch per pass: rows are independent in the azimuthal sweep,
so the grid tiles the radial axis with no halo, and the azimuthal
neighbor accesses are in-register lane rolls.

Falls back to the pure-jnp implementation off-TPU (CPU tests run the jnp
path; a parity test pins the two implementations together).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

# index-map literals MUST be strong i32: under x64 a Python-int 0 in a
# BlockSpec index map becomes an i64 constant and Mosaic fails to legalize
# the index-map function's (i64, i32) return
_Z = np.int32(0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift):
    """Lane-axis circular roll inside the kernel (azimuthal neighbors).
    pltpu.roll requires a non-negative shift.  The shift is pinned to i32:
    under x64 a Python-int shift is converted to an i64 scalar, and
    Mosaic's dynamic_rotate only lowers i32 shifts."""
    shift = shift % x.shape[-1]
    if isinstance(shift, (int, np.integer)):
        shift = np.int32(shift)
    else:
        shift = shift.astype(jnp.int32)
    return pltpu.roll(x, shift, axis=x.ndim - 1)


def _van_leer(a, b):
    prod = a * b
    denom = jnp.where(prod > 0.0, a + b, 1.0)
    return jnp.where(prod > 0.0, 2.0 * prod / denom, 0.0)


def _mc(a, b):
    def minmod(p, q):
        return jnp.where(p * q > 0.0,
                         jnp.where(jnp.abs(p) < jnp.abs(q), p, q), 0.0)
    return minmod(0.5 * (a + b), 2.0 * minmod(a, b))


def _theta_sweep_kernel(dt_ref, qs_ref, v_ref, rb_ref, coef_ref,
                        inv_surf_ref, out_ref, *, k_quant: int, dphi: float,
                        limiter: int):
    """One radial tile of the azimuthal sweep.

    qs_ref:  (K, T, NAZ) quantity batch; entry K-1 is the surface density
    v_ref:   (T, NAZ) transport velocity
    rb_ref:  (T, 1) cell-center radii
    coef_ref:(T, 1) (Rsup - Rinf)
    inv_surf_ref: (T, 1)
    """
    dt = dt_ref[0, 0]
    v = v_ref[:]
    rb = rb_ref[:]
    dxtheta = dphi * rb
    inv_dxtheta = 1.0 / dxtheta
    ksi = v * dt
    lim = _mc if limiter == 1 else _van_leer

    def star(q):
        """Upwind interface value of q at azimuthal interface j
        (between cells j-1 and j)."""
        qm = _roll(q, 1)
        dq = 0.5 * lim(_roll(q, -1) - q, q - qm) * inv_dxtheta
        up = qm + (dxtheta - ksi) * _roll(dq, 1)
        dn = q - (dxtheta + ksi) * dq
        return jnp.where(ksi > 0.0, up, dn)

    sig = qs_ref[k_quant - 1]
    dens_star = star(sig)
    inv_sig = 1.0 / sig
    coef = coef_ref[:] * dt
    base_flux = dens_star * v * coef          # (T, NAZ)
    for k in range(k_quant):
        if k == k_quant - 1:
            qstar = 1.0                        # work = sigma/sigma
            f = base_flux
        else:
            work = qs_ref[k] * inv_sig
            f = star(work) * base_flux
        out_ref[k] = qs_ref[k] + (f - _roll(f, -1)) * inv_surf_ref[:]


@functools.partial(jax.jit, static_argnames=("dphi", "limiter", "tile"))
def theta_sweep_pallas(qs, v, rb_col, coef_col, inv_surf_col, dt,
                       dphi: float, limiter: int, tile: int = 16):
    """Fused azimuthal van Leer sweep over the (K, NR, NAZ) batch."""
    k_quant, nr, naz = qs.shape
    grid = (nr // tile,)
    kernel = functools.partial(_theta_sweep_kernel, k_quant=k_quant,
                               dphi=dphi, limiter=limiter)
    dt_arr = jnp.reshape(jnp.asarray(dt, qs.dtype), (1, 1))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (_Z, _Z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((k_quant, tile, naz), lambda i: (_Z, i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, naz), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_quant, tile, naz), lambda i: (_Z, i, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qs.shape, qs.dtype),
    )(dt_arr, qs, v, rb_col, coef_col, inv_surf_col)


def _radial_momenta_kernel(scal_ref, sig_ref, vr_ref, vaz_ref, vnext_ref,
                           e_ref, base_ref, rb_ref, invdrm_ref, cm_ref,
                           cp_ref, inv_surf_ref, out_ref, *, k_quant: int,
                           limiter: int):
    """Radial van Leer sweep with IN-KERNEL momenta construction
    (reference src/TransportEuler.cpp:471-493 ``compute_momenta_from_velocities``
    fused with :545-620 ``VanLeerRadial``).

    The momenta never exist in HBM: each grid step k builds the specific
    form of one advected quantity directly from the primitive blocks
    (rp/sigma = vrad+, am/sigma = (vaz + Omega r) r, E/sigma, 1) and
    transports q = work * sigma. Saves a full write+read of the (K, NR,
    NAZ) batch per hydro step versus materializing the stack.

    scal_ref: SMEM (2,) = [dt, omega_frame].
    """
    dt = scal_ref[0]
    omega = scal_ref[1]
    nr = sig_ref.shape[0]
    lim = _mc if limiter == 1 else _van_leer
    sig = sig_ref[:]
    rb = rb_ref[:]

    works = [
        vr_ref[1:, :],                                # rp / sigma
        vr_ref[:-1, :],                               # rm / sigma
        (vnext_ref[:] + rb * omega) * rb,             # ap / sigma
        (vaz_ref[:] + rb * omega) * rb,               # am / sigma
    ]
    if k_quant == 6:
        works.append(e_ref[:] * (1.0 / sig))          # energy / sigma
    works.append(jnp.ones_like(sig))                  # sigma / sigma

    k = pl.program_id(1)
    work = works[0]
    for idx in range(1, k_quant):
        work = jnp.where(k == idx, works[idx], work)
    q = work * sig

    s = (work[1:, :] - work[:-1, :]) * invdrm_ref[1:nr]
    zrow = jnp.zeros_like(work[:1, :])
    dq = jnp.concatenate([zrow, lim(s[1:, :], s[:-1, :]), zrow], axis=0)

    vf = vr_ref[1:nr, :]
    up = work[:-1, :] + (cm_ref[1:nr] - vf * dt) * 0.5 * dq[:-1, :]
    dn = work[1:, :] - (cp_ref[1:nr] + vf * dt) * 0.5 * dq[1:, :]
    qstar_mid = jnp.where(vf > 0.0, up, dn)
    flux_mid = qstar_mid * base_ref[1:nr, :]
    zface = jnp.zeros_like(flux_mid[:1, :])
    fl = jnp.concatenate([zface, flux_mid, zface], axis=0)
    out_ref[0] = q + (fl[:-1, :] - fl[1:, :]) * inv_surf_ref[:]


@functools.partial(jax.jit, static_argnames=("k_quant", "limiter",
                                              "col_tile"))
def radial_momenta_sweep_pallas(sigma, vrad, vaz, energy, base, dt,
                                omega_frame, rb, invdrm, cm, cp, inv_surf,
                                k_quant: int, limiter: int,
                                col_tile: int = 128):
    """Momenta construction + radial van Leer sweep, one fused kernel.

    Returns the radially-transported quantity batch (K, NR, NAZ) ordered
    [rp, rm, ap, am, (energy), sigma]."""
    nr, naz = sigma.shape
    vnext = jnp.roll(vaz, -1, axis=-1)
    kernel = functools.partial(_radial_momenta_kernel, k_quant=k_quant,
                               limiter=limiter)
    scal = jnp.stack([jnp.asarray(dt, sigma.dtype),
                      jnp.asarray(omega_frame, sigma.dtype)])
    col = lambda j, k: (_Z, j)
    return pl.pallas_call(
        kernel,
        grid=(naz // col_tile, k_quant),
        in_specs=[
            pl.BlockSpec((2,), lambda j, k: (_Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((nr, col_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, col_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, col_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, 1), lambda j, k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, 1), lambda j, k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, 1), lambda j, k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, 1), lambda j, k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, 1), lambda j, k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nr, col_tile), lambda j, k: (k, _Z, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_quant, nr, naz), sigma.dtype),
    )(scal, sigma, vrad, vaz, vnext, energy, base, rb, invdrm, cm, cp,
      inv_surf)


# column indices of the packed geometry-column input of the sources kernel
_SRC_COLS = dict(rb=0, ra_lo=1, ra_hi=2, inv_ra_lo=3, invdrm=4,
                 invdxtheta=5, inv_diff_rsup_rb=6, inv_rb=7, hfac=8,
                 cs_iso=9, drift=10)
_N_SRC_COLS = 16


def make_sources_prep(phys, constants, geometry, g, cs_iso, n_bodies, dtype):
    """Static inputs of the fused sources kernel: packed geometry columns,
    cos/sin azimuth rows, and the per-body smoothing-mode tuple."""
    nr = geometry.nrad
    omega_k = jnp.sqrt(constants.G * phys.hydro_center_mass / g.rb ** 3)
    hfac = 1.0 / (jnp.sqrt(phys.adiabatic_index) * omega_k) \
        if phys.is_adiabatic else 1.0 / omega_k
    drift = jnp.zeros_like(g.rb)
    if phys.imposed_disk_drift != 0.0:
        drift = phys.imposed_disk_drift * 0.5 * \
            g.rb ** (-2.5 + phys.sigma_slope)
    named = {
        "rb": g.rb, "ra_lo": g.ra[:nr], "ra_hi": g.ra[1:],
        "inv_ra_lo": g.inv_ra[:nr], "invdrm": g.inv_diff_rmed[:nr],
        "invdxtheta": 2.0 / (g.dphi * (g.rsup + g.rinf)),
        "inv_diff_rsup_rb": g.inv_diff_rsup_rb,
        "inv_rb": g.inv_rb, "hfac": hfac,
        "cs_iso": jnp.broadcast_to(cs_iso, (nr, 1)),
        "drift": drift,
    }
    cols = jnp.zeros((nr, _N_SRC_COLS), dtype)
    for name, idx in _SRC_COLS.items():
        cols = cols.at[:, idx].set(named[name][:, 0].astype(dtype))
    cos_row = jnp.asarray(geometry.cos_phi, dtype)[None, :]
    sin_row = jnp.asarray(geometry.sin_phi, dtype)[None, :]
    smooth_modes = tuple(
        "zero" if (phys.compatibility_no_star_smoothing and k == 0)
        else "scalar" if phys.compatibility_smoothing_planetloc
        else "cell" for k in range(n_bodies))
    return cols, cos_row, sin_row, smooth_modes


def _sources_kernel(scal_ref, sig_ref, sigp_ref, e_ref, ep_ref,
                    vaz_ref, vazn_ref, vr_ref, cols_ref, cos_ref,
                    sin_ref, cosp_ref, sinp_ref,
                    vr_out, vaz_out, *, n_bodies: int, adiabatic: bool,
                    gamma: float, eps: float, smooth_modes: tuple):
    """Fused source-term substep (reference src/SourceEuler.cpp:325-428 +
    src/Pframeforce.cpp:21-95): N-body potential evaluation and the radial
    and azimuthal momentum updates in one kernel (adiabatic compression
    heating stays in XLA — it only needs the outputs).

    Column tiling (full radial extent, a 128-lane azimuth tile per grid
    step) makes every radial stencil a free sublane slice; the azimuthal
    (lane) neighbors come from pre-rolled copies of sigma/energy/vaz. The
    POTENTIAL grid is never materialized in HBM: body positions/masses are
    scalars in SMEM and the potential of the tile (and of its lane-shifted
    neighbor) is recomputed on the VPU, which costs ~20 flops/cell against
    the two full HBM round-trips the staged version pays.

    scal_ref layout: [dt, omega_frame, indirect_x, indirect_y] +
    per-body [G*m, x, y, r_cubic, smooth2_scalar].
    """
    dt = scal_ref[0]
    omega = scal_ref[1]
    ix = scal_ref[2]
    iy = scal_ref[3]
    nr = sig_ref.shape[0]

    sig, sigp = sig_ref[:], sigp_ref[:]
    e, ep = e_ref[:], ep_ref[:]
    vaz, vazn = vaz_ref[:], vazn_ref[:]
    vrad = vr_ref[:]
    col = lambda name: cols_ref[:, _SRC_COLS[name]:_SRC_COLS[name] + 1]
    rb = col("rb")
    hfac = col("hfac")

    if adiabatic:
        def press_of(s, ee):
            return (gamma - 1.0) * ee

        def h_of(s, ee):
            return jnp.sqrt(gamma * (gamma - 1.0) * ee / s) * hfac
    else:
        cs_iso = col("cs_iso")

        def press_of(s, ee):
            return s * cs_iso * cs_iso

        def h_of(s, ee):
            return jnp.broadcast_to(cs_iso * hfac, s.shape)

    def pot_eval(cosphi, sinphi, h):
        """reference src/Pframeforce.cpp:21-95 CalculateNbodyPotential."""
        x = rb * cosphi
        y = rb * sinphi
        pot = -(ix * x + iy * y)
        sm2_cell = (eps * h) * (eps * h)
        for k in range(n_bodies):
            gm = scal_ref[4 + 5 * k]
            bx = scal_ref[5 + 5 * k]
            by = scal_ref[6 + 5 * k]
            rsm = scal_ref[7 + 5 * k]
            if smooth_modes[k] == "cell":
                sm2 = sm2_cell
            elif smooth_modes[k] == "scalar":
                sm2 = scal_ref[8 + 5 * k]
            else:                                    # "zero"
                sm2 = 0.0
            dx = x - bx
            dy = y - by
            d = jnp.sqrt(dx * dx + dy * dy + sm2)
            q = d / jnp.where(rsm > 0.0, rsm, 1.0)
            klahr = jnp.where((rsm > 0.0) & (d < rsm),
                              q ** 4 - 2.0 * q ** 3 + 2.0 * q, 1.0)
            pot = pot - gm / d * klahr
        return pot

    press = press_of(sig, e)
    pressp = press_of(sigp, ep)
    pot = pot_eval(cos_ref[:], sin_ref[:], h_of(sig, e))
    potp = pot_eval(cosp_ref[:], sinp_ref[:], h_of(sigp, ep))

    # --- radial momentum, faces 2..NR-2 (src/SourceEuler.cpp:325-372) ---
    def face_update(s_hi, s_lo, p_hi, p_lo, pot_hi, pot_lo, va_hi, va_lo,
                    van_hi, van_lo, invdrm_f, ra_f, inv_ra_f):
        gradp = 2.0 / (s_hi + s_lo) * (p_hi - p_lo) * invdrm_f
        gradphi = (pot_hi - pot_lo) * invdrm_f
        vt = 0.25 * (va_hi + van_hi + va_lo + van_lo) + ra_f * omega
        return dt * (-gradp - gradphi + vt * vt * inv_ra_f)

    invdrm = col("invdrm")                       # row r = face r
    ra_lo = col("ra_lo")                         # row r = ra[r]
    ra_hi = col("ra_hi")                         # row r = ra[r+1]
    inv_ra_lo = col("inv_ra_lo")
    # faces f = 1..NR-1 live at slice index f-1
    dv = face_update(sig[1:], sig[:-1], press[1:], press[:-1],
                     pot[1:], pot[:-1], vaz[1:], vaz[:-1],
                     vazn[1:], vazn[:-1], invdrm[1:], ra_lo[1:],
                     inv_ra_lo[1:])
    z1 = jnp.zeros_like(dv[:1])
    add = jnp.concatenate([z1, z1, dv[1:nr - 2], z1, z1], axis=0)  # (NR+1,C)
    vr_new = vrad + add

    # --- azimuthal momentum, rings 1..NR-2 (src/SourceEuler.cpp:375-428) ---
    invdxth = col("invdxtheta")
    drift = col("drift")

    def az_update(va, s_hi, s_lo, p_hi, p_lo, pot_hi, pot_lo):
        gradp = 2.0 / (s_hi + s_lo) * (p_hi - p_lo) * invdxth
        gradphi = (pot_hi - pot_lo) * invdxth
        return va + dt * (-gradp - gradphi) + dt * drift

    va_full = az_update(vaz, sig, sigp, press, pressp, pot, potp)
    va_new = jnp.concatenate([vaz[:1], va_full[1:nr - 1], vaz[nr - 1:]],
                             axis=0)

    vr_out[...] = vr_new
    vaz_out[...] = va_new


@functools.partial(jax.jit, static_argnames=(
    "n_bodies", "adiabatic", "gamma", "eps", "smooth_modes", "col_tile"))
def sources_fused_pallas(sigma, energy, vaz, vrad, cols, cosphi, sinphi,
                         scal, n_bodies: int, adiabatic: bool, gamma: float,
                         eps: float, smooth_modes: tuple,
                         col_tile: int = 128):
    """Fused potential + momentum source terms. Returns (vrad, vaz); the
    caller applies compression heating to the energy afterwards."""
    nr, naz = sigma.shape
    roll_p = lambda a: jnp.roll(a, 1, axis=-1)
    roll_n = lambda a: jnp.roll(a, -1, axis=-1)
    kernel = functools.partial(
        _sources_kernel, n_bodies=n_bodies, adiabatic=adiabatic,
        gamma=gamma, eps=eps, smooth_modes=smooth_modes)
    cell = lambda j: (_Z, j)
    row = lambda j: (_Z, j)
    specs = [
        pl.BlockSpec((4 + 5 * n_bodies,), lambda j: (_Z,),
                     memory_space=pltpu.SMEM),
        *[pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM)] * 6,
        pl.BlockSpec((nr + 1, col_tile), cell, memory_space=pltpu.VMEM),
        pl.BlockSpec((nr, _N_SRC_COLS), lambda j: (_Z, _Z),
                     memory_space=pltpu.VMEM),
        *[pl.BlockSpec((1, col_tile), row, memory_space=pltpu.VMEM)] * 4,
    ]
    out_specs = (
        pl.BlockSpec((nr + 1, col_tile), cell, memory_space=pltpu.VMEM),
        pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct(vrad.shape, vrad.dtype),
        jax.ShapeDtypeStruct(vaz.shape, vaz.dtype),
    )
    vr_new, va_new = pl.pallas_call(
        kernel, grid=(naz // col_tile,), in_specs=specs,
        out_specs=out_specs, out_shape=out_shape,
    )(scal, sigma, roll_p(sigma), energy, roll_p(energy),
      vaz, roll_n(vaz), vrad, cols, cosphi, sinphi,
      roll_p(cosphi), roll_p(sinphi))
    return vr_new, va_new


def _fargo_theta_kernel(shift_ref, dt_ref, qs_ref, vres_ref, vconst_ref,
                        rb_ref, coef_ref, inv_surf_ref, out_ref, *,
                        k_quant: int, dphi: float, limiter: int,
                        two_pass: bool, tile: int):
    """One radial tile of the COMPLETE FARGO azimuthal update: residual
    van Leer sweep, (optional) uniform-residual sweep, and the per-ring
    integer-cell roll — fused so the (K, NR, NAZ) batch crosses HBM once
    instead of three times (reference src/TransportEuler.cpp:171-268
    OneWindTheta + UniformTransport + AdvectSHIFT)."""
    dt = dt_ref[0, 0]
    rb = rb_ref[:]
    dxtheta = dphi * rb
    inv_dxtheta = 1.0 / dxtheta
    coef = coef_ref[:] * dt
    inv_surf = inv_surf_ref[:]
    lim = _mc if limiter == 1 else _van_leer

    def star(q, ksi):
        qm = _roll(q, 1)
        dq = 0.5 * lim(_roll(q, -1) - q, q - qm) * inv_dxtheta
        up = qm + (dxtheta - ksi) * _roll(dq, 1)
        dn = q - (dxtheta + ksi) * dq
        return jnp.where(ksi > 0.0, up, dn)

    def sweep(fields, v):
        ksi = v * dt
        sig = fields[k_quant - 1]
        dens_star = star(sig, ksi)
        inv_sig = 1.0 / sig
        base = dens_star * v * coef
        outs = []
        for k in range(k_quant):
            if k == k_quant - 1:
                f = base
            else:
                f = star(fields[k] * inv_sig, ksi) * base
            outs.append(fields[k] + (f - _roll(f, -1)) * inv_surf)
        return outs

    fields = [qs_ref[k] for k in range(k_quant)]
    fields = sweep(fields, vres_ref[:])
    if two_pass:
        fields = sweep(fields, jnp.broadcast_to(vconst_ref[:],
                                                fields[0].shape))
    for k in range(k_quant):
        out_ref[k] = fields[k]

    # per-ring integer roll, in place on the output block.  Python-level
    # loop (static trip count): under x64 a lax.fori_loop induction var is
    # i64 even with np.int32 bounds, and Mosaic's i64->i32 convert lowering
    # recurses infinitely — unrolling keeps every row index a Python int.
    i = pl.program_id(0)
    for r in range(tile):
        s = shift_ref[i * tile + r]
        out_ref[:, r, :] = pltpu.roll(out_ref[:, r, :], s, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("dphi", "limiter", "tile", "two_pass"))
def fargo_theta_pallas(qs, vres, vconst_col, nshift, rb_col, coef_col,
                       inv_surf_col, dt, dphi: float, limiter: int,
                       tile: int = 16, two_pass: bool = True):
    """Fused FARGO azimuthal step (residual sweep + uniform sweep +
    integer shift) over the (K, NR, NAZ) quantity batch."""
    k_quant, nr, naz = qs.shape
    kernel = functools.partial(_fargo_theta_kernel, k_quant=k_quant,
                               dphi=dphi, limiter=limiter, two_pass=two_pass,
                               tile=tile)
    dt_arr = jnp.reshape(jnp.asarray(dt, qs.dtype), (1, 1))
    shifts = jnp.mod(nshift, naz).astype(jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(nr // tile,),
        in_specs=[
            pl.BlockSpec((nr,), lambda i: (_Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (_Z, _Z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((k_quant, tile, naz), lambda i: (_Z, i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, naz), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_quant, tile, naz), lambda i: (_Z, i, _Z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qs.shape, qs.dtype),
    )(shifts, dt_arr, qs, vres, vconst_col, rb_col, coef_col, inv_surf_col)


def _radial_sweep_kernel(dt_ref, qs_ref, sig_ref, vr_ref, base_ref,
                         invdrm_ref, cm_ref, cp_ref, inv_surf_ref, out_ref,
                         *, limiter: int):
    """One (quantity k, azimuth tile j) block of the radial van Leer sweep
    (reference src/TransportEuler.cpp:545-620 ``VanLeerRadial`` +
    :349-406 ``compute_star_radial``).

    The radial stencil needs no azimuthal halo, so the grid tiles the lane
    (azimuth) axis with the full radial extent resident in VMEM; the
    slope / upwind / flux / update chain for one quantity is fused into a
    single HBM read + write of its (NR, Tc) block.

    qs_ref:   (1, NR, Tc) the quantity being advected
    sig_ref:  (NR, Tc) pre-sweep surface density (specific-form divisor)
    vr_ref:   (NR+1, Tc) radial face velocity
    base_ref: (NR+1, Tc) dt*dphi*Ra*density_star*vrad (the sigma flux),
              precomputed once outside the kernel
    invdrm_ref: (NR+1, 1) 1/(Rmed[f]-Rmed[f-1]), row 0 = 0
    cm_ref/cp_ref: (NR+1, 1) Rmed[f]-Rmed[f-1] / Rmed[f+1]-Rmed[f]
    """
    dt = dt_ref[0, 0]
    nr = sig_ref.shape[0]
    lim = _mc if limiter == 1 else _van_leer
    q = qs_ref[0] * (1.0 / sig_ref[:])                        # (NR, Tc)

    # slope between cells i and i+1; S[i] = dqm of cell i+1 = dqp of cell i
    s = (q[1:, :] - q[:-1, :]) * invdrm_ref[1:nr]             # (NR-1, Tc)
    zrow = jnp.zeros_like(q[:1, :])
    dq = jnp.concatenate([zrow, lim(s[1:, :], s[:-1, :]), zrow], axis=0)

    vf = vr_ref[1:nr, :]                                      # faces 1..NR-1
    up = q[:-1, :] + (cm_ref[1:nr] - vf * dt) * 0.5 * dq[:-1, :]
    dn = q[1:, :] - (cp_ref[1:nr] + vf * dt) * 0.5 * dq[1:, :]
    qstar_mid = jnp.where(vf > 0.0, up, dn)
    flux_mid = qstar_mid * base_ref[1:nr, :]
    zface = jnp.zeros_like(flux_mid[:1, :])
    fl = jnp.concatenate([zface, flux_mid, zface], axis=0)    # (NR+1, Tc)
    out_ref[0] = qs_ref[0] + (fl[:-1, :] - fl[1:, :]) * inv_surf_ref[:]


@functools.partial(jax.jit, static_argnames=("limiter", "col_tile"))
def radial_sweep_pallas(qs, sigma, vrad, base, dt, invdrm, cm, cp, inv_surf,
                        limiter: int, col_tile: int = 128):
    """Fused radial van Leer sweep over the (K, NR, NAZ) quantity batch.

    ``base`` is the mass flux dt*dphi*Ra*density_star*vrad; it is also the
    flux of the density entry itself (work = sigma/sigma = 1 so the upwind
    star is 1 on interior faces), so callers reuse it for monitoring.
    """
    k_quant, nr, naz = qs.shape
    grid = (naz // col_tile, k_quant)                # k innermost: the
    # sigma/vrad/base blocks keep their index across the K inner steps and
    # stay resident in VMEM
    kernel = functools.partial(_radial_sweep_kernel, limiter=limiter)
    dt_arr = jnp.reshape(jnp.asarray(dt, qs.dtype), (1, 1))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, k: (_Z, _Z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nr, col_tile), lambda j, k: (k, _Z, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), lambda j, k: (_Z, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, col_tile), lambda j, k: (_Z, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, col_tile), lambda j, k: (_Z, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, 1), lambda j, k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, 1), lambda j, k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, 1), lambda j, k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, 1), lambda j, k: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nr, col_tile), lambda j, k: (k, _Z, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qs.shape, qs.dtype),
    )(dt_arr, qs, sigma, vrad, base, invdrm, cm, cp, inv_surf)


def _shift_kernel(shift_ref, x_ref, o_ref):
    """Per-ring dynamic circular roll (the FARGO integer shift)."""
    tile = x_ref.shape[1]
    i = pl.program_id(0)
    # unrolled (static trip count): x64 fori_loop induction vars are i64
    # and Mosaic's i64->i32 convert recurses — see _fargo_theta_kernel
    for r in range(tile):
        s = shift_ref[i * tile + r]
        o_ref[:, r, :] = pltpu.roll(x_ref[:, r, :], s, axis=1)


@functools.partial(jax.jit, static_argnames=("tile",))
def advect_shift_pallas(qs, nshift, tile: int = 16):
    """FARGO integer-cell azimuthal roll with per-ring dynamic shifts
    (reference src/TransportEuler.cpp:238-268 ``AdvectSHIFT``) as one fused
    read+write pass; Mosaic's dynamic lane rotate replaces the gather the
    reference's index arithmetic would imply."""
    k_quant, nr, naz = qs.shape
    shifts = jnp.mod(nshift, naz).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nr // tile,),
        in_specs=[
            pl.BlockSpec((nr,), lambda i: (_Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((k_quant, tile, naz), lambda i: (_Z, i, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_quant, tile, naz), lambda i: (_Z, i, _Z),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _shift_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(qs.shape, qs.dtype))(shifts, qs)


def _lanes(x, xl, xr, k: int):
    """x shifted by k lanes with periodic wraparound, using the left/right
    neighbor blocks (the column-tile halo trick: instead of materializing
    lane-rolled copies in HBM, each tile also reads its azimuthal
    neighbors' blocks)."""
    if k == 0:
        return x
    if k > 0:
        return jnp.concatenate([x[:, k:], xr[:, :k]], axis=1)
    return jnp.concatenate([xl[:, k:], x[:, :k]], axis=1)


def _artvisc_sn_kernel(dt_ref, sig_ref, sigl_ref, vazl_ref, vaz_ref,
                       vazr_ref, vr_ref, e_ref, cols_ref,
                       vro_ref, vazo_ref, eo_ref,
                       *, c2: float, dissipation: bool, invdphi: float):
    """Fused Stone-Norman artificial viscosity substep (reference
    src/viscosity/artificial_viscosity.cpp:148-250): q_r / q_phi pressures,
    energy dissipation and both velocity kicks in one pass. Column tiling
    keeps the radial stencils free; the azimuthal neighbors come from the
    adjacent lane tiles via periodic index maps, so no lane-halo copies
    ever exist in HBM.

    cols: 0 inv_diff_rsup, 1 inv_rb, 2 inv_diff_rmed[:NR] (rows = faces).
    """
    dt = dt_ref[0]
    nr = sig_ref.shape[0]
    sig = sig_ref[:]
    sig_l = sigl_ref[:]
    vaz = vaz_ref[:]
    vr = vr_ref[:]
    e = e_ref[:]
    col = lambda i: cols_ref[:, i:i + 1]

    dv_r = vr[1:] - vr[:-1]                               # (NR, C)
    vaz_p1 = _lanes(vaz, vazl_ref[:], vazr_ref[:], 1)
    vaz_m1 = _lanes(vaz, vazl_ref[:], vazr_ref[:], -1)
    dv_phi = vaz_p1 - vaz
    q_r = jnp.where(dv_r < 0.0, c2 * sig * dv_r * dv_r, 0.0)
    q_phi = jnp.where(dv_phi < 0.0, c2 * sig * dv_phi * dv_phi, 0.0)

    invdxtheta = col(1) * invdphi
    if dissipation:
        e_new = e - dt * q_r * dv_r * col(0) \
            - dt * q_phi * dv_phi * invdxtheta
        eo_ref[...] = jnp.concatenate(
            [e[:1], e_new[1:nr - 1], e[nr - 1:]], axis=0)
    else:
        eo_ref[...] = e

    # v_rad rows 2..NR-2 (faces 1..NR-1 computed, interior applied)
    dvr_mid = -dt * 2.0 / (sig[1:] + sig[:-1]) * (q_r[1:] - q_r[:-1]) \
        * col(2)[1:]
    z1 = jnp.zeros_like(dvr_mid[:1])
    add = jnp.concatenate([z1, z1, dvr_mid[1:nr - 2], z1, z1], axis=0)
    vro_ref[...] = vr + add

    # v_az rows 1..NR-2 (previous-lane q_phi recomputed from the halo)
    sig_m1 = _lanes(sig, sig_l, sig_l, -1)
    dv_phi_m1 = vaz - vaz_m1
    q_phi_m1 = jnp.where(dv_phi_m1 < 0.0,
                         c2 * sig_m1 * dv_phi_m1 * dv_phi_m1, 0.0)
    dvaz = -dt * 2.0 / (sig + sig_m1) * (q_phi - q_phi_m1) * invdxtheta
    va = vaz + dvaz
    vazo_ref[...] = jnp.concatenate(
        [vaz[:1], va[1:nr - 1], vaz[nr - 1:]], axis=0)


@functools.partial(jax.jit, static_argnames=("c2", "dissipation", "invdphi",
                                              "col_tile"))
def artvisc_sn_pallas(sigma, vrad, vaz, energy, cols, dt, c2: float,
                      dissipation: bool, invdphi: float,
                      col_tile: int = 128):
    """Fused SN artificial viscosity. Returns (vrad, vaz, energy)."""
    nr, naz = sigma.shape
    n_tiles = naz // col_tile
    kernel = functools.partial(_artvisc_sn_kernel, c2=c2,
                               dissipation=dissipation, invdphi=invdphi)
    cell = lambda j: (_Z, j)
    left = lambda j: (_Z, (j - 1) % n_tiles)
    right = lambda j: (_Z, (j + 1) % n_tiles)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1,), lambda j: (_Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), left, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), left, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), right, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, 8), lambda j: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nr + 1, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(vrad.shape, vrad.dtype),
            jax.ShapeDtypeStruct(vaz.shape, vaz.dtype),
            jax.ShapeDtypeStruct(energy.shape, energy.dtype),
        ),
    )(jnp.reshape(jnp.asarray(dt, sigma.dtype), (1,)), sigma, sigma, vaz,
      vaz, vaz, vrad, energy, cols)
    return out


def make_artvisc_cols(g, dtype):
    cols = jnp.zeros((g.nrad, 8), dtype)
    for i, v in enumerate([g.inv_diff_rsup, g.inv_rb,
                           g.inv_diff_rmed[:g.nrad]]):
        cols = cols.at[:, i].set(jnp.asarray(v, dtype)[:, 0])
    return cols


def _cfl_kernel(sig_ref, e_ref, vr_ref, vaz_ref, vazn_ref, qp_ref, qm_ref,
                vmean_ref, cols_ref, out_ref, *, adiabatic: bool,
                gamma: float, alpha: float, const_nu: float, c2: float,
                lf: float, inv_hc_limit: float, cfl: float, sn: bool,
                fast: bool, dphi: float, invdphi: float):
    """Fused CFL evaluation for one azimuth tile (reference
    src/cfl.cpp:185-382): sound speed, viscosity and all six inverse-dt
    terms derived in-kernel from the primitive fields; emits the tile
    minimum of the per-cell dt (active rows 1..NR-2).

    cols layout: 0 inv_cell_size, 1 inv_dxrad, 2 inv_dxaz, 3 hfac (H/cs),
    4 cs_iso, 5 inv_diff_rsup, 6 inv_rb.
    """
    nr = sig_ref.shape[0]
    sig = sig_ref[:]
    e = e_ref[:]
    vr = vr_ref[:]
    vaz = vaz_ref[:]
    col = lambda i: cols_ref[:, i:i + 1]
    inv_cell = col(0)
    inv_dxrad = col(1)
    inv_dxaz = col(2)

    # min over cells of CFL/sqrt(inv_sq) == CFL/sqrt(max inv_sq), so only
    # SQUARED inverse-dt terms are needed: cs never needs a sqrt
    # (invdt1^2 = cs^2 inv_cell^2) and the per-cell divide/sqrt disappears
    if adiabatic:
        cs2 = gamma * (gamma - 1.0) * e * (1.0 / sig)
    else:
        cs2 = jnp.broadcast_to(col(4) * col(4), sig.shape)
    if alpha > 0.0:
        nu = alpha * cs2 * col(3)              # alpha cs H, H = cs*hfac
    else:
        nu = jnp.full_like(sig, const_nu)

    vres = vaz - vmean_ref[:] if fast else vaz
    invdt1_sq = cs2 * (inv_cell * inv_cell)
    invdt2 = vr[:-1] * inv_dxrad
    invdt3 = vres * inv_dxaz

    dv_r = vr[1:] - vr[:-1]
    dv_phi = vazn_ref[:] - vaz
    if sn:
        invdt4 = 4.0 * c2 * jnp.maximum(
            jnp.maximum(-dv_r, 0.0) * inv_dxrad,
            jnp.maximum(-dv_phi, 0.0) * inv_dxaz) * lf
    else:
        eps_rr = dv_r * col(5)
        eps_pp = col(6) * (dv_phi * invdphi + 0.5 * (vr[1:] + vr[:-1]))
        invdt4 = 4.0 * c2 * (-jnp.minimum(eps_rr + eps_pp, 0.0)) * lf

    invdt5 = 4.0 * nu * (inv_cell * inv_cell) * lf
    if adiabatic:
        invdt6 = inv_hc_limit * jnp.abs((qp_ref[:] - qm_ref[:])
                                        * (1.0 / e)) * lf
    else:
        invdt6 = jnp.zeros_like(invdt1_sq)

    inv_sq = invdt1_sq + invdt2 ** 2 + invdt3 ** 2 + invdt4 ** 2 \
        + invdt5 ** 2 + invdt6 ** 2
    # per-lane MAX over the active rings; XLA takes the global max and one
    # final rsqrt
    out_ref[...] = jnp.max(inv_sq[1:nr - 1], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=(
    "adiabatic", "gamma", "alpha", "const_nu", "c2", "lf", "inv_hc_limit",
    "cfl", "sn", "fast", "dphi", "invdphi", "col_tile"))
def cfl_pallas(sigma, energy, vrad, vaz, qplus, qminus, vmean, cols,
               adiabatic: bool, gamma: float, alpha: float, const_nu: float,
               c2: float, lf: float, inv_hc_limit: float, cfl: float,
               sn: bool, fast: bool, dphi: float, invdphi: float,
               col_tile: int = 128):
    """Fused per-cell CFL dt; returns the global min over active rings."""
    nr, naz = sigma.shape
    n_tiles = naz // col_tile
    kernel = functools.partial(
        _cfl_kernel, adiabatic=adiabatic, gamma=gamma, alpha=alpha,
        const_nu=const_nu, c2=c2, lf=lf, inv_hc_limit=inv_hc_limit,
        cfl=cfl, sn=sn, fast=fast, dphi=dphi, invdphi=invdphi)
    cell = lambda j: (_Z, j)
    mins = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr + 1, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, col_tile), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, 1), lambda j: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, 8), lambda j: (_Z, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, col_tile), lambda j: (_Z, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, naz), sigma.dtype),
    )(sigma, energy, vrad, vaz, jnp.roll(vaz, -1, axis=-1), qplus, qminus,
      vmean, cols)
    return cfl / jnp.sqrt(jnp.max(mins))


def make_cfl_cols(g, cs_iso, hfac, dtype):
    """Packed geometry columns for the fused CFL kernel."""
    dxrad = g.rsup - g.rinf
    dxaz = g.rb * g.dphi
    cell = jnp.minimum(dxrad, dxaz)
    cols = jnp.zeros((g.nrad, 8), dtype)
    for i, v in enumerate([1.0 / cell, 1.0 / dxrad, 1.0 / dxaz, hfac,
                           jnp.broadcast_to(cs_iso, (g.nrad, 1)),
                           g.inv_diff_rsup, g.inv_rb]):
        cols = cols.at[:, i].set(jnp.asarray(v, dtype)[:, 0])
    return cols


# ---------------------------------------------------------------------------
# Fused FARGO transport: ONE row-tiled kernel for the complete transport
# substep — momenta construction, radial van Leer sweep, both azimuthal
# sweeps (residual + uniform), the per-ring integer-cell roll, and the
# velocity reconstruction (reference src/TransportEuler.cpp:112-685).
#
# The (K, NR, NAZ) advected-quantity batch exists only in VMEM scratch:
# the staged pipeline (radial kernel -> HBM batch -> theta kernel -> HBM
# batch -> XLA reconstruction) becomes one read of sigma/vrad/vaz/energy
# (+ a 3-row radial halo per tile) and one write of the four updated
# fields plus the monitoring mass flux. Azimuthal neighbors are
# in-register lane rolls; radial neighbors are sublane shifts of the
# extended tile; the FARGO integer shift is a per-ring dynamic lane roll
# with the shift vector in SMEM.
# ---------------------------------------------------------------------------

_TR_COLS = dict(rb=0, inv_rb=1, ra=2, invdrm=3, cm=4, cp=5, inv_surf=6,
                coef=7, inv_dxtheta=8)
_N_TR_COLS = 16
_TR_HALO = 3


def make_transport_prep(g, dtype, tile: int):
    """Windowed static geometry columns (n_tiles, tile+6, C); window row p
    of tile i holds global ring/face index i*tile - 3 + p (clipped)."""
    nr = g.nrad
    n_tiles = nr // tile
    rme = g.rmed_ext
    zc = jnp.zeros((1, 1), rme.dtype)
    cm = jnp.concatenate([zc, rme[1:] - rme[:-1]], axis=0)   # (NR+1,1)
    cp = jnp.concatenate([rme[1:] - rme[:-1], zc], axis=0)
    cols = jnp.zeros((nr + 1, _N_TR_COLS), dtype)
    named = {
        "rb": g.rb, "inv_rb": g.inv_rb, "ra": g.ra,
        "invdrm": g.inv_diff_rmed, "cm": cm, "cp": cp,
        "inv_surf": g.inv_surf, "coef": g.rsup - g.rinf,
        "inv_dxtheta": g.inv_rb * (1.0 / g.dphi),
    }
    for name, arr in named.items():
        a = jnp.asarray(arr, dtype)[:, 0]
        cols = cols.at[:a.shape[0], _TR_COLS[name]].set(a)
    idx = jnp.clip(jnp.arange(-_TR_HALO, tile + _TR_HALO)[None, :]
                   + (jnp.arange(n_tiles) * tile)[:, None], 0, nr)
    return cols[idx]


def _transport_kernel(scal_ref, shift_ref, shiftcol_ref, cols_ref, vm_ref,
                      vc_ref,
                      sig_ref, sig_t, sig_b, vr_ref, vr_t, vr_b,
                      va_ref, va_t, va_b, e_ref, e_t, e_b,
                      sig_out, e_out, vr_out, va_out, flux_out,
                      batch_ref, *,
                      nr: int, tile: int, adiabatic: bool, limiter: int,
                      fast: bool, dphi: float, static_shift: bool):
    """One radial tile (rows [i*tile, i*tile+tile), 3-row halos) of the
    fused transport. vm/vc are the per-ring azimuthal-mean and residual
    uniform velocities (windowed columns computed by the wrapper);
    shift_ref holds the per-ring integer shifts in SMEM and shiftcol_ref
    the same shifts as a windowed VMEM column (static_shift path)."""
    dt = scal_ref[0]
    omega = scal_ref[1]
    H = _TR_HALO
    P = tile + 2 * H

    ext = lambda m, t, b: jnp.concatenate([t[0], m[:], b[0]], axis=0)
    sig = ext(sig_ref, sig_t, sig_b)
    vr = ext(vr_ref, vr_t, vr_b)                   # face rows
    va = ext(va_ref, va_t, va_b)
    en = ext(e_ref, e_t, e_b)
    cols = cols_ref[0]
    col = lambda name: cols[:, _TR_COLS[name]:_TR_COLS[name] + 1]
    vmean = vm_ref[0]                              # (P, 1)
    vconst = vc_ref[0]

    i = pl.program_id(0)
    gidx = i * tile - H + jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)

    up = lambda x: jnp.concatenate([x[1:], x[-1:]], axis=0)
    dn = lambda x: jnp.concatenate([x[:1], x[:-1]], axis=0)
    lim = _mc if limiter == 1 else _van_leer

    # ---- radial van Leer sweep with in-register momenta ---------------
    # (reference src/TransportEuler.cpp:138-167 + :349-406 + :471-493)
    invdrm = col("invdrm")
    m_dq = (gidx >= 1) & (gidx <= nr - 2)
    m_star = (gidx >= 1) & (gidx <= nr - 1)

    def star_radial(work):
        dqm = (work - dn(work)) * invdrm
        dqp = (up(work) - work) * up(invdrm)
        dq = jnp.where(m_dq, lim(dqp, dqm), 0.0)
        upv = dn(work) + (col("cm") - vr * dt) * 0.5 * dn(dq)
        dnv = work - (col("cp") + vr * dt) * 0.5 * dq
        return jnp.where(m_star, jnp.where(vr > 0.0, upv, dnv), 0.0)

    dens_star = star_radial(sig)
    base = (dt * dphi) * col("ra") * dens_star * vr      # sigma flux, faces
    rb = col("rb")
    corot = rb * omega
    works = [up(vr), vr, (_roll(va, -1) + corot) * rb, (va + corot) * rb]
    if adiabatic:
        works.append(en / sig)
    works.append(jnp.ones_like(sig))
    k_quant = len(works)

    inv_surf = col("inv_surf")
    swept = []
    for k, work in enumerate(works):
        if k == k_quant - 1:
            fl = base
        else:
            fl = star_radial(work) * base
        q = work * sig
        swept.append(q + (fl - up(fl)) * inv_surf)

    # ---- azimuthal sweeps (residual + uniform) ------------------------
    # (reference src/TransportEuler.cpp:171-235 + :416-466 + :630-664)
    dxtheta = dphi * rb
    inv_dxtheta = col("inv_dxtheta")
    coef = col("coef") * dt

    def star_theta(q, ksi):
        qm = _roll(q, 1)
        dq = 0.5 * lim(_roll(q, -1) - q, q - qm) * inv_dxtheta
        upv = qm + (dxtheta - ksi) * _roll(dq, 1)
        dnv = q - (dxtheta + ksi) * dq
        return jnp.where(ksi > 0.0, upv, dnv)

    def sweep(fields, v):
        ksi = v * dt
        s = fields[k_quant - 1]
        ds = star_theta(s, ksi)
        inv_s = 1.0 / s
        b = ds * v * coef
        outs = []
        for k in range(k_quant):
            f = b if k == k_quant - 1 else star_theta(fields[k] * inv_s,
                                                      ksi) * b
            outs.append(fields[k] + (f - _roll(f, -1)) * inv_surf)
        return outs

    vres = va - vmean
    if fast:
        swept = sweep(swept, vres)
        swept = sweep(swept, jnp.broadcast_to(vconst, vres.shape))
    else:
        swept = sweep(swept, vres + vconst)

    # ---- per-ring integer-cell roll (AdvectSHIFT, :238-268) -----------
    if static_shift:
        # Row-vectorized bitwise static-roll+select decomposition: roll
        # the whole (P, NAZ) plane by every power of two and select per
        # row on the shift's bits. Used for float64, where Mosaic's
        # emulated-f64 lowering of the DYNAMIC lane rotate recurses
        # infinitely — static rotations lower fine. (In f32 the per-row
        # dynamic roll measured faster: 1427 vs 1344 Mcell/s.)
        naz = swept[0].shape[-1]
        nbits = max(1, int(naz - 1).bit_length())
        sft_col = shiftcol_ref[0]                      # (P, 1) int32
        for k in range(k_quant):
            x = swept[k]
            for b in range(nbits):
                bit = (sft_col >> np.int32(b)) & np.int32(1)
                x = jnp.where(bit == np.int32(1),
                              _roll(x, np.int32(1 << b)), x)
            batch_ref[k] = x
    else:
        # Mosaic's dynamic lane rotate, row by row on the VMEM-resident
        # batch (measured FASTER than the static decomposition above in
        # f32: 1427 vs 1344 Mcell/s full-step at 1024x3072)
        for k in range(k_quant):
            batch_ref[k] = swept[k]

        # rows needed post-shift: output rows + one halo ring above for
        # the vrad reconstruction (face f uses ring f-1). Unrolled Python
        # loop (static trip count): under x64 a lax.fori_loop induction
        # variable is i64 regardless of the bounds' dtype, and the
        # ring-index clamp uses strong-i32 np scalars because Python-int
        # bounds become weak-i64 literals whose i64->i32 convert recurses
        # in Mosaic's lowering.
        for p in range(H - 1, tile + H):
            gid = jnp.minimum(jnp.maximum(i * tile - H + p, np.int32(0)),
                              np.int32(nr - 1))
            sft = shift_ref[gid]
            batch_ref[:, p, :] = pltpu.roll(batch_ref[:, p, :], sft,
                                            axis=1)

    rp = batch_ref[0]
    rm = batch_ref[1]
    ap = batch_ref[2]
    am = batch_ref[3]
    e_new = batch_ref[4] if adiabatic else en
    s_new = batch_ref[k_quant - 1]

    # ---- velocity reconstruction (:498-535) ---------------------------
    vr_mid = (dn(rp) + rm) / (dn(s_new) + s_new)         # face f
    vr_new = jnp.where((gidx >= 1) & (gidx <= nr - 1), vr_mid, 0.0)
    va_new = (_roll(ap, 1) + am) / (_roll(s_new, 1) + s_new) \
        * col("inv_rb") - rb * omega

    w = slice(H, tile + H)
    sig_out[...] = s_new[w]
    e_out[...] = e_new[w]
    vr_out[...] = vr_new[w]
    va_out[...] = va_new[w]
    flux_out[...] = base[w]


@functools.partial(jax.jit, static_argnames=(
    "tile", "adiabatic", "limiter", "fast", "dphi", "static_shift"))
def transport_fused_pallas(sigma, vrad, vaz, energy, win_cols, nshift,
                           vmean, vconst, dt, omega_frame, tile: int,
                           adiabatic: bool, limiter: int, fast: bool,
                           dphi: float, static_shift: bool = False):
    """Complete fused FARGO transport. Returns
    (sigma, vrad, vaz, energy, mass_flux) — vrad and mass_flux carry the
    (NR+1)-th face row appended by the caller-visible contract (row NR of
    vrad keeps its previous value; flux row NR is zero)."""
    nr, naz = sigma.shape
    H = _TR_HALO
    n_tiles = nr // tile
    k_quant = 6 if adiabatic else 5
    base_rows = jnp.arange(n_tiles) * tile

    def halos(arr):
        nrows = arr.shape[0]
        top = arr[jnp.clip(base_rows[:, None] + jnp.arange(-H, 0)[None, :],
                           0, nrows - 1)]
        bot = arr[jnp.clip(base_rows[:, None]
                           + jnp.arange(tile, tile + H)[None, :],
                           0, nrows - 1)]
        return top, bot

    def wincol(colarr):                            # (NR,1) -> windows
        idx = jnp.clip(base_rows[:, None]
                       + jnp.arange(-H, tile + H)[None, :], 0,
                       colarr.shape[0] - 1)
        return colarr[idx]                         # (n_tiles, P, 1)

    sig_t, sig_b = halos(sigma)
    vr_t, vr_b = halos(vrad)
    va_t, va_b = halos(vaz)
    e_t, e_b = halos(energy)
    scal = jnp.stack([jnp.asarray(dt, sigma.dtype),
                      jnp.asarray(omega_frame, sigma.dtype)])
    shifts = jnp.mod(nshift, naz).astype(jnp.int32)
    # windowed (n_tiles, P, 1) copy of the shifts for the static_shift
    # path (same ring-index clamping as the dynamic path's gid clamp)
    shift_win = jnp.clip(base_rows[:, None]
                         + jnp.arange(-H, tile + H)[None, :], 0, nr - 1)
    shift_col = shifts[shift_win][:, :, None]

    kernel = functools.partial(
        _transport_kernel, nr=nr, tile=tile, adiabatic=adiabatic,
        limiter=limiter, fast=fast, dphi=dphi, static_shift=static_shift)
    main = lambda i: (i, _Z)
    halo = lambda i: (i, _Z, _Z)
    P = tile + 2 * H
    mspec = pl.BlockSpec((tile, naz), main, memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, H, naz), halo, memory_space=pltpu.VMEM)
    cspec = lambda c: pl.BlockSpec((1, P, c), halo, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2,), lambda i: (_Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((nr,), lambda i: (_Z,), memory_space=pltpu.SMEM),
            cspec(1),                              # windowed shift column
            cspec(_N_TR_COLS),
            cspec(1), cspec(1),
            mspec, hspec, hspec,                   # sigma
            mspec, hspec, hspec,                   # vrad[:nr]
            mspec, hspec, hspec,                   # vaz
            mspec, hspec, hspec,                   # energy
        ],
        out_specs=(mspec, mspec, mspec, mspec, mspec),
        out_shape=tuple(jax.ShapeDtypeStruct((nr, naz), sigma.dtype)
                        for _ in range(5)),
        scratch_shapes=[pltpu.VMEM((k_quant, P, naz), sigma.dtype)],
        # large tiles at NAZ=3072 exceed the default 16 MB scoped-VMEM
        # ceiling with double-buffered blocks; raise it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scal, shifts, shift_col, win_cols, wincol(vmean),
      wincol(vconst),
      sigma, sig_t, sig_b, vrad[:nr], vr_t, vr_b,
      vaz, va_t, va_b, energy, e_t, e_b)
    sig_new, e_new, vr_new, va_new, flux = outs
    vrad_out = jnp.concatenate([vr_new, vrad[nr:]], axis=0)
    zrow = jnp.zeros((1, naz), sigma.dtype)
    mass_flux = jnp.concatenate([flux, zrow], axis=0)
    return sig_new, vrad_out, va_new, e_new, mass_flux


# ---------------------------------------------------------------------------
# Fused viscous kick: compression heating + SN artificial viscosity +
# Navier-Stokes viscosity (stress tensor + velocity update) + SubStep3
# (viscous heating, simple beta cooling, radiative correction factor) in
# ONE radially-tiled kernel.
#
# The XLA chain for these substeps is dominated by fusion breaks at the
# stencil shifts (each azimuthal roll is a concat-of-slices that ends a
# fusion cluster), costing ~15 HBM passes over the fields per step. This
# kernel reads sigma/vrad/vaz/energy once (plus a 4-row radial halo per
# tile, built as thin gather arrays — ~12% extra at tile=32) and writes
# vrad/vaz/energy/Q+/Q- once. Azimuthal neighbors are in-register lane
# rolls; radial neighbors are sublane shifts of the extended tile.
#
# Re-derives, in order (all masked to the reference's row ranges):
#   compression heating   src/SourceEuler.cpp:459-493 (optional — only
#                         when the fused sources kernel left it to us)
#   SN artificial visc.   src/viscosity/artificial_viscosity.cpp:148-250
#   temperature clamp     src/SourceEuler.cpp:136-202
#   nu = alpha cs H       src/viscosity/viscosity.cpp:31-137
#   stress tensor         src/viscosity/viscosity.cpp:139-254
#   velocity update       src/viscosity/viscosity.cpp:355-426
#   viscous heating Q+    src/SourceEuler.cpp:496-536
#   beta cooling Q-       src/SourceEuler.cpp:632-654 (plain local beta)
#   radiative alpha, near-floor equilibrium, energy update + clamp
#                         src/SourceEuler.cpp:1018-1051
#
# Known ghost-row deviation vs the jnp path (documented, test-pinned):
# Q+ at ring NR-1 uses tau_rp(row NR) = 0 instead of the jnp path's
# harmless radial wrap to row 0; both values are ghost-ring garbage and
# neither feeds the CFL (rows 1..NR-2) or the energy update (rows
# 1..NR-2).
# ---------------------------------------------------------------------------

_VK_COLS = dict(inv_diff_rsup=0, inv_rb=1, rb=2, invdrm=3, ra=4, inv_ra=5,
                inv_diff_rsup_rb=6, two_diff_ra_sq=7, omega_k=8, hfac=9,
                cs_iso=10, sum_rs_ri=11, l_sq=12)
_N_VK_COLS = 16


def make_viscous_prep(phys, constants, g, dtype, tile: int):
    """Windowed geometry-column tensor (n_tiles, tile+4, C): row p of the
    window for tile i holds the columns of global ring/face index
    i*tile - 2 + p (clipped; out-of-range rows are masked in-kernel)."""
    nr = g.nrad
    n_tiles = nr // tile
    omega_k = jnp.sqrt(constants.G * phys.hydro_center_mass / g.rb ** 3)
    gam = phys.adiabatic_index
    hfac = 1.0 / (jnp.sqrt(gam) * omega_k) if phys.is_adiabatic \
        else 1.0 / omega_k
    cols = jnp.zeros((nr + 1, _N_VK_COLS), dtype)

    def put(name, arr):
        a = jnp.asarray(arr, dtype)[:, 0]
        cols_rows = a.shape[0]
        return cols.at[:cols_rows, _VK_COLS[name]].set(a)

    cols = put("inv_diff_rsup", g.inv_diff_rsup)
    cols = put("inv_rb", g.inv_rb)
    cols = put("rb", g.rb)
    cols = put("invdrm", g.inv_diff_rmed)
    cols = put("ra", g.ra)
    cols = put("inv_ra", g.inv_ra)
    cols = put("inv_diff_rsup_rb", g.inv_diff_rsup_rb)
    cols = put("two_diff_ra_sq", g.two_diff_ra_sq)
    cols = put("omega_k", omega_k)
    cols = put("hfac", hfac)
    if not phys.is_adiabatic:
        from . import eos as _eos
        cols = put("cs_iso", _eos.sound_speed_iso_profile(
            phys, constants, g.rb))
    from ..params import ARTVISC_TW as _TW
    if phys.artificial_viscosity == _TW:
        # TW length scale (reference artificial_viscosity.cpp:58-67)
        dr = g.ra[1:] - g.ra[:-1]
        rdphi = g.rb * g.dphi
        dx = jnp.minimum(dr, rdphi) if g.naz <= 16 \
            else jnp.maximum(dr, rdphi)
        cols = put("l_sq",
                   phys.artificial_viscosity_factor ** 2 * dx ** 2)
        cols = put("sum_rs_ri", g.rsup + g.rinf)
    idx = jnp.clip(jnp.arange(-2, tile + 2)[None, :]
                   + (jnp.arange(n_tiles) * tile)[:, None], 0, nr)
    return cols[idx]                               # (n_tiles, tile+4, C)


def _viscous_kick_kernel(scal_ref, cols_ref,
                         sig_ref, sig_t, sig_b, vr_ref, vr_t, vr_b,
                         va_ref, va_t, va_b, e_ref, e_t, e_b,
                         vr_out, va_out, e_out, qp_out, qm_out, *,
                         nr: int, tile: int, adiabatic: bool, gamma: float,
                         alpha: float,
                         const_nu: float, c2: float, artvisc: int,
                         dissipation: bool, compress: bool, heating: bool,
                         heat_factor: float, rvf: float, beta_on: bool,
                         tmin: float, tmax: float, rs: float,
                         rad_fac: float, mu_fac: float, sig_nf: float,
                         invdphi: float):
    """One radial tile (rows [i*tile, i*tile+tile), extended by a 2-row
    halo each side) of the fused viscous kick. Static scalars:
    rs = R/(mu (gamma-1)); rad_fac = 8 sigma_sb / c;
    mu_fac = (mu (gamma-1) / R)^4; sig_nf = 10 Sigma0 SigmaFloor."""
    dt = scal_ref[0]
    beta_inv = scal_ref[1]

    ext = lambda m, t, b: jnp.concatenate([t[0], m[:], b[0]], axis=0)
    sig = ext(sig_ref, sig_t, sig_b)               # cells g = R0-2..R0+T+1
    vr = ext(vr_ref, vr_t, vr_b)                   # faces, same indices
    va = ext(va_ref, va_t, va_b)
    en = ext(e_ref, e_t, e_b)
    cols = cols_ref[0]                             # (tile+4, C)
    col = lambda name: cols[:, _VK_COLS[name]:_VK_COLS[name] + 1]

    i = pl.program_id(0)
    gidx = i * tile - 2 + jax.lax.broadcasted_iota(
        jnp.int32, (tile + 4, 1), 0)
    m_int = (gidx >= 1) & (gidx <= nr - 2)         # interior rings
    m_face = (gidx >= 2) & (gidx <= nr - 2)        # interior vrad faces
    m_rp = (gidx >= 1) & (gidx <= nr - 1)          # tau_rp rows

    up = lambda x: jnp.concatenate([x[1:], x[-1:]], axis=0)   # row p+1
    dn = lambda x: jnp.concatenate([x[:1], x[:-1]], axis=0)   # row p-1

    inv_rb = col("inv_rb")
    invdxtheta = inv_rb * invdphi

    def div_of(vrx, vax):
        radial = (up(vrx) * up(col("ra")) - vrx * col("ra")) \
            * col("inv_diff_rsup_rb")
        return radial + (_roll(vax, -1) - vax) * invdxtheta

    # --- compression heating (post-sources velocities) -----------------
    if compress and adiabatic:
        e_c = en * jnp.exp(-(gamma - 1.0) * dt * div_of(vr, va))
        en = jnp.where((gidx >= 0) & (gidx <= nr - 2), e_c, en)

    # --- artificial viscosity (1 = SN, 2 = TW) -------------------------
    if artvisc == 1:
        dv_r = up(vr) - vr
        dv_phi = _roll(va, -1) - va
        q_r = jnp.where(dv_r < 0.0, c2 * sig * dv_r * dv_r, 0.0)
        q_phi = jnp.where(dv_phi < 0.0, c2 * sig * dv_phi * dv_phi, 0.0)
        if dissipation and adiabatic:
            e1 = en - dt * q_r * dv_r * col("inv_diff_rsup") \
                - dt * q_phi * dv_phi * invdxtheta
            en = jnp.where(m_int, e1, en)
        dvr_av = -dt * 2.0 / (sig + dn(sig)) * (q_r - dn(q_r)) \
            * col("invdrm")
        vr = vr + jnp.where(m_face, dvr_av, 0.0)
        dvaz_av = -dt * 2.0 / (sig + _roll(sig, 1)) \
            * (q_phi - _roll(q_phi, 1)) * invdxtheta
        va = va + jnp.where(m_int, dvaz_av, 0.0)
    elif artvisc == 2:
        # Tscharnuter & Winkler tensor variant, off-diagonals zeroed
        # (reference artificial_viscosity.cpp:35-140)
        eps_rr = (up(vr) - vr) * col("inv_diff_rsup")
        eps_pp = (_roll(va, -1) - va) * invdxtheta \
            + 0.5 * (up(vr) + vr) * inv_rb
        div_av = jnp.minimum(eps_rr + eps_pp, 0.0)
        l_sq = col("l_sq")
        q_rr = l_sq * sig * (-div_av) * (eps_rr - div_av / 3.0)
        q_pp = l_sq * sig * (-div_av) * (eps_pp - div_av / 3.0)
        if dissipation and adiabatic:
            qp_av = -l_sq * div_av * sig / 3.0 * (
                eps_rr * eps_rr + eps_pp * eps_pp
                + (eps_rr - eps_pp) * (eps_rr - eps_pp))
            en = jnp.where((gidx >= 2) & (gidx <= nr - 2),
                           en + qp_av * dt, en)
        sig_phi = 0.5 * (sig + _roll(sig, 1))
        dvaz_av = 2.0 * dt / (col("sum_rs_ri") * sig_phi) \
            * (q_pp - _roll(q_pp, 1)) * invdphi
        va = va + jnp.where(m_int, dvaz_av, 0.0)
        rb_av = col("rb")
        sig_r = 0.5 * (sig + dn(sig))
        dvr_av = rvf * dt / sig_r * 2.0 \
            / (rb_av * rb_av - dn(rb_av) * dn(rb_av)) * (
                (q_rr * rb_av - dn(q_rr) * dn(rb_av))
                - 0.5 * (q_pp + dn(q_pp)) * (rb_av - dn(rb_av)))
        vr = vr + jnp.where(m_face, dvr_av, 0.0)
    # static clamp factors, kept finite in the working dtype (the raw
    # tmax*rs product can exceed float32 max and would warn on cast)
    big = float(jnp.finfo(sig.dtype).max)
    emin_fac = min(tmin * rs, big)
    emax_fac = min(tmax * rs, big)
    if dissipation and adiabatic:
        # the step driver clamps after the artvisc stage whenever
        # dissipation is configured, even with artvisc "none"
        en = jnp.clip(en, emin_fac * sig, emax_fac * sig)

    # --- nu = alpha cs H (recalculate_viscosity) -----------------------
    hfac = col("hfac")
    if adiabatic:
        cs2 = gamma * (gamma - 1.0) * en / sig
        h = jnp.sqrt(cs2) * hfac                   # cs / sqrt(gamma) / Om_K
        nu_col = None
        if alpha > 0.0:
            nu = alpha * cs2 * hfac
        else:
            nu = jnp.full_like(sig, const_nu)
    else:
        # locally isothermal mode 0: cs/H/nu are static ring columns
        cs_iso = col("cs_iso")
        h = cs_iso * hfac
        nu_col = alpha * cs_iso * h if alpha > 0.0 \
            else jnp.full_like(cs_iso, const_nu)
        nu = jnp.broadcast_to(nu_col, sig.shape)

    # --- viscous stress tensor -----------------------------------------
    div_v = div_of(vr, va)
    drr = (up(vr) - vr) * col("inv_diff_rsup")
    tau_rr = 2.0 * nu * sig * (drr - div_v / 3.0)
    dpp = (_roll(va, -1) - va) * invdphi * inv_rb \
        + 0.5 * (up(vr) + vr) * inv_rb
    tau_pp = 2.0 * nu * sig * (dpp - div_v / 3.0)
    va_ir = va * inv_rb
    dvazirdr = (va_ir - dn(va_ir)) * col("invdrm")
    dvrdphi = (vr - _roll(vr, 1)) * invdphi
    drp = col("ra") * dvazirdr + dvrdphi * col("inv_ra")
    nu4 = 0.25 * (nu + dn(nu) + _roll(nu, 1) + _roll(dn(nu), 1))
    sig4 = 0.25 * (sig + dn(sig) + _roll(sig, 1) + _roll(dn(sig), 1))
    tau_rp = jnp.where(m_rp, nu4 * sig4 * drp, 0.0)

    # --- velocity update from the stress divergence --------------------
    sig_avg_phi = 0.5 * (sig + _roll(sig, 1))
    ra_cell = col("ra")                            # row p = Ra[face p]
    trp_rsq = ra_cell * ra_cell * tau_rp
    dvp = dt * inv_rb / sig_avg_phi * (
        col("two_diff_ra_sq") * (up(trp_rsq) - trp_rsq)
        + (tau_pp - _roll(tau_pp, 1)) * invdphi)
    va = va + jnp.where(m_int, dvp, 0.0)

    rb = col("rb")
    sig_avg_r = 0.5 * (sig + dn(sig))
    dvr = dt / sig_avg_r * rvf * 2.0 / (rb + dn(rb)) * (
        (rb * tau_rr - dn(rb) * dn(tau_rr)) * col("invdrm")
        + (_roll(tau_rp, -1) - tau_rp) * invdphi
        - 0.5 * (tau_pp + dn(tau_pp)))
    vr = vr + jnp.where(m_face, dvr, 0.0)

    # --- SubStep3: Q+/Q-, radiative alpha, energy update ---------------
    w = slice(2, tile + 2)
    if not adiabatic:
        # locally isothermal: no energy equation; Q grids stay zero
        vr_out[...] = vr[w]
        va_out[...] = va[w]
        e_out[...] = en[w]
        qp_out[...] = jnp.zeros_like(sig[w])
        qm_out[...] = jnp.zeros_like(sig[w])
        return

    trp_up = up(tau_rp)
    trp4 = 0.25 * (tau_rp + trp_up + _roll(tau_rp, -1) + _roll(trp_up, -1))
    nu_sig = nu * sig
    if heating:
        safe = jnp.where(nu_sig != 0.0, 2.0 * nu_sig, 1.0)
        qp = (tau_rr * tau_rr + 2.0 * trp4 * trp4 + tau_pp * tau_pp) / safe
        qp = qp + (2.0 / 9.0) * nu_sig * div_v * div_v
        qp = jnp.where(nu != 0.0, qp * heat_factor, 0.0)
    else:
        qp = jnp.zeros_like(sig)
    if beta_on:
        qm = en * col("omega_k") * beta_inv
    else:
        qm = jnp.zeros_like(sig)
    inv_sig = 1.0 / sig
    inv_pow4 = mu_fac * (inv_sig * inv_sig) * (inv_sig * inv_sig)
    alpha_rad = 1.0 + rad_fac * h * inv_pow4 * (en * en * en)
    qp = qp / alpha_rad
    qm = qm / alpha_rad
    e_new = en + dt * (qp - qm)
    near_floor = sig < sig_nf
    e_new = jnp.where(near_floor, 0.0, e_new)      # eq. energy w/ tau_eff=0
    qm = jnp.where(near_floor, qp, qm)
    en = jnp.where(m_int, e_new, en)
    en = jnp.clip(en, emin_fac * sig, emax_fac * sig)

    vr_out[...] = vr[w]
    va_out[...] = va[w]
    e_out[...] = en[w]
    qp_out[...] = qp[w]
    qm_out[...] = qm[w]


@functools.partial(jax.jit, static_argnames=(
    "tile", "adiabatic", "gamma", "alpha", "const_nu", "c2", "artvisc",
    "dissipation",
    "compress", "heating", "heat_factor", "rvf", "beta_on", "tmin", "tmax",
    "rs", "rad_fac", "mu_fac", "sig_nf", "invdphi"))
def viscous_kick_pallas(sigma, vrad, vaz, energy, win_cols, dt, beta_inv,
                        tile: int, adiabatic: bool, gamma: float,
                        alpha: float,
                        const_nu: float, c2: float, artvisc: int,
                        dissipation: bool, compress: bool, heating: bool,
                        heat_factor: float, rvf: float, beta_on: bool,
                        tmin: float, tmax: float, rs: float, rad_fac: float,
                        mu_fac: float, sig_nf: float, invdphi: float):
    """Fused viscous kick. Returns (vrad, vaz, energy, qplus, qminus) —
    the post-substep3 state of the gated configuration."""
    nr, naz = sigma.shape
    n_tiles = nr // tile
    base = jnp.arange(n_tiles) * tile

    def halos(arr):
        nrows = arr.shape[0]
        top = arr[jnp.clip(base[:, None] + jnp.arange(-2, 0)[None, :],
                           0, nrows - 1)]
        bot = arr[jnp.clip(base[:, None]
                           + jnp.arange(tile, tile + 2)[None, :],
                           0, nrows - 1)]
        return top, bot                            # (n_tiles, 2, naz)

    sig_t, sig_b = halos(sigma)
    vr_t, vr_b = halos(vrad)
    va_t, va_b = halos(vaz)
    e_t, e_b = halos(energy)
    vr_main = vrad[:nr]

    kernel = functools.partial(
        _viscous_kick_kernel, nr=nr, tile=tile, adiabatic=adiabatic,
        gamma=gamma, alpha=alpha,
        const_nu=const_nu, c2=c2, artvisc=artvisc, dissipation=dissipation,
        compress=compress, heating=heating, heat_factor=heat_factor,
        rvf=rvf, beta_on=beta_on, tmin=tmin, tmax=tmax, rs=rs,
        rad_fac=rad_fac, mu_fac=mu_fac, sig_nf=sig_nf, invdphi=invdphi)
    scal = jnp.stack([jnp.asarray(dt, sigma.dtype),
                      jnp.asarray(beta_inv, sigma.dtype)])
    main = lambda i: (i, _Z)
    halo = lambda i: (i, _Z, _Z)
    mspec = pl.BlockSpec((tile, naz), main, memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec((1, 2, naz), halo, memory_space=pltpu.VMEM)
    vr_new, va_new, e_new, qp, qm = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2,), lambda i: (_Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile + 4, _N_VK_COLS), halo,
                         memory_space=pltpu.VMEM),
            mspec, hspec, hspec,                   # sigma
            mspec, hspec, hspec,                   # vrad[:nr] + full halos
            mspec, hspec, hspec,                   # vaz
            mspec, hspec, hspec,                   # energy
        ],
        out_specs=(mspec, mspec, mspec, mspec, mspec),
        out_shape=tuple(jax.ShapeDtypeStruct((nr, naz), sigma.dtype)
                        for _ in range(5)),
    )(scal, win_cols, sigma, sig_t, sig_b, vr_main, vr_t, vr_b,
      vaz, va_t, va_b, energy, e_t, e_b)
    vrad_out = jnp.concatenate([vr_new, vrad[nr:]], axis=0)
    # ghost-row Q stays zero like the reference's cleared QPLUS/QMINUS
    # grids (matches the modular substep3)
    zrow = jnp.zeros((1, naz), qp.dtype)
    qp = jnp.concatenate([zrow, qp[1:nr - 1], zrow], axis=0)
    qm = jnp.concatenate([zrow, qm[1:nr - 1], zrow], axis=0)
    return vrad_out, va_new, e_new, qp, qm


def use_pallas(dtype=None) -> bool:
    """Fused kernels are the float32/bfloat16 production path; float64 runs
    (emulated on TPU) fall back to the pure-jnp implementation — Mosaic's
    f64 emulation recurses infinitely when lowering the dynamic lane rolls.
    FARGOCPT_TPU_F64_FUSED=1 opts float64 into the fused kernels with the
    static-roll+select FARGO shift (no dynamic rolls; experimental until
    validated on real hardware)."""
    if jax.default_backend() != "tpu":
        return False
    if os.environ.get("FARGOCPT_TPU_NO_PALLAS", "") == "1":
        # profiling/ablation knob: run the pure-jnp path on TPU (isolates
        # fused-kernel benefit from dtype-emulation cost in f32-vs-f64
        # roofline comparisons)
        return False
    if dtype is None:
        return True
    if jnp.dtype(dtype) == jnp.dtype(jnp.float64):
        return os.environ.get("FARGOCPT_TPU_F64_FUSED", "") == "1"
    return jnp.dtype(dtype) in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
