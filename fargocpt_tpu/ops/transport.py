"""FARGO transport: operator-split van Leer upwind advection with the
fast-orbital-advection azimuthal splitting (Masset 2000).

Re-derivation of reference src/TransportEuler.cpp:112-685. The azimuthal
mean rotation is removed per ring and applied as an exact integer-cell
roll (a gather along the unsharded azimuthal axis — free of CFL cost and
embarrassingly parallel on TPU); only the residual velocity is advected
with upwind sweeps.

All helpers are pure: they take and return full (NR, NAZ) arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import Physics
from .common import Geom, azim_next, azim_prev, flux_limiter


def star_radial(phys: Physics, g: Geom, q: jax.Array, vrad: jax.Array,
                dt) -> jax.Array:
    """Upwind face values of cell-centered q (reference
    src/TransportEuler.cpp:349-406 ``compute_star_radial``).

    Returns (NR+1, NAZ); rows 0 and NR are zero (no flux through the
    domain-edge faces, matching the reference's untouched buffer rows).
    """
    nr = g.nrad
    kind = phys.flux_limiter_type
    # limited slopes on cells 1..NR-2 (zero on ghost cells)
    dqm = (q[1:-1] - q[:-2]) * g.inv_diff_rmed[1:nr - 1]
    dqp = (q[2:] - q[1:-1]) * g.inv_diff_rmed[2:nr]
    dq_mid = flux_limiter(dqp, dqm, kind)
    zrow = jnp.zeros_like(q[:1])
    dq = jnp.concatenate([zrow, dq_mid, zrow], axis=0)       # (NR, NAZ)

    rme = g.rmed_ext                                          # (NR+1,1)
    dr_minus = rme[1:nr] - rme[:nr - 1]                       # face f: Rmed[f]-Rmed[f-1]
    dr_plus = rme[2:nr + 1] - rme[1:nr]                       # face f: Rmed[f+1]-Rmed[f]
    vf = vrad[1:nr]                                           # faces 1..NR-1
    up = q[:-1] + (dr_minus - vf * dt) * 0.5 * dq[:-1]
    dn = q[1:] - (dr_plus + vf * dt) * 0.5 * dq[1:]
    qs_mid = jnp.where(vf > 0.0, up, dn)
    return jnp.concatenate([jnp.zeros_like(qs_mid[:1]), qs_mid,
                            jnp.zeros_like(qs_mid[:1])], axis=0)


def star_theta(phys: Physics, g: Geom, q: jax.Array, v: jax.Array,
               dt) -> jax.Array:
    """Azimuthal upwind interface values (reference
    src/TransportEuler.cpp:416-466 ``ComputeStarTheta``). Interface j sits
    between cells j-1 and j."""
    kind = phys.flux_limiter_type
    dxtheta = g.dphi * g.rb
    dqm = q - azim_prev(q)
    dqp = azim_next(q) - q
    dq = 0.5 * flux_limiter(dqp, dqm, kind) / dxtheta
    ksi = v * dt
    up = azim_prev(q) + (dxtheta - ksi) * azim_prev(dq)
    dn = q - (dxtheta + ksi) * dq
    return jnp.where(ksi > 0.0, up, dn)


def van_leer_radial(phys: Physics, g: Geom, q, sig_int, density_star,
                    vrad, dt):
    """Advect q radially in specific form (reference
    src/TransportEuler.cpp:545-620). Returns (q_new, face_flux) where
    face_flux[i] is the q-flux through face i (for massflow diagnostics)."""
    work = q / sig_int
    qrstar = star_radial(phys, g, work, vrad, dt)
    flux = dt * g.dphi * g.ra * qrstar * density_star * vrad  # (NR+1, NAZ)
    q_new = q + (flux[:-1] - flux[1:]) * g.inv_surf
    return q_new, flux


def van_leer_theta(phys: Physics, g: Geom, q, sig_int, density_star, v, dt):
    """Advect q azimuthally in specific form (reference
    src/TransportEuler.cpp:630-664)."""
    work = q / sig_int
    qrstar = star_theta(phys, g, work, v, dt)
    f = (g.rsup - g.rinf) * dt * qrstar * density_star * v
    return q + (f - azim_next(f)) * g.inv_surf


def advect_shift(q: jax.Array, nshift: jax.Array) -> jax.Array:
    """Exact integer-cell azimuthal roll per ring — the FARGO trick
    (reference src/TransportEuler.cpp:238-268 ``AdvectSHIFT``)."""
    naz = q.shape[-1]
    j = jnp.arange(naz, dtype=nshift.dtype)[None, :]
    src = jnp.mod(j - nshift[:, None], naz)
    return jnp.take_along_axis(q, src, axis=-1)


def compute_momenta(g: Geom, sigma, vrad, vaz, omega_frame):
    """reference src/TransportEuler.cpp:471-493."""
    rp = sigma * vrad[1:]
    rm = sigma * vrad[:-1]
    corot = g.rb * omega_frame
    ap = sigma * (azim_next(vaz) + corot) * g.rb
    am = sigma * (vaz + corot) * g.rb
    return rp, rm, ap, am


def velocities_from_momenta(g: Geom, sigma, rp, rm, ap, am, vrad_old,
                            omega_frame):
    """reference src/TransportEuler.cpp:498-535. v_rad row 0 is zeroed,
    row NR keeps its previous value (the reference loop stops at NR-1)."""
    nr = g.nrad
    vr_mid = (rp[:-1] + rm[1:]) / (sigma[:-1] + sigma[1:])   # faces 1..NR-1
    vrad = jnp.concatenate(
        [jnp.zeros_like(vr_mid[:1]), vr_mid, vrad_old[nr:]], axis=0)
    vaz = (azim_prev(ap) + am) / (azim_prev(sigma) + sigma) * g.inv_rb \
        - g.rb * omega_frame
    return vrad, vaz


def transport(phys: Physics, g: Geom, sigma, vrad, vaz, energy,
              omega_frame, dt):
    """Full FARGO transport substep (reference src/TransportEuler.cpp:112-136
    ``Transport`` + OneWindRad + OneWindTheta).

    Returns (sigma, vrad, vaz, energy, diag) where diag carries the
    radial mass-flux field through faces for monitoring.
    """
    adiabatic = phys.is_adiabatic

    rp, rm, ap, am = compute_momenta(g, sigma, vrad, vaz, omega_frame)

    # ---- radial sweep (OneWindRad, reference :138-167) ----
    density_star = star_radial(phys, g, sigma, vrad, dt)
    sig_int = sigma
    rp, _ = van_leer_radial(phys, g, rp, sig_int, density_star, vrad, dt)
    rm, _ = van_leer_radial(phys, g, rm, sig_int, density_star, vrad, dt)
    ap, _ = van_leer_radial(phys, g, ap, sig_int, density_star, vrad, dt)
    am, _ = van_leer_radial(phys, g, am, sig_int, density_star, vrad, dt)
    if adiabatic:
        energy, _ = van_leer_radial(phys, g, energy, sig_int, density_star,
                                    vrad, dt)
    sigma, mass_flux = van_leer_radial(phys, g, sigma, sig_int, density_star,
                                       vrad, dt)  # density MUST be last

    # ---- azimuthal sweep (OneWindTheta, reference :270-288) ----
    vmean = jnp.mean(vaz, axis=-1, keepdims=True)            # (NR,1)
    vres = vaz - vmean
    invdt = 1.0 / dt
    ntilde = vmean * g.inv_rb * dt * g.invdphi               # (NR,1)
    nround = jnp.floor(ntilde + 0.5)
    nshift = nround.astype(jnp.int32)[:, 0]                  # (NR,)
    vconst_row = (ntilde - nround) * g.rb * invdt * g.dphi   # (NR,1)

    if not phys.fast_transport:
        # standard advection: fold the constant residual into vres and skip
        # the uniform pass (reference :225-231 NoSplitAdvection)
        vres = vres + vconst_row
        passes = [vres]
    else:
        vconst = jnp.broadcast_to(vconst_row, vres.shape)
        passes = [vres, vconst]

    for v in passes:
        density_star = star_theta(phys, g, sigma, v, dt)
        sig_int = sigma
        rp = van_leer_theta(phys, g, rp, sig_int, density_star, v, dt)
        rm = van_leer_theta(phys, g, rm, sig_int, density_star, v, dt)
        ap = van_leer_theta(phys, g, ap, sig_int, density_star, v, dt)
        am = van_leer_theta(phys, g, am, sig_int, density_star, v, dt)
        if adiabatic:
            energy = van_leer_theta(phys, g, energy, sig_int, density_star,
                                    v, dt)
        sigma = van_leer_theta(phys, g, sigma, sig_int, density_star, v, dt)

    # integer shift (the FARGO roll)
    rp = advect_shift(rp, nshift)
    rm = advect_shift(rm, nshift)
    ap = advect_shift(ap, nshift)
    am = advect_shift(am, nshift)
    if adiabatic:
        energy = advect_shift(energy, nshift)
    sigma = advect_shift(sigma, nshift)

    vrad, vaz = velocities_from_momenta(g, sigma, rp, rm, ap, am, vrad,
                                        omega_frame)
    return sigma, vrad, vaz, energy, mass_flux
