"""Navier-Stokes viscosity: kinematic viscosity (alpha or constant), the
viscous stress tensor in 2-D cylindrical coordinates, and the velocity
update from the stress divergence.

Re-derivation of reference src/viscosity/viscosity.cpp (stress:
:139-254, velocity update in conservative form after D'Angelo et al. 2002:
:355-426).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import Physics
from .common import Geom, azim_next, azim_prev, set_rows
from .sources import divergence_v


def alpha_grid(phys: Physics, g: Geom, units=None, temperature=None,
               sigma=None, scale_height=None, bodies=None,
               n_bodies: int = 0, cell_x=None, cell_y=None):
    """Per-cell alpha parameter (reference
    src/viscosity/viscosity.cpp:31-93 ``get_alpha``):
    mode 0 const; 1 temperature S-curve (tanh blend in log T); 2
    star-distance ramp; 3 hydrogen-ionization-fraction blend."""
    if phys.alpha_mode == 1 and temperature is not None and units is not None:
        t_cgs = temperature * units.temperature
        a_cold = phys.alpha_cold * (g.rb / 0.4) ** 0.3
        a_hot = phys.alpha_hot
        return 10.0 ** (
            0.5 * (jnp.log10(a_hot) - jnp.log10(a_cold))
            * (1.0 - jnp.tanh((4.0 - jnp.log10(t_cgs)) / 0.4))
            + jnp.log10(a_cold))
    if phys.alpha_mode == 2 and bodies is not None:
        alpha = jnp.full_like(cell_x, phys.alpha_hot)
        dist_start, dist_end = 0.35, 0.55
        for k in range(n_bodies):
            d = jnp.sqrt((cell_x - bodies.x[k]) ** 2
                         + (cell_y - bodies.y[k]) ** 2)
            scale = jnp.clip((d - dist_start) / (dist_end - dist_start),
                             0.0, 1.0)
            alpha = jnp.minimum(
                alpha, phys.alpha_cold
                + (phys.alpha_hot - phys.alpha_cold) * scale)
        return alpha
    if phys.alpha_mode == 3 and temperature is not None \
            and units is not None:
        from .pvte import ionization_fraction
        rho_cgs = sigma / (phys.density_factor * scale_height) \
            * units.density
        t_cgs = temperature * units.temperature
        x_ion = ionization_fraction(rho_cgs, t_cgs,
                                    phys.hydrogen_mass_fraction)
        return phys.alpha_cold + (phys.alpha_hot - phys.alpha_cold) \
            * jnp.minimum(1000.0 * x_ion, 1.0)
    return phys.viscous_alpha


def kinematic_viscosity(phys: Physics, g: Geom, cs, scale_height,
                        temperature=None, units=None, sigma=None,
                        bodies=None, n_bodies: int = 0, cell_x=None,
                        cell_y=None):
    """nu grid (reference src/viscosity/viscosity.cpp:31-137):
    nu = alpha(cell) * cs_adiabatic * H, or the constant viscosity."""
    if phys.viscous_alpha > 0.0:
        alpha = phys.viscous_alpha
        if phys.alpha_mode != 0:
            alpha = alpha_grid(phys, g, units, temperature, sigma,
                               scale_height, bodies, n_bodies, cell_x,
                               cell_y)
        return alpha * cs * scale_height
    return jnp.full_like(cs, phys.constant_viscosity)


def viscous_stress_tensor(phys: Physics, g: Geom, sigma, vrad, vaz, nu):
    """tau_rr, tau_pp (cell centered), tau_rp (corner, rows 1..NR-1),
    div_v (reference src/viscosity/viscosity.cpp:139-254)."""
    nr = g.nrad
    div_v = divergence_v(g, vrad, vaz)

    drr = (vrad[1:] - vrad[:-1]) * g.inv_diff_rsup
    tau_rr = 2.0 * nu * sigma * (drr - div_v / 3.0)

    dpp = (azim_next(vaz) - vaz) * g.invdphi * g.inv_rb \
        + 0.5 * (vrad[1:] + vrad[:-1]) * g.inv_rb
    tau_pp = 2.0 * nu * sigma * (dpp - div_v / 3.0)

    # corner-centered tau_rp on faces 1..NR-1; row 0 stays zero
    inv_rb = g.inv_rb
    dvazirdr = (vaz[1:] * inv_rb[1:] - vaz[:-1] * inv_rb[:-1]) \
        * g.inv_diff_rmed[1:nr]
    dvrdphi = (vrad[1:nr] - azim_prev(vrad[1:nr])) * g.invdphi
    drp = g.ra[1:nr] * dvazirdr + dvrdphi * g.inv_ra[1:nr]
    nu4 = 0.25 * (nu[1:] + nu[:-1] + azim_prev(nu[1:]) + azim_prev(nu[:-1]))
    sig4 = 0.25 * (sigma[1:] + sigma[:-1]
                   + azim_prev(sigma[1:]) + azim_prev(sigma[:-1]))
    tau_rp = jnp.concatenate(
        [jnp.zeros_like(drp[:1]), nu4 * sig4 * drp], axis=0)  # (NR, NAZ)
    return tau_rr, tau_pp, tau_rp, div_v


def update_velocities_with_viscosity(phys: Physics, g: Geom, sigma,
                                     vrad, vaz, tau_rr, tau_pp, tau_rp, dt):
    """reference src/viscosity/viscosity.cpp:355-426 (conservative form)."""
    nr = g.nrad

    # v_az rows 1..NR-2; needs tau_rp row i+1 -> shift
    ra_sq = g.ra ** 2                                 # (NR+1,1)
    sig_avg_phi = 0.5 * (sigma + azim_prev(sigma))
    trp_rsq = ra_sq[:nr] * tau_rp                     # Ra[i]^2 Trp[i], rows 0..NR-1
    trp_rsq_up = jnp.concatenate(
        [trp_rsq[1:], jnp.zeros_like(trp_rsq[:1])], axis=0)  # row i+1 (row NR-1 unused)
    dvp = dt * g.inv_rb / sig_avg_phi * (
        g.two_diff_ra_sq * (trp_rsq_up - trp_rsq)
        + (tau_pp - azim_prev(tau_pp)) * g.invdphi)
    vaz = set_rows(vaz, vaz + dvp, 1, nr - 1)

    # v_rad rows 2..NR-2 (faces); face i uses cells i, i-1
    rb = g.rb
    sig_avg_r = 0.5 * (sigma[1:] + sigma[:-1])        # faces 1..NR-1
    dvr = dt / sig_avg_r * phys.radial_viscosity_factor \
        * 2.0 / (rb[1:] + rb[:-1]) * (
            (rb[1:] * tau_rr[1:] - rb[:-1] * tau_rr[:-1]) * g.inv_diff_rmed[1:nr]
            + (azim_next(tau_rp[1:]) - tau_rp[1:]) * g.invdphi
            - 0.5 * (tau_pp[1:] + tau_pp[:-1]))
    vrad = vrad.at[2:nr - 1].add(dvr[1:nr - 2])
    return vrad, vaz
