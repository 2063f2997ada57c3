"""Energy source substep (SubStep3): viscous heating, irradiation hooks,
cooling menu, and the implicit-ish radiative correction factor.

Re-derivation of reference src/SourceEuler.cpp:496-1051.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import Physics
from .common import Geom, azim_next, set_rows
from . import eos


def viscous_heating(phys: Physics, g: Geom, sigma, nu, tau_rr, tau_pp,
                    tau_rp, div_v):
    """Q+ from viscous dissipation (reference src/SourceEuler.cpp:496-536).
    Rows 1..NR-2 (callers mask via set_rows)."""
    trp4 = 0.25 * (tau_rp + jnp.roll(tau_rp, -1, axis=0)
                   + azim_next(tau_rp) + azim_next(jnp.roll(tau_rp, -1, axis=0)))
    # jnp.roll wraps row NR-1 -> 0; harmless, row NR-1 is masked off below.
    nu_sig = nu * sigma
    safe = jnp.where(nu_sig != 0.0, 2.0 * nu_sig, 1.0)
    qplus = 1.0 / safe * (tau_rr ** 2 + 2.0 * trp4 ** 2 + tau_pp ** 2)
    qplus = qplus + (2.0 / 9.0) * nu_sig * div_v ** 2
    qplus = jnp.where(nu != 0.0, qplus * phys.heating_viscous_factor, 0.0)
    return qplus


def beta_cooling(phys: Physics, constants, g: Geom, sigma, energy,
                 sigma0_ref, energy0_ref, current_time):
    """Thermal relaxation Q- = dE * Omega_K / beta
    (reference src/SourceEuler.cpp:632-786; surf/mid/tot variants come with
    the opacity module)."""
    omega_k = jnp.sqrt(constants.G * phys.hydro_center_mass / g.rb ** 3)
    beta_inv = 1.0 / phys.cooling_beta
    if phys.cooling_beta_ramp_up > 0.0:
        t = current_time
        ramp = 1.0 - jnp.exp(-(2.0 * t / phys.cooling_beta_ramp_up) ** 2)
        beta_inv = beta_inv * ramp
    delta_e = energy
    if phys.cooling_beta_reference:
        delta_e = delta_e - energy0_ref / sigma0_ref * sigma
    if phys.cooling_beta_model:
        e0 = 1.0 / (phys.adiabatic_index - 1.0) * phys.aspectratio_ref ** 2 \
            * g.rb ** (2.0 * phys.flaring_index - 1.0) \
            * constants.G * phys.hydro_center_mass * sigma
        delta_e = delta_e - e0
    if phys.cooling_beta_floor:
        gam = eos.gamma_eff(phys)
        e_min = phys.minimum_temperature * sigma / phys.mu * constants.R \
            / (gam - 1.0)
        delta_e = delta_e - e_min
    return delta_e * omega_k * beta_inv


def substep3(phys: Physics, constants, g: Geom, sigma, energy, vrad, vaz,
             nu, tau_rr, tau_pp, tau_rp, div_v, scale_height,
             sigma0_ref, energy0_ref, tau_eff, current_time, dt):
    """Energy update with Q+ / Q- (reference src/SourceEuler.cpp:956-1051).

    Returns (energy_new, qplus, qminus) with Q grids already divided by the
    radiative correction factor alpha (they feed the CFL heating/cooling
    limit, reference src/cfl.cpp:308-318).
    """
    nr = g.nrad

    qminus = jnp.zeros_like(energy)
    if phys.cooling_beta_enabled:
        qminus = qminus + beta_cooling(phys, constants, g, sigma, energy,
                                       sigma0_ref, energy0_ref, current_time)
    # surface / scurve cooling require the opacity module (later stage)

    qplus = jnp.zeros_like(energy)
    if phys.heating_viscous:
        qplus = qplus + viscous_heating(phys, g, sigma, nu, tau_rr, tau_pp,
                                        tau_rp, div_v)
    # irradiation requires planet temperatures (later stage)

    # radiative correction factor alpha (reference :1018-1024)
    gam = eos.gamma_eff(phys)
    Rgas = constants.R
    inv_pow4 = (phys.mu * (gam - 1.0) / (Rgas * sigma)) ** 4
    alpha = 1.0 + 2.0 * scale_height * 4.0 * constants.sigma_sb / constants.c \
        * inv_pow4 * energy ** 3
    qplus = qplus / alpha
    qminus = qminus / alpha

    e_new = energy + dt * (qplus - qminus)

    # near-floor cells go to instantaneous heating/cooling equilibrium
    # (reference :1030-1044)
    sigma_floor_10 = 10.0 * phys.sigma0 * phys.sigma_floor
    e4 = qplus * tau_eff / (2.0 * constants.sigma_sb)
    const = Rgas / phys.mu * sigma / (gam - 1.0)
    eq_energy = e4 ** 0.25 * const
    near_floor = sigma < sigma_floor_10
    e_new = jnp.where(near_floor, eq_energy, e_new)
    qminus = jnp.where(near_floor, qplus, qminus)

    energy = set_rows(energy, e_new, 1, nr - 1)
    energy = eos.energy_floor_ceiling(phys, constants, sigma, energy)
    return energy, qplus, qminus
