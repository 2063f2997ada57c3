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


def _ziampras_beta_inv(phys: Physics, constants, g: Geom, sigma, energy,
                       temperature, kappa, scale_height, omega_k, pvte_vals):
    """Physically-motivated local beta for the Ziampras et al. (2023)
    cooling prescription (reference src/SourceEuler.cpp:655-760):
      surf: 1/beta = |Q_surf| / (E Omega_K) with the surface-cooling rate,
      mid:  1/beta = eta / (Omega_K (H^2 + l_rad^2/3)),
            eta = 16 sigma_SB T^3 / (3 c_v kappa rho^2),
      tot:  sum of both inverse betas.
    NOTE the reference's tau_eff here is 3 tau/8 + pow(3,1/2)/4 + 1/(4 tau)
    where pow(3,1/2) is INTEGER division = pow(3,0) = 1 (an upstream C++
    quirk); replicated for parity."""
    rho = sigma / (phys.density_factor * scale_height)
    if pvte_vals is not None:
        gam, mu_val, _ = pvte_vals
    else:
        gam = eos.gamma_eff(phys)
        mu_val = phys.mu
    beta_inv_surf = beta_inv_mid = None
    if phys.cooling_beta_method in ("surf", "tot"):
        tau = 0.5 * kappa * sigma
        tau_eff = 3.0 * tau / 8.0 + 0.25 + 1.0 / (4.0 * tau)
        q_surf = phys.surface_cooling_factor * 2.0 * constants.sigma_sb \
            * temperature ** 4 / tau_eff
        beta_inv_surf = jnp.abs(q_surf) / (energy * omega_k)
    if phys.cooling_beta_method in ("mid", "tot"):
        c_v = constants.R / (mu_val * (gam - 1.0))
        eta = 16.0 * constants.sigma_sb * temperature ** 3 \
            / (3.0 * c_v * kappa * rho ** 2)
        lrad = 1.0 / (rho * kappa)
        beta_inv_mid = eta / (omega_k
                              * (scale_height ** 2 + lrad ** 2 / 3.0))
    if phys.cooling_beta_method == "surf":
        return beta_inv_surf
    if phys.cooling_beta_method == "mid":
        return beta_inv_mid
    return beta_inv_surf + beta_inv_mid


def beta_cooling(phys: Physics, constants, g: Geom, sigma, energy,
                 sigma0_ref, energy0_ref, current_time, temperature=None,
                 kappa=None, scale_height=None, pvte_vals=None):
    """Thermal relaxation Q- = dE * Omega_K / beta
    (reference src/SourceEuler.cpp:632-786), including the Ziampras 2023
    surf/mid/tot local-beta variants when configured."""
    omega_k = jnp.sqrt(constants.G * phys.hydro_center_mass / g.rb ** 3)
    beta_inv = 1.0 / phys.cooling_beta
    if phys.cooling_beta_ramp_up > 0.0:
        t = current_time
        ramp = 1.0 - jnp.exp(-(2.0 * t / phys.cooling_beta_ramp_up) ** 2)
        beta_inv = beta_inv * ramp
    if phys.cooling_beta_method != "no" and temperature is not None:
        beta_inv = _ziampras_beta_inv(
            phys, constants, g, sigma, energy, temperature, kappa,
            scale_height, omega_k, pvte_vals)
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


def kappa_tau_eff(phys: Physics, constants, units, sigma, temperature,
                  scale_height):
    """Opacity, vertical optical depth, effective optical depth
    (reference src/compute.cpp:41-87 ``kappa_eff``)."""
    from . import opacity as opacity_mod
    rho = sigma / (phys.density_factor * scale_height)
    kappa = opacity_mod.opacity(phys, units, rho, temperature)
    tau = phys.tau_factor / phys.density_factor * kappa * sigma
    if phys.opacity_mode == "simple":
        # D'Angelo et al. 2003 eq. 28
        tau_eff = 3.0 / 8.0 * tau
    elif phys.heating_star:
        # irradiated disk (D'Angelo & Marzari 2012)
        tau_eff = 3.0 / 8.0 * tau + 0.5 + 1.0 / (4.0 * tau + phys.tau_min)
    else:
        tau_eff = 3.0 / 8.0 * tau + jnp.sqrt(3.0) / 4.0 \
            + 1.0 / (4.0 * tau + phys.tau_min)
    return kappa, tau, tau_eff


def thermal_cooling(phys: Physics, constants, temperature, tau_eff):
    """Surface radiative cooling Q- = factor 2 sigma_sb (T^4 - Tmin^4)/tau_eff
    (reference src/SourceEuler.cpp:790-820)."""
    t4 = temperature ** 4
    tmin4 = phys.minimum_temperature ** 4
    return phys.surface_cooling_factor * 2.0 * constants.sigma_sb \
        * (t4 - tmin4) / tau_eff


def scurve_cooling(phys: Physics, constants, units, g: Geom, sigma,
                   temperature, mu_grid):
    """Dwarf-nova S-curve surface cooling (reference
    src/SourceEuler.cpp:823-928 ``scurve_cooling``): Ichikawa & Osaki 1992
    hot/cold/intermediate branch fluxes, or the Kimura et al. 2020
    calibration; limited to blackbody flux and power-law-scaled below the
    Sigma/T validity thresholds. Returns (qminus, tau_eff)."""
    sigma_cgs_thresh = 2.0
    temp_cgs_thresh = 1200.0
    if phys.scurve_kimura:
        f_hot_const = 23.405
        mu_exp = 0.31
    else:
        f_hot_const = 25.49
        mu_exp = -0.31

    sigma_cgs = sigma * units.surface_density
    sigma_t = jnp.maximum(sigma_cgs, sigma_cgs_thresh)
    temp_cgs = temperature * units.temperature
    temp_t = jnp.maximum(temp_cgs, temp_cgs_thresh)
    r_cgs = g.rb * units.length
    m_cgs = phys.hydro_center_mass * units.mass
    omega_cgs = jnp.sqrt(constants.cgs_G * m_cgs / r_cgs ** 3)
    sb_cgs = constants.cgs_sigma_sb

    log10 = jnp.log10
    log_ta = -1.0 / 5.49 * (0.62 * log10(omega_cgs) + 1.62 * log10(sigma_t)
                            + mu_exp * log10(mu_grid) - 25.48
                            - log10(sb_cgs))
    ta = 10.0 ** log_ta
    log_fa = log10(sb_cgs) + 4.0 * log_ta
    k_cgs = 11.0 + 0.4 * log10(2.0e10 / r_cgs)
    log_fb = jnp.maximum(k_cgs, log_fa)
    log_tb = (log_fb + log10(omega_cgs) + 2.0 * log10(sigma_t)
              + 0.5 * log10(mu_grid) + f_hot_const) / 8.0
    tb = 10.0 ** log_tb

    log_f_cold = 9.49 * log10(temp_t) + 0.62 * log10(omega_cgs) \
        + 1.62 * log10(sigma_t) + mu_exp * log10(mu_grid) - 25.48
    log_f_hot = 8.0 * log10(temp_t) - log10(omega_cgs) \
        - 2.0 * log10(sigma_t) - 0.5 * log10(mu_grid) - f_hot_const
    log_f_mid = (log_fa - log_fb) * log10(temp_t / tb) / log10(ta / tb) \
        + log_fb
    log_ftot = jnp.where(temp_t < ta, log_f_cold,
                         jnp.where(temp_t > tb, log_f_hot, log_f_mid))

    f_tot = 10.0 ** log_ftot / units.energy_flux
    # power-law scaling below the validity thresholds (reference :917-919)
    f_tot = f_tot * jnp.sqrt(sigma_cgs / sigma_t) \
        * (temp_cgs / temp_t) ** 2
    t4 = temperature ** 4
    f_bb = constants.sigma_sb * t4
    factor = phys.surface_cooling_factor
    qminus = 2.0 * factor * jnp.minimum(f_tot, f_bb)
    tau_eff = factor * 2.0 * constants.sigma_sb * t4 \
        / jnp.maximum(qminus, 1e-300)
    return qminus, tau_eff


def irradiation(phys: Physics, constants, g: Geom, bodies, n_bodies: int,
                body_radius, body_temperature, body_irradiates: list,
                body_rampup_time, cell_x, cell_y, aspect_ratio_grid,
                tau_eff, current_time):
    """Stellar irradiation heating (Menou & Goodman 2004 via
    D'Angelo & Marzari 2012; reference src/SourceEuler.cpp:538-611)."""
    qplus = jnp.zeros_like(tau_eff)
    sig_sb = constants.sigma_sb
    dlogh_dlogr = 9.0 / 7.0   # Chiang & Goldreich 1997
    eps = 0.5
    for k in range(n_bodies):
        if not body_irradiates[k]:
            continue
        t_ramp = body_rampup_time[k]
        ramping = jnp.where(
            (t_ramp > 0.0) & (current_time < t_ramp),
            1.0 - jnp.cos(current_time * (jnp.pi / 2.0)
                          / jnp.where(t_ramp > 0.0, t_ramp, 1.0)) ** 2,
            1.0)
        x, y = bodies.x[k], bodies.y[k]
        r_star = body_radius[k]
        t_star = body_temperature[k]
        l1 = bodies.cubic_smoothing_radius[k]
        off_center = x * x + y * y > 1e-10
        min_dist = jnp.where(off_center, jnp.maximum(r_star, l1), r_star)
        dist = jnp.maximum(
            jnp.sqrt((cell_x - x) ** 2 + (cell_y - y) ** 2), min_dist)
        roverd = jnp.where(dist < r_star, 1.0, r_star / dist)
        w_g = 0.4 * roverd + aspect_ratio_grid * (dlogh_dlogr - 1.0)
        t_irr4 = (1.0 - eps) * t_star ** 4 * roverd ** 2 * w_g
        qplus = qplus + ramping * 2.0 * sig_sb * t_irr4 / tau_eff
    return qplus


def substep3(phys: Physics, constants, g: Geom, sigma, energy, vrad, vaz,
             nu, tau_rr, tau_pp, tau_rp, div_v, scale_height,
             sigma0_ref, energy0_ref, tau_eff, current_time, dt,
             units=None, irradiation_ctx=None, pvte_vals=None,
             aspect_grid=None):
    """Energy update with Q+ / Q- (reference src/SourceEuler.cpp:956-1051).

    ``irradiation_ctx`` (when stellar heating is on) carries
    (bodies, n_bodies, body_radius, body_temperature, body_irradiates,
    body_rampup_time, cell_x, cell_y).

    Returns (energy_new, qplus, qminus) with Q grids already divided by the
    radiative correction factor alpha (they feed the CFL heating/cooling
    limit, reference src/cfl.cpp:308-318).
    """
    nr = g.nrad

    needs_tau = phys.cooling_surface_enabled or phys.heating_star \
        or phys.cooling_scurve_enabled or phys.cooling_beta_method != "no"
    temperature = None
    _kappa = None
    if needs_tau and units is not None:
        from . import eos as eos_mod
        temperature = eos_mod.temperature(phys, constants, sigma, energy,
                                          None)
        _kappa, _tau, tau_eff = kappa_tau_eff(phys, constants, units, sigma,
                                              temperature, scale_height)

    qminus = jnp.zeros_like(energy)
    if phys.cooling_beta_enabled:
        qminus = qminus + beta_cooling(
            phys, constants, g, sigma, energy, sigma0_ref, energy0_ref,
            current_time, temperature=temperature, kappa=_kappa,
            scale_height=scale_height, pvte_vals=pvte_vals)
    if phys.cooling_surface_enabled and temperature is not None:
        qminus = qminus + thermal_cooling(phys, constants, temperature,
                                          tau_eff)
    if phys.cooling_scurve_enabled and temperature is not None:
        mu_grid = pvte_vals[1] if pvte_vals is not None \
            else jnp.full_like(sigma, phys.mu)
        q_sc, tau_eff = scurve_cooling(phys, constants, units, g, sigma,
                                       temperature, mu_grid)
        qminus = qminus + q_sc

    qplus = jnp.zeros_like(energy)
    if phys.heating_viscous:
        qplus = qplus + viscous_heating(phys, g, sigma, nu, tau_rr, tau_pp,
                                        tau_rp, div_v)
    if phys.heating_star and irradiation_ctx is not None:
        (bodies, n_bodies, body_radius, body_temperature, body_irradiates,
         body_rampup_time, cell_x, cell_y) = irradiation_ctx
        # ASPECTRATIO grid: H/r only in mode 0 — modes 1/2 use their own
        # body-distance forms (see eos.aspect_ratio_nbody/_com; the caller
        # passes the mode-correct grid via ``aspect_grid``)
        aspect = aspect_grid if aspect_grid is not None \
            else scale_height * g.inv_rb
        qplus = qplus + irradiation(
            phys, constants, g, bodies, n_bodies, body_radius,
            body_temperature, body_irradiates, body_rampup_time,
            cell_x, cell_y, aspect, tau_eff, current_time)

    # radiative correction factor alpha (reference :1018-1024)
    if pvte_vals is not None:
        gam, mu_val, _g1 = pvte_vals
    else:
        gam = eos.gamma_eff(phys)
        mu_val = phys.mu
    Rgas = constants.R
    inv_pow4 = (mu_val * (gam - 1.0) / (Rgas * sigma)) ** 4
    alpha = 1.0 + 2.0 * scale_height * 4.0 * constants.sigma_sb / constants.c \
        * inv_pow4 * energy ** 3
    qplus = qplus / alpha
    qminus = qminus / alpha

    e_new = energy + dt * (qplus - qminus)

    # near-floor cells go to instantaneous heating/cooling equilibrium
    # (reference :1030-1044)
    sigma_floor_10 = 10.0 * phys.sigma0 * phys.sigma_floor
    e4 = qplus * tau_eff / (2.0 * constants.sigma_sb)
    const = Rgas / mu_val * sigma / (gam - 1.0)
    eq_energy = e4 ** 0.25 * const
    near_floor = sigma < sigma_floor_10
    e_new = jnp.where(near_floor, eq_energy, e_new)
    qminus = jnp.where(near_floor, qplus, qminus)

    energy = set_rows(energy, e_new, 1, nr - 1)
    energy = eos.energy_floor_ceiling(phys, constants, sigma, energy,
                                      pvte_vals)
    # ghost rows: the reference never computes Q there (clear() + active
    # loops 1..Nr-2), so they stay zero in its QPLUS/QMINUS outputs
    zeros = jnp.zeros_like(qplus)
    qplus = set_rows(qplus, zeros, 0, 1)
    qplus = set_rows(qplus, zeros, nr - 1, nr)
    qminus = set_rows(qminus, zeros, 0, 1)
    qminus = set_rows(qminus, zeros, nr - 1, nr)
    return energy, qplus, qminus
