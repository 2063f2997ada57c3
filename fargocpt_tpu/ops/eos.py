"""Equation of state & derived thermodynamic quantities.

Re-derives reference src/SourceEuler.cpp:1054-1505 (sound speed, scale
height, pressure, temperature) as pure functions. The reference caches
these in grids; here they are recomputed where needed and fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import Physics
from .common import Geom


def gamma_eff(phys: Physics, sigma=None, energy=None):
    """Effective adiabatic index. Constant unless PVTE (PVTE comes later)."""
    return phys.adiabatic_index


def mu_eff(phys: Physics, sigma=None, energy=None):
    return phys.mu


def sound_speed_iso_profile(phys: Physics, constants, rb: jax.Array) -> jax.Array:
    """Locally-isothermal axisymmetric cs(r) = h0 r^F * vK(r)
    (reference src/SourceEuler.cpp:1080-1088). ``rb`` is (NR,1)."""
    vk = jnp.sqrt(constants.G * phys.hydro_center_mass / rb)
    h = phys.aspectratio_ref * rb ** phys.flaring_index
    return h * vk


def sound_speed(phys: Physics, constants, g: Geom, sigma, energy,
                cs_iso: jax.Array | None, pvte_vals=None):
    """Adiabatic: cs = sqrt(gamma1 (gamma_eff - 1) E / Sigma)
    (reference src/SourceEuler.cpp:1063-1072); isothermal mode 0: static
    profile computed once at init (never updated, src/SourceEuler.cpp:1464)."""
    if phys.is_adiabatic:
        if pvte_vals is not None:
            gam, _mu, g1 = pvte_vals
        else:
            gam = gamma_eff(phys, sigma, energy)
            g1 = gam  # gamma1 == gamma_eff without PVTE
        return jnp.sqrt(g1 * (gam - 1.0) * energy / sigma)
    if phys.is_polytropic:
        temp = temperature(phys, constants, sigma, energy, None)
        return jnp.sqrt(gamma_eff(phys) * constants.R / phys.mu * temp)
    # locally isothermal, aspectratio_mode == 0
    return jnp.broadcast_to(cs_iso, sigma.shape)


def pressure(phys: Physics, constants, sigma, energy, cs, pvte_vals=None):
    """reference src/SourceEuler.cpp:1442-1473."""
    if phys.is_adiabatic:
        if pvte_vals is not None:
            return (pvte_vals[0] - 1.0) * energy
        return (gamma_eff(phys) - 1.0) * energy
    if phys.is_polytropic:
        return sigma * cs ** 2 / phys.adiabatic_index
    return sigma * cs ** 2


def temperature(phys: Physics, constants, sigma, energy, press,
                pvte_vals=None):
    """reference src/SourceEuler.cpp:1475-1505."""
    Rgas = constants.R
    if phys.is_adiabatic:
        if pvte_vals is not None:
            gam, mu, _g1 = pvte_vals
            return mu / Rgas * (gam - 1.0) * energy / sigma
        gam = gamma_eff(phys)
        return phys.mu / Rgas * (gam - 1.0) * energy / sigma
    if phys.is_polytropic:
        gam = gamma_eff(phys)
        return (phys.mu / Rgas * phys.polytropic_constant
                * sigma ** (gam - 1.0))
    return phys.mu / Rgas * press / sigma


def scale_height(phys: Physics, constants, g: Geom, cs, pvte_vals=None):
    """aspectratio_mode == 0: H = cs_iso / Omega_K
    (reference src/SourceEuler.cpp:1218-1251)."""
    omega_k = jnp.sqrt(constants.G * phys.hydro_center_mass / g.rb ** 3)
    if phys.is_adiabatic or phys.is_polytropic:
        g1 = pvte_vals[2] if pvte_vals is not None else gamma_eff(phys)
        return cs / jnp.sqrt(g1) / omega_k
    return cs / omega_k


def _min_dist_col(g: Geom):
    """Half the larger cell extent — the closest a body can effectively be
    to cell gas (reference src/SourceEuler.cpp:1113-1119)."""
    return 0.5 * jnp.maximum(g.rsup - g.rinf, g.rb * g.dphi)


def sound_speed_iso_nbody(phys: Physics, constants, g: Geom, bodies,
                          n_bodies: int, body_radius, cell_x, cell_y):
    """AspectRatioMode 1: Cs^2 = sum_k h0^2 dist^2F G m_k / dist over all
    bodies (reference src/SourceEuler.cpp:1136-1195
    ``compute_iso_sound_speed_nbody``)."""
    cs2 = jnp.zeros_like(cell_x)
    h0 = phys.aspectratio_ref
    base_min = _min_dist_col(g)
    for k in range(n_bodies):
        dist = jnp.maximum(
            jnp.sqrt((cell_x - bodies.x[k]) ** 2
                     + (cell_y - bodies.y[k]) ** 2),
            base_min + body_radius[k])
        cs2 = cs2 + h0 * h0 * dist ** (2.0 * phys.flaring_index) \
            * constants.G * bodies.mass[k] / dist
    return jnp.sqrt(cs2)


def sound_speed_iso_com(phys: Physics, constants, g: Geom, com_x, com_y,
                        com_mass, cell_x, cell_y):
    """AspectRatioMode 2: Cs from the distance to the N-body center of mass
    (reference src/SourceEuler.cpp:1094-1134)."""
    dist = jnp.maximum(
        jnp.sqrt((cell_x - com_x) ** 2 + (cell_y - com_y) ** 2),
        _min_dist_col(g))
    return phys.aspectratio_ref * dist ** phys.flaring_index \
        * jnp.sqrt(constants.G * com_mass / dist)


def scale_height_nbody(phys: Physics, constants, g: Geom, cs, bodies,
                       n_bodies: int, body_radius, cell_x, cell_y,
                       pvte_vals=None):
    """AspectRatioMode 1: 1/H^2 = sum_k G m_k [gamma1] / (dist^3 cs^2)
    (Thun et al. 2017 eq. 8; reference src/SourceEuler.cpp:1255-1345
    ``compute_scale_height_nbody``)."""
    g1 = 1.0
    if phys.is_adiabatic or phys.is_polytropic:
        g1 = pvte_vals[2] if pvte_vals is not None else gamma_eff(phys)
    cs2 = cs * cs
    inv_h2 = jnp.zeros_like(cs)
    base_min = _min_dist_col(g)
    for k in range(n_bodies):
        dist = jnp.maximum(
            jnp.sqrt((cell_x - bodies.x[k]) ** 2
                     + (cell_y - bodies.y[k]) ** 2),
            base_min + body_radius[k])
        inv_h2 = inv_h2 + constants.G * bodies.mass[k] * g1 \
            / (dist ** 3 * cs2)
    return 1.0 / jnp.sqrt(inv_h2)


def aspect_ratio_nbody(phys: Physics, constants, g: Geom, cs, bodies,
                       n_bodies: int, body_radius, cell_x, cell_y,
                       pvte_vals=None):
    """AspectRatioMode 1 ASPECTRATIO grid (reference
    src/SourceEuler.cpp:1316-1341): h = sqrt(1 / sum_k G m_k [gamma1]
    / (dist cs^2)) — NOT H/r; the irradiation's H/R factor and the
    self-gravity smoothing read this grid."""
    g1 = 1.0
    if phys.is_adiabatic or phys.is_polytropic:
        g1 = pvte_vals[2] if pvte_vals is not None else gamma_eff(phys)
    cs2 = cs * cs
    inv_h2 = jnp.zeros_like(cs)
    base_min = _min_dist_col(g)
    for k in range(n_bodies):
        dist = jnp.maximum(
            jnp.sqrt((cell_x - bodies.x[k]) ** 2
                     + (cell_y - bodies.y[k]) ** 2),
            base_min + body_radius[k])
        inv_h2 = inv_h2 + constants.G * bodies.mass[k] * g1 / (dist * cs2)
    return 1.0 / jnp.sqrt(inv_h2)


def aspect_ratio_com(phys: Physics, constants, g: Geom, cs, com_x, com_y,
                     com_mass, cell_x, cell_y, pvte_vals=None):
    """AspectRatioMode 2 ASPECTRATIO grid (reference
    src/SourceEuler.cpp:1380-1396): h = cs sqrt(dist/(G M [gamma1]))
    at the COM distance (= H/dist_com, not H/r)."""
    g1 = 1.0
    if phys.is_adiabatic or phys.is_polytropic:
        g1 = pvte_vals[2] if pvte_vals is not None else gamma_eff(phys)
    dist = jnp.sqrt((cell_x - com_x) ** 2 + (cell_y - com_y) ** 2)
    return cs * jnp.sqrt(dist / (constants.G * com_mass * g1))


def scale_height_com(phys: Physics, constants, g: Geom, cs, com_x, com_y,
                     com_mass, cell_x, cell_y, pvte_vals=None):
    """AspectRatioMode 2: H = dist * cs sqrt(dist/(G M [gamma1]))
    (reference src/SourceEuler.cpp:1346-1399)."""
    g1 = 1.0
    if phys.is_adiabatic or phys.is_polytropic:
        g1 = pvte_vals[2] if pvte_vals is not None else gamma_eff(phys)
    dist = jnp.sqrt((cell_x - com_x) ** 2 + (cell_y - com_y) ** 2)
    h = cs * jnp.sqrt(dist / (constants.G * com_mass * g1))
    return dist * h


def adjust_scale_height_for_sg(H, toomre_q):
    """Self-gravitating vertical structure: H *= sqrt(2/pi) f(Q),
    f(Q) = pi (sqrt(1 + 8 Q^2/pi) - 1) / (4 Q)
    (reference src/SourceEuler.cpp:1400-1420)."""
    f = jnp.pi * (jnp.sqrt(1.0 + 8.0 * toomre_q ** 2 / jnp.pi) - 1.0) \
        / (4.0 * toomre_q)
    return H * f * jnp.sqrt(2.0 / jnp.pi)


def finite_in(value: float, dtype) -> float:
    """Clamp a Python scalar to the largest finite value of ``dtype``.

    Reference defaults such as MaximumTemperature are DBL_MAX-scale
    (src/parameters.cpp); multiplying them into an f32 array would emit
    numpy overflow-in-cast warnings and produce inf."""
    import numpy as np
    # compare as Python floats: np.minimum would first cast the (possibly
    # 1e300) scalar to dtype, which is the very warning being avoided
    return min(float(value), float(np.finfo(dtype).max))


def energy_floor_ceiling(phys: Physics, constants, sigma, energy,
                         pvte_vals=None):
    """Clamp energy to [E(Tmin), E(Tmax)]
    (reference src/SourceEuler.cpp:136-202 ``assure_temperature_range``)."""
    t_max = finite_in(phys.maximum_temperature, energy.dtype)
    if pvte_vals is not None:
        gam, mu, _g1 = pvte_vals
        factor = sigma / mu * constants.R / (gam - 1.0)
        e_min = phys.minimum_temperature * factor
        e_max = t_max * factor
        return jnp.clip(energy, e_min, e_max)
    gam = gamma_eff(phys)
    factor = sigma / phys.mu * constants.R / (gam - 1.0)
    e_min = phys.minimum_temperature * factor
    e_max = t_max * factor
    return jnp.clip(energy, e_min, e_max)


def sigma_floor_value(phys: Physics) -> float:
    return phys.sigma_floor * phys.sigma0


def apply_sigma_floor(phys: Physics, sigma):
    """reference src/SourceEuler.cpp:102-134 (mass-creation bookkeeping is
    tracked by the caller via the pre/post difference when needed)."""
    return jnp.maximum(sigma, sigma_floor_value(phys))
