"""Disk monitor diagnostics.

Re-derivation of reference src/quantities.cpp: the ~20 scalar quantities
written to monitor/Quantities.dat every monitor step. All reductions are
single fused jnp passes over the active rings (rows 1..NR-2); under a
radial mesh they lower to cross-shard reduces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import Physics
from .common import Geom, azim_next, azim_prev


def _active(x, nr):
    return x[1:nr - 1]


def _mask_cols(g: Geom, radius_limit):
    return (g.rb[1:g.nrad - 1] <= radius_limit)


def total_mass(phys: Physics, g: Geom, sigma, radius_limit):
    """reference src/quantities.cpp:51-80."""
    w = jnp.where(_mask_cols(g, radius_limit), g.surf[1:g.nrad - 1], 0.0)
    return jnp.sum(w * _active(sigma, g.nrad))


def disk_radius(phys: Physics, g: Geom, sigma, total, frac: float = 0.99):
    """Radius containing ``frac`` of the mass
    (reference src/quantities.cpp:191-240)."""
    nr = g.nrad
    ring_mass = jnp.sum(_active(sigma, nr) * g.surf[1:nr - 1], axis=-1)
    cum = jnp.cumsum(ring_mass)
    idx = jnp.searchsorted(cum, frac * total)
    idx = jnp.clip(idx, 0, nr - 3)
    return g.rb[1 + idx, 0]


def angular_momentum(phys: Physics, g: Geom, sigma, vaz, omega_frame,
                     radius_limit):
    """reference src/quantities.cpp:242-279."""
    nr = g.nrad
    sig_avg = 0.5 * (sigma + azim_prev(sigma))
    cell = g.surf * sig_avg * g.rb * (vaz + omega_frame * g.rb)
    w = jnp.where(_mask_cols(g, radius_limit), _active(cell, nr), 0.0)
    return jnp.sum(w)


def internal_energy(phys: Physics, g: Geom, energy, radius_limit):
    nr = g.nrad
    w = jnp.where(_mask_cols(g, radius_limit), g.surf[1:nr - 1], 0.0)
    return jnp.sum(w * _active(energy, nr))


def _cell_center_velocities(g: Geom, vrad, vaz, omega_frame):
    vr_c = ((g.rb - g.rinf) * vrad[1:] + (g.rsup - g.rb) * vrad[:-1]) \
        / (g.rsup - g.rinf)
    vaz_c = 0.5 * (vaz + azim_next(vaz))
    return vr_c, vaz_c


def kinetic_energies(phys: Physics, g: Geom, sigma, vrad, vaz, omega_frame,
                     radius_limit):
    """(radial, azimuthal) kinetic energy
    (reference src/quantities.cpp:357-480). The azimuthal part includes the
    frame rotation."""
    nr = g.nrad
    vr_c, vaz_c = _cell_center_velocities(g, vrad, vaz, omega_frame)
    vaz_tot = vaz_c + omega_frame * g.rb
    w = jnp.where(_mask_cols(g, radius_limit),
                  (0.5 * g.surf * sigma)[1:nr - 1], 0.0)
    e_rad = jnp.sum(w * _active(vr_c, nr) ** 2)
    e_az = jnp.sum(w * _active(vaz_tot, nr) ** 2)
    return e_rad, e_az


def potential_energy(phys: Physics, constants, g: Geom, sigma, pot,
                     radius_limit):
    nr = g.nrad
    w = jnp.where(_mask_cols(g, radius_limit), g.surf[1:nr - 1], 0.0)
    return jnp.sum(w * _active(sigma * pot, nr))


def eccentricity_vector(phys: Physics, constants, g: Geom, sigma, vrad, vaz,
                        omega_frame, frame_angle, cos_phi, sin_phi):
    """Per-cell Runge-Lenz vector rotated to the inertial frame
    (reference src/quantities.cpp:481-551)."""
    total_mass_cell = phys.hydro_center_mass + sigma * g.surf
    r_x = g.rb * cos_phi
    r_y = g.rb * sin_phi
    vr_c = 0.5 * (vrad[:-1] + vrad[1:])
    vaz_c = 0.5 * (vaz + azim_next(vaz)) + omega_frame * g.rb
    v_x = cos_phi * vr_c - sin_phi * vaz_c
    v_y = sin_phi * vr_c + cos_phi * vaz_c
    dist = g.rb
    j = r_x * v_y - r_y * v_x
    Gm = constants.G * total_mass_cell
    e_x = j * v_y / Gm - r_x / dist
    e_y = -j * v_x / Gm - r_y / dist
    ca = jnp.cos(frame_angle)
    sa = jnp.sin(frame_angle)
    return e_x * ca - e_y * sa, e_y * ca + e_x * sa


def mass_average(phys: Physics, g: Geom, sigma, arr, radius_limit):
    """reference src/quantities.cpp:107-190."""
    nr = g.nrad
    w = jnp.where(_mask_cols(g, radius_limit),
                  (sigma * g.surf)[1:nr - 1], 0.0)
    return jnp.sum(w * _active(arr, nr)) / jnp.sum(w)


def disk_ecc_peri(phys: Physics, constants, g: Geom, sigma, vrad, vaz,
                  omega_frame, frame_angle, cos_phi, sin_phi, radius_limit):
    e_x, e_y = eccentricity_vector(phys, constants, g, sigma, vrad, vaz,
                                   omega_frame, frame_angle, cos_phi, sin_phi)
    ax = mass_average(phys, g, sigma, e_x, radius_limit)
    ay = mass_average(phys, g, sigma, e_y, radius_limit)
    return jnp.sqrt(ax * ax + ay * ay), jnp.arctan2(ay, ax)


def monitor_quantities(phys: Physics, constants, g: Geom, sigma, vrad, vaz,
                       energy, pot, qplus, qminus, omega_frame, frame_angle,
                       cos_phi, sin_phi, radius_limit):
    """All scalars for one Quantities.dat row, as a dict of 0-d arrays."""
    nr = g.nrad
    mass = total_mass(phys, g, sigma, radius_limit)
    radius = disk_radius(phys, g, sigma, mass)
    am = angular_momentum(phys, g, sigma, vaz, omega_frame, radius_limit)
    eint = internal_energy(phys, g, energy, radius_limit)
    e_rad, e_az = kinetic_energies(phys, g, sigma, vrad, vaz, omega_frame,
                                   radius_limit)
    epot = potential_energy(phys, constants, g, sigma, pot, radius_limit)
    ecc, peri = disk_ecc_peri(phys, constants, g, sigma, vrad, vaz,
                              omega_frame, frame_angle, cos_phi, sin_phi,
                              radius_limit)
    w = jnp.where(_mask_cols(g, radius_limit), g.surf[1:nr - 1], 0.0)
    dissipation = jnp.sum(w * _active(qplus, nr))
    luminosity = jnp.sum(w * _active(qminus, nr))
    return {
        "mass": mass, "radius": radius, "angular momentum": am,
        "internal energy": eint, "radial kinetic energy": e_rad,
        "azimuthal kinetic energy": e_az,
        "kinematic energy": e_rad + e_az,
        "potential energy": epot,
        "total energy": eint + e_rad + e_az + epot,
        "eccentricity": ecc, "periastron": peri,
        "viscous dissipation": dissipation, "luminosity": luminosity,
    }
