"""Wave-damping zones (de Val-Borro et al. 2006 style).

Re-derivation of reference src/boundary_conditions/damping.cpp:311-700:
inside the inner zone r < RMIN*L_in (outer zone r > RMAX*L_out) every
selected quantity relaxes toward a target with rate
exp(-dt * ramp(r)^2 / tau), tau = f * 2 pi / Omega_K(edge).

Targets: reference (= initial values), azimuthal mean, zero, or the
viscous-drift profile. Everything is expressed as per-ring damping-factor
columns precomputed from the geometry, so a damping application is one
fused elementwise pass.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..params import Physics
from .common import Geom
from .boundary import RefValues


class DampingZones:
    """Precomputed damping machinery for one configuration."""

    def __init__(self, phys: Physics, constants, geometry, dtype):
        self.phys = phys
        rmin, rmax = geometry.rmin, geometry.rmax
        # tau for inner edge uses Omega_K(RMIN); outer uses
        # Omega_K(DampingTimeRadiusOuter) = Omega_K(RMAX) by default
        GM = constants.G * phys.hydro_center_mass
        tau_in = phys.damping_time_factor * 2.0 * np.pi \
            / np.sqrt(GM / rmin ** 3)
        r_tau_out = phys.damping_time_radius_outer \
            if phys.damping_time_radius_outer > 0.0 else rmax
        tau_out = phys.damping_time_factor * 2.0 * np.pi \
            / np.sqrt(GM / r_tau_out ** 3)

        def cols(radius):
            r_in = rmin * phys.damping_inner_limit
            r_out = rmax * phys.damping_outer_limit
            rate = np.zeros_like(radius)
            if phys.damping_inner_limit > 1.0:
                inner = radius < r_in
                rate = np.where(
                    inner,
                    ((radius - r_in) / (rmin - r_in)) ** 2 / tau_in, rate)
            if phys.damping_outer_limit < 1.0:
                outer = radius > r_out
                rate = np.where(
                    outer,
                    ((radius - r_out) / (rmax - r_out)) ** 2 / tau_out, rate)
            inner_mask = radius < r_in if phys.damping_inner_limit > 1.0 \
                else np.zeros_like(radius, bool)
            outer_mask = radius > r_out if phys.damping_outer_limit < 1.0 \
                else np.zeros_like(radius, bool)
            return (jnp.asarray(rate[:, None], dtype),
                    jnp.asarray(inner_mask[:, None]),
                    jnp.asarray(outer_mask[:, None]))

        # scalar rings live at Rb, v_rad rows at Ra (reference :314-315)
        self.rate_b, self.in_b, self.out_b = cols(geometry.rmed)
        self.rate_a, self.in_a, self.out_a = cols(geometry.ra)
        nr = geometry.nrad
        self.inv_ra_col = jnp.asarray(
            1.0 / geometry.ra[:nr + 1, None], dtype)

    def _damp(self, x, x0_inner, x0_outer, rate, in_mask, out_mask, dt,
              mode_inner: str, mode_outer: str):
        e = jnp.exp(-dt * rate)
        x0 = jnp.where(in_mask, x0_inner, x0_outer)
        active = jnp.zeros_like(x, dtype=bool)
        if mode_inner != "none":
            active = active | in_mask
        if mode_outer != "none":
            active = active | out_mask
        damped = (x - x0) * e + x0
        return jnp.where(active, damped, x)

    def _target(self, mode: str, x, x0):
        if mode in ("initial", "reference"):
            return x0
        if mode == "mean":
            return jnp.mean(x, axis=-1, keepdims=True) * jnp.ones_like(x)
        if mode == "zero":
            return jnp.zeros_like(x)
        if mode == "none":
            return x0
        raise NotImplementedError(f"damping target {mode!r}")

    def _viscous_vrad_target(self, phys: Physics, nu):
        """Viscous-drift vrad target v_r = -1.5 s nu / Rinf with the
        kinematic viscosity averaged onto the radial faces (reference
        src/boundary_conditions/damping.cpp:623-678
        ``damping_vradial_inner_visc``; Kley, Papaloizou & Ogilvie 2008).
        ``nu`` is the (NR, NAZ) viscosity grid of the current fields (the
        reference reuses its pre-transport VISCOSITY grid here — a stale-
        by-one-substep value; recomputing is the cleaner equivalent)."""
        nu_face = jnp.concatenate(
            [nu[:1], 0.5 * (nu[1:] + nu[:-1]), nu[-1:]], axis=0)
        return -1.5 * phys.viscous_outflow_speed * nu_face * self.inv_ra_col

    def apply(self, phys: Physics, sigma, vrad, vaz, energy, ref: RefValues,
              dt, nu=None):
        """reference src/boundary_conditions/damping.cpp ``damping()``."""
        p = phys

        def scalar(x, x0, mi, mo):
            ti = self._target(mi, x, x0)
            to = self._target(mo, x, x0)
            return self._damp(x, ti, to, self.rate_b, self.in_b, self.out_b,
                              dt, mi, mo)

        sigma = scalar(sigma, ref.sigma0, p.damping_surface_density_inner,
                       p.damping_surface_density_outer)
        energy = scalar(energy, ref.energy0, p.damping_energy_inner,
                        p.damping_energy_outer)
        vaz = scalar(vaz, ref.vaz0, p.damping_vazimuthal_inner,
                     p.damping_vazimuthal_outer)

        mi, mo = p.damping_vradial_inner, p.damping_vradial_outer
        if mo == "viscous":
            # matches the reference hard error (damping.cpp:124-127)
            raise NotImplementedError(
                "Damping vrad to viscous radial speed at the outer "
                "boundary is not implemented (matches reference)")
        if mi == "viscous":
            if nu is None:
                raise ValueError("viscous vrad damping needs the viscosity "
                                 "grid (pass nu=)")
            ti = self._viscous_vrad_target(p, nu)
        else:
            ti = self._target(mi, vrad, ref.vrad0)
        to = self._target(mo, vrad, ref.vrad0)
        vrad = self._damp(vrad, ti, to, self.rate_a, self.in_a, self.out_a,
                          dt, mi, mo)
        return sigma, vrad, vaz, energy
