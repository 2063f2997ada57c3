"""The fused hydro time step.

Re-derivation of reference src/simulation.cpp:148-274 ``step_Euler`` (and
:276-483 ``step_LeapFrog``) as one pure function over the state pytree.
All substeps chain inside a single jit scope, so XLA fuses the elementwise
work between the stencil shifts; the reference needs ~30 full-grid memory
round-trips per step, this compiles to a handful.

Everything configuration-dependent (Physics, Geometry, Constants) is
closed over as compile-time constants.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from .constants import Constants
from .grid import Geometry
from .params import Physics, LEAPFROG
from .state import FieldState
from .ops import artvisc, boundary, cfl, energy as energy_ops, eos, gravity, \
    sources, transport
from .ops import viscosity as visc_ops
from .ops.boundary import RefValues
from .ops.common import Geom, prepare_geom


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StepAux:
    """Per-step carry-over diagnostics the next CFL evaluation needs
    (reference keeps these in the QPLUS/QMINUS grids across steps)."""
    qplus: jax.Array
    qminus: jax.Array


class HydroStep:
    """Builds jitted step/CFL callables for a fixed configuration."""

    def __init__(self, phys: Physics, constants: Constants,
                 geometry: Geometry, ref_values: RefValues,
                 bodies: gravity.BodiesOnGrid | None = None):
        self.phys = phys
        self.constants = constants
        self.geometry = geometry
        dtype = jnp.dtype(phys.dtype)
        self.dtype = dtype
        self.g: Geom = prepare_geom(geometry, dtype)
        self.ref_values = ref_values
        x, y = geometry.cell_centers_xy()
        self.cell_x = jnp.asarray(x, dtype)
        self.cell_y = jnp.asarray(y, dtype)
        self.n_bodies = 1 if bodies is None else int(bodies.x.shape[0])
        self.bodies = bodies if bodies is not None else \
            gravity.single_star(dtype, phys.hydro_center_mass)
        # static locally-isothermal sound-speed profile
        # (reference src/SourceEuler.cpp:1080-1088 — never updated for
        # aspectratio_mode == 0)
        self.cs_iso = eos.sound_speed_iso_profile(phys, constants, self.g.rb)

        self._step = jax.jit(self._step_impl)
        self._cfl = jax.jit(self._cfl_impl)
        self._advance = jax.jit(self._advance_impl)

    # ------------------------------------------------------------------
    def derived(self, sigma, energy):
        """Sound speed, pressure, scale height from prognostic fields."""
        phys, constants, g = self.phys, self.constants, self.g
        cs = eos.sound_speed(phys, constants, g, sigma, energy, self.cs_iso)
        press = eos.pressure(phys, constants, sigma, energy, cs)
        h = eos.scale_height(phys, constants, g, cs)
        return cs, press, h

    def viscosity_grid(self, cs, h):
        return visc_ops.kinematic_viscosity(self.phys, self.g, cs, h)

    # ------------------------------------------------------------------
    def _apply_bcs(self, sigma, vrad, vaz, energy, omega_frame):
        return boundary.apply_boundary_conditions(
            self.phys, self.constants, self.g, sigma, vrad, vaz, energy,
            self.ref_values, omega_frame)

    def _substeps(self, sigma, vrad, vaz, energy, time, dt, omega_frame):
        """Source + viscosity + energy substeps (the 'kick' part)."""
        phys, constants, g = self.phys, self.constants, self.g

        cs, press, h = self.derived(sigma, energy)

        pot = gravity.nbody_potential(
            phys, constants, g, self.bodies, self.n_bodies,
            self.cell_x, self.cell_y, h,
            jnp.zeros((), self.dtype), jnp.zeros((), self.dtype))

        vrad, vaz, energy = sources.update_with_sourceterms(
            phys, g, sigma, press, pot, vrad, vaz, energy, omega_frame, dt)

        vrad, vaz, energy = artvisc.update_with_artificial_viscosity(
            phys, g, sigma, vrad, vaz, energy, dt)
        if phys.is_adiabatic and phys.artificial_viscosity_dissipation:
            energy = eos.energy_floor_ceiling(phys, constants, sigma, energy)

        # recalculate_viscosity (reference src/SourceEuler.cpp:205-223):
        # adiabatic cs/H respond to the energy updates above
        cs, _, h = self.derived(sigma, energy)
        nu = self.viscosity_grid(cs, h)
        tau_rr, tau_pp, tau_rp, div_v = visc_ops.viscous_stress_tensor(
            phys, g, sigma, vrad, vaz, nu)
        vrad, vaz = visc_ops.update_velocities_with_viscosity(
            phys, g, sigma, vrad, vaz, tau_rr, tau_pp, tau_rp, dt)

        qplus = jnp.zeros_like(sigma)
        qminus = jnp.zeros_like(sigma)
        if phys.is_adiabatic:
            energy, qplus, qminus = energy_ops.substep3(
                phys, constants, g, sigma, energy, vrad, vaz, nu,
                tau_rr, tau_pp, tau_rp, div_v, h,
                self.ref_values.sigma0, self.ref_values.energy0,
                jnp.zeros_like(sigma), time, dt)
        return sigma, vrad, vaz, energy, qplus, qminus

    def _step_impl(self, fields: FieldState, time, dt):
        """One Euler step (reference src/simulation.cpp:148-274)."""
        phys, constants, g = self.phys, self.constants, self.g
        omega_frame = jnp.asarray(phys.omega_frame, self.dtype)

        sigma, vrad, vaz, energy = (fields.sigma, fields.vrad, fields.vaz,
                                    fields.energy)

        sigma, vrad, vaz, energy, qplus, qminus = self._substeps(
            sigma, vrad, vaz, energy, time, dt, omega_frame)

        # boundary conditions before transport (final=false)
        sigma, vrad, vaz, energy = self._apply_bcs(sigma, vrad, vaz, energy,
                                                   omega_frame)

        sigma, vrad, vaz, energy, _mass_flux = transport.transport(
            phys, g, sigma, vrad, vaz, energy, omega_frame, dt)
        sigma = eos.apply_sigma_floor(phys, sigma)
        if phys.is_adiabatic:
            energy = eos.energy_floor_ceiling(phys, constants, sigma, energy)

        # final boundary conditions (+ damping, when enabled)
        sigma, vrad, vaz, energy = self._apply_bcs(sigma, vrad, vaz, energy,
                                                   omega_frame)

        new_fields = FieldState(sigma=sigma, vrad=vrad, vaz=vaz,
                                energy=energy)
        return new_fields, StepAux(qplus=qplus, qminus=qminus)

    def _cfl_impl(self, fields: FieldState, aux: StepAux):
        phys = self.phys
        cs, press, h = self.derived(fields.sigma, fields.energy)
        nu = self.viscosity_grid(cs, h)
        return cfl.condition_cfl(phys, self.g, fields.sigma, fields.vrad,
                                 fields.vaz, fields.energy, cs, nu,
                                 aux.qplus, aux.qminus)

    def _advance_impl(self, fields: FieldState, aux: StepAux, time, last_dt,
                      t_target):
        """Advance to ``t_target`` (one monitor interval) entirely on-device
        with a ``lax.while_loop`` — replaces the reference's host loop
        (src/simulation.cpp:505-560) including the exact dt clamping rules:
        dt = min(CFL_max_var * last_dt, cfl_dt), stretched/clamped to land
        exactly on the monitor boundary (:541-552).

        Returns (fields, aux, time, last_dt, n_steps, dt_min, dt_max,
        dt_sum, dt_sum_sq).
        """
        dtype = self.dtype
        big = jnp.asarray(jnp.finfo(dtype).max, dtype)

        def cond(carry):
            return jnp.logical_not(carry[-1])

        def body(carry):
            (fields, aux, time, last_dt, n, dmin, dmax, dsum, dsq,
             _done) = carry
            cfl_dt = self._cfl_impl(fields, aux)
            dt = jnp.minimum(self.phys.cfl_max_var * last_dt, cfl_dt)
            time_left = t_target - time
            clamp = (dt > time_left) | (time_left < dt * 1.05)
            step_dt = jnp.where(clamp, time_left, dt)
            fields, aux = self._step_impl(fields, time, step_dt)
            time = jnp.where(clamp, t_target, time + step_dt)
            return (fields, aux, time, dt, n + 1,
                    jnp.minimum(dmin, step_dt), jnp.maximum(dmax, step_dt),
                    dsum + step_dt, dsq + step_dt * step_dt, clamp)

        zero = jnp.zeros((), dtype)
        init = (fields, aux, jnp.asarray(time, dtype),
                jnp.asarray(last_dt, dtype), jnp.zeros((), jnp.int32),
                big, zero, zero, zero, jnp.asarray(False))
        out = jax.lax.while_loop(cond, body, init)
        return out[:-1]

    # public API ---------------------------------------------------------
    def advance_to(self, fields: FieldState, aux: StepAux, time, last_dt,
                   t_target):
        return self._advance(fields, aux, jnp.asarray(time, self.dtype),
                             jnp.asarray(last_dt, self.dtype),
                             jnp.asarray(t_target, self.dtype))

    def step(self, fields: FieldState, time, dt):
        return self._step(fields, jnp.asarray(time, self.dtype),
                          jnp.asarray(dt, self.dtype))

    def cfl_dt(self, fields: FieldState, aux: StepAux) -> jax.Array:
        return self._cfl(fields, aux)

    def initial_aux(self, fields: FieldState | None = None) -> StepAux:
        """Q+/Q- for the first CFL evaluation (reference
        src/SourceEuler.cpp:1507-1547 ``compute_heating_cooling_for_CFL``)."""
        shape = (self.geometry.nrad, self.geometry.naz)
        z = jnp.zeros(shape, self.dtype)
        if fields is None or not self.phys.is_adiabatic:
            return StepAux(qplus=z, qminus=z)
        phys, constants, g = self.phys, self.constants, self.g
        sigma, energy = fields.sigma, fields.energy
        cs, _, h = self.derived(sigma, energy)
        nu = self.viscosity_grid(cs, h)
        tau_rr, tau_pp, tau_rp, div_v = visc_ops.viscous_stress_tensor(
            phys, g, sigma, fields.vrad, fields.vaz, nu)
        _, qplus, qminus = energy_ops.substep3(
            phys, constants, g, sigma, energy, fields.vrad, fields.vaz, nu,
            tau_rr, tau_pp, tau_rp, div_v, h,
            self.ref_values.sigma0, self.ref_values.energy0,
            jnp.zeros_like(sigma), 0.0, 0.0)
        return StepAux(qplus=qplus, qminus=qminus)

    def apply_bcs(self, fields: FieldState) -> FieldState:
        """Standalone BC application (used once at init, reference
        src/init.cpp:337-341)."""
        omega_frame = jnp.asarray(self.phys.omega_frame, self.dtype)
        sigma, vrad, vaz, energy = self._apply_bcs(
            fields.sigma, fields.vrad, fields.vaz, fields.energy, omega_frame)
        return FieldState(sigma=sigma, vrad=vrad, vaz=vaz, energy=energy)


def make_ref_values(fields: FieldState) -> RefValues:
    return RefValues(sigma0=fields.sigma, energy0=fields.energy,
                     vrad0=fields.vrad, vaz0=fields.vaz)
