"""CFL time-step condition.

Re-derivation of reference src/cfl.cpp:185-382 ``condition_cfl``: per-cell
inverse-dt terms (sound speed, radial motion, residual azimuthal motion,
artificial viscosity, viscous diffusion, heating/cooling) combined as
CFL / sqrt(sum invdt_i^2), plus the FARGO shear limit (Masset 2000
Sect. 3.3). The global min is one reduction; under a radial mesh it
becomes a ``pmin``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import Physics, ARTVISC_SN, LEAPFROG
from .common import Geom, azim_next


def condition_cfl(phys: Physics, g: Geom, sigma, vrad, vaz, energy, cs, nu,
                  qplus, qminus) -> jax.Array:
    """Returns the (local-domain) CFL dt as a 0-d array."""
    nr = g.nrad

    vmean = jnp.mean(vaz, axis=-1, keepdims=True)            # (NR,1)

    # FARGO shear limit between rings i, i+1 for i = 0..NR-2
    omega_row = vmean * g.inv_rb
    denom = jnp.abs(omega_row[:-1] - omega_row[1:]) + 1e-100
    shear_dt = phys.cfl * g.dphi / denom                     # (NR-1,1)
    # reference seeds with rings (0,1) then scans i in [1, NR-2)
    dt_shear = jnp.min(shear_dt[:nr - 2])

    lf = 0.6 if phys.hydro_integrator == LEAPFROG else 1.0

    dxrad = g.rsup - g.rinf                                  # (NR,1)
    dxaz = g.rb * g.dphi
    cell_size = jnp.minimum(dxrad, dxaz)

    if phys.fast_transport:
        vres = vaz - vmean
    else:
        vres = vaz

    invdt1 = cs / cell_size
    invdt2 = vrad[:-1] / dxrad
    invdt3 = vres / dxaz

    dv_r = vrad[1:] - vrad[:-1]
    dv_phi = azim_next(vaz) - vaz
    C2 = phys.artificial_viscosity_factor ** 2
    if phys.artificial_viscosity == ARTVISC_SN:
        invdt4 = 4.0 * C2 * jnp.maximum(
            jnp.maximum(-dv_r, 0.0) / dxrad,
            jnp.maximum(-dv_phi, 0.0) / dxaz) * lf
    else:
        # TW (also used when artificial viscosity is off,
        # reference src/cfl.cpp:292-301)
        eps_rr = dv_r * g.inv_diff_rsup
        eps_pp = g.inv_rb * (dv_phi * g.invdphi
                             + 0.5 * (vrad[1:] + vrad[:-1]))
        mdiv = -jnp.minimum(eps_rr + eps_pp, 0.0)
        invdt4 = 4.0 * C2 * mdiv * lf

    invdt5 = 4.0 * nu / cell_size ** 2 * lf

    if phys.is_adiabatic:
        inv_limit = 1.0 / phys.heating_cooling_cfl_limit
        invdt6 = inv_limit * jnp.abs((qplus - qminus) / energy) * lf
    else:
        invdt6 = jnp.zeros_like(invdt1)

    inv_sq = invdt1 ** 2 + invdt2 ** 2 + invdt3 ** 2 + invdt4 ** 2 \
        + invdt5 ** 2 + invdt6 ** 2
    dt_cell = phys.cfl / jnp.sqrt(inv_sq)

    if phys.stabilize_viscosity == 2:
        # viscosity stability limit dt < -CFL / c (reference
        # src/cfl.cpp:330-350)
        from .viscosity import viscosity_correction_factors
        c_phi, c_r = viscosity_correction_factors(phys, g, sigma, nu)
        c = jnp.minimum(c_phi, c_r)                  # both negative
        dt_stable = jnp.where(c != 0.0, -phys.cfl / c,
                              jnp.finfo(dt_cell.dtype).max)
        dt_cell = jnp.minimum(dt_cell, dt_stable)

    # active rings only: rows 1..NR-2 (reference src/cfl.cpp:211-212)
    dt_min = jnp.min(dt_cell[1:nr - 1])
    return jnp.minimum(dt_shear, dt_min)
