"""Gravitational potential / acceleration of the N-body system on the gas.

Re-derivation of reference src/Pframeforce.cpp:21-211
(``CalculateNbodyPotential`` / ``CalculateAccelOnGas``) and the smoothing
rules of src/Force.cpp:124-159. Bodies are given as small per-planet arrays
(positions/masses), the loop over bodies is unrolled (N is tiny), and the
per-cell work is pure elementwise math the MXU/VPU chews through.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..params import Physics
from .common import Geom


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BodiesOnGrid:
    """Per-body state needed by the gas-side gravity ops.

    All fields are 1-D arrays of length N_bodies.
    """
    x: jax.Array
    y: jax.Array
    mass: jax.Array                 # ramped-up mass
    cubic_smoothing_radius: jax.Array  # dimensionless_roche * dist * cubic_factor


def single_star(dtype=jnp.float64, mass: float = 1.0) -> BodiesOnGrid:
    z = jnp.zeros((1,), dtype)
    return BodiesOnGrid(x=z, y=z, mass=jnp.full((1,), mass, dtype),
                        cubic_smoothing_radius=z)


def smoothing_length(phys: Physics, scale_height: jax.Array,
                     body_index: int) -> jax.Array:
    """epsilon * H per cell (reference src/Force.cpp:124-131); the
    planet-location compatibility variant is handled by the caller."""
    if phys.compatibility_no_star_smoothing and body_index == 0:
        return jnp.zeros_like(scale_height)
    return phys.thickness_smoothing * scale_height


def nbody_potential(phys: Physics, constants, g: Geom,
                    bodies: BodiesOnGrid, n_bodies: int,
                    cell_x: jax.Array, cell_y: jax.Array,
                    scale_height: jax.Array,
                    indirect_x, indirect_y) -> jax.Array:
    """POTENTIAL grid (reference src/Pframeforce.cpp:21-95).

    Phi = sum_k [ -G m_k / sqrt(d^2 + (eps H)^2) * klahr_factor ]
          - IndirectTerm . x_cell
    """
    pot = jnp.zeros_like(cell_x)
    for k in range(n_bodies):
        smooth = smoothing_length(phys, scale_height, k)
        dx = cell_x - bodies.x[k]
        dy = cell_y - bodies.y[k]
        d_sm = jnp.sqrt(dx * dx + dy * dy + smooth * smooth)
        r_sm = bodies.cubic_smoothing_radius[k]
        # Klahr & Kley 2005 cubic inner smoothing (src/Pframeforce.cpp:61-76)
        q = d_sm / jnp.where(r_sm > 0.0, r_sm, 1.0)
        klahr = jnp.where((r_sm > 0.0) & (d_sm < r_sm),
                          q ** 4 - 2.0 * q ** 3 + 2.0 * q, 1.0)
        pot = pot - constants.G * bodies.mass[k] / d_sm * klahr
    pot = pot - indirect_x * cell_x - indirect_y * cell_y
    return pot
