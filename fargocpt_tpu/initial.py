"""Initial conditions.

Re-derivation of reference src/init.cpp: power-law disk
(init_gas_density :937, init_gas_energy :1257, init_gas_velocities :1467),
spreading-ring test (:346-415), Sod shock-tube tests (:425-615), and the
disk-mass renormalization (:1150-1188).
Everything is built host-side in numpy float64 and cast to the run dtype.
"""

from __future__ import annotations

import numpy as np
from scipy.special import iv as bessel_iv

import jax.numpy as jnp

from . import theo
from .constants import Constants
from .grid import Geometry
from .params import Physics
from .state import FieldState


def _to_state(phys: Physics, sigma, vrad, vaz, energy) -> FieldState:
    dt = jnp.dtype(phys.dtype)
    return FieldState(sigma=jnp.asarray(sigma, dt),
                      vrad=jnp.asarray(vrad, dt),
                      vaz=jnp.asarray(vaz, dt),
                      energy=jnp.asarray(energy, dt))


def powerlaw_sigma(phys: Physics, geom: Geometry) -> np.ndarray:
    """Sigma = Sigma0 r^-slope with floor and optional profile cutoffs
    (reference src/init.cpp:937-1124)."""
    r = geom.rmed[:, None]
    sigma = phys.sigma0 * r ** (-phys.sigma_slope)
    if phys.profile_cutoff_outer:
        sigma = sigma * theo.cutoff_outer(phys.profile_cutoff_point_outer,
                                          phys.profile_cutoff_width_outer, r)
    if phys.profile_cutoff_inner:
        sigma = sigma * theo.cutoff_inner(phys.profile_cutoff_point_inner,
                                          phys.profile_cutoff_width_inner, r)
    floor = phys.sigma_floor * phys.sigma0
    sigma = np.maximum(sigma, floor)
    return np.broadcast_to(sigma, (geom.nrad, geom.naz)).copy()


def powerlaw_energy(phys: Physics, constants: Constants,
                    geom: Geometry, sigma: np.ndarray) -> np.ndarray:
    """reference src/init.cpp:1257-1302 with the temperature floor."""
    r = geom.rmed[:, None]
    energy = theo.initial_energy(phys, constants.G, r, phys.hydro_center_mass)
    e_floor = phys.minimum_temperature * sigma / phys.mu * constants.R \
        / (phys.adiabatic_index - 1.0)
    return np.maximum(np.broadcast_to(energy, sigma.shape), e_floor)


def spreading_ring_sigma(phys: Physics, geom: Geometry) -> np.ndarray:
    """Speith & Kley 2003 viscously spreading ring
    (reference src/init.cpp:352-415): Sigma(x) = M/(pi R0^2 tau0) x^-1/4
    I_{1/4}(2x/tau0) exp(-(1+x^2)/tau0), tau0 = 0.016."""
    R0 = 1.0
    tau0 = 0.016
    disk_mass = phys.sigma_diskmass
    x = geom.rmed / R0
    I = bessel_iv(0.25, 2.0 * x / tau0)
    sigma = disk_mass / (np.pi * R0 ** 2) / (tau0 * x ** 0.25) * I \
        * np.exp(-(1.0 + x ** 2) / tau0)
    sigma0_peak = _spreading_ring_sigma0(phys, geom)
    floor = sigma0_peak * phys.sigma_floor
    sigma = np.maximum(sigma, floor)
    return np.broadcast_to(sigma[:, None], (geom.nrad, geom.naz)).copy()


def _spreading_ring_sigma0(phys: Physics, geom: Geometry) -> float:
    """Sigma at the ring cell containing R0 (reference :361-380)."""
    R0 = 1.0
    tau0 = 0.016
    idx = np.nonzero((geom.rsup > R0) & (geom.rinf < R0))[0]
    r0 = geom.rmed[idx[0]] if idx.size else geom.rmed[0]
    x = r0 / R0
    I = bessel_iv(0.25, 2.0 * x / tau0)
    return phys.sigma_diskmass / (np.pi * R0 ** 2) / (tau0 * x ** 0.25) * I \
        * np.exp(-(1.0 + x ** 2) / tau0)


def gas_velocities(phys: Physics, constants: Constants,
                   geom: Geometry,
                   quad_moment: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """Axisymmetric velocity ICs (reference src/init.cpp:1467-1780,
    single-star primary-frame branch). ``quad_moment`` adds the binary
    quadrupole support term to v_az (reference src/Theo.cpp:183-205)."""
    G = constants.G
    M = phys.hydro_center_mass
    rb = geom.rmed
    ri = geom.rinf

    if phys.initialize_pure_keplerian:
        # NOTE reference uses Rmed even for v_rad rows (src/init.cpp:1611-1632)
        vaz_row = np.sqrt(G * M / rb)
        vr_row_on_rb = theo.initial_viscous_radial_speed(phys, G, rb, M)
        vaz = np.broadcast_to((vaz_row - phys.omega_frame * rb)[:, None],
                              (geom.nrad, geom.naz)).copy()
        vr_full = np.zeros((geom.nrad + 1, geom.naz))
        vr_full[:geom.nrad] = vr_row_on_rb[:, None]
        vr_full[geom.nrad] = vr_row_on_rb[geom.nrad - 1]
        return vr_full, vaz

    vaz_row = theo.initial_locally_isothermal_smoothed_v_az(phys, G, rb, M)
    if quad_moment > 0.0:
        # re-derive with the quadrupole support included
        from .ops import diskmodel as dm
        import jax.numpy as jnp
        vaz_row = np.asarray(dm.v_az_smoothed(
            phys, constants, jnp.asarray(rb), M, quad_moment))
    vaz_row = vaz_row - phys.omega_frame * rb
    vaz = np.broadcast_to(vaz_row[:, None], (geom.nrad, geom.naz)).copy()

    vr_full = np.zeros((geom.nrad + 1, geom.naz))
    if not phys.initialize_vradial_zero:
        vr_row = theo.initial_viscous_radial_speed(phys, G, ri, M)
        if phys.imposed_disk_drift != 0.0:
            # IMPOSEDDISKDRIFT term uses SigmaInf (reference :1760-1763);
            # axisymmetric power law: SigmaInf ~ sigma0 ri^-slope
            sigma_inf = phys.sigma0 * ri ** (-phys.sigma_slope)
            vr_row = vr_row + phys.imposed_disk_drift * phys.sigma0 \
                / sigma_inf / ri
        vr_full[:geom.nrad] = vr_row[:, None]
        vr_full[geom.nrad] = vr_row[geom.nrad - 1]
    return vr_full, vaz


def shock_tube_state(phys: Physics, geom: Geometry, pvte: bool = False) -> FieldState:
    """Sod shock tube (reference src/init.cpp:425-443 / :525-540).
    Left state (Sigma, E) = (1, 2.5); right (0.125, 0.25); the jump sits
    half a unit above the innermost cell center. Velocities zero."""
    r = geom.rmed
    right = (r - geom.rmed[0]) > 0.5
    if pvte:
        sig = np.where(right, 0.125, 1.0)
        en = np.where(right, 0.9110851732216827, 10.361627466581034)
    else:
        sig = np.where(right, 0.125, 1.0)
        en = np.where(right, 2.0 * 0.125, 2.5)
    sigma = np.broadcast_to(sig[:, None], (geom.nrad, geom.naz)).copy()
    energy = np.broadcast_to(en[:, None], (geom.nrad, geom.naz)).copy()
    vrad = np.zeros((geom.nrad + 1, geom.naz))
    vaz = np.zeros((geom.nrad, geom.naz))
    return _to_state(phys, sigma, vrad, vaz, energy)


def renormalize_sigma(phys: Physics, geom: Geometry, sigma: np.ndarray,
                      energy: np.ndarray) -> tuple[np.ndarray, np.ndarray, float]:
    """SetSigma0: rescale so active-domain mass equals DiskMass
    (reference src/init.cpp:1150-1188). Returns (sigma, energy, new_sigma0)."""
    surf = geom.surf[:, None]
    total = float(np.sum(sigma[1:-1] * surf[1:-1]))
    factor = phys.sigma_diskmass / total
    sigma = sigma * factor
    if phys.is_adiabatic:
        energy = energy * factor
    return sigma, energy, phys.sigma0 * factor


def build_initial_state(phys: Physics, constants: Constants,
                        geom: Geometry,
                        quad_moment: float = 0.0) -> tuple[FieldState, Physics]:
    """Full IC path (reference src/init.cpp:255-341 ``init_physics``).
    Returns the state and possibly-updated Physics (sigma0 renormalization).
    """
    if phys.shock_tube == 1:
        return shock_tube_state(phys, geom, pvte=False), phys
    if phys.shock_tube == 2:
        return shock_tube_state(phys, geom, pvte=True), phys

    if phys.spreading_ring:
        sigma = spreading_ring_sigma(phys, geom)
        energy = np.zeros_like(sigma)
    else:
        sigma = powerlaw_sigma(phys, geom)
        energy = powerlaw_energy(phys, constants, geom, sigma) \
            if phys.is_adiabatic else np.zeros_like(sigma)

    if phys.sigma_adjust:
        sigma, energy, new_sigma0 = renormalize_sigma(phys, geom, sigma, energy)
        phys = phys.with_(sigma0=new_sigma0)

    vrad, vaz = gas_velocities(phys, constants, geom, quad_moment)
    return _to_state(phys, sigma, vrad, vaz, energy), phys
