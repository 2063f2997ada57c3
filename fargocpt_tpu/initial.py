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
    """reference src/init.cpp:1257-1302 with the temperature floor, plus
    the profile-cutoff damping of the ENERGY field (init.cpp:1364-1443:
    the same outer/inner cutoff factors applied to Sigma are applied to
    the energy, re-flooring after each)."""
    r = geom.rmed[:, None]
    energy = theo.initial_energy(phys, constants.G, r, phys.hydro_center_mass)
    e_floor = phys.minimum_temperature * sigma / phys.mu * constants.R \
        / (phys.adiabatic_index - 1.0)
    energy = np.maximum(np.broadcast_to(energy, sigma.shape), e_floor)
    if phys.profile_cutoff_outer:
        fac = np.asarray(theo.cutoff_outer(phys.profile_cutoff_point_outer,
                                           phys.profile_cutoff_width_outer,
                                           r))
        energy = np.maximum(energy * fac, e_floor)
    if phys.profile_cutoff_inner:
        fac = np.asarray(theo.cutoff_inner(phys.profile_cutoff_point_inner,
                                           phys.profile_cutoff_width_inner,
                                           r))
        energy = np.maximum(energy * fac, e_floor)
    return energy


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
        # the reference's default branch uses the NUMERICAL viscous-speed
        # lookup evaluated on the actual initial profile incl. cutoffs
        # (src/init.cpp:1766 get_vr_with_numerical_viscous_speed) — for a
        # pure power law it reduces to the analytic -3 nu/r (1-S+2F), but
        # with profile cutoffs the drift reverses near the cutoff, and for
        # alpha = 0 it is zero (get_nu2 is alpha-only) even when a
        # constant kinematic viscosity is configured
        from .ops import diskmodel as dm
        import jax.numpy as jnp
        vr_row = np.asarray(dm.vr_numerical_viscous(
            phys, constants, jnp.asarray(ri), M, quad_moment))
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


# ---------------------------------------------------------------------------
# IC extensions: noise, file conditions, rings, secondary disk, balance
# ---------------------------------------------------------------------------

_GRAD2 = np.array([[1, 1], [-1, 1], [1, -1], [-1, -1],
                   [1, 0], [-1, 0], [0, 1], [0, -1]], np.float64)


def simplex_noise_2d(x: np.ndarray, y: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized 2-D simplex (Perlin 2001) gradient noise in [-1, 1].

    Fresh numpy implementation of the standard algorithm; it replaces the
    vendored open-simplex C port the reference uses for the RandomSigma
    density perturbations (src/open-simplex-noise.cpp via
    src/init.cpp:1015-1060). The statistical character (band-limited,
    smooth, zero-mean) matches; exact values differ by construction.
    """
    f2 = 0.5 * (np.sqrt(3.0) - 1.0)
    g2 = (3.0 - np.sqrt(3.0)) / 6.0
    rng = np.random.default_rng(seed)
    perm = np.tile(rng.permutation(256), 2)

    s = (x + y) * f2
    i = np.floor(x + s).astype(np.int64)
    j = np.floor(y + s).astype(np.int64)
    t = (i + j) * g2
    x0 = x - (i - t)
    y0 = y - (j - t)
    i1 = (x0 > y0).astype(np.int64)
    j1 = 1 - i1
    x1 = x0 - i1 + g2
    y1 = y0 - j1 + g2
    x2 = x0 - 1.0 + 2.0 * g2
    y2 = y0 - 1.0 + 2.0 * g2
    ii = i & 255
    jj = j & 255

    def corner(xs, ys, gi):
        tt = 0.5 - xs * xs - ys * ys
        tt = np.maximum(tt, 0.0)
        g = _GRAD2[gi % 8]
        return tt ** 4 * (g[..., 0] * xs + g[..., 1] * ys)

    n0 = corner(x0, y0, perm[ii + perm[jj]])
    n1 = corner(x1, y1, perm[ii + i1 + perm[jj + j1]])
    n2 = corner(x2, y2, perm[ii + 1 + perm[jj + 1]])
    return 70.0 * (n0 + n1 + n2)


def randomize_sigma(phys: Physics, geom: Geometry,
                    sigma: np.ndarray) -> np.ndarray:
    """Multiply Sigma by (1 + factor * noise) with an 11-octave simplex
    noise field over cartesian cell positions
    (reference src/init.cpp:1015-1060)."""
    x, y = geom.cell_centers_xy()
    f = phys.sigma_feature_size
    order = 11
    noise = np.zeros_like(x)
    for i in range(order):
        feature = float(1 << i)
        weight = float(1 << (order - i - 1))
        noise += weight * simplex_noise_2d(feature * x / f, feature * y / f,
                                           phys.random_seed + i)
    noise /= float((1 << order) - 1)
    return sigma * (1.0 + phys.sigma_random_factor * noise)


def read_1d_profile(path: str, radii: np.ndarray) -> np.ndarray:
    """Read a binary 1-D profile ([radius, value] or the written
    [radius, avg, min, max] layout) and cubic-spline it onto ``radii``
    (reference src/polargrid.cpp:360-470 ``read1D``)."""
    from scipy.interpolate import CubicSpline
    raw = np.fromfile(path, np.float64)
    ncol = 4 if raw.size % 4 == 0 else 2
    raw = raw.reshape(-1, ncol)
    spline = CubicSpline(raw[:, 0], raw[:, 1])
    return spline(radii)


def _com_distance(geom: Geometry, com_x: float, com_y: float,
                  radial: np.ndarray) -> np.ndarray:
    """Distance of each (radial-row, cell-center-azimuth) position from the
    N-body center of mass; ``radial`` is the per-row radius column."""
    phi = geom.phi[None, :]
    x = radial[:, None] * np.cos(phi) - com_x
    y = radial[:, None] * np.sin(phi) - com_y
    return np.hypot(x, y)


def nbody_centered_sigma(phys: Physics, geom: Geometry, com_x: float,
                         com_y: float) -> np.ndarray:
    """Sigma power law evaluated at the CMS distance (reference
    src/init.cpp:962-997): the base profile samples the CELL INTERFACE
    radius Rinf ("to more accurately initialize the mass flow rate",
    :981-983) times CenterProfileDensityCorrectionFactor, while the
    profile cutoffs (:1063-1147) re-evaluate the CMS distance at the
    cell CENTER radius, re-flooring after each."""
    r_inf = _com_distance(geom, com_x, com_y, geom.rinf)
    floor = phys.sigma_floor * phys.sigma0
    sigma = np.maximum(
        phys.sigma0 * r_inf ** (-phys.sigma_slope)
        * phys.center_mass_density_correction_factor, floor)
    r_med = _com_distance(geom, com_x, com_y, geom.rmed)
    if phys.profile_cutoff_outer:
        sigma = np.maximum(
            sigma * np.asarray(theo.cutoff_outer(
                phys.profile_cutoff_point_outer,
                phys.profile_cutoff_width_outer, r_med)), floor)
    if phys.profile_cutoff_inner:
        sigma = np.maximum(
            sigma * np.asarray(theo.cutoff_inner(
                phys.profile_cutoff_point_inner,
                phys.profile_cutoff_width_inner, r_med)), floor)
    return sigma


def nbody_centered_energy(phys: Physics, constants: Constants,
                          geom: Geometry, com_x: float, com_y: float,
                          com_mass: float, sigma: np.ndarray) -> np.ndarray:
    """Energy profile at the CELL CENTER CMS distance with the TOTAL
    N-body mass (reference src/init.cpp:1302-1348), temperature-floored
    against the (post-cutoff) Sigma, then cutoff-damped with re-flooring
    (:1363-1457)."""
    r_med = _com_distance(geom, com_x, com_y, geom.rmed)
    energy = np.asarray(theo.initial_energy(phys, constants.G, r_med,
                                            com_mass))
    e_floor = phys.minimum_temperature * sigma / phys.mu * constants.R \
        / (phys.adiabatic_index - 1.0)
    energy = np.maximum(energy, e_floor)
    if phys.profile_cutoff_outer:
        energy = np.maximum(
            energy * np.asarray(theo.cutoff_outer(
                phys.profile_cutoff_point_outer,
                phys.profile_cutoff_width_outer, r_med)), e_floor)
    if phys.profile_cutoff_inner:
        energy = np.maximum(
            energy * np.asarray(theo.cutoff_inner(
                phys.profile_cutoff_point_inner,
                phys.profile_cutoff_width_inner, r_med)), e_floor)
    return energy


def nbody_centered_velocities(phys: Physics, constants: Constants,
                              geom: Geometry, com: tuple, v_com: tuple,
                              com_mass: float, quad_moment: float,
                              dist_secondary: float):
    """Velocity ICs around the N-body center of mass (reference
    src/init.cpp:1467-1608, the Nbody_centered early-return branch):
    each cell gets the axisymmetric rotation/drift model of the TOTAL
    mass evaluated at its CMS distance, as a Cartesian vector in the CMS
    frame, shifted by the CMS velocity and projected back onto the
    primary-frame polar axes.  The quadrupole-supported v_az applies only
    outside twice the secondary's separation (:1514-1520)."""
    from .ops import diskmodel as dm
    import jax.numpy as _jnp
    G = constants.G

    def model(radial_rows: np.ndarray, phi_row: np.ndarray):
        x = radial_rows[:, None] * np.cos(phi_row)[None, :] - com[0]
        y = radial_rows[:, None] * np.sin(phi_row)[None, :] - com[1]
        r_com = np.hypot(x, y)
        if phys.initialize_pure_keplerian:
            vazi0 = np.sqrt(G * com_mass / r_com)
            vr0 = np.asarray(theo.initial_viscous_radial_speed(
                phys, G, r_com, com_mass))
        else:
            vazi0 = np.asarray(dm.v_az_smoothed(
                phys, constants, _jnp.asarray(r_com), com_mass))
            if quad_moment > 0.0 and phys.vaz_quadrupole_support:
                vazi_q = np.asarray(dm.v_az_smoothed(
                    phys, constants, _jnp.asarray(r_com), com_mass,
                    quad_moment))
                vazi0 = np.where(r_com > 2.0 * dist_secondary, vazi_q,
                                 vazi0)
            vr0 = np.asarray(dm.vr_numerical_viscous(
                phys, constants, _jnp.asarray(r_com), com_mass))
        if phys.initialize_vradial_zero:
            vr0 = np.zeros_like(r_com)
        vx = (vr0 * x - vazi0 * y) / r_com + v_com[0]
        vy = (vr0 * y + vazi0 * x) / r_com + v_com[1]
        return vx, vy

    # v_rad rows at the interface radii (row NR repeats Rinf[NR-1],
    # reference :1492-1496), cell-center azimuth
    phi_c = geom.phi
    ra = np.concatenate([geom.rinf, [geom.rinf[-1]]])
    vx, vy = model(ra, phi_c)
    vrad = vx * np.cos(phi_c)[None, :] + vy * np.sin(phi_c)[None, :]
    # v_az rows at the cell-center radii, azimuthal-interface azimuth
    phi_i = phi_c - 0.5 * geom.dphi
    vx, vy = model(geom.rmed, phi_i)
    vaz = (vy * np.cos(phi_i)[None, :] - vx * np.sin(phi_i)[None, :]
           - phys.omega_frame * geom.rmed[:, None])
    return vrad, vaz


def add_gaussian_rings(phys: Physics, constants: Constants, geom: Geometry,
                       sigma: np.ndarray, energy: np.ndarray,
                       com=None, com_mass=None):
    """Circumbinary Gaussian density/energy ring enhancement
    (reference src/init.cpp:889-958 + :1208-1256): asymmetric Gaussian with
    independent inner width and outer decay width/exponent."""
    if com is not None:
        x, y = geom.cell_centers_xy()
        r = np.hypot(x - com[0], y - com[1])
        mass = com_mass
    else:
        r = np.broadcast_to(geom.rmed[:, None], sigma.shape)
        mass = phys.hydro_center_mass
    r_ring = phys.cbd_ring_position
    fac = phys.cbd_ring_enhancement_factor
    w_in = phys.cbd_ring_width
    w_out = phys.cbd_decay_width
    p_out = phys.cbd_decay_exponent
    bump = np.where(
        r < r_ring,
        np.exp(-((r_ring - r) ** 2) / (2.0 * w_in ** 2)),
        np.exp(-(np.maximum(r - r_ring, 0.0) ** p_out)
               / (2.0 * w_out ** 2)))
    sigma_ring = phys.sigma0 * r ** (-phys.sigma_slope)
    sigma = sigma + sigma_ring * (fac - 1.0) * bump
    if phys.is_adiabatic:
        e_ring = np.asarray(theo.initial_energy(phys, constants.G, r, mass))
        energy = energy + e_ring * (fac - 1.0) * bump
    return sigma, energy


def apply_secondary_disk(phys: Physics, constants: Constants,
                         geom: Geometry, sigma, energy, vrad, vaz,
                         nbody: dict):
    """Add a disk around the secondary body inside its Roche lobe
    (reference src/init.cpp:624-888 init_secondary_disk_*)."""
    from .ops import diskmodel as dm
    import jax.numpy as _jnp
    px, py = float(nbody["x"][1]), float(nbody["y"][1])
    pvx, pvy = float(nbody["vx"][1]), float(nbody["vy"][1])
    pm = float(nbody["mass"][1])
    m0 = float(nbody["mass"][0])
    q = pm / m0
    dist = np.hypot(px, py)
    # Eggleton 1983 Roche-lobe radius (reference src/Theo.cpp:306-312)
    rl = 0.49 * q ** (2.0 / 3.0) / (0.6 * q ** (2.0 / 3.0)
                                    + np.log(1.0 + q ** (1.0 / 3.0)))
    compute_radius = rl * dist
    roche_dimless = rl
    disk_size = phys.profile_cutoff_point_outer * roche_dimless \
        / (1.0 - roche_dimless)
    cutoff_width = phys.profile_cutoff_width_outer * roche_dimless \
        / (1.0 - roche_dimless)
    scaling = np.sqrt(pm)
    min_dist = geom.rmin / 3.0

    x, y = geom.cell_centers_xy()
    r_sec = np.maximum(np.hypot(x - px, y - py), min_dist)
    inside = r_sec < compute_radius

    dens = phys.sigma0 * scaling * r_sec ** (-phys.sigma_slope) \
        * np.asarray(theo.cutoff_outer(disk_size, cutoff_width, r_sec))
    old = np.maximum(sigma, phys.sigma_floor * phys.sigma0)
    sigma = np.where(inside, np.maximum(dens, old), sigma)
    if phys.is_adiabatic:
        e_sec = np.asarray(theo.initial_energy(phys, constants.G, r_sec,
                                               pm)) * scaling \
            * np.asarray(theo.cutoff_outer(disk_size, cutoff_width, r_sec))
        e_floor = phys.minimum_temperature * sigma / phys.mu * constants.R \
            / (phys.adiabatic_index - 1.0)
        energy = np.where(inside, np.maximum(e_sec, e_floor), energy)

    def model_v(r_pos, phi):
        xx = r_pos * np.cos(phi)
        yy = r_pos * np.sin(phi)
        xs = xx - px
        ys = yy - py
        rs = np.maximum(np.hypot(xs, ys), min_dist)
        if phys.initialize_pure_keplerian:
            vazi0 = np.sqrt(constants.G * pm / rs)
            vr0 = np.asarray(theo.initial_viscous_radial_speed(
                phys, constants.G, rs, pm))
        else:
            vazi0 = np.asarray(dm.v_az_smoothed(phys, constants,
                                                _jnp.asarray(rs), pm))
            vr0 = np.asarray(dm.vr_numerical_viscous(phys, constants,
                                                     _jnp.asarray(rs), pm))
        if phys.initialize_vradial_zero:
            vr0 = np.zeros_like(rs)
        vx = (vr0 * xs - vazi0 * ys) / rs
        vy = (vr0 * ys + vazi0 * xs) / rs
        # NOTE: sign follows the reference exactly (src/init.cpp:819-821)
        return rs, vx - pvx, vy - pvy

    phi_c = geom.phi
    # v_rad at radial faces (phi = cell-center azimuth)
    ra = np.concatenate([geom.rinf, [geom.rinf[-1]]])
    rs, vx, vy = model_v(ra[:, None], phi_c[None, :])
    vr_model = (ra[:, None] * np.cos(phi_c)[None, :] * vx
                + ra[:, None] * np.sin(phi_c)[None, :] * vy) / ra[:, None]
    vrad = np.where(rs < compute_radius, vr_model, vrad)
    # v_az at azimuthal interfaces (phi - dphi/2)
    phi_i = phi_c - 0.5 * geom.dphi
    rs, vx, vy = model_v(geom.rmed[:, None], phi_i[None, :])
    va_model = (np.cos(phi_i)[None, :] * vy - np.sin(phi_i)[None, :] * vx)
    vaz = np.where(rs < compute_radius, va_model, vaz)
    return sigma, energy, vrad, vaz


def _construct_sequence(u0: float, v: np.ndarray) -> tuple[np.ndarray, float]:
    """reference src/Pframeforce.cpp:295-306 ``ConstructSequence``."""
    n = v.size
    u = np.empty(n)
    u[0] = u0
    for i in range(1, n):
        u[i] = 2.0 * v[i] - u[i - 1]
    lapl = np.abs(u[2:] + u[:-2] - 2.0 * u[1:-1]).sum()
    return u, lapl


def centrifugal_balance_vaz(phys: Physics, constants: Constants,
                            geom: Geometry, sigma: np.ndarray,
                            energy: np.ndarray) -> np.ndarray:
    """Exact centrifugal-balance v_az(r) from the numerically integrated
    axisymmetric pressure gradient (reference src/init.cpp:1638-1717 +
    the ConstructSequence shooting for the staggered average)."""
    from .ops import eos
    nr = geom.nrad
    sig1d = sigma.mean(axis=1)
    if phys.is_adiabatic:
        press1d = (phys.adiabatic_index - 1.0) * energy.mean(axis=1)
    else:
        cs = phys.aspectratio_ref * geom.rmed ** phys.flaring_index \
            * np.sqrt(constants.G * phys.hydro_center_mass / geom.rmed)
        press1d = sig1d * cs ** 2
    GM = constants.G * phys.hydro_center_mass
    rmed = geom.rmed
    radii = geom.rinf                                  # interface radii
    vt_int = np.zeros(nr)
    vt_int[1:] = (press1d[1:] - press1d[:-1]) \
        / (0.5 * (sig1d[1:] + sig1d[:-1])) / (rmed[1:] - rmed[:-1]) \
        + GM * (1.0 / rmed[:-1] - 1.0 / rmed[1:]) / (rmed[1:] - rmed[:-1])
    vt_int[1:] = np.sqrt(vt_int[1:] * radii[1:]) \
        - radii[1:] * phys.omega_frame
    # shooting for the cell-centered sequence (reference :1709-1717)
    t1 = vt_int[1] + 0.75 * (vt_int[1] - vt_int[2])
    _, r1 = _construct_sequence(t1, vt_int)
    t2 = t1 + 0.25 * (vt_int[1] - vt_int[2])
    _, r2 = _construct_sequence(t2, vt_int)
    t1 = t1 - r1 / (r2 - r1) * (t2 - t1)
    vt_cent, _ = _construct_sequence(t1, vt_int)
    # row 0: Keplerian extrapolation (reference :1748-1755)
    vk0 = rmed[0] * np.sqrt(GM / rmed[0] ** 3)
    vk1 = rmed[1] * np.sqrt(GM / rmed[1] ** 3)
    out = vt_cent.copy()
    out[0] = vt_cent[1] * vk0 / vk1
    return np.broadcast_to(out[:, None], (nr, geom.naz)).copy()


def build_initial_state(phys: Physics, constants: Constants,
                        geom: Geometry, quad_moment: float = 0.0,
                        nbody: dict | None = None) -> tuple[FieldState, Physics]:
    """Full IC path (reference src/init.cpp:255-341 ``init_physics``).
    Returns the state and possibly-updated Physics (sigma0 renormalization).
    ``nbody`` (dict of x/y/vx/vy/mass arrays) enables the N-body-centered,
    secondary-disk and ring options.
    """
    if phys.shock_tube in (1, 2):
        st = shock_tube_state(phys, geom, pvte=phys.shock_tube == 2)
        # the reference initializes the gas VELOCITIES through the
        # standard path even for shock tubes (src/init.cpp:330-331
        # init_gas_velocities runs unconditionally after the shock-tube
        # density/energy init) — vaz carries the pressure-supported
        # near-Keplerian profile, vrad the configured radial profile
        vrad, vaz = gas_velocities(phys, constants, geom, quad_moment)
        import dataclasses as _dc
        dt_ = st.sigma.dtype
        st = _dc.replace(st, vrad=jnp.asarray(vrad, dt_),
                         vaz=jnp.asarray(vaz, dt_))
        return st, phys

    com = None
    com_mass = phys.hydro_center_mass
    if nbody is not None:
        m = np.asarray(nbody["mass"])
        com_mass = float(m.sum())
        com = (float((m * np.asarray(nbody["x"])).sum() / m.sum()),
               float((m * np.asarray(nbody["y"])).sum() / m.sum()))

    if phys.spreading_ring:
        sigma = spreading_ring_sigma(phys, geom)
        energy = np.zeros_like(sigma)
    else:
        # Sigma (reference src/init.cpp:937-1010 init_gas_density)
        if phys.sigma_condition == "1d" and phys.sigma_filename:
            sigma1d = read_1d_profile(phys.sigma_filename, geom.rmed)
            sigma = np.broadcast_to(sigma1d[:, None],
                                    (geom.nrad, geom.naz)).copy()
        elif phys.sigma_condition == "2d" and phys.sigma_filename:
            sigma = np.fromfile(phys.sigma_filename,
                                np.float64).reshape(geom.nrad, geom.naz)
        elif phys.sigma_condition == "nbody" and com is not None:
            sigma = nbody_centered_sigma(phys, geom, com[0], com[1])
        else:
            sigma = powerlaw_sigma(phys, geom)

        # energy (reference src/init.cpp:1257-1302 init_gas_energy)
        if not phys.is_adiabatic:
            energy = np.zeros_like(sigma)
        elif phys.energy_condition == "1d" and phys.energy_filename:
            e1d = read_1d_profile(phys.energy_filename, geom.rmed)
            energy = np.broadcast_to(e1d[:, None],
                                     (geom.nrad, geom.naz)).copy()
        elif phys.energy_condition == "2d" and phys.energy_filename:
            energy = np.fromfile(phys.energy_filename,
                                 np.float64).reshape(geom.nrad, geom.naz)
        elif phys.energy_condition == "nbody" and com is not None:
            energy = nbody_centered_energy(phys, constants, geom,
                                           com[0], com[1], com_mass, sigma)
        else:
            energy = powerlaw_energy(phys, constants, geom, sigma)

    if phys.sigma_randomize:
        sigma = randomize_sigma(phys, geom, sigma)

    if phys.sigma_adjust:
        sigma, energy, new_sigma0 = renormalize_sigma(phys, geom, sigma, energy)
        phys = phys.with_(sigma0=new_sigma0)

    if phys.cbd_ring:
        ring_com = com if phys.sigma_condition == "nbody" else None
        sigma, energy = add_gaussian_rings(phys, constants, geom, sigma,
                                           energy, ring_com, com_mass)

    if phys.sigma_condition == "nbody" and nbody is not None:
        # CMS-centered velocity field; the reference's nbody branch
        # returns early, so centrifugal balance never applies here
        # (src/init.cpp:1473-1609)
        m = np.asarray(nbody["mass"])
        v_com = (float((m * np.asarray(nbody["vx"])).sum() / m.sum()),
                 float((m * np.asarray(nbody["vy"])).sum() / m.sum()))
        dist_sec = 0.0
        if m.size > 1:
            dist_sec = float(np.hypot(
                np.asarray(nbody["x"])[1] - np.asarray(nbody["x"])[0],
                np.asarray(nbody["y"])[1] - np.asarray(nbody["y"])[0]))
        vrad, vaz = nbody_centered_velocities(
            phys, constants, geom, com, v_com, com_mass, quad_moment,
            dist_sec)
    else:
        vrad, vaz = gas_velocities(phys, constants, geom, quad_moment)
        if phys.centrifugal_balance:
            vaz = centrifugal_balance_vaz(phys, constants, geom, sigma,
                                          energy)
    if phys.secondary_disk and nbody is not None:
        sigma, energy, vrad, vaz = apply_secondary_disk(
            phys, constants, geom, sigma, energy, vrad, vaz, nbody)
    return _to_state(phys, sigma, vrad, vaz, energy), phys
