"""FLD radiative diffusion.

Port of reference test/FLD2D, in two layers:

1. Solver exactness: the red-black SOR solution of the 5-point implicit
   polar diffusion system matches a direct sparse solve to ~1e-12 (the
   reference offers this as the ``solve.py`` cross-check,
   test/FLD2D/readme.md:60-66 "down to machine precision").
2. Physics: constant-K Gaussian diffusion vs the analytic heat-kernel
   solution with the reference's threshold (integral |diff| < 4e-2,
   test/FLD2D/test_settings.yml) on a 300x600 grid (the resolution the
   threshold is calibrated for — the discretization error is purely
   spatial and scales as 1/N^2; at 100x150 it is ~9e-2 for any exact
   solver).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fargocpt_tpu import units as u
from fargocpt_tpu.constants import Constants
from fargocpt_tpu.grid import Geometry
from fargocpt_tpu.params import Physics, ADIABATIC
from fargocpt_tpu.ops.common import prepare_geom
from fargocpt_tpu.ops.fld import FLDSolver, FLDConfig

T0 = 1e-3
TFINAL = 2e-3
K = 1.0
OFFSET = 0.1
F0 = 1.0
X0 = 1.0


def make_solver(nrad, naz, omega=1.8):
    geom = Geometry.build(nrad, naz, 0.1, 10.0, "Arithmetic")
    phys = Physics(eos=ADIABATIC, adiabatic_index=1.4, mu=2.35,
                   minimum_temperature=0.0, maximum_temperature=1e300)
    solver = FLDSolver(phys, Constants.shock_tube(), u.shock_tube_units(),
                       geom, FLDConfig(tolerance=1e-15, max_iterations=20000,
                                       omega=omega), jnp.float64)
    g = prepare_geom(geom, jnp.float64)
    return geom, solver, g


def gaussian(geom, t):
    phic = (np.arange(geom.naz) + 0.5) * geom.dphi
    x = geom.rmed[:, None] * np.cos(phic)[None, :]
    y = geom.rmed[:, None] * np.sin(phic)[None, :]
    r2 = (x - X0) ** 2 + y ** 2
    return F0 / (4 * np.pi * K * t) * np.exp(-r2 / (4 * K * t)) + OFFSET


def constant_k_system(geom, solver, g, dt):
    ka = jnp.full((geom.nrad + 1, geom.naz), K, jnp.float64)
    kb = jnp.full((geom.nrad, geom.naz), K, jnp.float64)
    rho = jnp.ones((geom.nrad, geom.naz), jnp.float64)
    return solver.matrix_elements(g, rho, ka, kb, dt, test_2d=True)


def test_solver_matches_direct_inversion():
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    geom, solver, g = make_solver(48, 64)
    dt = 1e-4
    A, B, C, D, E = constant_k_system(geom, solver, g, dt)
    f0 = gaussian(geom, T0)

    fj, n_iter = solver.solve(jnp.asarray(f0), jnp.asarray(f0),
                              A, B, C, D, E)
    assert 1 < int(n_iter) < 20000

    # direct sparse solve of the identical system (ghost rows Dirichlet)
    An, Bn, Cn, Dn, En = [np.asarray(x) for x in (A, B, C, D, E)]
    NR, NAZ = geom.nrad, geom.naz
    idx = lambda i, j: i * NAZ + j
    rows, cols, vals = [], [], []
    for i in range(NR):
        for j in range(NAZ):
            if i == 0 or i == NR - 1:
                rows.append(idx(i, j)); cols.append(idx(i, j)); vals.append(1.0)
            else:
                rows += [idx(i, j)] * 5
                cols += [idx(i, j), idx(i - 1, j), idx(i + 1, j),
                         idx(i, (j - 1) % NAZ), idx(i, (j + 1) % NAZ)]
                vals += [Bn[i, j], An[i, j], Cn[i, j], Dn[i, j], En[i, j]]
    M = sp.csr_matrix((vals, (rows, cols)), shape=(NR * NAZ, NR * NAZ))
    exact = spla.spsolve(M, f0.flatten()).reshape(NR, NAZ)

    err = np.abs(np.asarray(fj) - exact).max()
    assert err < 1e-10, f"SOR deviates from direct inversion by {err:.3e}"


def test_check_interval_tolerance_equivalent():
    """RadiativeDiffusionCheckInterval > 1 (K double-sweeps per norm
    check) must be tolerance-equivalent: it can only run MORE sweeps
    than K = 1 (the convergence delta between checks is larger), so the
    K-batched solution is at least as converged and agrees with K = 1
    below the tolerance."""
    geom, solver, g = make_solver(48, 64)
    dt = 1e-4
    A, B, C, D, E = constant_k_system(geom, solver, g, dt)
    f0 = jnp.asarray(gaussian(geom, T0))

    f1, n1 = solver.solve(f0, f0, A, B, C, D, E)

    solver8 = FLDSolver(solver.phys, Constants.shock_tube(),
                        u.shock_tube_units(), geom,
                        FLDConfig(tolerance=1e-15, max_iterations=20000,
                                  omega=1.8, check_interval=8), jnp.float64)
    f8, n8 = solver8.solve(f0, f0, A, B, C, D, E)

    assert int(n8) >= int(n1), (int(n8), int(n1))
    assert int(n8) % 8 == 0
    err = float(jnp.max(jnp.abs(f8 - f1)))
    assert err < 1e-10, f"K=8 deviates from K=1 by {err:.3e}"


@pytest.mark.slow
def test_fld2d_gaussian_diffusion():
    geom, solver, g = make_solver(300, 600)
    nsteps = 10
    dt = (TFINAL - T0) / nsteps
    A, B, C, D, E = constant_k_system(geom, solver, g, dt)

    f = jnp.asarray(gaussian(geom, T0))
    for _ in range(nsteps):
        f, _n = solver.solve(f, f, A, B, C, D, E)

    ana = gaussian(geom, TFINAL)
    integral_absdiff = float(
        np.sum(np.abs(np.asarray(f) - ana) * geom.surf[:, None]))
    assert integral_absdiff < 4e-2, \
        f"integral |diff| = {integral_absdiff:.4e}"


def test_fld_full_path_spreads_hot_ring():
    """Full radiative_diffusion substep inside the jitted step: a heated
    ring must spread out."""
    from fargocpt_tpu.config import Config
    from fargocpt_tpu.sim import Simulation

    cfg = Config.from_dict({
        "EquationOfState": "Ideal", "AdiabaticIndex": "1.4",
        "AspectRatio": "0.05", "ViscousAlpha": "0.0",
        "ConstantViscosity": "1e-6",
        "Sigma0": "500 g/cm2", "SigmaSlope": "0.5",
        "HeatingViscous": "No",
        "RadiativeDiffusion": "Yes",
        "RadiativeDiffusionTolerance": "1e-13 K",
        "Opacity": "const", "KappaConst": "0.01",
        "MinimumTemperature": "1 K",
        "Nrad": "64", "Naz": "8", "Rmin": "0.4", "Rmax": "2.5",
        "InnerBoundary": "reflecting", "OuterBoundary": "reflecting",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.05",
    })
    sim = Simulation(cfg)
    e = np.asarray(sim.fields.energy).copy()
    e[30:34] *= 1.5
    sim.state = sim.state.replace(
        fields=sim.fields.replace(energy=jnp.asarray(e)))
    e_ring_before = e[30:34].sum() / e.sum()
    sim.run()
    e_after = np.asarray(sim.fields.energy)
    assert np.all(np.isfinite(e_after))
    e_ring_after = e_after[30:34].sum() / e_after.sum()
    assert e_ring_after < e_ring_before
