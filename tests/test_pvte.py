"""PVTE variable-gamma equation of state.

Validates the hydrogen micro-physics against known limits (reference
src/pvte_law.cpp / Vaidya et al. 2015):
  * cold molecular gas: rotation frozen out, gamma -> 5/3
  * warm molecular gas (rotation active): gamma ~ 7/5
  * fully ionized gas: gamma -> 5/3, mu -> ~0.6
and runs the PVTE Sod shock tube (reference test/shockTube_PVTE) end to
end: with the variable gamma the shock is slower and denser than the
gamma = 1.4 ideal-gas run (the dissociation/ionization energy sinks soften
the EoS), matching the qualitative PLUTO comparison the reference ships.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fargocpt_tpu.ops import pvte
from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation

XMF = 0.75


def tabs():
    lo, w, coeffs = pvte.funcdum_poly()
    return (lo, w, jnp.asarray(coeffs))


def gamma_at(rho, T):
    _x, _y, mu, _eps, gam = pvte._gamma_mu_at(
        jnp.asarray(rho), jnp.asarray(T), XMF, tabs())
    return float(gam), float(mu)


def test_funcdum_fit_matches_reference_table():
    """The gather-free piecewise-Chebyshev funcdum (TPU production path)
    must agree with the reference's 5000-entry table (src/pvte_law.cpp
    :305-369 + :77-101 interpolation) to the table's own interpolation
    error (~5e-6 rel), across the full ln T range and at off-node
    points."""
    lnT_t, fd_t = pvte.zeta_table()
    # on-node: fit error only
    T_nodes = np.exp(lnT_t[: pvte.N_ZETA - 2 : 17])
    fit = np.asarray(pvte.func_dum(tabs(), jnp.asarray(T_nodes)))
    ref = fd_t[: pvte.N_ZETA - 2 : 17]
    np.testing.assert_allclose(fit, ref, rtol=2e-6)
    # off-node midpoints: fit-vs-linear-interp, bounded by interp error
    lnT_m = 0.5 * (lnT_t[:-1] + lnT_t[1:])[: pvte.N_ZETA - 2 : 17]
    fd_m = 0.5 * (fd_t[:-1] + fd_t[1:])[: pvte.N_ZETA - 2 : 17]
    fit_m = np.asarray(pvte.func_dum(tabs(), jnp.asarray(np.exp(lnT_m))))
    np.testing.assert_allclose(fit_m, fd_m, rtol=2e-5)
    # clipping beyond the table range matches the reference's clamp
    hi = float(np.asarray(pvte.func_dum(tabs(), jnp.asarray([1e14])))[0])
    hi_edge = float(np.asarray(pvte.func_dum(
        tabs(), jnp.asarray([np.exp(lnT_t[pvte.N_ZETA - 2])])))[0])
    assert abs(hi - hi_edge) < 1e-12


def test_gamma_limits():
    # cold molecular hydrogen (rotation frozen): monatomic-like 5/3
    gam, mu = gamma_at(1e-12, 30.0)
    assert 1.6 < gam < 1.7
    assert 2.2 < mu < 2.4   # H2 + He

    # warm molecular hydrogen (rotation active): diatomic 7/5
    gam, mu = gamma_at(1e-12, 1000.0)
    assert 1.35 < gam < 1.45

    # fully ionized: monatomic with mu ~ 0.6
    gam, mu = gamma_at(1e-18, 1e6)
    assert 1.6 < gam < 1.7
    assert 0.5 < mu < 0.7

    # dissociation region: gamma dips well below 7/5
    gam, mu = gamma_at(1e-9, 2500.0)
    assert gam < 1.3


def test_temperature_energy_roundtrip():
    rng = np.random.default_rng(3)
    rho = jnp.asarray(10.0 ** rng.uniform(-20, -5, 64))
    T = jnp.asarray(10.0 ** rng.uniform(0.5, 6.5, 64))
    R = pvte.CGS_KB / pvte.CGS_MP
    x, y, mu, eps, gam = pvte._gamma_mu_at(rho, T, XMF, tabs())
    # specific internal energy consistent with gamma_eff definition:
    # e = R T / (mu (gamma - 1))
    e = R * T / (mu * (gam - 1.0))
    T_back = pvte.temperature_from_energy(e, rho, XMF, tabs())
    np.testing.assert_allclose(np.asarray(T_back), np.asarray(T), rtol=1e-6)


def test_temperature_energy_roundtrip_f32():
    """Pin the f32 production solver path (the 13+4 bisection+Illinois
    hybrid — f64 inputs take the bisection branch and would leave the
    hybrid untested). Advisor-measured worst case over the full table
    domain is ~1e-5 relative; gate the round-trip at 5e-5."""
    rng = np.random.default_rng(7)
    rho = jnp.asarray(10.0 ** rng.uniform(-20, -5, 512), jnp.float32)
    T = jnp.asarray(10.0 ** rng.uniform(0.5, 6.5, 512), jnp.float32)
    R = pvte.CGS_KB / pvte.CGS_MP
    tb = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tabs())
    x, y, mu, eps, gam = pvte._gamma_mu_at(rho, T, XMF, tb)
    e = jnp.asarray(R * T / (mu * (gam - 1.0)), jnp.float32)
    T_back = pvte.temperature_from_energy(e, rho, XMF, tb)
    assert T_back.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(T_back), np.asarray(T), rtol=5e-5)


def test_temperature_hybrid_zero_energy_no_nan():
    """An underflowed cell (e <= 0) must not poison the grid with NaN:
    ln(0) = -inf used to make the Illinois secant compute inf - inf. The
    clamped solver degrades to the 1 K bracket edge like the bisection."""
    rho = jnp.asarray([1e-12, 1e-12, 1e-12], jnp.float32)
    e = jnp.asarray([0.0, -1.0, 1e10], jnp.float32)
    tb = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tabs())
    T = pvte.temperature_from_energy(e, rho, XMF, tb)
    T = np.asarray(T)
    assert np.all(np.isfinite(T)), T
    # degenerate cells land at (or within bracket-clip of) the 1 K edge
    assert T[0] < 2.0 and T[1] < 2.0
    assert T[2] > 1e2  # the healthy cell still solves normally


def pvte_shock_config(eos):
    return Config.from_dict({
        "Integrator": "Euler", "ShockTube": "2",
        "Sigma0": "1.0", "SigmaFloor": "1.e-100",
        "AspectRatio": "1.0", "FlaringIndex": "0.5",
        "ConstantViscosity": "0.0",
        "ArtificialViscosity": "SN",
        "ArtificialViscosityDissipation": "Yes",
        "EquationOfState": eos, "AdiabaticIndex": "1.4",
        "HydrogenMassFraction": "0.75",
        "HeatingViscous": "No",
        "MinimumTemperature": "1e-9 K", "MaximumTemperature": "1e100 K",
        "CFL": "0.5", "ThicknessSmoothing": "0.6",
        "Transport": "FARGO",
        "InnerBoundary": "Reflecting", "OuterBoundary": "Reflecting",
        "Nrad": "500", "Naz": "2",
        "Rmin": "1000.0", "Rmax": "1001.0",
        "RadialSpacing": "Arithmetic",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.228",
    })


@pytest.mark.slow
def test_pvte_shock_tube():
    sim = Simulation(pvte_shock_config("PVTE"))
    assert sim.phys.variable_gamma
    sig0 = np.asarray(sim.fields.sigma).mean(1)
    mass0 = float((sig0[1:-1] * sim.geometry.surf[1:-1]).sum())
    sim.run()
    sig = np.asarray(sim.fields.sigma).mean(1)
    geom = sim.geometry
    r1 = geom.rmed - geom.radii[0]

    assert np.all(np.isfinite(sig)) and np.all(sig > 0)
    # left state still intact near the wall, right state still 0.125
    assert abs(sig[5] - 1.0) < 0.02
    assert abs(sig[-5] - 0.125) < 0.01
    # a shock has formed and sits inside the domain: post-shock plateau
    # between the contact (~0.38) and the undisturbed right state
    mid = sig[(r1 > 0.65) & (r1 < 0.8)]
    assert mid.size and np.all(mid > 0.2) and np.all(mid < 0.6)
    # reflecting walls: mass conserved
    mass1 = float((sig[1:-1] * geom.surf[1:-1]).sum())
    assert abs(mass1 / mass0 - 1.0) < 1e-10


def test_lookup_table_mode_matches_bisection():
    """PVTELookupTable mode (reference-exact 1000x1000 table quantization,
    src/pvte_law.cpp:370-440) must agree with the in-graph bisection to
    the table's own interpolation error, and the lookup conventions must
    be the reference's: log-space cell index, LINEAR unclamped weights."""
    tables = tuple(jnp.asarray(t) for t in pvte.lookup_tables(XMF))
    rng = np.random.default_rng(7)
    rho = jnp.asarray(10.0 ** rng.uniform(-18, -5, 512))
    e = jnp.asarray(10.0 ** rng.uniform(9, 14, 512))
    geff_l, mu_l, g1_l = pvte.lookup_gamma_mu(rho, e, tables)

    T = pvte.temperature_from_energy(e, rho, XMF, tabs())
    _x, _y, mu_b, _eps, geff_b = pvte._gamma_mu_at(rho, T, XMF, tabs())
    g1_b = pvte.gamma1_at(rho, T, XMF, tabs())

    def rel(a, b):
        return float(jnp.max(jnp.abs(a - b) / jnp.abs(b)))

    assert rel(geff_l, geff_b) < 2e-3
    assert rel(mu_l, mu_b) < 2e-3
    assert rel(g1_l, g1_b) < 1e-1    # g1 is steep across ionization edges

    # exactly on table nodes the lookup must reproduce the node values
    rho_t, e_t, mu_t, geff_t, g1_t = tables
    ii = jnp.asarray([5, 100, 500, 900])
    jj = jnp.asarray([7, 200, 600, 950])
    geff_n, mu_n, g1_n = pvte.lookup_gamma_mu(rho_t[ii], e_t[jj], tables)
    np.testing.assert_allclose(np.asarray(geff_n),
                               np.asarray(geff_t[ii, jj]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(mu_n),
                               np.asarray(mu_t[ii, jj]), rtol=1e-12)

    # out-of-table points clamp the cell index and extrapolate linearly
    # (reference src/pvte_law.cpp:411-422 clamps i/j, not x/y)
    g_lo, _, _ = pvte.lookup_gamma_mu(jnp.asarray([1e-30]),
                                      jnp.asarray([1e7]), tables)
    assert np.isfinite(float(g_lo[0]))
