"""Ports of reference test-suite cases not covered elsewhere:
test/TemperatureTest (viscous-heating / simple-opacity radiative
equilibrium vs the D'Angelo analytic profile), test/planet_orbiting_disk
(massless planet in a live heavy disk with PlanetOrbitDiskTest, Euler vs
Leapfrog coupling), and test/cold_disk (a passive disk must not heat up
numerically)."""

import numpy as np
import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation


@pytest.mark.slow
def test_temperature_equilibrium():
    """reference test/TemperatureTest: an adiabatic disk with constant
    kinematic viscosity and the 'Simple' opacity (kappa = kappa0 T^2,
    tau_eff = 3/8 tau) relaxes to the D'Angelo et al. equilibrium
    T = sqrt(27/128 kappa0 nu / sigma_sb) * Sigma * Omega_K
    (test/TemperatureTest/check_results.py:25-35)."""
    cfg = Config.from_dict({
        "EquationOfState": "Ideal", "AdiabaticIndex": "1.4", "mu": "2.35",
        "Sigma0": "197 g/cm2", "SigmaSlope": "0.0",
        "AspectRatio": "0.03", "FlaringIndex": "0.5",
        "Temperature0": "352 K",
        "ConstantViscosity": "5.0e16 cm2/s", "ViscousAlpha": "0",
        "ArtificialViscosity": "NONE",
        "ArtificialViscosityDissipation": "No",
        "HeatingViscous": "Yes", "SurfaceCooling": "thermal",
        "Opacity": "Simple", "KappaConst": "17.770441374359926",
        "MinimumTemperature": "3 K", "MaximumTemperature": "1e7 K",
        "DensityFactor": "2.0", "TauFactor": "1.0",
        "InitializeVradialZero": "Yes",
        "Nrad": "100", "Naz": "2", "Rmin": "1.0", "Rmax": "20.0",
        "RadialSpacing": "Logarithmic",
        "InnerBoundary": "Reflecting", "OuterBoundary": "Reflecting",
        "Transport": "FARGO", "CFL": "0.5",
        "HeatingCoolingCFLlimit": "1000.0",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "300",
    })
    sim = Simulation(cfg)
    un, phys, c = sim.units, sim.phys, sim.constants
    rmed = np.asarray(sim.geometry.rmed)

    kappa_cgs, nu_cgs, sb_cgs = 2e-6, 5e16, 5.6704e-5
    omega_cgs = np.sqrt(6.674e-8 * 1.98892e33 / (rmed * un.length) ** 3)

    def t_theo_kelvin(sigma):
        return np.sqrt(27.0 / 128.0 * kappa_cgs * nu_cgs / sb_cgs) \
            * sigma[:, 0] * un.surface_density * omega_cgs

    state, t, dt, *_ = sim.stepper.advance_to(sim.state, 0.0, 1e-4, 300.0)
    cv = c.R / (phys.mu * (phys.adiabatic_index - 1.0))
    sig = np.asarray(state.fields.sigma)
    temp_kelvin = np.asarray(state.fields.energy) / (cv * sig) \
        * un.temperature
    ratio = temp_kelvin[:, 0] / t_theo_kelvin(sig)
    # middle of the disk (away from the reflecting edges): within 2%
    dev = np.abs(ratio[20:80] - 1.0).max()
    assert dev < 0.02, f"T/T_theo deviates by {dev:.3f}"


def _orbit_cfg(integrator):
    return Config.from_dict({
        "EquationOfState": "Isothermal", "AspectRatio": "0.05",
        "FlaringIndex": "0.0", "ViscousAlpha": "0.001",
        "SetSigma0": "Yes", "DiskMass": "0.1", "Sigma0": "100 g/cm2",
        "SigmaSlope": "1.0",
        "ArtificialViscosity": "SN",
        "Nrad": "28", "Naz": "56", "Rmin": "0.4", "Rmax": "2.5",
        "RadialSpacing": "Logarithmic",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Transport": "FARGO", "Integrator": integrator,
        "DiskFeedback": "Yes", "PlanetOrbitDiskTest": "yes",
        "OmegaFrame": "0.0", "Frame": "F",
        "HydroFrameCenter": "primary",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "62.8",
        "nbody": [
            {"name": "star", "semi-major axis": "0.0", "mass": "1.0"},
            {"name": "planet", "semi-major axis": "1.0", "mass": "1e-5"},
        ],
    })


@pytest.mark.slow
def test_planet_orbiting_disk():
    """reference test/planet_orbiting_disk: a (nearly) massless planet
    orbiting inside a live heavy disk with PlanetOrbitDiskTest (the
    primary feels no disk force). The orbit must stay circular at r=1
    under both hydro integrators, and Euler/Leapfrog trajectories must
    agree over a couple of orbits."""
    pos = {}
    for integ in ("Euler", "Leapfrog"):
        sim = Simulation(_orbit_cfg(integ))
        state, t, dt, *_ = sim.stepper.advance_to(
            sim.state, 0.0, 1e-4, 2 * 2 * np.pi)
        x, y = float(state.nbody.x[1]), float(state.nbody.y[1])
        r = np.hypot(x, y)
        assert abs(r - 1.0) < 5e-3, f"{integ}: planet radius drifted to {r}"
        pos[integ] = (x, y)
        # ten more orbits: still circular
        state, t, dt, *_ = sim.stepper.advance_to(
            state, t, dt, 12 * 2 * np.pi)
        r10 = np.hypot(float(state.nbody.x[1]), float(state.nbody.y[1]))
        assert abs(r10 - 1.0) < 1e-2, f"{integ}: r after 12 orbits {r10}"
    d = np.hypot(pos["Euler"][0] - pos["Leapfrog"][0],
                 pos["Euler"][1] - pos["Leapfrog"][1])
    assert d < 0.1, f"Euler vs Leapfrog positions diverged by {d:.3f}"


@pytest.mark.slow
def test_cold_disk_stays_cold():
    """reference test/cold_disk: a passive inviscid adiabatic disk (no
    heating, no cooling, no viscosity) must not heat up numerically —
    the azimuthally-averaged temperature profile stays within a few
    permille of the initial one over 5 orbits (reference bar: 10% over
    20 orbits, calc_deviation.py:30-34)."""
    cfg = Config.from_dict({
        "EquationOfState": "Ideal", "AdiabaticIndex": "1.4",
        "Sigma0": "0.005743125733951172", "SigmaSlope": "1.0",
        "SigmaFloor": "1e-7",
        "AspectRatio": "0.05", "FlaringIndex": "0.2857142857142857",
        "ViscousAlpha": "0.0", "ArtificialViscosity": "No",
        "ArtificialViscosityDissipation": "No", "HeatingViscous": "No",
        "Nrad": "64", "Naz": "128", "Rmin": "0.4", "Rmax": "2.5",
        "RadialSpacing": "Logarithmic",
        "InnerBoundary": "reflecting", "OuterBoundary": "reflecting",
        "Damping": "Yes", "DampingInnerLimit": "1.10",
        "DampingOuterLimit": "0.90",
        "Transport": "FARGO",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "31.4",
    })
    sim = Simulation(cfg)
    t_init = (np.asarray(sim.fields.energy)
              / np.asarray(sim.fields.sigma)).mean(axis=1)
    state, *_ = sim.stepper.advance_to(sim.state, 0.0, 1e-1, 31.4)
    t_end = (np.asarray(state.fields.energy)
             / np.asarray(state.fields.sigma)).mean(axis=1)
    dev = np.abs(t_end / t_init - 1.0).max()
    assert dev < 0.02, f"cold disk heated: max T deviation {dev:.4f}"
