"""Sod shock-tube physics validation.

Port of reference test/shockTube: run the adiabatic Sod problem on a thin
annulus at r ~ 1000 (curvature-free) and compare the azimuthally-averaged
profiles against the exact Riemann solution with the reference's
integrated-|diff| thresholds (test/shockTube/check_results.py:17-23).
"""

import numpy as np
import pytest
from scipy import integrate

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation

from analytic import SodSolution

THRESHOLDS = {"vrad": 0.0153, "Sigma": 0.0073,
              "Temperature": 0.016, "energy": 0.014}


def shocktube_config(artvisc: str, integrator: str = "Euler") -> Config:
    return Config.from_dict({
        "Integrator": integrator, "ShockTube": "1",
        "Sigma0": "1.0", "SigmaFloor": "1.e-100",
        "AspectRatio": "1.0", "FlaringIndex": "0.5",
        "ConstantViscosity": "0.0", "ViscousAlpha": "0.0",
        "ArtificialViscosity": artvisc,
        "ArtificialViscosityDissipation": "Yes",
        "ArtificialViscosityFactor": "1.41",
        "EquationOfState": "Ideal", "AdiabaticIndex": "1.4",
        "HeatingViscous": "No",
        "MinimumTemperature": "1e-9 K", "MaximumTemperature": "1e100 K",
        "CFL": "0.5", "ThicknessSmoothing": "0.6",
        "Transport": "FARGO",
        "InnerBoundary": "Reflecting", "OuterBoundary": "Reflecting",
        "Disk": "YES", "OmegaFrame": "0.0", "Frame": "F",
        "Nrad": "100", "Naz": "2",
        "Rmin": "1000.0", "Rmax": "1001.0",
        "RadialSpacing": "Arithmetic",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.228",
    })


def run_and_check(artvisc: str, integrator: str = "Euler"):
    sim = Simulation(shocktube_config(artvisc, integrator))
    sim.run()
    assert abs(sim.time - 0.228) < 1e-12

    geom = sim.geometry
    sigma = np.asarray(sim.fields.sigma).mean(1)
    vrad = np.asarray(sim.fields.vrad).mean(1)
    energy = np.asarray(sim.fields.energy).mean(1)
    # same coordinates as the reference check: offsets from the inner
    # interface; v_rad interpolated to cell centers
    r1 = 0.5 * (geom.radii[1:] + geom.radii[:-1]) - geom.radii[0]
    vr_c = 0.5 * (vrad[1:] + vrad[:-1])

    # diaphragm: interface below the first right-state cell
    jump = np.argmax((geom.rmed - geom.rmed[0]) > 0.5)
    x0 = geom.radii[jump] - geom.radii[0]

    sod = SodSolution()
    mask = (r1 >= 0) & (r1 <= 1)
    x = r1[mask]
    rho_a, u_a, p_a = sod(x, 0.228, x0)
    gamma = 1.4
    results = {
        "vrad": (vr_c[mask], u_a),
        "Sigma": (sigma[mask], rho_a),
        "Temperature": ((gamma - 1) * energy[mask] / sigma[mask], p_a / rho_a),
        "energy": (energy[mask], p_a / (gamma - 1)),
    }
    for name, (num, ana) in results.items():
        diff = integrate.simpson(np.abs(num - ana), x=x)
        assert diff < THRESHOLDS[name], \
            f"{name}: integrated diff {diff:.5f} >= {THRESHOLDS[name]}"


def test_shocktube_sn_euler():
    run_and_check("SN")


def test_shocktube_tw_euler():
    run_and_check("TW")


def test_shocktube_sn_leapfrog():
    run_and_check("SN", "LeapFrog")


def test_shocktube_tw_leapfrog():
    run_and_check("TW", "LeapFrog")
