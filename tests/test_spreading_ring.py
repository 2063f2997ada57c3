"""Viscously spreading ring vs the Lynden-Bell & Pringle solution.

Port of reference test/spreading_ring (setup.yml + calc_deviation.py):
pressureless isothermal ring with constant kinematic viscosity, evolved
for 50 orbits; the azimuthally-averaged Sigma must match the analytic
self-similar solution to mean relative deviation < 0.007.
"""

import numpy as np

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation

from analytic import spreading_ring_sigma

NU = 4.77e-5


def ring_config() -> Config:
    return Config.from_dict({
        "Integrator": "Euler", "SpreadingRing": "Yes",
        "Sigma0": "8.83829e+05 g/cm2", "SetSigma0": "Yes", "DiskMass": "1.0",
        "SigmaFloor": "1.e-8", "AspectRatio": "0.0",
        "ConstantViscosity": str(NU),
        "ArtificialViscosity": "None",
        "ArtificialViscosityDissipation": "No",
        "EquationOfState": "Isothermal",
        "MinimumTemperature": "1e-9 K", "CFL": "0.5",
        "InitializeVradialZero": "Yes", "ThicknessSmoothing": "0.0",
        "Transport": "FARGO",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nrad": "256", "Naz": "2", "Rmin": "0.2", "Rmax": "1.8",
        "RadialSpacing": "Log",
        "Nsnapshots": "1", "Nmonitor": "1",
        "MonitorTimestep": "314.159265359",
    })


def test_spreading_ring():
    sim = Simulation(ring_config())
    # renormalized to exactly unit disk mass in the active domain
    mass0 = float(np.sum(np.asarray(sim.fields.sigma)[1:-1]
                         * sim.geometry.surf[1:-1, None]))
    assert abs(mass0 - 1.0) < 1e-12

    sim.run()
    assert sim.n_hydro_iter > 1000

    sigma = np.asarray(sim.fields.sigma).mean(1)
    theo = spreading_ring_sigma(sim.geometry.rmed, sim.time, NU)
    diff = np.abs(sigma / theo - 1.0)
    assert diff.mean() < 0.007, f"mean rel. deviation {diff.mean():.5f}"
