"""Stellar irradiation + surface cooling equilibrium.

Port of reference test/irradiation: a passive pseudo-1D disk heated only by
the central star (T* = 10^5 K, R* = 1 solRadius... scaled per D'Angelo &
Marzari 2012) and cooled by surface radiation must settle onto the
analytic irradiation-equilibrium temperature profile
T = T* sqrt(R*/r) ((1-eps) W_G)^{1/4}
to < 3% for 2 au < r < 15 au (reference test/irradiation/check_results.py).
"""

import numpy as np
import pytest

from fargocpt_tpu import units as u
from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation


def irradiation_config():
    return Config.from_dict({
        "Sigma0": "10 g/cm2", "SigmaSlope": "1.0", "SigmaFloor": "1e-7",
        "DensityFactor": "2.0",
        "AspectRatio": "0.03", "Temperature0": "352 K",
        "FlaringIndex": "0.3",
        "EquationOfState": "Ideal", "AdiabaticIndex": "1.4",
        "SurfaceCooling": "thermal",
        "HeatingViscous": "No",
        "MinimumTemperature": "3.0 K", "MaximumTemperature": "1.0e7 K",
        "Opacity": "Constant", "KappaConst": "2.0e-6",
        "HeatingCoolingCFLlimit": "1000.0",
        "mu": "2.35",
        "ConstantViscosity": "5.0e14 cm2/s",
        "ArtificialViscosity": "NONE",
        "ThicknessSmoothing": "0.0",
        "InnerBoundary": "Reflecting", "OuterBoundary": "Reflecting",
        "Transport": "FARGO",
        "Nrad": "200", "Naz": "2", "Rmin": "1.0", "Rmax": "100.0",
        "RadialSpacing": "Logarithmic",
        # shortened relaxation: equilibrium is reached locally on the
        # cooling timescale, a few hundred orbits suffice inside r < 20
        "Nsnapshots": "1", "Nmonitor": "4", "MonitorTimestep": "6.28e2",
        "nbody": [{
            "name": "DefaultStar", "semi-major axis": "0.0 au",
            "mass": "1.0", "radius": "1 solRadius",
            "temperature": "10000 K",
        }],
    })


@pytest.mark.slow
def test_irradiation_equilibrium_temperature():
    sim = Simulation(irradiation_config())
    assert sim.phys.heating_star     # derived from the body temperature
    sim.run()

    # numeric temperature (azimuthal mean)
    sigma = np.asarray(sim.fields.sigma).mean(1)
    energy = np.asarray(sim.fields.energy).mean(1)
    gamma, mu = 1.4, 2.35
    T_code = mu / sim.constants.R * (gamma - 1.0) * energy / sigma
    T_K = T_code * sim.units.temperature
    r = sim.geometry.rmed

    # analytic profile (reference check_results.py:30-50)
    m_H = 1.66054e-24
    k_B = 1.38065e-16
    l0 = sim.units.length
    rcgs = r * l0
    eta = 2.0 / 7.0
    eps = 0.5
    Rs_cgs = u.CGS_SOLRADIUS
    Ts = 10000.0 * sim.units.temperature  # config: 10000 K in code units -> K
    Ts = 10000.0
    G = u.CGS_G
    m0 = sim.units.mass
    htheo = (eta * (1 - eps) * (k_B * Ts / (mu * m_H)) ** 4
             * (Rs_cgs / (G * m0)) ** 4 * (rcgs / Rs_cgs) ** 2) ** (1 / 7)
    WG = 0.4 * (Rs_cgs / rcgs) + htheo * eta
    Ttheo = Ts * np.sqrt(Rs_cgs / rcgs) * ((1 - eps) * WG) ** 0.25

    mask = (r > 2) & (r < 15)
    rel = np.abs(T_K[mask] - Ttheo[mask]) / Ttheo[mask]
    assert rel.max() < 0.03, \
        f"max relative T deviation {rel.max():.4f} (threshold 0.03)"
