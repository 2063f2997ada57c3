"""Type-I migration torque of an embedded low-mass planet.

Port of reference test/planet_torque: a q = 2e-5 planet in a locally
isothermal alpha=1.5 disk; the disk torque on the planet must match the
Paardekooper et al. 2010 Lindblad-torque fit
Gamma/Gamma0 = -(2.5 + 1.7 beta - 0.1 alpha) (0.4/(b/h))^0.71
to within 20% (reference test/planet_torque/plot_torque.py:64-72).

Exercises: planet potential on gas (with planet-location smoothing
compatibility), disk-on-planet force, indirect terms, damping zones,
balanced v_az boundaries, TW artificial viscosity.
"""

import numpy as np
import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation

Q = 2e-5
H = 0.05
SIGMA_P = 3.76e-4
SIGMA_SLOPE = 1.5
FLARING = 0.0


def torque_config(nrad=256, naz=384, orbits=10):
    return Config.from_dict({
        "Sigma0": str(SIGMA_P), "SigmaSlope": str(SIGMA_SLOPE),
        "SigmaFloor": "1e-9",
        "AspectRatio": str(H), "FlaringIndex": str(FLARING),
        "ConstantViscosity": "0", "ViscousAlpha": "0",
        "ArtificialViscosity": "TW", "ArtificialViscosityDissipation": "No",
        "EquationOfState": "Isothermal",
        "ThicknessSmoothing": "0.4",
        "CompatibilitySmoothingPlanetLoc": "yes",
        "CompatibilityNoStarSmoothing": "yes",
        "InnerBoundary": "Reflecting", "OuterBoundary": "Reflecting",
        "InnerBoundaryVAzi": "Balanced", "OuterBoundaryVAzi": "Balanced",
        "Damping": "Yes", "DampingInnerLimit": "1.24",
        "DampingOuterLimit": "0.84",
        "DampingVRadialInner": "initial", "DampingVRadialOuter": "initial",
        "Transport": "FARGO", "Integrator": "Euler",
        "OmegaFrame": "0.0", "Frame": "F", "DiskFeedback": "no",
        "Rmin": "0.4", "Rmax": "2.5", "RadialSpacing": "Logarithmic",
        "Nrad": str(nrad), "Naz": str(naz),
        "CFL": "0.4", "CFLmaxVar": "1.1",
        "Nsnapshots": "1", "Nmonitor": "1",
        "MonitorTimestep": str(orbits * 2 * np.pi),
        "HydroFrameCenter": "primary",
        "nbody": [
            {"name": "star", "semi-major axis": "1.0", "mass": "1.0"},
            {"name": "planet", "semi-major axis": "1", "mass": str(Q)},
        ],
    })


@pytest.mark.slow
def test_type1_torque():
    """The reference gate (test/planet_torque/plot_torque.py:64-78)
    averages Gamma/Gamma0 over the LAST 10% of the run — the instantaneous
    torque oscillates by several percent with the planet's grid phase —
    and requires the average within 20% of the Paardekooper fit."""
    sim = Simulation(torque_config())
    st = sim.stepper
    state, time, last_dt = sim.state, 0.0, 1e-6
    state, time, last_dt, *_ = st.advance_to(state, time, last_dt,
                                             9 * 2 * np.pi)
    samples = []
    for k in range(10):
        t_target = (9 + (k + 1) / 10.0) * 2 * np.pi
        state, time, last_dt, *_ = st.advance_to(state, time, last_dt,
                                                 t_target)
        samples.append(float(st.disk_torques(state, float(time))[1]))
    torque = float(np.mean(samples))
    sim.state, sim.time = state, float(time)

    gamma0 = (Q / H) ** 2 * SIGMA_P   # a = Omega_p = 1
    beta = 1.0 - 2.0 * FLARING
    b_over_h = 0.4
    expected = -(2.5 + 1.7 * beta - 0.1 * SIGMA_SLOPE) \
        * (0.4 / b_over_h) ** 0.71

    ratio = (torque / gamma0) / expected
    assert abs(ratio - 1.0) < 0.2, \
        f"Gamma/Gamma0 = {torque / gamma0:.3f}, expected {expected:.3f}"

    # the planet stayed on its orbit (feedback off)
    el = sim.orbital_elements(1)
    assert np.isclose(el["a"], 1.0, rtol=1e-4)
