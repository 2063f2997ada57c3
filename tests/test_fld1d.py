"""Port of reference test/FLD1D: radiative-diffusion equilibrium profile.

A passive disk (``Disk: no`` — no hydro evolution at all) with constant
opacity evolves ONLY through the implicit FLD solver
(reference src/simulation.cpp:205-208 runs radiative diffusion outside
the calculate_disk gate), with the flux limiter pinned at its
optically-thick value 1/3 (``RadiativeDiffusionTest1D``,
src/fld.cpp:187-189).  Starting from T = T0/R the temperature must relax
toward the analytic steady state of the 1-D diffusion equation

    d/dR [ R K(T) dT/dR ] = 0,   K ~ rho^-1 T^3 ~ R^(3/2) T^4 / Sigma0

whose solution with the endpoint temperatures held at their initial
values is  T(R) = (c1 R^-2 + c2)^(2/9)
(reference test/FLD1D/calc_deviation.py:49-88, credit Alex Ziampras;
f1 = -2, f2 = 9/2).  The reference gate is a max deviation of 10 % over
rc < 9.5 after 20 orbits (calc_deviation.py:34-38).
"""

import numpy as np
import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation
from fargocpt_tpu import output as out


def fld1d_config(outdir: str) -> Config:
    # reference test/FLD1D/setup.yml (verbatim physics; output flags
    # reduced to the fields the check reads)
    return Config.from_dict({
        "Disk": "no",                      # hydro off: FLD-only evolution
        # bare number = CODE units, exactly as the reference setup reads
        # it (its "g/cm^2" is only a comment) — the diffusion coefficient
        # K ~ 1/rho is directly sensitive to this normalization
        "Sigma0": "7.570776897752835e-05",
        "SigmaSlope": "0.5", "SigmaFloor": "1e-7",
        "AspectRatio": "0.05", "FlaringIndex": "0",
        "ViscousAlpha": "0", "HeatingViscous": "no",
        "ArtificialViscosity": "TW",
        "EquationOfState": "Ideal", "AdiabaticIndex": "1.4",
        "mu": "2.35",
        "RadiativeDiffusion": "Yes",
        "RadiativeDiffusionOmega": "1.5",
        "RadiativeDiffusionAutoOmega": "No",
        "RadiativeDiffusionMaxIterations": "50000",
        "RadiativeDiffusionTest1D": "yes",
        "RadiativeDiffusionTolerance": "1e-15",
        "RadiativeDiffusionInnerBoundary": "zerogradient",
        "RadiativeDiffusionOuterBoundary": "zerogradient",
        "MinimumTemperature": "3 K", "MaximumTemperature": "1e100 K",
        "Opacity": "constant", "KappaConst": "0.1 cm2/g",
        "CFL": "0.5", "HeatingCoolingCFLlimit": "1.0",
        "l0": "1.0 au", "m0": "1.0 solMass",
        "ThicknessSmoothing": "0.6",
        "Transport": "FARGO", "Integrator": "Euler",
        "InnerBoundary": "reflecting", "OuterBoundary": "reflecting",
        "InnerBoundaryVazi": "keplerian", "OuterBoundaryVazi": "keplerian",
        "Damping": "No",
        "OmegaFrame": "0", "Frame": "F",
        "Nrad": "512", "Naz": "2",
        "Rmin": "0.2", "Rmax": "10.0", "RadialSpacing": "Logarithmic",
        "Nsnapshots": "20", "Nmonitor": "2",
        "MonitorTimestep": "3.14159265359",
        "FirstDT": "3.14159265359e-1", "CFLmaxVar": "1.1",
        "WriteDensity": "Yes", "WriteEnergy": "Yes",
        "WriteTemperature": "Yes", "WriteVelocity": "Yes",
        "OutputDir": outdir,
        "nbody": [{"name": "DefaultStar", "semi-major axis": "0.0 au",
                   "mass": "1.0", "eccentricity": "0.0",
                   "radius": "0.009304813 solRadius",
                   "temperature": "0 K"}],
    })


def theoretical_T(rc: np.ndarray, mu: float = 2.35,
                  h: float = 0.05) -> np.ndarray:
    """Steady-state T(R) in code units
    (reference test/FLD1D/calc_deviation.py:49-88)."""
    T0 = mu * h * h                 # initial T = T0 / R (flaring index 0)
    f1, f2 = -2.0, 9.0 / 2.0
    rmin, rmax = rc[0], rc[-1]
    R1, R2 = rmin ** f1, rmax ** f1
    T1, T2 = (T0 / rmin) ** f2, (T0 / rmax) ** f2
    c1 = (T2 - T1) / (R2 - R1)
    c2 = (R2 * T1 - R1 * T2) / (R2 - R1)
    return (c1 * rc ** f1 + c2) ** (1.0 / f2)


@pytest.mark.slow
def test_fld1d_equilibrium_profile(tmp_path):
    outdir = str(tmp_path / "out")
    sim = Simulation(fld1d_config(outdir), dtype="float64")
    out.OutputWriter(sim)

    rc = np.asarray(sim.geometry.rmed)[: sim.geometry.nrad]
    nr, na = sim.geometry.nrad, sim.geometry.naz

    sim.run()

    # the analytic endpoints assume the initial profile T = mu h^2 / R
    # in code units — pin that correspondence before trusting the gate
    T_init = np.fromfile(f"{outdir}/snapshots/0/Temperature.dat") \
        .reshape(nr, na).mean(axis=1)
    inner = slice(2, nr - 2)
    np.testing.assert_allclose(T_init[inner], 2.35 * 0.05 ** 2 / rc[inner],
                               rtol=1e-8)

    T = np.fromfile(f"{outdir}/snapshots/20/Temperature.dat") \
        .reshape(nr, na).mean(axis=1)
    theo = theoretical_T(rc)
    mask = rc < 9.5
    dev = np.max(np.abs(T[mask] / theo[mask] - 1.0))
    # reference gate: 10 % (calc_deviation.py:38)
    assert dev < 0.1, f"FLD1D equilibrium deviation {dev:.3e} >= 0.1"

    # the run must actually have stepped (20 snapshots x 2 monitors x
    # 10 constant dt steps)
    assert sim.n_hydro_iter == 400
