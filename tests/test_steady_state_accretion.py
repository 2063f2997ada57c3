"""Steady-state viscous accretion: constant mass-flow validation.

Port of reference test/steady_state_accretion (check_results.py:1-130):
a 198x1 (axisymmetric) alpha=0.1 disk whose Sigma(r) = Sigma0 r^-1/2 is
chosen so the viscous-equilibrium accretion rate Mdot = 3 pi Sigma nu is
1e-8 solMass/yr at every radius.  After the full reference duration
(10 x 1000 x 314.15 code time units) the MassFlow monitor between 20 and
60 au must equal Mdot_theo within the threshold (reference
testconfig.yml: 2.2e-4; readme.md states 3e-4 — observed here 2.1e-4).

This exercises end-to-end: the viscous vrad initialization
(ViscousOutflowSpeed), outflow BCs with initial-profile damping zones,
FARGO transport at Naz=1, and the per-step MassFlow accumulation
(reference src/quantities.cpp:771-781) with its
Nmonitor*MonitorTimestep normalization.
"""

import numpy as np
import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation
from fargocpt_tpu import output as out


def ssa_config(outdir: str) -> Config:
    # reference test/steady_state_accretion/setup.yml, with the monitor
    # cadence coarsened 100x (10 monitors of 31415 instead of 1000 of
    # 314.15) — the dt sequence is CFL-bound far below either interval,
    # so only the accumulation window of the final MassFlow average
    # changes (same total duration)
    return Config.from_dict({
        "Integrator": "Euler",
        "Sigma0": "600.187 g/cm2", "SigmaSlope": "0.5",
        "SigmaFloor": "1e-8", "DensityFactor": "2.5",
        "AspectRatio": "0.005", "FlaringIndex": "0.0",
        "ViscousAlpha": "0.1", "ArtificialViscosity": "None",
        "EquationOfState": "Isothermal", "mu": "2.35",
        "ViscousOutflowSpeed": "1.0", "ThicknessSmoothing": "0.0",
        "Transport": "FARGO",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Damping": "Yes",
        "DampingInnerLimit": "2", "DampingOuterLimit": "0.64",
        "DampingTimeFactor": "1e-2",
        "DampingEnergyInner": "None", "DampingVRadialInner": "initial",
        "DampingVAzimuthalInner": "none",
        "DampingSurfaceDensityInner": "initial",
        "DampingEnergyOuter": "None", "DampingVRadialOuter": "initial",
        "DampingVAzimuthalOuter": "none",
        "DampingSurfaceDensityOuter": "initial",
        "Disk": "yes", "DiskFeedback": "no",
        "OmegaFrame": "0", "Frame": "F", "CFL": "0.4",
        "Nrad": "198", "Naz": "1",
        "Rmin": "10", "Rmax": "100", "RadialSpacing": "Logarithmic",
        "Nsnapshots": "10", "Nmonitor": "10",
        "MonitorTimestep": "31415.26",
        "WriteMassFlow": "Yes",
        "OutputDir": outdir,
        "nbody": [{"name": "DefaultStar", "semi-major axis": "0.0 au",
                   "mass": "1.0", "eccentricity": "0.0",
                   "radius": "0.009304813 solRadius",
                   "temperature": "0 K"}],
    })


@pytest.mark.slow
def test_constant_massflow_viscous_equilibrium(tmp_path):
    outdir = str(tmp_path / "out")
    sim = Simulation(ssa_config(outdir), dtype="float64")
    out.OutputWriter(sim)
    sim.run()

    nr = sim.geometry.nrad
    mf = np.fromfile(f"{outdir}/snapshots/10/MassFlow.dat")
    assert mf.shape == (nr,)

    # 1e-8 solMass/yr in code units: 1 yr = 2 pi code time (l0 = 1 au,
    # m0 = 1 solMass)
    mdot_theo = 1e-8 / (2.0 * np.pi)
    r = sim.geometry.rmed
    mask = (r > 20.0) & (r < 60.0)
    dev = np.abs(np.abs(mf[mask]) / mdot_theo - 1.0)
    assert dev.max() < 3e-4, f"max |Mdot/Mdot_theo - 1| = {dev.max():.3e}"
