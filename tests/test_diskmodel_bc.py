"""Disk-model profiles + diskmodel / center-of-mass boundary conditions
(reference src/Theo.cpp, src/viscosity/viscous_radial_speed.cpp,
src/boundary_conditions/{diskmodel,center_of_mass}.cpp)."""

import numpy as np
import jax.numpy as jnp

from fargocpt_tpu.config import Config
from fargocpt_tpu.constants import Constants
from fargocpt_tpu.params import Physics
from fargocpt_tpu.sim import Simulation
from fargocpt_tpu.ops import diskmodel as dm


def test_numerical_viscous_vr_matches_analytic_scaling():
    """For a pure power-law locally isothermal disk, the numerically
    derived steady-accretion v_r agrees with the analytic -3 nu/r (1 - S
    + 2F) estimate to the accuracy of the smoothing corrections."""
    phys = Physics(eos="isothermal", aspectratio_ref=0.05,
                   flaring_index=0.0, sigma_slope=0.5, viscous_alpha=1e-3,
                   sigma0=1e-4, thickness_smoothing=0.0)
    constants = Constants()
    r = jnp.asarray([0.7, 1.0, 1.6])
    vr_num = np.asarray(dm.vr_numerical_viscous(phys, constants, r, 1.0))
    vr_ana = np.asarray(dm.viscous_radial_speed_analytic(phys, constants,
                                                         r, 1.0))
    assert np.all(vr_num < 0)
    np.testing.assert_allclose(vr_num, vr_ana, rtol=0.25)


def test_quadrupole_moment():
    """reference src/Theo.cpp:58-78: Q = a^2/4 q/(1+q)^2 (1 + 3/2 e^2)."""
    from fargocpt_tpu.nbody.system import BodyConfig
    bodies = [BodyConfig(name="a", mass=1.0),
              BodyConfig(name="b", mass=0.5, semi_major_axis=0.3,
                         eccentricity=0.1)]
    q = dm.binary_quadrupole_moment(bodies, 2)
    expected = 0.3 ** 2 / 4 * 0.5 / 1.5 ** 2 * (1 + 1.5 * 0.01)
    assert np.isclose(q, expected)
    assert dm.binary_quadrupole_moment(bodies, 1) == 0.0


def _circumbinary_cfg(outdir):
    return {
        "EquationOfState": "Isothermal", "AspectRatio": "0.05",
        "FlaringIndex": "0.0",
        "Sigma0": "100 g/cm2", "SigmaSlope": "1.0",
        "ViscousAlpha": "0.001",
        "Nrad": "64", "Naz": "64", "Rmin": "1.0", "Rmax": "8.0",
        "RadialSpacing": "Log",
        "InnerBoundary": "diskmodel", "OuterBoundary": "centerofmass",
        "VazimuthalConsidersQuadropoleMoment": "Yes",
        "HydroFrameCenter": "binary",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "1.0",
        "OutputDir": str(outdir),
        "nbody": [
            {"name": "primary", "semi-major axis": "0.0", "mass": "0.7"},
            {"name": "secondary", "semi-major axis": "0.3", "mass": "0.3",
             "eccentricity": "0.1"},
        ],
    }


def test_circumbinary_center_of_mass_boundary(tmp_path):
    """Circumbinary disk: outer ghost ring follows the disk-model profile
    evaluated at the center-of-mass radius; inner ghost ring pinned to the
    analytic profile; binary orbit stays sane."""
    sim = Simulation(Config.from_dict(_circumbinary_cfg(tmp_path / "o")))
    phys = sim.phys
    sim.run()

    sig = np.asarray(sim.fields.sigma)
    assert np.all(np.isfinite(sig)) and np.all(sig > 0)

    # inner ghost ring = diskmodel profile (azimuthally constant)
    r0 = sim.geometry.rmed[0]
    np.testing.assert_allclose(sig[0], phys.sigma0 * r0 ** -phys.sigma_slope,
                               rtol=1e-12)

    # outer ghost ring = sigma0 * r_com^-slope per cell
    nb = sim.state.nbody
    m = np.asarray(nb.mass)[:2]
    com_x = float((m * np.asarray(nb.x)[:2]).sum() / m.sum())
    com_y = float((m * np.asarray(nb.y)[:2]).sum() / m.sum())
    rout = sim.geometry.rmed[-1]
    phi = np.arange(sim.geometry.naz) * sim.geometry.dphi
    r_com = np.hypot(rout * np.cos(phi) - com_x, rout * np.sin(phi) - com_y)
    np.testing.assert_allclose(sig[-1],
                               phys.sigma0 * r_com ** -phys.sigma_slope,
                               rtol=1e-10)
    # azimuthal structure present in the ghost ring (COM is off-center)
    assert sig[-1].max() - sig[-1].min() > 0

    # binary orbit intact
    el = sim.orbital_elements(1)
    assert 0.25 < el["a"] < 0.35
