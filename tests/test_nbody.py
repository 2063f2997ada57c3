"""N-body validation: Kepler orbits must stay on their ellipses
(analog of reference test/circ_kepler_orbit)."""

import numpy as np
import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation


def kepler_config(ecc="0.0", extra=None):
    cfg = {
        "EquationOfState": "Isothermal", "AspectRatio": "0.05",
        "Disk": "No",   # pure N-body
        "Nrad": "16", "Naz": "8", "Rmin": "0.4", "Rmax": "2.5",
        "Nsnapshots": "1", "Nmonitor": "1",
        "MonitorTimestep": str(20 * 2 * np.pi),   # 20 orbits
        "FirstDT": "1e-3",
        "nbody": [
            {"name": "Star", "semi-major axis": "0.0", "mass": "1.0"},
            {"name": "Planet", "semi-major axis": "1.0", "mass": "1e-3",
             "eccentricity": ecc},
        ],
    }
    if extra:
        cfg.update(extra)
    return Config.from_dict(cfg)


def test_jacobi_initialization():
    sim = Simulation(kepler_config())
    nb = sim.state.nbody
    # primary frame: star at origin
    assert abs(float(nb.x[0])) < 1e-15 and abs(float(nb.y[0])) < 1e-15
    # planet at pericenter distance a(1-e) = 1
    r = np.hypot(float(nb.x[1]), float(nb.y[1]))
    assert np.isclose(r, 1.0)
    # circular speed = sqrt(G(M+m)/a) in the pre-centering frame; primary
    # frame shifts by the star's velocity
    el = sim.orbital_elements(1)
    assert np.isclose(el["a"], 1.0, atol=1e-12)
    assert el["e"] < 1e-12


@pytest.mark.parametrize("ecc", ["0.0", "0.3"])
def test_kepler_orbit_conservation(ecc):
    sim = Simulation(kepler_config(ecc))
    el0 = sim.orbital_elements(1)
    # pure N-body: no CFL, march with fixed dt via step_once
    dt = 1e-2
    n_steps = int(20 * 2 * np.pi / dt)
    for _ in range(200):
        sim.step_once(dt)
    # run the rest in chunks to keep dispatch cost sane
    for _ in range(n_steps - 200):
        sim.step_once(dt)
    el1 = sim.orbital_elements(1)
    assert np.isclose(el1["a"], el0["a"], rtol=1e-9), (el0, el1)
    assert abs(el1["e"] - el0["e"]) < 1e-9


def test_binary_barycenter_init():
    cfg = Config.from_dict({
        "EquationOfState": "Isothermal", "AspectRatio": "0.05",
        "Disk": "No", "HydroFrameCenter": "binary",
        "Nrad": "16", "Naz": "8", "Rmin": "0.4", "Rmax": "2.5",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "1.0",
        "nbody": [
            {"name": "Primary", "semi-major axis": "0.0", "mass": "1.0"},
            {"name": "Secondary", "semi-major axis": "0.5", "mass": "0.25",
             "eccentricity": "0.1"},
        ],
    })
    sim = Simulation(cfg)
    nb = sim.state.nbody
    m = np.asarray(nb.mass)
    # barycenter of the two bodies at the origin with zero net momentum
    assert abs(float((m * np.asarray(nb.x)).sum())) < 1e-14
    assert abs(float((m * np.asarray(nb.vx)).sum())) < 1e-14
    assert abs(float((m * np.asarray(nb.vy)).sum())) < 1e-14
    # hydro center mass is the binary mass
    assert np.isclose(sim.phys.hydro_center_mass, 1.25)
    # separation = a(1-e)
    sep = np.hypot(float(nb.x[1] - nb.x[0]), float(nb.y[1] - nb.y[0]))
    assert np.isclose(sep, 0.5 * (1 - 0.1))


def test_kley_accretion():
    """Planet accretes gas from its Hill sphere (reference
    src/accretion.cpp:84-222): planet mass grows, local gas is depleted."""
    import jax.numpy as jnp
    from fargocpt_tpu import output as out
    cfg = Config.from_dict({
        "EquationOfState": "Isothermal", "AspectRatio": "0.05",
        "Sigma0": "500 g/cm2", "SigmaSlope": "0.5",
        "ViscousAlpha": "0.003",
        "Nrad": "128", "Naz": "256", "Rmin": "0.4", "Rmax": "2.5",
        "RadialSpacing": "Log",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "DiskFeedback": "yes",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "3.0",
        "nbody": [
            {"name": "star", "semi-major axis": "0.0", "mass": "1.0"},
            {"name": "planet", "semi-major axis": "1.0", "mass": "1e-3",
             "accretion efficiency": "1.0", "accretion method": "kley"},
        ],
    })
    sim = Simulation(cfg)
    m0 = float(sim.state.nbody.mass[1])
    gas_mass0 = float(np.sum(np.asarray(sim.fields.sigma)[1:-1]
                             * sim.geometry.surf[1:-1, None]))
    sim.run()
    m1 = float(sim.state.nbody.mass[1])
    gas_mass1 = float(np.sum(np.asarray(sim.fields.sigma)[1:-1]
                             * sim.geometry.surf[1:-1, None]))
    assert m1 > m0, "planet did not accrete"
    # accreted mass must come out of the gas (up to boundary losses)
    assert gas_mass1 < gas_mass0
    # planet stays on a sane orbit
    el = sim.orbital_elements(1)
    assert 0.9 < el["a"] < 1.1


@pytest.mark.parametrize("method", ["sinkhole", "viscous"])
def test_accretion_variants(method):
    """Single-zone sinkhole (reference src/accretion.cpp:223-335) and
    viscous-rate (:336-481) accretion variants remove gas and grow the
    planet."""
    cfg = Config.from_dict({
        "EquationOfState": "Isothermal", "AspectRatio": "0.05",
        "Sigma0": "500 g/cm2", "SigmaSlope": "0.5",
        "ViscousAlpha": "0.003",
        "Nrad": "128", "Naz": "256", "Rmin": "0.4", "Rmax": "2.5",
        "RadialSpacing": "Log",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "DiskFeedback": "yes",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "3.0",
        "nbody": [
            {"name": "star", "semi-major axis": "0.0", "mass": "1.0"},
            {"name": "planet", "semi-major axis": "1.0", "mass": "1e-3",
             "accretion efficiency": "10.0" if method == "viscous"
             else "1.0",
             "accretion method": method},
        ],
    })
    sim = Simulation(cfg)
    m0 = float(sim.state.nbody.mass[1])
    sim.run()
    m1 = float(sim.state.nbody.mass[1])
    assert m1 > m0, f"{method}: planet did not accrete"
    sig = np.asarray(sim.fields.sigma)
    assert np.all(sig > 0) and np.all(np.isfinite(sig))


def test_corotating_frame():
    """Corotating frame: the reference body stays at a fixed azimuth and
    OmegaFrame tracks its orbital frequency (reference
    src/frame_of_reference.cpp:30-60)."""
    cfg = kepler_config(extra={"Frame": "C", "CorotationReferenceBody": "1"})
    sim = Simulation(cfg)
    # expected orbital frequency of the planet (a=1, M=1+1e-3)
    omega_expected = np.sqrt(sim.constants.G * (1.0 + 1e-3))
    # step past the first-measurement transient (the reference's
    # handle_corotation also measures Omega=0 on the very first step)
    for _ in range(5):
        sim.step_once(1e-2)
    nb0 = sim.state.nbody
    phi0 = np.arctan2(float(nb0.y[1]), float(nb0.x[1]))
    for _ in range(500):
        sim.step_once(1e-2)
    nb = sim.state.nbody
    phi1 = np.arctan2(float(nb.y[1]), float(nb.x[1]))
    assert abs(((phi1 - phi0 + np.pi) % (2 * np.pi)) - np.pi) < 1e-4, \
        "planet drifted in the corotating frame"
    assert np.isclose(float(sim.state.omega_frame), omega_expected,
                      rtol=1e-6)


def test_corotating_frame_leapfrog():
    """Regression (round-1 bug): the leapfrog step must persist the updated
    omega_frame in the returned state. With a stale (initial) value carried
    forever, the per-step corotation correction domega = omega_new -
    omega_stale stops telescoping: once the eccentric reference body's
    angular velocity departs from its initial value, vaz is ratcheted by the
    accumulated (not incremental) difference every step. Gate: leapfrog
    tracks the Euler path (which persists omega correctly) closely."""
    def run(integ):
        cfg = kepler_config(ecc="0.3", extra={
            "Frame": "C", "CorotationReferenceBody": "1",
            "Integrator": integ,
            "Disk": "Yes", "Sigma0": "200 g/cm2", "SigmaSlope": "0.5",
            "ViscousAlpha": "0.001", "Nrad": "32", "Naz": "64",
            "InnerBoundary": "zerogradient", "OuterBoundary": "zerogradient",
        })
        sim = Simulation(cfg)
        om0 = float(sim.state.omega_frame)
        for _ in range(100):                   # ~1/6 of the e=0.3 orbit
            sim.step_once(1e-2)
        return om0, float(sim.state.omega_frame), np.asarray(sim.fields.vaz)

    om0_e, om_e, vaz_e = run("Euler")
    om0_l, om_l, vaz_l = run("LeapFrog")
    # on an e=0.3 orbit leaving pericenter, omega drops measurably; a stale
    # state would still report the initial value
    assert om_l < om0_l * 0.999, \
        f"omega_frame not persisted by leapfrog step ({om0_l} -> {om_l})"
    assert np.isclose(om_l, om_e, rtol=0.02)
    # same physics, different splitting: interior vaz must agree closely
    # (the stale-omega bug put leapfrog O(1)*vK away from Euler)
    d = np.abs(vaz_l - vaz_e)[1:-1]
    assert d.max() < 0.1, f"leapfrog vaz deviates from Euler by {d.max():.3f}"


def test_rochelobe_overflow_stream():
    """Mass-overflow stream at the outer boundary (reference
    src/boundary_conditions/mass_overflow.cpp): mass flows in around the
    donor's azimuth and the disk gains mass."""
    cfg = Config.from_dict({
        "EquationOfState": "Isothermal", "AspectRatio": "0.05",
        "Sigma0": "1 g/cm2", "SigmaSlope": "0.5", "SigmaFloor": "1e-8",
        "ViscousAlpha": "0.01",
        "Nrad": "64", "Naz": "64", "Rmin": "0.1", "Rmax": "0.5",
        "RadialSpacing": "Log",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "RocheLobeOverflow": "yes", "ROFplanet": "1",
        "ROFtemperature": "4000 K", "ROFvalue": "3e-8 solMass/yr",
        "ROFrampingtime": "0.01",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "1.0",
        "nbody": [
            {"name": "star", "semi-major axis": "0.0", "mass": "1.0"},
            {"name": "donor", "semi-major axis": "1.0", "mass": "0.5"},
        ],
    })
    sim = Simulation(cfg)
    sim.run()
    sigma = np.asarray(sim.fields.sigma)
    assert np.all(np.isfinite(sigma))
    # the stream azimuth at the outer ghost ring carries far more mass
    # than the opposite side, and the stream has penetrated inward
    outer = sigma[-1]
    assert outer.max() > 10 * np.median(outer)
    assert sigma[-2].max() > 10 * np.median(sigma[-2])


def test_indirect_term_modes_agree():
    """Predictor (mode 0) and Euler (mode 1) N-body indirect terms agree to
    O(dt) for a star+planet system with the planet outside the frame center
    (reference src/frame_of_reference.cpp:114-165)."""
    import jax.numpy as jnp
    from fargocpt_tpu.constants import Constants
    from fargocpt_tpu.ops import gravity
    from fargocpt_tpu.nbody.system import NBodyState

    constants = Constants()
    nb = NBodyState(x=jnp.asarray([0.0, 1.0]), y=jnp.asarray([0.0, 0.0]),
                    vx=jnp.asarray([0.0, 0.0]), vy=jnp.asarray([0.0, 1.0]),
                    mass=jnp.asarray([1.0, 1e-3]))
    bodies = gravity.BodiesOnGrid(x=nb.x, y=nb.y, mass=nb.mass,
                                  cubic_smoothing_radius=jnp.zeros(2))
    ex, ey = gravity.indirect_term_nbody(constants, bodies, 1, 2)
    px, py = gravity.indirect_term_nbody_predictor(constants, nb, 1, 2,
                                                   jnp.float64(1e-4))
    # star at origin pulled by the planet: itx = +G m_p / d^2 toward -x
    assert np.isclose(float(ex), -1e-3, rtol=1e-10)
    np.testing.assert_allclose(float(px), float(ex), rtol=1e-3)
    np.testing.assert_allclose(float(py), float(ey), atol=1e-6)
    # dt = 0 predictor is zero (reference :160-163)
    zx, zy = gravity.indirect_term_nbody_predictor(constants, nb, 1, 2,
                                                   jnp.float64(0.0))
    assert float(zx) == 0.0 and float(zy) == 0.0


@pytest.mark.parametrize("method", ["rk4", "rk5"])
def test_fixed_step_integrators_match_ias15(method):
    """rk4 and the legacy Cash-Karp rk5 (reference src/RungeKutta.cpp:12-92,
    corrected tableau) agree with IAS15 over a full eccentric orbit."""
    import jax
    import jax.numpy as jnp
    from fargocpt_tpu.nbody import system as nbody_sys
    from fargocpt_tpu.nbody.system import NBodyState

    e = 0.3
    # pericenter start: r = a(1-e), v = sqrt(GM (1+e)/(a(1-e))) tangential
    r0 = 1.0 - e
    v0 = np.sqrt((1.0 + 1e-3) * (1.0 + e) / r0)
    nb = NBodyState(x=jnp.asarray([0.0, r0]), y=jnp.asarray([0.0, 0.0]),
                    vx=jnp.asarray([0.0, 0.0]),
                    vy=jnp.asarray([-1e-3 * v0, v0]),
                    mass=jnp.asarray([1.0, 1e-3]))
    ref = nb
    dt = 2 * np.pi / 100.0
    step = jax.jit(lambda s: nbody_sys.integrate(s, 1.0, dt, n_substeps=32,
                                                 method=method))
    ref_step = jax.jit(lambda s: nbody_sys.integrate(s, 1.0, dt,
                                                     method="ias15"))
    for _ in range(100):
        nb = step(nb)
        ref = ref_step(ref)
    np.testing.assert_allclose(np.asarray(nb.x), np.asarray(ref.x),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(nb.y), np.asarray(ref.y),
                               atol=5e-6)


def test_nbody_integrator_config_threading():
    """NbodyIntegrator reaches Physics and bad names raise."""
    sim = Simulation(kepler_config(extra={"NbodyIntegrator": "rk5"}))
    assert sim.stepper.phys.nbody_integrator == "rk5"
    el0 = sim.orbital_elements(1)
    for _ in range(50):
        sim.step_once(1e-2)
    el1 = sim.orbital_elements(1)
    assert np.isclose(el1["a"], el0["a"], rtol=1e-7)
    from fargocpt_tpu.nbody import system as nbody_sys
    with pytest.raises(ValueError, match="NbodyIntegrator"):
        nbody_sys.integrate(sim.state.nbody, 1.0, 1e-3, method="rk9")
