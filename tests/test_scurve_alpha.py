"""S-curve surface cooling + alpha-viscosity modes
(reference src/SourceEuler.cpp:823-928, src/viscosity/viscosity.cpp:31-93)."""

import numpy as np
import jax.numpy as jnp

from fargocpt_tpu.config import Config
from fargocpt_tpu.constants import Constants
from fargocpt_tpu.grid import Geometry
from fargocpt_tpu.params import Physics
from fargocpt_tpu.sim import Simulation
from fargocpt_tpu.units import Units
from fargocpt_tpu.ops import energy as energy_ops
from fargocpt_tpu.ops import viscosity as visc_ops
from fargocpt_tpu.ops.common import prepare_geom


def _setup():
    units = Units.from_config_strings("1 au", "1 solMass")
    constants = Constants.from_units(units)
    geom = Geometry.build(32, 4, 0.4, 2.5, "Log")
    g = prepare_geom(geom, jnp.float64)
    return units, constants, geom, g


def test_scurve_branches():
    """Hot branch flux rises steeply (~T^8) with temperature, cold branch
    even steeper (~T^9.49); cooling is capped by the blackbody flux."""
    units, constants, geom, g = _setup()
    phys = Physics(eos="adiabatic", cooling_scurve_enabled=True,
                   scurve_kimura=True, mu=2.35)
    sigma = jnp.full((32, 4), 10.0 / units.surface_density)   # 10 g/cm2
    mu = jnp.full((32, 4), phys.mu)

    t_hot = jnp.full((32, 4), 30000.0 / units.temperature)
    t_hot2 = 2.0 * t_hot
    q1, tau1 = energy_ops.scurve_cooling(phys, constants, units, g, sigma,
                                         t_hot, mu)
    q2, _ = energy_ops.scurve_cooling(phys, constants, units, g, sigma,
                                      t_hot2, mu)
    assert np.all(np.asarray(q1) > 0)
    ratio = np.asarray(q2 / q1)
    # either on the hot branch (2^8 = 256) or blackbody-limited (2^4 = 16)
    assert np.all(ratio > 15.0)
    # blackbody cap: qminus <= 2 sigma_sb T^4
    f_bb = 2.0 * constants.sigma_sb * np.asarray(t_hot) ** 4
    assert np.all(np.asarray(q1) <= f_bb * (1 + 1e-12))
    # tau_eff consistency: qminus * tau_eff = 2 sigma_sb T^4
    np.testing.assert_allclose(np.asarray(q1 * tau1), f_bb, rtol=1e-10)

    # Kimura vs Ichikawa calibrations differ
    phys_i = Physics(eos="adiabatic", cooling_scurve_enabled=True,
                     scurve_kimura=False, mu=2.35)
    t_mid = jnp.full((32, 4), 3000.0 / units.temperature)
    qk, _ = energy_ops.scurve_cooling(phys, constants, units, g, sigma,
                                      t_mid, mu)
    qi, _ = energy_ops.scurve_cooling(phys_i, constants, units, g, sigma,
                                      t_mid, mu)
    assert not np.allclose(np.asarray(qk), np.asarray(qi))


def test_scurve_run_smoke(tmp_path):
    """A short adiabatic run with SurfaceCooling: scurve stays finite."""
    cfg = Config.from_dict({
        "EquationOfState": "Ideal", "AdiabaticIndex": "1.4",
        "AspectRatio": "0.05", "ViscousAlpha": "0.01",
        "Sigma0": "600 g/cm2", "SigmaSlope": "0.5",
        "HeatingViscous": "Yes", "SurfaceCooling": "scurve",
        "ScurveType": "Kimura",
        "Nrad": "32", "Naz": "16", "Rmin": "0.4", "Rmax": "2.5",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.5",
        "OutputDir": str(tmp_path / "o"),
        "nbody": [{"name": "star", "semi-major axis": "0.0", "mass": "1.0"}],
    })
    sim = Simulation(cfg)
    sim.run()
    e = np.asarray(sim.fields.energy)
    assert np.all(np.isfinite(e)) and np.all(e > 0)
    assert np.all(np.asarray(sim.state.qminus)[1:-1] > 0)


def test_alpha_mode_scurve_blend():
    """AlphaMode 1: cold alpha at low T, hot alpha at high T, smooth tanh
    blend around log10 T = 4."""
    units, constants, geom, g = _setup()
    phys = Physics(viscous_alpha=0.01, alpha_mode=1, alpha_cold=0.01,
                   alpha_hot=0.1)
    t_cold = jnp.full((32, 4), 300.0 / units.temperature)
    t_hot = jnp.full((32, 4), 1e6 / units.temperature)
    a_cold = np.asarray(visc_ops.alpha_grid(phys, g, units, t_cold))
    a_hot = np.asarray(visc_ops.alpha_grid(phys, g, units, t_hot))
    expected_cold = 0.01 * (np.asarray(g.rb) / 0.4) ** 0.3
    # tanh blend is ~1e-3 from its asymptote at 300 K
    np.testing.assert_allclose(a_cold, np.broadcast_to(expected_cold,
                                                       (32, 4)), rtol=5e-3)
    np.testing.assert_allclose(a_hot, 0.1, rtol=5e-3)


def test_alpha_mode_star_distance():
    """AlphaMode 2: alpha_cold near a body, alpha_hot far away."""
    from fargocpt_tpu.ops.gravity import BodiesOnGrid
    units, constants, geom, g = _setup()
    phys = Physics(viscous_alpha=0.01, alpha_mode=2, alpha_cold=0.001,
                   alpha_hot=0.1)
    x, y = geom.cell_centers_xy()
    bodies = BodiesOnGrid(x=jnp.zeros(1), y=jnp.zeros(1), mass=jnp.ones(1),
                          cubic_smoothing_radius=jnp.zeros(1))
    a = np.asarray(visc_ops.alpha_grid(
        phys, g, units, None, None, None, bodies, 1,
        jnp.asarray(x), jnp.asarray(y)))
    r = np.hypot(x, y)
    assert np.allclose(a[r < 0.35], 0.001)
    assert np.allclose(a[r > 0.56], 0.1)
    mid = (r > 0.4) & (r < 0.5)
    assert np.all((a[mid] > 0.001) & (a[mid] < 0.1))


def test_alpha_mode_ionization():
    """AlphaMode 3: neutral gas -> alpha_cold, ionized -> alpha_hot."""
    units, constants, geom, g = _setup()
    phys = Physics(eos="adiabatic", viscous_alpha=0.01, alpha_mode=3,
                   alpha_cold=0.001, alpha_hot=0.1)
    sigma = jnp.full((32, 4), 100.0 / units.surface_density)
    h = 0.05 * jnp.broadcast_to(g.rb, (32, 4))
    t_cold = jnp.full((32, 4), 100.0 / units.temperature)
    t_hot = jnp.full((32, 4), 5.0e4 / units.temperature)
    a_cold = np.asarray(visc_ops.alpha_grid(phys, g, units, t_cold, sigma,
                                            h))
    a_hot = np.asarray(visc_ops.alpha_grid(phys, g, units, t_hot, sigma, h))
    np.testing.assert_allclose(a_cold, 0.001, rtol=1e-6)
    np.testing.assert_allclose(a_hot, 0.1, rtol=1e-6)


def test_keep_mass_constant(tmp_path):
    """KeepDiskMassConstant pins the active-disk mass to its initial value
    despite outflow boundaries (reference src/simulation.cpp:246-251)."""
    base = {
        "EquationOfState": "Isothermal", "AspectRatio": "0.05",
        "ViscousAlpha": "0.01", "Sigma0": "300 g/cm2", "SigmaSlope": "0.5",
        "Nrad": "32", "Naz": "16", "Rmin": "0.4", "Rmax": "2.5",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "2.0",
        "OutputDir": str(tmp_path / "o"),
        "nbody": [{"name": "star", "semi-major axis": "0.0", "mass": "1.0"}],
    }

    def active_mass(sim):
        sig = np.asarray(sim.fields.sigma)
        surf = sim.geometry.surf
        return float((sig[1:-1] * surf[1:-1, None]).sum())

    sim = Simulation(Config.from_dict({**base,
                                       "KeepDiskMassConstant": "Yes"}))
    m0 = active_mass(sim)
    sim.run()
    np.testing.assert_allclose(active_mass(sim), m0, rtol=1e-10)

    sim2 = Simulation(Config.from_dict(base))
    m0b = active_mass(sim2)
    sim2.run()
    # outflow actually loses mass without the rescale
    assert (m0b - active_mass(sim2)) / m0b > 1e-4


def test_aspectratio_modes():
    """AspectRatioMode 1 (N-body) and 2 (center of mass): around a binary
    the sound speed / scale height follow the distances to the bodies
    (reference src/SourceEuler.cpp:1094-1399)."""
    import jax.numpy as jnp
    from fargocpt_tpu.step import HydroStep
    from fargocpt_tpu.ops.boundary import RefValues
    from fargocpt_tpu.ops.gravity import BodiesOnGrid
    from fargocpt_tpu.nbody.system import BodyConfig

    geom = Geometry.build(64, 64, 0.4, 2.5, "Log")
    bodies_cfg = [BodyConfig(name="a", mass=0.5),
                  BodyConfig(name="b", mass=0.5, semi_major_axis=0.2)]
    sigma = jnp.full((64, 64), 1e-4)
    energy = jnp.zeros((64, 64))
    z = jnp.zeros((65, 64))
    ref = RefValues(sigma0=sigma, energy0=energy, vrad0=z,
                    vaz0=jnp.zeros((64, 64)))
    bodies = BodiesOnGrid(x=jnp.asarray([0.1, -0.1]),
                          y=jnp.asarray([0.0, 0.0]),
                          mass=jnp.asarray([0.5, 0.5]),
                          cubic_smoothing_radius=jnp.zeros(2))

    for mode in (1, 2):
        phys = Physics(eos="isothermal", aspectratio_ref=0.05,
                       flaring_index=0.0, aspectratio_mode=mode,
                       hydro_center_mass=1.0)
        st = HydroStep(phys, Constants(), geom, ref, bodies=bodies_cfg,
                       n_hydroframe=2)
        cs, press, h = st.derived(sigma, energy, bodies)
        cs0, _, h0 = st.derived(sigma, energy)     # fallback mode 0
        assert np.all(np.isfinite(np.asarray(cs)))
        assert np.all(np.asarray(cs) > 0) and np.all(np.asarray(h) > 0)
        # far from the binary both modes approach the axisymmetric value
        far = np.asarray(st.g.rb[:, 0]) > 2.0
        rel_cs = np.abs(np.asarray(cs)[far] / np.asarray(cs0)[far] - 1.0)
        assert rel_cs.max() < 0.05, (mode, rel_cs.max())
        rel_h = np.abs(np.asarray(h)[far] / np.asarray(h0)[far] - 1.0)
        assert rel_h.max() < 0.1, (mode, rel_h.max())
        # near the binary the per-body mode is azimuthally structured
        # (mode 2 sees the COM at the origin here -> axisymmetric)
        near = np.argmin(np.abs(geom.rmed - 0.45))
        if mode == 1:
            assert np.asarray(cs)[near].std() \
                / np.asarray(cs)[near].mean() > 1e-3


def test_stabilize_viscosity(tmp_path):
    """StabilizeViscosity 1 (implicit correction factors) and 2 (CFL
    limit) run stably and keep the correction coefficients negative
    (reference src/viscosity/viscosity.cpp:256-354, src/cfl.cpp:330)."""
    from fargocpt_tpu.ops import viscosity as vo
    units, constants, geom, g = _setup()
    phys = Physics(viscous_alpha=0.01, stabilize_viscosity=1)
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(rng.random((32, 4)) + 0.5)
    nu = jnp.asarray(rng.random((32, 4)) * 1e-4 + 1e-5)
    c_phi, c_r = vo.viscosity_correction_factors(phys, g, sigma, nu)
    assert np.all(np.asarray(c_phi)[1:-1] < 0)
    assert np.all(np.asarray(c_r)[1:-1] < 0)

    for mode in ("1", "2"):
        cfg = Config.from_dict({
            "EquationOfState": "Isothermal", "AspectRatio": "0.05",
            "ViscousAlpha": "0.05", "Sigma0": "300 g/cm2",
            "SigmaSlope": "0.5", "StabilizeViscosity": mode,
            "Nrad": "32", "Naz": "16", "Rmin": "0.4", "Rmax": "2.5",
            "InnerBoundary": "outflow", "OuterBoundary": "outflow",
            "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.5",
            "OutputDir": str(tmp_path / f"o{mode}"),
            "nbody": [{"name": "star", "semi-major axis": "0.0",
                       "mass": "1.0"}],
        })
        sim = Simulation(cfg)
        sim.run()
        assert np.all(np.isfinite(np.asarray(sim.fields.vaz)))
