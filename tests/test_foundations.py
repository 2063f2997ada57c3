"""Unit tests for the config / units / grid foundations."""

import numpy as np
import pytest

from fargocpt_tpu import units as u
from fargocpt_tpu.config import Config
from fargocpt_tpu.constants import Constants
from fargocpt_tpu.grid import Geometry


def test_unit_parsing():
    f, d = u.parse_unit_expr("g/cm2")
    assert f == 1.0 and d == (-2.0, 1.0, 0.0, 0.0)
    f, d = u.parse_unit_expr("solMass/yr")
    assert np.isclose(f, u.CGS_SOLMASS / u.CGS_YEAR)
    f, d = u.parse_unit_expr("cm^2/s")
    assert d == (2.0, 0.0, -1.0, 0.0)
    # LLNL astro user units (reference src/units.cpp:113-126; PDS70.yml
    # uses "7.0 jupiterMass")
    f, d = u.parse_unit_expr("jupiterMass")
    assert f == u.CGS_JUPITERMASS and d == (0.0, 1.0, 0.0, 0.0)
    f, d = u.parse_unit_expr("jupiterRadius")
    assert f == u.CGS_JUPITERRADIUS and d == (1.0, 0.0, 0.0, 0.0)


def test_units_g_is_one():
    un = u.Units.from_config_strings("1.0", "1.0")
    c = Constants.from_units(un)
    assert np.isclose(c.G, 1.0, rtol=1e-12)
    # one orbit at 1 au around 1 Msun is 2 pi code time units
    assert np.isclose(un.T0, np.sqrt(u.CGS_AU ** 3 / (u.CGS_G * u.CGS_SOLMASS)))


def test_config_typed_get():
    cfg = Config.from_dict({"Nrad": "256", "Rmin": "0.2", "Flag": "Yes",
                            "Sigma0": "1890.673 g/cm2"})
    cfg.set_units(u.Units.from_config_strings("1.0", "1.0"))
    assert cfg.get("Nrad", 64, type=int) == 256
    assert cfg.get("Rmin", 0.4, dim=u.DIM_LENGTH, type=float) == 0.2
    assert cfg.get_flag("Flag") is True
    sigma_code = cfg.get("Sigma0", 1.0, dim=u.DIM_SURFACE_DENSITY, type=float)
    assert np.isclose(sigma_code * u.CGS_SOLMASS / u.CGS_AU ** 2, 1890.673)
    assert set(cfg.unknown_keys()) == set()


def test_config_unknown_keys():
    cfg = Config.from_dict({"Nrad": 4, "Tpyo": 1})
    cfg.get("Nrad", 64, type=int)
    assert cfg.unknown_keys() == ["Tpyo"]
    with pytest.raises(KeyError):
        cfg.exit_on_unknown_key()


def test_log_grid():
    g = Geometry.build(128, 256, 0.4, 2.5, "Log")
    # active domain edges (reference: Radii[1]=RMIN, Radii[NR-1]=RMAX)
    assert np.isclose(g.radii[1], 0.4)
    assert np.isclose(g.radii[g.nrad - 1], 2.5)
    # constant ratio
    ratios = g.radii[1:] / g.radii[:-1]
    assert np.allclose(ratios, ratios[0])
    # rmed between interfaces
    assert np.all(g.rmed > g.rinf) and np.all(g.rmed < g.rsup)
    # areas sum to the annulus area (surf is per-cell, one ring has naz cells)
    total = g.surf.sum() * g.naz
    annulus = np.pi * (g.radii[g.nrad] ** 2 - g.radii[0] ** 2)
    assert np.isclose(total, annulus)


def test_arith_grid():
    g = Geometry.build(100, 2, 1000.0, 1001.0, "Arithmetic")
    widths = np.diff(g.radii)
    assert np.allclose(widths, widths[0])
    assert np.isclose(widths[0], 1.0 / 98.0)


def test_exponential_grid():
    g = Geometry.build(64, 8, 0.4, 2.5, "Exponential")
    assert np.isclose(g.radii[1], 0.4)
    assert np.isclose(g.radii[g.nrad - 1], 2.5)
    assert np.all(np.diff(np.diff(g.radii)) > -1e-12)  # growing cells


def test_viscous_boundary_condition():
    """InnerBoundaryVrad: viscous sets the edge v_rad to the steady drift
    -1.5 s nu / r (reference src/boundary_conditions/viscous.cpp)."""
    from fargocpt_tpu.config import Config
    from fargocpt_tpu.sim import Simulation

    cfg = Config.from_dict({
        "EquationOfState": "Isothermal", "AspectRatio": "0.05",
        "Sigma0": "200 g/cm2", "SigmaSlope": "0.5",
        "ViscousAlpha": "0.01",
        "Nrad": "32", "Naz": "8", "Rmin": "0.4", "Rmax": "2.5",
        "InnerBoundary": "viscous", "OuterBoundary": "outflow",
        "ViscousOutflowSpeed": "5.0",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.01",
    })
    sim = Simulation(cfg)
    vr = np.asarray(sim.fields.vrad)
    # expected: -1.5 * s * nu_edge / Ra with nu = alpha cs H
    import jax.numpy as jnp
    cs, _, h = sim.stepper.derived(sim.fields.sigma, sim.fields.energy)
    nu = np.asarray(sim.stepper.viscosity_grid(cs, h))
    nu_edge = 0.5 * (nu[0] + nu[1])
    expected1 = -1.5 * 5.0 / sim.geometry.ra[1] * nu_edge
    np.testing.assert_allclose(vr[1], expected1, rtol=1e-12)
    assert np.all(vr[1] < 0)


def test_polytropic_eos_smoke(tmp_path):
    """Polytropic EoS (reference src/SourceEuler.cpp:1059-1079 /
    src/pvte_law.cpp dispatch): cs^2 = gamma K Sigma^(gamma-1); a short
    run stays finite and positive."""
    import numpy as np
    from fargocpt_tpu.config import Config
    from fargocpt_tpu.sim import Simulation
    cfg = Config.from_dict({
        "EquationOfState": "Polytropic", "AdiabaticIndex": "2.0",
        "PolytropicConstant": "16.0",
        "AspectRatio": "0.05", "ViscousAlpha": "0.001",
        "Sigma0": "200 g/cm2", "SigmaSlope": "0.5",
        "Nrad": "32", "Naz": "16", "Rmin": "0.4", "Rmax": "2.5",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.2",
        "OutputDir": str(tmp_path / "o"),
        "nbody": [{"name": "star", "semi-major axis": "0.0", "mass": "1.0"}],
    })
    sim = Simulation(cfg)
    sim.run()
    sig = np.asarray(sim.fields.sigma)
    assert np.all(np.isfinite(sig)) and np.all(sig > 0)


def test_keplerian_radial_bc():
    """InnerBoundaryVrad/OuterBoundaryVrad 'keplerian': vrad ghost rows
    pinned to factor * vKep(Rmed)
    (reference src/boundary_conditions/keplerian_radial.cpp)."""
    import numpy as np
    import jax.numpy as jnp
    from fargocpt_tpu.grid import Geometry
    from fargocpt_tpu.constants import Constants
    from fargocpt_tpu.params import Physics
    from fargocpt_tpu.ops import boundary
    from fargocpt_tpu.ops.common import prepare_geom

    geom = Geometry.build(32, 8, 0.4, 2.5, "Log")
    g = prepare_geom(geom, jnp.float64)
    phys = Physics(bc_vrad_inner="keplerian", bc_vrad_outer="keplerian",
                   keplerian_radial_inner_factor=-0.1,
                   keplerian_radial_outer_factor=0.2)
    z = jnp.zeros((32, 8))
    vr = jnp.ones((33, 8))
    rv = boundary.RefValues(sigma0=z + 1, energy0=z, vrad0=vr, vaz0=z)
    sig, vr2, va, e = boundary.apply_boundary_conditions(
        phys, Constants(), g, z + 1, vr, z, z, rv, jnp.float64(0.0))
    vk = np.sqrt(1.0 / np.asarray(g.rmed_ext)[:, 0])
    np.testing.assert_allclose(np.asarray(vr2)[0], -0.1 * vk[0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vr2)[1], -0.1 * vk[1], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vr2)[32], 0.2 * vk[32], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vr2)[31], 0.2 * vk[31], rtol=1e-12)
