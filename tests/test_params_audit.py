"""Parameter-audit coverage: the last reference config keys
(boundary keplerian factors, IndirectTermDiskOnDisk, DampingTimeRadiusOuter,
PlanetOrbitDiskTest, CICPLANET, prognostic/diagnostic Write* gates,
WriteDefaultValues) and the deprecated-key hard errors."""

import numpy as np
import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.params import physics_from_config
from fargocpt_tpu.sim import Simulation
from fargocpt_tpu import units as u


def _phys(extra=None):
    d = {"Nrad": "32", "Naz": "16", "Rmin": "0.4", "Rmax": "2.5"}
    d.update(extra or {})
    cfg = Config.from_dict(d)
    return physics_from_config(cfg, u.Units())


def test_keplerian_factor_keys():
    p = _phys({"InnerBoundaryVradKeplerianFactor": "0.3",
               "OuterBoundaryVaziKeplerianFactor": "0.9"})
    assert p.keplerian_radial_inner_factor == 0.3
    assert p.keplerian_azimuthal_outer_factor == 0.9
    # reference defaults (src/boundary_conditions/config.cpp:221,:297)
    q = _phys()
    assert q.keplerian_radial_inner_factor == 0.1
    assert q.keplerian_azimuthal_inner_factor == 1.0


def test_indirect_term_disk_on_disk_auto():
    """reference src/parameters.cpp:809-824: auto follows SelfGravity."""
    assert not _phys().indirect_term_disk_on_disk
    assert _phys({"SelfGravity": "yes"}).indirect_term_disk_on_disk
    assert not _phys({"SelfGravity": "yes",
                      "IndirectTermDiskOnDisk": "no"}
                     ).indirect_term_disk_on_disk
    assert _phys({"IndirectTermDiskOnDisk": "yes"}
                 ).indirect_term_disk_on_disk
    with pytest.raises(ValueError):
        _phys({"IndirectTermDiskOnDisk": "maybe"})


def test_deprecated_keys_die():
    with pytest.raises(ValueError, match="ArtificialViscosityFactor"):
        _phys({"CVNR": "1.41"})
    with pytest.raises(ValueError, match="DampingVRadialInner"):
        _phys({"DampingVRadial": "initial"})


def test_damping_time_radius_outer():
    """reference src/boundary_conditions/damping.cpp:199-205: the outer
    damping timescale uses Omega_K at the configured radius."""
    from fargocpt_tpu.constants import Constants
    from fargocpt_tpu.grid import Geometry
    from fargocpt_tpu.ops.damping import DampingZones
    import jax.numpy as jnp

    geom = Geometry.build(32, 16, 0.4, 2.5, "Log")
    base = {"DampingOuterLimit": "0.84", "Damping": "Yes",
            "DampingVRadialOuter": "initial"}
    p1 = _phys(base)
    p2 = _phys({**base, "DampingTimeRadiusOuter": "1.0"})
    c = Constants()
    d1 = DampingZones(p1, c, geom, jnp.float64)
    d2 = DampingZones(p2, c, geom, jnp.float64)
    r1 = np.asarray(d1.rate_b)[-2, 0]
    r2 = np.asarray(d2.rate_b)[-2, 0]
    # tau ~ r^1.5: smaller reference radius -> shorter tau -> larger rate
    np.testing.assert_allclose(r2 / r1, 2.5 ** 1.5, rtol=1e-12)


def test_planet_orbit_disk_test_zeroes_body0():
    import jax.numpy as jnp
    from fargocpt_tpu.constants import Constants
    from fargocpt_tpu.grid import Geometry
    from fargocpt_tpu.ops import gravity
    from fargocpt_tpu.ops.common import prepare_geom

    geom = Geometry.build(32, 16, 0.4, 2.5, "Log")
    g = prepare_geom(geom, jnp.float64)
    x, y = geom.cell_centers_xy()
    cx, cy = jnp.asarray(x), jnp.asarray(y)
    rng = np.random.default_rng(3)
    sigma = jnp.asarray(rng.random((32, 16)) + 0.5)
    h = 0.05 * g.rb * jnp.ones_like(sigma)
    bodies = gravity.BodiesOnGrid(
        x=jnp.asarray([0.1, 1.0]), y=jnp.asarray([0.0, 0.0]),
        mass=jnp.asarray([1.0, 1e-3]),
        cubic_smoothing_radius=jnp.zeros(2))
    for flag in (False, True):
        p = _phys({"PlanetOrbitDiskTest": "yes" if flag else "no"})
        ax, ay = gravity.disk_on_body_accel(
            p, Constants(), g, bodies, 2, cx, cy, h, sigma)
        if flag:
            assert float(ax[0]) == 0.0 and float(ay[0]) == 0.0
        else:
            assert float(ax[0]) != 0.0
        assert float(ax[1]) != 0.0


def _sim_cfg(extra=None):
    d = {"EquationOfState": "Ideal", "AdiabaticIndex": "1.4",
         "AspectRatio": "0.05", "ViscousAlpha": "1e-3",
         "Sigma0": "200 g/cm2", "SigmaSlope": "0.5",
         "HeatingViscous": "Yes", "CoolingBetaLocal": "Yes",
         "CoolingBeta": "10", "Nrad": "32", "Naz": "16",
         "Rmin": "0.4", "Rmax": "2.5",
         "InnerBoundary": "outflow", "OuterBoundary": "outflow",
         "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.2"}
    d.update(extra or {})
    return Config.from_dict(d)


def test_cic_planet_snaps_to_cell_center():
    cfg = _sim_cfg({"CICPLANET": "yes", "nbody": [
        {"name": "star", "semi-major axis": "0.0", "mass": "1.0"},
        {"name": "p", "semi-major axis": "1.03", "mass": "1e-3"}]})
    sim = Simulation(cfg)
    a = sim.bodies[1].semi_major_axis
    assert a in sim.geometry.rmed
    with pytest.raises(ValueError, match="eccentricity"):
        Simulation(_sim_cfg({"CICPLANET": "yes", "nbody": [
            {"name": "star", "semi-major axis": "0.0", "mass": "1.0"},
            {"name": "p", "semi-major axis": "1.0", "mass": "1e-3",
             "eccentricity": "0.3"}]}))


def test_write_gates_and_defaults_dump(tmp_path):
    from fargocpt_tpu import output as out
    cfg = _sim_cfg({"WriteDensity": "No", "WriteQPlus": "Yes",
                    "WriteTau": "Yes", "WriteRadialLuminosity": "Yes",
                    "WriteDiskQuantities": "No",
                    "WriteDefaultValues": "Yes"})
    sim = Simulation(cfg, outdir=str(tmp_path / "o"))
    out.OutputWriter(sim)
    sim.run()
    sdir = tmp_path / "o" / "snapshots" / "1"
    assert not (sdir / "Sigma.dat").exists()          # WriteDensity No
    assert (sdir / "vrad.dat").exists()               # WriteVelocity default
    assert (sdir / "Qplus.dat").exists()              # WriteQPlus
    assert not (sdir / "Qminus.dat").exists()
    assert (sdir / "Tau.dat").exists()                # WriteTau field
    tau = np.fromfile(sdir / "Tau.dat", np.float64)
    assert np.isfinite(tau).all() and (tau > 0).all()
    lum = np.fromfile(sdir / "Luminosity1D.dat", np.float64).reshape(-1, 4)
    assert lum.shape[0] == 32 and np.isfinite(lum).all()
    assert not (tmp_path / "o" / "monitor" / "Quantities.dat").exists()
    dump = (tmp_path / "o" / "default_config.yml").read_text()
    assert "CFL" in dump and "SigmaFloor" in dump     # defaults included


def test_visc_accret_massflow_test_normalization():
    """The test-mode f_const differs from the standard 3/(pi d^2)
    (reference src/accretion.cpp:360-377)."""
    p1 = _phys({"ViscAccretMassflowTest": "yes"})
    p2 = _phys()
    assert p1.visc_accret_massflow_test and not p2.visc_accret_massflow_test


def test_reference_active_param_coverage():
    """Every key in the reference's Active Parameters table
    (/root/reference/parameters.md) must appear in the generated
    docs/parameters.md, except for a short justified exception list.
    Regenerate with ``python tools/gen_params_doc.py`` after adding keys."""
    import re
    from pathlib import Path

    ref_md = Path("/root/reference/parameters.md")
    if not ref_md.exists():
        pytest.skip("reference tree not available")
    act = ref_md.read_text().split("## Active Parameters")[1] \
                            .split("## Nbody Parameters")[0]
    ref_keys = {k for k in re.findall(r"^\| (\S+)\s+\|", act, re.M)
                if k != "Parameter" and not k.startswith(":")}

    ours = (Path(__file__).parent.parent / "docs" /
            "parameters.md").read_text()
    our_keys = set(re.findall(r"`([A-Za-z0-9]+)`", ours))

    # FLD solver-debug hooks (reference src/fld.cpp:123-131): the
    # reference uses them to run its SOR solver against analytic
    # solutions inside the production binary; this repo isolates the
    # solver in tests/test_fld.py instead.  RadiativeDiffusionTest1D IS
    # wired (constant flux limiter; exercised by tests/test_fld1d.py).
    exceptions = {
        "RadiativeDiffusionCheckSolution",
        "RadiativeDiffusionDumpData",
        "RadiativeDiffusionTest2D",
        "RadiativeDiffusionTest2DDensity",
        "RadiativeDiffusionTest2DK",
        "RadiativeDiffusionTest2DSteps",
    }
    missing = ref_keys - our_keys - exceptions
    assert not missing, f"undocumented reference params: {sorted(missing)}"
