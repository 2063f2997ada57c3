"""Initial-condition extensions: simplex-noise randomization, file-based
Sigma/energy conditions, circumbinary ring, secondary disk, centrifugal
balance (reference src/init.cpp:255-341, 624-1060, 1638-1717)."""

import numpy as np
import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.constants import Constants
from fargocpt_tpu.grid import Geometry
from fargocpt_tpu.params import Physics
from fargocpt_tpu.sim import Simulation
from fargocpt_tpu import initial


def test_simplex_noise_properties():
    rng = np.random.default_rng(1)
    x = rng.uniform(-10, 10, 4096)
    y = rng.uniform(-10, 10, 4096)
    n = initial.simplex_noise_2d(x, y, seed=3)
    assert n.shape == x.shape
    assert np.all(np.abs(n) <= 1.0)
    assert abs(n.mean()) < 0.05
    assert n.std() > 0.05                      # actually varies
    # deterministic in the seed
    n2 = initial.simplex_noise_2d(x, y, seed=3)
    np.testing.assert_array_equal(n, n2)
    n3 = initial.simplex_noise_2d(x, y, seed=4)
    assert not np.array_equal(n, n3)


def test_randomize_sigma_bounded():
    phys = Physics(sigma0=1.0, sigma_slope=0.5, sigma_randomize=True,
                   sigma_random_factor=0.1, sigma_feature_size=0.05,
                   random_seed=7)
    geom = Geometry.build(64, 64, 0.4, 2.5, "Log")
    sigma = initial.powerlaw_sigma(phys, geom)
    out = initial.randomize_sigma(phys, geom, sigma)
    rel = out / sigma - 1.0
    assert np.abs(rel).max() <= 0.1 + 1e-12
    assert np.abs(rel).std() > 1e-3


def test_sigma_condition_from_files(tmp_path):
    geom = Geometry.build(32, 16, 0.4, 2.5, "Log")
    # 1D file in the written [r, avg, min, max] layout
    r = np.linspace(0.3, 2.7, 50)
    prof = 7.0 * r ** -1.0
    np.stack([r, prof, prof, prof], 1).astype(np.float64).tofile(
        tmp_path / "sig1d.dat")
    # 2D raw file
    sig2d = np.full((32, 16), 3.25)
    sig2d.tofile(tmp_path / "sig2d.dat")

    phys = Physics(sigma_condition="1d",
                   sigma_filename=str(tmp_path / "sig1d.dat"))
    st, _ = initial.build_initial_state(phys, Constants(), geom)
    np.testing.assert_allclose(np.asarray(st.sigma)[:, 0],
                               7.0 * geom.rmed ** -1.0, rtol=1e-3)

    phys = Physics(sigma_condition="2d",
                   sigma_filename=str(tmp_path / "sig2d.dat"))
    st, _ = initial.build_initial_state(phys, Constants(), geom)
    np.testing.assert_array_equal(np.asarray(st.sigma), sig2d)


def test_circumbinary_ring_enhancement():
    phys = Physics(sigma0=1.0, sigma_slope=0.5, cbd_ring=True,
                   cbd_ring_position=1.5, cbd_ring_width=0.2,
                   cbd_decay_width=0.28, cbd_decay_exponent=0.75,
                   cbd_ring_enhancement_factor=2.5)
    geom = Geometry.build(128, 4, 0.4, 4.0, "Log")
    st, _ = initial.build_initial_state(phys, Constants(), geom)
    sig = np.asarray(st.sigma)[:, 0]
    base = phys.sigma0 * geom.rmed ** -0.5
    ratio = sig / base
    # peak near the enhancement factor (the x^0.75 decay side is steep at
    # the ring position, so the discrete peak sits slightly below 2.5)
    assert 1.9 < ratio.max() < 2.55
    k = np.argmin(np.abs(geom.rmed - 1.5))
    assert abs(np.argmax(ratio) - k) <= 1          # peak at the ring
    assert ratio[5] < 1.1 and ratio[-3] < 1.3      # far wings ~ profile


def test_centrifugal_balance_equilibrium():
    """Balanced rotation curve satisfies v^2/r = GM/r^2 + dP/dr/Sigma
    better than the smoothed-profile default."""
    phys = Physics(eos="adiabatic", adiabatic_index=1.4,
                   aspectratio_ref=0.1, sigma0=1e-3, sigma_slope=1.0,
                   centrifugal_balance=True)
    geom = Geometry.build(128, 4, 0.4, 2.5, "Log")
    constants = Constants()
    st, _ = initial.build_initial_state(phys, constants, geom)
    sig = np.asarray(st.sigma)[:, 0]
    e = np.asarray(st.energy)[:, 0]
    press = (1.4 - 1.0) * e
    vaz = np.asarray(st.vaz)[:, 0]
    r = geom.rmed
    # residual of radial force balance at interfaces
    dpdr = (press[1:] - press[:-1]) / (r[1:] - r[:-1])
    sig_i = 0.5 * (sig[1:] + sig[:-1])
    ri = geom.rinf[1:]
    grav = constants.G * phys.hydro_center_mass / ri ** 2
    # staggered average reconstructs the interface rotation speed
    v_i = 0.5 * (vaz[1:] + vaz[:-1])
    resid = v_i ** 2 / ri - grav - dpdr / sig_i
    scale = np.abs(grav)
    assert np.median(np.abs(resid[2:-2] / scale[2:-2])) < 0.01


def test_secondary_disk_smoke(tmp_path):
    cfg = Config.from_dict({
        "EquationOfState": "Isothermal", "AspectRatio": "0.05",
        "Sigma0": "100 g/cm2", "SigmaSlope": "1.0",
        "ViscousAlpha": "0.001", "SecondaryDisk": "Yes",
        "ProfileCutoffOuter": "Yes", "ProfileCutoffPointOuter": "0.4",
        "ProfileCutoffWidthOuter": "0.1",
        "Nrad": "64", "Naz": "64", "Rmin": "0.2", "Rmax": "2.0",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.2",
        "OutputDir": str(tmp_path / "o"),
        "nbody": [
            {"name": "primary", "semi-major axis": "0.0", "mass": "1.0"},
            {"name": "secondary", "semi-major axis": "1.0", "mass": "0.2"},
        ],
    })
    sim = Simulation(cfg)
    sig0 = np.asarray(sim.fields.sigma)
    # enhanced density near the secondary at (≈1, 0)
    x, y = sim.geometry.cell_centers_xy()
    near = np.hypot(x - float(sim.state.nbody.x[1]),
                    y - float(sim.state.nbody.y[1])) < 0.1
    far = ~near
    assert sig0[near].mean() > 2.0 * np.median(sig0[far])
    sim.run()
    assert np.all(np.isfinite(np.asarray(sim.fields.sigma)))
