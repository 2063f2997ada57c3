"""Lagrangian dust: radial drift speed vs theory.

Port of reference test/dust_drift: particles of different sizes embedded in
a pressure-supported isothermal disk must drift inward at
v_drift = eta vK / (St + 1/St), eta = h^2 (-sigmaslope - Tslope)
(Nakagawa et al. 1986 / Picogna & Kley 2015 eq. C.1), matching to 1%
averaged over the last tenth of the time series
(reference test/dust_drift/calc_deviation.py:33-62).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation

H0 = 0.05
SIGMA_SLOPE = 1.0
T_SLOPE = 1.0   # = 1 - 2*FlaringIndex with F = 0


def drift_config(orbits=20):
    return Config.from_dict({
        "Sigma0": "88.87231453905 g/cm2", "SigmaSlope": str(SIGMA_SLOPE),
        "SigmaFloor": "1e-7",
        "AspectRatio": str(H0), "FlaringIndex": "0.0",
        "ViscousAlpha": "0.0", "ConstantViscosity": "0.0",
        "ArtificialViscosity": "None",
        "EquationOfState": "Isothermal",
        # reference dust_drift.yml: "Need to set thickness smoothing to zero
        # in order to compare to the theoretical drift rates."
        "ThicknessSmoothing": "0.0",
        "InnerBoundary": "reflecting", "OuterBoundary": "reflecting",
        "Damping": "Yes", "DampingInnerLimit": "1.10",
        "DampingOuterLimit": "0.90",
        "DampingVRadialInner": "initial", "DampingVRadialOuter": "initial",
        "Transport": "FARGO",
        "Nrad": "192", "Naz": "384", "Rmin": "0.5", "Rmax": "3.0",
        "RadialSpacing": "Logarithmic",
        "Nsnapshots": "1", "Nmonitor": str(orbits * 10),
        "MonitorTimestep": "0.628318531",
        "IntegrateParticles": "Yes",
        "ParticleIntegrator": "midpoint",
        "NumberOfParticles": "5", "ParticleSpeciesNumber": "5",
        "ParticleRadius": "1e-14",   # code units; overridden below
        "ParticleDensity": "2.65 g/cm3",
        "ParticleMinimumRadius": "0.6", "ParticleMaximumRadius": "2.5",
        "ParticleMinimumEscapeRadius": "0.52",
        "ParticleMaximumEscapeRadius": "2.9",
        "ParticleGasDragEnabled": "yes",
        "ParticleDustDiffusion": "no",
    })


@pytest.mark.slow
def test_dust_drift_speed():
    sim = Simulation(drift_config())

    # place one particle per size at r ~ 1.3 on circular Keplerian orbits,
    # sizes spanning St ~ 3e-3 .. 3e1
    n = 5
    sizes = np.array([4e-15, 4e-14, 4e-13, 4e-12, 4e-11])
    r0 = np.full(n, 1.3)
    p = sim.state.particles
    vk = np.sqrt(sim.constants.G * sim.phys.hydro_center_mass / r0)
    p = p.replace(r=jnp.asarray(r0), phi=jnp.asarray(np.linspace(0, 5, n)),
                  r_dot=jnp.zeros(n), phi_dot=jnp.asarray(vk / r0),
                  size=jnp.asarray(sizes), alive=jnp.ones(n, bool))
    sim.state = sim.state.replace(particles=p)

    times, radii, stokes, vgr = [], [], [], []

    def record(s):
        times.append(s.time)
        pr = np.asarray(s.state.particles.r).copy()
        radii.append(pr)
        stokes.append(np.asarray(s.state.particles.stokes).copy())
        # gas radial velocity at the particle radii (the drift theory is
        # relative to the gas; the residual numerical gas drift ~1e-7 vK
        # would otherwise dominate for St << 1)
        vr_prof = np.asarray(s.fields.vrad).mean(1)
        vgr.append(np.interp(pr, s.geometry.radii, vr_prof))

    sim.monitor_hooks.append(record)
    sim.run()

    t = np.array(times[1:])
    r = np.array(radii[1:])          # (Nt, n)
    st = np.array(stokes[1:])
    vg = np.array(vgr[1:])
    assert np.all(np.asarray(sim.state.particles.alive))

    rdot = (r[1:] - r[:-1]) / (t[1:] - t[:-1])[:, None]
    # average over the final third (epicycle oscillations of the largest-St
    # particle need several orbits to average out; the reference runs 100
    # orbits and averages 10)
    navg = max(len(rdot) // 3, 3)
    eta = H0 ** 2 * (-SIGMA_SLOPE - T_SLOPE)
    for k in range(n):
        st_avg = st[-navg:, k].mean()
        r_avg = r[-navg:, k].mean()
        v_k = np.sqrt(sim.constants.G / r_avg)
        vtheo = eta * v_k / (st_avg + 1.0 / st_avg)
        gas_advection = vg[-navg:, k].mean() / (1.0 + st_avg ** 2)
        q = (np.mean(rdot[-navg:, k]) - gas_advection) / vtheo
        assert abs(q - 1.0) < 0.015, \
            f"particle {k}: St={st_avg:.3g}, vdrift/vtheo = {q:.4f}"


@pytest.mark.slow
def test_dust_diffusion_variance():
    """Stochastic diffusion (analog of reference test/dust_diffusion): the
    radial variance of a tightly coupled particle swarm grows as 2 D t with
    D = alpha cs H r (Charnoz et al. 2011)."""
    cfg_dict = dict(drift_config(orbits=2)._raw)
    cfg_dict.update({
        "viscousalpha": "0.01",
        "numberofparticles": "4000", "particlespeciesnumber": "1",
        "particledustdiffusion": "yes",
        "particlegasdragenabled": "no",
        "nrad": "96", "naz": "64",
    })
    sim = Simulation(Config.from_dict(cfg_dict))
    n = 4000
    p = sim.state.particles
    r0 = np.full(n, 1.3)
    vk = np.sqrt(sim.constants.G / r0)
    p = p.replace(r=jnp.asarray(r0),
                  phi=jnp.asarray(np.random.default_rng(0).random(n) * 6.28),
                  r_dot=jnp.zeros(n), phi_dot=jnp.asarray(vk / r0),
                  alive=jnp.ones(n, bool))
    sim.state = sim.state.replace(particles=p)
    sim.run()
    r = np.asarray(sim.state.particles.r)
    var = np.var(r)
    h0, alpha, r_c = H0, 0.01, 1.3
    cs = h0 / np.sqrt(r_c)               # cs = h0 vK (F = 0)
    D = alpha * cs * h0 * r_c            # Dg = alpha cs (H/r) r = alpha cs H
    expected = 2.0 * D * sim.time
    assert abs(var / expected - 1.0) < 0.2, (var, expected)


def test_particle_state_smoke():
    """Particles integrate inside the jitted step and keep sane values."""
    sim = Simulation(drift_config(orbits=1))
    sim.run(max_steps=50)
    p = sim.state.particles
    assert np.all(np.isfinite(np.asarray(p.r)))
    assert np.all(np.asarray(p.stokes) > 0)


def test_rk45_kepler_orbit_conservation():
    """Drag-free adaptive Cash-Karp RK45 (reference
    src/particles/particles.cpp:1677-2015) conserves orbital energy and
    angular momentum of an eccentric orbit to the controller tolerance."""
    from fargocpt_tpu.particles import dust
    from fargocpt_tpu.params import Physics
    from fargocpt_tpu.constants import Constants
    from fargocpt_tpu.units import Units
    from fargocpt_tpu.grid import Geometry
    from fargocpt_tpu.ops.common import prepare_geom
    from fargocpt_tpu.ops.gravity import BodiesOnGrid
    import jax

    phys = Physics(hydro_center_mass=1.0)
    constants = Constants()
    geom = Geometry.build(32, 16, 0.2, 5.0, "Log")
    g = prepare_geom(geom, jnp.float64)
    bodies = BodiesOnGrid(x=jnp.zeros(1), y=jnp.zeros(1),
                          mass=jnp.ones(1),
                          cubic_smoothing_radius=jnp.zeros(1))
    pp = dust.ParticleParams(gas_drag=False, integrator="explicit",
                             min_escape_radius=0.01,
                             max_escape_radius=100.0)
    # eccentric orbits: start at apocenter r = a(1+e)
    a = jnp.asarray([1.0, 1.5])
    e = jnp.asarray([0.5, 0.3])
    r0 = a * (1 + e)
    vphi = jnp.sqrt(constants.G * 1.0 / a) * jnp.sqrt((1 - e) / (1 + e))
    state = dust.ParticleState(
        r=r0, phi=jnp.zeros(2), r_dot=jnp.zeros(2), phi_dot=vphi / r0,
        size=jnp.full(2, 1e-5), stokes=jnp.zeros(2),
        alive=jnp.ones(2, bool), rng_key=jax.random.PRNGKey(0))

    def invariants(s):
        l = s.r ** 2 * s.phi_dot
        en = 0.5 * (s.r_dot ** 2 + (s.r * s.phi_dot) ** 2) \
            - constants.G / s.r
        return np.asarray(en), np.asarray(l)

    e0, l0 = invariants(state)
    rho = jnp.ones((32, 16))
    temp = jnp.ones((32, 16))
    vrad = jnp.zeros((33, 16))
    vaz = jnp.ones((32, 16))
    period = 2 * np.pi
    n_steps = 20
    for _ in range(n_steps):
        state = dust.integrate_rk45(
            phys, pp, constants, Units(), geom, g, state, rho, temp, vrad,
            vaz, bodies, 1, jnp.float64(0.0), jnp.float64(period / n_steps))
    e1, l1 = invariants(state)
    np.testing.assert_allclose(e1, e0, rtol=1e-9)
    np.testing.assert_allclose(l1, l0, rtol=1e-9)
    # one full period for particle 0: back at apocenter (phi = 0, r = 1.5)
    dphi = float(jnp.mod(state.phi[0] + np.pi, 2 * np.pi) - np.pi)
    assert abs(dphi) < 1e-4
    assert np.isclose(float(state.r[0]), 1.5, rtol=1e-5)


def test_particle_snapshot_restart(tmp_path):
    """Particles are written per snapshot and restored exactly
    (reference src/particles/particles.cpp:2176 write / :797 restart)."""
    from fargocpt_tpu import output as out
    sim = Simulation(drift_config(orbits=1), outdir=str(tmp_path / "o"))
    out.OutputWriter(sim)
    sim.run(max_steps=30)
    sdir = tmp_path / "o" / "snapshots"
    snaps = [x for x in (sdir / "list.txt").read_text().split() if x]
    arr = np.fromfile(sdir / snaps[-1] / "particles.bin",
                      np.float64).reshape(-1, 9)
    assert arr.shape[0] == 5 and np.all(np.isfinite(arr))

    sim2 = Simulation(drift_config(orbits=1), outdir=str(tmp_path / "o2"))
    out.restore_simulation(sim2, tmp_path / "o", snaps[-1])
    p2 = sim2.state.particles
    np.testing.assert_array_equal(arr[:, 0], np.asarray(p2.r))
    np.testing.assert_array_equal(arr[:, 3], np.asarray(p2.phi_dot))
    np.testing.assert_array_equal(arr[:, 6] > 0.5, np.asarray(p2.alive))
    # adaptive-integrator memory restores too (columns 7/8)
    np.testing.assert_array_equal(arr[:, 7], np.asarray(p2.timestep))
    np.testing.assert_array_equal(arr[:, 8], np.asarray(p2.facold))

    # analysis Loader particle API (reference
    # python_module/fargocpt/data.py Particles)
    from fargocpt_tpu.analysis import Loader
    ld = Loader(tmp_path / "o")
    assert ld.particles.columns[:2] == ["r", "phi"]
    np.testing.assert_array_equal(ld.particles.get("r", snaps[-1]),
                                  arr[:, 0])
    x = ld.particles.get("x", snaps[-1])
    np.testing.assert_allclose(x, arr[:, 0] * np.cos(arr[:, 1]),
                               rtol=1e-14)
    r_cgs = ld.particles.get("r", snaps[-1], cgs=True)
    fac = ld.particles.factors["r"]
    np.testing.assert_allclose(r_cgs, arr[:, 0] * fac, rtol=1e-14)
    ts = ld.particles.timeseries(["r", "vx"])
    assert ts["r"].shape == (len(ld.snapshots), arr.shape[0])
    # snapshot config provenance
    pr = ld.params()
    assert "Nrad" in pr
    # cgs factor application on a 2-D field
    sig_code = ld.gas.get("Sigma", snaps[-1], grid=False)
    sig_cgs = ld.gas.get("Sigma", snaps[-1], grid=False, cgs=True)
    np.testing.assert_allclose(
        sig_cgs, sig_code * ld.gas.cgs_factor("Sigma"), rtol=1e-14)
    assert ld.gas.cgs_factor("Sigma") > 1.0
    assert "Sigma" in ld.gas.var_names(snaps[-1])


def test_particle_disk_gravity_kick():
    """ParticleDiskGravityEnabled: the SG acceleration field pulls
    particles (reference src/particles/particles.cpp:1506-1524)."""
    from fargocpt_tpu.particles import dust
    from fargocpt_tpu.params import Physics
    from fargocpt_tpu.constants import Constants
    from fargocpt_tpu.units import Units
    from fargocpt_tpu.grid import Geometry
    from fargocpt_tpu.ops.common import prepare_geom
    from fargocpt_tpu.ops.gravity import BodiesOnGrid
    import jax

    phys = Physics(hydro_center_mass=1.0)
    constants = Constants()
    geom = Geometry.build(32, 16, 0.2, 5.0, "Log")
    g = prepare_geom(geom, jnp.float64)
    bodies = BodiesOnGrid(x=jnp.zeros(1), y=jnp.zeros(1), mass=jnp.ones(1),
                          cubic_smoothing_radius=jnp.zeros(1))
    pp = dust.ParticleParams(gas_drag=False, disk_gravity=True,
                             min_escape_radius=0.01,
                             max_escape_radius=100.0)
    state = dust.ParticleState(
        r=jnp.asarray([1.0]), phi=jnp.asarray([0.0]),
        r_dot=jnp.zeros(1), phi_dot=jnp.asarray([1.0]),
        size=jnp.full(1, 1e-5), stokes=jnp.zeros(1),
        alive=jnp.ones(1, bool), rng_key=jax.random.PRNGKey(0))
    ones = jnp.ones((32, 16))
    zeros_vr = jnp.zeros((33, 16))
    # uniform inward SG acceleration: effective central mass increases ->
    # the circular particle falls inward vs the no-SG run
    sg = (-0.2 * jnp.ones((32, 16)), jnp.zeros((32, 16)))
    dt = jnp.float64(0.05)
    s_nog = dust.integrate_expmid(phys, pp, constants, Units(), geom, g,
                                  state, ones, ones, zeros_vr, ones,
                                  bodies, 1, jnp.float64(0.0), dt)
    s_sg = dust.integrate_expmid(phys, pp, constants, Units(), geom, g,
                                 state, ones, ones, zeros_vr, ones,
                                 bodies, 1, jnp.float64(0.0), dt,
                                 sg_accel=sg)
    assert float(s_sg.r_dot[0]) < float(s_nog.r_dot[0])
    np.testing.assert_allclose(float(s_sg.r_dot[0] - s_nog.r_dot[0]),
                               -0.2 * 0.05, rtol=0.1)


def test_analytic_ladder_matches_searchsorted():
    """The analytic log-ladder radial lookup (dust._lin_weights) must
    reproduce searchsorted-based interpolation VALUES on a log grid —
    index flips at cell boundaries are allowed (the clamped weight makes
    the interpolant continuous there) but values must agree."""
    from fargocpt_tpu.particles import dust

    rng = np.random.default_rng(5)
    nr, naz = 96, 64
    g = (2.5 / 0.4) ** (1.0 / (nr - 2))
    radii = 0.4 * g ** (np.arange(nr + 1) - 1.0)
    rmed = 0.5 * (radii[:-1] + radii[1:])

    # ladder detected for the geometric grid, not for an arithmetic one
    assert dust._geometric_ladder(rmed) is not None
    assert dust._geometric_ladder(np.linspace(0.4, 2.5, nr)) is None
    # nor for a traced/jnp array (searchsorted fallback)
    assert dust._geometric_ladder(jnp.asarray(rmed)) is None

    field = rng.random((nr, naz))
    r = rng.uniform(radii[1], radii[-2], 4096)
    # include exact boundary hits and out-of-range queries
    r = np.concatenate([r, rmed[3:10], [0.0, radii[0] * 0.5, radii[-1] * 2]])
    phi = rng.uniform(0, 2 * np.pi, r.size)

    out_analytic = np.asarray(dust.interpolate(
        jnp.asarray(field), rmed, jnp.asarray(r), jnp.asarray(phi), naz))
    out_searchsorted = np.asarray(dust.interpolate(
        jnp.asarray(field), jnp.asarray(rmed), jnp.asarray(r),
        jnp.asarray(phi), naz))
    np.testing.assert_allclose(out_analytic, out_searchsorted,
                               rtol=0, atol=1e-9)
