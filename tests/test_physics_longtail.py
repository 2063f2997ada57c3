"""Round-2 physics long tail: viscous damping target, FLD auto-omega,
Ziampras-2023 beta cooling, self-gravity kernel update cadence.

Each feature sits behind its reference YAML key and is validated against
the reference formula it re-derives (citations per test).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fargocpt_tpu import units as u
from fargocpt_tpu.constants import Constants
from fargocpt_tpu.grid import Geometry
from fargocpt_tpu.params import Physics, ADIABATIC
from fargocpt_tpu.ops.common import prepare_geom


def _geom(nrad=64, naz=8, rmin=0.4, rmax=2.5, spacing="Log"):
    geom = Geometry.build(nrad, naz, rmin, rmax, spacing)
    return geom, prepare_geom(geom, jnp.float64)


# ---------------------------------------------------------------------------
# damping to the viscous radial drift (reference damping.cpp:623-678)
# ---------------------------------------------------------------------------

def test_viscous_vrad_damping_target():
    from fargocpt_tpu.ops.damping import DampingZones
    from fargocpt_tpu.ops.boundary import RefValues
    geom, g = _geom()
    phys = Physics(damping=True, damping_inner_limit=1.4,
                   damping_outer_limit=1.0, damping_time_factor=1e-6,
                   damping_vradial_inner="viscous",
                   viscous_outflow_speed=2.0, hydro_center_mass=1.0)
    dz = DampingZones(phys, Constants.shock_tube(), geom, jnp.float64)
    nr, naz = geom.nrad, geom.naz
    sigma = jnp.ones((nr, naz))
    vrad = jnp.full((nr + 1, naz), 0.3)
    vaz = jnp.ones((nr, naz))
    energy = jnp.zeros((nr, naz))
    nu = jnp.asarray(
        np.linspace(1.0, 2.0, nr)[:, None] * np.ones((1, naz)))
    ref = RefValues(sigma0=sigma, vrad0=vrad, vaz0=vaz, energy0=energy)
    # huge dt + tiny tau: relaxes fully onto the target
    _, vrad_new, _, _ = dz.apply(phys, sigma, vrad, vaz, energy, ref,
                                 dt=1e9, nu=nu)
    nu_face = np.concatenate([np.asarray(nu[:1]),
                              0.5 * (np.asarray(nu[1:]) + np.asarray(nu[:-1])),
                              np.asarray(nu[-1:])])
    expected = -1.5 * 2.0 * nu_face / geom.ra[:nr + 1, None]
    in_zone = geom.ra[:nr + 1] < geom.rmin * 1.4
    assert in_zone.sum() > 3
    np.testing.assert_allclose(np.asarray(vrad_new)[in_zone],
                               expected[in_zone], rtol=1e-12)
    # outside the zone vrad is untouched
    np.testing.assert_array_equal(np.asarray(vrad_new)[~in_zone], 0.3)
    # outer viscous damping must hard-error like the reference (:124-127)
    phys_bad = phys.with_(damping_vradial_inner="none",
                          damping_vradial_outer="viscous")
    with pytest.raises(NotImplementedError):
        dz.apply(phys_bad, sigma, vrad, vaz, energy, ref, dt=1.0, nu=nu)


# ---------------------------------------------------------------------------
# FLD adaptive SOR omega (reference fld.cpp:698-700, 773-792)
# ---------------------------------------------------------------------------

def test_fld_auto_omega_walk():
    from fargocpt_tpu.ops.fld import FLDSolver, FLDConfig
    geom, g = _geom(32, 8, 0.1, 10.0, "Arithmetic")
    phys = Physics(eos=ADIABATIC, adiabatic_index=1.4, mu=2.35,
                   minimum_temperature=0.0, maximum_temperature=1e300)
    solver = FLDSolver(phys, Constants.shock_tube(), u.shock_tube_units(),
                       geom, FLDConfig(tolerance=1e-13, omega=1.5,
                                       auto_omega=True), jnp.float64)
    st = solver.initial_sor_state(jnp.float64)
    assert float(st[0]) == 1.5 and float(st[1]) == 1.0
    # iteration count improved vs the (max_iterations) seed: keep walking up
    st1 = solver.adapt_omega(st, jnp.asarray(100, jnp.int32))
    assert float(st1[0]) == pytest.approx(1.51)
    assert float(st1[2]) == 100.0
    # count worsened: direction flips
    st2 = solver.adapt_omega(st1, jnp.asarray(200, jnp.int32))
    assert float(st2[0]) == pytest.approx(1.50)
    assert float(st2[1]) == -1.0
    # walking off the bottom clamps to 1.0 and reverses
    st_low = jnp.asarray([1.005, -1.0, 50.0])
    st3 = solver.adapt_omega(st_low, jnp.asarray(40, jnp.int32))
    assert float(st3[0]) == 1.0 and float(st3[1]) == 1.0
    # ... off the top clamps to 1.99 with direction -1
    st_hi = jnp.asarray([1.995, 1.0, 50.0])
    st4 = solver.adapt_omega(st_hi, jnp.asarray(40, jnp.int32))
    assert float(st4[0]) == 1.99 and float(st4[1]) == -1.0

    # the carried omega actually drives the solve: identical physical
    # answer (tolerance-level), different iteration counts
    nr, naz = geom.nrad, geom.naz
    T = jnp.asarray(1.0 + 0.1 * np.random.default_rng(0).random((nr, naz)))
    ka = jnp.full((nr + 1, naz), 1.0)
    kb = jnp.full((nr, naz), 1.0)
    rho = jnp.ones((nr, naz))
    A, B, C, D, E = solver.matrix_elements(g, rho, ka, kb, 1e-4,
                                           test_2d=True)
    T_fix, n_fix = solver.solve(T, T, A, B, C, D, E)
    T_auto, n_auto = solver.solve(T, T, A, B, C, D, E,
                                  omega=jnp.asarray(1.2))
    assert int(n_fix) != int(n_auto)
    np.testing.assert_allclose(np.asarray(T_fix), np.asarray(T_auto),
                               rtol=0, atol=1e-9)


# ---------------------------------------------------------------------------
# Ziampras 2023 beta cooling (reference SourceEuler.cpp:655-760)
# ---------------------------------------------------------------------------

def test_ziampras_beta_cooling_surf():
    from fargocpt_tpu.ops import energy as energy_ops
    geom, g = _geom()
    consts = Constants.shock_tube()
    phys = Physics(eos=ADIABATIC, adiabatic_index=1.4, mu=1.0,
                   cooling_beta_enabled=True, cooling_beta_method="surf",
                   cooling_beta=7.0,  # must be ignored by the local beta
                   opacity_mode="const", kappa_const=2.0,
                   hydro_center_mass=1.0, density_factor=1.0,
                   tau_factor=1.0, tau_min=0.0,
                   minimum_temperature=0.0, maximum_temperature=1e300)
    nr, naz = geom.nrad, geom.naz
    sigma = jnp.full((nr, naz), 0.5)
    h = jnp.asarray(0.05 * geom.rmed[:, None] * np.ones((1, naz)))
    c_v = consts.R / (phys.mu * 0.4)
    T = jnp.full((nr, naz), 2.0)
    energy = c_v * T * sigma
    q = energy_ops.beta_cooling(
        phys, consts, g, sigma, energy, sigma, energy, 0.0,
        temperature=T, kappa=jnp.full((nr, naz), 2.0), scale_height=h)
    # manual: tau = 0.5*kappa*sigma = 0.5; tau_eff = 3/16 + 1/4 + 1/2
    tau_eff = 3.0 * 0.5 / 8.0 + 0.25 + 1.0 / (4.0 * 0.5)
    q_surf = 2.0 * consts.sigma_sb * 2.0 ** 4 / tau_eff
    omega_k = np.sqrt(consts.G * 1.0 / geom.rmed ** 3)
    beta_inv = q_surf / (np.asarray(energy)[:, 0] * omega_k)
    expected = np.asarray(energy)[:, 0] * omega_k * beta_inv
    np.testing.assert_allclose(np.asarray(q)[:, 0], expected, rtol=1e-12)
    # 'tot' adds the midplane diffusion channel: strictly faster cooling
    q_tot = energy_ops.beta_cooling(
        phys.with_(cooling_beta_method="tot"), consts, g, sigma, energy,
        sigma, energy, 0.0, temperature=T,
        kappa=jnp.full((nr, naz), 2.0), scale_height=h)
    assert (np.asarray(q_tot) > np.asarray(q)).all()


def test_ziampras_key_enables_beta_cooling():
    from fargocpt_tpu.config import Config
    from fargocpt_tpu.params import physics_from_config
    cfg = Config.from_dict({
        "EquationOfState": "Ideal", "CoolingBetaZiampras2023": "Yes",
        "CoolingBetaZiampras2023Method": "mid",
    })
    phys = physics_from_config(cfg, u.shock_tube_units())
    assert phys.cooling_beta_enabled
    assert phys.cooling_beta_method == "mid"


# ---------------------------------------------------------------------------
# self-gravity kernel refresh cadence (reference selfgravity.cpp:186-214)
# ---------------------------------------------------------------------------

def test_sg_kernel_update_cadence():
    from fargocpt_tpu.ops.selfgravity import SelfGravity, kernel_host
    geom, g = _geom(32, 16)
    phys = Physics(eos=ADIABATIC, adiabatic_index=1.4,
                   self_gravity=True, self_gravity_mode="symmetric",
                   aspectratio_ref=0.05, hydro_center_mass=1.0,
                   sg_kernel_update_interval=3,
                   sg_kernel_aspectratio_threshold=0.001)
    sg = SelfGravity(phys, Constants.shock_tube(), geom, jnp.float64)
    nr, naz = geom.nrad, geom.naz
    sigma = jnp.ones((nr, naz))
    # disk with aspect ratio 0.08 everywhere
    h = jnp.asarray(0.08 * geom.rmed[:, None] * np.ones((1, naz)))

    ks = sg.initial_kernel_state()
    # first call is due (counter seeded at N) and 0.08 != 0 -> rebuild
    ks1 = sg.update_kernel(ks, sigma, h, g)
    k_ref = np.fft.rfft2(kernel_host(phys, geom, 0.08)[0])
    np.testing.assert_allclose(np.asarray(ks1[0]), k_ref, rtol=1e-10)
    assert float(ks1[2]) == pytest.approx(0.08)
    assert int(ks1[3]) == 0

    # within the cadence window nothing changes even if H drifts
    h2 = jnp.asarray(0.12 * geom.rmed[:, None] * np.ones((1, naz)))
    ks2 = sg.update_kernel(ks1, sigma, h2, g)
    assert int(ks2[3]) == 1
    np.testing.assert_array_equal(np.asarray(ks2[0]), np.asarray(ks1[0]))
    ks3 = sg.update_kernel(ks2, sigma, h2, g)
    assert int(ks3[3]) == 2
    # Nth call: due again, aspect ratio moved -> rebuild at 0.12
    ks4 = sg.update_kernel(ks3, sigma, h2, g)
    k_ref2 = np.fft.rfft2(kernel_host(phys, geom, 0.12)[0])
    np.testing.assert_allclose(np.asarray(ks4[0]), k_ref2, rtol=1e-10)

    # due but under threshold: counter resets, kernel kept
    h3 = h2 * (1.0 + 1e-5)
    ks5 = sg.update_kernel(ks4, sigma, h3, g)
    ks6 = sg.update_kernel(ks5, sigma, h3, g)
    ks7 = sg.update_kernel(ks6, sigma, h3, g)
    np.testing.assert_array_equal(np.asarray(ks7[0]), np.asarray(ks4[0]))


# ---------------------------------------------------------------------------
# CartesianParticles + RK45 step-size persistence
# (reference parameters.cpp:854-932, particle.h timestep/facold)
# ---------------------------------------------------------------------------

def _particle_setup(cartesian):
    from fargocpt_tpu.particles import dust
    from fargocpt_tpu.ops import gravity
    import jax.numpy as jnp
    geom, g = _geom(64, 32, 0.4, 2.5)
    phys = Physics(hydro_center_mass=1.0)
    consts = Constants.shock_tube()
    pp = dust.ParticleParams(density=1.0, gas_drag=False,
                             integrator="explicit", cartesian=cartesian,
                             min_escape_radius=0.1, max_escape_radius=10.0)
    n = 4
    r = np.array([0.8, 1.0, 1.3, 1.8])
    vk = np.sqrt(consts.G / r)
    # eccentric: launch at apocenter with reduced vphi
    e = 0.3
    vphi = vk * np.sqrt((1 - e) / (1 + e))
    st = dust.ParticleState(
        r=jnp.asarray(r), phi=jnp.zeros(n), r_dot=jnp.zeros(n),
        phi_dot=jnp.asarray(vphi / r), size=jnp.full(n, 1e-10),
        stokes=jnp.zeros(n), alive=jnp.ones(n, bool),
        rng_key=__import__("jax").random.PRNGKey(0),
        timestep=jnp.zeros(n), facold=jnp.full(n, 1e-4))
    nr, naz = geom.nrad, geom.naz
    rho = jnp.ones((nr, naz))
    temp = jnp.full((nr, naz), 1e-8)
    vrad = jnp.zeros((nr + 1, naz))
    vaz = jnp.asarray(np.sqrt(1.0 / geom.rmed)[:, None]
                      * np.ones((1, naz)))
    from fargocpt_tpu import units as uu
    bodies = gravity.single_star()
    import types
    return (phys, pp, consts, uu.shock_tube_units(), geom, g, st,
            rho, temp, vrad, vaz, bodies)


@pytest.mark.slow
def test_cartesian_particles_match_polar():
    """Gravity-only eccentric orbits integrated in cartesian vs polar
    coordinates agree to ~1e-9 over several dynamical times."""
    from fargocpt_tpu.particles import dust
    out = {}
    for cart in (False, True):
        (phys, pp, consts, un, geom, g, st, rho, temp, vrad, vaz,
         bodies) = _particle_setup(cart)
        for _ in range(20):
            st = dust.integrate_rk45(phys, pp, consts, un, geom, g, st,
                                     rho, temp, vrad, vaz, bodies, 1,
                                     0.0, 0.3)
        out[cart] = (np.asarray(st.r), np.asarray(st.phi))
    np.testing.assert_allclose(out[True][0], out[False][0],
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(out[True][1], out[False][1],
                               rtol=0, atol=1e-8)


def test_rk45_step_size_persists():
    """The per-particle adaptive step survives across calls (reference
    particle.h carries timestep/facold) and is re-used as the next trial."""
    from fargocpt_tpu.particles import dust
    (phys, pp, consts, un, geom, g, st, rho, temp, vrad, vaz,
     bodies) = _particle_setup(False)
    st1 = dust.integrate_rk45(phys, pp, consts, un, geom, g, st,
                              rho, temp, vrad, vaz, bodies, 1, 0.0, 0.5)
    h1 = np.asarray(st1.timestep)
    assert (h1 > 0).all()
    assert (np.asarray(st1.facold) != 1e-4).any()
    st2 = dust.integrate_rk45(phys, pp, consts, un, geom, g, st1,
                              rho, temp, vrad, vaz, bodies, 1, 0.0, 0.5)
    assert (np.asarray(st2.timestep) > 0).all()
