"""Parity of the fused Pallas transport kernels with the pure-jnp path.

On CPU the kernels run in Pallas interpret mode; on TPU they compile. The
physics tests all exercise the jnp path (CPU backend), so this parity test
is what ties the TPU production path to the validated implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from fargocpt_tpu.grid import Geometry
from fargocpt_tpu.params import Physics
from fargocpt_tpu.ops.common import prepare_geom
from fargocpt_tpu.ops import transport
from fargocpt_tpu.ops import pallas_kernels as pk


@pytest.fixture(scope="module")
def setup():
    geom = Geometry.build(64, 256, 0.4, 2.5, "Log")
    g = prepare_geom(geom, jnp.float64)
    phys = Physics()
    rng = np.random.default_rng(42)
    K = 6
    qs = jnp.asarray(rng.random((K, 64, 256)) + 0.5)
    v = jnp.asarray((rng.random((64, 256)) - 0.5) * 0.05)
    return g, phys, qs, v


def _interpret():
    return pltpu.force_tpu_interpret_mode()


def test_theta_sweep_parity(setup):
    g, phys, qs, v = setup
    dt = jnp.float64(0.01)
    sig = qs[-1]
    ds = transport.star_theta(phys, g, sig, v, dt)
    ref = transport.van_leer_theta_batch(phys, g, qs, sig, ds, v, dt)
    with _interpret():
        out = pk.theta_sweep_pallas(qs, v, g.rb, g.rsup - g.rinf,
                                    g.inv_surf, dt, dphi=g.dphi,
                                    limiter=0, tile=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)


def test_theta_sweep_parity_mc_limiter(setup):
    g, _, qs, v = setup
    phys = Physics(flux_limiter_type=1)
    dt = jnp.float64(0.01)
    sig = qs[-1]
    ds = transport.star_theta(phys, g, sig, v, dt)
    ref = transport.van_leer_theta_batch(phys, g, qs, sig, ds, v, dt)
    with _interpret():
        out = pk.theta_sweep_pallas(qs, v, g.rb, g.rsup - g.rinf,
                                    g.inv_surf, dt, dphi=g.dphi,
                                    limiter=1, tile=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("limiter", [0, 1])
def test_radial_sweep_parity(setup, limiter):
    g, _, qs, _ = setup
    phys = Physics(flux_limiter_type=limiter)
    dt = jnp.float64(0.01)
    rng = np.random.default_rng(3)
    vrad = jnp.asarray((rng.random((65, 256)) - 0.5) * 0.05)
    sig = qs[-1]
    ds = transport.star_radial(phys, g, sig, vrad, dt)
    ref, ref_flux = transport.van_leer_radial_batch(phys, g, qs, sig, ds,
                                                    vrad, dt)
    base = dt * g.dphi * g.ra * ds * vrad
    rme = g.rmed_ext
    zc = jnp.zeros((1, 1), rme.dtype)
    cm = jnp.concatenate([zc, rme[1:] - rme[:-1]], axis=0)
    cp = jnp.concatenate([rme[1:] - rme[:-1], zc], axis=0)
    with _interpret():
        out = pk.radial_sweep_pallas(qs, sig, vrad, base, dt,
                                     g.inv_diff_rmed, cm, cp, g.inv_surf,
                                     limiter=limiter)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)
    # base doubles as the sigma flux used for mass-flow monitoring
    np.testing.assert_allclose(np.asarray(base), np.asarray(ref_flux[-1]),
                               rtol=1e-12, atol=1e-16)


@pytest.mark.parametrize("k_quant", [5, 6])
def test_radial_momenta_sweep_parity(setup, k_quant):
    """Fused momenta construction + radial sweep matches compute_momenta
    followed by the batched jnp sweep."""
    g, phys, qs, v = setup
    dt = jnp.float64(0.01)
    rng = np.random.default_rng(11)
    sigma = jnp.asarray(rng.random((64, 256)) + 0.5)
    energy = jnp.asarray(rng.random((64, 256)) + 0.2)
    vaz = jnp.asarray((rng.random((64, 256)) - 0.5) * 0.1 + 1.0)
    vrad = jnp.asarray((rng.random((65, 256)) - 0.5) * 0.05)
    omega = jnp.float64(0.3)

    rp, rm, ap, am = transport.compute_momenta(g, sigma, vrad, vaz, omega)
    names = [rp, rm, ap, am] + ([energy] if k_quant == 6 else []) + [sigma]
    stack = jnp.stack(names, axis=0)
    ds = transport.star_radial(phys, g, sigma, vrad, dt)
    ref, _ = transport.van_leer_radial_batch(phys, g, stack, sigma, ds,
                                             vrad, dt)

    base = dt * g.dphi * g.ra * ds * vrad
    rme = g.rmed_ext
    zc = jnp.zeros((1, 1), rme.dtype)
    cm = jnp.concatenate([zc, rme[1:] - rme[:-1]], axis=0)
    cp = jnp.concatenate([rme[1:] - rme[:-1], zc], axis=0)
    with _interpret():
        out = pk.radial_momenta_sweep_pallas(
            sigma, vrad, vaz, energy if k_quant == 6 else sigma, base, dt,
            omega, g.rb, g.inv_diff_rmed, cm, cp, g.inv_surf,
            k_quant=k_quant, limiter=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)


def test_advect_shift_parity(setup):
    g, phys, qs, v = setup
    rng = np.random.default_rng(7)
    nshift = jnp.asarray(rng.integers(-40, 40, 64), jnp.int32)
    ref = transport.advect_shift(qs, nshift)
    with _interpret():
        out = pk.advect_shift_pallas(qs, nshift, tile=16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("adiabatic,sn", [(True, True), (False, False)])
def test_cfl_fused_parity(adiabatic, sn):
    """Fused CFL kernel matches condition_cfl (including the in-kernel
    sound speed / viscosity derivation)."""
    from fargocpt_tpu.constants import Constants
    from fargocpt_tpu.ops import cfl as cfl_mod, eos
    from fargocpt_tpu.params import ARTVISC_SN

    geom = Geometry.build(64, 256, 0.4, 2.5, "Log")
    g = prepare_geom(geom, jnp.float64)
    phys = Physics(eos="adiabatic" if adiabatic else "isothermal",
                   adiabatic_index=1.4, viscous_alpha=1e-3,
                   aspectratio_ref=0.05,
                   artificial_viscosity="sn" if sn else "tw")
    constants = Constants()
    rng = np.random.default_rng(2)
    sigma = jnp.asarray(rng.random((64, 256)) + 0.5)
    energy = jnp.asarray(rng.random((64, 256)) * 1e-3 + 1e-3)
    vaz = jnp.asarray((rng.random((64, 256)) - 0.5) * 0.1 + 1.0)
    vrad = jnp.asarray((rng.random((65, 256)) - 0.5) * 0.05)
    qp = jnp.asarray(rng.random((64, 256)) * 1e-6)
    qm = jnp.asarray(rng.random((64, 256)) * 1e-6)

    cs_iso = eos.sound_speed_iso_profile(phys, constants, g.rb)
    cs = eos.sound_speed(phys, constants, g, sigma, energy, cs_iso)
    h = eos.scale_height(phys, constants, g, cs)
    nu = phys.viscous_alpha * cs * h
    ref = cfl_mod.condition_cfl(phys, g, sigma, vrad, vaz, energy, cs, nu,
                                qp, qm)

    omega_k = jnp.sqrt(constants.G * phys.hydro_center_mass / g.rb ** 3)
    hfac = 1.0 / (jnp.sqrt(phys.adiabatic_index) * omega_k) if adiabatic \
        else 1.0 / omega_k
    cols = pk.make_cfl_cols(g, cs_iso, hfac, jnp.float64)
    vmean = jnp.mean(vaz, axis=-1, keepdims=True)
    with _interpret():
        dt_min = pk.cfl_pallas(
            sigma, energy, vrad, vaz, qp, qm, vmean, cols,
            adiabatic=adiabatic, gamma=1.4, alpha=1e-3, const_nu=0.0,
            c2=phys.artificial_viscosity_factor ** 2, lf=1.0,
            inv_hc_limit=1.0 / phys.heating_cooling_cfl_limit,
            cfl=phys.cfl, sn=sn, fast=True, dphi=g.dphi,
            invdphi=g.invdphi)
    omega_row = vmean * g.inv_rb
    denom = jnp.abs(omega_row[:-1] - omega_row[1:]) + 1e-100
    dt_shear = jnp.min((phys.cfl * g.dphi / denom)[:62])
    out = jnp.minimum(dt_shear, dt_min)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-12)


@pytest.mark.parametrize("adiabatic", [True, False])
def test_sources_fused_parity(adiabatic):
    """Fused potential+sources kernel matches nbody_potential followed by
    update_with_sourceterms."""
    from fargocpt_tpu.constants import Constants
    from fargocpt_tpu.ops import gravity, sources, eos

    geom = Geometry.build(64, 256, 0.4, 2.5, "Log")
    g = prepare_geom(geom, jnp.float64)
    phys = Physics(eos="adiabatic" if adiabatic else "isothermal",
                   adiabatic_index=1.4, thickness_smoothing=0.6,
                   aspectratio_ref=0.05, imposed_disk_drift=1e-4)
    constants = Constants()
    rng = np.random.default_rng(5)
    sigma = jnp.asarray(rng.random((64, 256)) + 0.5)
    energy = jnp.asarray(rng.random((64, 256)) * 1e-3 + 1e-3)
    vaz = jnp.asarray((rng.random((64, 256)) - 0.5) * 0.1 + 1.0)
    vrad = jnp.asarray((rng.random((65, 256)) - 0.5) * 0.05)
    dt = jnp.float64(0.003)
    omega = jnp.float64(0.4)
    it = (jnp.float64(1e-5), jnp.float64(-2e-5))

    bodies = gravity.BodiesOnGrid(
        x=jnp.asarray([0.0, 1.0]), y=jnp.asarray([0.0, 0.3]),
        mass=jnp.asarray([1.0, 1e-3]),
        cubic_smoothing_radius=jnp.asarray([0.0, 0.05]))
    x, y = geom.cell_centers_xy()
    cx, cy = jnp.asarray(x), jnp.asarray(y)

    cs_iso = eos.sound_speed_iso_profile(phys, constants, g.rb)
    cs = eos.sound_speed(phys, constants, g, sigma, energy, cs_iso)
    press = eos.pressure(phys, constants, sigma, energy, cs)
    h = eos.scale_height(phys, constants, g, cs)
    pot = gravity.nbody_potential(phys, constants, g, bodies, 2, cx, cy, h,
                                  it[0], it[1])
    vr_ref, va_ref, e_ref = sources.update_with_sourceterms(
        phys, g, sigma, press, pot, vrad, vaz, energy, omega, dt)

    cols, cos_row, sin_row, modes = pk.make_sources_prep(
        phys, constants, geom, g, cs_iso, 2, jnp.float64)
    per_body = jnp.stack(
        [constants.G * bodies.mass, bodies.x, bodies.y,
         bodies.cubic_smoothing_radius, jnp.zeros(2)], axis=1).reshape(-1)
    scal = jnp.concatenate([jnp.stack([dt, omega, it[0], it[1]]), per_body])
    with _interpret():
        vr, va = pk.sources_fused_pallas(
            sigma, energy, vaz, vrad, cols, cos_row, sin_row, scal,
            n_bodies=2, adiabatic=adiabatic, gamma=phys.adiabatic_index,
            eps=phys.thickness_smoothing, smooth_modes=modes)
    e = sources.compression_heating(phys, g, energy, vr, va, dt)
    np.testing.assert_allclose(np.asarray(vr), np.asarray(vr_ref),
                               rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(np.asarray(va), np.asarray(va_ref),
                               rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref),
                               rtol=1e-11, atol=1e-16)


@pytest.mark.parametrize("two_pass", [True, False])
def test_fargo_theta_fused_parity(setup, two_pass):
    """The fully-fused azimuthal kernel (sweeps + integer roll) matches the
    composed jnp path."""
    g, phys, qs, v = setup
    dt = jnp.float64(0.01)
    rng = np.random.default_rng(7)
    vconst = jnp.asarray((rng.random((64, 1)) - 0.5) * 0.02)
    nshift = jnp.asarray(rng.integers(-40, 40, 64), jnp.int32)

    ref = qs
    passes = [v, jnp.broadcast_to(vconst, v.shape)] if two_pass \
        else [v + vconst]
    for vv in passes:
        sig = ref[-1]
        ds = transport.star_theta(phys, g, sig, vv, dt)
        ref = transport.van_leer_theta_batch(phys, g, ref, sig, ds, vv, dt)
    ref = transport.advect_shift(ref, nshift)

    vres = v if two_pass else v + vconst
    with _interpret():
        out = pk.fargo_theta_pallas(qs, vres, vconst, nshift, g.rb,
                                    g.rsup - g.rinf, g.inv_surf, dt,
                                    dphi=g.dphi, limiter=0, tile=16,
                                    two_pass=two_pass)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("dissipation", [True, False])
def test_artvisc_fused_parity(setup, dissipation):
    """Fused SN artificial viscosity matches the jnp implementation."""
    from fargocpt_tpu.ops import artvisc
    g, _, qs, v = setup
    phys = Physics(eos="adiabatic", artificial_viscosity="sn",
                   artificial_viscosity_dissipation=dissipation)
    rng = np.random.default_rng(9)
    sigma = jnp.asarray(rng.random((64, 256)) + 0.5)
    energy = jnp.asarray(rng.random((64, 256)) + 0.2)
    vaz = jnp.asarray((rng.random((64, 256)) - 0.5) * 0.3)
    vrad = jnp.asarray((rng.random((65, 256)) - 0.5) * 0.3)
    dt = jnp.float64(0.01)
    vr_ref, va_ref, e_ref = artvisc.update_sn(phys, g, sigma, vrad, vaz,
                                              energy, dt)
    cols = pk.make_artvisc_cols(g, jnp.float64)
    with _interpret():
        vr, va, e = pk.artvisc_sn_pallas(
            sigma, vrad, vaz, energy, cols, dt,
            c2=phys.artificial_viscosity_factor ** 2,
            dissipation=dissipation, invdphi=g.invdphi)
    np.testing.assert_allclose(np.asarray(vr), np.asarray(vr_ref),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(va), np.asarray(va_ref),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref),
                               rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize("artvisc_on", ["sn", "tw", "none"])
@pytest.mark.parametrize("adiabatic", [True, False])
def test_viscous_kick_fused_parity(setup, compress, artvisc_on, adiabatic):
    """The fused viscous-kick kernel (compression heating + SN artvisc +
    viscosity chain + SubStep3; velocity-only for locally-isothermal)
    matches the composed jnp substeps."""
    from fargocpt_tpu.constants import Constants
    from fargocpt_tpu.ops import artvisc, eos, sources
    from fargocpt_tpu.ops import energy as energy_ops
    from fargocpt_tpu.ops import viscosity as visc

    g, _, _, _ = setup
    phys = Physics(
        eos="adiabatic" if adiabatic else "isothermal",
        adiabatic_index=1.4, viscous_alpha=1e-3,
        aspectratio_ref=0.05, flaring_index=0.25,
        artificial_viscosity=artvisc_on,
        artificial_viscosity_dissipation=True,
        heating_viscous=True, cooling_beta_enabled=True, cooling_beta=10.0,
        minimum_temperature=1e-6, sigma0=1.0, sigma_floor=1e-6)
    from fargocpt_tpu.units import Units
    constants = Constants.from_units(Units())
    rng = np.random.default_rng(11)
    sigma = jnp.asarray(rng.random((64, 256)) + 0.5)
    # a few near-floor cells to exercise the equilibrium branch
    sigma = sigma.at[20, 3:7].set(5e-6)
    energy = jnp.asarray(rng.random((64, 256)) * 1e-3 + 1e-3)
    vaz = jnp.asarray((rng.random((64, 256)) - 0.5) * 0.1 + 1.0)
    vrad = jnp.asarray((rng.random((65, 256)) - 0.5) * 0.05)
    dt = jnp.float64(0.003)

    # --- composed jnp reference chain (the _substeps sequence) ---
    en = energy
    if compress:
        en = sources.compression_heating(phys, g, en, vrad, vaz, dt)
    vr1, va1, e1 = artvisc.update_with_artificial_viscosity(
        phys, g, sigma, vrad, vaz, en, dt)
    if adiabatic:
        e1 = eos.energy_floor_ceiling(phys, constants, sigma, e1)
    cs_iso = eos.sound_speed_iso_profile(phys, constants, g.rb)
    cs = eos.sound_speed(phys, constants, g, sigma, e1, cs_iso)
    h = eos.scale_height(phys, constants, g, cs)
    nu = visc.kinematic_viscosity(phys, g, cs, h)
    trr, tpp, trp, divv = visc.viscous_stress_tensor(
        phys, g, sigma, vr1, va1, nu)
    vr2, va2 = visc.update_velocities_with_viscosity(
        phys, g, sigma, vr1, va1, trr, tpp, trp, dt, nu=nu)
    if adiabatic:
        e2, qp_ref, qm_ref = energy_ops.substep3(
            phys, constants, g, sigma, e1, vr2, va2, nu, trr, tpp, trp,
            divv, h, sigma, e1, jnp.zeros_like(sigma), 0.0, dt)
    else:
        e2 = e1
        qp_ref = jnp.zeros_like(sigma)
        qm_ref = jnp.zeros_like(sigma)

    # --- fused kernel ---
    gam = phys.adiabatic_index
    cols = pk.make_viscous_prep(phys, constants, g, jnp.float64, 16)
    with _interpret():
        vr, va, e, qp, qm = pk.viscous_kick_pallas(
            sigma, vrad, vaz, energy, cols, dt,
            jnp.float64(1.0 / phys.cooling_beta),
            tile=16, adiabatic=adiabatic, gamma=gam,
            alpha=phys.viscous_alpha,
            const_nu=phys.constant_viscosity,
            c2=phys.artificial_viscosity_factor ** 2,
            artvisc={"none": 0, "sn": 1, "tw": 2}[artvisc_on],
            dissipation=True, compress=compress,
            heating=True, heat_factor=phys.heating_viscous_factor,
            rvf=phys.radial_viscosity_factor, beta_on=True,
            tmin=phys.minimum_temperature,
            tmax=eos.finite_in(phys.maximum_temperature, jnp.float64),
            rs=constants.R / (phys.mu * (gam - 1.0)),
            rad_fac=8.0 * constants.sigma_sb / constants.c,
            mu_fac=(phys.mu * (gam - 1.0) / constants.R) ** 4,
            sig_nf=10.0 * phys.sigma0 * phys.sigma_floor,
            invdphi=g.invdphi)
    np.testing.assert_allclose(np.asarray(vr), np.asarray(vr2),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(va), np.asarray(va2),
                               rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e2),
                               rtol=1e-10, atol=1e-16)
    # Q+ ring NR-1 deviates by design (no radial wrap of tau_rp); all
    # rings that feed the CFL and the energy update match
    np.testing.assert_allclose(np.asarray(qp)[:63], np.asarray(qp_ref)[:63],
                               rtol=1e-10, atol=1e-18)
    np.testing.assert_allclose(np.asarray(qm)[:63], np.asarray(qm_ref)[:63],
                               rtol=1e-10, atol=1e-18)


@pytest.mark.parametrize("static_shift", [False, True])
@pytest.mark.parametrize("fast", [True, False])
@pytest.mark.parametrize("adiabatic", [True, False])
def test_transport_fused_parity(setup, adiabatic, fast, static_shift):
    """The single-kernel fused transport (momenta + radial sweep + both
    azimuthal sweeps + FARGO roll + velocity reconstruction) matches the
    composed jnp transport path — with both FARGO-shift strategies: the
    per-row dynamic roll (f32 production) and the static-roll+select bit
    decomposition (the f64 path, which must be roll-exact since a
    rotation decomposes exactly into power-of-two rotations)."""
    g, _, _, _ = setup
    phys = Physics(eos="adiabatic" if adiabatic else "isothermal",
                   adiabatic_index=1.4, aspectratio_ref=0.05,
                   fast_transport=fast)
    rng = np.random.default_rng(13)
    sigma = jnp.asarray(rng.random((64, 256)) + 0.5)
    energy = jnp.asarray(rng.random((64, 256)) * 1e-3 + 1e-3)
    vaz = jnp.asarray((rng.random((64, 256)) - 0.5) * 0.1 + 1.0)
    vrad = jnp.asarray((rng.random((65, 256)) - 0.5) * 0.05)
    dt = jnp.float64(0.01)
    omega = jnp.float64(0.3)

    s_ref, vr_ref, va_ref, e_ref, mf_ref = transport.transport(
        phys, g, sigma, vrad, vaz, energy, omega, dt)

    vmean = jnp.mean(vaz, axis=-1, keepdims=True)
    ntilde = vmean * g.inv_rb * dt * g.invdphi
    nround = jnp.floor(ntilde + 0.5)
    nshift = nround.astype(jnp.int32)[:, 0]
    vconst = (ntilde - nround) * g.rb * g.dphi / dt
    cols = pk.make_transport_prep(g, jnp.float64, 16)
    with _interpret():
        s, vr, va, e, mf = pk.transport_fused_pallas(
            sigma, vrad, vaz, energy, cols, nshift, vmean, vconst, dt,
            omega, tile=16, adiabatic=adiabatic,
            limiter=phys.flux_limiter_type, fast=fast, dphi=g.dphi,
            static_shift=static_shift)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref),
                               rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(np.asarray(vr), np.asarray(vr_ref),
                               rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(np.asarray(va), np.asarray(va_ref),
                               rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mf_ref),
                               rtol=1e-11, atol=1e-15)
