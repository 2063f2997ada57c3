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


def test_advect_shift_parity(setup):
    g, phys, qs, v = setup
    rng = np.random.default_rng(7)
    nshift = jnp.asarray(rng.integers(-40, 40, 64), jnp.int32)
    ref = transport.advect_shift(qs, nshift)
    with _interpret():
        out = pk.advect_shift_pallas(qs, nshift, tile=16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
