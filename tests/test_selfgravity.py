"""Self-gravity FFT solver vs direct N^2 summation.

Port of reference test/self_gravity: the azimuthally-averaged radial SG
acceleration of a Sigma ~ 1/r disk on a 128x256 log grid must match direct
summation with the Moldenhauer (symmetric) smoothing to max relative error
< 0.0014 for r > 2 (reference test/self_gravity/testconfig.yml).
"""

import numpy as np
import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation


def sg_config():
    return Config.from_dict({
        "EquationOfState": "isothermal", "AspectRatio": "0.05",
        "FlaringIndex": "0.0",
        "Sigma0": "200 g/cm2", "SigmaSlope": "1", "SigmaFloor": "1e-9",
        "SelfGravity": "yes", "SelfGravityMode": "symmetric",
        "ThicknessSmoothing": "0.6", "ThicknessSmoothingSG": "0.6",
        "Nrad": "128", "Naz": "256", "Rmin": "1", "Rmax": "12.5",
        "RadialSpacing": "Logarithmic",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.1",
    })


def direct_sum_gr(geom, sigma, h0, G):
    """Direct smoothed summation (reference
    test/self_gravity/check_results.py:9-94) at azimuth column 1."""
    lam = 0.4571 * h0 + 0.6737 * np.sqrt(h0)
    chi = 0.6472 * h0 - 0.7543 * h0 ** 2
    phi = geom.phi
    R = geom.rmed[:, None] * np.ones((1, geom.naz))
    X = R * np.cos(phi)[None, :]
    Y = R * np.sin(phi)[None, :]
    A = geom.surf[:, None] * np.ones((1, geom.naz))
    k = 1
    gr = np.zeros(geom.nrad)
    for n in range(geom.nrad):
        r1 = geom.rmed[n]
        x1, y1 = X[n, k], Y[n, k]
        eps_sq = lam ** 2 * (r1 - R) ** 2 + chi ** 2 * r1 * R
        dx = x1 - X
        dy = y1 - Y
        dsq = dx ** 2 + dy ** 2
        accx = -G * A * sigma * dx / (dsq + eps_sq) ** 1.5
        accy = -G * A * sigma * dy / (dsq + eps_sq) ** 1.5
        gr[n] = accx.sum() * np.cos(phi[k]) + accy.sum() * np.sin(phi[k])
    return gr


@pytest.mark.slow
def test_sg_fft_vs_direct_sum():
    sim = Simulation(sg_config())
    sigma = np.asarray(sim.fields.sigma)

    import jax.numpy as jnp
    g_r, g_t = sim.stepper.selfgravity.accelerations(jnp.asarray(sigma))
    gr_code = np.asarray(g_r).mean(axis=1)

    gr_direct = direct_sum_gr(sim.geometry, sigma, 0.05, sim.constants.G)

    mask = sim.geometry.rmed > 2.0
    rel = np.abs(gr_code[mask] / gr_direct[mask] - 1.0)
    assert rel.max() < 0.0014, f"max rel diff {rel.max():.3e}"
    # axisymmetric disk: azimuthal acceleration ~ 0
    assert np.abs(np.asarray(g_t)).max() < np.abs(gr_code).max() * 1e-10


def test_sg_vaz_correction_applied():
    """With SG on, the initial v_az exceeds the non-SG equilibrium (the
    disk pulls inward)."""
    sim_sg = Simulation(sg_config())
    cfg = sg_config()
    cfg._raw["selfgravity"] = "no"
    sim_no = Simulation(cfg)
    vaz_sg = np.asarray(sim_sg.fields.vaz)[64, 0]
    vaz_no = np.asarray(sim_no.fields.vaz)[64, 0]
    assert vaz_sg > vaz_no
