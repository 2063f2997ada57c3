"""Multi-device sharding: radial-mesh execution must reproduce the
single-device results (the analog of reference test/mpi_simple, but with a
real equivalence check the reference never had)."""

import jax
import numpy as np
import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation
from fargocpt_tpu.parallel import mesh as pmesh


def small_config():
    return Config.from_dict({
        "EquationOfState": "Ideal", "AdiabaticIndex": "1.4",
        "AspectRatio": "0.05", "ViscousAlpha": "0.002",
        "Sigma0": "200 g/cm2", "SigmaSlope": "0.5",
        "HeatingViscous": "Yes", "CoolingBetaLocal": "Yes",
        "CoolingBeta": "10",
        "ArtificialViscosity": "SN",
        "Nrad": "64", "Naz": "32", "Rmin": "0.4", "Rmax": "2.5",
        "RadialSpacing": "Log",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.5",
    })


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device():
    # single device run
    sim1 = Simulation(small_config())
    sim1.run()

    # sharded run over an 8-device radial mesh
    sim8 = Simulation(small_config())
    mesh = pmesh.make_mesh(8)
    sim8.state = pmesh.shard_state(sim8.state, mesh)
    sim8.run()

    assert sim8.n_hydro_iter == sim1.n_hydro_iter
    for name in ("sigma", "vrad", "vaz", "energy"):
        a = np.asarray(getattr(sim1.fields, name))
        b = np.asarray(getattr(sim8.fields, name))
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14,
                                   err_msg=f"{name} diverged under sharding")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharding_layout_preserved():
    sim = Simulation(small_config())
    mesh = pmesh.make_mesh(8)
    sim.state = pmesh.shard_state(sim.state, mesh)
    new_state = sim.stepper.step(sim.state, 0.0, 1e-6)
    # output stays sharded over the radial axis (no silent full gather)
    shard_count = len(new_state.fields.sigma.sharding.device_set)
    assert shard_count == 8
