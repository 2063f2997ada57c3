"""Output layout + restart fidelity (analog of reference test/binary_io and
the bitwise-identical-restart design goal, src/restart.cpp:76-90)."""

import struct
import subprocess
import sys

import numpy as np
import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation
from fargocpt_tpu import output as out


def cfg_dict(outdir, monitors=2):
    return {
        "EquationOfState": "Ideal", "AdiabaticIndex": "1.4",
        "AspectRatio": "0.05", "ViscousAlpha": "0.002",
        "Sigma0": "200 g/cm2", "SigmaSlope": "0.5",
        "HeatingViscous": "Yes", "CoolingBetaLocal": "Yes",
        "CoolingBeta": "10", "ArtificialViscosity": "SN",
        "Nrad": "32", "Naz": "16", "Rmin": "0.4", "Rmax": "2.5",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": str(monitors), "Nmonitor": "1",
        "MonitorTimestep": "0.3",
        "BitwiseExactRestarting": "yes",
        "OutputDir": str(outdir),
        "nbody": [
            {"name": "star", "semi-major axis": "0.0", "mass": "1.0"},
            {"name": "planet", "semi-major axis": "1.0", "mass": "1e-4"},
        ],
    }


def test_output_layout(tmp_path):
    outdir = tmp_path / "out"
    sim = Simulation(Config.from_dict(cfg_dict(outdir)))
    writer = out.OutputWriter(sim)
    sim.run()

    # static metadata
    dims = np.genfromtxt(outdir / "dimensions.dat", usecols=(4, 5),
                         unpack=True, dtype=int)
    assert tuple(dims) == (32, 16)
    radii = np.genfromtxt(outdir / "used_rad.dat")
    assert radii.shape == (33,)
    assert np.isclose(radii[1], 0.4) and np.isclose(radii[-2], 2.5)

    # snapshots 0..2 registered and readable
    ids = (outdir / "snapshots" / "list.txt").read_text().split()
    assert ids == ["0", "1", "2"]
    sigma = np.fromfile(outdir / "snapshots" / "2" / "Sigma.dat",
                        np.float64).reshape(32, 16)
    assert np.all(np.isfinite(sigma)) and np.all(sigma > 0)
    vrad = np.fromfile(outdir / "snapshots" / "2" / "vrad.dat", np.float64)
    assert vrad.size == 33 * 16

    # misc.bin struct (reference src/output.h:16-24)
    misc = out.load_misc(outdir / "snapshots" / "2")
    assert misc["n_monitor"] == 2
    assert np.isclose(misc["time"], 0.6)

    # Quantities.dat rows
    q = np.loadtxt(outdir / "monitor" / "Quantities.dat")
    assert q.shape[0] == 3        # monitors 0, 1, 2
    assert q.shape[1] == len(out.QUANTITIES_COLUMNS)
    mass_col = out.QUANTITIES_COLUMNS.index("mass")
    assert np.all(q[:, mass_col] > 0)

    # per-planet monitor files
    nb = np.loadtxt(outdir / "monitor" / "nbody1.dat")
    a_col = 12
    assert np.allclose(nb[:, a_col], 1.0, rtol=1e-4)


def test_restart_is_bitwise_identical(tmp_path):
    out_a = tmp_path / "a"
    # run 1: two monitor intervals straight through
    sim_a = Simulation(Config.from_dict(cfg_dict(out_a, monitors=2)))
    out.OutputWriter(sim_a)
    sim_a.run()

    # run 2: one interval, then restart from snapshot 1 and finish
    out_b = tmp_path / "b"
    sim_b = Simulation(Config.from_dict(cfg_dict(out_b, monitors=1)))
    out.OutputWriter(sim_b)
    sim_b.run()

    sim_c = Simulation(Config.from_dict(cfg_dict(out_b, monitors=2)))
    out.restore_simulation(sim_c, out_b, 1)
    assert sim_c.n_monitor == 1
    sim_c.run()

    for name in ("sigma", "vrad", "vaz", "energy"):
        a = np.asarray(getattr(sim_a.fields, name))
        c = np.asarray(getattr(sim_c.fields, name))
        np.testing.assert_array_equal(
            a, c, err_msg=f"{name} not bitwise identical after restart")
    np.testing.assert_array_equal(np.asarray(sim_a.state.nbody.x),
                                  np.asarray(sim_c.state.nbody.x))


def test_diagnostic_outputs(tmp_path):
    """Monitor-grid accumulators, optional Write* snapshot fields, CPD mass
    and lightcurves (reference src/quantities.cpp, src/gas_torques.cpp,
    src/stress.cpp, src/circumplanetary_mass.cpp, src/output.cpp:852)."""
    outdir = tmp_path / "out"
    cfg = cfg_dict(outdir)
    cfg.update({
        "WriteMassFlow": "Yes", "WriteGasTorques": "Yes",
        "WriteTorques": "Yes", "WriteLightCurves": "Yes",
        "WriteLightCurvesRadii": "0.8, 1.5",
        "WriteToomre": "Yes", "WritePressure": "Yes",
        "WriteViscosity": "Yes", "WriteDivV": "Yes",
        "WriteTReynolds": "Yes", "WriteAlphaReynolds": "Yes",
        "WriteEccentricity": "Yes", "WriteSoundSpeed": "Yes",
    })
    sim = Simulation(Config.from_dict(cfg))
    out.OutputWriter(sim)
    sim.run()

    sdir = outdir / "snapshots" / "2"
    for name in ("MassFlow", "AdvectionTorque", "ViscousTorque",
                 "GravitationalTorqueNotIntegrated", "Toomre", "Pressure",
                 "Viscosity", "DivV", "TReynolds", "AlphaReynolds",
                 "EccentricityX", "EccentricityY", "SoundSpeed"):
        arr = np.fromfile(sdir / f"{name}.dat", np.float64).reshape(32, 16)
        assert np.all(np.isfinite(arr)), name
        prof = np.fromfile(sdir / f"{name}1D.dat", np.float64).reshape(-1, 4)
        assert prof.shape[0] == 32, name
    assert np.all(np.fromfile(sdir / "Toomre.dat", np.float64) > 0)
    # the torque grids accumulated something nonzero
    assert np.abs(np.fromfile(sdir / "AdvectionTorque.dat",
                              np.float64)).max() > 0

    # per-planet torque radial profiles
    tq = np.fromfile(sdir / "torque_planet_1D_1.dat",
                     np.float64).reshape(-1, 2)
    assert tq.shape[0] == 32 and np.all(np.isfinite(tq))

    # lightcurves: 2 user radii inside (Rmin, Rmax) + the 2 edges
    lum = np.loadtxt(outdir / "monitor" / "luminosity.dat")
    assert lum.shape == (3, 5)
    assert np.all(lum[:, 1:] >= 0)
    dis = np.loadtxt(outdir / "monitor" / "dissipation.dat")
    assert dis.shape == (3, 5)

    # circumplanetary mass column is filled for the companion (at this
    # coarse resolution only the initial phase has cells inside the tiny
    # Hill sphere)
    nb = np.loadtxt(outdir / "monitor" / "nbody1.dat")
    assert nb[0, 9] > 0 and np.all(nb[:, 9] >= 0)

    # instantaneous torque columns in Quantities.dat
    q = np.loadtxt(outdir / "monitor" / "Quantities.dat")
    col = out.QUANTITIES_COLUMNS.index("advection torque")
    assert np.any(q[:, col] != 0.0)


def test_cli_start_and_auto(tmp_path):
    setup = tmp_path / "setup.yml"
    import yaml
    outdir = tmp_path / "cli_out"
    cfg = cfg_dict(outdir, monitors=1)
    with open(setup, "w") as f:
        yaml.safe_dump(cfg, f)
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "HOME": "/root"}
    import os
    env["PYTHONPATH"] = os.getcwd()
    r = subprocess.run(
        [sys.executable, "-m", "fargocpt_tpu", "start", str(setup)],
        capture_output=True, text=True, env={**os.environ, **env},
        timeout=600)
    assert r.returncode == 0, r.stderr
    assert (outdir / "snapshots" / "1" / "Sigma.dat").exists()
    # auto mode resumes from the last snapshot without rerunning
    r2 = subprocess.run(
        [sys.executable, "-m", "fargocpt_tpu", "auto", str(setup)],
        capture_output=True, text=True, env={**os.environ, **env},
        timeout=600)
    assert r2.returncode == 0, r2.stderr
    assert "resuming from snapshot 1" in r2.stdout


def test_analysis_loader(tmp_path):
    """The analysis Loader reads back everything the writer produces
    (replaces the reference python_module fargocpt.data.Loader)."""
    from fargocpt_tpu.analysis import Loader

    outdir = tmp_path / "out"
    sim = Simulation(Config.from_dict(cfg_dict(outdir)))
    out.OutputWriter(sim)
    sim.run()

    l = Loader(outdir)
    assert l.nrad == 32 and l.naz == 16
    assert l.snapshots == ["0", "1", "2"]

    R, PHI, sigma = l.gas.get("Sigma", "last")
    assert sigma.shape == (32, 16)
    assert R.shape == sigma.shape
    r1, sig_avg = l.gas.avg("Sigma", "last")
    np.testing.assert_allclose(sig_avg, sigma.mean(axis=1), rtol=1e-14)
    r1, smin, smax = l.gas.minmax("Sigma", "last")
    assert np.all(smin <= sig_avg) and np.all(smax >= sig_avg)

    # vrad is face-centered: one extra ring
    _, _, vr = l.gas.get("vrad", "last")
    assert vr.shape == (33, 16)

    t, mass = l.quantities("time", "mass")
    assert t[-1] == 0.6 and np.all(mass > 0)

    orbit = l.nbody(1)
    assert np.allclose(orbit["semi-major axis"], 1.0, rtol=1e-3)

    misc = l.misc("last")
    assert misc["time"] == sim.time

    log = l.timestep_log()
    assert np.all(log["mean dt"] > 0)

    # cgs conversion factors round-trip through units.yml
    assert np.isclose(l.units["length"]["factor"], sim.units.length)


def test_mass_bookkeeping_and_ecc_monitor(tmp_path):
    """Boundary/damping/floor mass columns in Quantities.dat and the
    per-stage eccentricity-change monitor (reference src/types.h:30-60
    BoundaryFlow + src/output.cpp:1275 write_ecc_peri_changes)."""
    outdir = tmp_path / "out"
    cfg = cfg_dict(outdir)
    cfg.update({
        "Damping": "Yes", "DampingInnerLimit": "1.10",
        "DampingOuterLimit": "0.90",
        "DampingSurfaceDensityInner": "initial",
        "DampingSurfaceDensityOuter": "initial",
        "WriteEccentricityChange": "Yes",
    })
    sim = Simulation(Config.from_dict(cfg))
    out.OutputWriter(sim)
    sim.run()

    q = np.loadtxt(outdir / "monitor" / "Quantities.dat")
    cols = out.QUANTITIES_COLUMNS

    def col(name):
        return q[:, cols.index(name)]

    # outflow boundaries move some mass (rows after the first monitor)
    flow = (col("inner boundary mass outflow")
            + col("outer boundary mass outflow")
            + col("inner boundary mass inflow")
            + col("outer boundary mass inflow"))
    assert np.any(flow[1:] > 0)
    # damping towards the initial profile moves mass in the damping zones
    damp = (col("wave damping inner mass creation")
            + col("wave damping inner mass removal")
            + col("wave damping outer mass creation")
            + col("wave damping outer mass removal"))
    assert np.any(damp[1:] > 0)
    assert np.all(col("density floor mass creation") >= 0)

    ecc = np.loadtxt(outdir / "monitor" / "eccentricity_change.dat")
    assert ecc.shape[1] == 13
    assert np.all(np.isfinite(ecc))
    # the per-stage deltas respond to the dynamics
    assert np.any(np.abs(ecc[1:, 3:8]) > 0)


@pytest.mark.slow  # 128 s; test_restart_is_bitwise_identical keeps the
# bitwise-restart gate class in the fast tier
def test_restart_bitwise_pvte_f32(tmp_path):
    """Bitwise restart of the f32 fast-PVTE path: the warm-start solver
    cache (pvte_guess) is pure solver state, but it seeds each step's
    first Newton polish — so a bitwise restart requires the snapshot to
    carry it (PvteGeff/PvteMu.dat, written under BitwiseExactRestarting)
    and the restore to prefer it over a cold re-seed."""
    def cfg(outdir, monitors):
        d = cfg_dict(outdir, monitors=monitors)
        d.update({"EquationOfState": "PVTE",
                  "HydrogenMassFraction": "0.75",
                  "Sigma0": "2000 g/cm2",
                  "SurfaceCooling": "thermal",
                  # the gate is structural (cache snapshotting), not
                  # physics depth: keep the three runs short
                  "MonitorTimestep": "0.1"})
        d.pop("CoolingBetaLocal")
        d.pop("CoolingBeta")
        return d

    out_a = tmp_path / "a"
    sim_a = Simulation(Config.from_dict(cfg(out_a, 2)), dtype="float32")
    assert sim_a.state.pvte_guess is not None
    out.OutputWriter(sim_a)
    sim_a.run()

    out_b = tmp_path / "b"
    sim_b = Simulation(Config.from_dict(cfg(out_b, 1)), dtype="float32")
    out.OutputWriter(sim_b)
    sim_b.run()
    assert (out_b / "snapshots" / "1" / "PvteGeff.dat").exists()
    sim_c = Simulation(Config.from_dict(cfg(out_b, 2)), dtype="float32")
    out.restore_simulation(sim_c, out_b, 1)
    sim_c.run()

    for name in ("sigma", "vrad", "vaz", "energy"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sim_a.fields, name)),
            np.asarray(getattr(sim_c.fields, name)),
            err_msg=f"{name} not bitwise identical (PVTE f32 restart)")


def test_restart_bitwise_corotating_accreting(tmp_path):
    """Bitwise restart in the corotating frame with an accreting planet:
    the rotating-frame initial fields, the carried omega_frame/
    corotation reference, and the grown planet mass must all survive the
    snapshot round-trip (reference src/restart.cpp)."""
    def cfg(outdir, monitors):
        d = cfg_dict(outdir, monitors=monitors)
        d.update({
            "Frame": "C", "CorotationReferenceBody": "1",
            "DiskFeedback": "yes",
            "nbody": [
                {"name": "star", "semi-major axis": "0.0", "mass": "1.0"},
                {"name": "planet", "semi-major axis": "1.0",
                 "mass": "1e-4", "accretion efficiency": "1.0",
                 "accretion method": "kley"},
            ]})
        return d

    out_a = tmp_path / "a"
    sim_a = Simulation(Config.from_dict(cfg(out_a, 2)))
    out.OutputWriter(sim_a)
    sim_a.run()

    out_b = tmp_path / "b"
    sim_b = Simulation(Config.from_dict(cfg(out_b, 1)))
    out.OutputWriter(sim_b)
    sim_b.run()
    sim_c = Simulation(Config.from_dict(cfg(out_b, 2)))
    out.restore_simulation(sim_c, out_b, 1)
    sim_c.run()

    for name in ("sigma", "vrad", "vaz", "energy"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sim_a.fields, name)),
            np.asarray(getattr(sim_c.fields, name)),
            err_msg=f"{name} not bitwise identical (corotating restart)")
    np.testing.assert_array_equal(np.asarray(sim_a.state.nbody.mass),
                                  np.asarray(sim_c.state.nbody.mass))
    assert float(sim_a.state.omega_frame) == float(sim_c.state.omega_frame)
    assert float(sim_a.state.corot_ref_x) == float(sim_c.state.corot_ref_x)
