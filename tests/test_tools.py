"""Setup-file tooling: legacy ini -> yml conversion and in-place
parameter editing (reference Tools/ini2yml.py + Tools/chprm.py +
Tools/param_names/replace_parameter_names.py)."""

import subprocess
import sys
from pathlib import Path

import pytest
import yaml

TOOLS = Path(__file__).resolve().parent.parent / "tools"

LEGACY = """\
### Legacy FARGO-style setup
Nrad            128
Nsec            384     ### azimuthal resolution
Sigma0          200
AlphaViscosity  1e-3
Adiabatic       yes
DT              6.28
Ninterm         10
Ntot            50
StarTemperature 4000
PlanetConfig    {planets}
ThicknessSmoothing 0.6
"""

PLANETS = """\
# name  dist  mass  accret  feelsdisk  nbody  ecc  radius  temp  irradiate
Jupiter  1.0  1e-3  0.0  yes  yes  0.05  0.01  0  no
"""


def test_ini2yml_roundtrip(tmp_path):
    planets = tmp_path / "planets.cfg"
    planets.write_text(PLANETS)
    ini = tmp_path / "setup.par"
    ini.write_text(LEGACY.format(planets=planets))
    out = tmp_path / "setup.yml"
    res = subprocess.run(
        [sys.executable, str(TOOLS / "ini2yml.py"), str(ini), str(out)],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr

    data = yaml.safe_load(out.read_text())
    assert data["Naz"] == "384"                      # Nsec renamed
    assert data["ViscousAlpha"] == "1e-3"            # AlphaViscosity
    assert data["MonitorTimestep"] == "6.28"         # DT
    assert data["Nmonitor"] == "10" and data["Nsnapshots"] == "50"
    assert data["Sigma0"].endswith("g/cm2")          # implicit unit
    assert "Adiabatic" not in data                   # dropped with hint
    assert "Ideal" in res.stderr
    star, planet = data["nbody"]
    assert star["name"] == "DefaultStar"
    assert star["temperature"] == "0"                # no HeatingStar key
    assert planet["name"] == "Jupiter"
    assert planet["mass"] == "1e-3"
    assert planet["temperature"] == "0 K"            # irradiate: no
    assert "feels disk" not in planet

    # the converted file parses in the real config reader
    from fargocpt_tpu.config import Config
    cfg = Config.from_file(str(out))
    assert cfg.get("Naz", type=int) == 384
    assert cfg.get("ViscousAlpha", type=float) == 1e-3


def test_chprm_yaml_and_ini(tmp_path):
    yml = tmp_path / "a.yml"
    yml.write_text("Nrad: 128   # radial\nNaz: 384\n")
    subprocess.run([sys.executable, str(TOOLS / "chprm.py"), str(yml),
                    "Nrad", "512"], check=True, capture_output=True)
    assert yaml.safe_load(yml.read_text()) == {"Nrad": 512, "Naz": 384}
    assert "# radial" in yml.read_text()             # comment preserved

    ini = tmp_path / "a.par"
    ini.write_text("Nrad  128\nNsec  384\n")
    out = tmp_path / "b.par"
    subprocess.run([sys.executable, str(TOOLS / "chprm.py"), str(ini),
                    "Nsec", "768", "-o", str(out)], check=True,
                   capture_output=True)
    assert "Nsec  768" in out.read_text()
    assert "Nsec  384" in ini.read_text()            # -o left input alone

    # ambiguous / absent keys refuse
    dup = tmp_path / "c.yml"
    dup.write_text("Nrad: 1\nNrad: 2\n")
    r = subprocess.run([sys.executable, str(TOOLS / "chprm.py"), str(dup),
                        "Nrad", "3"], capture_output=True, text=True)
    assert r.returncode != 0
    r = subprocess.run([sys.executable, str(TOOLS / "chprm.py"), str(yml),
                        "Missing", "3"], capture_output=True, text=True)
    assert r.returncode != 0


def test_clone_snapshot_restartable(tmp_path):
    """tools/clone_snapshot.py: branch a new output dir off snapshot 1 and
    continue it — the continued run must reproduce the original run's
    final state exactly (restart is bitwise; reference
    Tools/clone_at_timestep.py use case). Driven in-process so the jitted
    step compiles once."""
    import importlib.util
    import numpy as np
    from fargocpt_tpu.config import Config
    from fargocpt_tpu.sim import Simulation
    from fargocpt_tpu import output as out

    cfg_dict = {
        "EquationOfState": "Isothermal", "AspectRatio": "0.05",
        "ViscousAlpha": "0.001", "Sigma0": "200 g/cm2",
        "SigmaSlope": "0.5", "Nrad": "48", "Naz": "16",
        "Rmin": "0.4", "Rmax": "2.5",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": "2", "Nmonitor": "1", "MonitorTimestep": "0.4",
    }
    out_a = tmp_path / "a"
    sim = Simulation(Config.from_dict(cfg_dict), outdir=str(out_a))
    out.OutputWriter(sim)
    sim.run()

    spec = importlib.util.spec_from_file_location(
        "clone_snapshot", TOOLS / "clone_snapshot.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_b = tmp_path / "b"
    sid = mod.clone(out_a, out_b, "1")
    assert sid == "1"
    assert (out_b / "snapshots" / "1").exists()
    assert not (out_b / "snapshots" / "2").exists()
    assert (out_b / "snapshots" / "list.txt").read_text().split() == ["1"]
    # monitor truncated to t <= t(snapshot 1)
    rows = lambda d: [l for l in (d / "monitor" / "Quantities.dat")
                      .read_text().splitlines() if not l.startswith("#")]
    assert 0 < len(rows(out_b)) < len(rows(out_a))

    # continue the clone: must reproduce the original final state
    sim2 = Simulation(Config.from_dict(cfg_dict), outdir=str(out_b))
    out.restore_simulation(sim2, out_b, "1")
    out.OutputWriter(sim2)
    sim2.run()
    a = np.fromfile(out_a / "snapshots" / "2" / "Sigma.dat", np.float64)
    b = np.fromfile(out_b / "snapshots" / "2" / "Sigma.dat", np.float64)
    np.testing.assert_array_equal(a, b)


def test_package_run_and_loader_api(tmp_path):
    """Reference python-module API parity: ``fargocpt.run(args)`` and
    ``fargocpt.Loader`` (python_module/fargocpt/__init__.py) map to
    ``fargocpt_tpu.run`` / ``fargocpt_tpu.Loader``."""
    import io

    import fargocpt_tpu

    setup = tmp_path / "setup.yml"
    setup.write_text("""
EquationOfState: Isothermal
AspectRatio: '0.05'
ViscousAlpha: '0.001'
Sigma0: 200 g/cm2
SigmaSlope: '0.5'
Nrad: '32'
Naz: '16'
Rmin: '0.4'
Rmax: '2.5'
InnerBoundary: outflow
OuterBoundary: outflow
Nsnapshots: '1'
Nmonitor: '1'
MonitorTimestep: '0.05'
""")
    out = tmp_path / "out"
    buf = io.StringIO()
    rc = fargocpt_tpu.run(["start", str(setup), "-o", str(out), "-q"],
                          np=4, nt=2, stdout=buf)
    assert rc == 0
    from fargocpt_tpu import log
    log.set_print_level(log.INFO)     # undo the -q for later tests
    log.finalize()
    ld = fargocpt_tpu.Loader(str(out))
    sig = ld.gas.get("Sigma", "last", grid=False)
    assert sig.shape == (32, 16)
