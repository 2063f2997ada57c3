"""Setup-file tooling: legacy ini -> yml conversion and in-place
parameter editing (reference Tools/ini2yml.py + Tools/chprm.py +
Tools/param_names/replace_parameter_names.py)."""

import subprocess
import sys
from pathlib import Path

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
