"""``fargocpt_tpu data`` / ``fargocpt_tpu config`` info subcommands
(reference python_module/fargocpt/_command_line_.py:4-39, data.py:1120-1162,
config.py:12-52)."""

import json
import os
import subprocess
import sys

import numpy as np

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation
from fargocpt_tpu import output as out


def _tiny_output(tmp_path):
    outdir = tmp_path / "out"
    cfg = Config.from_dict({
        "EquationOfState": "Ideal", "AdiabaticIndex": "1.4",
        "AspectRatio": "0.05", "ViscousAlpha": "0.001",
        "Sigma0": "200 g/cm2", "SigmaSlope": "0.5",
        "Nrad": "16", "Naz": "8", "Rmin": "0.4", "Rmax": "2.5",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.05",
        "OutputDir": str(outdir),
    })
    sim = Simulation(cfg)
    out.OutputWriter(sim)
    sim.run()
    return outdir


def _cli(args, env_extra=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-m", "fargocpt_tpu", *args],
        capture_output=True, text=True, env=env, timeout=600)


def test_data_subcommand(tmp_path):
    outdir = _tiny_output(tmp_path)

    r = _cli(["data", str(outdir)])
    assert r.returncode == 0, r.stderr
    assert "snapshots: ['0', '1']" in r.stdout
    assert "grid: 16 x 8" in r.stdout

    # dotted-path navigation + the get(name, N) fallback
    r = _cli(["data", str(outdir), "gas.Sigma", "1"])
    assert r.returncode == 0, r.stderr
    assert "array" in r.stdout or "[" in r.stdout

    r = _cli(["data", str(outdir), "snapshots"])
    assert r.returncode == 0, r.stderr
    assert "['0', '1']" in r.stdout

    # a missing directory exits nonzero with a message, not a traceback
    r = _cli(["data", str(tmp_path / "nope")])
    assert r.returncode == 1


def test_config_subcommand(tmp_path):
    env = {"XDG_CONFIG_HOME": str(tmp_path / "cfg")}
    r = _cli(["config", "show"], env)
    assert r.returncode == 0, r.stderr
    assert "config file:" in r.stdout

    r = _cli(["config", "set", "default_dtype", "float32"], env)
    assert r.returncode == 0, r.stderr
    stored = json.loads(
        (tmp_path / "cfg" / "fargocpt_tpu" / "config.json").read_text())
    assert stored["default_dtype"] == "float32"

    r = _cli(["config", "get", "default_dtype"], env)
    assert r.stdout.strip() == "float32"

    r = _cli(["config", "remove", "default_dtype"], env)
    assert r.returncode == 0, r.stderr
    r = _cli(["config", "get", "default_dtype"], env)
    assert r.stdout.strip() == ""

    # unknown keys are rejected (reference information_types gate)
    r = _cli(["config", "set", "bogus_key", "1"], env)
    assert r.returncode != 0
