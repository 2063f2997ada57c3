"""Overview dashboard: static render + live-follow mode (reference
python_module/fargocpt/overview.py Overview.show(follow=...))."""

import threading
from pathlib import Path

import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation
from fargocpt_tpu import output as out


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ov")
    cfg = Config.from_dict({
        "EquationOfState": "Ideal", "AdiabaticIndex": "1.4",
        "AspectRatio": "0.05", "ViscousAlpha": "0.001",
        "Sigma0": "200 g/cm2", "SigmaSlope": "0.5",
        "ArtificialViscosity": "SN",
        "Nrad": "32", "Naz": "16", "Rmin": "0.4", "Rmax": "2.5",
        "RadialSpacing": "Log",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": "2", "Nmonitor": "1", "MonitorTimestep": "0.02",
        "nbody": [{"name": "star", "semi-major axis": "0.0", "mass": "1.0"},
                  {"name": "planet", "semi-major axis": "1.0",
                   "mass": "1e-4"}],
    })
    sim = Simulation(cfg, outdir=str(tmp / "o"))
    out.OutputWriter(sim)
    sim.run()
    return tmp / "o"


def test_static_overview(run_dir, tmp_path):
    from fargocpt_tpu.overview import make_overview
    png = tmp_path / "ov.png"
    make_overview(str(run_dir), "last", str(png))
    assert png.exists() and png.stat().st_size > 10000


def test_follow_refreshes_on_new_snapshot(run_dir, tmp_path):
    """The follower must render each newly-registered snapshot in turn.
    follow() runs on the MAIN thread (matplotlib deadlocks when driven
    from a worker thread under pytest's capture); a helper thread plays
    the running simulation by appending the second registry line once
    the first render has landed."""
    import time

    from fargocpt_tpu.overview import follow

    list_txt = Path(run_dir) / "snapshots" / "list.txt"
    full = [ln for ln in list_txt.read_text().splitlines() if ln]
    assert len(full) >= 2
    # rewind the registry to one snapshot, then append the second while
    # the follower is polling — it must render both in turn
    list_txt.write_text(full[0] + "\n")
    png = tmp_path / "live.png"

    def appender():
        deadline = time.monotonic() + 120
        while not png.exists() and time.monotonic() < deadline:
            time.sleep(0.05)
        with open(list_txt, "a") as f:
            f.write(full[1] + "\n")

    t = threading.Thread(target=appender)
    t.start()
    try:
        n = follow(str(run_dir), str(png), interval=0.05, max_updates=2,
                   timeout=180)
    finally:
        t.join(timeout=10)
        list_txt.write_text("\n".join(full) + "\n")
    assert n == 2
    assert png.exists()
