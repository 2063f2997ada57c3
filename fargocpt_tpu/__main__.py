"""Command-line interface.

Mirrors the reference launcher semantics
(python_module/fargocpt/_command_line_.py + src/options.cpp):

  python -m fargocpt_tpu start setup.yml
  python -m fargocpt_tpu restart <N> setup.yml
  python -m fargocpt_tpu auto setup.yml
  python -m fargocpt_tpu bench [--nrad N --naz N]

No mpirun/NUMA logic is needed: one process drives all local TPU devices
through the jit/mesh machinery.
"""

from __future__ import annotations

import argparse
import signal
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="fargocpt_tpu")
    sub = parser.add_subparsers(dest="mode", required=True)

    for mode in ("start", "auto"):
        p = sub.add_parser(mode)
        p.add_argument("setup", help="YAML setup file")
        p.add_argument("-o", "--outdir", default=None)
        p.add_argument("--dtype", default="float64",
                       choices=["float64", "float32"])
        p.add_argument("-N", "--max-iterations", type=int, default=None)

    p = sub.add_parser("restart")
    p.add_argument("snapshot", help="snapshot number (or 'last')")
    p.add_argument("setup", help="YAML setup file")
    p.add_argument("-o", "--outdir", default=None)
    p.add_argument("--dtype", default="float64",
                   choices=["float64", "float32"])
    p.add_argument("-N", "--max-iterations", type=int, default=None)

    args = parser.parse_args(argv)

    # benign placeholders so signals arriving during the (slow) jax import
    # and first compile don't kill the process before the real handlers
    # are registered below
    signal.signal(signal.SIGUSR1, lambda *_: None)
    import faulthandler
    faulthandler.register(signal.SIGUSR2, all_threads=True)

    import jax
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    from .config import Config
    from .sim import Simulation
    from . import output as out

    cfg = Config.from_file(args.setup)
    sim = Simulation(cfg, outdir=args.outdir, dtype=args.dtype)
    writer = out.OutputWriter(sim)

    if args.mode == "restart":
        sid = args.snapshot
        if sid == "last":
            sid = out.last_snapshot_id(writer.outdir)
        out.restore_simulation(sim, writer.outdir, sid)
        print(f"restarted from snapshot {sid} at t = {sim.time:.6g}")
    elif args.mode == "auto":
        list_file = writer.outdir / "snapshots" / "list.txt"
        if list_file.exists() and list_file.read_text().strip():
            sid = out.last_snapshot_id(writer.outdir)
            out.restore_simulation(sim, writer.outdir, sid)
            print(f"auto: resuming from snapshot {sid} at t = {sim.time:.6g}")
        else:
            print("auto: no snapshots found, starting fresh")

    # SIGTERM -> autosave + clean exit (reference src/simulation.cpp:497-531)
    stop_requested = {"flag": False}

    def _sigterm(_signum, _frame):
        stop_requested["flag"] = True

    signal.signal(signal.SIGTERM, _sigterm)

    # SIGUSR1 -> CFL/timestep debug report (reference src/cfl.cpp:358-372
    # PRINT_SIG_INFO); SIGUSR2 -> python stack backtrace (reference
    # src/backtrace.cpp via execinfo)
    def _sigusr1(_signum, _frame):
        import jax.numpy as _jnp
        cfl_dt = float(sim.stepper.cfl_dt(sim.state))
        print(f"[SIGUSR1] t = {sim.time:.8g}  monitor {sim.n_monitor}  "
              f"hydro steps {sim.n_hydro_iter}  last_dt = {sim.last_dt:.6g}"
              f"  CFL dt = {cfl_dt:.6g}", flush=True)

    signal.signal(signal.SIGUSR1, _sigusr1)

    # copy the setup file into the output dir for provenance
    import shutil
    shutil.copyfile(args.setup, writer.outdir / "parameters" / "setup.yml")

    s = sim.settings
    total_monitors = s.n_snapshots * s.n_monitor
    sim._handle_outputs(initial=True)
    while sim.n_monitor < total_monitors:
        if args.max_iterations is not None \
                and sim.n_hydro_iter >= args.max_iterations:
            break
        if stop_requested["flag"]:
            writer.write_snapshot("autosave", register=False)
            print("SIGTERM received: autosave written, exiting")
            return 0
        t_target = (sim.n_monitor + 1) * s.monitor_timestep
        import time as _t
        w0 = _t.time()
        (sim.state, time_arr, last_dt_arr, n_steps, dt_min, dt_max,
         dt_sum, dt_sq) = sim.stepper.advance_to(
            sim.state, sim.time, sim.last_dt, t_target)
        sim.time = float(time_arr)
        sim.last_dt = float(last_dt_arr)
        n = int(n_steps)
        sim.n_hydro_iter += n
        sim.monitor_stats = {
            "n_steps": n, "walltime": _t.time() - w0,
            "dt_min": float(dt_min), "dt_max": float(dt_max),
            "dt_sum": float(dt_sum), "dt_sq": float(dt_sq)}
        sim.n_monitor += 1
        sim._handle_outputs()
        rate = n / max(sim.monitor_stats["walltime"], 1e-9)
        print(f"monitor {sim.n_monitor}/{total_monitors}  t={sim.time:.6g}  "
              f"steps={sim.n_hydro_iter}  {rate:.1f} steps/s")
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
