"""Headline benchmark: Mcell-updates/s/chip on the 1024x3072 polar grid.

Runs the full-physics hydro step (adiabatic + alpha viscosity + SN
artificial viscosity + viscous heating + beta cooling + CFL + FARGO
transport) in a jitted fori_loop and reports sustained cell-update
throughput. Prints JSON lines
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
with the OFFICIAL metric-of-record (flagship full-physics f32) as the
LAST line. vs_baseline is relative to the 1000 Mcell/s/chip (1 Gcell/s)
north-star target from BASELINE.json.

Process layout: the parent is a thin orchestrator that never imports
jax; every bench line runs in its own timeout-bounded subprocess
(``BENCH_ONLY=...``). Isolation is deliberate: a TPU-worker crash or a
hang in one configuration (the round-2 failure mode — one bad trace made
the whole capture rc=1) must not take down the official line, and two
live TPU clients in one process tree are avoided by running the lines
sequentially, each owning the device for its lifetime.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

NRAD = int(os.environ.get("BENCH_NRAD", 1024))
NAZ = int(os.environ.get("BENCH_NAZ", 3072))
BENCH_STEPS = int(os.environ.get("BENCH_STEPS", 100))
TARGET_MCELLS = 1000.0  # 1 Gcell-update/s/chip


def run_bench(dtype: str, steps: int, config: str = "flagship"):
    """Measure one configuration in-process (child mode)."""
    import jax

    # persistent compilation cache: repeated bench/driver runs skip the
    # large XLA compile of the fused step
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # the axon TPU plugin ignores the JAX_PLATFORMS env var (and hangs
    # connecting through a dead tunnel); honor a cpu request via
    # jax.config, which does gate plugin initialization — keeps the CPU
    # smoke test (tests/test_driver_parity.py) deterministic
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    sys.path.insert(0, HERE)
    from __graft_entry__ import _flagship, _pds70

    if config == "pds70":
        sim = _pds70(NRAD, NAZ, dtype)
    else:
        sim = _flagship(NRAD, NAZ, dtype)
    stepper = sim.stepper
    state = sim.state

    def one(carry, _):
        state, time_, last_dt = carry
        cfl_dt = stepper._cfl_impl(state)
        dt = jnp.minimum(stepper.phys.cfl_max_var * last_dt, cfl_dt)
        state = stepper._step_impl(state, time_, dt)
        return (state, time_ + dt, dt), None

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def advance(carry, n):
        return jax.lax.scan(one, carry, None, length=n)[0]

    fdtype = state.fields.sigma.dtype
    carry = (state, jnp.asarray(0.0, fdtype), jnp.asarray(1e-6, fdtype))

    # warmup + compile (same static length as the timed run so the timed
    # region never compiles)
    carry = advance(carry, steps)
    jax.block_until_ready(carry[0].fields.sigma)

    t0 = time.perf_counter()
    carry = advance(carry, steps)
    jax.block_until_ready(carry[0].fields.sigma)
    elapsed = time.perf_counter() - t0

    cells = NRAD * NAZ
    mcups = cells * steps / elapsed / 1e6
    desc = "full-physics step incl. CFL" if config == "flagship" else \
        "SG + FLD + PVTE + dust step incl. CFL"
    tag = dtype
    if dtype == "float64" \
            and os.environ.get("FARGOCPT_TPU_F64_FUSED", "") == "1":
        tag = "float64-fused-experimental"
    result = {
        "metric": f"Mcell-updates/s/chip at {NRAD}x{NAZ} polar grid "
                  f"({desc}, {tag})",
        "value": round(mcups, 2),
        "unit": "Mcell/s",
        "vs_baseline": round(mcups / TARGET_MCELLS, 4),
    }
    print(json.dumps(result))
    return result


_CHILD_CONFIGS = {
    # name -> (dtype, steps-env-var, default steps, config, timeout s,
    #          extra env)
    "flagship_f32": ("float32", "BENCH_STEPS", 100, "flagship", 2400, {}),
    # secondary float64 number (the reference is all-double; the
    # rebuild's f64 production path is the validated unfused jnp graph —
    # Mosaic cannot lower the fused kernels' dynamic lane rolls in
    # emulated f64)
    "f64": ("float64", "BENCH_F64_STEPS", 30, "flagship", 2400, {}),
    # NOTE: an "f64_fused" child (FARGOCPT_TPU_F64_FUSED=1, the
    # static-roll+select FARGO shift) was probed on TPU 2026-08-18 and is
    # STRUCTURALLY IMPOSSIBLE on this backend: the axon X64-emulation
    # rewrite pass cannot rewrite ANY f64 pallas custom-call
    # ("While rewriting computation to not contain X64 element types,
    # XLA encountered an HLO for which this rewriting is not
    # implemented: ... custom_call_target=tpu_custom_call"). f64 Pallas
    # is off the table on emulated-f64 TPUs, not just f64 dynamic rolls;
    # the path remains CPU-testable behind the env var.
    # PDS70-style full physics (SG FFT + FLD + PVTE + dust,
    # BASELINE.json configs[4]) — fewer steps (each step carries an FFT
    # convolution pair + an SOR solve)
    "pds70": ("float32", "BENCH_PDS70_STEPS", 20, "pds70", 2400, {}),
}


def _run_child(name, timeout_cap=None):
    """Run one bench line in a fresh subprocess; return its raw JSON
    line (str), or None if it crashed or timed out (failure is
    contained). Does NOT print to stdout — the orchestrator controls
    all stdout writes so the official line can be kept last atomically."""
    _, _, _, _, timeout, extra_env = _CHILD_CONFIGS[name]
    if timeout_cap is not None:
        timeout = min(timeout, timeout_cap)
    env = dict(os.environ)
    env["BENCH_ONLY"] = name
    env.update(extra_env)
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=timeout, cwd=HERE)
    except subprocess.TimeoutExpired:
        print(f"bench[{name}]: timed out after {timeout}s (contained)",
              file=sys.stderr)
        return None
    if res.stderr:
        sys.stderr.write(res.stderr)
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    if res.returncode != 0 or not lines:
        print(f"bench[{name}]: rc={res.returncode} (contained)\n"
              f"{res.stdout}", file=sys.stderr)
        return None
    return lines[-1]


def main():
    only = os.environ.get("BENCH_ONLY", "")
    if only:
        dtype, steps_env, default, config, _, _ = _CHILD_CONFIGS[only]
        return run_bench(dtype, int(os.environ.get(steps_env, default)),
                         config=config)

    # The driver records the LAST COMPLETE JSON line of a process it may
    # kill at ANY moment (round 3: rc=124 mid-PDS70 left the f64 line as
    # the metric of record). Kill-proofing:
    #   * the official flagship line is measured FIRST;
    #   * after EVERY optional child, the child line + a re-emit of the
    #     official line go out in ONE flushed write (< PIPE_BUF, atomic
    #     on the driver's pipe) so no kill point can leave an optional
    #     line last;
    #   * a total wall-clock budget (BENCH_WALL_BUDGET, seconds) skips
    #     remaining optional children instead of letting the driver's
    #     timeout land mid-child.
    t_start = time.monotonic()
    wall_budget = float(os.environ.get("BENCH_WALL_BUDGET", 480))

    def emit(text):
        # ONE raw os.write syscall: atomic on a pipe for < PIPE_BUF
        # (4096B). sys.stdout.write is NOT enough — under
        # PYTHONUNBUFFERED=1 the write-through TextIOWrapper splits at
        # newlines, and a kill can land between the two syscalls
        # (reproduced 2026-08-19: the f64 line got out, the official
        # re-emit did not).
        sys.stdout.flush()
        os.write(sys.stdout.fileno(), text.encode())

    official_line = _run_child("flagship_f32")
    if official_line is None:
        sys.exit(1)
    official = json.loads(official_line)
    emit(official_line + "\n")

    optional = []
    if os.environ.get("BENCH_SKIP_F64", "") != "1":
        optional.append("f64")
    if os.environ.get("BENCH_SKIP_PDS70", "") != "1":
        optional.append("pds70")
    for name in optional:
        remaining = wall_budget - (time.monotonic() - t_start)
        if remaining < 60:
            print(f"bench[{name}]: skipped — wall budget exhausted "
                  f"({remaining:.0f}s left of {wall_budget:.0f}s)",
                  file=sys.stderr)
            continue
        line = _run_child(name, timeout_cap=remaining)
        if line is not None:
            # single atomic write: optional line + official re-emit
            emit(line + "\n" + official_line + "\n")
    return official


if __name__ == "__main__":
    main()
