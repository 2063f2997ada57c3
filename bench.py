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

Optional lines after the official flagship one, in order of information
value (round-4 verdict: PDS70 tracks each round's work, f64 is a
documented hardware floor that never changes):
  pds70   — full-physics SG + FLD + PVTE + dust line (BASELINE configs[4])
  parity  — on-TPU numerical gate: the SAME flagship state advanced with
            the fused Pallas kernels and with FARGOCPT_TPU_NO_PALLAS=1
            (pure-jnp path) must agree to the documented f32 budget —
            the hardware-side link for the interpret-mode parity tests
  f64     — flagship in float64 (emulated; unfused jnp graph)

Wall-budget policy (round-4 failure: the f64 child's cold compile burned
the whole post-flagship remainder and PDS70 never ran):
  * every child carries a measured WARM cost (persistent ``.jax_cache``
    hit — the arranged case: the cache lives in the repo and survives
    across driver runs); a child is skipped up front when the remaining
    budget cannot cover even its warm cost;
  * a child's subprocess timeout is capped at the remaining budget MINUS
    the warm costs of the children after it, so one cold compile
    (measured: 200-700 s against warm 60-130 s) cannot starve the rest;
  * each child also receives its deadline (BENCH_CHILD_DEADLINE, unix
    seconds) and exits rc=3 on its own at the next checkpoint between
    device calls — the external SIGKILL is the fallback, not the norm
    (an external kill landing mid-device-execution can wedge the remote
    TPU worker for hours; see CLAUDE.md).
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

# documented f32 error budget (README): fused-vs-unfused rel L2 over a
# 200-step trajectory; the parity child runs BENCH_PARITY_STEPS (<=200)
# and gates against the full budget — its job is catching a Mosaic
# miscompile producing fast garbage (rel L2 ~ O(1)), not re-proving the
# tight interpret-mode bounds (tests/test_pallas_kernels.py)
PARITY_BUDGET = float(os.environ.get("BENCH_PARITY_BUDGET", 1e-3))


def _jax_setup():
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
    return jax


def _build_advance(sim):
    """Jitted scan of (CFL + full step) with a static length."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    stepper = sim.stepper

    def one(carry, _):
        state, time_, last_dt = carry
        cfl_dt = stepper._cfl_impl(state)
        dt = jnp.minimum(stepper.phys.cfl_max_var * last_dt, cfl_dt)
        state = stepper._step_impl(state, time_, dt)
        return (state, time_ + dt, dt), None

    @partial(jax.jit, static_argnums=1)
    def advance(carry, n):
        return jax.lax.scan(one, carry, None, length=n)[0]

    fdtype = sim.state.fields.sigma.dtype
    carry = (sim.state, jnp.asarray(0.0, fdtype), jnp.asarray(1e-6, fdtype))
    return advance, carry


def _deadline_check(label: str):
    """Between-device-call deadline checkpoint: exit rc=3 if the parent's
    budget for this child has run out (graceful self-termination instead
    of an external SIGKILL mid-device-execution)."""
    dl = float(os.environ.get("BENCH_CHILD_DEADLINE", "0") or 0)
    if dl and time.time() > dl:
        print(f"bench child: deadline exceeded {label}, exiting",
              file=sys.stderr)
        sys.exit(3)


def run_bench(dtype: str, steps: int, config: str = "flagship"):
    """Measure one configuration in-process (child mode)."""
    jax = _jax_setup()

    sys.path.insert(0, HERE)
    from __graft_entry__ import _flagship, _pds70

    if config == "pds70":
        sim = _pds70(NRAD, NAZ, dtype)
    else:
        sim = _flagship(NRAD, NAZ, dtype)
    advance, carry = _build_advance(sim)

    # warmup + compile (same static length as the timed run so the timed
    # region never compiles)
    _deadline_check("before warmup")
    carry = advance(carry, steps)
    jax.block_until_ready(carry[0].fields.sigma)

    _deadline_check("after warmup")
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


def run_parity(steps: int):
    """On-TPU numerical gate: advance the SAME flagship f32 initial state
    ``steps`` steps through (a) the production fused Pallas path and
    (b) the pure-jnp path (FARGOCPT_TPU_NO_PALLAS=1 — identical physics,
    no custom kernels), and emit the relative L2 distance between the
    final states. Fails (rc=1) if the distance is non-finite or exceeds
    the documented budget — a Mosaic miscompile producing fast garbage
    cannot ship a throughput number past this line."""
    jax = _jax_setup()
    import numpy as np

    sys.path.insert(0, HERE)
    from __graft_entry__ import _flagship

    def final_state(no_pallas: bool):
        # use_pallas() reads the env var at trace time; each build+trace
        # happens entirely under its own setting
        if no_pallas:
            os.environ["FARGOCPT_TPU_NO_PALLAS"] = "1"
        else:
            os.environ.pop("FARGOCPT_TPU_NO_PALLAS", None)
        sim = _flagship(NRAD, NAZ, "float32")
        advance, carry = _build_advance(sim)
        _deadline_check(f"before run (no_pallas={no_pallas})")
        carry = advance(carry, steps)
        jax.block_until_ready(carry[0].fields.sigma)
        f = carry[0].fields
        return [np.asarray(x, np.float64)
                for x in (f.sigma, f.vrad, f.vaz, f.energy)]

    fused = final_state(no_pallas=False)
    plain = final_state(no_pallas=True)
    num = sum(float(np.sum((a - b) ** 2)) for a, b in zip(fused, plain))
    den = sum(float(np.sum(b ** 2)) for b in plain)
    rel = (num / den) ** 0.5 if den > 0 else float("inf")
    ok = np.isfinite(rel) and rel <= PARITY_BUDGET
    result = {
        "metric": f"fused-vs-unfused rel L2 on TPU "
                  f"({steps} flagship steps at {NRAD}x{NAZ}, f32, "
                  f"budget {PARITY_BUDGET:g})",
        "value": float(f"{rel:.3e}"),
        "unit": "rel L2",
        "vs_baseline": round(rel / PARITY_BUDGET, 4),
    }
    print(json.dumps(result))
    if not ok:
        print(f"bench[parity]: FAILED — rel L2 {rel:.3e} exceeds budget "
              f"{PARITY_BUDGET:g}", file=sys.stderr)
        sys.exit(1)
    return result


_CHILD_CONFIGS = {
    # name -> (dtype, steps-env-var, default steps, config, timeout s,
    #          WARM cost s, extra env)
    # Warm costs re-estimated 2026-08-21 after the CPU-pinned
    # construction fix (sim builds through the tunnel fell 2-10 min ->
    # ~33 s; the analytic dust lookup also removed jnp.searchsorted's
    # ~330 s/call XLA compile from the pds70 graph): build + cache-hit
    # executable load + dispatch + warmup/timed scans, padded. With all
    # four warm children at 60+80+100+70 = 310 s the full list fits the
    # 480 s default BENCH_WALL_BUDGET. Cold costs (empty cache, full
    # XLA+Mosaic compile) remain several hundred seconds per child —
    # cold children are started only when the remaining budget minus the
    # later children's warm costs allows, and killed (or self-terminated
    # at a deadline checkpoint) without starving what comes after.
    "flagship_f32": ("float32", "BENCH_STEPS", 100, "flagship", 2400,
                     60, {}),
    # PDS70-style full physics (SG FFT + FLD + PVTE + dust,
    # BASELINE.json configs[4]) — fewer steps (each step carries an FFT
    # convolution pair + an SOR solve)
    "pds70": ("float32", "BENCH_PDS70_STEPS", 20, "pds70", 2400, 80, {}),
    # on-TPU fused-vs-unfused numerical gate (see run_parity; builds
    # TWO sims)
    "parity": ("float32", "BENCH_PARITY_STEPS", 20, "parity", 2400,
               100, {}),
    # secondary float64 number (the reference is all-double; the
    # rebuild's f64 production path is the validated unfused jnp graph —
    # Mosaic cannot lower the fused kernels' dynamic lane rolls in
    # emulated f64). 10 steps: a documented hardware-floor number that
    # never changes (PROGRESS.md round-4 ceiling analysis) — keep cheap.
    "f64": ("float64", "BENCH_F64_STEPS", 10, "flagship", 2400, 70, {}),
    # NOTE: an "f64_fused" child (FARGOCPT_TPU_F64_FUSED=1, the
    # static-roll+select FARGO shift) was probed on TPU 2026-08-18 and is
    # STRUCTURALLY IMPOSSIBLE on this backend: the axon X64-emulation
    # rewrite pass cannot rewrite ANY f64 pallas custom-call
    # ("While rewriting computation to not contain X64 element types,
    # XLA encountered an HLO for which this rewriting is not
    # implemented: ... custom_call_target=tpu_custom_call"). f64 Pallas
    # is off the table on emulated-f64 TPUs, not just f64 dynamic rolls;
    # the path remains CPU-testable behind the env var.
}


def _run_child(name, timeout_cap=None):
    """Run one bench line in a fresh subprocess; return its raw JSON
    line (str), or None if it crashed or timed out (failure is
    contained). Does NOT print to stdout — the orchestrator controls
    all stdout writes so the official line can be kept last atomically."""
    _, _, _, _, timeout, _, extra_env = _CHILD_CONFIGS[name]
    if timeout_cap is not None:
        timeout = min(timeout, timeout_cap)
    env = dict(os.environ)
    env["BENCH_ONLY"] = name
    # the child self-terminates at its next between-device-calls
    # checkpoint 30 s before the external kill would land
    env["BENCH_CHILD_DEADLINE"] = str(time.time() + max(timeout - 30, 30))
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
        dtype, steps_env, default, config, _, _, _ = _CHILD_CONFIGS[only]
        steps = int(os.environ.get(steps_env, default))
        if config == "parity":
            return run_parity(steps)
        return run_bench(dtype, steps, config=config)

    # The driver records the LAST COMPLETE JSON line of a process it may
    # kill at ANY moment (round 3: rc=124 mid-PDS70 left the f64 line as
    # the metric of record). Kill-proofing:
    #   * the official flagship line is measured FIRST;
    #   * after EVERY optional child, the child line + a re-emit of the
    #     official line go out in ONE flushed write (< PIPE_BUF, atomic
    #     on the driver's pipe) so no kill point can leave an optional
    #     line last;
    #   * a total wall-clock budget (BENCH_WALL_BUDGET, seconds) plus
    #     per-child worst-case cold-compile costs skip children BEFORE
    #     they start instead of letting the driver's timeout land
    #     mid-child (round 4: the f64 child's cold compile burned the
    #     whole post-flagship remainder and PDS70 never ran).
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

    # information-value order: pds70 (tracks each round's work) first,
    # parity (numerical gate) second, f64 (static floor) last
    optional = []
    if os.environ.get("BENCH_SKIP_PDS70", "") != "1":
        optional.append("pds70")
    if os.environ.get("BENCH_SKIP_PARITY", "") != "1":
        optional.append("parity")
    if os.environ.get("BENCH_SKIP_F64", "") != "1":
        optional.append("f64")
    for i, name in enumerate(optional):
        remaining = wall_budget - (time.monotonic() - t_start)
        warm_cost = _CHILD_CONFIGS[name][5]
        if remaining < warm_cost:
            print(f"bench[{name}]: skipped — remaining wall budget "
                  f"{remaining:.0f}s below warm cost {warm_cost}s "
                  f"(of {wall_budget:.0f}s total)", file=sys.stderr)
            continue
        # reserve the later children's warm costs: one cold compile must
        # not starve the rest of the list (round-4 failure mode)
        reserve = sum(_CHILD_CONFIGS[m][5] for m in optional[i + 1:])
        cap = max(remaining - reserve, warm_cost)
        line = _run_child(name, timeout_cap=cap)
        if line is not None:
            # single atomic write: optional line + official re-emit
            emit(line + "\n" + official_line + "\n")
    return official


if __name__ == "__main__":
    main()
