"""Headline benchmark: Mcell-updates/s/chip on the 1024x3072 polar grid.

Runs the full-physics hydro step (adiabatic + alpha viscosity + SN
artificial viscosity + viscous heating + beta cooling + CFL + FARGO
transport) in a jitted fori_loop and reports sustained cell-update
throughput. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is relative to the 1000 Mcell/s/chip (1 Gcell/s) north-star
target from BASELINE.json.
"""

import json
import sys
import time

import os

import jax

# persistent compilation cache: repeated bench/driver runs skip the large
# XLA compile of the fused step
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# the axon TPU plugin ignores the JAX_PLATFORMS env var (and hangs
# connecting through a dead tunnel); honor a cpu request via jax.config,
# which does gate plugin initialization — keeps the CPU smoke test
# (tests/test_driver_parity.py) deterministic
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

NRAD = int(os.environ.get("BENCH_NRAD", 1024))
NAZ = int(os.environ.get("BENCH_NAZ", 3072))
BENCH_STEPS = int(os.environ.get("BENCH_STEPS", 100))
TARGET_MCELLS = 1000.0  # 1 Gcell-update/s/chip


def run_bench(dtype: str, steps: int, config: str = "flagship"):
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
    result = {
        "metric": f"Mcell-updates/s/chip at {NRAD}x{NAZ} polar grid "
                  f"({desc}, {dtype})",
        "value": round(mcups, 2),
        "unit": "Mcell/s",
        "vs_baseline": round(mcups / TARGET_MCELLS, 4),
    }
    print(json.dumps(result))
    return result


def main():
    # secondary float64 number (the reference is all-double; the rebuild's
    # f64 production path is the validated unfused jnp graph — Mosaic
    # cannot lower the fused kernels' dynamic lane rolls in emulated f64).
    # Printed FIRST; the official f32 metric-of-record line is LAST.
    if os.environ.get("BENCH_SKIP_F64", "") != "1":
        run_bench("float64", int(os.environ.get("BENCH_F64_STEPS", 30)))
    # PDS70-style full physics (SG FFT + FLD + PVTE + dust,
    # BASELINE.json configs[4]) — secondary line, fewer steps (each step
    # carries an FFT convolution pair + an SOR solve)
    if os.environ.get("BENCH_SKIP_PDS70", "") != "1":
        run_bench("float32", int(os.environ.get("BENCH_PDS70_STEPS", 20)),
                  config="pds70")
    return run_bench("float32", BENCH_STEPS)


if __name__ == "__main__":
    main()
