#!/usr/bin/env python3
"""Strong-scaling harness (analog of reference test/scaling/test_scaling.py).

Sweeps device counts over a radial jax.sharding.Mesh and reports wall time
per hydro step. On a real TPU slice the devices are chips and the
collectives ride ICI; on CPU the same sweep runs on virtual devices
(XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT) to validate the sharded program and
measure surplus collective overhead.

Usage:
    python tools/scaling.py [--nrad 256] [--naz 768] [--steps 20]
        [--devices 1,2,4,8] [--cpu]

Writes scaling.txt rows: n_devices  ms_per_step  speedup.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nrad", type=int, default=256)
    ap.add_argument("--naz", type=int, default=768)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU with virtual devices")
    ap.add_argument("--out", default="scaling.txt")
    args = ap.parse_args()
    counts = [int(x) for x in args.devices.split(",")]

    import os
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(counts)}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from __graft_entry__ import _flagship
    from fargocpt_tpu.parallel.mesh import make_mesh, shard_state

    rows = []
    base_ms = None
    for n in counts:
        if n > len(jax.devices()):
            print(f"skipping n={n}: only {len(jax.devices())} devices")
            continue
        sim = _flagship(args.nrad, args.naz, "float32"
                        if jax.default_backend() == "tpu" else "float64")
        mesh = make_mesh(n)
        state = shard_state(sim.state, mesh)
        st = sim.stepper
        dt = jnp.asarray(1e-4, st.dtype)
        t0j = jnp.asarray(0.0, st.dtype)
        out = st._step(state, t0j, dt)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = st._step(out, t0j, dt)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        if base_ms is None:
            base_ms = ms
        rows.append((n, ms, base_ms / ms))
        print(f"n_devices={n:3d}  {ms:9.3f} ms/step  "
              f"speedup={base_ms / ms:6.2f}  "
              f"({args.nrad * args.naz / ms / 1e3:.1f} Mcell/s)")

    with open(args.out, "w") as f:
        f.write("# n_devices  ms_per_step  speedup\n")
        for n, ms, sp in rows:
            f.write(f"{n}\t{ms:.6g}\t{sp:.6g}\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
