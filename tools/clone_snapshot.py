#!/usr/bin/env python3
"""Clone one snapshot of a simulation output directory into a fresh,
restartable output directory (behavioral re-derivation of reference
Tools/clone_at_timestep.py: branch a new run off an existing state).

The clone carries the run metadata (dimensions.dat, used_rad.dat,
units/constants/info ymls, parameters/), the 'reference' snapshot (the
damping/BC targets), the chosen snapshot, and a monitor/ directory with
the scalar files truncated to entries at or before the snapshot's time —
so ``python -m fargocpt_tpu restart <N> setup.yml -o <clone>`` (or
``auto``) continues seamlessly and monitor files append cleanly.

Usage: python tools/clone_snapshot.py SRC_OUTDIR DST_OUTDIR [-N SNAPSHOT]
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path


def clone(src: Path, dst: Path, snapshot: str | None = None) -> str:
    if dst.exists():
        raise SystemExit(f"destination {dst} already exists")
    snaps = [x for x in (src / "snapshots" / "list.txt").read_text().split()
             if x.strip()]
    if not snaps:
        raise SystemExit("source has no registered snapshots")
    sid = snapshot if snapshot is not None else snaps[-1]
    if sid not in snaps:
        raise SystemExit(f"snapshot {sid!r} not in {snaps}")

    (dst / "snapshots").mkdir(parents=True)
    for item in src.iterdir():
        if item.name in ("snapshots", "monitor"):
            continue
        if item.is_dir():
            shutil.copytree(item, dst / item.name)
        else:
            shutil.copy2(item, dst / item.name)
    for name in (sid, "reference"):
        sdir = src / "snapshots" / name
        if sdir.exists():
            shutil.copytree(sdir, dst / "snapshots" / name)
    (dst / "snapshots" / "list.txt").write_text(f"{sid}\n")

    # truncate monitor scalars to the cloned snapshot's time
    from fargocpt_tpu.output import load_misc
    t_clone = load_misc(src / "snapshots" / sid)["time"]
    mon_src = src / "monitor"
    mon_dst = dst / "monitor"
    mon_dst.mkdir()
    if mon_src.exists():
        for f in mon_src.iterdir():
            lines = f.read_text().splitlines(keepends=True)
            out = []
            for line in lines:
                if line.startswith("#"):
                    out.append(line)
                    continue
                try:
                    cols = line.split()
                    # time column: 2 for Quantities/nbody/timestep logs,
                    # 0 for the simple "time\tvalue" logs
                    t = float(cols[2]) if len(cols) > 2 else float(cols[0])
                except (ValueError, IndexError):
                    out.append(line)
                    continue
                if t <= t_clone * (1 + 1e-12):
                    out.append(line)
            (mon_dst / f.name).write_text("".join(out))
    return sid


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("-N", "--snapshot", default=None,
                    help="snapshot id to clone (default: last)")
    args = ap.parse_args(argv)
    sid = clone(Path(args.src), Path(args.dst), args.snapshot)
    print(f"cloned snapshot {sid} -> {args.dst}", file=sys.stderr)


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
