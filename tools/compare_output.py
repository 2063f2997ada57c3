#!/usr/bin/env python3
"""Compare two simulation output directories field by field
(analog of reference Tools/compare_binary_output.py).

Usage:
    python tools/compare_output.py OUT_A OUT_B [--snapshot N] [--rtol 0]

Exit code 0 when every common field matches within the tolerance,
1 otherwise. rtol 0 (default) demands bitwise identity.
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def compare_dir(a: Path, b: Path, rtol: float) -> bool:
    ok = True
    files_a = {p.name for p in a.glob("*.dat")} | \
              {p.name for p in a.glob("*.bin")}
    files_b = {p.name for p in b.glob("*.dat")} | \
              {p.name for p in b.glob("*.bin")}
    for name in sorted(files_a & files_b):
        x = np.fromfile(a / name, np.float64)
        y = np.fromfile(b / name, np.float64)
        if x.shape != y.shape:
            print(f"  {name}: SHAPE MISMATCH {x.shape} vs {y.shape}")
            ok = False
            continue
        if rtol == 0.0:
            same = np.array_equal(x, y)
            delta = np.abs(x - y).max() if x.size else 0.0
        else:
            same = np.allclose(x, y, rtol=rtol, atol=0.0, equal_nan=True)
            denom = np.maximum(np.abs(x), 1e-300)
            delta = (np.abs(x - y) / denom).max() if x.size else 0.0
        status = "OK" if same else "DIFFERS"
        print(f"  {name}: {status} (max {'abs' if rtol == 0 else 'rel'} "
              f"diff {delta:.3e})")
        ok = ok and same
    for name in sorted(files_a ^ files_b):
        side = "A" if name in files_a else "B"
        print(f"  {name}: only in {side}")
        ok = False
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_a")
    ap.add_argument("out_b")
    ap.add_argument("--snapshot", default=None,
                    help="compare only this snapshot (default: all common)")
    ap.add_argument("--rtol", type=float, default=0.0)
    args = ap.parse_args()
    a = Path(args.out_a) / "snapshots"
    b = Path(args.out_b) / "snapshots"
    if args.snapshot is not None:
        snaps = [args.snapshot]
    else:
        sa = {p.name for p in a.iterdir() if p.is_dir()}
        sb = {p.name for p in b.iterdir() if p.is_dir()}
        snaps = sorted(sa & sb, key=lambda s: (len(s), s))
    ok = True
    for s in snaps:
        print(f"snapshot {s}:")
        ok = compare_dir(a / s, b / s, args.rtol) and ok
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
