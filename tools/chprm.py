#!/usr/bin/env python3
"""Change one parameter's value in a setup file, preserving the file's
text (comments, ordering, spacing) — works on both the YAML setups
("Key: value") and legacy ini files ("Key value").

Behavioral re-derivation of reference Tools/chprm.py: exactly one
occurrence must match or the tool refuses.

Usage: python tools/chprm.py setup.yml Nrad 512 [-o out.yml]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path


def change_param(text: str, param: str, value: str) -> str:
    pattern = re.compile(
        r"^(\s*" + re.escape(param) + r"\s*:?\s+)(\S[^#\n]*?)(\s*(#.*)?)$",
        re.MULTILINE | re.IGNORECASE)
    matches = pattern.findall(text)
    if len(matches) == 0:
        raise SystemExit(f"parameter {param!r} not found")
    if len(matches) > 1:
        raise SystemExit(f"parameter {param!r} matched {len(matches)} "
                         "lines; refusing to change more than one")
    return pattern.sub(lambda m: m.group(1) + value + m.group(3), text)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("infile")
    ap.add_argument("param")
    ap.add_argument("value")
    ap.add_argument("-o", "--outfile", default=None)
    args = ap.parse_args(argv)
    path = Path(args.infile)
    new = change_param(path.read_text(), args.param, args.value)
    Path(args.outfile or path).write_text(new)
    print(f"set {args.param} = {args.value}", file=sys.stderr)


if __name__ == "__main__":
    main()
