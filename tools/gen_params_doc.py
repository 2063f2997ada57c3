#!/usr/bin/env python3
"""Regenerate docs/parameters.md from the config-access sites.

Scans the package for ``cfg.get*("Key", default)`` calls (including the
f-string boundary-key families, expanded explicitly) and emits the key
table. Run after adding config keys: ``python tools/gen_params_doc.py``.
"""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "fargocpt_tpu"

HEADER = """# Configuration parameters

All YAML setup keys the framework reads (case-insensitive), with their \
defaults. Values with units accept unit strings ("200 g/cm2", "1 au", \
"0.5 solMass"). Mirrors the reference's parameter conventions (reference \
docs_source/source/parameters.md). Unknown keys raise a hard error when \
`Config.exit_on_unknown_key()` is active, matching the reference's \
visited-key tracking.

| Key | Default | Kind | Read in |
|---|---|---|---|
"""

CALL = re.compile(
    r"cfg\.(get_flag|get_lowercase|get_list|get_subconfigs|get_raw|get)"
    r"\(\s*[\"']([A-Za-z0-9]+)[\"']\s*(?:,\s*([^,)]+))?", re.S)

# helper-function key reads of the form _helper(cfg, "Key", ...)
HELPER_CALL = re.compile(r"\(\s*cfg\s*,\s*[\"']([A-Za-z0-9]+)[\"']")

# the per-side per-variable boundary families built with f-strings
BC_FAMILY = [
    (f"{side}Boundary{var}", default, "choice")
    for side in ("Inner", "Outer")
    for var, default in (("", '"individual"'), ("Sigma", '"zerogradient"'),
                         ("Energy", '"zerogradient"'),
                         ("Vrad", '"zerogradient"'),
                         ("Vazi", '"keplerian"'))
]
EXTRA = [
    ("l0", '"1.0 au"', "value"), ("m0", '"1.0 solMass"', "value"),
    ("t0", "derived", "value"), ("temp0", "derived", "value"),
]

KIND = {"get_flag": "flag", "get_lowercase": "choice", "get_list": "list",
        "get_subconfigs": "list", "get": "value", "get_raw": "value"}


def main():
    rows = {}
    for py in sorted(PKG.rglob("*.py")):
        rel = py.relative_to(ROOT)
        text = py.read_text()
        for m in CALL.finditer(text):
            method, key, default = m.group(1), m.group(2), m.group(3)
            default = " ".join((default or "").split()) or "—"
            rows.setdefault(key, (default, KIND[method], str(rel)))
        for m in HELPER_CALL.finditer(text):
            rows.setdefault(m.group(1), ("—", "value", str(rel)))
    for key, default, kind in BC_FAMILY:
        rows.setdefault(key, (default, kind, "fargocpt_tpu/params.py"))
    # table-driven Write* -> snapshot-field flags (read via
    # cfg.get_flag(flag, False) in a loop, invisible to the regex)
    import sys
    sys.path.insert(0, str(ROOT))
    from fargocpt_tpu.params import _SNAPSHOT_FIELD_FLAGS
    for flag, _names in _SNAPSHOT_FIELD_FLAGS:
        rows.setdefault(flag, ("False", "flag", "fargocpt_tpu/params.py"))
    for key, default, kind in EXTRA:
        rows.setdefault(key, (default, kind, "fargocpt_tpu/sim.py"))

    lines = [HEADER]
    for key in sorted(rows, key=str.lower):
        default, kind, where = rows[key]
        lines.append(f"| `{key}` | `{default}` | {kind} | {where} |\n")
    # per-body nbody keys (parsed via subconfig in nbody/system.py)
    lines.append("""
## Per-body keys (entries of the `nbody` list)

| Key | Default |
|---|---|
| `name` | `planet<N>` |
| `mass` | `1.0` (accepts units) |
| `semi-major axis` | `0.0` (accepts units) |
| `eccentricity` | `0.0` |
| `argument of pericenter` | `0.0` |
| `trueanomaly` | `0.0` |
| `radius` | `1 solRadius` |
| `temperature` | `0` (K; > 0 irradiates) |
| `irradiate` | inferred from temperature |
| `irradiation ramp-up time` | `0.0` |
| `ramp-up time` | `0.0` (orbital periods) |
| `cubic smoothing factor` | `0.0` |
| `accretion efficiency` | `0.0` |
| `accretion method` | `kley` (kley / sinkhole / viscous; active only when `accretion efficiency` > 0) |
""")
    (ROOT / "docs" / "parameters.md").write_text("".join(lines))
    print(f"wrote docs/parameters.md with {len(rows)} keys")


if __name__ == "__main__":
    main()
