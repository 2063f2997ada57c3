#!/usr/bin/env python3
"""Convert a legacy FARGO/FargoCPT ``.par``/``.ini`` setup (plus its
``PlanetConfig`` planet table) into the YAML setup format this framework
reads.

Behavioral re-derivation of reference Tools/ini2yml.py +
Tools/param_names/replace_parameter_names.py: old key names are renamed
(or dropped with a hint), implicit cgs units are made explicit, the
legacy default star becomes an explicit nbody entry, and the planet table
columns become per-body dicts.

Usage: python tools/ini2yml.py setup.par setup.yml
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import yaml

# legacy name -> new name; None means the key is gone (hint printed)
RENAMES = {
    "alphaviscosity": "ViscousAlpha",
    "viscosity": "ConstantViscosity",
    "nsec": "Naz",
    "nrad": "Nrad",
    "ntot": "Nsnapshots",
    "ninterm": "Nmonitor",
    "dt": "MonitorTimestep",
    "discmass": "DiskMass",
    "massoverflow": "RocheLobeOverflow",
    "mofplanet": "ROFPlanet",
    "mofvalue": "ROFValue",
    "mofgamma": "ROFGamma",
    "moframpingtime": "ROFRampingTime",
    "mofaveragingtime": "ROFAveragingTime",
    "moftemperature": "ROFTemperature",
    "variabletransfer": "ROFVariableTransfer",
}
DROPPED = {
    "adiabatic": "EquationOfState: Ideal",
    "coolingradiativelocal": "SurfaceCooling: thermal",
    "coolingscurve": "SurfaceCooling: scurve",
    "explicitviscosity": "set ViscousAlpha or ConstantViscosity > 0",
    "domegadrzero": "OuterBoundaryVazi: zeroshear",
    "stellarrotation": "InnerBoundaryVazi: keplerian "
                       "+ InnerBoundaryVaziKeplerianFactor",
    "vradin": "InnerBoundaryVrad: keplerian "
              "+ InnerBoundaryVradKeplerianFactor",
    "integrateplanets": None, "forcedcircular": None,
    "alphathreshold": None, "debugoutputs": None, "outersourcemass": None,
    "massaccretionrate": None, "stsnu": "the STS module was removed",
    "zbuffermaxangle": None, "sigma0incodeunits": None,
    "viscosityincgs": "use ConstantViscosity with a unit",
    "temperaturecgs0": "use Temperature0 with a 'K' unit",
    "heatingstar": "set an Nbody object's temperature > 0",
    "heatingstarfactor": "modulate the Nbody object's temperature",
    "heatingstarsimple": "now the only mode",
    "heatingstarrampingtime": "use the body's 'irradiation ramp-up time'",
}
# implicit legacy cgs units that the YAML reader needs spelled out
IMPLICIT_UNITS = {
    "sigma0": "g/cm2", "particleradius": "cm", "particledensity": "g/cm3",
    "maximumtemperature": "K", "minimumtemperature": "K",
    "rofvalue": "solMass/yr",
}
# legacy planet-table column order (reference planet .cfg files)
PLANET_COLUMNS = (
    "name", "semi-major axis", "mass", "accretion efficiency",
    "feels disk", "Nbody interaction", "eccentricity", "radius",
    "temperature", "irradiate", "phi", "ramp-up time")


def parse_ini(path: Path) -> dict:
    """'Key  value  [# comment]' lines -> ordered dict (strings)."""
    params: dict[str, str] = {}
    for raw in path.read_text().splitlines():
        line = raw.split("#", 1)[0].split("###", 1)[0].strip()
        if not line:
            continue
        parts = line.split(None, 1)
        if len(parts) == 2:
            params[parts[0]] = parts[1].strip()
    return params


def parse_planets(path: Path) -> list[dict]:
    bodies = []
    for raw in path.read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        body = dict(zip(PLANET_COLUMNS, line.split()))
        body.pop("feels disk", None)
        body.pop("Nbody interaction", None)
        if str(body.get("irradiate", "no")).lower() in ("no", "false", "0"):
            body["temperature"] = "0 K"
        bodies.append(body)
    return bodies


def convert(params: dict) -> dict:
    out: dict[str, object] = {}
    star_temp, star_radius, default_star = "5778 K", "1 solRadius", True
    planet_file = None
    for key, val in params.items():
        kl = key.lower()
        if kl == "planetconfig":
            planet_file = val
            continue
        if kl == "defaultstar":
            default_star = not str(val).lower().startswith("n")
            continue
        if kl == "startemperature":
            star_temp = f"{val} K"
            continue
        if kl == "starradius":
            star_radius = f"{val} solRadius"
            continue
        if kl in DROPPED:
            hint = DROPPED[kl]
            msg = f"dropped obsolete key {key!r}"
            if hint:
                msg += f" (hint: {hint})"
            print(msg, file=sys.stderr)
            continue
        new = RENAMES.get(kl, key)
        if kl in IMPLICIT_UNITS and IMPLICIT_UNITS[kl] not in str(val):
            val = f"{val} {IMPLICIT_UNITS[kl]}"
            print(f"added implicit unit to {new}: {val}", file=sys.stderr)
        out[new] = val

    nbody: list[dict] = []
    if default_star:
        if str(params.get("HeatingStar", "no")).lower() in ("no", "false"):
            star_temp = "0"
        nbody.append({"name": "DefaultStar", "semi-major axis": "0.0 au",
                      "mass": "1.0", "eccentricity": "0.0",
                      "radius": star_radius, "temperature": star_temp})
    if planet_file:
        p = Path(planet_file)
        if p.exists():
            nbody += parse_planets(p)
        else:
            print(f"planet config {planet_file!r} not found — "
                  "run from the directory containing it", file=sys.stderr)
    if nbody:
        out["nbody"] = nbody
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("infile")
    ap.add_argument("outfile")
    args = ap.parse_args(argv)
    params = parse_ini(Path(args.infile))
    out = convert(params)
    Path(args.outfile).write_text(
        yaml.safe_dump(out, sort_keys=False, default_flow_style=False,
                       width=200))
    print(f"wrote {args.outfile} ({len(out)} keys)", file=sys.stderr)


if __name__ == "__main__":
    main()
