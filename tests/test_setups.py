"""Shipped setups (setups/) and reference-setup-file parity.

The reference ships production setups under setups/ (PDS70.yml,
CloseBinaries/*.yml).  Two guarantees here:

1. every repo setups/*.yml constructs a Simulation (the user-facing
   catalog works), and
2. the reference's own VALID setup files load VERBATIM through our
   Config (key-name parity end to end).  The two invalid upstream files
   are pinned as invalid-for-the-reference-too:
   gamma_cephei_full.yml carries pre-rename keys (DT/Nsec/DomegaDrZero)
   that the reference binary rejects via exit_on_unknown_key
   (src/config.cpp:134-137 + src/main.cpp:112), and OY_Car.yml contains
   old .par-syntax lines ("l0\\t\\t0.002916") that no YAML parser
   accepts.
"""

import glob
import os

import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation

HERE = os.path.dirname(os.path.abspath(__file__))
SETUPS = os.path.abspath(os.path.join(HERE, "..", "setups"))
REF_SETUPS = "/root/reference/setups"


def shrink(cfg: Config) -> Config:
    """Construction-cost control: shrink the grid, keep the physics."""
    cfg._raw["nrad"] = "32"
    cfg._raw["naz"] = "64"
    cfg._raw["nsnapshots"] = "1"
    if cfg.contains("NumberOfParticles"):
        cfg._raw["numberofparticles"] = "64"
    return cfg


@pytest.mark.parametrize("path",
                         sorted(glob.glob(os.path.join(SETUPS, "**", "*.yml"),
                                          recursive=True)),
                         ids=lambda p: os.path.relpath(p, SETUPS))
def test_repo_setup_constructs(path):
    sim = Simulation(shrink(Config.from_file(path)))
    assert sim.geometry.naz == 64


@pytest.mark.parametrize("name", [
    "PDS70.yml",
    "CloseBinaries/gamma_cephei_primary.yml",
    "CloseBinaries/V1504Cyg.yml",
])
def test_reference_setup_loads_verbatim(name):
    path = os.path.join(REF_SETUPS, name)
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    sim = Simulation(shrink(Config.from_file(path)))
    assert sim.geometry.nrad == 32


def test_reference_stale_setup_rejected_like_reference():
    """gamma_cephei_full.yml ships stale keys the reference binary also
    hard-errors on — same three names, same failure mode."""
    path = os.path.join(REF_SETUPS, "CloseBinaries/gamma_cephei_full.yml")
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    with pytest.raises(KeyError) as exc:
        Simulation(shrink(Config.from_file(path)))
    msg = str(exc.value)
    for key in ("DT", "Nsec", "DomegaDrZero"):
        assert key in msg


def test_fit_isothermal_polytropic_constants():
    """AdiabaticIndex/PolytropicConstant = FIT_ISOTHERMAL (reference
    src/Interpret.cpp:38-53): gamma = (-1 - p + 2F)/(-p),
    K = h^2 sigma0^(1-gamma)."""
    cfg = Config.from_dict({
        "EquationOfState": "polytropic",
        "AdiabaticIndex": "FIT_ISOTHERMAL",
        "PolytropicConstant": "FIT_ISOTHERMAL",
        "AspectRatio": "0.05", "SigmaSlope": "0.5", "FlaringIndex": "0.1",
        "Sigma0": "200 g/cm2",
        "Nrad": "16", "Naz": "16", "Rmin": "0.4", "Rmax": "2.5",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.3"})
    sim = Simulation(cfg)
    ph = sim.stepper.phys
    gamma = (-1.0 - 0.5 + 2.0 * 0.1) / (-0.5)
    assert abs(ph.adiabatic_index - gamma) < 1e-12
    assert abs(ph.polytropic_constant
               - 0.05 ** 2 * ph.sigma0 ** (1.0 - gamma)) < 1e-12 \
        * ph.polytropic_constant
    # FIT_ISOTHERMAL for a non-polytropic EoS is consulted and ignored
    # (reference always get()s PolytropicConstant, :495) ...
    cfg2 = Config.from_dict({
        "EquationOfState": "Ideal", "PolytropicConstant": "FIT_ISOTHERMAL",
        "AspectRatio": "0.05", "Sigma0": "200 g/cm2",
        "Nrad": "16", "Naz": "16", "Rmin": "0.4", "Rmax": "2.5",
        "InnerBoundary": "outflow", "OuterBoundary": "outflow",
        "Nsnapshots": "1", "Nmonitor": "1", "MonitorTimestep": "0.3"})
    Simulation(cfg2)
    # ... but a fitted ADIABATIC index is polytropic-only (the reference
    # dies, Interpret.cpp:429-436)
    cfg3 = Config.from_dict(dict(cfg2._raw,
                                 AdiabaticIndex="FIT_ISOTHERMAL"))
    with pytest.raises(ValueError):
        Simulation(cfg3)
