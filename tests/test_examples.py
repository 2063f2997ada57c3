"""The shipped example setups stay valid: every key parses (unknown keys
hard-error) and the simulation constructs."""

from pathlib import Path

import pytest

from fargocpt_tpu.config import Config
from fargocpt_tpu.sim import Simulation

EXAMPLES = sorted((Path(__file__).resolve().parent.parent
                   / "examples").glob("*.yml"))


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_builds(path):
    cfg = Config.from_file(str(path))
    sim = Simulation(cfg)
    cfg.exit_on_unknown_key()
    assert sim.geometry.nrad > 0
    assert sim.state.fields.sigma.shape == (sim.geometry.nrad,
                                            sim.geometry.naz)


def test_examples_exist():
    assert len(EXAMPLES) >= 3
