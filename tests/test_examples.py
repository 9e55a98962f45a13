"""Example-script smoke tests (reference test_validation.jl group):
importing each example builds its grid/model/simulation; a short run of the
cheapest one exercises the full driver."""

import importlib.util
import pathlib
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("*.py"))


def load(path):
    spec = importlib.util.spec_from_file_location(path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_constructs(path):
    mod = load(path)
    assert hasattr(mod, "sim") or hasattr(mod, "step")


def test_seamount_runs_briefly():
    mod = load(pathlib.Path(__file__).parent.parent / "examples"
               / "flow_over_seamount.py")
    sim = mod.sim
    sim.stop_time = 0.1
    sim.run()
    assert float(sim.state.clock.time) >= 0.1 - 1e-9
