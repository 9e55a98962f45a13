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
def test_example_validates(path, tmp_path, monkeypatch):
    """Each example ships a ``validate()`` that RUNS a reduced version
    and asserts its physics (KH growth, plankton bloom, wind-stress
    momentum budget, Williamson-2 steadiness, ...) — the reference's
    test_validation.jl group. Writer files land in tmp."""
    monkeypatch.chdir(tmp_path)
    mod = load(path)
    assert hasattr(mod, "sim") or hasattr(mod, "step")
    assert hasattr(mod, "validate"), \
        f"{path.stem} has no validate() physics check"
    mod.validate()
