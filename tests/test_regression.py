"""Golden-data regression tests (reference test strategy §4.4: run 10 steps
of canonical setups and compare prognostic fields against stored golden
data). Golden files live in tests/golden/ and are regenerated with
``python tests/test_regression.py --regenerate`` after INTENTIONAL
numerics changes."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def thermal_bubble_setup():
    """Reference thermal_bubble_regression_test.jl analog."""
    from oceananigans_tpu import (
        Bounded, BuoyancyTracer, Centered, Periodic, RectilinearGrid,
    )
    from oceananigans_tpu.models import NonhydrostaticModel
    grid = RectilinearGrid(size=(16, 16, 16), extent=(100.0, 100.0, 100.0),
                           topology=(Periodic, Periodic, Bounded))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                tracers=("b",), buoyancy=BuoyancyTracer(),
                                timestepper="QuasiAdamsBashforth2")
    state = model.initial_state(
        b=lambda x, y, z: 0.01 * jnp.exp(
            -((x - 50) ** 2 + (y - 50) ** 2 + (z + 50) ** 2) / 200.0))
    return model, state, 6.0, 10


def rayleigh_benard_setup():
    from oceananigans_tpu import (
        Bounded, BuoyancyTracer, Flat, Periodic, RectilinearGrid,
        ScalarDiffusivity, WENO, FieldBoundaryConditions, ValueBC,
    )
    from oceananigans_tpu.models import NonhydrostaticModel
    grid = RectilinearGrid(size=(24, 24), x=(0.0, 2.0), z=(0.0, 1.0),
                           topology=(Periodic, Flat, Bounded))
    model = NonhydrostaticModel(
        grid=grid, advection=WENO(5), tracers=("b",),
        buoyancy=BuoyancyTracer(),
        closure=ScalarDiffusivity(nu=1e-2, kappa=1e-2),
        boundary_conditions={"b": FieldBoundaryConditions(
            bottom=ValueBC(1.0), top=ValueBC(0.0))})
    state = model.initial_state(
        b=lambda x, y, z: 1.0 - z + 0.01 * jnp.sin(7 * x) * jnp.sin(5 * z))
    return model, state, 0.01, 10


SETUPS = {"thermal_bubble": thermal_bubble_setup,
          "rayleigh_benard": rayleigh_benard_setup}


def run_setup(name):
    from oceananigans_tpu.fields import interior
    model, state, dt, nsteps = SETUPS[name]()
    step = jax.jit(lambda s: model.step(s, dt))
    for _ in range(nsteps):
        state = step(state)
    out = {"u": np.asarray(interior(model.grid, state.u)),
           "w": np.asarray(interior(model.grid, state.w)),
           "b": np.asarray(interior(model.grid, state.tracers["b"]))}
    return out


@pytest.mark.parametrize("name", sorted(SETUPS))
def test_regression(name):
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        pytest.skip(f"golden data missing; run `python {__file__} "
                    f"--regenerate`")
    got = run_setup(name)
    with np.load(path) as golden:
        for field in ("u", "w", "b"):
            np.testing.assert_allclose(
                got[field], golden[field], atol=1e-12,
                err_msg=f"{name}/{field} drifted from golden data")


if __name__ == "__main__":
    if "--regenerate" in sys.argv:
        GOLDEN_DIR.mkdir(exist_ok=True)
        for name in SETUPS:
            out = run_setup(name)
            np.savez_compressed(GOLDEN_DIR / f"{name}.npz", **out)
            print(f"wrote {name}.npz")
