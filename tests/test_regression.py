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


def cubed_sphere_w2_setup():
    """Cubed-sphere shallow water (Williamson 2, C8): guards the whole
    panel-exchange/corner-circulation/edge-sync stack."""
    from oceananigans_tpu.grids.cubed_sphere_grid import (
        ConformalCubedSphereGrid,
    )
    from oceananigans_tpu.models.cubed_sphere import (
        CubedSphereShallowWaterModel, panel_vector_components,
    )
    a, Omega, gacc = 6.37122e6, 7.292e-5, 9.80616
    u0 = 2 * np.pi * a / (12.0 * 86400)
    h0 = 2.94e4 / gacc
    grid = ConformalCubedSphereGrid((8, 1), z=(-1.0, 0.0), radius=a,
                                    halo=3)
    model = CubedSphereShallowWaterModel(
        grid, gravitational_acceleration=gacc, rotation_rate=Omega)
    u, v = panel_vector_components(
        grid, lambda P: np.cross(np.array([0.0, 0.0, u0 / a]), P * a))

    def h_init(lam, phi, z):
        sphi = np.sin(np.deg2rad(phi))
        return h0 - (a * Omega * u0 + 0.5 * u0 ** 2) * sphi ** 2 / gacc \
            + 0 * z

    state = model.initial_state(u=u, v=v, h=grid.set_tracer(h_init))

    def extract(st):
        return {"u": np.asarray(st.u), "v": np.asarray(st.v),
                "h": np.asarray(st.h)}

    return model, state, 600.0, 10, extract


SETUPS = {"thermal_bubble": thermal_bubble_setup,
          "rayleigh_benard": rayleigh_benard_setup,
          "cubed_sphere_w2": cubed_sphere_w2_setup}


def run_setup(name):
    from oceananigans_tpu.fields import interior
    out = SETUPS[name]()
    extract = None
    if len(out) == 5:
        model, state, dt, nsteps, extract = out
    else:
        model, state, dt, nsteps = out
    step = jax.jit(lambda s: model.step(s, dt))
    for _ in range(nsteps):
        state = step(state)
    if extract is not None:
        return extract(state)
    return {"u": np.asarray(interior(model.grid, state.u)),
            "w": np.asarray(interior(model.grid, state.w)),
            "b": np.asarray(interior(model.grid, state.tracers["b"]))}


@pytest.mark.parametrize("name", sorted(SETUPS))
def test_regression(name):
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        pytest.skip(f"golden data missing; run `python {__file__} "
                    f"--regenerate`")
    got = run_setup(name)
    with np.load(path) as golden:
        for field in golden.files:
            np.testing.assert_allclose(
                got[field], golden[field], atol=1e-12,
                err_msg=f"{name}/{field} drifted from golden data")


if __name__ == "__main__":
    # mirror conftest: CPU float64 (golden data is generated in the same
    # configuration the tests run in)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from oceananigans_tpu.config import config as _cfg
    _cfg.float_type = "float64"
    if "--regenerate" in sys.argv:
        GOLDEN_DIR.mkdir(exist_ok=True)
        for name in SETUPS:
            out = run_setup(name)
            np.savez_compressed(GOLDEN_DIR / f"{name}.npz", **out)
            print(f"wrote {name}.npz")
