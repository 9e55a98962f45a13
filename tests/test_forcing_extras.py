"""AdvectiveForcing, spatially-varying StokesDrift, seawater_density
(VERDICT r1 items 7/10; reference advective_forcing.jl:9,
StokesDrifts.jl StokesDrift, src/Models/seawater_density.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (
    AdvectiveForcing, Bounded, Centered, Flat, MultipleForcings,
    NonhydrostaticModel, Periodic, RectilinearGrid, Simulation,
)
from oceananigans_tpu.buoyancy import SeawaterBuoyancy, TEOS10EquationOfState
from oceananigans_tpu.diagnostics import seawater_density
from oceananigans_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from oceananigans_tpu.stokes_drift import StokesDrift


def test_advective_forcing_sinks_tracer():
    """AdvectiveForcing(w=-ws) must translate a tracer blob downward at
    the settling speed (the reference docstring's sinking-particle use
    case)."""
    grid = RectilinearGrid(size=(4, 32), x=(0, 1), z=(-1, 0),
                           topology=(Periodic, Flat, Bounded))
    ws = 0.05
    model = NonhydrostaticModel(
        grid=grid, advection=Centered(2), tracers=("P",),
        forcing={"P": AdvectiveForcing(w=-ws)})
    z0 = -0.3
    state = model.initial_state(
        P=lambda x, y, z: np.exp(-((z - z0) / 0.08) ** 2))
    sim = Simulation(model, state=state, dt=0.005, stop_time=4.0)
    sim.run()
    P = np.asarray(grid.interior(sim.state.tracers["P"]))[0, 0]
    z = np.asarray(grid.zC).ravel()[grid.interior_slices[2]]
    # center of mass moved down by ws * t
    com = float((z * P).sum() / P.sum())
    expected = z0 - ws * 4.0
    assert abs(com - expected) < 0.02, (com, expected)
    # mass conserved (float32 accumulation tolerance)
    assert abs(P.sum() / np.exp(-((z - z0) / 0.08) ** 2).sum() - 1) < 1e-4


def test_advective_forcing_inside_multiple_forcings():
    grid = RectilinearGrid(size=(4, 16), x=(0, 1), z=(-1, 0),
                           topology=(Periodic, Flat, Bounded))
    model = NonhydrostaticModel(
        grid=grid, tracers=("P",),
        forcing={"P": MultipleForcings(
            AdvectiveForcing(w=-0.01),
            lambda x, y, z, t: 0.0 * x + 0.0 * z)})
    assert "P" in model.advective_forcings
    state = model.initial_state(P=lambda x, y, z: np.exp(z))
    out = model.step(state, 0.01)
    assert np.isfinite(np.asarray(out.tracers["P"])).all()


def test_advective_forcing_on_velocity_raises():
    grid = RectilinearGrid(size=(4, 16), x=(0, 1), z=(-1, 0),
                           topology=(Periodic, Flat, Bounded))
    with pytest.raises(ValueError, match="only supported on tracers"):
        NonhydrostaticModel(grid=grid,
                            forcing={"u": AdvectiveForcing(w=-0.01)})


def test_hydrostatic_advective_forcing_sinks():
    grid = RectilinearGrid(size=(4, 4, 24), x=(0, 1), y=(0, 1), z=(-1, 0),
                           topology=(Periodic, Periodic, Bounded))
    ws = 0.02
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("P",),
        forcing={"P": AdvectiveForcing(w=-ws)})
    z0 = -0.3
    state = model.initial_state(
        P=lambda x, y, z: np.exp(-((z - z0) / 0.1) ** 2))
    step = jax.jit(lambda s: model.step(s, 0.01))
    s = state
    for _ in range(200):
        s = step(s)
    P = np.asarray(grid.interior(s.tracers["P"]))[0, 0]
    z = np.asarray(grid.zC).ravel()[grid.interior_slices[2]]
    com = float((z * P).sum() / P.sum())
    assert abs(com - (z0 - ws * 2.0)) < 0.03


def test_spatial_stokes_drift_engages_and_matches_uniform_limit():
    """A StokesDrift with only ∂z uˢ (no horizontal variation) must
    reproduce UniformStokesDrift's tendencies exactly."""
    from oceananigans_tpu.stokes_drift import UniformStokesDrift

    grid = RectilinearGrid(size=(8, 8, 8), x=(0, 1), y=(0, 1), z=(-1, 0),
                           topology=(Periodic, Periodic, Bounded))
    dz_us = lambda z, t: 0.1 * jnp.exp(4 * z)
    uni = UniformStokesDrift(dusdz=dz_us)
    spa = StokesDrift(dz_us=lambda x, y, z, t: 0.1 * jnp.exp(4 * z))
    model = NonhydrostaticModel(grid=grid)
    state = model.initial_state(
        u=lambda x, y, z: 0.02 * np.sin(2 * np.pi * x),
        w=lambda x, y, z: 0.01 * np.sin(2 * np.pi * x) * np.sin(np.pi * z))
    for name in ("x", "y", "z"):
        a = np.asarray(getattr(uni, f"{name}_tendency")(
            grid, state.u, state.v, state.w, 0.0)
            * jnp.ones(grid.shape))
        b = np.asarray(getattr(spa, f"{name}_tendency")(
            grid, state.u, state.v, state.w, 0.0)
            * jnp.ones(grid.shape))
        np.testing.assert_allclose(a, b, atol=1e-7, err_msg=name)


def test_spatial_stokes_drift_wavepacket_runs():
    """An x-varying Stokes wavepacket engages the horizontal-gradient
    terms and runs stably in the model."""
    k = 2 * np.pi / 0.25
    delta = 0.2
    A = lambda x: jnp.exp(-x ** 2 / (2 * delta ** 2))
    us_hat = lambda z: 0.05 * jnp.exp(2 * k * z)
    sd = StokesDrift(
        dz_us=lambda x, y, z, t: 2 * k * A(x - 0.5) * us_hat(z),
        dy_us=lambda x, y, z, t: 0.0 * (x + y + z),
        dx_ws=lambda x, y, z, t: (-1 / (2 * k))
        * ((x - 0.5) ** 2 / delta ** 2 - 1) / delta ** 2
        * A(x - 0.5) * us_hat(z))
    grid = RectilinearGrid(size=(16, 4, 16), x=(0, 1), y=(0, 1), z=(-1, 0),
                           topology=(Periodic, Periodic, Bounded))
    model = NonhydrostaticModel(grid=grid, stokes_drift=sd)
    state = model.initial_state(
        u=lambda x, y, z: 0.01 * np.sin(2 * np.pi * x))
    step = jax.jit(lambda s: model.step(s, 0.005))
    s = state
    for _ in range(20):
        s = step(s)
    assert np.isfinite(np.asarray(s.u)).all()
    # the z-tendency term is nonzero (horizontal gradients engaged)
    zt = np.asarray(sd.z_tendency(grid, s.u, s.v, s.w, 0.0)
                    * jnp.ones(grid.shape))
    assert np.abs(zt).max() > 0


def test_seawater_density_against_eos():
    grid = RectilinearGrid(size=(4, 4, 16), x=(0, 1), y=(0, 1),
                           z=(-1000, 0),
                           topology=(Periodic, Periodic, Bounded))
    eos = TEOS10EquationOfState()
    model = NonhydrostaticModel(
        grid=grid, tracers=("T", "S"),
        buoyancy=SeawaterBuoyancy(equation_of_state=eos))
    state = model.initial_state(
        T=lambda x, y, z: 12.0 + 8.0 * jnp.exp(z / 300),
        S=lambda x, y, z: 35.0 + 0.5 * jnp.exp(z / 500))
    rho = np.asarray(seawater_density(model, state))
    # in-situ density: denser at depth, in a seawater-like range
    assert rho.shape == tuple(grid.shape)
    assert 1020 < rho.mean() < 1035
    col = rho[2, 2, grid.interior_slices[2]]
    assert (np.diff(col) < 0).all()  # z increases upward -> rho decreases
    # potential density referenced to the surface differs from in-situ
    sigma0 = np.asarray(seawater_density(model, state,
                                         geopotential_height=0.0))
    assert np.abs(sigma0 - rho).max() > 0
