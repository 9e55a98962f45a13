"""Open-boundary matching schemes, TEOS-10 EOS, simulation pickup."""

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, Centered, Flat, Periodic, RectilinearGrid, SeawaterBuoyancy,
    Simulation, IterationInterval, Checkpointer,
)
from oceananigans_tpu.boundary_conditions import (
    FieldBoundaryConditions, FlatExtrapolationOpenBC, fill_halo_regions,
)
from oceananigans_tpu.buoyancy import TEOS10EquationOfState
from oceananigans_tpu.fields import LOC_U, interior, set_field
from oceananigans_tpu.models import NonhydrostaticModel


def test_flat_extrapolation_open_boundary():
    """Outflow BC: wall and ghost values copy the nearest interior value."""
    grid = RectilinearGrid(size=(8,), x=(0.0, 1.0),
                           topology=(Bounded, Flat, Flat))
    u = set_field(grid, lambda x, y, z: x, loc=LOC_U)
    bcs = FieldBoundaryConditions(west=FlatExtrapolationOpenBC(),
                                  east=FlatExtrapolationOpenBC())
    uf = np.asarray(fill_halo_regions(u, grid, bcs, LOC_U)).ravel()
    H, N = grid.Hx, grid.Nx
    # east wall face (index H+N) equals the last interior face value
    assert uf[H + N] == uf[H + N - 1]
    assert uf[H + N + 1] == uf[H + N - 1]
    # west ghosts equal the first interior face
    assert uf[H - 1] == uf[H + 1]


def test_teos10_buoyancy():
    """TEOS-10 polynomial EOS: cabbeling (nonlinearity in T) and
    thermobaricity (z dependence) present; warmer water more buoyant."""
    grid = RectilinearGrid(size=(4, 4), x=(0.0, 1.0), z=(-1000.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    buoy = SeawaterBuoyancy(equation_of_state=TEOS10EquationOfState())
    Tc = set_field(grid, 10.0)
    Tw = set_field(grid, 15.0)
    S = set_field(grid, 35.0)
    b_cold = np.asarray(buoy.buoyancy_ccc(grid, {"T": Tc, "S": S}))
    b_warm = np.asarray(buoy.buoyancy_ccc(grid, {"T": Tw, "S": S}))
    assert np.all(b_warm > b_cold)
    # cabbeling: d b / dT grows with temperature
    Tww = set_field(grid, 20.0)
    b_ww = np.asarray(buoy.buoyancy_ccc(grid, {"T": Tww, "S": S}))
    db1 = b_warm - b_cold
    db2 = b_ww - b_warm
    assert np.all(db2 > db1)
    # model runs with it
    model = NonhydrostaticModel(grid=grid, buoyancy=buoy)
    state = model.initial_state(T=lambda x, y, z: 15.0 + 0.001 * z, S=35.0)
    state = jax.jit(lambda s: model.step(s, 1.0))(state)
    assert bool(jnp.all(jnp.isfinite(state.w)))


def test_simulation_pickup(tmp_path):
    grid = RectilinearGrid(size=(8, 8), x=(0.0, 1.0), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                tracers=("c",),
                                timestepper="QuasiAdamsBashforth2")
    state0 = model.initial_state(c=lambda x, y, z: jnp.sin(2 * np.pi * x))
    sim = Simulation(model, state=state0, dt=0.01, stop_iteration=10)
    sim.output_writers["ckpt"] = Checkpointer(
        dirname=str(tmp_path), schedule=IterationInterval(5))
    final = sim.run()

    # new simulation picks up from the latest checkpoint (iteration 10)
    sim2 = Simulation(model, state=model.initial_state(), dt=0.01,
                      stop_iteration=15)
    sim2.output_writers["ckpt"] = Checkpointer(
        dirname=str(tmp_path), schedule=IterationInterval(5))
    sim2.run(pickup=True)
    assert int(sim2.state.clock.iteration) == 15


def test_field_dependent_flux_bc():
    """Quadratic bottom drag via field_dependencies (reference
    ``FluxBoundaryCondition(drag, field_dependencies=(:u, :v))``,
    ``continuous_boundary_function.jl``): the boundary-adjacent interior
    velocity is passed to the boundary function, and the resulting flux
    divides by the boundary cell spacing into the tendency."""
    from oceananigans_tpu.boundary_conditions import FluxBC

    cD = 2.5e-3
    grid = RectilinearGrid(size=(8, 4, 6), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    drag = lambda x, y, t, u, v: -cD * jnp.sqrt(u**2 + v**2) * u
    u_bcs = FieldBoundaryConditions(
        bottom=FluxBC(drag, field_dependencies=("u", "v")))
    model = NonhydrostaticModel(grid=grid, advection=None,
                                boundary_conditions={"u": u_bcs},
                                timestepper="QuasiAdamsBashforth2")
    u0, v0 = 0.3, 0.4
    state = model.initial_state(u=u0, v=v0)
    state = model.fill_state_halos(state)
    Gu = model.compute_tendencies(state)[0]
    gi = interior(grid, Gu)
    # left-side (bottom) flux q adds +q/dz to the bottom interior cell
    dz = 1.0 / 6
    expected = -cD * np.hypot(u0, v0) * u0 / dz
    np.testing.assert_allclose(np.asarray(gi[:, :, 0]), expected,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gi[:, :, 1:]), 0.0, atol=1e-12)
