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


# ---------------------------------------------------------------------------
# FieldTimeSeries-valued boundary conditions + time-dependent backgrounds
# (reference field_time_series_indexing.jl:179, background_fields.jl:52-58)
# ---------------------------------------------------------------------------

def test_fts_flux_bc_drives_momentum():
    """A FieldTimeSeries-valued top wind-stress flux BC interpolates at
    the clock time inside the jitted step and injects exactly the same
    momentum as the equivalent analytic time-dependent flux BC."""
    import types

    from oceananigans_tpu import (
        Bounded, Periodic, RectilinearGrid,
    )
    from oceananigans_tpu.boundary_conditions import (
        FieldBoundaryConditions, FluxBC,
    )
    from oceananigans_tpu.models import NonhydrostaticModel

    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    # wind stress ramping linearly in time, varying in x (sampled at u's
    # Face-x nodes, matching the analytic BC's coordinate evaluation)
    from oceananigans_tpu.grids.base import Face
    times = np.linspace(0.0, 1.0, 11)
    x = np.asarray(grid.nodes_1d(0, Face))
    data = np.stack([(0.5 + t) * (1.0 + 0.3 * np.sin(2 * np.pi * x))
                     [:, None] * np.ones((8, 8)) for t in times])
    fts = types.SimpleNamespace(times=times, data=data)

    def analytic(xx, yy, t):
        return (0.5 + t) * (1.0 + 0.3 * jnp.sin(2 * np.pi * xx))

    def build(cond):
        model = NonhydrostaticModel(
            grid=grid, timestepper="QuasiAdamsBashforth2",
            boundary_conditions={
                "u": FieldBoundaryConditions(top=FluxBC(cond))})
        return model, model.initial_state()

    dt = jnp.asarray(0.01)
    results = {}
    for name, cond in (("fts", fts), ("fn", analytic)):
        model, state = build(cond)
        step = jax.jit(lambda s, m=model: m.step(s, dt))
        for _ in range(20):
            state = step(state)
        results[name] = np.asarray(grid.interior(state.u))
    # FTS linear-in-t data == exact analytic interpolation here
    np.testing.assert_allclose(results["fts"], results["fn"],
                               rtol=1e-12, atol=1e-15)
    # and the flux actually moved momentum
    assert np.abs(results["fn"]).max() > 1e-4


def test_fts_value_bc_in_halo_fill():
    """FTS-valued Dirichlet BC: the halo fill evaluates the series at
    the clock time (data-driven boundary restoring)."""
    import types

    from oceananigans_tpu import Bounded, Periodic, RectilinearGrid
    from oceananigans_tpu.boundary_conditions import (
        FieldBoundaryConditions, ValueBC, fill_halo_regions,
        regularize_field_boundary_conditions,
    )
    from oceananigans_tpu.fields import LOC_C, new_field

    grid = RectilinearGrid(size=(4, 4, 4), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    times = np.array([0.0, 1.0])
    data = np.stack([np.zeros((4, 4)), np.ones((4, 4))])
    fts = types.SimpleNamespace(times=times, data=data)
    bcs = regularize_field_boundary_conditions(
        FieldBoundaryConditions(top=ValueBC(fts)), grid, LOC_C)
    a = new_field(grid, jnp.float64)
    filled = fill_halo_regions(a, grid, bcs, LOC_C, time=0.5)
    # ghost = 2*value - mirror; value at t=0.5 is 0.5, interior is 0
    Hz, Nz = grid.Hz, grid.Nz
    np.testing.assert_allclose(
        np.asarray(filled)[grid.Hx + 1, grid.Hy + 1, Hz + Nz], 1.0,
        rtol=1e-12)


def test_time_dependent_background_advection():
    """An oscillating uniform background flow U(t) = U0 cos(ωt) advects
    a tracer blob by ∫U dt = (U0/ω) sin(ωt) — inexpressible with the
    old static f(x, y, z) backgrounds."""
    from oceananigans_tpu import Flat, Periodic, RectilinearGrid
    from oceananigans_tpu.advection import Centered
    from oceananigans_tpu.models import NonhydrostaticModel

    N = 64
    grid = RectilinearGrid(size=(N,), x=(0.0, 1.0),
                           topology=(Periodic, Flat, Flat))
    U0, om = 0.5, 2.0 * np.pi

    model = NonhydrostaticModel(
        grid=grid, advection=Centered(2), tracers=("c",),
        timestepper="RungeKutta3",
        background_fields={"u": lambda x, y, z, t:
                           U0 * jnp.cos(om * t) + 0 * x})
    state = model.initial_state(
        c=lambda x, y, z: jnp.exp(
            -((x - 0.5) ** 2) / 0.005) + 0 * z)
    dt = jnp.asarray(1e-3)
    step = jax.jit(lambda s: model.step(s, dt))
    n = 250   # t = 0.25: displacement = U0/ω · sin(π/2) = U0/ω
    for _ in range(n):
        state = step(state)
    c = np.asarray(grid.interior(state.c if hasattr(state, "c")
                                 else state.tracers["c"])).ravel()
    xs = np.asarray(grid.xnodes())
    com = float(np.sum(xs * c) / np.sum(c))
    expected = 0.5 + U0 / om * np.sin(om * 0.25)
    assert abs(com - expected) < 5e-3, (com, expected)
