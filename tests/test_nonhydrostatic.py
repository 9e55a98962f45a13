"""NonhydrostaticModel physics tests.

Mirrors the reference test strategy (SURVEY.md §4): incompressibility after
projection (test_nonhydrostatic_models.jl), analytic diffusion decay and
internal-wave checks (test_dynamics.jl), time-stepper behavior
(test_time_stepping.jl).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import RectilinearGrid, Periodic, Bounded, Flat
from oceananigans_tpu.advection import WENO, Centered
from oceananigans_tpu.buoyancy import (
    BuoyancyTracer, SeawaterBuoyancy, LinearEquationOfState,
)
from oceananigans_tpu.closures import (
    ScalarDiffusivity, SmagorinskyLilly, AnisotropicMinimumDissipation,
    ConvectiveAdjustmentVerticalDiffusivity,
    VerticalScalarDiffusivity, VerticallyImplicitTimeDiscretization,
)
from oceananigans_tpu.coriolis import FPlane
from oceananigans_tpu.fields import field_mean, interior
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.ops.operators import divergence_ccc


def max_divergence(grid, state):
    d = divergence_ccc(grid, state.u, state.v, state.w)
    return float(jnp.max(jnp.abs(interior(grid, d))))


@pytest.mark.parametrize("timestepper", ["RungeKutta3",
                                         "QuasiAdamsBashforth2"])
def test_incompressibility(timestepper):
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                timestepper=timestepper)
    state = model.initial_state(
        u=lambda x, y, z: jnp.sin(2 * np.pi * x) * jnp.cos(np.pi * z),
        v=lambda x, y, z: jnp.cos(2 * np.pi * y))
    assert max_divergence(grid, state) < 1e-12
    step = jax.jit(lambda s: model.step(s, 1e-3))
    for _ in range(5):
        state = step(state)
    assert max_divergence(grid, state) < 1e-12
    assert int(state.clock.iteration) == 5


def test_tracer_diffusion_decay():
    """c = sin(kx) decays as exp(-κk²t) (reference test_dynamics.jl)."""
    kappa = 1.0
    N = 64
    grid = RectilinearGrid(size=(N,), x=(0.0, 2 * np.pi),
                           topology=(Periodic, Flat, Flat))
    model = NonhydrostaticModel(grid=grid, advection=None,
                                tracers=("c",),
                                closure=ScalarDiffusivity(kappa=kappa))
    state = model.initial_state(c=lambda x, y, z: jnp.sin(x))
    dt = 1e-4
    nsteps = 100
    step = jax.jit(lambda s: model.step(s, dt))
    for _ in range(nsteps):
        state = step(state)
    t = dt * nsteps
    c = np.asarray(interior(grid, state.tracers["c"])).ravel()
    x = np.asarray(grid.xnodes())
    expected = np.exp(-kappa * t) * np.sin(x)
    np.testing.assert_allclose(c, expected, atol=2e-5)


def test_velocity_diffusion_decay():
    nu = 1.0
    N = 64
    grid = RectilinearGrid(size=(N,), x=(0.0, 2 * np.pi),
                           topology=(Periodic, Flat, Flat))
    model = NonhydrostaticModel(grid=grid, advection=None,
                                closure=ScalarDiffusivity(nu=nu))
    state = model.initial_state(v=lambda x, y, z: jnp.sin(x))
    dt = 1e-4
    step = jax.jit(lambda s: model.step(s, dt))
    for _ in range(100):
        state = step(state)
    t = 100 * dt
    v = np.asarray(interior(grid, state.v)).ravel()
    x = np.asarray(grid.xnodes())
    np.testing.assert_allclose(v, np.exp(-nu * t) * np.sin(x), atol=2e-5)


def test_buoyant_bubble_rises():
    """A warm bubble must accelerate upward (w > 0 above the bubble center)."""
    grid = RectilinearGrid(size=(16, 16), x=(-0.5, 0.5), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                tracers=("b",), buoyancy=BuoyancyTracer())
    state = model.initial_state(
        b=lambda x, y, z: 0.1 * jnp.exp(-(x ** 2 + (z + 0.5) ** 2) / 0.01))
    step = jax.jit(lambda s: model.step(s, 1e-2))
    for _ in range(10):
        state = step(state)
    w = np.asarray(interior(grid, state.w))
    # w at the bubble center column, above center
    assert w[8, 0, 8] > 0.0
    assert np.max(w) > 1e-4


def test_internal_wave_frequency():
    """Linear internal wave: ω² = N² k²/(k²+m²). A standing mode started
    with b′ = 0 evolves as w(t) = w₀ cos(ωt); advance half a period and
    check w = −w₀ (reference test_internal_wave_dynamics.jl validates the
    analytic mode). Stratification is carried as total buoyancy N²z whose
    advection −wN² provides the restoring force."""
    N2 = 1.0
    k, m = 1.0, 1.0
    omega = np.sqrt(N2 * k ** 2 / (k ** 2 + m ** 2))
    grid = RectilinearGrid(size=(32, 32), x=(0.0, 2 * np.pi),
                           z=(0.0, np.pi),
                           topology=(Periodic, Flat, Bounded))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                tracers=("b",), buoyancy=BuoyancyTracer())
    amp = 1e-6  # linear regime
    # w = A cos(kx) sin(mz) vanishes at the walls; u from continuity
    state = model.initial_state(
        w=lambda x, y, z: amp * jnp.cos(k * x) * jnp.sin(m * z),
        u=lambda x, y, z: -amp * (m / k) * jnp.sin(k * x) * jnp.cos(m * z),
        b=lambda x, y, z: N2 * z)
    period = 2 * np.pi / omega
    nsteps = 256
    dt = (period / 2) / nsteps
    step = jax.jit(lambda s: model.step(s, dt))
    w0 = np.asarray(interior(grid, state.w)).copy()
    for _ in range(nsteps):
        state = step(state)
    w1 = np.asarray(interior(grid, state.w))
    # after half a period w = -w0 up to O((kΔ)²) discrete-dispersion phase
    # error and O(dt²); the mode amplitude must be preserved
    np.testing.assert_allclose(w1, -w0, atol=amp * 0.1)


def test_ab2_matches_rk3_short():
    grid = RectilinearGrid(size=(16, 16), x=(0.0, 1.0), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    common = dict(grid=grid, advection=Centered(2), tracers=("b",),
                  buoyancy=BuoyancyTracer(),
                  closure=ScalarDiffusivity(nu=1e-3, kappa=1e-3))
    b0 = lambda x, y, z: 0.01 * jnp.exp(-(x - 0.5) ** 2 / 0.01) * (z + 0.5)
    results = {}
    for ts in ("RungeKutta3", "QuasiAdamsBashforth2"):
        model = NonhydrostaticModel(timestepper=ts, **common)
        state = model.initial_state(b=b0)
        dt = 5e-4
        step = jax.jit(lambda s, model=model: model.step(s, dt))
        for _ in range(20):
            state = step(state)
        results[ts] = np.asarray(interior(grid, state.tracers["b"]))
    np.testing.assert_allclose(results["RungeKutta3"],
                               results["QuasiAdamsBashforth2"],
                               atol=1e-8)


def test_seawater_buoyancy_model():
    grid = RectilinearGrid(size=(8, 8), x=(0.0, 1.0), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    model = NonhydrostaticModel(
        grid=grid, buoyancy=SeawaterBuoyancy(
            equation_of_state=LinearEquationOfState(2e-4, 7e-4)))
    assert set(model.tracer_names) == {"T", "S"}
    state = model.initial_state(T=lambda x, y, z: 20.0 + z,
                                S=35.0)
    state = jax.jit(lambda s: model.step(s, 1e-3))(state)
    assert np.all(np.isfinite(np.asarray(state.tracers["T"])))


@pytest.mark.parametrize("closure", [
    SmagorinskyLilly(),
    AnisotropicMinimumDissipation(),
    ConvectiveAdjustmentVerticalDiffusivity(convective_kappa_z=0.1),
    VerticalScalarDiffusivity(
        nu=1e-2, kappa=1e-2,
        time_discretization=VerticallyImplicitTimeDiscretization),
], ids=lambda c: type(c).__name__)
def test_closures_run_stable(closure):
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                tracers=("b",), buoyancy=BuoyancyTracer(),
                                closure=closure)
    state = model.initial_state(
        u=lambda x, y, z: 0.1 * jnp.sin(2 * np.pi * x),
        b=lambda x, y, z: 0.01 * z
        + 0.001 * jnp.exp(-((x - 0.5) ** 2) / 0.02))
    step = jax.jit(lambda s: model.step(s, 1e-3))
    for _ in range(5):
        state = step(state)
    assert np.all(np.isfinite(np.asarray(state.u)))
    assert np.all(np.isfinite(np.asarray(state.tracers["b"])))
    assert max_divergence(grid, state) < 1e-10


def test_implicit_vertical_diffusion_decay():
    """Vertically-implicit diffusion of cos(m z) on a bounded column decays
    at exp(-κm²t) (backward-Euler accuracy ~ O(dt))."""
    kappa = 0.1
    Nz = 64
    grid = RectilinearGrid(size=(Nz,), z=(0.0, np.pi),
                           topology=(Flat, Flat, Bounded))
    closure = VerticalScalarDiffusivity(
        kappa=kappa,
        time_discretization=VerticallyImplicitTimeDiscretization)
    model = NonhydrostaticModel(grid=grid, advection=None, tracers=("c",),
                                closure=closure)
    # cos(z) has zero flux at z=0, pi -> compatible with no-flux walls
    state = model.initial_state(c=lambda x, y, z: jnp.cos(z))
    dt = 1e-3
    step = jax.jit(lambda s: model.step(s, dt))
    for _ in range(100):
        state = step(state)
    t = 0.1
    c = np.asarray(interior(grid, state.tracers["c"])).ravel()
    z = np.asarray(grid.znodes())
    np.testing.assert_allclose(c, np.exp(-kappa * t) * np.cos(z),
                               atol=2e-4)
