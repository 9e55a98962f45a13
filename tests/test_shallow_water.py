"""ShallowWaterModel tests (reference test group shallow_water)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (
    Bounded, Centered, FPlane, Flat, Periodic, RectilinearGrid, UpwindBiased,
    WENO,
)
from oceananigans_tpu.fields import field_integral, interior
from oceananigans_tpu.models import (
    ConservativeFormulation, ShallowWaterModel, VectorInvariantFormulation,
)

G = 9.80665


def sw_grid(N=64, L=10.0):
    return RectilinearGrid(size=(N, N), x=(0.0, L), y=(0.0, L),
                           topology=(Periodic, Periodic, Flat), halo=3)


@pytest.mark.parametrize("formulation", [ConservativeFormulation,
                                         VectorInvariantFormulation])
def test_gravity_wave_speed(formulation):
    """Small-amplitude wave on depth H travels at c = √(gH): a standing
    mode h = H + A cos(kx) returns to −A cos(kx) after half a period."""
    H, L = 1.0, 10.0
    k = 2 * np.pi / L
    omega = k * np.sqrt(G * H)
    period = 2 * np.pi / omega
    grid = sw_grid(N=64, L=L)
    model = ShallowWaterModel(grid=grid, gravitational_acceleration=G,
                              formulation=formulation)
    A = 1e-6
    state = model.initial_state(h=lambda x, y, z: H + A * jnp.cos(k * x))
    nsteps = 256
    dt = (period / 2) / nsteps
    step = jax.jit(lambda s: model.step(s, dt))
    h0 = np.asarray(interior(grid, state.h)) - H
    for _ in range(nsteps):
        state = step(state)
    h1 = np.asarray(interior(grid, state.h)) - H
    np.testing.assert_allclose(h1, -h0, atol=A * 0.05)


def test_mass_conservation():
    grid = sw_grid(N=32)
    model = ShallowWaterModel(grid=grid, coriolis=FPlane(f=1.0),
                              momentum_advection=WENO(5))
    state = model.initial_state(
        h=lambda x, y, z: 1.0 + 0.1 * jnp.exp(-((x - 5) ** 2
                                                + (y - 5) ** 2)),
        uh=lambda x, y, z: 0.1 * jnp.sin(2 * np.pi * y / 10))
    m0 = float(field_integral(grid, state.h))
    step = jax.jit(lambda s: model.step(s, 1e-3))
    for _ in range(50):
        state = step(state)
    m1 = float(field_integral(grid, state.h))
    assert abs(m1 - m0) / m0 < 1e-13
    assert bool(jnp.all(jnp.isfinite(state.uh)))


def test_geostrophic_adjustment_rotating():
    """With strong rotation a height anomaly stays partially balanced
    (max |h-H| doesn't collapse to zero) while total energy is bounded."""
    grid = sw_grid(N=64)
    f = 10.0
    model = ShallowWaterModel(grid=grid, coriolis=FPlane(f=f),
                              gravitational_acceleration=G)
    A = 0.01
    state = model.initial_state(
        h=lambda x, y, z: 1.0 + A * jnp.exp(-((x - 5) ** 2
                                              + (y - 5) ** 2) / 0.5))
    step = jax.jit(lambda s: model.step(s, 2e-3))
    for _ in range(400):
        state = step(state)
    anom = np.asarray(interior(grid, state.h)) - 1.0
    assert np.max(np.abs(anom)) > 0.15 * A   # geostrophic remnant survives
    assert bool(jnp.all(jnp.isfinite(state.h)))


def test_bickley_jet_instability():
    """The canonical SW validation (reference
    validation/shallow_water_model): a perturbed Bickley jet goes unstable
    and perturbation energy grows."""
    grid = RectilinearGrid(size=(64, 64), x=(0, 4 * np.pi),
                           y=(-2 * np.pi, 2 * np.pi),
                           topology=(Periodic, Bounded, Flat), halo=3)
    model = ShallowWaterModel(grid=grid, gravitational_acceleration=G,
                              coriolis=FPlane(f=1.0),
                              momentum_advection=UpwindBiased(3))
    H = 10.0
    U0 = 1.0

    def uh0(x, y, z):
        jet = U0 / jnp.cosh(y) ** 2
        pert = 1e-4 * jnp.exp(-y ** 2) * jnp.cos(x) * U0
        return H * (jet + pert)

    # geostrophic height for the jet: g dh/dy = -f u
    def h0(x, y, z):
        return H - (U0 / G) * jnp.tanh(y)

    state = model.initial_state(uh=uh0, h=h0)
    step = jax.jit(lambda s: model.step(s, 1e-2))
    vh_norm0 = float(jnp.linalg.norm(interior(grid, state.vh)))
    for _ in range(300):
        state = step(state)
    vh_norm = float(jnp.linalg.norm(interior(grid, state.vh)))
    assert np.isfinite(vh_norm)
    assert vh_norm > 2 * vh_norm0  # instability grows cross-jet motion


def test_tracer_advection_in_sw():
    grid = sw_grid(N=32)
    model = ShallowWaterModel(grid=grid, tracers=("c",),
                              tracer_advection=WENO(5))
    state = model.initial_state(
        h=1.0, uh=0.5,
        c=lambda x, y, z: jnp.exp(-((x - 5) ** 2) / 0.5))
    c0 = float(field_integral(grid, state.tracers["c"]))
    step = jax.jit(lambda s: model.step(s, 5e-3))
    for _ in range(100):
        state = step(state)
    c1 = float(field_integral(grid, state.tracers["c"]))
    assert abs(c1 - c0) / abs(c0) < 1e-12
