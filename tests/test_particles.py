"""Lagrangian particle tests (reference test group lagrangian)."""

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, Centered, Flat, Periodic, RectilinearGrid,
)
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.particles import LagrangianParticles


def test_uniform_flow_advection():
    """Particles in a uniform flow move at exactly u·t, wrapping
    periodically."""
    grid = RectilinearGrid(size=(16, 16, 4), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    particles = LagrangianParticles(x=[0.1, 0.5, 0.9], y=[0.5] * 3,
                                    z=[-0.5] * 3)
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                particles=particles)
    state = model.initial_state(u=0.25)
    dt = 0.01
    step = jax.jit(lambda s: model.step(s, dt))
    for _ in range(100):
        state = step(state)
    # t = 1.0, displacement 0.25, periodic wrap
    expect = (np.array([0.1, 0.5, 0.9]) + 0.25) % 1.0
    np.testing.assert_allclose(np.asarray(state.particles.x), expect,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(state.particles.y), 0.5,
                               atol=1e-6)


def test_wall_bounce():
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    p = LagrangianParticles(x=[0.5], y=[0.5], z=[-0.05], restitution=1.0)
    import dataclasses
    parts = p.initial
    # push the particle through the top wall manually
    w = jnp.full(grid.shape, 0.2)
    u = jnp.zeros(grid.shape)
    parts2 = p.advect(grid, parts, u, u, w, dt=0.5)
    z = float(parts2.z[0])
    assert -1.0 <= z <= 0.0  # stayed inside
    assert z < 0.0  # bounced back off z=0


def test_tracked_fields():
    grid = RectilinearGrid(size=(16, 16, 4), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    particles = LagrangianParticles(
        x=[0.25, 0.75], y=[0.5] * 2, z=[-0.5] * 2,
        tracked_fields={"temp": "c"})
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                tracers=("c",), particles=particles)
    state = model.initial_state(c=lambda x, y, z: x)
    state = jax.jit(lambda s: model.step(s, 1e-4))(state)
    temps = np.asarray(state.particles.properties["temp"])
    np.testing.assert_allclose(temps, [0.25, 0.75], atol=0.01)
