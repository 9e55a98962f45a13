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


def test_immersed_bounce():
    """A particle advected into a solid immersed cell bounces back into
    the fluid (reference bounce_immersed_particle,
    lagrangian_particle_advection.jl:50-101)."""
    from oceananigans_tpu.immersed import GridFittedBottom, ImmersedBoundaryGrid

    base = RectilinearGrid(size=(16, 4, 16), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    # a flat bottom at z = -0.5: everything below is solid
    grid = ImmersedBoundaryGrid(base, GridFittedBottom(-0.5))
    p = LagrangianParticles(x=[0.5], y=[0.5], z=[-0.45], restitution=1.0)
    parts = p.initial
    w = jnp.full(grid.shape, -0.4)   # strong downwelling
    zero = jnp.zeros(grid.shape)
    parts2 = p.advect(grid, parts, zero, zero, w, dt=0.5)
    z = float(parts2.z[0])
    # moved to z = -0.65 -> inside the solid region -> bounced above -0.5
    assert z > -0.5, z
    assert z < 0.0

    # a particle in open water with the same kinematics is NOT bounced
    p3 = LagrangianParticles(x=[0.5], y=[0.5], z=[-0.1], restitution=1.0)
    parts3 = p3.advect(grid, p3.initial, zero, zero, w, dt=0.5)
    assert abs(float(parts3.z[0]) - (-0.3)) < 1e-5


def test_immersed_bounce_in_model_step():
    """Particles stay out of the bathymetry over a full model run."""
    from oceananigans_tpu.immersed import GridFittedBottom, ImmersedBoundaryGrid

    base = RectilinearGrid(size=(16, 4, 16), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    grid = ImmersedBoundaryGrid(
        base, GridFittedBottom(lambda x, y: -1.0 + 0.6 * jnp.exp(
            -((x - 0.5) ** 2) / 0.02)))
    # all particles start in open water at z=-0.5 and drift toward the
    # seamount (whose crest reaches z=-0.4)
    particles = LagrangianParticles(
        x=[0.1, 0.25, 0.35, 0.4], y=[0.5] * 4, z=[-0.5] * 4)
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                particles=particles)
    state = model.initial_state(u=0.3)
    step = jax.jit(lambda s: model.step(s, 0.01))
    for _ in range(100):
        state = step(state)
    xs = np.asarray(state.particles.x)
    zs = np.asarray(state.particles.z)
    bottom = -1.0 + 0.6 * np.exp(-((xs - 0.5) ** 2) / 0.02)
    # never below the LOCAL bottom by more than one cell (1/16)
    assert (zs > bottom - 1.0 / 16).all(), (zs, bottom)
    assert np.isfinite(zs).all()
