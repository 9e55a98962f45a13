"""Stokes drift, biogeochemistry, background fields tests."""

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, Centered, Flat, Periodic, RectilinearGrid,
)
from oceananigans_tpu.biogeochemistry import SimpleBiogeochemistry
from oceananigans_tpu.fields import field_integral, interior
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.stokes_drift import UniformStokesDrift


def test_stokes_drift_runs():
    grid = RectilinearGrid(size=(16, 16), x=(0.0, 1.0), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    k_w = 2 * np.pi / 0.5   # wave number of the surface wave
    us0 = 0.05
    stokes = UniformStokesDrift(
        us=lambda z, t: us0 * jnp.exp(2 * k_w * z),
        dusdz=lambda z, t: 2 * k_w * us0 * jnp.exp(2 * k_w * z))
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                stokes_drift=stokes)
    state = model.initial_state(
        w=lambda x, y, z: 1e-3 * jnp.sin(2 * np.pi * x)
        * jnp.sin(np.pi * z))
    step = jax.jit(lambda s: model.step(s, 1e-3))
    for _ in range(5):
        state = step(state)
    assert bool(jnp.all(jnp.isfinite(state.u)))
    # the vortex force transfers energy into u
    assert float(jnp.max(jnp.abs(state.u))) > 0.0


def test_biogeochemistry_growth_and_sinking():
    grid = RectilinearGrid(size=(8, 8), x=(0.0, 1.0), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    bgc = SimpleBiogeochemistry(tracer="P", growth_rate=0.5,
                                sinking_speed=0.1)
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                biogeochemistry=bgc)
    assert "P" in model.tracer_names
    state = model.initial_state(
        P=lambda x, y, z: jnp.exp(-((z + 0.3) / 0.1) ** 2))
    com0 = float(field_integral(grid, state.tracers["P"]
                                * jnp.broadcast_to(grid.zC, grid.shape))
                 / field_integral(grid, state.tracers["P"]))
    P0 = float(field_integral(grid, state.tracers["P"]))
    step = jax.jit(lambda s: model.step(s, 1e-2))
    for _ in range(50):
        state = step(state)
    P1 = float(field_integral(grid, state.tracers["P"]))
    com1 = float(field_integral(grid, state.tracers["P"]
                                * jnp.broadcast_to(grid.zC, grid.shape))
                 / field_integral(grid, state.tracers["P"]))
    # exponential growth at rate 0.5 over t=0.5: ratio e^0.25
    np.testing.assert_allclose(P1 / P0, np.exp(0.5 * 0.5), rtol=0.01)
    # sinking moves the center of mass down
    assert com1 < com0 - 0.02


def test_background_fields_shear():
    """Perturbation on a background shear: the background is not
    self-advected, and the perturbation is advected by the background."""
    grid = RectilinearGrid(size=(32, 8), x=(0.0, 2 * np.pi), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    model = NonhydrostaticModel(
        grid=grid, advection=Centered(2), tracers=("c",),
        background_fields={"u": lambda x, y, z: 1.0 + 0.0 * x})
    state = model.initial_state(
        c=lambda x, y, z: jnp.sin(x))
    step = jax.jit(lambda s: model.step(s, 1e-2))
    nsteps = 100   # t = 1: tracer advected by u_bg = 1 -> shift by 1 rad
    for _ in range(nsteps):
        state = step(state)
    c = np.asarray(interior(grid, state.tracers["c"]))[:, 0, 0]
    x = np.asarray(grid.xnodes())
    np.testing.assert_allclose(c, np.sin(x - 1.0), atol=2e-2)


def test_hydrostatic_spherical_coriolis_uniform_field_identity():
    """For uniform v (or u), the Coriolis term must reduce to ∓f q to
    discretization accuracy in f alone — this catches metric-weighting
    errors (a previous area-weighted form was off by dx/dy). Both the
    reference's schemes (``hydrostatic_spherical_coriolis.jl:62-83``)."""
    import jax.numpy as jnp

    from oceananigans_tpu import LatitudeLongitudeGrid
    from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis

    grid = LatitudeLongitudeGrid(size=(16, 12, 2), longitude=(0, 40),
                                 latitude=(10, 50), z=(-100, 0), halo=2)
    sx, sy, _ = grid.interior_slices
    for scheme in ("enstrophy_conserving", "energy_conserving"):
        cor = HydrostaticSphericalCoriolis(scheme=scheme)
        Om = cor.rotation_rate
        v = jnp.full(grid.shape, 0.3)
        fx = np.asarray(cor.x_f_cross_U(grid, jnp.zeros(grid.shape), v,
                                        None))[sx, sy, 2]
        f_c = 2 * Om * np.sin(np.deg2rad(
            np.asarray(grid.phiC).reshape(-1)))[sy]
        np.testing.assert_allclose(
            fx, np.broadcast_to(-f_c[None, :] * 0.3, fx.shape), rtol=2e-3)
        u = jnp.full(grid.shape, 0.2)
        fy = np.asarray(cor.y_f_cross_U(grid, u, jnp.zeros(grid.shape),
                                        None))[sx, sy, 2]
        f_f = 2 * Om * np.sin(np.deg2rad(
            np.asarray(grid.phiF).reshape(-1)))[sy]
        np.testing.assert_allclose(
            fy, np.broadcast_to(f_f[None, :] * 0.2, fy.shape), rtol=1e-12)
