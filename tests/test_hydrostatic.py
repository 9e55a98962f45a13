"""HydrostaticFreeSurfaceModel physics tests (reference test group
hydrostatic_free_surface, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (
    Bounded, BuoyancyTracer, Centered, FPlane, Flat, Periodic,
    RectilinearGrid,
)
from oceananigans_tpu.fields import interior, interior_xy
from oceananigans_tpu.models import (
    ExplicitFreeSurface, HydrostaticFreeSurfaceModel,
    SplitExplicitFreeSurface, VectorInvariant,
)
from oceananigans_tpu.ops.operators import divergence_ccc

G = 10.0


def channel_grid(N=64, Nz=4, H=1.0, L=10.0):
    return RectilinearGrid(size=(N, Nz), x=(0.0, L), z=(-H, 0.0),
                           topology=(Periodic, Flat, Bounded))


@pytest.mark.parametrize("fs,dt,nfrac", [
    (ExplicitFreeSurface(gravitational_acceleration=G), 0.25, 1),
    (SplitExplicitFreeSurface(substeps=40, gravitational_acceleration=G),
     1.0, 1),
], ids=["explicit", "split_explicit"])
def test_gravity_wave_period(fs, dt, nfrac):
    """Standing shallow-water gravity wave: η = A cos(kx) returns to −η
    after half a period T/2 = π/(k√(gH))."""
    L, H = 10.0, 1.0
    k = 2 * np.pi / L
    c = np.sqrt(G * H)
    omega = k * c
    period = 2 * np.pi / omega
    grid = channel_grid(N=64, H=H, L=L)
    model = HydrostaticFreeSurfaceModel(grid=grid, free_surface=fs,
                                        momentum_advection=None)
    A = 1e-4
    state = model.initial_state(eta=lambda x, y: A * jnp.cos(k * x))
    nsteps = 200
    dt_step = (period / 2) / nsteps
    step = jax.jit(lambda s: model.step(s, dt_step))
    eta0 = np.asarray(interior_xy(grid, state.eta))
    for _ in range(nsteps):
        state = step(state)
    eta1 = np.asarray(interior_xy(grid, state.eta))
    np.testing.assert_allclose(eta1, -eta0, atol=A * 0.1)


@pytest.mark.parametrize("method", ["fft", "cg"])
def test_implicit_free_surface_gravity_wave(method):
    """Implicit free surface: standing wave with backward-Euler damping
    stays within ~2% of the analytic half-period reversal at small dt, and
    FFT and CG solvers agree."""
    from oceananigans_tpu.models import ImplicitFreeSurface
    L, H = 10.0, 1.0
    k = 2 * np.pi / L
    omega = k * np.sqrt(G * H)
    period = 2 * np.pi / omega
    grid = channel_grid(N=64, H=H, L=L)
    model = HydrostaticFreeSurfaceModel(
        grid=grid,
        free_surface=ImplicitFreeSurface(G, solver_method=method),
        momentum_advection=None)
    A = 1e-4
    state = model.initial_state(eta=lambda x, y: A * jnp.cos(k * x))
    nsteps = 400
    dt = (period / 2) / nsteps
    step = jax.jit(lambda s: model.step(s, dt))
    eta0 = np.asarray(interior_xy(grid, state.eta))
    vol0 = float(jnp.sum(interior_xy(grid, state.eta)))
    for _ in range(nsteps):
        state = step(state)
    eta1 = np.asarray(interior_xy(grid, state.eta))
    np.testing.assert_allclose(eta1, -eta0, atol=A * 0.03)
    assert abs(float(jnp.sum(interior_xy(grid, state.eta))) - vol0) < 1e-12


@pytest.mark.parametrize("fs", [
    ExplicitFreeSurface(gravitational_acceleration=G),
    SplitExplicitFreeSurface(substeps=20, gravitational_acceleration=G),
], ids=["explicit", "split_explicit"])
def test_volume_conservation(fs):
    grid = RectilinearGrid(size=(32, 32, 4), extent=(10.0, 10.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    model = HydrostaticFreeSurfaceModel(grid=grid, free_surface=fs)
    state = model.initial_state(
        eta=lambda x, y: 0.01 * jnp.exp(-((x - 5) ** 2 + (y - 5) ** 2)))
    vol0 = float(jnp.sum(interior_xy(grid, state.eta)))
    dt = 0.005 if isinstance(fs, ExplicitFreeSurface) else 0.02
    step = jax.jit(lambda s: model.step(s, dt))
    for _ in range(20):
        state = step(state)
    vol = float(jnp.sum(interior_xy(grid, state.eta)))
    assert abs(vol - vol0) < 1e-12


def test_geostrophic_balance():
    """A geostrophically balanced jet (f v = g ∂x η) should stay steady."""
    f = 1.0
    L = 10.0
    grid = RectilinearGrid(size=(64, 64, 4), extent=(L, L, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    k = 2 * np.pi / L
    A = 1e-4
    eta0 = lambda x, y: A * jnp.sin(k * x)
    # geostrophic: v = (g/f) ∂x η = (g/f) A k cos(kx)
    v0 = lambda x, y, z: (G / f) * A * k * jnp.cos(k * x)
    model = HydrostaticFreeSurfaceModel(
        grid=grid, free_surface=ExplicitFreeSurface(G),
        coriolis=FPlane(f=f), momentum_advection=None)
    state = model.initial_state(eta=eta0, v=v0)
    dt = 2e-3
    step = jax.jit(lambda s: model.step(s, dt))
    for _ in range(100):
        state = step(state)
    v1 = np.asarray(interior(grid, state.v))
    vinit = np.asarray(interior(grid, model.initial_state(eta=eta0,
                                                          v=v0).v))
    # balance holds to a few percent of the jet amplitude
    assert np.max(np.abs(v1 - vinit)) < 0.05 * np.max(np.abs(vinit))


def test_w_from_continuity_divergence_free():
    grid = RectilinearGrid(size=(16, 16, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    model = HydrostaticFreeSurfaceModel(grid=grid)
    state = model.initial_state(
        u=lambda x, y, z: jnp.sin(2 * np.pi * x) * jnp.cos(np.pi * z),
        v=lambda x, y, z: jnp.cos(2 * np.pi * y))
    div = divergence_ccc(grid, state.u, state.v, state.w)
    # full 3-D divergence vanishes except in the top cell, where the
    # free-surface flux divergence is absorbed by ∂t η
    di = np.asarray(interior(grid, div))
    assert np.max(np.abs(di[:, :, :-1])) < 1e-12


def test_tracer_conservation():
    grid = RectilinearGrid(size=(16, 16, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("c",),
        free_surface=SplitExplicitFreeSurface(substeps=10))
    state = model.initial_state(
        u=lambda x, y, z: 0.1 * jnp.sin(2 * np.pi * x),
        c=lambda x, y, z: 1.0 + 0.5 * jnp.cos(2 * np.pi * y))
    from oceananigans_tpu.fields import field_integral
    c0 = float(field_integral(grid, state.tracers["c"]))
    step = jax.jit(lambda s: model.step(s, 1e-3))
    for _ in range(20):
        state = step(state)
    c1 = float(field_integral(grid, state.tracers["c"]))
    assert abs(c1 - c0) / abs(c0) < 1e-12


def test_vector_invariant_uniform_flow():
    """Uniform flow has zero vorticity and uniform KE: VI tendency = 0."""
    grid = RectilinearGrid(size=(16, 16, 4), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    vi = VectorInvariant()
    from oceananigans_tpu.fields import set_field, LOC_U, LOC_V
    u = set_field(grid, 0.3, loc=LOC_U)
    v = set_field(grid, -0.2, loc=LOC_V)
    w = jnp.zeros_like(u)
    gu = vi.u_tendency(grid, u, v, w)
    gv = vi.v_tendency(grid, u, v, w)
    assert float(jnp.max(jnp.abs(interior(grid, gu)))) < 1e-13
    assert float(jnp.max(jnp.abs(interior(grid, gv)))) < 1e-13


def test_latlon_sphere_global_gravity_wave():
    """Global lat-lon ocean: spherical Coriolis + vector-invariant +
    split-explicit free surface runs stably and conserves volume to
    machine precision (wall-transport impenetrability)."""
    from oceananigans_tpu import (
        HydrostaticSphericalCoriolis, LatitudeLongitudeGrid,
    )
    grid = LatitudeLongitudeGrid(size=(60, 40, 6), longitude=(0.0, 360.0),
                                 latitude=(-60.0, 60.0), z=(-1000.0, 0.0))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
        coriolis=HydrostaticSphericalCoriolis(),
        momentum_advection=VectorInvariant(),
        free_surface=SplitExplicitFreeSurface(substeps=30))
    state = model.initial_state(
        b=lambda lam, phi, z: 1e-5 * z + 1e-4 * jnp.exp(-(phi / 20.0) ** 2),
        eta=lambda lam, phi: 0.1 * jnp.exp(-((lam - 180) / 30) ** 2
                                           - (phi / 15) ** 2))
    Az = np.asarray(grid.Az("c", "c"))[grid.Hx:grid.Hx + grid.Nx,
                                       grid.Hy:grid.Hy + grid.Ny]
    vol0 = float(jnp.sum(interior_xy(grid, state.eta) * Az))
    step = jax.jit(lambda s: model.step(s, 600.0))
    for _ in range(25):
        state = step(state)
    vol = float(jnp.sum(interior_xy(grid, state.eta) * Az))
    eta_scale = float(jnp.sum(jnp.abs(interior_xy(grid, state.eta)) * Az))
    assert bool(jnp.all(jnp.isfinite(state.u)))
    assert bool(jnp.all(jnp.isfinite(state.eta)))
    assert abs(vol - vol0) / eta_scale < 1e-12
    # the bump radiates gravity waves
    assert float(jnp.max(jnp.abs(interior_xy(grid, state.eta)))) < 0.1


def test_zstar_tracer_conservation():
    """z-star coordinate: with a sloshing free surface the σ-weighted
    tracer content is exactly conserved and the run stays stable."""
    from oceananigans_tpu.models import ZStar
    grid = RectilinearGrid(size=(32, 4), x=(0.0, 10.0), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("c",),
        free_surface=SplitExplicitFreeSurface(substeps=30,
                                              gravitational_acceleration=G),
        momentum_advection=None, vertical_coordinate=ZStar())
    A = 0.05   # large amplitude: 5% of depth so σ matters
    state = model.initial_state(
        eta=lambda x, y: A * jnp.cos(2 * np.pi * x / 10.0),
        c=lambda x, y, z: 1.0 + 0.5 * jnp.sin(2 * np.pi * x / 10.0))

    def sigma_content(s):
        sigma = model._sigma(s.eta)
        dz = jnp.broadcast_to(grid.dz("c"), grid.shape)
        sx, sy, sz = grid.interior_slices
        return float(jnp.sum((s.tracers["c"] * sigma * dz)[sx, sy, sz]))

    c0 = sigma_content(state)
    step = jax.jit(lambda s: model.step(s, 0.005))
    for _ in range(100):
        state = step(state)
    c1 = sigma_content(state)
    assert bool(jnp.all(jnp.isfinite(state.tracers["c"])))
    np.testing.assert_allclose(c1, c0, rtol=1e-12)
    # the free surface is actually moving (sigma != 1)
    assert float(jnp.max(jnp.abs(interior_xy(grid, state.eta)))) > 0.2 * A


def test_baroclinic_stratified_adjustment_stable():
    """A stratified, rotating channel with a buoyancy front runs stably
    with the split-explicit free surface + vector-invariant advection."""
    grid = RectilinearGrid(size=(32, 32, 8), extent=(10.0, 10.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
        coriolis=FPlane(f=1.0),
        free_surface=SplitExplicitFreeSurface(substeps=20,
                                              gravitational_acceleration=G),
        momentum_advection=VectorInvariant(),
        tracer_advection=Centered(2))
    state = model.initial_state(
        b=lambda x, y, z: 0.1 * z + 0.01 * jnp.tanh((y - 5.0) / 1.0))
    step = jax.jit(lambda s: model.step(s, 0.01))
    for _ in range(50):
        state = step(state)
    assert bool(jnp.all(jnp.isfinite(state.u)))
    assert bool(jnp.all(jnp.isfinite(state.tracers["b"])))
    # front drives a thermal-wind shear
    assert float(jnp.max(jnp.abs(state.u))) > 1e-6


def test_vector_invariant_scheme_variants_agree_on_smooth_flow():
    """enstrophy/energy/WENO-upwind vorticity schemes (reference
    ``vector_invariant_advection.jl`` variants) all run a smooth
    lat-lon jet stably and agree closely (upwind dissipation is tiny
    on resolved flow)."""
    from oceananigans_tpu import LatitudeLongitudeGrid
    from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis
    from oceananigans_tpu.models.hydrostatic import (
        VectorInvariant, WENOVectorInvariant,
    )

    results = []
    for ma in (VectorInvariant("enstrophy_conserving"),
               VectorInvariant("energy_conserving"),
               WENOVectorInvariant(5)):
        grid = LatitudeLongitudeGrid(size=(24, 12, 3), longitude=(0, 360),
                                     latitude=(30, 60), z=(-1000, 0),
                                     halo=3)
        model = HydrostaticFreeSurfaceModel(
            grid=grid, momentum_advection=ma,
            free_surface=ExplicitFreeSurface(),
            coriolis=HydrostaticSphericalCoriolis(),
            buoyancy=BuoyancyTracer(), tracers=("b",))
        state = model.initial_state(
            b=lambda lam, phi, z: 1e-5 * z
            + 1e-4 * np.tanh((phi - 45) / 5),
            u=lambda lam, phi, z: 0.1 / np.cosh((phi - 45) / 5) ** 2)
        step = jax.jit(lambda s: model.step(s, 120.0))
        s = state
        for _ in range(50):
            s = step(s)
        ui = np.asarray(grid.interior(jax.block_until_ready(s).u))
        assert np.isfinite(ui).all()
        results.append(ui)
    for other in results[1:]:
        assert np.abs(other - results[0]).max() \
            < 0.05 * np.abs(results[0]).max()


def test_step_is_differentiable():
    """jax.grad flows through the full hydrostatic step (the
    capability the reference needs its Enzyme extension for —
    ``OceananigansEnzymeExt``; here AD is native)."""
    grid = RectilinearGrid(size=(16, 1, 4), x=(0, 1e5), y=(0, 1e4),
                           z=(-100, 0),
                           topology=(Periodic, Periodic, Bounded),
                           halo=3)
    model = HydrostaticFreeSurfaceModel(
        grid=grid, free_surface=ExplicitFreeSurface())

    def loss(amplitude):
        state = model.initial_state(
            eta=lambda x, y: amplitude * jnp.sin(2 * jnp.pi * x / 1e5))
        s = state
        for _ in range(5):
            s = model.step(s, 10.0)
        return jnp.sum(grid.interior(s.u) ** 2)

    g = jax.grad(loss)(0.1)
    assert np.isfinite(float(g))
    # finite-difference cross-check
    eps = 1e-4
    fd = (loss(0.1 + eps) - loss(0.1 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)
