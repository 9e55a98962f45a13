"""Curvilinear grid tests: tripolar (Murray), rotated lat-lon, zipper fold
(reference test groups: tripolar / orthogonal spherical shell)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import LatitudeLongitudeGrid
from oceananigans_tpu.boundary_conditions import fill_halo_regions
from oceananigans_tpu.fields import LOC_C, LOC_U, LOC_V, set_field
from oceananigans_tpu.grids.orthogonal import (
    RotatedLatitudeLongitudeGrid, TripolarGrid, fill_zipper_north,
)


def test_tripolar_construction():
    g = TripolarGrid(size=(40, 20, 3), southernmost_latitude=-80.0)
    assert g.zipper
    dx = np.asarray(g.dxCC)[:, :, 0]
    dy = np.asarray(g.dyCC)[:, :, 0]
    assert np.all(np.isfinite(dx)) and np.all(dx > 0)
    assert np.all(np.isfinite(dy)) and np.all(dy > 0)
    phi = np.asarray(g.phiCC)[:, :, 0]
    assert phi.min() > -90.0 and phi.max() < 90.0


def test_tripolar_south_matches_latlon():
    """Away from the poles the tripolar spacing approximates the regular
    lat-lon spacing at the same latitude."""
    g = TripolarGrid(size=(40, 20, 3), southernmost_latitude=-80.0)
    ll = LatitudeLongitudeGrid(size=(40, 20, 3), longitude=(0.0, 360.0),
                               latitude=(-80.0, 90.0), z=(-1000.0, 0.0))
    dx_t = np.asarray(g.dxCC)[g.Hx:g.Hx + 40, g.Hy + 2, 0]
    dx_l = float(np.asarray(
        jnp.broadcast_to(ll.dx("c", "c"), ll.shape))[ll.Hx, ll.Hy + 2, 0])
    np.testing.assert_allclose(dx_t, dx_l, rtol=0.05)


def test_zipper_scalar_and_velocity_signs():
    g = TripolarGrid(size=(16, 8, 2))
    c = jnp.ones(g.shape)
    cf = fill_halo_regions(c, g, loc=LOC_C)
    assert bool(jnp.all(cf == 1.0))
    v = jnp.ones(g.shape)
    vf = fill_halo_regions(v, g, loc=LOC_V)
    north = np.asarray(vf)[:, g.Hy + g.Ny:g.Hy + g.Ny + g.Hy, :]
    np.testing.assert_allclose(north, -1.0)
    u = jnp.ones(g.shape)
    uf = fill_halo_regions(u, g, loc=LOC_U)
    north_u = np.asarray(uf)[g.Hx:g.Hx + g.Nx, g.Hy + g.Ny, 0]
    # u flips sign except on the wrap column (i' == Nx)
    assert (north_u == -1.0).sum() >= g.Nx - 1


def test_zipper_fold_maps_interior_values():
    """A tracer pattern folds onto the matching columns: halo row h maps
    to interior row Ny-1-h with i -> Nx-1-i (centers)."""
    g = TripolarGrid(size=(16, 8, 2))
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal(g.shape))
    cf = np.asarray(fill_halo_regions(c, g, loc=LOC_C))
    Nx, Ny, Hx, Hy = g.Nx, g.Ny, g.Hx, g.Hy
    for h in range(1, Hy + 1):
        for i in range(Nx):
            ip = Nx - 1 - i
            assert cf[Hx + i, Hy + Ny - 1 + h, 0] == pytest.approx(
                cf[Hx + ip, Hy + Ny - 1 - h, 0])


def test_rotated_latlon_grid():
    rg = RotatedLatitudeLongitudeGrid(size=(16, 16, 2),
                                      longitude=(-40.0, 40.0),
                                      latitude=(-40.0, 40.0),
                                      z=(-100.0, 0.0),
                                      north_pole=(60.0, 30.0))
    dx = np.asarray(rg.dxCC)
    assert np.all(np.isfinite(dx)) and np.all(dx > 0)
    # with the rotated pole at (60°E, 30°N), the rotated equator passes
    # through deep southern geographic latitudes
    phi = np.asarray(rg.phiCC)
    assert phi.min() < -50.0
    assert phi.max() < 45.0


def test_tripolar_hydrostatic_model():
    """Full pipeline: hydrostatic dynamics on the tripolar grid run stably
    across the north fold and conserve volume to machine precision
    (reference distributed-tripolar test group)."""
    import jax
    from oceananigans_tpu import BuoyancyTracer
    from oceananigans_tpu.models import (
        HydrostaticFreeSurfaceModel, SplitExplicitFreeSurface,
        VectorInvariant,
    )
    from oceananigans_tpu.fields import interior_xy

    grid = TripolarGrid(size=(48, 24, 4), southernmost_latitude=-75.0,
                        z=(-1000.0, 0.0))
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
        momentum_advection=VectorInvariant(),
        free_surface=SplitExplicitFreeSurface(substeps=40))
    state = model.initial_state(
        b=lambda lam, phi, z: 1e-5 * z,
        eta=lambda lam, phi: 0.1 * jnp.exp(-((lam - 200) / 40) ** 2
                                           - ((phi - 10) / 20) ** 2))
    Az = np.asarray(grid.Az("c", "c"))[grid.Hx:grid.Hx + grid.Nx,
                                       grid.Hy:grid.Hy + grid.Ny]
    vol0 = float(jnp.sum(interior_xy(grid, state.eta) * Az))
    step = jax.jit(lambda s: model.step(s, 300.0))
    for _ in range(20):
        state = step(state)
    assert bool(jnp.all(jnp.isfinite(state.u)))
    assert bool(jnp.all(jnp.isfinite(state.eta)))
    eta_sc = float(jnp.sum(jnp.abs(interior_xy(grid, state.eta)) * Az))
    vol = float(jnp.sum(interior_xy(grid, state.eta) * Az))
    assert abs(vol - vol0) / eta_sc < 1e-12


def test_tripolar_tracer_field_set():
    g = TripolarGrid(size=(16, 8, 2))
    c = set_field(g, lambda lam, phi, z: jnp.sin(jnp.deg2rad(phi)))
    assert bool(jnp.all(jnp.isfinite(c)))


def test_distributed_tripolar_fold_matches_serial():
    """The Zipper north-fold fill and the full tripolar hydrostatic step
    partition over an x-sharded device mesh and match the serial result
    (reference ``distributed_tripolar_grid.jl``: each x-rank exchanges
    fold rows with its mirror rank; here the flip/roll form becomes the
    same mirror-rank collective permutes under GSPMD)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    from oceananigans_tpu import BuoyancyTracer
    from oceananigans_tpu.boundary_conditions import fill_halo_regions
    from oceananigans_tpu.grids.base import Center, Face
    from oceananigans_tpu.models import (
        HydrostaticFreeSurfaceModel, SplitExplicitFreeSurface,
        VectorInvariant,
    )

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")

    # extended x size must divide the mesh: (26 + 2*3) = 32 over 8
    grid = TripolarGrid(size=(26, 8, 4), southernmost_latitude=-75.0,
                        z=(-1000.0, 0.0))
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    shard = NamedSharding(mesh, PartitionSpec("x"))

    # halo-fill equality, scalar + u-velocity (sign-flipping, x-Face)
    rng = np.random.default_rng(0)
    for loc in ((Center, Center, Center), (Face, Center, Center),
                (Center, Face, Center)):
        a = jnp.asarray(rng.standard_normal(grid.shape).astype(np.float32))
        fill = jax.jit(lambda x: fill_halo_regions(x, grid, loc=loc))
        serial = fill(a)
        sharded = fill(jax.device_put(a, shard))
        np.testing.assert_array_equal(np.asarray(serial),
                                      np.asarray(sharded))

    # full model step sharded vs serial
    model = HydrostaticFreeSurfaceModel(
        grid=grid, tracers=("b",), buoyancy=BuoyancyTracer(),
        momentum_advection=VectorInvariant(),
        free_surface=SplitExplicitFreeSurface(substeps=10))
    state = model.initial_state(
        b=lambda lam, phi, z: 1e-5 * z,
        eta=lambda lam, phi: 0.1 * jnp.exp(-((lam - 200) / 40) ** 2
                                           - ((phi - 10) / 20) ** 2))
    step = jax.jit(lambda s: model.step(s, 300.0))
    s_serial = state
    for _ in range(3):
        s_serial = step(s_serial)
    s_shard = jax.tree.map(
        lambda x: jax.device_put(x, shard)
        if hasattr(x, "ndim") and x.ndim >= 1
        and x.shape[0] == grid.shape[0] else x, state)
    for _ in range(3):
        s_shard = step(s_shard)
    for name in ("u", "v", "eta"):
        a = np.asarray(getattr(s_serial, name))
        b = np.asarray(getattr(s_shard, name))
        scale = max(np.abs(a).max(), 1e-30)
        assert np.abs(a - b).max() <= 1e-12 * scale, name
