"""Grid construction/geometry tests (reference test/test_grids.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (
    RectilinearGrid, LatitudeLongitudeGrid,
    Periodic, Bounded, Flat, Center, Face,
)
from oceananigans_tpu.grids.latlon import R_EARTH


def test_regular_rectilinear_geometry():
    g = RectilinearGrid(size=(8, 4, 2), extent=(1.0, 2.0, 3.0))
    assert g.N == (8, 4, 2)
    assert g.shape == (14, 10, 6)  # halo min(3, N) per axis
    assert np.isclose(float(g.dx()[0, 0, 0]), 1 / 8)
    assert np.isclose(float(g.dy()[0, 0, 0]), 2 / 4)
    assert np.isclose(float(g.dz()[0, 0, 0]), 3 / 2)
    assert g.regular
    # interior nodes
    x = np.asarray(g.xnodes())
    assert x.shape == (8,)
    assert np.allclose(x, (np.arange(8) + 0.5) / 8)
    zf = np.asarray(g.znodes(Face))
    assert zf.shape == (3,)  # bounded faces: N+1
    assert np.allclose(zf, [-3.0, -1.5, 0.0])


def test_extent_vs_explicit_intervals():
    g1 = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1))
    g2 = RectilinearGrid(size=(4, 4, 4), x=(0, 1), y=(0, 1), z=(-1, 0))
    assert g1 == g2


def test_stretched_z_from_function_and_array():
    N = 8
    fn = lambda k: -(1 - (k / N) ** 2)
    faces = np.array([fn(k) for k in range(N + 1)])
    g1 = RectilinearGrid(size=(2, 2, N), x=(0, 1), y=(0, 1), z=fn)
    g2 = RectilinearGrid(size=(2, 2, N), x=(0, 1), y=(0, 1), z=faces)
    assert not g1.z_regular
    assert np.allclose(np.asarray(g1.znodes(Face)), faces)
    assert g1 == g2
    # spacings sum to extent
    dz = np.asarray(g1.dz()).ravel()[g1.Hz:g1.Hz + N]
    assert np.isclose(dz.sum(), 1.0)


def test_flat_topologies():
    g = RectilinearGrid(size=(16, 16), extent=(2.0, 3.0),
                        topology=(Periodic, Periodic, Flat))
    assert g.N == (16, 16, 1)
    assert g.Hz == 0
    assert g.shape[2] == 1
    # flat axis contributes unit metric
    assert float(g.dz()[0, 0, 0]) == 1.0

    g1 = RectilinearGrid(size=(16,), x=(0, 1),
                         topology=(Periodic, Flat, Flat))
    assert g1.shape == (22, 1, 1)


def test_periodic_halo_coordinates_wrap():
    g = RectilinearGrid(size=(8,), x=(0, 1), topology=(Periodic, Flat, Flat))
    xc = np.asarray(g.xC).ravel()
    H = g.Hx
    assert np.allclose(xc[:H], xc[8:8 + H] - 1.0)
    assert np.allclose(xc[-H:], xc[H:2 * H] + 1.0)


def test_grid_is_pytree():
    g = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1))
    leaves, treedef = jax.tree_util.tree_flatten(g)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert g2 == g

    @jax.jit
    def through_jit(grid):
        return grid.dx() * 2

    assert np.allclose(np.asarray(through_jit(g)), 2 / 4)


def test_grid_validation_errors():
    with pytest.raises(ValueError):
        RectilinearGrid(size=(4, 4, 4), x=(0, 1), y=(0, 1))  # missing z
    with pytest.raises(ValueError):
        RectilinearGrid(size=(4, 4), extent=(1, 1, 1))  # size/extent mismatch
    with pytest.raises(ValueError):
        RectilinearGrid(size=(2, 2, 4), x=(0, 1), y=(0, 1),
                        z=np.array([0.0, 1.0, 0.5, 2.0, 3.0]))  # non-monotonic


def test_latlon_grid_metrics():
    g = LatitudeLongitudeGrid(size=(36, 16, 4), longitude=(0, 360),
                              latitude=(-80, 80), z=(-1000, 0))
    assert g.topology[0] == Periodic
    assert g.topology[1] == Bounded
    # dx at the equator-ish center row ~ R cos(phi) dlambda
    dx = np.asarray(g.dx(Center, Center))
    j_eq = g.Hy + 8  # phi = +5 deg center
    phi = np.asarray(g.phiC).ravel()[j_eq]
    expect = R_EARTH * np.cos(np.deg2rad(phi)) * np.deg2rad(10.0)
    assert np.isclose(dx[0, j_eq, 0], expect, rtol=1e-6)
    # dy uniform: R dphi
    dy = np.asarray(g.dy(Center)).ravel()[g.Hy]
    assert np.isclose(dy, R_EARTH * np.deg2rad(10.0), rtol=1e-6)
    # total horizontal area = area of the spherical band
    Az = np.asarray(jnp.broadcast_to(g.Az(Center, Center), g.shape))
    sx, sy, _ = g.interior_slices
    total = Az[sx, sy, 0].sum()
    band = 2 * np.pi * R_EARTH ** 2 * (np.sin(np.deg2rad(80)) -
                                       np.sin(np.deg2rad(-80)))
    assert np.isclose(total, band, rtol=1e-6)


def test_min_spacing():
    g = RectilinearGrid(size=(8, 8, 8), extent=(1, 2, 4))
    assert np.isclose(float(g.min_spacing(0)), 1 / 8)
    assert np.isclose(float(g.min_spacing(2)), 4 / 8)


def test_pole_to_pole_latlon_grid():
    """A lat-lon grid reaching both poles has positive metrics everywhere
    (|cos φ| mirror + floor in the polar halo rows) and a hydrostatic
    model runs on it without NaNs (reference polar_boundary_condition.jl
    capability)."""
    import jax
    import jax.numpy as jnp
    from oceananigans_tpu import LatitudeLongitudeGrid
    from oceananigans_tpu.models import (
        HydrostaticFreeSurfaceModel, SplitExplicitFreeSurface,
    )
    g = LatitudeLongitudeGrid(size=(16, 12, 2), longitude=(0.0, 360.0),
                              latitude=(-90.0, 90.0), z=(-100.0, 0.0))
    dxf = np.asarray(jnp.broadcast_to(g.dx("c", "f"), g.shape))
    assert dxf.min() > 0
    m = HydrostaticFreeSurfaceModel(
        grid=g, momentum_advection=None,
        free_surface=SplitExplicitFreeSurface(substeps=60))
    s = m.initial_state(
        eta=lambda lam, phi: 0.1 * jnp.exp(-(phi / 30) ** 2))
    step = jax.jit(lambda st: m.step(st, 60.0))
    for _ in range(20):
        s = step(s)
    assert bool(jnp.all(jnp.isfinite(s.eta)))
    assert bool(jnp.all(jnp.isfinite(s.u)))


def test_conservative_vertical_regrid():
    """regrid_z conserves column integrals exactly (reference
    regridding_fields.jl)."""
    import jax.numpy as jnp
    from oceananigans_tpu.fields import interior, regrid_z, set_field
    src = RectilinearGrid(size=(4, 16), x=(0, 1), z=(-1, 0),
                          topology=(Periodic, Flat, Bounded))
    dst = RectilinearGrid(size=(4, 5), x=(0, 1), z=(-1, 0),
                          topology=(Periodic, Flat, Bounded))
    a = set_field(src, lambda x, y, z: z ** 2 + 0.3 * jnp.sin(2 * np.pi * x))
    b = regrid_z(src, dst, a)
    Is = np.asarray(interior(src, a)).sum(axis=2) * (1 / 16)
    Id = np.asarray(interior(dst, b)).sum(axis=2) * (1 / 5)
    np.testing.assert_allclose(Is, Id, atol=1e-14)


def test_conservative_regrid_x_and_y():
    """regrid! analogs in x and y conserve the row/column integrals
    (reference regridding_fields.jl regrid_in_x!/regrid_in_y!)."""
    import jax.numpy as jnp
    from oceananigans_tpu.fields import interior, regrid_x, regrid_y, \
        set_field
    src = RectilinearGrid(size=(12, 6), x=(0, 2), z=(-1, 0),
                          topology=(Bounded, Flat, Bounded))
    dst = RectilinearGrid(size=(5, 6), x=(0, 2), z=(-1, 0),
                          topology=(Bounded, Flat, Bounded))
    a = set_field(src, lambda x, y, z: x ** 2 + z)
    b = regrid_x(src, dst, a)
    Is = np.asarray(interior(src, a)).sum(axis=0) * (2 / 12)
    Id = np.asarray(interior(dst, b)).sum(axis=0) * (2 / 5)
    np.testing.assert_allclose(Is, Id, atol=1e-13)

    srcy = RectilinearGrid(size=(4, 9, 4), x=(0, 1), y=(0, 3), z=(-1, 0),
                           topology=(Periodic, Bounded, Bounded))
    dsty = RectilinearGrid(size=(4, 3, 4), x=(0, 1), y=(0, 3), z=(-1, 0),
                           topology=(Periodic, Bounded, Bounded))
    c = set_field(srcy, lambda x, y, z: jnp.cos(y) + x * z)
    d = regrid_y(srcy, dsty, c)
    Is = np.asarray(interior(srcy, c)).sum(axis=1) * (3 / 9)
    Id = np.asarray(interior(dsty, d)).sum(axis=1) * (3 / 3)
    np.testing.assert_allclose(Is, Id, atol=1e-13)
