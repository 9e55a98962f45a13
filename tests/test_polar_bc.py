"""Polar boundary condition for pole-to-pole lat-lon grids (reference
``polar_boundary_condition.jl``): (C,C)-horizontal fields get a
Dirichlet at the zonal mean of the polemost row, recomputed per fill."""

import jax
import numpy as np

from oceananigans_tpu import LatitudeLongitudeGrid
from oceananigans_tpu.boundary_conditions import (
    POLAR, fill_halo_regions, regularize_field_boundary_conditions,
)
from oceananigans_tpu.fields import LOC_C, LOC_V, set_field


def _grid():
    return LatitudeLongitudeGrid(size=(16, 12, 4), longitude=(0, 360),
                                 latitude=(-90, 90), z=(-100, 0), halo=2)


def test_polar_regularization():
    grid = _grid()
    bcs_c = regularize_field_boundary_conditions(None, grid, LOC_C)
    assert bcs_c.south.classification == POLAR
    assert bcs_c.north.classification == POLAR
    # vector components keep the ordinary wall conditions
    bcs_v = regularize_field_boundary_conditions(None, grid, LOC_V)
    assert bcs_v.north.classification != POLAR
    # non-polar grid unaffected
    g2 = LatitudeLongitudeGrid(size=(16, 12, 4), longitude=(0, 360),
                               latitude=(-60, 60), z=(-100, 0), halo=2)
    b2 = regularize_field_boundary_conditions(None, g2, LOC_C)
    assert b2.north.classification != POLAR


def test_polar_ghost_is_zonal_mean_mirror():
    grid = _grid()
    bcs = regularize_field_boundary_conditions(None, grid, LOC_C)
    c = set_field(grid,
                  lambda lam, phi, z: np.sin(np.deg2rad(phi))
                  + 0.2 * np.cos(np.deg2rad(lam)), loc=LOC_C)
    cf = np.asarray(fill_halo_regions(c, grid, bcs, LOC_C))
    H = 2
    pole_row = cf[H:H + 16, H + 11, :]
    mean = pole_row.mean(axis=0)
    np.testing.assert_allclose(cf[H:H + 16, H + 12, :],
                               2 * mean[None] - pole_row, atol=1e-13)


def test_pole_to_pole_model_stable():
    from oceananigans_tpu.models import HydrostaticFreeSurfaceModel
    from oceananigans_tpu.models.hydrostatic import ExplicitFreeSurface

    grid = _grid()
    model = HydrostaticFreeSurfaceModel(
        grid=grid, free_surface=ExplicitFreeSurface(), tracers=("c",))
    state = model.initial_state(
        c=lambda lam, phi, z: np.cos(np.deg2rad(phi)) + 0 * lam,
        eta=lambda lam, phi: 0.1 * np.cos(np.deg2rad(phi))
        * np.cos(np.deg2rad(lam)))
    step = jax.jit(lambda s: model.step(s, 30.0))
    s = state
    for _ in range(50):
        s = step(s)
    s = jax.block_until_ready(s)
    ci = np.asarray(grid.interior(s.tracers["c"]))
    assert np.isfinite(ci).all()
    assert -0.2 < ci.min() and ci.max() < 1.2
