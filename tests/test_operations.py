"""Operations/diagnostics layer tests (reference abstract_operations group)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (
    Bounded, Centered, Flat, Periodic, RectilinearGrid, ScalarDiffusivity,
)
from oceananigans_tpu.boundary_conditions import fill_halo_regions
from oceananigans_tpu.diagnostics import AdvectiveCFL, DiffusiveCFL, StateChecker
from oceananigans_tpu.fields import LOC_C, LOC_U, interior, set_field
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.operations import (
    Average, ConditionalAverage, CumulativeIntegral, Integral, at, dx, dz,
    kinetic_energy, vertical_vorticity,
)


def make_grid():
    return RectilinearGrid(size=(16, 16, 8), extent=(2.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Bounded))


def test_derivative_accuracy():
    grid = RectilinearGrid(size=(64,), x=(0.0, 2 * np.pi),
                           topology=(Periodic, Flat, Flat))
    c = set_field(grid, lambda x, y, z: jnp.sin(x))
    c = fill_halo_regions(c, grid)
    dcdx = dx(grid, c, LOC_C)  # lands on faces
    x_f = np.asarray(grid.xnodes("f"))
    np.testing.assert_allclose(np.asarray(interior(grid, dcdx)).ravel(),
                               np.cos(x_f), atol=2e-3)


def test_average_and_integral():
    grid = make_grid()
    c = set_field(grid, 3.0)
    # volume integral = 3 * V = 3 * 2*1*1
    integ = Integral(grid, c)
    np.testing.assert_allclose(float(jnp.squeeze(integ)), 6.0, rtol=1e-12)
    np.testing.assert_allclose(float(jnp.squeeze(Average(grid, c))), 3.0,
                               rtol=1e-12)


def test_partial_dims_average():
    grid = make_grid()
    c = set_field(grid, lambda x, y, z: z)
    xym = Average(grid, c, dims=(0, 1))   # profile of z
    prof = np.asarray(xym).ravel()
    z = np.asarray(grid.znodes())
    np.testing.assert_allclose(prof, z, atol=1e-12)


def test_cumulative_integral():
    grid = make_grid()
    c = set_field(grid, 1.0)
    ci = CumulativeIntegral(grid, c, dim=2)
    # dz = 1/8 -> cumsum 1/8, 2/8, ...
    np.testing.assert_allclose(np.asarray(ci)[0, 0, :],
                               (np.arange(8) + 1) / 8, rtol=1e-12)


def test_conditional_average():
    grid = make_grid()
    c = set_field(grid, lambda x, y, z: jnp.where(x < 1.0, 1.0, 3.0))
    cond = set_field(grid, lambda x, y, z: x < 1.0).astype(bool)
    np.testing.assert_allclose(
        float(jnp.squeeze(ConditionalAverage(grid, c, cond))), 1.0,
        rtol=1e-12)


def test_vorticity_of_solid_rotation():
    grid = RectilinearGrid(size=(32, 32), x=(-1.0, 1.0), y=(-1.0, 1.0),
                           topology=(Periodic, Periodic, Flat))
    # u = -Ωy, v = +Ωx -> ζ = 2Ω
    omega = 0.7
    u = set_field(grid, lambda x, y, z: -omega * y, loc=LOC_U)
    v = set_field(grid, lambda x, y, z: omega * x)
    u = fill_halo_regions(u, grid)
    v = fill_halo_regions(v, grid)
    zeta = vertical_vorticity(grid, u, v)
    zi = np.asarray(interior(grid, zeta))
    # away from the periodic seam (where ±Ωx wraps), ζ = 2Ω
    np.testing.assert_allclose(zi[8:24, 8:24], 2 * omega, atol=1e-10)


def test_at_interpolation():
    grid = make_grid()
    c = set_field(grid, lambda x, y, z: x)
    c = fill_halo_regions(c, grid)
    cu = at(grid, c, LOC_C, LOC_U)   # interpolate centers -> x faces
    xf = np.asarray(grid.xnodes("f"))
    np.testing.assert_allclose(np.asarray(interior(grid, cu))[1:, 0, 0],
                               xf[1:], atol=1e-12)


def test_cfl_diagnostics():
    grid = make_grid()
    model = NonhydrostaticModel(grid=grid, advection=Centered(2),
                                closure=ScalarDiffusivity(nu=1e-2))
    state = model.initial_state(v=2.0)
    cfl = AdvectiveCFL(dt=0.01)(model, state)
    # dy = 1/16, |v| = 2 -> rate 32 -> cfl = 0.32
    np.testing.assert_allclose(float(cfl), 0.32, rtol=1e-6)
    dcfl = DiffusiveCFL(dt=0.01)(model, state)
    dmin = 1 / 16
    np.testing.assert_allclose(float(dcfl), 0.01 * 1e-2 / dmin ** 2,
                               rtol=1e-6)


def test_state_checker():
    grid = make_grid()
    model = NonhydrostaticModel(grid=grid)
    state = model.initial_state(u=1.5)
    rows = StateChecker()(model, state)
    assert abs(rows["u"][1] - 1.5) < 1e-12
    assert "w" in rows
