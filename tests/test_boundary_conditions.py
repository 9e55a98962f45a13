"""Halo fill + flux BC tests (reference test/test_boundary_conditions.jl,
test/test_halo_regions.jl)."""

import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    RectilinearGrid, Periodic, Bounded, Flat, Center, Face,
    FieldBoundaryConditions, ValueBC, GradientBC, FluxBC, OpenBC,
    fill_halo_regions, set_field,
)
from oceananigans_tpu.boundary_conditions import (
    apply_flux_bcs, regularize_field_boundary_conditions,
)
from oceananigans_tpu.fields import LOC_C, LOC_U, LOC_W


def test_periodic_halos_wrap_and_corners():
    g = RectilinearGrid(size=(6, 6), extent=(1, 1),
                        topology=(Periodic, Periodic, Flat))
    rng = np.random.default_rng(1)
    c = jnp.zeros(g.shape).at[g.interior_slices].set(
        rng.standard_normal((6, 6, 1)))
    cf = np.asarray(fill_halo_regions(c, g, loc=LOC_C))
    H, N = g.Hx, g.Nx
    # pure x halos
    assert np.allclose(cf[:H, H:H + N], cf[N:N + H, H:H + N])
    # corners must be doubly-wrapped interior values
    assert np.allclose(cf[:H, :H, 0], cf[N:N + H, N:N + H, 0])
    assert np.allclose(cf[N + H:, N + H:, 0], cf[H:2 * H, H:2 * H, 0])


def test_value_and_gradient_fills():
    g = RectilinearGrid(size=(4, 4, 8), extent=(1, 1, 2))
    c = set_field(g, 3.0)
    bcs = regularize_field_boundary_conditions(
        FieldBoundaryConditions(top=ValueBC(7.0), bottom=GradientBC(2.0)),
        g, LOC_C)
    cf = np.asarray(fill_halo_regions(c, g, bcs, loc=LOC_C))
    Hz, Nz = g.Hz, g.Nz
    dz = 2 / 8
    i = g.Hx + 1
    # top Dirichlet: ghost mirrors through the value
    assert np.isclose(cf[i, i, Hz + Nz], 2 * 7.0 - 3.0)
    # bottom Neumann: ghost = interior - g*dz (value decreases downward)
    assert np.isclose(cf[i, i, Hz - 1], 3.0 - 2.0 * dz)
    assert np.isclose(cf[i, i, Hz - 2], 3.0 - 2.0 * 3 * dz)


def test_continuous_boundary_function_value():
    g = RectilinearGrid(size=(8, 8, 4), extent=(1, 1, 1))
    c = set_field(g, 0.0)
    bcs = regularize_field_boundary_conditions(
        FieldBoundaryConditions(
            top=ValueBC(lambda x, y, t: jnp.sin(2 * np.pi * x) + t)),
        g, LOC_C)
    cf = np.asarray(fill_halo_regions(c, g, bcs, loc=LOC_C, time=1.5))
    Hz, Nz = g.Hz, g.Nz
    x = np.asarray(g.xC).ravel()
    i = g.Hx + 2
    expect = 2 * (np.sin(2 * np.pi * x[i]) + 1.5) - 0.0
    assert np.isclose(cf[i, g.Hy + 1, Hz + Nz], expect)


def test_impenetrable_wall_normal_velocity():
    g = RectilinearGrid(size=(4, 4, 8), extent=(1, 1, 1))
    w = set_field(g, 1.0, loc=LOC_W)
    bcs = regularize_field_boundary_conditions(None, g, LOC_W)
    wf = np.asarray(fill_halo_regions(w, g, bcs, loc=LOC_W))
    Hz, Nz = g.Hz, g.Nz
    i = g.Hx
    assert wf[i, i, Hz] == 0.0          # bottom wall face
    assert wf[i, i, Hz + Nz] == 0.0     # top wall face
    assert wf[i, i, Hz - 1] == -1.0     # antisymmetric ghost
    assert wf[i, i, Hz + Nz + 1] == -1.0


def test_open_bc_with_value():
    g = RectilinearGrid(size=(8, 4, 4), x=(0, 1), y=(0, 1), z=(0, 1),
                        topology=(Bounded, Periodic, Periodic))
    u = set_field(g, 0.5, loc=LOC_U)
    bcs = regularize_field_boundary_conditions(
        FieldBoundaryConditions(west=OpenBC(1.0), east=OpenBC(0.25)),
        g, LOC_U)
    uf = np.asarray(fill_halo_regions(u, g, bcs, loc=LOC_U))
    Hx, Nx = g.Hx, g.Nx
    j = g.Hy
    assert uf[Hx, j, j] == 1.0
    assert uf[Hx + Nx, j, j] == 0.25


def test_flux_bc_into_tendency():
    g = RectilinearGrid(size=(4, 4, 8), extent=(1, 1, 2))
    G = jnp.zeros(g.shape)
    Q = 0.01
    bcs = regularize_field_boundary_conditions(
        FieldBoundaryConditions(top=FluxBC(Q)), g, LOC_C)
    G2 = np.asarray(apply_flux_bcs(G, g, bcs, loc=LOC_C))
    Hz, Nz = g.Hz, g.Nz
    dz = 2 / 8
    i = g.Hx
    # right-side flux removes (−q/Δz) from the top cell
    assert np.isclose(G2[i, i, Hz + Nz - 1], -Q / dz)
    assert np.allclose(G2[i, i, Hz:Hz + Nz - 1], 0.0)


def test_periodic_axis_rejects_non_periodic_bc():
    import pytest
    g = RectilinearGrid(size=(4, 4, 4), extent=(1, 1, 1))
    with pytest.raises(ValueError):
        regularize_field_boundary_conditions(
            FieldBoundaryConditions(west=ValueBC(0.0)), g, LOC_C)
