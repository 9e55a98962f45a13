"""Immersed boundary tests (reference: immersed boundary test group +
test_conjugate_gradient_poisson_solver.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import (
    Bounded, BuoyancyTracer, Centered, Flat, Periodic, RectilinearGrid, WENO,
)
from oceananigans_tpu.fields import LOC_C, LOC_U, interior, set_field
from oceananigans_tpu.immersed import (
    GridFittedBottom, GridFittedBoundary, ImmersedBoundaryGrid,
    ImmersedPoissonSolver, mask_immersed_field, masked_laplacian,
)
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.ops.operators import divergence_ccc


def bumpy_grid(N=32):
    base = RectilinearGrid(size=(N, N), x=(0.0, 2 * np.pi), z=(0.0, 1.0),
                           topology=(Periodic, Flat, Bounded))
    bump = GridFittedBottom(
        lambda x, y: 0.25 * (1 + jnp.cos(x - np.pi)) / 2 + 0.05)
    return ImmersedBoundaryGrid(base, bump)


def test_masks_consistent():
    grid = bumpy_grid()
    solid = np.asarray(grid.solid_c)
    assert solid.any() and not solid.all()
    # u-face solid mask includes both adjacent cells
    su = np.asarray(grid.solid_u)
    assert su.sum() >= solid.sum()
    assert 0.5 < float(grid.fluid_fraction) < 1.0


def test_mask_immersed_field():
    grid = bumpy_grid()
    c = set_field(grid, 5.0, loc=LOC_C)
    cm = mask_immersed_field(grid, c, LOC_C)
    ci = np.asarray(cm)
    assert np.all(ci[np.asarray(grid.solid_c)] == 0.0)
    assert np.all(ci[~np.asarray(grid.solid_c)] == 5.0)


def test_immersed_poisson_solver():
    """A(p) = rhs must hold in the fluid after the CG solve."""
    grid = bumpy_grid(N=32)
    solver = ImmersedPoissonSolver(grid, maxiter=500, reltol=1e-10)
    g = grid.underlying_grid
    rng = np.random.default_rng(3)
    rhs = rng.standard_normal(tuple(g.N))
    fluid_i = ~np.asarray(interior(g, grid.solid_c))
    rhs[~fluid_i] = 0.0
    rhs -= rhs[fluid_i].mean()
    rhs_j = jnp.asarray(rhs)

    p_int = jax.jit(solver.solve)(rhs_j)
    # verify: masked laplacian of p equals rhs (fluid interior)
    from oceananigans_tpu.boundary_conditions import (
        fill_halo_regions, regularize_field_boundary_conditions,
    )
    from oceananigans_tpu.fields import new_field
    sx, sy, sz = g.interior_slices
    p = new_field(g).at[sx, sy, sz].set(p_int)
    bcs = regularize_field_boundary_conditions(None, g, LOC_C)
    p = fill_halo_regions(p, g, bcs, LOC_C)
    Ap = np.asarray(interior(g, masked_laplacian(grid, p)))
    err = np.max(np.abs(Ap[fluid_i] - rhs[fluid_i]))
    scale = np.max(np.abs(rhs))
    assert err < 1e-6 * scale


def test_flow_over_bump_stable_and_divergence_free():
    grid = bumpy_grid(N=32)
    model = NonhydrostaticModel(grid=grid, advection=Centered(2))
    state = model.initial_state(u=0.5)
    step = jax.jit(lambda s: model.step(s, 5e-3))
    for _ in range(20):
        state = step(state)
    assert bool(jnp.all(jnp.isfinite(state.u)))
    # interior solid cells hold zero velocity (halos carry BC ghosts)
    solid_u_i = np.asarray(interior(grid, grid.solid_u))
    u_i = np.asarray(interior(grid, state.u))
    assert np.max(np.abs(u_i[solid_u_i])) == 0.0
    # fluid divergence is small (CG tolerance)
    div = np.asarray(interior(grid, divergence_ccc(grid.underlying_grid,
                                                   state.u, state.v,
                                                   state.w)))
    fluid_i = ~np.asarray(interior(grid, grid.solid_c))
    assert np.max(np.abs(div[fluid_i])) < 1e-6
    # flow accelerates over the bump crest (continuity): u there > inflow u
    u = np.asarray(interior(grid, state.u))
    crest_col = u[16, 0, :]
    fluid_crest = crest_col[np.abs(crest_col) > 1e-12]
    assert fluid_crest.max() > 0.55


def test_grid_fitted_boundary_sphere():
    base = RectilinearGrid(size=(16, 16, 16), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Periodic))
    ibg = ImmersedBoundaryGrid(
        base, GridFittedBoundary(
            lambda x, y, z: (x - 0.5) ** 2 + (y - 0.5) ** 2
            + (z + 0.5) ** 2 < 0.04))
    solid = np.asarray(interior(base, ibg.solid_c))
    # sphere of radius 0.2 in unit box: ~3.3% of volume
    frac = solid.mean()
    assert 0.01 < frac < 0.06


def test_partial_cell_bottom():
    """PartialCellBottom: bottom-adjacent cell heights shrink to the water
    fraction, so a sloping bottom's column depths are captured much more
    accurately than the staircase GridFittedBottom."""
    from oceananigans_tpu.immersed import PartialCellBottom

    base = RectilinearGrid(size=(16, 16), x=(0.0, 1.0), z=(-1.0, 0.0),
                           topology=(Periodic, Flat, Bounded))
    bottom = lambda x, y: -1.0 + 0.43 * x   # gentle slope
    pc = ImmersedBoundaryGrid(base, PartialCellBottom(bottom))
    gf = ImmersedBoundaryGrid(base, GridFittedBottom(bottom))

    # column depth = sum of INTERIOR fluid-cell dz
    def depth(grid):
        dz = jnp.broadcast_to(grid.dz("c"), grid.shape)
        fluid = ~grid.solid_c
        sx, sy, sz = grid.interior_slices
        contrib = jnp.where(fluid, dz, 0.0)[sx, sy, sz]
        return np.asarray(jnp.sum(contrib, axis=2)).ravel()

    x = np.asarray(base.xnodes())
    true_depth = -np.asarray([bottom(xi, 0) for xi in x])
    err_pc = np.abs(depth(pc) - true_depth).max()
    err_gf = np.abs(depth(gf) - true_depth).max()
    # partial cells substantially more accurate; the residual equals the
    # minimum_fractional_cell_height floor (0.2 dz)
    assert err_pc < 0.45 * err_gf
    assert err_pc <= 0.2 * (1.0 / 16) + 1e-12

    # and a model runs stably on it
    import jax
    model = NonhydrostaticModel(grid=pc, advection=Centered(2))
    state = model.initial_state(u=0.2)
    step = jax.jit(lambda s: model.step(s, 5e-3))
    for _ in range(10):
        state = step(state)
    assert bool(jnp.all(jnp.isfinite(state.u)))


# ---------------------------------------------------------------------------
# ImmersedBoundaryCondition (reference immersed_boundary_condition.jl +
# immersed_diffusive_fluxes.jl)
# ---------------------------------------------------------------------------

def _step_bottom_grid(N=16, depth=0.5):
    base = RectilinearGrid(size=(N, N), x=(0.0, 1.0), z=(0.0, 1.0),
                           topology=(Periodic, Flat, Bounded))
    return ImmersedBoundaryGrid(base, GridFittedBottom(
        lambda x, y: depth + 0 * x))


def test_immersed_flux_bc_budget():
    """A constant FluxBC on the immersed bottom interface injects tracer
    at exactly rate q * A_boundary (reference convention: positive flux
    increases boundary-adjacent cells)."""
    from oceananigans_tpu import FieldBoundaryConditions, FluxBC
    from oceananigans_tpu.immersed import ImmersedBoundaryCondition

    grid = _step_bottom_grid()
    q = 1e-3
    model = NonhydrostaticModel(
        grid=grid, tracers=("c",),
        boundary_conditions={"c": FieldBoundaryConditions(
            immersed=ImmersedBoundaryCondition(bottom=FluxBC(q)))})
    state = model.initial_state()
    dt = 0.01
    step = jax.jit(lambda s: model.step(s, dt))
    nsteps = 10
    for _ in range(nsteps):
        state = step(state)
    g = grid
    dV = np.asarray(jnp.broadcast_to(
        g.V(*LOC_C), g.shape)[g.interior_slices])
    c = np.asarray(interior(g, state.tracers["c"]))
    solid = np.asarray(g.solid_c[g.interior_slices])
    content = (c * dV * ~solid).sum()
    # boundary area: one z-face per wet column above the flat bottom
    Az = np.asarray(jnp.broadcast_to(g.Az(None, None), g.shape)
                    [g.interior_slices])
    wet_above_solid = (~solid) & np.roll(solid, 1, 2) \
        & (np.arange(solid.shape[2]) > 0)
    A_boundary = (Az * wet_above_solid).sum()
    expected = q * A_boundary * dt * nsteps
    np.testing.assert_allclose(content, expected, rtol=1e-6)


def test_immersed_value_bc_relaxes_to_boundary_value():
    """ValueBC(cb) + ScalarDiffusivity: boundary-adjacent cells move
    toward cb; cells away from the boundary are untouched at step one."""
    from oceananigans_tpu import FieldBoundaryConditions, ValueBC
    from oceananigans_tpu.closures import ScalarDiffusivity
    from oceananigans_tpu.immersed import ImmersedBoundaryCondition

    grid = _step_bottom_grid()
    cb = 2.0
    model = NonhydrostaticModel(
        grid=grid, tracers=("c",),
        closure=ScalarDiffusivity(kappa=1e-3),
        boundary_conditions={"c": FieldBoundaryConditions(
            immersed=ImmersedBoundaryCondition(bottom=ValueBC(cb)))})
    state = model.initial_state(c=lambda x, y, z: 1.0 + 0 * x)
    _, _, _, Gt, _ = model.compute_tendencies(model.fill_state_halos(state))
    Gc = np.asarray(interior(grid, Gt["c"]))
    solid = np.asarray(grid.solid_c[grid.interior_slices])
    adj = (~solid) & np.roll(solid, 1, 2) & (np.arange(solid.shape[2]) > 0)
    assert (Gc[adj] > 0).all()          # c=1 < cb=2: relaxes upward
    interior_wet = (~solid) & ~adj
    np.testing.assert_allclose(Gc[interior_wet], 0.0, atol=1e-14)
    # rate = kappa * 2 (cb - c) / (dz * dz) for the uniform-kappa case
    dz = 1.0 / 16
    np.testing.assert_allclose(Gc[adj], 1e-3 * 2 * (cb - 1.0) / dz ** 2,
                               rtol=1e-6)


def test_immersed_momentum_drag_flux():
    """A negative FluxBC on u's bottom immersed interface decelerates
    only the bottom-adjacent u cells."""
    from oceananigans_tpu import FieldBoundaryConditions, FluxBC
    from oceananigans_tpu.immersed import ImmersedBoundaryCondition

    grid = _step_bottom_grid()
    tau = -1e-4
    model = NonhydrostaticModel(
        grid=grid,
        boundary_conditions={"u": FieldBoundaryConditions(
            immersed=ImmersedBoundaryCondition(bottom=FluxBC(tau)))})
    state = model.initial_state(u=lambda x, y, z: 0.1 + 0 * x)
    Gu, _, _, _, _ = model.compute_tendencies(
        model.fill_state_halos(state))[:5]
    Gu = np.asarray(interior(grid, Gu))
    solid_u = np.asarray(grid.solid_u[grid.interior_slices])
    adj = (~solid_u) & np.roll(solid_u, 1, 2) \
        & (np.arange(solid_u.shape[2]) > 0)
    dz = 1.0 / 16
    np.testing.assert_allclose(Gu[adj], tau / dz, rtol=1e-6)
    # pure advection of uniform flow contributes nothing elsewhere
    away = (~solid_u) & ~adj
    np.testing.assert_allclose(Gu[away], 0.0, atol=1e-12)


def test_immersed_bc_face_normal_sides_dropped():
    """regularize_immersed_bc drops sides normal to Face axes (u has no
    west/east immersed interface) and returns None when nothing is left."""
    from oceananigans_tpu import FluxBC
    from oceananigans_tpu.fields import LOC_U, LOC_W
    from oceananigans_tpu.immersed import (
        ImmersedBoundaryCondition, regularize_immersed_bc,
    )

    rib = regularize_immersed_bc(FluxBC(1.0), LOC_U)
    assert rib.west is None and rib.east is None
    assert rib.bottom is not None and rib.north is not None
    only_z = ImmersedBoundaryCondition(bottom=FluxBC(1.0))
    assert regularize_immersed_bc(only_z, LOC_W) is None
