"""Perturbation-advection (radiation) open boundaries (reference
``perturbation_advection_open_boundary_matching_scheme.jl``)."""

import jax
import jax.numpy as jnp
import numpy as np

from oceananigans_tpu import (
    Bounded, Flat, Periodic, RectilinearGrid,
    FieldBoundaryConditions, OpenBC, PerturbationAdvectionOpenBC,
    fill_halo_regions,
)
from oceananigans_tpu.fields import LOC_U


def _setup(ubar_right, dt, u_wall, u_adj, outflow_timescale=np.inf,
           inflow_timescale=300.0):
    grid = RectilinearGrid(size=(8,), x=(0.0, 8.0),
                           topology=(Bounded, Flat, Flat),
                           halo=(2, 0, 0))
    bcs = FieldBoundaryConditions(
        west=OpenBC(0.0),
        east=PerturbationAdvectionOpenBC(
            ubar_right, inflow_timescale=inflow_timescale,
            outflow_timescale=outflow_timescale))
    H, N = 2, 8
    u = jnp.zeros(grid.shape)
    u = u.at[H + N, :, :].set(u_wall)      # right wall face
    u = u.at[H + N - 1, :, :].set(u_adj)   # adjacent interior face
    uf = fill_halo_regions(u, grid, bcs, LOC_U, time=0.0, dt=dt)
    return np.asarray(uf)[:, 0, 0], H, N


def test_outflow_fixed_point():
    """Uniform outflow at the mean speed is an exact fixed point."""
    ub = 1.3
    uf, H, N = _setup(ub, dt=0.5, u_wall=ub, u_adj=ub)
    np.testing.assert_allclose(uf[H + N], ub, rtol=1e-14)


def test_outflow_perturbation_decays_analytically():
    """Right-wall perturbation follows uⁿ⁺¹=(uⁿ+Ũuᵢ₋₁)/(1+Ũ)."""
    ub, dt, dx = 1.0, 0.5, 1.0
    delta = 0.2
    uf, H, N = _setup(ub, dt=dt, u_wall=ub + delta, u_adj=ub)
    Ut = min(1.0, dt / dx * ub)
    expected = (ub + delta + Ut * ub) / (1.0 + Ut)
    np.testing.assert_allclose(uf[H + N], expected, rtol=1e-13)
    assert abs(uf[H + N] - ub) < delta      # decays toward the mean
    # ghost slots carry the new wall value
    np.testing.assert_allclose(uf[H + N + 1], uf[H + N], rtol=1e-13)


def test_inflow_relaxes_to_mean():
    """ū < 0 at a right boundary is INFLOW: strong relaxation toward ū
    with the inflow timescale."""
    ub, dt, tau = -0.5, 1.0, 2.0
    uf, H, N = _setup(ub, dt=dt, u_wall=0.0, u_adj=0.0,
                      inflow_timescale=tau)
    tt = dt / tau
    expected = (0.0 + ub * tt) / (1.0 + tt)   # Ũ clamps to 0 on inflow
    np.testing.assert_allclose(uf[H + N], expected, rtol=1e-13)


def test_channel_outflow_model_runs():
    """2-D nonhydrostatic channel: prescribed inflow at the west, PA
    radiation at the east; a transient exits without blowing up and the
    outflow settles near the mean."""
    from oceananigans_tpu.models import NonhydrostaticModel

    U = 1.0
    grid = RectilinearGrid(size=(48, 16), x=(0.0, 4.8), z=(-1.0, 0.0),
                           topology=(Bounded, Flat, Bounded),
                           halo=(2, 0, 2))
    bcs = {"u": FieldBoundaryConditions(
        west=OpenBC(U),
        east=PerturbationAdvectionOpenBC(U, outflow_timescale=np.inf))}
    model = NonhydrostaticModel(grid=grid, boundary_conditions=bcs)
    state = model.initial_state(
        u=lambda x, y, z: U + 0.3 * np.exp(-((x - 1.0) / 0.4) ** 2)
        * np.cos(np.pi * z))
    dt = 0.02
    step = jax.jit(lambda s: model.step(s, dt))
    s = state
    for _ in range(300):
        s = step(s)
    s = jax.block_until_ready(s)
    ui = np.asarray(grid.interior(s.u))
    assert np.isfinite(ui).all()
    # pulse (initially amplitude 0.3) has left through the east side
    assert np.abs(ui - U).max() < 0.1
