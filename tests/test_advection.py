"""Advection scheme tests: constancy preservation, convergence order,
upwind direction. Mirrors the reference's advection test strategy
(test_advection_schemes.jl: smooth-function convergence + constancy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oceananigans_tpu import RectilinearGrid, Periodic, Bounded, Flat
from oceananigans_tpu.advection import (
    Centered, UpwindBiased, WENO, FluxFormAdvection,
    div_Uc, div_vu, cell_advection_timescale,
)
from oceananigans_tpu.boundary_conditions import fill_halo_regions
from oceananigans_tpu.fields import set_field, interior, LOC_U, LOC_C

SCHEMES = [Centered(2), Centered(4), Centered(6),
           UpwindBiased(1), UpwindBiased(3), UpwindBiased(5),
           WENO(3), WENO(5), WENO(7)]


def periodic_1d_grid(N, halo=0):
    # halo=0 on a periodic axis: rolls wrap exactly, valid for ANY order
    return RectilinearGrid(size=(N,), x=(0.0, 2 * np.pi),
                           topology=(Periodic, Flat, Flat), halo=halo)


@pytest.mark.parametrize("scheme", SCHEMES, ids=repr)
def test_constancy_preservation(scheme):
    """Advecting a constant tracer with a divergence-free velocity gives an
    exactly-zero flux divergence."""
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Periodic), halo=4)
    u = set_field(grid, lambda x, y, z: jnp.sin(2 * np.pi * y), loc=LOC_U)
    v = set_field(grid, 0.3)
    w = set_field(grid, -0.2)
    c = set_field(grid, 7.5)
    u = fill_halo_regions(u, grid)
    div = div_Uc(grid, scheme, u, v, w, c)
    assert np.max(np.abs(np.asarray(interior(grid, div)))) < 1e-12


@pytest.mark.parametrize("scheme,order", [
    (Centered(2), 2), (Centered(4), 4), (Centered(6), 6),
    (UpwindBiased(3), 3), (UpwindBiased(5), 5),
    (UpwindBiased(7), 7), (UpwindBiased(9), 8.5), (Centered(8), 8),
    (Centered(10), 8.5),
    # WENO3's L-inf rate degrades to ~1 at critical points of the profile
    # (well-known k=2 WENO property); 5/7 keep near-design order with WENO-Z.
    (WENO(3), 1.3), (WENO(5), 5), (WENO(7), 6), (WENO(9), 6.5),
])
def test_convergence_order(scheme, order):
    """div(u c) for u = 1, c = sin(x) should converge at the scheme's order
    (WENO at least at its underlying upwind order minus a bit, since the
    nonlinear weights perturb smooth-flow accuracy near critical points)."""
    errs = []
    for N in (32, 64):
        grid = periodic_1d_grid(N)
        c = set_field(grid, lambda x, y, z: jnp.sin(x))
        c = fill_halo_regions(c, grid)
        u = set_field(grid, 1.0)
        div = div_Uc(grid, scheme, u, jnp.zeros_like(u), jnp.zeros_like(u), c)
        x = grid.xnodes()
        exact = np.cos(np.asarray(x))
        err = np.max(np.abs(np.asarray(interior(grid, div)).ravel() - exact))
        errs.append(err)
    rate = np.log2(errs[0] / errs[1])
    assert rate > order - 0.5, f"rate {rate:.2f} < expected {order}"


def test_upwind_bias_direction():
    """For u > 0 an upwind flux at face i must not read cells above i."""
    N = 16
    grid = periodic_1d_grid(N, halo=3)
    # step tracer: 1 in left half, 0 in right half
    c = set_field(grid, lambda x, y, z: jnp.where(x < np.pi, 1.0, 0.0))
    c = fill_halo_regions(c, grid)
    u = set_field(grid, 1.0)
    scheme = UpwindBiased(1)
    div = div_Uc(grid, scheme, u, jnp.zeros_like(u), jnp.zeros_like(u), c)
    di = np.asarray(interior(grid, div)).ravel()
    # first-order upwind with u=1: div[i] = (c[i] - c[i-1]) / dx.
    ci = np.asarray(interior(grid, c)).ravel()
    dx = 2 * np.pi / N
    expected = (ci - np.roll(ci, 1)) / dx
    np.testing.assert_allclose(di, expected, atol=1e-13)


def test_momentum_advection_uniform_flow():
    """A uniform velocity field advects itself with zero tendency."""
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Periodic), halo=4)
    u = set_field(grid, 0.7)
    v = set_field(grid, -0.4)
    w = set_field(grid, 0.1)
    for scheme in (Centered(2), WENO(5)):
        div = div_vu(grid, scheme, u, v, w)
        assert np.max(np.abs(np.asarray(interior(grid, div)))) < 1e-12


def test_flux_form_mixed_schemes():
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Periodic), halo=4)
    scheme = FluxFormAdvection(WENO(5), WENO(5), Centered(2))
    assert scheme.required_halo == 3
    c = set_field(grid, lambda x, y, z: jnp.sin(2 * np.pi * x))
    c = fill_halo_regions(c, grid)
    u = set_field(grid, 1.0)
    v = set_field(grid, 1.0)
    w = set_field(grid, 1.0)
    div = div_Uc(grid, scheme, u, v, w, c)
    assert np.all(np.isfinite(np.asarray(div)))


def test_cell_advection_timescale():
    grid = RectilinearGrid(size=(8, 8, 8), extent=(1.0, 1.0, 1.0),
                           topology=(Periodic, Periodic, Periodic))
    u = set_field(grid, 2.0)
    v = set_field(grid, 0.0)
    w = set_field(grid, 0.0)
    dt = cell_advection_timescale(grid, u, v, w)
    # dx = 1/8, |u| = 2 -> dt = dx/|u| = 1/16
    np.testing.assert_allclose(float(dt), 1 / 16, rtol=1e-12)


def test_bound_preserving_no_undershoot():
    """A step profile advected with BoundPreserving(WENO(5)) develops NO
    new extrema (positivity preserved exactly), while raw WENO has tiny
    over/undershoots."""
    from oceananigans_tpu.advection import BoundPreserving
    import jax

    N = 64
    grid = periodic_1d_grid(N, halo=0)
    c = set_field(grid, lambda x, y, z: jnp.where(
        jnp.abs(x - np.pi) < 0.8, 1.0, 0.0))
    u = set_field(grid, 1.0)
    zero = jnp.zeros_like(u)
    dt = 0.3 * (2 * np.pi / N)

    def run(scheme, c):
        @jax.jit
        def step(c):
            def rhs(c):
                return -div_Uc(grid, scheme, u, zero, zero, c)
            k1 = rhs(c)
            k2 = rhs(c + 0.5 * dt * k1)
            k3 = rhs(c + 0.75 * dt * k2)
            return c + dt * (2 * k1 + 3 * k2 + 4 * k3) / 9.0
        for _ in range(100):
            c = step(c)
        return np.asarray(interior(grid, c)).ravel()

    c_bp = run(BoundPreserving(WENO(5)), c)
    # excursions capped at the local-range level (strict preservation
    # needs SSP stepping; Wray RK3 has negative stage weights)
    assert c_bp.min() >= -1e-4
    assert c_bp.max() <= 1.0 + 1e-4
    # still sharp: the front is resolved within a few cells
    assert (np.abs(np.diff(c_bp)) > 0.2).sum() >= 2


def test_positive_weno_strict_bounds():
    """WENO(5, bounds=(0, 1)) — the reference's PositiveWENO Zhang-Shu
    limiter (``positivity_preserving_tracer_advection_operators.jl``) —
    keeps a step profile strictly inside the bounds under SSP-RK3
    (Shu-Osher) stepping, to roundoff."""
    import jax

    N = 64
    grid = periodic_1d_grid(N, halo=0)
    c0 = set_field(grid, lambda x, y, z: jnp.where(
        jnp.abs(x - np.pi) < 0.8, 1.0, 0.0))
    u = set_field(grid, 1.0)
    zero = jnp.zeros_like(u)
    dt = 0.2 * (2 * np.pi / N)

    def run(scheme, c):
        @jax.jit
        def step(c):
            def rhs(c):
                return -div_Uc(grid, scheme, u, zero, zero, c)
            c1 = c + dt * rhs(c)
            c2 = 0.75 * c + 0.25 * (c1 + dt * rhs(c1))
            return c / 3.0 + 2.0 / 3.0 * (c2 + dt * rhs(c2))
        for _ in range(150):
            c = step(c)
        return np.asarray(interior(grid, c)).ravel()

    c_pos = run(WENO(5, bounds=(0.0, 1.0)), c0)
    assert c_pos.min() >= -1e-12, c_pos.min()
    assert c_pos.max() <= 1.0 + 1e-12, c_pos.max()
    # the unlimited scheme DOES overshoot under the same stepping
    c_raw = run(WENO(5), c0)
    assert c_raw.min() < -1e-6 or c_raw.max() > 1.0 + 1e-6
    # front stays sharp
    assert (np.abs(np.diff(c_pos)) > 0.2).sum() >= 2
    # conservation: the limiter only redistributes within cells
    assert abs(c_pos.sum() - np.asarray(
        interior(grid, c0)).ravel().sum()) < 1e-10


def test_positive_weno_smooth_accuracy():
    """On a smooth, strictly-in-bounds profile the limiter must be
    inactive (θ = 1): bounded and raw WENO agree to roundoff."""
    import jax

    N = 64
    grid = periodic_1d_grid(N, halo=0)
    c0 = set_field(grid, lambda x, y, z: 0.5 + 0.25 * jnp.sin(x))
    u = set_field(grid, 1.0)
    zero = jnp.zeros_like(u)

    g_raw = div_Uc(grid, WENO(5), u, zero, zero, c0)
    g_pos = div_Uc(grid, WENO(5, bounds=(0.0, 1.0)), u, zero, zero, c0)
    np.testing.assert_allclose(np.asarray(interior(grid, g_pos)),
                               np.asarray(interior(grid, g_raw)),
                               rtol=0, atol=1e-13)
